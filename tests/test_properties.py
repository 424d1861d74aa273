"""Table-driven property tests: generate hundreds of random cases in
Python, compute expected values with an independent reference
implementation, and evaluate the engine's Column expressions over all
cases in ONE Spark pass (hypothesis-per-example with a JVM round-trip
each would be prohibitively slow)."""

import random

from pyspark.sql import functions as F

from nba_data_pipeline_spark.functions.gameid import (
    season_from_game_id,
    season_type_from_game_id,
)
from nba_data_pipeline_spark.functions.timeops import clock_to_seconds

RNG = random.Random(42)


def test_clock_to_seconds_matches_reference_formula(spark):
    cases = []
    for i in range(500):
        period = RNG.randint(1, 8)
        length = 720 if period <= 4 else 300
        rem = RNG.randint(0, length)
        clock = f"{rem // 60}:{rem % 60:02d}"
        if period <= 4:
            expected = (period - 1) * 720 + (720 - rem)
        else:
            expected = 2880 + (period - 5) * 300 + (300 - rem)
        cases.append((i, period, clock, expected))
    df = spark.createDataFrame(cases, "i long, period long, clock string, expected long")
    out = df.withColumn("got", clock_to_seconds("period", "clock"))
    bad = out.filter(F.col("got") != F.col("expected")).collect()
    assert not bad, bad[:5]


def test_game_id_codec_matches_reference_decoder(spark):
    def ref_season(gid):  # reference utils/utils.py:66-69
        start = int("20" + gid[3:5])
        return f"{start}-{str(start + 1)[-2:]:>02}"

    ref_type = {"1": "Pre Season", "2": "Regular Season", "4": "Playoffs"}
    cases = []
    for i in range(500):
        digit = RNG.choice("1245")
        yy = RNG.randint(0, 99)
        tail = RNG.randint(0, 99999)
        gid = f"00{digit}{yy:02d}{tail:05d}"
        cases.append((i, gid, ref_season(gid), ref_type.get(digit)))
    df = spark.createDataFrame(cases, "i long, gid string, exp_season string, exp_type string")
    out = df.withColumn("season", season_from_game_id("gid")).withColumn(
        "stype", season_type_from_game_id("gid")
    )
    bad = out.filter(
        (F.col("season") != F.col("exp_season"))
        | ~(
            F.col("stype").eqNullSafe(F.col("exp_type"))
        )
    ).collect()
    assert not bad, bad[:5]


def test_sessionize_matches_python_reference(spark):
    from nba_data_pipeline_spark.operators.windows import sessionize
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows, expected = [], {}
    for user in range(20):
        t = RNG.randint(0, 1000)
        session = 0
        for j in range(30):
            gap = RNG.choice([5, 30, 120, 4000, 8000])
            t += gap
            if j == 0 or gap > 3600:
                session += 1
            eid = user * 1000 + j
            rows.append((eid, user, t0 + dt.timedelta(seconds=t)))
            expected[eid] = session
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = sessionize(df, ["user_id"], "ts", 3600, order_by=["ts", "event_id"])
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == expected


def test_minhash_jaccard_estimate_tracks_true_jaccard(spark):
    """MinHash signature agreement rate approximates true Jaccard
    (the property LSH banding relies on)."""
    from nba_data_pipeline_spark.operators.dedup import minhash_signatures

    words = [f"w{i}" for i in range(60)]
    base = " ".join(words)
    variant = " ".join(words[:40] + [f"x{i}" for i in range(20)])  # ~2/3 shingle overlap
    df = spark.createDataFrame([(1, base), (2, variant)], "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", num_perm=64)
    rows = {r.doc_id: [r[f"sig{i}"] for i in range(64)] for r in sigs.collect()}
    agree = sum(a == b for a, b in zip(rows[1], rows[2])) / 64
    # true 3-gram shingle jaccard of the two docs:
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    j = len(sh(base) & sh(variant)) / len(sh(base) | sh(variant))
    assert abs(agree - j) < 0.2  # 64 perms: estimator within ~0.2 w.h.p.


def test_chunk_text_covers_every_token_exactly(spark):
    """Property over 200 random docs: concatenating each doc's chunks
    with the overlap removed reproduces the document exactly (no token
    lost or duplicated), and every chunk except the last has exactly
    chunk_tokens tokens."""
    from nba_data_pipeline_spark.operators.text import chunk_text

    chunk, overlap = 16, 4
    stride = chunk - overlap
    docs = []
    for i in range(200):
        n = RNG.randint(0, 100)
        docs.append((i, " ".join(f"w{i}_{j}" for j in range(n)), n))
    df = spark.createDataFrame(docs, "doc_id long, text string, n long")
    out = chunk_text(df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap)
    rows = sorted(
        ((r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens) for r in out.collect())
    )
    by_doc = {}
    for doc_id, idx, text, ntok in rows:
        by_doc.setdefault(doc_id, []).append((idx, text, ntok))
    for doc_id, text, n in docs:
        chunks = by_doc.get(doc_id, [])
        if n == 0:
            assert chunks == []
            continue
        rebuilt = []
        for k, (idx, ctext, ntok) in enumerate(chunks):
            assert idx == k
            toks = ctext.split()
            assert len(toks) == ntok
            if k < len(chunks) - 1:
                assert ntok == chunk
            rebuilt.extend(toks if k == 0 else toks[overlap:] if k * stride + overlap <= n else [])
        # chunks overlap by `overlap`; strip the overlap from every
        # non-first chunk to rebuild the doc
        assert rebuilt == text.split(), (doc_id, n)


def test_zorder_key_preserves_per_dimension_order_on_boxes(spark):
    """Morton keys of points inside a dyadic box are contiguous: all
    points of box (a>>8, b>>8) share the high bits of z — the property
    row-group pruning relies on. Checked for 500 random points."""
    from nba_data_pipeline_spark.operators.layout import zorder_key

    pts = [(i, RNG.randint(0, 65535), RNG.randint(0, 65535)) for i in range(500)]
    df = spark.createDataFrame(pts, "i long, a long, b long")
    got = {r.i: r.z for r in df.select("i", zorder_key("a", "b").alias("z")).collect()}

    def spread(x):
        out = 0
        for bit in range(16):
            out |= ((x >> bit) & 1) << (2 * bit)
        return out

    for i, a, b in pts:
        assert got[i] == spread(a) | (spread(b) << 1)


def test_quantize_error_bound_property(spark):
    """|dequantized - original| <= scale/2 element-wise for random vectors."""
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rows = [
        (i, [RNG.uniform(-10, 10) for _ in range(16)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rt = dequantize_embeddings(quantize_embeddings(df, "embedding"), out_col="back")
    bad = rt.select(
        F.aggregate(
            F.zip_with("embedding", "back", lambda x, y: F.abs(x - y)),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("maxerr"),
        (F.col("qscale") / 2 + 1e-12).alias("bound"),
    ).filter(F.col("maxerr") > F.col("bound")).count()
    assert bad == 0


def test_repetition_features_match_python_reference(spark):
    from nba_data_pipeline_spark.operators.text import repetition_features

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    cases = []
    for i in range(300):
        n = RNG.randint(0, 30)
        toks = [RNG.choice(vocab) for _ in range(n)]
        text = " ".join(toks)
        if n == 0:
            exp = (0, None, None, 0.0)
        else:
            dist = len(set(toks)) / n
            top = max(toks.count(t) for t in set(toks)) / n
            if n < 2:
                dbg = 0.0
            else:
                bgs = [f"{toks[j]} {toks[j+1]}" for j in range(n - 1)]
                dbg = 1.0 - len(set(bgs)) / len(bgs)
            exp = (n, round(dist, 6), round(top, 6), round(dbg, 6))
        cases.append((i, text, *exp))
    df = spark.createDataFrame(
        cases,
        "i long, text string, e_n long, e_dist double, e_top double, e_dbg double",
    )
    out = repetition_features(df)
    bad = out.filter(
        (F.col("n_tokens") != F.col("e_n"))
        | ~(
            F.col("distinct_token_ratio").eqNullSafe(F.col("e_dist"))
            & F.col("top_token_ratio").eqNullSafe(F.col("e_top"))
            & (F.abs(F.col("dup_bigram_ratio") - F.col("e_dbg")) < 1e-9)
        )
    ).collect()
    assert not bad, bad[:5]


def test_pack_sequences_accounts_every_token_once(spark):
    from nba_data_pipeline_spark.operators.sampling import pack_sequences

    rows = [(i, RNG.randint(1, 400)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, "doc_id", "n_tokens", capacity=512, num_shards=8).collect()
    from collections import defaultdict

    by_shard = defaultdict(list)
    for r in out:
        by_shard[r.shard].append(r)
    assert sum(len(v) for v in by_shard.values()) == 1000
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.doc_id)
        # offsets tile the stream exactly: no token counted twice or dropped
        expect = 0
        for r in rs:
            assert r.start_offset == expect
            expect += r.n_tokens
        # pack ids are monotone and every pack index up to the last is hit
        # by at least one doc start or covered by a long doc spanning it
        packs = [r.pack_id for r in rs]
        assert packs == sorted(packs)


def test_merge_intervals_matches_naive_reference(spark):
    """300 random interval sets per key vs an independent sweep-line
    merge; includes duplicates, containment, adjacency, singletons."""
    from nba_data_pipeline_spark.operators.asof import merge_intervals

    rows = []
    expected = {}
    for key in range(60):
        n = RNG.randint(1, 12)
        ivs = []
        for _ in range(n):
            lo = RNG.randint(0, 100)
            hi = lo + RNG.randint(0, 30)
            ivs.append((lo, hi))
            rows.append((key, lo, hi))
        merged = []
        for lo, hi in sorted(ivs):
            if merged and lo <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi), merged[-1][2] + 1)
            else:
                merged.append((lo, hi, 1))
        expected[key] = sorted((lo, hi, c) for lo, hi, c in merged)
    df = spark.createDataFrame(rows, "k long, lo long, hi long")
    out = merge_intervals(df, ["k"], "lo", "hi")
    got = {}
    for r in out.collect():
        got.setdefault(r.k, []).append((r.lo, r.hi, r.n_merged))
    got = {k: sorted(v) for k, v in got.items()}
    assert got == expected


def test_funnel_matches_naive_reference(spark):
    """Random event streams vs a per-user Python scan of the ordered
    first-completion chain."""
    import datetime as dt

    from nba_data_pipeline_spark.operators.windows import funnel_steps

    steps = ["a", "b", "c"]
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    per_user = {}
    for u in range(80):
        n = RNG.randint(1, 10)
        evs = sorted(
            (t0 + dt.timedelta(seconds=RNG.randint(0, 1000)), RNG.choice("abcd"))
            for _ in range(n)
        )
        per_user[u] = evs
        rows += [(u, ty, ts) for ts, ty in evs]
    expected = {}
    for u, evs in per_user.items():
        times, prev = [], None
        for step in steps:
            nxt = min(
                (ts for ts, ty in evs if ty == step and (prev is None or ts > prev)),
                default=None,
            )
            times.append(nxt)
            if nxt is None:
                times += [None] * (len(steps) - len(times))
                break
            prev = nxt
        if times[0] is not None:
            expected[u] = tuple(times)
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.user: (r.step_1_ts, r.step_2_ts, r.step_3_ts)
        for r in funnel_steps(df, "user_id", "event_type", "ts", steps).collect()
    }
    assert got == expected


def test_table_diff_deterministic_under_dup_keys_and_partitioning(spark):
    """Round-7 determinism contract: with duplicate keys carrying
    different values, diff_status must be identical across partition
    layouts (the old arbitrary-survivor dropDuplicates was not)."""
    from nba_data_pipeline_spark.operators.incremental import table_diff

    rows_old, rows_new = [], []
    for k in range(200):
        for copy in range(RNG.randint(1, 3)):
            rows_old.append((k, f"v{RNG.randint(0, 4)}"))
        for copy in range(RNG.randint(0, 3)):
            rows_new.append((k, f"v{RNG.randint(0, 4)}"))
    old = spark.createDataFrame(rows_old, "k long, v string")
    new = spark.createDataFrame(rows_new, "k long, v string")
    results = []
    for parts in (1, 7, 32):
        out = table_diff(old.repartition(parts), new.repartition(33 - parts), ["k"])
        results.append(sorted((r.k, r.diff_status) for r in out.collect()))
    assert results[0] == results[1] == results[2]
    # multiset semantics: same key-multiset on both sides => unchanged
    statuses = dict(results[0])
    from collections import Counter
    mo, mn = Counter(rows_old), Counter(rows_new)
    for k in range(200):
        in_old = any(key == k for key, _ in mo)
        in_new = any(key == k for key, _ in mn)
        if in_old and in_new:
            same = {v: c for (key, v), c in mo.items() if key == k} == {
                v: c for (key, v), c in mn.items() if key == k}
            assert statuses[k] == ("unchanged" if same else "changed"), k
        else:
            assert statuses[k] == ("removed" if in_old else "added"), k


def test_pii_redaction_idempotent_and_leak_free(spark):
    """Redacting twice equals redacting once, and no generated PII
    string survives — over randomized documents with injected PII."""
    from nba_data_pipeline_spark.operators.pii import detect_pii, redact_pii

    words = "alpha beta gamma delta epsilon zeta".split()
    cases = []
    for i in range(300):
        body = " ".join(RNG.choice(words) for _ in range(RNG.randint(3, 15)))
        kind = i % 4
        if kind == 0:
            body += f" user{i}@mail{i % 7}.example.org"
        elif kind == 1:
            body += f" {RNG.randint(200, 999)}-{RNG.randint(200, 999)}-{RNG.randint(1000, 9999)}"
        elif kind == 2:
            body += f" 10.{RNG.randint(0, 255)}.{RNG.randint(0, 255)}.{RNG.randint(1, 254)}"
        cases.append((i, body))
    df = spark.createDataFrame(cases, "i long, text string")
    once = redact_pii(df, types=["email", "phone", "ipv4"])
    twice = redact_pii(once.withColumnRenamed("text", "t2"), "t2",
                       types=["email", "phone", "ipv4"])
    diff = once.join(twice, "i").filter(F.col("text") != F.col("t2")).count()
    assert diff == 0
    leftover = detect_pii(once, types=["email", "phone", "ipv4"]).filter(
        F.col("pii_total") > 0).count()
    assert leftover == 0
    # every doc that got an injection carries the matching token
    toks = {0: "[EMAIL]", 1: "[PHONE]", 2: "[IPV4]"}
    out = {r.i: r.text for r in once.collect()}
    for i, _ in cases:
        if i % 4 in toks:
            assert toks[i % 4] in out[i], (i, out[i])


def test_html_to_text_never_leaks_tags(spark):
    """Random well-formed HTML from a tiny grammar: extracted text must
    contain no markup and preserve every body word."""
    from nba_data_pipeline_spark.operators.text import html_to_text

    tags = ["p", "div", "li", "h2", "span", "em"]
    words = "cat dog bird fish tree rock".split()
    cases = []
    for i in range(200):
        parts, expect_words = [], []
        for _ in range(RNG.randint(1, 6)):
            tag = RNG.choice(tags)
            body = " ".join(RNG.choice(words) for _ in range(RNG.randint(1, 5)))
            expect_words.append(body)
            attr = ' class="x"' if RNG.random() < 0.5 else ""
            parts.append(f"<{tag}{attr}>{body}</{tag}>")
            if RNG.random() < 0.3:
                parts.append("<script>var x = 'secret';</script>")
            if RNG.random() < 0.3:
                parts.append("<!-- hidden -->")
        cases.append((i, "".join(parts), " ".join(expect_words)))
    df = spark.createDataFrame(cases, "i long, html string, expect string")
    out = df.withColumn("t", html_to_text("html")).collect()
    for r in out:
        assert "<" not in r.t and ">" not in r.t, r.t
        assert "secret" not in r.t and "hidden" not in r.t
        got_words = r.t.split()
        want_words = r.expect.split()
        assert got_words == want_words, (r.t, r.expect)


def test_triangle_counts_match_bruteforce_over_random_graphs(spark):
    """20 random graphs, one Spark pass each is too slow — instead
    union them into ONE edge frame with a graph-id offset so a single
    triangle_counts run covers all cases, then compare against an
    independent brute-force count per graph."""
    import itertools

    from nba_data_pipeline_spark.operators.graph import triangle_counts

    all_edges = []
    expected = {}
    for g in range(20):
        n = RNG.randint(3, 12)
        base = g * 1000
        nodes = list(range(base, base + n))
        edges = [
            (a, b)
            for a, b in itertools.combinations(nodes, 2)
            if RNG.random() < 0.4
        ]
        if not edges:
            edges = [(nodes[0], nodes[1])]
        all_edges.extend(edges)
        adj = set(edges)
        present = sorted({x for e in edges for x in e})
        for v in present:
            expected[v] = 0
        for a, b, c in itertools.combinations(present, 3):
            if (a, b) in adj and (a, c) in adj and (b, c) in adj:
                expected[a] += 1
                expected[b] += 1
                expected[c] += 1
    df = spark.createDataFrame(all_edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == expected


def test_forward_fill_idempotent_and_monotone_on_random_series(spark):
    from nba_data_pipeline_spark.operators.timeseries import forward_fill

    rows = []
    for k in range(30):
        for t in range(RNG.randint(1, 40)):
            v = None if RNG.random() < 0.5 else round(RNG.uniform(-5, 5), 3)
            rows.append((f"k{k}", t, v))
    df = spark.createDataFrame(rows, "k string, t int, v double")
    once = forward_fill(df, ["k"], "t", ["v"])
    twice = forward_fill(once, ["k"], "t", ["v"])
    assert once.exceptAll(twice).count() == 0 and twice.exceptAll(once).count() == 0
    assert once.count() == df.count()
    # fill only ADDS values where the input had nulls; where the input
    # was non-null the value is unchanged
    j = (
        df.withColumnRenamed("v", "v_in")
        .join(once, ["k", "t"])
    )
    assert j.filter(F.col("v_in").isNotNull() & (F.col("v") != F.col("v_in"))).count() == 0
    assert j.filter(F.col("v_in").isNotNull() & F.col("v").isNull()).count() == 0
