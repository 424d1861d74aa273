from nba_data_pipeline_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)

import pytest

BASE = "the quick brown fox jumps over the lazy dog and runs far away into the green hills tonight"
NEAR = BASE.replace("green", "blue")  # one token differs
FAR = "completely different content about spark query engines and columnar execution at scale"


def _docs(spark):
    rows = [(1, BASE, "en"), (2, NEAR, "en"), (3, FAR, "en"), (4, BASE, "en")]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup(spark):
    df = _docs(spark)
    agg = exact_dedup(df, ["text"], "doc_id")
    copies = {r.canonical_id: r.n_copies for r in agg.collect()}
    assert copies[1] == 2  # doc 4 is an exact copy of doc 1
    kept = drop_exact_duplicates(df, ["text"], "doc_id")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2, 3]


def test_ngram_jaccard_pairs(spark):
    pairs = ngram_jaccard_pairs(_docs(spark), "doc_id", "text", ["lang"], n=3, threshold=0.5)
    got = {(r.id_a, r.id_b): r.jaccard_sim for r in pairs.collect()}
    assert got[(1, 4)] == 1.0
    assert (1, 2) in got and got[(1, 2)] >= 0.5  # near-dup found
    assert (1, 3) not in got and (2, 3) not in got


def test_minhash_lsh_finds_planted_near_dups(spark):
    pairs = minhash_lsh_pairs(
        _docs(spark), "doc_id", "text", num_perm=32, bands=16, threshold=0.5
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 4) in got  # identical -> identical signatures -> same buckets
    assert (1, 2) in got or (2, 4) in got  # near-dup collides in >=1 band
    assert (1, 3) not in got


def test_minhash_md5_hash_mode_matches_planted_structure(spark):
    """hash='md5' (the oracle-portable signature hash) must find the
    same planted structure as the xxhash64 default: the coverage
    guarantee holds for any uniform hash, only signature VALUES differ.
    Identical docs collide in every band under either hash."""
    import pytest

    pairs = minhash_lsh_pairs(
        _docs(spark), "doc_id", "text", num_perm=32, bands=16, threshold=0.5,
        hash="md5",
    )
    got = {(r.id_a, r.id_b): r.jaccard_sim for r in pairs.collect()}
    assert got[(1, 4)] == 1.0
    assert (1, 2) in got or (2, 4) in got
    assert (1, 3) not in got
    with pytest.raises(ValueError, match="unknown gram hash"):
        minhash_lsh_pairs(
            _docs(spark), "doc_id", "text", hash="sha9000"
        ).collect()


def test_simhash_near_pairs(spark):
    pairs = simhash_near_pairs(_docs(spark), "doc_id", "text", max_hamming=10)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 4)] == 0  # identical text -> identical simhash
    assert (1, 3) not in got  # far doc outside hamming radius


def test_simhash_md5_hash_mode_matches_planted_structure(spark):
    """hash='md5' (60-bit portable fingerprint) keeps the planted
    structure: identical docs -> identical fingerprints -> hamming 0;
    far docs stay outside the radius. Bits 60-63 never vote, so sh
    must fit in 60 bits."""
    import pytest
    from nba_data_pipeline_spark.operators.dedup import simhash_df

    pairs = simhash_near_pairs(
        _docs(spark), "doc_id", "text", max_hamming=10, hash="md5"
    )
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 4)] == 0
    assert (1, 3) not in got
    fps = simhash_df(_docs(spark), "doc_id", "text", hash="md5").collect()
    assert all(0 <= r.sh < (1 << 60) for r in fps)
    with pytest.raises(ValueError, match="unknown token hash"):
        simhash_df(_docs(spark), "doc_id", "text", hash="crc7")


def test_hot_bucket_guard_stays_linear_on_identical_corpus(spark):
    """A degenerate corpus (many identical docs -> one mega-bucket per
    band) must not produce the quadratic k*(k-1)/2 pair set: over-cap
    buckets degrade to star pairs (min doc_id paired with every other
    member) — O(k) pairs with a diameter-2 induced subgraph, so
    connected-components dedup still sees one cluster and converges in
    a couple of rounds."""
    from nba_data_pipeline_spark.operators.dedup import (
        bucket_width_stats,
        minhash_lsh_pairs,
        simhash_near_pairs,
    )

    n = 200
    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.9, max_bucket_width=20
    ).collect()
    # star, not clique: exactly n-1 pairs, all anchored at the hub (min id)
    assert len(pairs) == n - 1
    assert all(p.id_a == 0 for p in pairs)
    assert all(p.jaccard_sim == 1.0 for p in pairs)
    # transitively connected: union-find over the emitted pairs -> 1 component
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        parent[find(p.id_a)] = find(p.id_b)
    assert len({find(i) for i in range(n)}) == 1

    sim_pairs = simhash_near_pairs(docs, "doc_id", "text", max_bucket_width=20).collect()
    assert len(sim_pairs) == n - 1
    assert all(p.hamming == 0 for p in sim_pairs)

    banded = spark.createDataFrame(
        [(0, 7, i) for i in range(30)] + [(1, 9, 0), (1, 9, 1)],
        "band int, bucket long, doc_id long",
    )
    hot = bucket_width_stats(banded, cap=20).collect()
    assert [(r.band, r.bucket, r.width) for r in hot] == [(0, 7, 30)]


def test_bucket_guard_disabled_matches_old_behavior(spark):
    """cap=None keeps full pairwise candidates (clique on identical docs)."""
    from nba_data_pipeline_spark.operators.dedup import minhash_lsh_pairs

    n = 12
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(n)],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.9, max_bucket_width=None
    ).collect()
    assert len(pairs) == n * (n - 1) // 2


def test_connected_components_chain_cycle_singleton(spark):
    from nba_data_pipeline_spark.operators.dedup import connected_components, dedup_assign

    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # cycle 10-11-12-10, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r.doc_id: r.component_id for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    # dedup_assign: singleton doc 99 keeps itself and is canonical;
    # exactly one canonical row per component
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20, 21, 99]], "doc_id long")
    out = dedup_assign(docs, "doc_id", pairs).collect()
    canon = {r.doc_id for r in out if r.is_canonical}
    assert canon == {1, 10, 20, 99}
    assert all(r.component_id == comp.get(r.doc_id, r.doc_id) for r in out)


def test_connected_components_long_chain_converges(spark):
    """Diameter-80 path: pointer jumping must converge in O(log d)
    rounds — far below the default max_iterations=30 (one-hop
    propagation alone would need 80 rounds and raise)."""
    from nba_data_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(80)], "id_a long, id_b long"
    )
    comp = connected_components(pairs).collect()
    assert {r.component_id for r in comp} == {0}
    assert len(comp) == 81


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iterations without convergence must not silently
    return split labels (ADVICE r2): strict mode raises, strict=False
    returns the partial frame."""
    import pytest

    from nba_data_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)
    partial = connected_components(pairs, max_iterations=1, strict=False)
    assert partial.count() == 11


def test_ngram_jaccard_df_pruning_drops_boilerplate(spark):
    """max_df_ratio drops shingles present in > ratio of a block's docs
    before Jaccard: docs similar ONLY through shared boilerplate stop
    pairing, while genuinely near-duplicate docs still pair."""
    from nba_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved terms of service apply to this page"
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta eta theta {boiler}", "en"),
        (2, f"alpha beta gamma delta epsilon zeta eta iota {boiler}", "en"),   # near-dup of 1
        (3, f"completely different words about distributed query engines {boiler}", "en"),
        (4, f"yet another unrelated document on columnar storage formats {boiler}", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    unpruned = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", ["lang"], n=3, threshold=0.3
        ).collect()
    }
    # boilerplate alone pushes unrelated docs over the threshold
    assert (3, 4) in unpruned

    pruned = {
        (r.id_a, r.id_b): r.jaccard_sim
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", ["lang"], n=3, threshold=0.3, max_df_ratio=0.5
        ).collect()
    }
    assert (3, 4) not in pruned          # boilerplate-only pair gone
    assert (1, 2) in pruned              # true near-dup survives
    # and its similarity now reflects only discriminative shingles
    assert 0.3 <= pruned[(1, 2)] < 1.0


def test_incremental_ngram_pairs(spark):
    from nba_data_pipeline_spark.operators.dedup import incremental_ngram_pairs

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en"),                      # old
        (2, base + " tail", "en"),            # old near-dup of 1 (must NOT pair)
        (10, base, "en"),                     # new: dup of old 1 and 2, and of new 11
        (11, base, "en"),                     # new: dup of 10
        (12, "completely different words here nothing shared at all ok", "en"),  # new, clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    new = df.filter("doc_id >= 10")
    old = df.filter("doc_id < 10")
    out = incremental_ngram_pairs(new, old, "doc_id", "text", ["lang"], n=3, threshold=0.3)
    got = {(r.id_new, r.id_other, r.other_is_new) for r in out.collect()}
    assert (10, 1, False) in got and (10, 2, False) in got
    assert (11, 1, False) in got and (11, 2, False) in got
    assert (10, 11, True) in got          # new-new once, a < b
    assert (11, 10, True) not in got
    assert not any(a in (1, 2) for a, _, _ in got)   # old never drives
    assert not any(b == 12 or a == 12 for a, b, _ in got)
    sims = {(r.id_new, r.id_other): r.jaccard_sim for r in out.collect()}
    assert sims[(10, 11)] == 1.0


def test_incremental_minhash_pairs_signature_path(spark):
    from nba_data_pipeline_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (1, base),                              # old
        (10, base),                             # new: exact dup of old 1
        (11, base.replace("kappa", "lambda")),  # new: near-dup of 1/10
        (12, "totally different content with none of those words present"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(df, "doc_id", "text", num_perm=32)
    new_sigs = sigs.filter("doc_id >= 10")
    old_sigs = sigs.filter("doc_id < 10")
    out = incremental_minhash_pairs(new_sigs, old_sigs, num_perm=32, bands=16, threshold=0.3)
    got = {(r.id_new, r.id_other): r for r in out.collect()}
    assert (10, 1) in got and got[(10, 1)].est_jaccard == 1.0   # identical sigs
    assert got[(10, 1)].other_is_new is False
    assert (10, 11) in got and got[(10, 11)].other_is_new is True
    assert (11, 10) not in got                                  # new-new once
    assert not any(k[0] == 1 for k in got)                      # old never drives
    assert not any(12 in k for k in got)
    # signature path agrees with the text path on the shared pair set
    from nba_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
    full = minhash_lsh_pairs(df, "doc_id", "text", num_perm=32, bands=16, threshold=0.3)
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    for (a, b) in got:
        assert (min(a, b), max(a, b)) in full_pairs


def test_incremental_minhash_over_persisted_signatures(spark, tmp_path):
    """The production shape: signatures written once, read back as a
    plain parquet table, new batch joined against them."""
    from nba_data_pipeline_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_signatures,
    )

    base = "one two three four five six seven eight nine ten " * 4
    old = spark.createDataFrame([(1, base), (2, "other words entirely here now")],
                                "doc_id long, text string")
    path = str(tmp_path / "sigs")
    minhash_signatures(old, "doc_id", "text", num_perm=32).write.parquet(path)
    corpus_sigs = spark.read.parquet(path)
    new = spark.createDataFrame([(10, base)], "doc_id long, text string")
    new_sigs = minhash_signatures(new, "doc_id", "text", num_perm=32)
    out = incremental_minhash_pairs(new_sigs, corpus_sigs, num_perm=32, bands=16,
                                    threshold=0.3).collect()
    assert {(r.id_new, r.id_other, r.est_jaccard) for r in out} == {(10, 1, 1.0)}


def test_incremental_ngram_matches_full_restriction_random(spark):
    """On a random corpus, the incremental pair set must equal the full
    pair join restricted to pairs touching the new batch (canonicalized
    to new-side-first ordering)."""
    import random

    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.dedup import (
        incremental_ngram_pairs,
        ngram_jaccard_pairs,
    )

    rng = random.Random(7)
    vocab = ["red", "blue", "green", "fast", "slow", "cat", "dog", "sun", "moon"]
    base_docs = [
        " ".join(rng.choice(vocab) for _ in range(20)) for _ in range(30)
    ]
    rows = []
    for i, text in enumerate(base_docs):
        rows.append((i, text))
        if rng.random() < 0.4:  # plant near-dups across the new/old split
            mut = text.split()
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
            rows.append((100 + i, " ".join(mut)))
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("x")
    )
    new = df.filter(F.col("doc_id") % 3 == 0)
    old = df.filter(F.col("doc_id") % 3 != 0)
    inc = incremental_ngram_pairs(new, old, "doc_id", "text", ["lang"], n=3,
                                  threshold=0.3)
    got = {(r.id_new, r.id_other) for r in inc.collect()}
    full = ngram_jaccard_pairs(df, "doc_id", "text", ["lang"], n=3, threshold=0.3)
    want = set()
    for r in full.collect():
        a_new, b_new = r.id_a % 3 == 0, r.id_b % 3 == 0
        if a_new and b_new:
            want.add((min(r.id_a, r.id_b), max(r.id_a, r.id_b)))
        elif a_new:
            want.add((r.id_a, r.id_b))
        elif b_new:
            want.add((r.id_b, r.id_a))
    assert got == want and len(want) > 0


def test_simhash_df_keeps_empty_docs(spark):
    from nba_data_pipeline_spark.operators.dedup import simhash_df

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real words here")], "doc_id long, text string"
    )
    rows = {r.doc_id: r.sh for r in simhash_df(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] == 0 and rows[2] == 0 and rows[3] != 0


def test_ngram_threshold_zero_rejected(spark):
    """The postings join cannot emit zero-overlap pairs, so threshold=0
    (which used to mean 'all same-block pairs') is refused loudly."""
    import pytest

    from nba_data_pipeline_spark.operators.dedup import (
        incremental_ngram_pairs,
        ngram_jaccard_pairs,
    )

    df = _docs(spark)
    with pytest.raises(ValueError, match="zero-overlap"):
        ngram_jaccard_pairs(df, "doc_id", "text", ["lang"], threshold=0.0)
    with pytest.raises(ValueError, match="zero-overlap"):
        incremental_ngram_pairs(df, df, "doc_id", "text", ["lang"], threshold=-0.5)


def test_dedup_lines_c4_rule(spark):
    """First occurrence (by doc_id, position) survives; later copies —
    including within-doc repeats — drop; a fully-boilerplate doc comes
    back with empty text, not a missing row."""
    from nba_data_pipeline_spark.operators.dedup import dedup_lines

    df = spark.createDataFrame(
        [
            (1, "unique alpha\nCOOKIE BANNER\nCOOKIE BANNER\nmore text"),
            (2, "COOKIE BANNER\nother words"),
            (3, "COOKIE BANNER"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped) for r in dedup_lines(
        df, "doc_id", "text").collect()}
    assert got[1] == ("unique alpha\nCOOKIE BANNER\nmore text", 3, 1)
    assert got[2] == ("other words", 1, 1)
    assert got[3] == ("", 0, 1)


def test_remove_repeated_spans_keep_first(spark):
    """keep_first=True: the lowest-id doc holding a repeated passage
    KEEPS it (including its own internal repeats); only other docs'
    copies are removed — exactly one canonical copy survives."""
    from nba_data_pipeline_spark.operators.dedup import remove_repeated_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e unique tail here"),
            (2, "prefix stuff a b c d e suffix"),
            (3, "a b c d e again a b c d e"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_kept, r.n_removed) for r in remove_repeated_spans(
        df, "doc_id", "text", n=5, min_repeat=2, keep_first=True).collect()}
    # doc 1 is the keeper: passage intact
    assert got[1] == ("a b c d e unique tail here", 8, 0)
    # docs 2/3 lose every copy of the passage
    assert got[2] == ("prefix stuff suffix", 3, 5)
    assert got[3] == ("again", 1, 10)
    # same-doc-only repeat: the doc is its own keeper, nothing removed
    solo = spark.createDataFrame(
        [(9, "p q r s t p q r s t")], "doc_id long, text string"
    )
    r = remove_repeated_spans(solo, "doc_id", "text", n=5, min_repeat=2,
                              keep_first=True).first()
    assert (r.text, r.n_kept, r.n_removed) == ("p q r s t p q r s t", 10, 0)


def test_remove_repeated_spans(spark):
    """Tokens covered by a corpus-repeated 5-gram vanish from EVERY
    occurrence (boilerplate stripping); short docs (< n tokens) and
    unique text pass through untouched."""
    from nba_data_pipeline_spark.operators.dedup import remove_repeated_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e unique tail here"),
            (2, "prefix stuff a b c d e suffix"),
            (3, "totally fresh words nothing shared"),
            (4, "x y"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_kept, r.n_removed) for r in remove_repeated_spans(
        df, "doc_id", "text", n=5, min_repeat=2).collect()}
    assert got[1] == ("unique tail here", 3, 5)
    assert got[2] == ("prefix stuff suffix", 3, 5)
    assert got[3] == ("totally fresh words nothing shared", 5, 0)
    assert got[4] == ("x y", 2, 0)
    # overlapping repeats: doc repeated inside ONE doc also strips
    solo = spark.createDataFrame(
        [(9, "p q r s t p q r s t")], "doc_id long, text string"
    )
    r = remove_repeated_spans(solo, "doc_id", "text", n=5, min_repeat=2).first()
    assert (r.text, r.n_kept, r.n_removed) == ("", 0, 10)

    import pytest

    with pytest.raises(ValueError, match="n must be"):
        remove_repeated_spans(df, "doc_id", "text", n=0)


def test_dedup_assign_best_priority_survivor(spark):
    """Cluster survivor is the highest-priority member (tie -> min id);
    component_id stays the min id so split keys are priority-stable."""
    from nba_data_pipeline_spark.operators.dedup import dedup_assign_best

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 99.0), (3, 50.0), (7, 5.0), (8, 5.0)],
        "doc_id long, quality double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    got = {r.doc_id: (r.component_id, r.is_canonical) for r in dedup_assign_best(
        docs, "doc_id", pairs, "quality").collect()}
    assert got[2] == (1, True) and got[1] == (1, False) and got[3] == (1, False)
    assert got[7] == (7, True) and got[8] == (7, False)  # tie -> min id


def test_subdoc_dedup_random_crosscheck(spark):
    """dedup_lines and remove_repeated_spans vs a brute-force Python
    model on a randomized corpus with planted boilerplate."""
    import random

    rng = random.Random(31)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    banner = "xx yy zz"
    docs = []
    for i in range(25):
        words = [rng.choice(vocab) for _ in range(rng.randrange(1, 12))]
        lines = [" ".join(words[j:j + 3]) for j in range(0, len(words), 3)]
        if rng.random() < 0.5:
            lines.insert(rng.randrange(len(lines) + 1), banner)
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # ---- dedup_lines model: first (doc_id, pos) occurrence survives
    from nba_data_pipeline_spark.operators.dedup import dedup_lines, remove_repeated_spans

    seen: set[str] = set()
    expect = {}
    for i, text in docs:
        kept = []
        dropped = 0
        for line in text.split("\n"):
            if line in seen:
                dropped += 1
            else:
                seen.add(line)
                kept.append(line)
        expect[i] = ("\n".join(kept), len(kept), dropped)
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped)
           for r in dedup_lines(df, "doc_id", "text").collect()}
    assert got == expect

    # ---- remove_repeated_spans model: n=3, min_repeat=2 over ALL grams
    n = 3
    from collections import Counter

    counts: Counter = Counter()
    toks = {i: text.replace("\n", " ").split(" ") for i, text in docs}
    df2 = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in toks.items()], "doc_id long, text string"
    )
    for t in toks.values():
        for s in range(len(t) - n + 1):
            counts[" ".join(t[s:s + n])] += 1
    expect2 = {}
    for i, t in toks.items():
        cover = set()
        for s in range(len(t) - n + 1):
            if counts[" ".join(t[s:s + n])] >= 2:
                cover.update(range(s, s + n))
        kept = [w for p, w in enumerate(t) if p not in cover]
        expect2[i] = (" ".join(kept), len(kept), len(t) - len(kept))
    got2 = {r.doc_id: (r.text, r.n_kept, r.n_removed)
            for r in remove_repeated_spans(df2, "doc_id", "text", n=n, min_repeat=2).collect()}
    assert got2 == expect2


@pytest.mark.slow  # r17: >18s; deselected by the default profile (driver budget), still run via -m slow at round close
def test_incremental_simhash_pairs_fingerprint_path(spark):
    """Incremental SimHash over persisted fingerprints: new side
    drives, re-ingested ids count as new, exact-Hamming verify agrees
    with the full-corpus path on the shared pair set."""
    from nba_data_pipeline_spark.operators.dedup import (
        incremental_simhash_pairs,
        simhash_df,
        simhash_near_pairs,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (1, base),                              # old
        (10, base),                             # new: exact dup of old 1
        (11, base.replace("kappa", "lambda")),  # new: near-dup of 1/10
        (12, "totally different content with none of those words present"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = simhash_df(df, "doc_id", "text")
    out = incremental_simhash_pairs(
        fps.filter("doc_id >= 10"), fps.filter("doc_id < 10"), max_hamming=6
    )
    got = {(r.id_new, r.id_other): r for r in out.collect()}
    assert (10, 1) in got and got[(10, 1)].hamming == 0
    assert got[(10, 1)].other_is_new is False
    assert (11, 10) not in got or (10, 11) in got  # new-new emitted once
    assert not any(k[0] == 1 for k in got)         # old never drives
    assert not any(12 in k for k in got)
    full = simhash_near_pairs(df, "doc_id", "text", max_hamming=6)
    full_pairs = {(r.id_a, r.id_b): r.hamming for r in full.collect()}
    for (a, b), r in got.items():
        assert full_pairs[(min(a, b), max(a, b))] == r.hamming
    # re-ingested id: old copy dropped, treated as new
    out2 = incremental_simhash_pairs(
        fps.filter("doc_id in (1, 10)"), fps, max_hamming=6
    )
    assert all(r.id_new in (1, 10) for r in out2.collect())


def test_subdoc_dedup_null_text_and_regex_sep(spark):
    """NULL text yields an empty-text row, never a missing doc; a
    regex-metacharacter separator is treated literally."""
    from nba_data_pipeline_spark.operators.dedup import dedup_lines, remove_repeated_spans

    df = spark.createDataFrame(
        [(1, "a|b|a"), (2, None), (3, "b|c")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.text, r.n_kept) for r in dedup_lines(
        df, "doc_id", "text", sep="|").collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == ("a|b", 2)          # within-doc dup 'a' dropped
    assert got[3] == ("c", 1)            # 'b' first seen in doc 1
    assert got[2][0] in ("", None) or got[2][0] == ""
    got2 = {r.doc_id for r in remove_repeated_spans(
        df, "doc_id", "text", n=2, min_repeat=2).collect()}
    assert got2 == {1, 2, 3}


@pytest.mark.slow  # r17: >18s; deselected by the default profile (driver budget), still run via -m slow at round close
def test_incremental_simhash_hot_bucket_star(spark):
    """A degenerate bucket (identical fingerprints beyond the cap)
    degrades to O(width) star pairs around the min id instead of a
    quadratic bucket join; the new side still drives every pair."""
    from nba_data_pipeline_spark.operators.dedup import (
        incremental_simhash_pairs,
        simhash_df,
    )

    text = "same words every time " * 3
    rows = [(i, text) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = simhash_df(df, "doc_id", "text")
    new = fps.filter("doc_id >= 20")
    old = fps.filter("doc_id < 20")
    out = incremental_simhash_pairs(new, old, max_hamming=0, max_bucket_width=5)
    pairs = {(r.id_new, r.id_other) for r in out.collect()}
    # star: hub is min id 0 (old) -> every NEW doc pairs with the hub only
    assert pairs == {(i, 0) for i in range(20, 30)}
    # cap disabled -> full new-driven fan-out (new x all, new-new once)
    full = incremental_simhash_pairs(new, old, max_hamming=0, max_bucket_width=None)
    n_full = full.count()
    assert n_full == 10 * 20 + (10 * 9) // 2


def test_dedup_lines_separator_with_embedded_quote_end(spark):
    r"""A separator containing \E must not terminate the regex quote
    early (Pattern.quote-style re-escaping)."""
    from nba_data_pipeline_spark.operators.dedup import dedup_lines

    sep = "\\E|"
    df = spark.createDataFrame(
        [(1, f"aaa{sep}bbb{sep}aaa"), (2, f"bbb{sep}ccc")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.text, r.n_kept, r.n_dropped) for r in dedup_lines(
        df, "doc_id", "text", sep=sep).collect()}
    assert got[1] == (f"aaa{sep}bbb", 2, 1)
    assert got[2] == ("ccc", 1, 1)


@pytest.mark.slow  # r17: >18s; deselected by the default profile (driver budget), still run via -m slow at round close
def test_bucket_pairs_lazy_eager_equivalence_randomized(spark):
    """The lazy (array-side) and eager (join-side) hot-bucket guards
    must emit identical pair sets on random bucket layouts — mixed
    small/hot buckets, singletons, cross-band duplicates."""
    import random

    from nba_data_pipeline_spark.operators.dedup import _bucket_pairs

    rng = random.Random(11)
    rows = []
    for band in range(4):
        for bucket in range(6):
            width = rng.choice([0, 1, 2, 3, 5, 9, 15])
            members = rng.sample(range(100), width)
            rows += [(band, bucket, m) for m in members]
            if members and width > 2:
                # duplicate (doc_id, band, bucket) rows: neither path
                # may emit self-pairs or double-pair the hub
                rows.append((band, bucket, members[0]))
    banded = spark.createDataFrame(rows, "band int, bucket long, doc_id long")
    for cap in (4, 8, 1000):
        lazy = {(r.id_a, r.id_b) for r in _bucket_pairs(banded, cap, eager_probe=False).collect()}
        eager = {(r.id_a, r.id_b) for r in _bucket_pairs(banded, cap, eager_probe=True).collect()}
        assert lazy == eager, f"cap={cap}: lazy != eager"
        assert all(a < b for a, b in lazy)
    # cap above every width == unguarded all-pairs
    unguarded = {(r.id_a, r.id_b) for r in _bucket_pairs(banded, None, eager_probe=False).collect()}
    capped = {(r.id_a, r.id_b) for r in _bucket_pairs(banded, 1000, eager_probe=False).collect()}
    assert unguarded == capped


def test_fuzzy_join_blocking_and_distance(spark):
    from nba_data_pipeline_spark.operators.dedup import fuzzy_join

    left = spark.createDataFrame(
        [(1, "Apple Inc"), (2, "appel inc"), (3, "Banana Corp"), (4, "Zebra LLC")],
        "id long, name string",
    )
    right = spark.createDataFrame(
        [("apple inc",), ("banana corpse",), ("aardvark",)], "clean string"
    )
    out = fuzzy_join(left, right, "name", "clean", max_distance=2)
    got = {(r.id, r.clean_matched): r.edit_distance for r in out.collect()}
    # case/trim-insensitive exact match, and a 2-edit transposition
    assert got[(1, "apple inc")] == 0
    assert got[(2, "apple inc")] == 2
    # 'banana corp' vs 'banana corpse' = 2 edits -> matched
    assert got[(3, "banana corpse")] == 2
    # zebra shares no first letter with any right key -> absent
    assert not any(i == 4 for (i, _) in got)
    # length-band prunes before the kernel: distance-3 pair never appears
    assert all(d <= 2 for d in got.values())


def test_incremental_components_matches_full_recompute(spark):
    """incremental_components(labels(old), new) == connected_components
    (old ∪ new) across the interesting cases in one graph: a new edge
    merging two old components, a brand-new node bridging into an old
    component, an unseen-only pair forming a fresh component, an
    internal edge (no-op), and a new node with a smaller id than the
    old component min (which must become the new component id)."""
    from nba_data_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    old = spark.createDataFrame(
        [(10, 11), (11, 12), (20, 21), (30, 31), (40, 41)],
        "id_a long, id_b long",
    )
    new = spark.createDataFrame(
        [
            (12, 20),   # merges {10..12} with {20,21}
            (50, 21),   # brand-new node into the merged component
            (60, 61),   # unseen-only pair
            (30, 31),   # internal edge of an old component (no-op)
            (1, 40),    # new node with SMALLER id than old min 40
        ],
        "id_a long, id_b long",
    )
    labels = connected_components(old)
    got = {
        r.doc_id: r.component_id
        for r in incremental_components(labels, new).collect()
    }
    want = {
        r.doc_id: r.component_id
        for r in connected_components(old.unionByName(new)).collect()
    }
    assert got == want
    assert want[21] == 10 and got[50] == 10      # merged + bridged
    assert got[60] == 60 and got[61] == 60       # fresh component
    assert got[30] == 30 and got[31] == 30       # untouched
    assert got[40] == 1 and got[41] == 1         # new smaller min wins


def test_incremental_components_noop_batch_keeps_labels(spark):
    """A batch whose every edge is internal to existing components (or
    a self-pair of an unseen node) must return the old labeling plus
    the lone new singleton — no condensed propagation at all."""
    from nba_data_pipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
    )

    old = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    labels = connected_components(old)
    new = spark.createDataFrame([(1, 3), (9, 9)], "id_a long, id_b long")
    got = {
        r.doc_id: r.component_id
        for r in incremental_components(labels, new).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}
