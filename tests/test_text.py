from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    language_id,
    quality_features,
    token_count,
    word_shingles,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("the cat sat on the mat",), ("hello",)], "text string")
    rows = df.select(
        token_count("text").alias("n"), bpe_ish_token_count("text").alias("b")
    ).collect()
    assert rows[0].n == 6 and rows[1].n == 1
    assert rows[1].b == 2  # ceil(5/4)


def test_language_id(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is here",), ("der hund und die katze ist da",), ("zzz qqq",)],
        "text string",
    )
    out = [r.pred_lang for r in language_id(df).collect()]
    assert out == ["en", "de", "und"]


def test_quality_features_ranges(spark):
    df = spark.createDataFrame([("the quick brown fox jumps over the lazy dog",)], "text string")
    r = quality_features(df).collect()[0]
    assert r.n_tokens == 9 and r.n_stopwords == 2
    assert 0.0 <= r.quality_score <= 1.0


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(word_shingles("text", 3).alias("sh")).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []  # shorter than n


def test_tf_idf(spark):
    from nba_data_pipeline_spark.operators.text import tf_idf

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry cherry date")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.term): (r.tf, r.doc_freq) for r in tf_idf(df, "doc_id", "text").collect()}
    assert out[(1, "apple")] == (2, 1)   # tf=2, only doc 1 has it
    assert out[(1, "banana")] == (1, 2)  # banana in docs 1 and 2
    assert out[(3, "cherry")] == (2, 2)


def test_scrub(spark):
    from pyspark.sql import functions as F
    from nba_data_pipeline_spark.operators.text import scrub

    df = spark.createDataFrame([("mail me at bob@x.com now",)], "text string")
    out = df.select(scrub("text", r"[a-z0-9.]+@[a-z0-9.]+", "[EMAIL]").alias("t")).collect()
    assert out[0].t == "mail me at [EMAIL] now"


def test_fingerprint_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame([("alpha beta",), ("beta alpha",), ("alpha beta",)], "text string")
    out = [r[0] for r in df.select(fingerprint("text")).collect()]
    assert out[0] == out[2]
    assert out[0] != out[1]


def test_chunk_text_windows_and_edges(spark):
    from nba_data_pipeline_spark.operators.text import chunk_text

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(40))),  # 40 tokens -> 3 chunks
         (2, "a b"),                                 # short -> 1 chunk
         (3, "")],                                   # empty -> 0 chunks
        "doc_id long, text string",
    )
    out = chunk_text(docs, "doc_id", "text", chunk_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 3 and 3 not in by_doc
    c = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # stride 12: starts at tokens 0, 12, 24; overlap carries 4 tokens over
    assert c[0].chunk_text.split()[:2] == ["t0", "t1"]
    assert c[1].chunk_text.split()[0] == "t12"
    assert c[0].chunk_text.split()[-4:] == c[1].chunk_text.split()[:4]  # the overlap
    assert c[2].n_tokens == 16 and c[2].chunk_text.split()[-1] == "t39"
    assert by_doc[2][0].n_tokens == 2

    # full coverage, no token lost: union of chunks covers every token
    covered = set()
    for r in by_doc[1]:
        covered.update(r.chunk_text.split())
    assert covered == {f"t{i}" for i in range(40)}

    import pytest as _p
    with _p.raises(ValueError):
        chunk_text(docs, "doc_id", "text", chunk_tokens=8, overlap=8)


def test_repetition_features(spark):
    from nba_data_pipeline_spark.operators.text import repetition_features

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # maximal repetition
            (2, "w x y z"),          # all distinct
            (3, "one"),              # single token: no bigrams
            (4, ""),                 # empty doc
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_features(df).collect()}
    r1, r2, r3, r4 = rows[1], rows[2], rows[3], rows[4]
    assert r1.n_tokens == 4 and r1.distinct_token_ratio == 0.25
    assert r1.top_token_ratio == 1.0
    # bigrams of "a a a a" = ["a a"]*3 -> 1 distinct of 3
    assert abs(r1.dup_bigram_ratio - (1 - 1 / 3)) < 1e-6
    assert r2.distinct_token_ratio == 1.0 and r2.dup_bigram_ratio == 0.0
    assert r2.top_token_ratio == 0.25
    assert r3.n_tokens == 1 and r3.dup_bigram_ratio == 0.0
    assert r4.n_tokens == 0 and r4.distinct_token_ratio is None
    assert r4.top_token_ratio is None and r4.dup_bigram_ratio == 0.0


def test_contamination_report(spark):
    from nba_data_pipeline_spark.operators.text import contamination_report

    corpus = spark.createDataFrame(
        [
            (1, "the exam answer is forty two exactly"),  # contains bench 5-gram
            (2, "completely unrelated text about cats and dogs"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the exam answer is forty two")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in contamination_report(corpus, bench, n=5).collect()}
    # doc 1: 3 distinct 5-grams, 2 shared with bench ("the exam answer is forty",
    # "exam answer is forty two")
    assert rows[1].n_shingles == 3 and rows[1].n_hits == 2
    assert rows[1].contaminated is True
    assert abs(rows[1].hit_ratio - 2 / 3) < 1e-5
    assert rows[2].n_hits == 0 and rows[2].contaminated is False
    # short corpus docs (<n tokens) still get a row: 0 shingles,
    # ratio 0, not contaminated
    tiny = spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    t = contamination_report(tiny, bench, n=5).collect()
    assert len(t) == 1 and t[0].n_shingles == 0
    assert t[0].hit_ratio == 0.0 and t[0].contaminated is False


def test_remove_contaminated_spans(spark):
    from nba_data_pipeline_spark.operators.text import remove_contaminated_spans

    corpus = spark.createDataFrame(
        [
            # contains the benchmark 3-gram "what is love" mid-document
            (1, "prefix words here what is love suffix words after"),
            (2, "totally clean document with no overlap at all"),
            (3, "what is love"),       # entire doc is the benchmark gram
            (4, "too short"),          # < n tokens: untouched
            (5, None),                 # NULL text: survives as empty
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("what is love baby",)], "text string")
    out = {
        r.doc_id: r
        for r in remove_contaminated_spans(corpus, bench, n=3).collect()
    }
    assert out[1].text == "prefix words here suffix words after"
    assert out[1].n_removed == 3
    assert out[2].text == "totally clean document with no overlap at all"
    assert out[2].n_removed == 0
    assert out[3].text == "" and out[3].n_removed == 3 and out[3].n_kept == 0
    assert out[4].text == "too short" and out[4].n_removed == 0
    assert out[5].n_kept == 1  # split('') -> one empty token, untouched
    assert len(out) == 5


def test_remove_contaminated_spans_overlapping_windows(spark):
    """Overlapping contaminated windows union their coverage, not
    double-count it."""
    from nba_data_pipeline_spark.operators.text import remove_contaminated_spans

    corpus = spark.createDataFrame(
        [(1, "a b c d e tail")], "doc_id long, text string"
    )
    # benchmark contains "a b c" and "b c d": coverage = positions 0-3
    bench = spark.createDataFrame([("a b c d",)], "text string")
    row = remove_contaminated_spans(corpus, bench, n=3).collect()[0]
    assert row.text == "e tail"
    assert row.n_removed == 4 and row.n_kept == 2


def test_trigram_language_id_recovers_distinct_languages(spark):
    """Fit + classify on three vocab-distinct languages: perfect
    self-recovery. (The driver's synthetic documents carry RANDOM lang
    labels over one shared vocabulary, so the oracle query
    `lang_id_trigram` proves value-parity, not accuracy — this fixture
    is where accuracy is provable.)"""
    from nba_data_pipeline_spark.operators.text import (
        fit_language_profiles,
        language_id_trigram,
    )

    vocab = {
        "aa": "the quick brown fox jumps over lazy dogs with vigor",
        "bb": "der schnelle braune fuchs springt ueber faule hunde",
        "cc": "le renard brun rapide saute par dessus les chiens",
    }
    rows = [
        (lang * 100 + i, f"{words} {words.split()[i % 5]}", lang_code)
        for lang, lang_code in ((1, "aa"), (2, "bb"), (3, "cc"))
        for i, words in ((j, vocab[lang_code]) for j in range(10))
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    prof = fit_language_profiles(docs, "text", "lang", top_k=50)
    out = language_id_trigram(docs, prof)
    got = {r.doc_id: r.pred_lang for r in out.collect()}
    for doc_id, _, lang_code in rows:
        assert got[doc_id] == lang_code, (doc_id, got[doc_id], lang_code)


def test_trigram_language_id_und_without_matching_grams(spark):
    from nba_data_pipeline_spark.operators.text import (
        fit_language_profiles,
        language_id_trigram,
    )

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "xx")], "doc_id long, text string, lang string"
    )
    prof = fit_language_profiles(train, "text", "lang")
    target = spark.createDataFrame(
        [(9, "0123456789"), (10, None)], "doc_id long, text string"
    )
    got = {r.doc_id: r.pred_lang for r in language_id_trigram(target, prof).collect()}
    assert got == {9: "und", 10: "und"}


def test_trigram_lm_perplexity_orders_fluent_before_gibberish(spark):
    from nba_data_pipeline_spark.operators.text import (
        fit_trigram_lm,
        trigram_lm_scores,
    )

    fluent = "the quick brown fox jumps over the lazy dog near the river bank"
    ref = spark.createDataFrame(
        [(i, fluent) for i in range(20)], "doc_id long, text string"
    )
    lm = fit_trigram_lm(ref, "text", top_k=500)
    target = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),  # in-domain
            (2, "zxq vvk jjw qqp zzx mmk wwj"),  # gibberish
            (3, ".."),  # no grams after normalization
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in trigram_lm_scores(target, lm).collect()}
    assert got[1].avg_nll_e6 < got[2].avg_nll_e6
    assert got[3].n_grams == 0 and got[3].avg_nll_e6 is None
    # integer fixed-point: exact, positive micro-nats
    assert isinstance(got[1].avg_nll_e6, int) and got[1].avg_nll_e6 > 0


def test_perplexity_buckets_terciles_deterministic(spark):
    from nba_data_pipeline_spark.operators.text import perplexity_buckets

    scored = spark.createDataFrame(
        [(i, "en", (i * 37) % 9 + 1) for i in range(9)]
        + [(100, "en", None)],  # gram-less doc -> tail
        "doc_id long, lang string, avg_nll_e6 long",
    )
    out = perplexity_buckets(scored, "lang")
    rows = {r.doc_id: (r.ppl_bucket, r.ppl_band) for r in out.collect()}
    from collections import Counter

    counts = Counter(b for b, _ in rows.values())
    assert counts == {1: 4, 2: 3, 3: 3}  # ntile spreads 10 rows 4/3/3
    assert rows[100] == (3, "tail")  # NULL sorts last
    assert {b for _, b in rows.values()} == {"head", "middle", "tail"}


def test_normalized_text_unicode_preserves_scripts(spark):
    from nba_data_pipeline_spark.operators.text import normalized_text

    rows = [
        (1, "Héllo, Wörld! Ça va?"),
        (2, "机器学习 很有趣 123"),
        (3, "Привет -- мир!"),
        (4, "plain ascii text"),
    ]
    df = spark.createDataFrame(rows, "i long, text string")
    out = {r.i: (r.a, r.u) for r in df.select(
        "i",
        normalized_text("text").alias("a"),
        normalized_text("text", unicode=True).alias("u"),
    ).collect()}
    # ascii mode strips every non-latin letter
    assert out[1][0] == "h llo w rld a va"
    assert out[2][0] == "123"
    assert out[3][0] == ""
    # unicode mode preserves the scripts, collapses punctuation
    assert out[1][1] == "héllo wörld ça va"
    assert out[2][1] == "机器学习 很有趣 123"
    assert out[3][1] == "привет мир"
    assert out[4][0] == out[4][1] == "plain ascii text"


def test_bm25_matches_pure_python_reference(spark):
    import math

    from nba_data_pipeline_spark.operators.text import bm25_scores, bm25_topk

    corpus = [
        (1, "spark shuffle join spark"),
        (2, "window agg shuffle"),
        (3, "join join join filter"),
        (4, "spark window"),
    ]
    queries = [(10, "spark join"), (11, "window"), (12, "absentterm")]
    k1, b = 1.2, 0.75

    docs = {i: t.split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    dfreq = {}
    for toks in docs.values():
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    expected = {}
    for qid, qtext in queries:
        for d, toks in docs.items():
            s = 0
            for t in set(qtext.split()):
                tf = toks.count(t)
                if tf == 0 or t not in dfreq:
                    continue
                idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
                s += round(idf * (tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))) * 1e6)
            if s:
                expected[(qid, d)] = s

    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, query_text string")
    got = {(r.query_id, r.doc_id): r.bm25_e6 for r in bm25_scores(cdf, qdf).collect()}
    assert got == expected

    top = bm25_topk(cdf, qdf, k=2).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.bm25_e6))
    assert 12 not in by_q  # no matching docs -> absent
    for qid, rows in by_q.items():
        rows.sort()
        want = sorted(((v, -d) for (q, d), v in expected.items() if q == qid), reverse=True)[:2]
        assert [(v, -d) for _, d, v in rows] == want
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))


def test_gopher_rules_each_rule_fires(spark):
    from nba_data_pipeline_spark.operators.text import gopher_rules

    good = "the cat and the dog have fun with all of that good food today"
    docs = [
        (1, good),                                    # passes everything
        (2, "the and of"),                            # too few tokens
        (3, "aaaaaaaaaaaaaaa " * 12 + "the and of something"),  # mean word len too high
        (4, good + " ###" * 12),                      # symbol ratio
        (5, "- the cat\n- and dog\n- have fun"),      # all bullet lines
        (6, "the cat...\nand dog...\nhave fun..."),   # ellipsis lines
        (7, "the and 1 2 3 4 5 6 7 8 9 10 11 12"),    # alpha ratio
        (8, "cat dog bird fish lion tiger bear wolf fox deer elk owl"),  # no stopwords
        (9, ""),                                      # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.doc_id: r.asDict()
        for r in gopher_rules(df, min_tokens=10, max_mean_word_len=8.0,
                              min_distinct_stopwords=2).collect()
    }
    assert out[1]["gopher_keep"] is True
    assert out[2]["rule_token_count"] is False
    assert out[3]["rule_mean_word_len"] is False
    assert out[4]["rule_symbol_ratio"] is False
    assert out[5]["rule_bullet_lines"] is False
    assert out[6]["rule_ellipsis_lines"] is False
    assert out[7]["rule_alpha_words"] is False
    assert out[8]["rule_stopwords"] is False
    assert out[9]["rule_token_count"] is False and out[9]["gopher_keep"] is False
    for d in range(2, 10):
        assert out[d]["gopher_keep"] is False


def test_hard_negatives_excludes_positives_and_reranks(spark):
    from nba_data_pipeline_spark.operators.text import bm25_topk, hard_negatives

    corpus = [
        (1, "spark shuffle join spark"),
        (2, "spark spark spark window"),
        (3, "join filter spark"),
        (4, "window agg only"),
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame([(10, "spark")], "query_id long, query_text string")
    top = bm25_topk(cdf, qdf, k=1).collect()
    pos = spark.createDataFrame([(10, top[0].doc_id)], "query_id long, doc_id long")
    negs = hard_negatives(cdf, qdf, pos, n_negatives=2, depth=10).collect()
    neg_ids = [r.doc_id for r in sorted(negs, key=lambda r: r.neg_rank)]
    assert top[0].doc_id not in neg_ids          # gold positive removed
    assert len(neg_ids) == 2
    assert [r.neg_rank for r in sorted(negs, key=lambda r: r.neg_rank)] == [1, 2]
    # negatives are the next-best scoring docs in order
    full = {r.doc_id: r.bm25_e6 for r in bm25_topk(cdf, qdf, k=10).collect()}
    expected = sorted((s, -d) for d, s in full.items() if d != top[0].doc_id)[::-1][:2]
    assert [( -x[1]) for x in expected] == neg_ids


def test_bm25_index_reuse_matches_direct(spark, tmp_path):
    """Persisted-index path == direct path: write the index artifacts
    to parquet, read them back, query — identical scores."""
    from nba_data_pipeline_spark.operators.text import bm25_index, bm25_scores

    corpus = spark.createDataFrame(
        [(1, "spark shuffle join spark"), (2, "window agg shuffle"), (3, "join filter")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame([(10, "spark join")], "query_id long, query_text string")
    direct = {(r.query_id, r.doc_id): r.bm25_e6 for r in bm25_scores(corpus, qdf).collect()}

    tf, dl, dfreq = bm25_index(corpus)
    paths = {}
    for name, df in [("tf", tf), ("dl", dl), ("df", dfreq)]:
        p = str(tmp_path / name)
        df.write.parquet(p)
        paths[name] = p
    idx = (
        spark.read.parquet(paths["tf"]),
        spark.read.parquet(paths["dl"]),
        spark.read.parquet(paths["df"]),
    )
    via_index = {(r.query_id, r.doc_id): r.bm25_e6
                 for r in bm25_scores(None, qdf, index=idx).collect()}
    assert via_index == direct and direct

    import pytest as _p
    with _p.raises(ValueError, match="corpus or index"):
        bm25_scores(None, qdf)


def test_html_to_text_extraction(spark):
    from nba_data_pipeline_spark.operators.text import extract_html_text

    html = (
        '<html><head><style>.a{x}</style><script>if (1<2) alert("hi")</script>'
        "</head><body><!-- menu --><h1>Title</h1>"
        "<p>Hello &amp; welcome to a &lt;great&gt; page.</p>"
        "<div>Second   block</div></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None), (3, "plain, no markup")],
                               "doc_id long, html string")
    out = {r.doc_id: r for r in extract_html_text(df).collect()}
    t = out[1].text
    # script/style/comment payloads gone entirely
    assert "alert" not in t and ".a{x}" not in t and "menu" not in t
    # block boundaries became newlines; entities decoded; spaces collapsed
    assert "Title" in t.splitlines()[0]
    assert "Hello & welcome to a <great> page." in t
    assert "Second block" in t
    assert out[1].markup_ratio > 0.5
    assert out[2].text is None and out[2].n_chars == 0 and out[2].markup_ratio == 0.0
    assert out[3].text == "plain, no markup" and out[3].markup_ratio == 0.0


def test_html_to_text_amp_decodes_last(spark):
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.operators.text import html_to_text

    # '&amp;lt;' is the ESCAPED literal '&lt;' - must decode to '&lt;',
    # not recursively to '<'
    df = spark.createDataFrame([("x &amp;lt; y",)], "h string")
    assert df.select(html_to_text("h").alias("t")).collect()[0].t == "x &lt; y"


def test_c4_rules_line_and_doc_gates(spark):
    from nba_data_pipeline_spark.operators.text import c4_rules

    good = ("the first line has enough words to survive here.\n"
            "short one.\n"
            "another qualifying sentence with plenty of words inside!")
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "only one surviving line with enough words right here.\nno stop"),
            (3, "looks fine with many words in this line.\n"
                "var x = { a: 1 } with sufficient words too."),
            (4, "this line mentions our cookie policy with many words here."),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in c4_rules(docs, min_kept_lines=2).collect()}
    # doc 1: lines 1+3 survive (line 2 runt); keeps
    assert out[1].c4_keep and out[1].n_kept_lines == 2
    assert "short one." not in out[1].text_clean
    # doc 2: one kept line < 2
    assert not out[2].rule_min_lines and not out[2].c4_keep
    # doc 3: brace kills the doc even though lines pass
    assert out[3].rule_min_lines is False or True  # lines: only line1 has terminal punct
    assert not out[3].rule_no_brace and not out[3].c4_keep
    # doc 4: blocklist phrase drops the line
    assert out[4].n_kept_lines == 0
    # doc 5: null text -> zero lines, fails min-lines, no crash
    assert out[5].n_lines == 0 and not out[5].c4_keep


def test_bad_words_gate_exact_token_match(spark):
    from nba_data_pipeline_spark.operators.text import bad_words_gate

    docs = spark.createDataFrame(
        [
            (1, "clean classify grass"),   # substrings must NOT hit
            (2, "one BADWORD here"),       # case-insensitive exact hit
            (3, "badword badword pad"),    # multiplicity counted
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bad_words_gate(docs, ("badword",)).collect()}
    assert out[1].n_bad_words == 0 and out[1].bad_words_keep
    assert out[2].n_bad_words == 1 and not out[2].bad_words_keep
    assert out[3].n_bad_words == 2 and abs(out[3].bad_words_ratio - 2 / 3) < 1e-9
    assert out[4].n_bad_words == 0 and out[4].bad_words_keep

    import pytest as _p
    with _p.raises(ValueError, match="non-empty"):
        bad_words_gate(docs, ())


def test_split_sentences_and_sentence_chunks(spark):
    from nba_data_pipeline_spark.operators.text import sentence_chunks, split_sentences

    df = spark.createDataFrame(
        [(1, "First sentence here. Second one is a bit longer! Third? trailing bit"),
         (2, ""), (3, None)],
        "doc_id long, text string",
    )
    sents = df.select("doc_id", split_sentences("text").alias("s")).collect()
    got = {r.doc_id: list(r.s) for r in sents}
    assert got[1] == [
        "First sentence here.", "Second one is a bit longer!", "Third?", "trailing bit",
    ]
    assert got[2] == [] and got[3] == []

    # chunking: 4 sentences of 3/6/1/2 tokens, max_tokens=6 ->
    # cum_before = 0,3,9,10 -> chunks 0,0,1,1; sentences never split
    out = {(r.doc_id, r.chunk_idx): r for r in sentence_chunks(
        df, "doc_id", max_tokens=6).collect()}
    assert out[(1, 0)].chunk_text == "First sentence here. Second one is a bit longer!"
    assert out[(1, 1)].chunk_text == "Third? trailing bit"
    assert out[(1, 0)].n_sentences == 2 and out[(1, 0)].n_tokens == 9
    assert out[(1, 1)].n_tokens == 3
    # empty/null docs produce no chunks
    assert {k[0] for k in out} == {1}


def test_encoding_quality_counts_and_gate(spark):
    from nba_data_pipeline_spark.operators.text import encoding_quality

    clean = "a perfectly ordinary sentence with nothing wrong in it at all"
    df = spark.createDataFrame(
        [
            (1, clean),
            (2, "cafÃ© �� mid\x07dle â€™"),
            (3, "tabs\tand\nnewlines\rare fine"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in encoding_quality(df).collect()}
    assert (got[1].n_replacement, got[1].n_control, got[1].n_mojibake) == (0, 0, 0)
    assert got[1].encoding_ok
    # doc 2: two U+FFFD, one BEL, 'Ã©' + 'â€™' markers
    assert (got[2].n_replacement, got[2].n_control, got[2].n_mojibake) == (2, 1, 2)
    assert not got[2].encoding_ok
    assert got[2].bad_char_ratio_e6 == 5 * 1_000_000 // len(
        "cafÃ© �� mid\x07dle â€™"
    )
    # tab/LF/CR are NOT control damage
    assert got[3].n_control == 0 and got[3].encoding_ok
    # null/empty text: zero counts, gate passes, no division error
    for d in (4, 5):
        assert got[d].bad_char_ratio_e6 == 0 and got[d].encoding_ok


def test_vocab_table_and_oov_rate(spark):
    from nba_data_pipeline_spark.operators.text import oov_rate, vocab_table

    df = spark.createDataFrame(
        [
            (1, "aa aa aa bb"),      # aa x3, bb x1
            (2, "aa bb cc"),
            (3, "zz zz"),
            (4, ""),                 # no tokens -> no output row
        ],
        "doc_id long, text string",
    )
    vocab = vocab_table(df, min_count=3)  # only 'aa' (4 occurrences)
    assert {r.token for r in vocab.collect()} == {"aa"}
    got = {r.doc_id: r for r in oov_rate(df, "doc_id", "text", vocab).collect()}
    assert set(got) == {1, 2, 3}
    assert (got[1].n_tokens, got[1].n_oov, got[1].oov_rate_e6) == (4, 1, 250000)
    assert (got[2].n_tokens, got[2].n_oov) == (3, 2)
    assert got[3].oov_rate_e6 == 1_000_000


def test_collocations_integer_pmi(spark):
    from nba_data_pipeline_spark.operators.text import collocations

    # corpus: "a b" x3 in doc1 (and one "b a" crossing), "a b" x2 doc2,
    # "c d" x1 (below min_count)
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b"), (3, "c d")],
        "doc_id long, text string",
    )
    out = {
        (r.token_a, r.token_b): r
        for r in collocations(df, min_count=2).collect()
    }
    # N=10 tokens; a x4, b x4; bigrams: doc1 a-b x3 + b-a x2, doc2 a-b x1
    ab = out[("a", "b")]
    assert (ab.n_pair, ab.n_a, ab.n_b) == (4, 4, 4)
    assert ab.pmi_ratio_e6 == 10 * 4 * 1_000_000 // (4 * 4)
    ba = out[("b", "a")]
    assert ba.n_pair == 2
    # c-d below min_count
    assert ("c", "d") not in out
    # multiplicity preserved: distinct-shingle semantics would give n_pair 2


def test_template_groups_structure_dedup(spark):
    from nba_data_pipeline_spark.operators.text import (
        template_fingerprint,
        template_groups,
    )

    # docs 1 and 2: same structure (3,2 words/line), different words;
    # doc 3: different structure; doc 4: blank lines ignored -> same
    # shape as 1/2; doc 5: empty
    df = spark.createDataFrame(
        [
            (1, "one two three\nfour five"),
            (2, "alpha beta gamma\ndelta epsilon"),
            (3, "single\nline here ok\nmore"),
            (4, "a b c\n\n  \nd e"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in template_groups(df, "doc_id", min_docs=2).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].template_fp == out[2].template_fp == out[4].template_fp
    assert out[1].n_docs == 3
    # empty doc fingerprints the empty sequence, unique here
    fps = {r.doc_id: r.fp for r in df.select(
        "doc_id", template_fingerprint("text").alias("fp")).collect()}
    assert fps[5] != fps[1] and fps[3] != fps[1]


def test_compression_ratio_orders_repetitive_below_random(spark):
    import random as _r

    from nba_data_pipeline_spark.operators.text import compression_ratios

    rng = _r.Random(8)
    rows = [
        (1, "spam ham " * 300),                                   # repetitive
        (2, " ".join(rng.choice("abcdefghij") * rng.randint(1, 8)
                     for _ in range(400))),                        # mixed
        (3, "".join(chr(rng.randint(33, 126)) for _ in range(2000))),  # noise
        (4, ""),                                                   # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in compression_ratios(df, "doc_id").collect()}
    assert got[4].ratio_e6 is None and got[4].raw_len == 0
    # repetitive << mixed << noise; noise barely compresses
    assert got[1].ratio_e6 < got[2].ratio_e6 < got[3].ratio_e6
    assert got[1].ratio_e6 < 100_000          # >10x compression
    assert got[3].ratio_e6 > 700_000
    # fixed point consistent with the raw counts
    for d in (1, 2, 3):
        r = got[d]
        assert r.ratio_e6 == r.compressed_len * 1_000_000 // r.raw_len
