"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in Column expressions (JVM-side, codegen):
tokenization via ``split``, counts via ``size``/``length``, heuristic
language ID and fingerprints via higher-order array functions. No
Python UDFs — at 100 TB these run inside whole-stage codegen on the
scan output with full predicate/column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Tiny per-language marker vocabularies for the n-gram/stopword
# heuristic language id. Deterministic and engine-portable (pure
# token-set arithmetic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace; empty
    strings dropped so blank text yields 0 tokens, not 1)."""
    return F.filter(F.split(F.trim(_col(text)), r"\s+"), lambda t: t != "")


def exploded_tokens(
    df: "DataFrame", keep_cols: "list[str]", text_col: str, out_col: str = "token"
) -> "DataFrame":
    """One row per (keep_cols..., token) — equals
    ``explode(tokens(text))`` row-for-row, but splits then filters the
    exploded rows RELATIONALLY (r16, guide §4.1): the array-``filter``
    HOF inside ``tokens`` is interpreted per element, which dominates
    token fan-outs (measured 2.0s -> 1.3s on the simhash vote pass).
    The only elements ``split`` produces that ``tokens`` drops are the
    single empty string of blank/whitespace-only text (trim + split on
    runs guarantees interior tokens are never empty), so a post-explode
    ``!= ''`` filter is exactly the HOF filter; NULL text explodes to
    no rows on both paths."""
    raw = F.explode(F.split(F.trim(_col(text_col)), r"\s+")).alias(out_col)
    return df.select(*keep_cols, raw).filter(F.col(out_col) != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """A BPE-flavored token estimate: word-piece count where each word
    contributes ceil(len/4) pieces (common ~4-chars-per-token rule)."""
    per_word = F.transform(tokens(text), lambda t: F.ceil(F.length(t) / F.lit(4.0)))
    return F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x)


def stopword_count(text: Column | str, stopwords: tuple[str, ...]) -> Column:
    toks = tokens(text)
    matches = F.filter(toks, lambda t: F.lower(t).isin(*stopwords))
    return F.size(matches)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / stopword ratio features + a composite score.

    The score is a deterministic linear blend clamped to [0, 1]:
    rewarded for mid-range doc length, average word length near
    English norms, and a sane stopword ratio — the standard cheap
    pre-filter shape for pretraining corpora.
    """
    t = _col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_stop = stopword_count(t, LANG_MARKERS["en"])
    avg_tok = n_chars.cast("double") / n_tokens
    stop_ratio = n_stop.cast("double") / n_tokens
    score = (
        F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0)) * 0.4
        + F.when((avg_tok >= 3.0) & (avg_tok <= 8.0), 1.0).otherwise(0.0) * 0.3
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * 0.3
    )
    return df.withColumns(
        {
            "n_chars_calc": n_chars.cast("long"),
            "n_tokens": n_tokens.cast("long"),
            "n_stopwords": n_stop.cast("long"),
            # raw doubles: rounding policy is the caller's (engines
            # disagree on decimal-tie rounding, so don't bake one in)
            "avg_token_len": avg_tok,
            "stopword_ratio": stop_ratio,
            "quality_score": score,
        }
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Marker-token language ID: count each language's marker tokens;
    predict the argmax (ties broken by language code order); 'und'
    when no markers hit. One pass over the token array per language."""
    toks = tokens(_col(text_col))
    langs = sorted(LANG_MARKERS)
    counts = {lang: F.size(F.filter(toks, lambda t: F.lower(t).isin(*LANG_MARKERS[lang]))) for lang in langs}
    best = F.greatest(*[counts[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier lang wins ties -> build from the back
        pred = F.when((counts[lang] == best) & (best > 0), lang).otherwise(pred)
    cols = {f"n_{lang}": counts[lang].cast("long") for lang in langs}
    cols[out_col] = pred
    return df.withColumns(cols)


def char_trigrams(text: Column | str) -> Column:
    """Character trigrams of the space-padded normalized text, built
    array-side (sequence + substr — no token self-join). The padding
    makes word-boundary grams (' th', 'he ') first-class signal, as in
    the classic n-gram language identifier.

    The normalized text is bound to a LAMBDA VARIABLE via a
    single-element array before the per-position transform: a lambda
    referencing a non-attribute subtree re-evaluates it per element,
    which here means re-running the normalize regex once per character
    — O(len^2) per document (measured 18s -> 1.3s for one explode at
    sf0.1). Binding through ``transform(array(t), ...)`` keeps the
    whole thing a pure Column expression (no projection required of
    the caller) while evaluating the regex exactly once per row."""
    t = F.concat(F.lit(" "), normalized_text(text), F.lit(" "))
    per_t = F.transform(
        F.array(t),
        lambda tt: F.when(
            F.length(tt) >= 3,
            F.transform(
                F.sequence(F.lit(1), F.length(tt) - 2),
                lambda i: tt.substr(i, F.lit(3)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    return F.element_at(per_t, 1)


def fit_language_profiles(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_k: int = 200,
) -> DataFrame:
    """Per-language character-trigram log-frequency profiles from
    labeled text — the Cavnar-Trenkle (1994) n-gram identifier's fit
    step as two hash aggregates plus a per-language top-k window.
    Output: (lang, gram, logp) with logp = ln(n / total) rounded to
    6 dp (cross-engine-stable), O(languages x top_k) rows — broadcast
    material. At 100 TB the fit runs on a labeled sample; the profile
    table stays tiny regardless of corpus size."""
    grams = df.select(
        F.col(lang_col).alias("lang"), F.explode(char_trigrams(text_col)).alias("gram")
    )
    counts = grams.groupBy("lang", "gram").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("lang").orderBy(F.col("_n").desc(), F.col("gram"))
    topk = counts.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= top_k
    )
    totals = topk.groupBy("lang").agg(F.sum("_n").alias("_tot"))
    return topk.join(totals, "lang").select(
        "lang", "gram", F.round(F.log(F.col("_n") / F.col("_tot")), 6).alias("logp")
    )


def language_id_trigram(
    df: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "pred_lang",
    unseen_logp: float = -20.0,
) -> DataFrame:
    """Classify with fitted trigram profiles: explode document
    trigrams, broadcast-join the profile table, and score each
    (doc, language) as a naive-Bayes log-likelihood over ALL of the
    document's grams — matched grams contribute their profile logp,
    unmatched grams the ``unseen_logp`` floor. Summing only matched
    grams would be backwards (every logp is negative, so the language
    matching FEWEST grams would win); with the floor, each matched
    gram improves a language's score by (logp - floor) > 0.
    ``unseen_logp`` must sit below every profile logp (-20 ~= 2e-9
    probability; lower it if a fit's top-k total count approaches
    e^20). Scores round to 6 dp before ranking so FP summation order
    can't flip cross-engine ties; exact ties break to the first
    language code. Documents matching no profile gram predict 'und'.

    Languages with zero matched grams never need scoring: their score
    n_grams * floor is strictly below any matched language's. At scale
    this is one explode + broadcast join + shuffles on (doc, lang) and
    doc only."""
    docs = df.select(F.col(id_col), F.explode(char_trigrams(text_col)).alias("gram"))
    n_grams = docs.groupBy(id_col).agg(F.count("*").alias("_ng"))
    scored = (
        docs.join(F.broadcast(profiles), "gram")
        .groupBy(id_col, "lang")
        .agg(F.sum("logp").alias("_sum"), F.count("*").alias("_k"))
        .join(n_grams, id_col)
        .withColumn(
            "_score",
            F.round(
                F.col("_sum") + (F.col("_ng") - F.col("_k")) * F.lit(unseen_logp), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_score").desc(), F.col("lang"))
    best = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col("lang").alias(out_col))
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit("und")))
    )


def fit_trigram_lm(df: DataFrame, text_col: str = "text", top_k: int = 2000) -> DataFrame:
    """Character-trigram language model fitted on a reference corpus —
    the fit step of CCNet-style perplexity filtering (Wenzek et al.
    2020 train a Kneser-Ney LM on Wikipedia; the trigram analogue here
    keeps the whole pipeline inside two hash aggregates). Output:
    (gram, logp_e6) where logp_e6 = round(ln(n / total) * 1e6) as
    BIGINT — fixed-point so every downstream sum is an exact integer
    aggregate, immune to FP summation-order divergence across engines.

    Scale shape: the normalized alphabet is [a-z0-9 ], so the distinct
    trigram universe is bounded (~50k rows) regardless of corpus size;
    the global top-k window runs on that bounded aggregate, and the
    result is broadcast material."""
    grams = df.select(F.explode(char_trigrams(text_col)).alias("gram"))
    counts = grams.groupBy("gram").agg(F.count("*").alias("_n"))
    w = Window.orderBy(F.col("_n").desc(), F.col("gram"))
    topk = counts.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= top_k)
    totals = topk.agg(F.sum("_n").alias("_tot"))
    return topk.crossJoin(F.broadcast(totals)).select(
        "gram",
        F.round(F.log(F.col("_n") / F.col("_tot")) * 1e6, 0)
        .cast("long")
        .alias("logp_e6"),
    )


def trigram_lm_scores(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unseen_logp_e6: int = -20_000_000,
) -> DataFrame:
    """Per-document LM surprise under a fitted ``fit_trigram_lm`` model
    — the scoring step of CCNet-style quality filtering: documents that
    look like the reference corpus score a LOW average negative
    log-likelihood ("head"), gibberish and boilerplate score high
    ("tail"). Output: (id, n_grams, avg_nll_e6) where avg_nll_e6 =
    -(sum matched logp_e6 + unseen_count * floor) div n_grams — all
    integer arithmetic (exact, order-independent), positive, in
    micro-nats per gram; perplexity = exp(avg_nll_e6 / 1e6). Documents
    with no grams (text shorter than a trigram) get NULL.

    Scale shape: one explode, one broadcast join against the bounded LM
    table, two hash aggregates keyed on the doc id — the same plan
    family as ``language_id_trigram``."""
    docs = df.select(F.col(id_col), F.explode(char_trigrams(text_col)).alias("gram"))
    ng = docs.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    matched = (
        docs.join(F.broadcast(lm), "gram")
        .groupBy(id_col)
        .agg(F.sum("logp_e6").alias("_sum_e6"), F.count("*").alias("_k"))
    )
    scored = (
        ng.join(matched, id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.expr(
                f"(-(coalesce(_sum_e6, 0L) + (n_grams - coalesce(_k, 0L))"
                f" * {unseen_logp_e6}L)) div n_grams"
            ).alias("avg_nll_e6"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            "avg_nll_e6",
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    by_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet head/middle/tail assignment: per-``by_col`` (typically
    language) equal-count buckets of ``avg_nll_e6``, lowest surprise
    first — bucket 1 is "head" (keep), the last is "tail" (drop or
    down-sample). Ties break on the id so the assignment is
    deterministic. ntile is a per-group window (one shuffle keyed on
    ``by_col``); no global sort. NULL-scored rows (gram-less docs)
    sort last per SQL default and land in the tail bucket — the
    conservative choice for unjudgeable documents."""
    w = Window.partitionBy(by_col).orderBy(
        F.col("avg_nll_e6").asc_nulls_last(), F.col(id_col)
    )
    labels = ["head", "middle", "tail"]
    out = scored.withColumn("ppl_bucket", F.ntile(n_buckets).over(w))
    if n_buckets == 3:
        out = out.withColumn(
            "ppl_band",
            F.element_at(F.array(*[F.lit(x) for x in labels]), F.col("ppl_bucket")),
        )
    return out


def fingerprint(text: Column | str, modulus: int = 2_147_483_647) -> Column:
    """Deterministic position-weighted rolling fingerprint over tokens:
    sum_i (i+1) * (31 * first_char_code(tok_i) + len(tok_i)) mod M.
    Portable across engines (no engine-specific hash), order-sensitive
    like a rolling hash, cheap enough to run on every document."""
    toks = tokens(_col(text))
    contrib = F.transform(
        toks,
        lambda t, i: (i + 1).cast("long")
        * (F.ascii(F.substring(t, 1, 1)).cast("long") * 31 + F.length(t).cast("long")),
    )
    return F.pmod(
        F.aggregate(contrib, F.lit(0).cast("long"), lambda acc, x: acc + x), F.lit(modulus)
    )


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Term frequency / inverse document frequency, fully relational:
    explode tokens -> tf per (doc, term) -> df per term -> idf join.
    Two aggregations + one broadcast-able join; at corpus scale the
    term-df side is tiny relative to the postings and broadcasts.
    Output: (doc_id, term, tf, doc_freq, tfidf) with tfidf = tf * ln(N/df).
    """
    n_docs = df.count()
    postings = exploded_tokens(
        df.select(F.col(id_col).alias("doc_id"), text_col), ["doc_id"], text_col, "term"
    )
    tf = postings.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    docfreq = (
        postings.dropDuplicates(["doc_id", "term"])
        .groupBy("term")
        .agg(F.count("*").alias("doc_freq"))
    )
    return tf.join(F.broadcast(docfreq), "term").select(
        "doc_id",
        "term",
        "tf",
        "doc_freq",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("doc_freq"))).alias("tfidf"),
    )


def bm25_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the reusable BM25 index artifacts — ONE corpus pass that
    production persists (e.g. parquet bucketed by term) and amortizes
    over every query batch, instead of re-exploding 100 TB per search:

    returns ``(tf, doclen, dfreq)`` where tf = (doc_id, term, tf),
    doclen = (doc_id, dl), dfreq = (term, doc_freq). ``bm25_scores``
    accepts these via ``index=``; corpus growth is handled by
    ``streaming.ops.bm25_ingest_batch`` (membership-filtered postings
    merge + additive dfreq fold, with ``bm25_query_index`` /
    ``bm25_takedown`` — scores stay integer-identical to this
    one-shot path, oracled by ``bm25_state_gate``).

    dfreq derives FROM tf (doc_freq = rows per term of the already
    (doc, term)-deduped tf table) rather than re-exploding the corpus —
    its shuffle input is the aggregated tf, strictly smaller than raw
    postings. ``materialize=True`` checkpoints tf first so the two
    consumers (score join + dfreq) share ONE explode — the ephemeral
    single-query shape; leave False when persisting the artifacts,
    where the parquet write is the materialization."""
    # deliberately NO spread before the token fan-out (r17, VERDICT r16
    # #3): the r16 explicit-width repartition pinned the checkpointed tf
    # at full session width, which pins EVERY downstream stage (dfreq,
    # score join, window) at that width too — AQE can no longer
    # coalesce them, and the added per-stage task overhead outweighed
    # the parallel explode on every measured corpus (interleaved
    # min-of-4 at sf0.1: 1.67 s without vs 2.09 s with). At scale the
    # corpus scan is already wide and the explode parallel without help.
    postings = exploded_tokens(
        corpus.select(F.col(id_col).alias("doc_id"), text_col),
        ["doc_id"],
        text_col,
        "term",
    )
    tf = postings.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    if materialize:
        tf = tf.localCheckpoint(eager=False)
    doclen = corpus.select(
        F.col(id_col).alias("doc_id"), token_count(text_col).cast("long").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    return tf, doclen, dfreq


def bm25_scores(
    corpus: DataFrame | None,
    query_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Okapi BM25 ranked retrieval, fully relational.

    Plan shape (the 100-TB one): the corpus is exploded ONCE into a
    (doc, term, tf) postings table partitioned by term; the query-term
    table is tiny and broadcast, so only postings matching some query
    term are ever touched — no crossJoin, no per-query corpus scan.
    Document-length normalization joins the per-doc length table on
    the already-shuffled doc key.

    Engine portability: per-term scores are rounded to e6 fixed point
    (``*_e6`` long) BEFORE the per-(query, doc) sum, so the aggregate
    is exact integer arithmetic — immune to FP summation order across
    engines/partitions (same policy as the trigram LM, text.py
    ``fit_trigram_lm``). ``avgdl`` is derived as the IEEE-exact
    quotient of two integer aggregates, identical on any engine.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Robertson/Lucene form,
    always positive), term score = idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)).

    Output: (query_id, doc_id, bm25_e6) — one row per (query, matching
    doc); docs sharing no term with the query are absent by design.

    Pass ``index=bm25_index(...)`` (or the same frames read back from
    persisted tables) to skip the corpus pass entirely — the
    production path; ``corpus`` may then be None.
    """
    if index is not None:
        tf, doclen, dfreq = index
    else:
        if corpus is None:
            raise ValueError("provide either corpus or index")
        # ephemeral path: one shared explode (see bm25_index docstring).
        # doclen stays the NARROW token_count projection of the corpus
        # (no explode, no shuffle, auto-broadcasts into the score
        # join) — r16 derived it from the materialized tf instead and
        # measured SLOWER at both core counts (1.38 -> 2.45/1.87 s):
        # the checkpoint loses tf's partitioning, so the derivation
        # added a full exchange of tf for the doc-length aggregate,
        # turned the doclen join from a broadcast into a shuffle join,
        # and moved the whole explode under the stats collect. The
        # second tokenize pass is a cheap narrow scan by comparison
        # (reverted r17, VERDICT r16 #3).
        # full-vocabulary dfreq (r17 re-revert, VERDICT r16 #3): the r16
        # query-vocab semi-join saved aggregate input but cost an extra
        # blocking broadcast sub-job per run and measured SLOWER at
        # every combination tried (interleaved min-of-4: full 1.67 s vs
        # semi 2.05 s); dfreq's exchange input is the map-side partial
        # aggregate (vocab-bounded per partition), cheap at any scale
        tf, doclen, dfreq = bm25_index(corpus, id_col, text_col, materialize=True)
    totals = doclen.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).collect()[0]
    n_docs, total_tokens = totals["n_docs"], totals["total_tokens"] or 0
    # degenerate corpora (empty, or every doc zero-token): no posting
    # can match any query term, so the score table is empty regardless
    # of avgdl — pin it to 0.0 instead of dividing by zero (ADVICE r16)
    avgdl = total_tokens / n_docs if n_docs else 0.0
    qterms = (
        query_df.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(tokens(query_text_col))).alias("term"),
        )
        .join(dfreq, "term")  # dfreq side collapses to query-vocab size here
    )
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5))
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + F.lit(k1) * (1 - b + F.lit(b) * F.col("dl") / F.lit(avgdl))
    )
    return (
        tf.join(F.broadcast(qterms), "term")
        .join(doclen, "doc_id")
        .withColumn("score_e6", F.round(idf * norm * 1e6).cast("long"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_e6").alias("bm25_e6"))
    )


def bm25_topk(
    corpus: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-k BM25 hits per query: deterministic (score desc, doc_id asc)
    window over the matching-docs-only score table."""
    scored = bm25_scores(corpus, query_df, **kwargs)
    w = Window.partitionBy("query_id").orderBy(F.col("bm25_e6").desc(), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "bm25_e6", F.col("rn").cast("long").alias("rank"))
    )


def hard_negatives(
    corpus: DataFrame,
    query_df: DataFrame,
    positives: DataFrame,
    n_negatives: int = 5,
    depth: int = 50,
    **bm25_kwargs,
) -> DataFrame:
    """BM25 hard-negative mining — the standard construction of
    contrastive training pairs for retrievers (DPR-style): for each
    training query, the top-ranked corpus documents that are NOT the
    labeled positives become the negatives a bi-encoder must learn to
    push away.

    ``positives`` carries (query_id, doc_id) gold labels. Retrieval
    depth is ``depth`` so enough candidates survive the anti-join;
    negatives are re-ranked 1..n after removal. Scale shape: inherits
    bm25_topk's broadcast-query plan; the anti-join key set (the gold
    labels) is tiny and broadcast too.

    Output: (query_id, doc_id, bm25_e6, neg_rank).
    """
    ranked = bm25_topk(corpus, query_df, k=depth, **bm25_kwargs)
    pos = positives.select(
        F.col(positives.columns[0]).alias("query_id"),
        F.col(positives.columns[1]).alias("doc_id"),
    )
    survivors = ranked.join(F.broadcast(pos), ["query_id", "doc_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(F.col("bm25_e6").desc(), "doc_id")
    return (
        survivors.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= n_negatives)
        .select("query_id", "doc_id", "bm25_e6", "neg_rank")
    )


def scrub(text: Column | str, pattern: str, replacement: str = "[REDACTED]") -> Column:
    """Regex scrubbing (global replace) — the PII/URL-removal shape for
    training-data cleaning; keep patterns RE2-portable."""
    return F.regexp_replace(_col(text), pattern, replacement)


def shingles_of_tokens(tok_col: Column, n: int = 3, sep: str = " ") -> Column:
    """n-token shingle array (distinct) from an ALREADY-MATERIALIZED
    token array column. The expression references ``tok_col`` ~3n
    times, so the input must be a real column (see ``with_shingles``) —
    if it's an inline ``tokens(text)`` expression, Catalyst re-evaluates
    the split per element_at and the plan goes O(tokens^2) (measured
    21x slower at sf0.1)."""
    k = F.size(tok_col) - (n - 1)
    idx = F.sequence(F.lit(0), k - 1)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        sep, *[F.element_at(tok_col, (i + j + 1).cast("int")) for j in range(n)]
    )
    return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, shingle_at))
    )


def exploded_shingles(
    df: "DataFrame", keep_cols: "list[str]", text_col: str, n: int = 3,
    out_col: str = "shingle",
) -> "DataFrame":
    """One row per (keep_cols..., shingle): tokenize into a materialized
    column, then explode the shingle expression over it IN THE SAME
    select. This exact shape keeps the token split at once-per-row —
    measured 0.6s vs 10-17s for the inline / intermediate-array-column
    shapes at sf0.1 (Catalyst re-inlines an aliased shingle array into
    the generator, re-deriving the split per element)."""
    toked = df.withColumn("_toks__", tokens(text_col))
    return toked.select(
        *keep_cols, F.explode(shingles_of_tokens(F.col("_toks__"), n)).alias(out_col)
    )


def word_shingles(text: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Single-expression shingle array. Convenient for small frames /
    single use; for anything hot, use ``with_shingles`` (column-
    materialized tokens) — this inline form re-derives the token split
    per element access."""
    return shingles_of_tokens(tokens(_col(text)), n, sep)


def chunk_text(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> "DataFrame":
    """Split documents into overlapping token-window chunks — the unit
    of work for embedding / context-window-bounded training pipelines.

    stride = chunk_tokens - overlap; chunk i covers tokens
    [i*stride, i*stride + chunk_tokens); the final chunk may be short;
    a doc with <= chunk_tokens tokens yields one chunk; an empty doc
    yields none. Output: (id_col, chunk_idx, chunk_text, n_tokens).

    Pure Column expressions: one tokenize per row (materialized column,
    see ``shingles_of_tokens`` for why), chunk starts via ``sequence``,
    slices via ``slice`` — the explode fans chunks across tasks, so a
    100 TB corpus chunks with no Python and no skewed shuffle (the only
    shuffle is whatever the caller does next).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toked = df.withColumn("_toks__", tokens(text_col))
    n = F.size(F.col("_toks__"))
    n_chunks = F.when(n <= 0, F.lit(0)).when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - chunk_tokens + (stride - 1)) / F.lit(stride))
    )
    starts = F.sequence(F.lit(0).cast("long"), n_chunks.cast("long") - 1)
    chunked = toked.select(
        id_col,
        F.explode(
            F.when(n_chunks > 0, starts).otherwise(F.array().cast("array<long>"))
        ).alias("chunk_idx"),
        F.col("_toks__"),
    )
    piece = F.slice(
        F.col("_toks__"), (F.col("chunk_idx") * stride + 1).cast("int"), chunk_tokens
    )
    return chunked.select(
        id_col,
        "chunk_idx",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, one pass per document:

    - ``distinct_token_ratio``: |unique tokens| / |tokens|
    - ``top_token_ratio``: occurrences of the most frequent token / |tokens|
    - ``dup_bigram_ratio``: 1 - |unique bigrams| / |bigrams|

    Highly repetitive machine-generated text scores low/low/high; these
    are the standard cheap filters run before any pair-wise dedup.

    All higher-order Column expressions over a materialized token array
    (one tokenize per row — see ``shingles_of_tokens`` for why the
    array must be a real column). Per-row cost is O(distinct * tokens)
    for the top-token scan — document-bounded, no shuffle, runs inside
    whole-stage codegen on the scan output at any corpus size.
    """
    toked = df.withColumn("_toks__", tokens(text_col))
    toks = F.col("_toks__")
    n = F.size(toks)
    dist = F.array_distinct(toks)
    top = F.array_max(
        F.transform(dist, lambda d: F.size(F.filter(toks, lambda t: t == d)))
    )
    # sequence(1, n-1) is DESCENDING for n < 2 (and element_at then
    # probes an empty array), so gate the construction itself
    bigrams = F.when(n < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i.cast("int")),
                F.element_at(toks, (i + 1).cast("int")),
            ),
        )
    )
    n_bg = F.size(bigrams)
    safe = lambda c: F.when(n > 0, c)  # noqa: E731  -- empty doc -> NULL ratios
    out = toked.withColumns(
        {
            "n_tokens": n.cast("long"),
            "distinct_token_ratio": safe(
                F.round(F.size(dist).cast("double") / n, 6)
            ),
            "top_token_ratio": safe(F.round(top.cast("double") / n, 6)),
            "dup_bigram_ratio": F.when(n_bg <= 0, F.lit(0.0)).otherwise(
                F.round(
                    F.lit(1.0) - F.size(F.array_distinct(bigrams)).cast("double") / n_bg,
                    6,
                )
            ),
        }
    )
    return out.drop("_toks__")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_ratio: float = 0.9,
    max_ellipsis_line_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_distinct_stopwords: int = 2,
    stopwords: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with"),
) -> DataFrame:
    """Gopher-style (Rae et al. 2021, A1.1) document-level rule gate.

    The standard pretraining pre-filter battery as pure Column
    expressions — one codegen pass over the scan output, no shuffle,
    no UDF, so it composes with predicate pushdown at any corpus size:

    - token count within [min_tokens, max_tokens]
    - mean word length within [min, max]
    - symbol-to-word ratio (# and ... occurrences / words) <= cap
    - fraction of lines starting with a bullet <= cap
    - fraction of lines ending in an ellipsis <= cap
    - fraction of words containing a letter >= floor
    - at least ``min_distinct_stopwords`` distinct required stopwords

    Every rule lands as its own boolean column (rule_*) so the gate is
    auditable per document; ``gopher_keep`` is their conjunction. All
    ratios are exact integer/integer IEEE quotients — engine-portable
    without rounding. Empty documents fail the token-count rule and
    produce NULL-free booleans throughout.
    """
    toked = df.withColumn("_gr_toks__", tokens(text_col)).withColumn(
        "_gr_lines__",
        F.filter(F.split(_col(text_col), r"\n"), lambda ln: F.trim(ln) != ""),
    )
    toks, lines = F.col("_gr_toks__"), F.col("_gr_lines__")
    n = F.size(toks)
    n_lines = F.size(lines)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0).cast("long"), lambda a, x: a + x
    )
    mean_wl = F.when(n > 0, total_chars.cast("double") / n).otherwise(F.lit(0.0))
    # Occurrence counts (not characters removed): each '...' counts 1,
    # matching the documented Gopher-style symbol-to-word ratio. Plain
    # (non-regex) replace is engine-portable: non-overlapping
    # left-to-right in both Spark and DuckDB, so the '...' delta is
    # always an exact multiple of 3.
    txt = _col(text_col)
    n_symbols = (
        (F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit(""))))
        + ((F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))) / F.lit(3)).cast("long")
    )
    symbol_ratio = F.when(n > 0, n_symbols.cast("double") / n).otherwise(F.lit(0.0))
    n_bullet = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
    n_ellipsis = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$")))
    bullet_ratio = F.when(n_lines > 0, n_bullet.cast("double") / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(n_lines > 0, n_ellipsis.cast("double") / n_lines).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike(r"[A-Za-z]")))
    alpha_ratio = F.when(n > 0, n_alpha.cast("double") / n).otherwise(F.lit(0.0))
    n_stop = F.size(
        F.array_intersect(
            F.transform(F.array_distinct(toks), lambda t: F.lower(t)),
            F.array([F.lit(s) for s in stopwords]),
        )
    )
    rules = {
        "rule_token_count": (n >= min_tokens) & (n <= max_tokens),
        "rule_mean_word_len": (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len),
        "rule_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "rule_bullet_lines": bullet_ratio <= max_bullet_line_ratio,
        "rule_ellipsis_lines": ellipsis_ratio <= max_ellipsis_line_ratio,
        "rule_alpha_words": alpha_ratio >= min_alpha_word_ratio,
        "rule_stopwords": n_stop >= min_distinct_stopwords,
    }
    keep = F.lit(True)
    for c in rules.values():
        keep = keep & c
    out = toked.withColumns({**rules, "gopher_keep": keep})
    return out.drop("_gr_toks__", "_gr_lines__")


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per corpus document, how many of its
    distinct word n-grams also occur anywhere in ``benchmark`` (the
    eval set). The standard pretraining hygiene step (13-gram overlap
    in GPT-3's appendix; n is a knob here because the synthetic docs
    are short).

    Output: (id_col, n_shingles, n_hits, hit_ratio, contaminated) —
    one row per corpus doc, ``contaminated`` iff any n-gram collides.

    Scale shape: the benchmark's distinct n-gram set is tiny relative
    to a 100 TB corpus (eval suites are MBs), so it BROADCASTS; the
    corpus side is one shingle explode -> broadcast left join -> one
    hash aggregate keyed on doc id with map-side partials. No
    corpus-vs-corpus pair join anywhere.
    """
    bench_grams = (
        exploded_shingles(benchmark, [], text_col, n, "_g")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    corpus_grams = exploded_shingles(corpus, [id_col], text_col, n, "_g")
    counted = (
        corpus_grams.join(F.broadcast(bench_grams), "_g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    # docs shorter than n tokens produce no shingles and vanish from
    # the aggregate — join back so the contract (one row per corpus
    # doc) holds, with 0 shingles / 0 hits / ratio 0 / not contaminated
    return (
        corpus.select(id_col)
        .join(counted, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
        .withColumn(
            "hit_ratio",
            F.when(F.col("n_shingles") == 0, F.lit(0.0)).otherwise(
                F.round(F.col("n_hits") / F.col("n_shingles"), 6)
            ),
        )
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def remove_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Span-level benchmark decontamination: instead of dropping every
    document that shares an n-gram with the eval set
    (``contamination_report`` + anti-join — the document-level policy),
    remove only the overlapping token spans and keep the rest of the
    document. This is the open-weights-pipeline middle ground: a long
    document quoting one benchmark question keeps its other 99%.

    A token is removed iff it is covered by an n-token window whose
    exact text occurs anywhere in ``benchmark``; documents are
    reassembled from surviving tokens in order (same mechanics as
    ``dedup.remove_repeated_spans``, with the flag set coming from the
    broadcast benchmark gram table instead of corpus frequencies).

    Scale shape: the benchmark's distinct gram set is tiny (eval
    suites are MBs against a 100 TB corpus) so it BROADCASTS; corpus
    grams are built array-side (no token self-join), flagged starts
    come from one broadcast semi join, only flagged starts explode
    into covered positions, and the rebuild is one groupBy(doc).

    Returns (id, text, n_kept, n_removed).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = corpus.select(
        F.col(id_col).alias("_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_tok"),
    )
    grams = toks.select(
        "_id",
        F.posexplode(
            F.when(
                F.size("_tok") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("_tok") - n),
                    lambda i: F.concat_ws(" ", F.slice("_tok", i + 1, n)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_start", "_gram"),
    )
    bench_toks = benchmark.select(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_tok")
    )
    bench_grams = (
        bench_toks.select(
            F.explode(
                F.when(
                    F.size("_tok") >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size("_tok") - n),
                        lambda i: F.concat_ws(" ", F.slice("_tok", i + 1, n)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("_gram")
        )
        .distinct()
    )
    covered = (
        grams.join(F.broadcast(bench_grams), "_gram")
        .select(
            "_id",
            F.explode(F.sequence("_start", F.col("_start") + n - 1)).alias("_pos"),
        )
        .distinct()
    )
    positions = toks.select("_id", F.posexplode("_tok").alias("_pos", "_t"))
    survivors = positions.join(covered, ["_id", "_pos"], "left_anti")
    rebuilt = survivors.groupBy("_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_t"))),
                lambda s: s["_t"],
            ),
        ).alias("_text"),
        F.count("*").alias("_n_kept"),
    )
    totals = positions.groupBy("_id").agg(F.count("*").alias("_n_tok"))
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("_text", F.lit("")).alias(text_col),
            F.coalesce("_n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("_n_tok") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def normalized_text(text: Column | str, unicode: bool = False) -> Column:
    r"""Canonical text form for fuzzy-exact dedup (the cheap tier before
    MinHash): lowercase, non-alphanumeric runs collapsed to single
    spaces, trimmed. Catches case/punctuation/whitespace variants with
    one hash-aggregate instead of a pair join.

    ``unicode=True`` preserves all letters and digits of any script
    (``\p{L}\p{N}`` classes — CJK, Cyrillic, accented Latin, Arabic
    numerals of other scripts) instead of the ASCII-only default; a
    multilingual corpus MUST use it or non-Latin documents normalize
    to empty strings and silently vanish from every gram-based
    operator (dedup, language ID, LM scoring, winnowing). The ASCII
    default stays for oracle parity with engines whose regex classes
    differ on unicode property semantics."""
    pattern = r"[^\p{L}\p{N}]+" if unicode else "[^a-z0-9]+"
    return F.trim(F.regexp_replace(F.lower(_col(text)), pattern, " "))


def html_to_text(html: Column | str) -> Column:
    """Plain text from raw HTML — the extraction step of every
    web-crawl pipeline (the simplified, declarative cousin of
    trafilatura/jusText): drop script/style payloads and comments,
    turn block-level tags into newlines, strip remaining tags, decode
    the six ubiquitous entities, collapse whitespace.

    Pure chained ``regexp_replace`` Column expressions — one codegen
    pass over the scan output, no UDF, engine-portable (RE2-compatible
    patterns: inline (?is) flags, lazy quantifiers, no backreferences
    or lookaround), so the op is oracle-checkable and runs at crawl
    scale with zero Python. Entity decoding handles the common six;
    ``&amp;`` decodes LAST so ``&amp;lt;`` correctly yields the
    literal ``&lt;``. Not a browser: malformed nesting degrades to
    extra whitespace, never to leaked markup payload text."""
    t = _col(html)
    # script/style payloads are NOT content; match each tag pair
    # separately (a backreference-free alternation could cross-match
    # <script>...</style>)
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    # block-level boundaries become newlines so downstream line-based
    # quality rules (bullet/ellipsis ratios) still see structure
    t = F.regexp_replace(
        t, r"(?i)</?(p|br|div|h[1-6]|li|ul|ol|tr|table|blockquote|section|article)[^>]*>", "\n"
    )
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""), ("&#39;", "'"),
        ("&nbsp;", " "), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    # collapse horizontal runs, then blank-line runs, then trim ALL
    # whitespace (plain trim strips spaces only — a leading block tag
    # would leave the text starting with a newline)
    t = F.regexp_replace(t, r"[ \t\f\r]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "text",
) -> DataFrame:
    """DataFrame form of ``html_to_text`` plus the two audit columns a
    crawl pipeline gates on: ``markup_ratio`` (1 - text/html length;
    boilerplate-heavy pages score high) and ``n_chars`` of the
    extracted text. NULL html -> NULL text, 0-length audit fields."""
    extracted = html_to_text(html_col)
    return df.withColumns(
        {
            out_col: extracted,
            "n_chars": F.coalesce(F.length(extracted), F.lit(0)).cast("long"),
            "markup_ratio": F.when(
                F.coalesce(F.length(html_col), F.lit(0)) > 0,
                F.round(
                    1
                    - F.coalesce(F.length(extracted), F.lit(0))
                    / F.length(html_col).cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        }
    )


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    line_blocklist: tuple[str, ...] = ("lorem ipsum", "javascript", "cookie policy"),
    out_col: str = "text_clean",
) -> DataFrame:
    """C4-style line + document filtering (Raffel et al. 2020, §2.2) —
    the other canonical pre-training gate next to ``gopher_rules``:

    line level (each line must ALL hold to survive):
      - at least ``min_words_per_line`` words,
      - ends in terminal punctuation (. ! ? or a closing quote),
      - contains no ``line_blocklist`` phrase (case-insensitive);
    document level:
      - at least ``min_kept_lines`` surviving lines,
      - no curly brace anywhere (code pages).

    Output: ``out_col`` (surviving lines re-joined), ``n_lines``,
    ``n_kept_lines``, ``rule_min_lines``, ``rule_no_brace``, and their
    conjunction ``c4_keep``. Pure Column expressions (HOF lambdas
    reference only their element) — one codegen pass, no shuffle, no
    UDF, composes with pushdown at crawl scale."""
    raw_lines = F.filter(
        F.split(F.coalesce(_col(text_col), F.lit("")), r"\n"),
        lambda ln: F.trim(ln) != "",
    )

    def line_ok(ln: Column) -> Column:
        t = F.trim(ln)
        words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        ok = (words >= min_words_per_line) & t.rlike(r"[.!?\"']$")
        low = F.lower(t)
        for phrase in line_blocklist:
            ok = ok & ~low.contains(phrase.lower())
        return ok

    toked = df.withColumn("_c4_lines__", raw_lines).withColumn(
        "_c4_kept__", F.filter(F.col("_c4_lines__"), line_ok)
    )
    n_lines = F.size("_c4_lines__")
    n_kept = F.size("_c4_kept__")
    rule_min_lines = n_kept >= min_kept_lines
    rule_no_brace = ~F.coalesce(_col(text_col), F.lit("")).rlike(r"[{}]")
    out = toked.withColumns(
        {
            out_col: F.array_join("_c4_kept__", "\n"),
            "n_lines": n_lines.cast("long"),
            "n_kept_lines": n_kept.cast("long"),
            "rule_min_lines": rule_min_lines,
            "rule_no_brace": rule_no_brace,
            "c4_keep": rule_min_lines & rule_no_brace,
        }
    )
    return out.drop("_c4_lines__", "_c4_kept__")


def collocations(
    df: DataFrame, text_col: str = "text", min_count: int = 5
) -> DataFrame:
    """Collocation (adjacent-bigram) extraction ranked by an
    integer-exact PMI surrogate — the corpus-analysis step that
    surfaces multiword expressions ("new york", "et al") before
    tokenizer training or phrase-aware dedup.

    For bigram (a, b): ``pmi_ratio_e6 = N * n_pair * 1e6 //
    (n_a * n_b)`` where N is the corpus token count — the argument of
    the PMI log in e6 fixed point, so ORDERING by it equals ordering
    by PMI with zero FP (log is monotone). Bigrams and token counts
    keep MULTIPLICITY (unlike shingles). One explode + three hash
    aggregates + a one-row broadcast of N; bigram construction
    references a materialized token column (the HOF re-evaluation
    trap exploded_shingles documents). Output: (token_a, token_b,
    n_pair, n_a, n_b, pmi_ratio_e6) for pairs with n_pair >=
    min_count. NOTE: the e6 product N * n_pair * 1e6 needs BIGINT
    headroom — fine to ~1e6-token corpora per the overflow bound; a
    100 TB corpus computes the ratio in DECIMAL or per-shard."""
    toked = df.withColumn("_toks__", tokens(text_col))
    t = F.col("_toks__")
    k = F.size(t) - 1
    bigram = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, (i + 1).cast("int")),
                F.element_at(t, (i + 2).cast("int")),
            ),
        )
    )
    bg = toked.select(F.explode(bigram).alias("_b"))
    tc = toked.select(F.explode(t).alias("_t"))
    total = tc.agg(F.count("*").alias("_n_total"))
    counts = tc.groupBy("_t").agg(F.count("*").alias("_c"))
    pairs = (
        bg.groupBy("_b")
        .agg(F.count("*").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= int(min_count))
        .select(
            F.split("_b", " ").getItem(0).alias("token_a"),
            F.split("_b", " ").getItem(1).alias("token_b"),
            "n_pair",
        )
    )
    return (
        pairs.join(
            counts.select(F.col("_t").alias("token_a"), F.col("_c").alias("n_a")),
            "token_a",
        )
        .join(
            counts.select(F.col("_t").alias("token_b"), F.col("_c").alias("n_b")),
            "token_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "token_a",
            "token_b",
            "n_pair",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("CAST((_n_total * n_pair * 1000000) div (n_a * n_b) AS LONG)")
            .alias("pmi_ratio_e6"),
        )
    )


def compression_ratios(
    df: "DataFrame", id_col: str, text_col: str = "text", level: int = 6
) -> "DataFrame":
    """Per-document zlib compression ratio — the classic curation
    signal (used by Gopher/RefinedWeb-style filters): highly
    compressible text is repetitive boilerplate; near-incompressible
    text is noise/binary junk; natural prose sits in between.

    ``ratio_e6 = compressed_len * 1e6 // raw_len`` (integer fixed
    point; raw_len in UTF-8 bytes). Runs as an Arrow-batched
    ``mapInPandas`` kernel — zlib is genuinely not expressible as
    Column expressions, the same justification bar as the multimodal
    codec kernels (and like them, bytes never touch the driver).
    zlib output is deterministic for a fixed level, but only ACROSS
    the same zlib build — treat thresholds as per-deployment
    calibration, and the query registers rows-only. Empty docs get
    NULL ratio. Output: (doc_id, raw_len, compressed_len, ratio_e6)."""
    import zlib

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("raw_len", T.LongType(), False),
            T.StructField("compressed_len", T.LongType(), True),
            T.StructField("ratio_e6", T.LongType(), True),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            ids, rl, cl, rt = [], [], [], []
            for rid, txt in zip(pdf[id_col], pdf[text_col]):
                raw = (txt or "").encode("utf-8")
                ids.append(int(rid))
                rl.append(len(raw))
                if not raw:
                    cl.append(None)
                    rt.append(None)
                else:
                    c = len(zlib.compress(raw, level))
                    cl.append(c)
                    rt.append(c * 1_000_000 // len(raw))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "raw_len": rl,
                    "compressed_len": pd.array(cl, dtype="Int64"),
                    "ratio_e6": pd.array(rt, dtype="Int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def template_fingerprint(text: Column | str) -> Column:
    """Structural fingerprint of a document: md5 of the per-line
    token-count sequence (blank lines dropped). Form letters and
    templated spam share the fingerprint even when every slot word
    differs — the structure-dedup tier that exact hashing misses and
    near-dup shingling only partially catches. Pure Column exprs over
    a portable md5; empty/blank docs fingerprint the empty sequence."""
    t = F.coalesce(_col(text), F.lit(""))
    lines = F.filter(F.split(t, r"\n"), lambda ln: F.trim(ln) != "")
    sig = F.array_join(
        F.transform(lines, lambda ln: F.size(tokens(ln)).cast("string")), ","
    )
    return F.md5(sig)


def template_groups(
    df: DataFrame, id_col: str, text_col: str = "text", min_docs: int = 2
) -> DataFrame:
    """Per-document template assignment with group sizes: docs whose
    structural fingerprint is shared by >= ``min_docs`` documents —
    the template-spam audit. One hash aggregate on the fingerprint
    joined back (fingerprint table is small relative to the corpus).
    Output: (doc_id, template_fp, n_docs)."""
    fps = df.select(
        F.col(id_col).alias("doc_id"),
        template_fingerprint(text_col).alias("template_fp"),
    )
    sizes = (
        fps.groupBy("template_fp")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= int(min_docs))
    )
    return fps.join(sizes, "template_fp").select("doc_id", "template_fp", "n_docs")


def vocab_table(df: DataFrame, text_col: str = "text", min_count: int = 5) -> DataFrame:
    """Corpus vocabulary: tokens appearing at least ``min_count`` times.
    Count-threshold membership (not top-K) so the table is
    deterministic with no tie-break policy. One explode + hash
    aggregate; output (token, n) is the small persistable artifact a
    tokenizer-QA pipeline freezes per release."""
    tok = exploded_tokens(df, [], text_col, "token")
    return (
        tok.groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= int(min_count))
    )


def oov_rate(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a frozen vocabulary
    — the tokenizer-coverage audit run before/after a vocab change
    (a rising OOV rate on a new source means the tokenizer will
    shatter it into bytes). Tokens count WITH multiplicity.

    Scale shape: explode -> broadcast left join against the (small)
    vocab -> one hash aggregate per doc. ``oov_rate_e6`` is e6
    fixed-point integer math. Docs with zero tokens emit no row (same
    contract as every gram-based operator here)."""
    tok = exploded_tokens(
        df.select(F.col(id_col).alias("doc_id"), text_col), ["doc_id"], text_col, "token"
    )
    v = F.broadcast(vocab.select("token").distinct().withColumn("_in", F.lit(1)))
    joined = tok.join(v, "token", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
        F.floor(
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            * F.lit(1_000_000)
            / F.count("*")
        ).cast("long").alias("oov_rate_e6"),
    )


# Encoding-damage markers (all RE2-portable, shared verbatim with the
# DuckDB oracle — keep these as the single source of truth):
# C0 control characters except tab/newline/carriage-return; the Unicode
# replacement character a lossy decode leaves behind; and the two
# classic UTF-8-read-as-Latin-1 mojibake prefixes ('Ã' from mangled
# two-byte sequences, 'â€' from mangled punctuation).
CONTROL_CHAR_CLASS = "[\x00-\x08\x0b\x0c\x0e-\x1f]"
REPLACEMENT_CHAR = "�"
MOJIBAKE_MARKERS = "Ã|â€"


def encoding_quality(
    df: DataFrame,
    text_col: str = "text",
    max_bad_ratio_e6: int = 1000,
) -> DataFrame:
    """Encoding-damage gate — the curation step that catches lossy
    decodes and double-encoded crawl text before it poisons a corpus
    (mojibake survives every downstream filter because it looks like
    words):

    - ``n_replacement``: U+FFFD replacement characters (a decoder
      already gave up on those bytes),
    - ``n_control``: C0 control characters excluding tab/LF/CR (binary
      junk, terminal escapes),
    - ``n_mojibake``: occurrences of the UTF-8-as-Latin-1 marker
      sequences 'Ã…'/'â€…' (curly quotes and accented letters read in
      the wrong charset).

    ``bad_char_ratio_e6`` = total markers per million characters in e6
    fixed point (exact integer arithmetic — no FP, engine-portable);
    ``encoding_ok`` gates at ``max_bad_ratio_e6`` (default 0.1%).
    Pure Column expressions (three regexp_count passes) — no shuffle,
    no UDF, runs at scan speed and composes with pushdown."""
    t = F.coalesce(_col(text_col), F.lit(""))
    n_rep = F.regexp_count(t, F.lit(REPLACEMENT_CHAR))
    n_ctl = F.regexp_count(t, F.lit(CONTROL_CHAR_CLASS))
    n_moj = F.regexp_count(t, F.lit(MOJIBAKE_MARKERS))
    bad = (n_rep + n_ctl + n_moj).cast("long")
    ratio_e6 = F.floor(
        bad * F.lit(1_000_000) / F.greatest(F.length(t), F.lit(1))
    ).cast("long")
    return df.withColumns(
        {
            "n_replacement": n_rep.cast("long"),
            "n_control": n_ctl.cast("long"),
            "n_mojibake": n_moj.cast("long"),
            "bad_char_ratio_e6": ratio_e6,
            "encoding_ok": ratio_e6 <= F.lit(int(max_bad_ratio_e6)),
        }
    )


def bad_words_gate(
    df: DataFrame,
    words: tuple[str, ...],
    text_col: str = "text",
    max_ratio: float = 0.0,
) -> DataFrame:
    """Token-level blocklist gate: fraction of tokens that exactly
    match a blocklist word (case-insensitive, counted WITH multiplicity
    — a substring match would flag 'class' for 'ass'). Documents whose
    ratio exceeds ``max_ratio`` fail; the default 0.0 means any hit
    fails (the C4 stance). Small curated lists inline into the plan as
    literals; for 100k-entry lists use an explode + broadcast join
    instead of this Column form.

    Output: ``n_bad_words``, ``bad_words_ratio`` (exact int/int IEEE
    quotient; 0.0 for empty docs), ``bad_words_keep``."""
    if not words:
        raise ValueError("words must be a non-empty tuple")
    toks = tokens(text_col)
    lowered = tuple(w.lower() for w in words)
    n = F.size(toks)
    n_bad = F.size(F.filter(toks, lambda t: F.lower(t).isin(*lowered)))
    ratio = F.when(n > 0, n_bad.cast("double") / n).otherwise(F.lit(0.0))
    return df.withColumns(
        {
            "n_bad_words": n_bad.cast("long"),
            "bad_words_ratio": ratio,
            "bad_words_keep": ratio <= max_ratio,
        }
    )


def split_sentences(text: Column | str) -> Column:
    """Sentence segmentation as a pure Column expression: maximal runs
    of non-terminal characters followed by terminal punctuation, plus a
    trailing fragment with no terminator. Regex-only (no lookbehind —
    RE2-portable), trimmed, empties dropped. Abbreviation dots split
    ('e.g.' becomes two fragments) — the standard trade of regex
    segmentation; a model-based splitter is a mapInPandas plug-point."""
    raw = F.regexp_extract_all(
        F.coalesce(_col(text), F.lit("")), F.lit(r"[^.!?]+[.!?]+|[^.!?]+$"), 0
    )
    return F.filter(F.transform(raw, lambda s: F.trim(s)), lambda s: s != "")


def sentence_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_tokens: int = 128,
) -> DataFrame:
    """Sentence-boundary-preserving chunking — the RAG/embedding prep
    that ``chunk_text`` (hard token windows) deliberately is not: a
    sentence is never split across chunks. Greedy assignment: sentence
    s goes to chunk floor(tokens_before_s / max_tokens), so a chunk
    can overrun ``max_tokens`` by at most one sentence (and a single
    oversized sentence becomes its own overrun chunk) — the standard
    boundary-preserving trade, documented rather than silently
    splitting.

    Shape: posexplode sentences -> per-sentence token count -> one
    cumulative-sum window keyed on the doc -> groupBy (doc, chunk)
    ordered re-join. One shuffle on the doc id; everything else is
    codegen. Output: (id_col, chunk_idx, chunk_text, n_sentences,
    n_tokens)."""
    sents = df.select(
        F.col(id_col), F.posexplode(split_sentences(text_col)).alias("_i", "_s")
    ).withColumn("_tok", F.size(tokens(F.col("_s"))).cast("long"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = sents.withColumn(
        "chunk_idx",
        F.floor(F.coalesce(F.sum("_tok").over(w), F.lit(0)) / F.lit(max_tokens)).cast(
            "long"
        ),
    )
    return (
        assigned.groupBy(id_col, "chunk_idx")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "_s"))),
                    lambda p: p["_s"],
                ),
            ).alias("chunk_text"),
            F.count("*").cast("long").alias("n_sentences"),
            F.sum("_tok").cast("long").alias("n_tokens"),
        )
    )
