"""End-to-end pretraining-corpus pipeline as one composable plan.

The standard order of operations for turning a raw document crawl into
training data, each stage an operator this engine already oracle-checks
individually:

    quality filter -> exact dedup -> near-dedup (MinHash-LSH +
    connected components, keep one per cluster) -> benchmark
    decontamination -> leakage-safe train/val/test split ->
    sequence packing

Everything is lazy DataFrame composition — at 100 TB the stages fuse
where Catalyst allows and the only materialization points are the ones
the dedup operators deliberately introduce (signature/candidate
checkpoints). Per-stage audit counts come from one ``summary`` frame,
not driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_assign, minhash_lsh_pairs
from ..operators.sampling import pack_sequences, split_assign
from ..operators.text import (
    contamination_report,
    normalized_text,
    quality_features,
    repetition_features,
)


def corpus_pipeline(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.25,
    max_dup_bigram_ratio: float = 0.5,
    near_dup_threshold: float = 0.5,
    decontam_n: int = 5,
    fractions: dict[str, float] | None = None,
    pack_capacity: int = 2048,
    num_shards: int = 256,
    pair_method: str = "minhash",
    pair_block_cols: list[str] | None = None,
    pii_types: list[str] | None = None,
) -> DataFrame:
    """Raw docs -> packed, split, decontaminated training rows.

    Output: one row per SURVIVING document with its quality features,
    duplicate-cluster id, contamination counts, split label, and pack
    coordinates. Filters applied, in order:

    0. (``pii_types`` set) PII redaction of ``text_col`` — typed
       placeholder substitution (operators/pii.py), BEFORE any
       hashing/shingling so identifiers can never leak into
       fingerprints, signatures, or the released text;
    1. quality_score >= min_quality and dup_bigram_ratio <=
       max_dup_bigram_ratio (cheap per-row exprs — run FIRST so the
       expensive pair joins see only plausible documents);
    2. exact dedup on normalized text (one hash aggregate);
    3. near-dedup: MinHash-LSH pairs -> connected components -> keep
       the canonical doc per cluster;
    4. drop documents sharing any ``decontam_n``-gram with
       ``benchmark`` (broadcast semi-join shape);
    5. split by cluster id (leakage-safe by construction: the split
       bucket keys on the component, and non-canonical members are
       already gone);
    6. pack into ``pack_capacity``-token windows across
       ``num_shards`` shards.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}

    # 0. PII scrub (codegen regexp pass; fuses with the quality exprs)
    if pii_types:
        from ..operators.pii import redact_pii

        docs = redact_pii(docs, text_col, types=pii_types)

    # 1. per-row quality gates (codegen; no shuffle)
    scored = repetition_features(quality_features(docs, text_col), text_col)
    kept = scored.filter(
        (F.col("quality_score") >= min_quality)
        & (F.col("dup_bigram_ratio") <= max_dup_bigram_ratio)
    )

    # 2. exact dedup on the normalized form: keep min id per normal form
    kept = kept.withColumn("_norm", normalized_text(text_col))
    canon_exact = kept.groupBy("_norm").agg(F.min(id_col).alias(id_col))
    # materialize the filtered+exact-deduped frame once: it feeds the
    # LSH shingle pass, the cluster-assignment join, and (via
    # survivors) the decontamination explode — Catalyst does not dedupe
    # the common subplan across those branches
    kept = (
        kept.join(canon_exact, ["_norm", id_col])
        .drop("_norm")
        .localCheckpoint(eager=False)
    )

    # 3. near-dedup cluster + keep-one. pair_method picks the candidate
    # generator: "minhash" (default — banded LSH, the 100-TB path) or
    # "ngram" (inverted-index Jaccard with ``pair_block_cols`` blocking
    # — fully SQL-expressible, so the WHOLE pipeline becomes
    # oracle-checkable end-to-end; see the corpus_pipeline_relational
    # registry entry)
    if pair_method == "minhash":
        pairs = minhash_lsh_pairs(
            kept, id_col, text_col, num_perm=32, bands=16,
            threshold=near_dup_threshold,
            # keep plan construction action-free: take the unconditional
            # widths join-back instead of the eager max-width probe
            eager_probe=False,
        )
    elif pair_method == "ngram":
        from ..operators.dedup import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(
            kept, id_col, text_col, list(pair_block_cols or []),
            n=3, threshold=near_dup_threshold,
        ).select("id_a", "id_b")
    else:
        raise ValueError(f"unknown pair_method {pair_method!r}: minhash or ngram")
    assigned = dedup_assign(kept, id_col, pairs)
    # second fan-out point: survivors feed both the decontamination
    # explode and the final anti-join
    survivors = assigned.filter(F.col("is_canonical")).localCheckpoint(eager=False)

    # 4. decontamination: semi-join away docs overlapping the benchmark
    contaminated = (
        contamination_report(survivors, benchmark, id_col, text_col, n=decontam_n)
        .filter(F.col("contaminated"))
        .select(id_col)
    )
    clean = survivors.join(contaminated, id_col, "left_anti")

    # 5. leakage-safe split: bucket on the cluster id
    split = split_assign(clean, "component_id", fractions)

    # 6. pack into fixed token windows (n_tokens already computed by
    # repetition_features — no third tokenize pass); the stream is
    # partitioned by split so no pack blends train/val/test rows
    return pack_sequences(
        split, id_col, "n_tokens", pack_capacity, num_shards,
        group_cols=["split"],
    )


def corpus_summary(result: DataFrame) -> DataFrame:
    """One-aggregation audit frame over the pipeline output: rows,
    tokens, packs, and quality spread per split — the numbers an
    operator checks before shipping a corpus snapshot."""
    return result.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.countDistinct("shard", "pack_id").alias("n_packs"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        F.round(F.avg("dup_bigram_ratio"), 4).alias("avg_dup_bigram"),
    )


def release_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    n_output_shards: int = 64,
    seed: int = 0,
    **pipeline_kwargs,
) -> dict[str, dict[str, int]]:
    """The last mile: run the full ``corpus_pipeline`` and materialize a
    TRAINER-READY dataset release on disk — one shuffled parquet shard
    tree per split (``<out_dir>/<split>/shard=*/``) via
    ``sinks.writer.write_training_shards``, plus the ``corpus_summary``
    audit row set at ``<out_dir>/_summary``.

    Per-split sharding matters: a loader must be able to open train
    without touching val/test bytes, and the shard shuffle key is
    independent of the split assignment (different hash inputs), so
    shard membership can't correlate with the leakage-safe split.
    Returns {split: {'rows': n, 'shards': k}}.
    """
    import os

    from ..sinks.writer import write_training_shards

    result = corpus_pipeline(docs, benchmark, **pipeline_kwargs).localCheckpoint()
    stats: dict[str, dict[str, int]] = {}
    splits = [r["split"] for r in result.select("split").distinct().collect()]
    for split in sorted(s for s in splits if s is not None):
        part = result.filter(F.col("split") == split)
        stats[split] = write_training_shards(
            part, os.path.join(out_dir, split), n_output_shards, ["doc_id"], seed=seed
        )
    corpus_summary(result).write.mode("overwrite").parquet(os.path.join(out_dir, "_summary"))
    return stats
