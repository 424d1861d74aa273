"""Composed vision-corpus curation pipeline — the image-modality twin
of ``plans/corpus_pipeline.py``: every stage is an individually gated
operator, and this module wires them into the ingest chain a
vision-pretraining corpus runs end to end:

    decode audit -> degenerate filter -> perceptual near-dup collapse
    -> canonical thumbnails -> manifest

Stage inventory (all from operators/multimodal.py + operators/dedup.py):

1. ``image_channel_stats`` — decode every payload once, emit EXACT
   integer channel sums/sum-of-squares (doubles as the corpus
   normalization-constant source).
2. degenerate filter — a constant image (dead camera, blank page,
   tracking pixel) has zero variance in EVERY channel; the check
   ``n * sumsq - sum^2 > 0`` is pure BIGINT arithmetic, so the filter
   is exact and engine-portable.
3. ``image_dhash`` + ``dhash_near_pairs`` — perceptual fingerprints and
   banded-Hamming candidate pairs (the SimHash machinery reused for the
   image modality; never all-pairs).
4. ``dedup_assign`` — connected components + keep-one-per-cluster
   (min-id canonical, deterministic under any layout).
5. ``resize_images`` — thumbnails for the CANONICAL survivors only
   (the expensive re-encode never runs for rows that are about to be
   dropped), in P6 or baseline JPEG.

The manifest carries every doc's audit trail: geometry, channel stats,
quality verdict, component id, canonical flag, and (for canonicals) the
thumbnail payload — the table a downstream trainer samples from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def media_pipeline(
    images: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    *,
    max_hamming: int = 3,
    thumb: tuple = (16, 16),
    thumb_format: str = "jpeg",
) -> DataFrame:
    """Run the composed curation chain over an image corpus
    (id, binary payload). Returns the manifest: one row per input image
    with (doc_id, width, height, n_pixels, sum_r/g/b, is_degenerate,
    component_id, is_canonical, thumb) — ``thumb`` is NULL for
    non-canonical or degenerate rows. Decode happens in exactly two
    kernel passes over the kept payloads (stats+hash) plus one over
    the canonical survivors (thumbnails)."""
    from ..operators.dedup import dedup_assign
    from ..operators.multimodal import (
        dhash_near_pairs,
        image_channel_stats,
        image_dhash,
        resize_images,
    )

    src = images.select(
        F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")
    ).localCheckpoint(eager=False)
    stats = image_channel_stats(src, "doc_id", "payload", decode="real")
    n = F.col("n_pixels")
    degenerate = (
        (n.isNull())
        | (
            (n * F.col("sumsq_r") - F.col("sum_r") * F.col("sum_r") == 0)
            & (n * F.col("sumsq_g") - F.col("sum_g") * F.col("sum_g") == 0)
            & (n * F.col("sumsq_b") - F.col("sum_b") * F.col("sum_b") == 0)
        )
    )
    stats = stats.withColumn("is_degenerate", degenerate).localCheckpoint(
        eager=False
    )
    kept = src.join(
        stats.filter(~F.col("is_degenerate")).select("doc_id"), "doc_id"
    )
    hashes = image_dhash(kept, "doc_id", "payload", decode="real")
    pairs = dhash_near_pairs(hashes, max_hamming=max_hamming).select("id_a", "id_b")
    assigned = dedup_assign(
        kept.select("doc_id"), "doc_id", pairs
    )  # (doc_id, component_id, is_canonical)
    thumbs = resize_images(
        kept.join(assigned.filter("is_canonical").select("doc_id"), "doc_id"),
        "doc_id",
        "payload",
        int(thumb[0]),
        int(thumb[1]),
        decode="real",
        out_format=thumb_format,
    ).select("doc_id", F.col("payload").alias("thumb"))
    # geometry comes along with the thumbnail for canonicals; for the
    # manifest every row gets stats, dedup columns where kept, thumb
    # where canonical
    return (
        stats.join(assigned, "doc_id", "left")
        .join(thumbs, "doc_id", "left")
        .withColumn("is_canonical", F.coalesce("is_canonical", F.lit(False)))
        .select(
            "doc_id", "n_pixels", "sum_r", "sum_g", "sum_b",
            "is_degenerate", "component_id", "is_canonical", "thumb",
        )
    )
