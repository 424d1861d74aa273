"""Bloom-filter seen-set: membership pre-filter for continuous ingest.

The reference's delta mode (utils/db_client.py left-anti-join against the
already-loaded key set; see J1 in SURVEY.md §2.3) re-reads the full history
table on every batch. At corpus scale (100 TB of already-ingested
documents) that anti-join is the dominant cost of ingest — the history
side alone is a full scan + shuffle per batch. A Bloom filter inverts the
cost: ONE scan of history builds an m-bit bitmap (kilobytes to a few MB),
the bitmap is broadcast, and every subsequent batch is filtered with a
map-side broadcast join — history is never touched again. False positives
(a new doc flagged maybe-seen) are bounded by (1 - e^{-kn/m})^k and can be
resolved by a second-stage exact check against only the flagged rows;
false negatives are impossible, so nothing already ingested is ever
re-ingested.

Representation: the bitmap is a DataFrame of (word_idx BIGINT, bits
BIGINT) — one row per non-zero 32-bit word of the filter, built with a
single map-side-combined ``bit_or`` aggregation (one shuffle of at most
m/32 rows). 32-bit words keep every mask value positive and identical
across engines (no sign-bit portability hazard), which is what lets the
md5 variant be value-hash-checked by an external SQL oracle.

Hash family: position_i(x) = H(i:x) mod m. ``hash="xxhash64"`` is the
JVM-native production path; ``hash="md5"`` is the engine-portable twin
(md5 8-hex-prefix integer, the same trade as
``dedup.minhash_lsh_pairs(hash='md5')``) so a persisted filter can be
audited by any engine with md5.

Scale notes (100 TB): the build is one scan + one tiny shuffle; the probe
explodes k rows per batch row (k ≤ 8) and broadcast-joins the word table
(m = 2^20 bits → at most 32,768 words ≈ 512 KB) — no shuffle of the batch
and no scan of history. Sizing: for n historical items at target FP rate
p, m ≈ -n·ln(p)/ln(2)^2 and k ≈ (m/n)·ln(2); ``theoretical_fp_rate``
computes the forward direction for gating.
"""

from __future__ import annotations

import json
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The one parameter set every seen-content caller shares
# (seen_content_filter_batch, record_ingested_content, the harness
# queries). A persisted filter is only meaningful under the exact
# (m_bits, k, hash) it was built with — probing with different
# parameters yields silently wrong flags, including false NEGATIVES
# that re-ingest duplicates — so the family lives here once and the
# sidecar below lets a probe verify it against the table on disk.
SEEN_M_BITS = 1 << 24
SEEN_K = 5
SEEN_HASH = "xxhash64"

_META_FILE = "_bloom_meta.json"  # leading underscore: parquet readers skip it


def write_bloom_meta(path: str, m_bits: int, k: int, hash: str = SEEN_HASH) -> None:
    """Persist the (m_bits, k, hash) family next to the word table.

    Written into the table directory itself so the metadata travels
    with the table (copy/move/swap keeps them together); the leading
    underscore makes Spark's parquet reader ignore it, like _SUCCESS.
    """
    try:
        with open(os.path.join(path, _META_FILE), "w") as f:
            json.dump({"m_bits": m_bits, "k": k, "hash": hash}, f)
    except OSError:
        # meta is a guard, not a dependency (check_bloom_meta passes on
        # absence): a racing delete of the table dir (e.g. a rebuild
        # that emptied it) must not crash the caller
        pass


def check_bloom_meta(path: str, m_bits: int, k: int, hash: str = SEEN_HASH) -> None:
    """Raise ValueError if a persisted filter's recorded family differs
    from the caller's parameters. A table without a sidecar (written
    before this metadata existed, or by hand) passes — absence proves
    nothing either way, and refusing would brick existing state."""
    meta_path = os.path.join(path, _META_FILE)
    if not os.path.exists(meta_path):
        return
    with open(meta_path) as f:
        meta = json.load(f)
    want = {"m_bits": m_bits, "k": k, "hash": hash}
    if meta != want:
        raise ValueError(
            f"bloom filter at {path} was built with {meta}, probed with "
            f"{want}: mismatched parameters give silently wrong flags "
            "(rebuild the filter or pass the recorded parameters)"
        )


def _position(col, i: int, m_bits: int, hash: str):
    """k-th Bloom position of ``col``: H(i ':' x) mod m, non-negative."""
    if hash == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), col)), 1, 8), 16, 10
        ).cast("long")
    elif hash == "xxhash64":
        h = F.pmod(F.xxhash64(F.lit(i), col), F.lit(2_147_483_648))
    else:
        raise ValueError(f"unknown bloom hash {hash!r}: use 'md5' or 'xxhash64'")
    return F.pmod(h, F.lit(m_bits))


def _word_and_mask(pos_col: str = "pos"):
    # shiftleft's bit count must be a column here, so go through expr
    word_idx = F.floor(F.col(pos_col) / 32).cast("long").alias("word_idx")
    mask = F.expr(f"shiftleft(1L, CAST(pmod({pos_col}, 32) AS INT))").alias("mask")
    return word_idx, mask


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 16,
    k: int = 4,
    hash: str = "xxhash64",
) -> DataFrame:
    """Build the (word_idx, bits) bitmap over ``df[col]``.

    One scan of ``df``, one map-side-combined ``bit_or`` shuffle whose
    output is at most ``m_bits / 32`` rows. The result is small enough to
    broadcast (or persist as the incremental seen-set table and bit_or-merge
    with the next build — Bloom filters over the same (m, k, hash) family
    are mergeable by construction, see ``bloom_merge``).
    """
    positions = df.select(
        F.explode(
            F.array(*[_position(F.col(col), i, m_bits, hash) for i in range(k)])
        ).alias("pos")
    )
    word_idx, mask = _word_and_mask("pos")
    return (
        positions.select(word_idx, mask)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two bitmaps of the same (m, k, hash) family: bit_or per word."""
    return (
        a.unionByName(b).groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))
    )


def bloom_flag_seen(
    batch: DataFrame,
    words: DataFrame,
    col: str,
    id_cols: list[str],
    m_bits: int = 1 << 16,
    k: int = 4,
    hash: str = "xxhash64",
    out_col: str = "maybe_seen",
) -> DataFrame:
    """Flag each batch row whose ``col`` is (probably) in the seen-set.

    Explodes k probe positions per row, broadcast-joins the word table,
    and requires ALL k bits set. ``maybe_seen = false`` is definitive
    (no false negatives); ``true`` rows can go through a second-stage
    exact check if the FP budget demands it. Returns the distinct
    ``id_cols`` of the batch plus ``out_col``; join back on the id to
    recover payload columns (keeps the probe explode narrow — ids and
    positions only, never the document bytes).
    """
    pos = F.explode(
        F.array(*[_position(F.col(col), i, m_bits, hash) for i in range(k)])
    ).alias("pos")
    probe = batch.select(*id_cols, pos)
    word_idx, mask = _word_and_mask("pos")
    probe = probe.select(*id_cols, word_idx, mask)
    hit = F.when(
        F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("mask")) != 0), 1
    ).otherwise(0)
    # min(hit) == 1 is "every probe position is set" and stays correct
    # when id_cols is not unique (replayed rows, exact-dup batches):
    # sum(hit) == k would silently mis-flag any id with 2k exploded rows
    return (
        probe.join(F.broadcast(words), "word_idx", "left")
        .select(*id_cols, hit.alias("hit"))
        .groupBy(*id_cols)
        .agg((F.min("hit") == F.lit(1)).alias(out_col))
    )


def theoretical_fp_rate(n_items: int, m_bits: int, k: int) -> float:
    """Classic Bloom FP bound (1 - e^{-kn/m})^k."""
    if n_items <= 0:
        return 0.0
    return (1.0 - math.exp(-k * n_items / m_bits)) ** k
