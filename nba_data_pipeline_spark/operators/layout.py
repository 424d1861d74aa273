"""Z-order (Morton) clustered layout for multi-column pruning.

The reference's secondary indexes (SURVEY.md S9) map to partition
layout + parquet row-group min/max stats. Partitioning handles the
first filter column; a SECOND frequently-filtered column only prunes
if rows are physically clustered on it too. A space-filling curve
interleaves the bits of both keys so sorting by the curve keeps rows
close in BOTH dimensions — each parquet row group then spans a small
rectangle of (a, b) space and min/max stats prune on either column.

Pure Column bit arithmetic (the classic shift-mask bit spread), no UDF;
the write is one range repartition + partition-local sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(x: Column) -> Column:
    """Interleave-ready form of a 16-bit value: bit i moves to bit 2i."""
    out = x.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_MASKS:
        out = out.bitwiseOR(F.shiftleft(out, shift)).bitwiseAND(F.lit(mask))
    return out


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative integer
    expressions (caller buckets/clamps wider domains first, e.g.
    ``F.pmod(col, 1 << 16)``). Even bit positions carry ``a``, odd carry
    ``b``."""
    if bits > 16:
        raise ValueError("zorder_key interleaves at most 16 bits per column")
    mask = (1 << bits) - 1
    # cast to long BEFORE spreading: with IntegerType inputs the whole
    # expression would stay 32-bit and shiftleft(cb, 1) pushes b's bit 15
    # into the int32 sign bit, producing negative z-keys that sort first
    # and break Morton clustering
    col_a = (F.col(a) if isinstance(a, str) else a).cast("long")
    col_b = (F.col(b) if isinstance(b, str) else b).cast("long")
    ca = _spread_bits(col_a.bitwiseAND(F.lit(mask)))
    cb = _spread_bits(col_b.bitwiseAND(F.lit(mask)))
    return ca.bitwiseOR(F.shiftleft(cb, 1)).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    num_files: int = 32,
    partition_by: Sequence[str] = (),
) -> None:
    """Write parquet clustered on the Morton curve of two columns:
    range-repartition by the z-key (balanced files that own contiguous
    curve segments), sort within partitions, drop the key. Filters on
    EITHER column then prune row groups via min/max stats — the 100 TB
    substitute for the reference's multiple B-tree indexes."""
    if len(zorder_cols) != 2:
        raise ValueError("z-ordering interleaves exactly two columns")
    a, b = zorder_cols
    keyed = df.withColumn("_zkey", zorder_key(a, b))
    arranged = keyed.repartitionByRange(num_files, "_zkey").sortWithinPartitions("_zkey")
    writer = arranged.drop("_zkey").write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def assign_ordinals(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "ordinal",
    num_partitions: int | None = None,
) -> DataFrame:
    """Dense global row ordinals (0..n-1) in ``order_cols`` order
    WITHOUT the single-partition ``row_number() OVER (ORDER BY ...)``
    chokepoint — the distributed zipWithIndex pattern, needed wherever
    a corpus wants stable document ordinals (shard-stable sampling,
    resumable iteration, deterministic interleaving).

    Plan: range-repartition on the order keys (each partition owns a
    contiguous key range), count rows per partition (tiny aggregate —
    one row per partition), turn counts into cumulative start offsets
    with a window over that partition-count frame (driver-scale, not
    data-scale), broadcast-join the offsets back, and add a
    partition-LOCAL row_number. Every sort is partition-local; the
    only full shuffle is the range repartition that any total order
    needs.

    ``order_cols`` must be a TOTAL order (include a unique tiebreaker
    such as the primary key): with duplicate sort keys the ordinal of
    tied rows would depend on partition-internal placement.
    """
    if not order_cols:
        raise ValueError("order_cols must be non-empty")
    from pyspark.sql import Window  # noqa: PLC0415

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    keyed = ranged.withColumn("_pid", F.spark_partition_id())
    # localCheckpoint pins the partitioning: _pid must mean the same
    # physical partition in the counts aggregate and the final window,
    # and the range shuffle must not replay twice
    keyed = keyed.localCheckpoint(eager=False)
    counts = keyed.groupBy("_pid").agg(F.count("*").alias("_n"))
    offsets = counts.withColumn(
        "_start",
        F.coalesce(
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("_pid", "_start")
    # offsets has one row per partition — broadcast unconditionally
    local_rn = F.row_number().over(
        Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    )
    return (
        keyed.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_start") + local_rn - 1).cast("long"))
        .drop("_pid", "_start")
    )
