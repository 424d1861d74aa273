"""Flatness evidence for the seen-content pre-filter (round 10).

The 100-TB argument for `streaming/ops.py seen_content_filter_batch`
is that per-batch cost tracks the BATCH, not the history: stage 1 is a
broadcast Bloom probe over the batch alone, and stage 2's stored-side
read is partition-pruned to the `pmod(content_hash, 256)` buckets the
flagged rows actually touch. This tool MEASURES that: a FIXED batch
(500 docs: half verbatim replays under new ids, half fresh variants)
is filtered against seen-state built from history at three sizes —

  1x   sf0.1 documents            (  5,000 docs)
  10x  replicated sf0.1           ( 50,000 docs)
  100x replicated sf0.1           (500,000 docs)

and reports the log-log slope between consecutive scales:
slope = log(t2/t1) / log(n2/n1); 0.0 = perfectly flat (the claim),
<= ~0.3 is the acceptance bar (bucket files grow, so the pruned read
is allowed to creep sublinearly; anything near 1.0 would mean the
filter secretly rescans history like the plain anti-join does).

The contrast row times the PLAIN anti-join of the same batch against
the same history — the reference's delta shape (J1) — whose cost DOES
grow with history; it is the thing the Bloom path replaces.

Usage: python tools/seen_flatness.py [runs]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark.streaming.ops import (
        record_ingested_content,
        seen_content_filter_batch,
    )

    spark = get_session("seen_flatness")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )

    def history_at(mult: int):
        if mult == 1:
            return base
        copies = spark.range(mult).select(F.col("id").alias("_copy"))
        return (
            base.crossJoin(copies)
            .select(
                (F.col("doc_id") + F.col("_copy") * 10_000_000).alias("doc_id"),
                # per-copy prefix: every copy is DISTINCT content, so the
                # seen-state genuinely holds mult * 5000 entries
                F.concat(F.format_string("c%d ", "_copy"), "text").alias("text"),
            )
        )

    # fixed probe batch: 250 replays of 1x content + 250 fresh variants
    batch = (
        base.filter(F.col("doc_id") % 20 == 0)
        .limit(250)
        .select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .unionByName(
            base.filter(F.col("doc_id") % 20 == 1)
            .limit(250)
            .select("doc_id", F.concat("text", F.lit(" <FRESH>")).alias("text"))
        )
        .localCheckpoint()
    )

    warmed = False
    rows = []
    for mult in (1, 10, 100):
        n_hist = 5000 * mult
        work = tempfile.mkdtemp(prefix=f"seenflat_{mult}x_")
        bloom_p = os.path.join(work, "bloom")
        hashes_p = os.path.join(work, "hashes")
        hist = history_at(mult).localCheckpoint()
        # state build is NOT the thing under test (it is amortized over
        # the whole ingest history); size m to the corpus for a sane FP
        # rate at every scale
        m_bits = 1 << 24
        record_ingested_content(hist, bloom_p, hashes_p, m_bits=m_bits)

        if not warmed:
            # one untimed pass of both plans so scale 1x doesn't pay
            # whole-stage-codegen compile that the later scales reuse
            seen_content_filter_batch(batch, bloom_p, hashes_p, m_bits=m_bits).count()
            batch.join(hist.select("text").distinct(), "text", "left_anti").count()
            warmed = True

        best_f = min(
            _timed(
                lambda: seen_content_filter_batch(
                    batch, bloom_p, hashes_p, m_bits=m_bits
                ).count()
            )
            for _ in range(RUNS)
        )
        best_aj = min(
            _timed(
                lambda: batch.join(
                    hist.select("text").distinct(), "text", "left_anti"
                ).count()
            )
            for _ in range(RUNS)
        )
        rows.append((mult, n_hist, best_f, best_aj))
        print(
            f"history {mult:>3}x ({n_hist:>6} docs): "
            f"seen_filter {best_f:6.2f}s   plain_anti_join {best_aj:6.2f}s",
            flush=True,
        )
        shutil.rmtree(work)

    print("\nslopes (log t-ratio / log n-ratio; flat = 0.0, bar <= 0.3):")
    for (m1, n1, f1, a1), (m2, n2, f2, a2) in zip(rows, rows[1:]):
        sf = math.log(f2 / f1) / math.log(n2 / n1)
        sa = math.log(a2 / a1) / math.log(n2 / n1)
        print(
            f"  {m1}x -> {m2}x: seen_filter slope {sf:+.2f}   "
            f"plain_anti_join slope {sa:+.2f}"
        )


def _timed(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


if __name__ == "__main__":
    main()
