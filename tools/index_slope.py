"""Index-maintenance slope measurement: per-batch ingest + query cost
of the persisted BM25 and IVF indexes as history grows 20x (the
fold/merge/component-family protocol: history seeded by deterministic
replication of the sf0.01 tables, one timed fixed-size batch, one
timed query, fresh state per scale).

    python tools/index_slope.py            # 5k / 25k / 100k history

Expected shape (COVERAGE.md r13): FLAT at these sizes — fixed costs
dominate. The volume terms to watch at real scale: bm25 ingest is
O(touched term-buckets x history/buckets); ivf ingest is
O(touched lists x history/n_lists).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nba_data_pipeline_spark.streaming.ops import (
        bm25_ingest_batch,
        bm25_query_index,
        ivf_ingest_batch,
        ivf_query_index,
    )

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qdf = spark.createDataFrame(
        [(0, "spark window agg"), (1, "fast hash join")],
        "query_id long, query_text string",
    )

    def rep_docs(n_copies):
        return docs.crossJoin(
            spark.range(n_copies).select(F.col("id").alias("_c"))
        ).select((F.col("doc_id") + F.col("_c") * 1_000_000).alias("doc_id"), "text")

    def rep_emb(n_copies):
        return emb.crossJoin(
            spark.range(n_copies).select(F.col("id").alias("_c"))
        ).select(
            (F.col("vec_id") + F.col("_c") * 1_000_000).alias("vec_id"),
            F.expr(
                "cast(transform(embedding, (x, i) -> cast(x as double) + 0.001 * _c)"
                " as array<float>)"
            ).alias("embedding"),
        )

    n_base = docs.count()
    batch_docs = (
        docs.select((F.col("doc_id") + 900_000_000).alias("doc_id"), "text")
        .limit(200)
        .localCheckpoint()
    )
    for copies in (10, 50, 200):
        d = tempfile.mkdtemp()
        idx = f"{d}/bm25"
        bm25_ingest_batch(rep_docs(copies), idx, state_buckets=64)
        t0 = time.time()
        bm25_ingest_batch(batch_docs, idx, state_buckets=64)
        t_ing = time.time() - t0
        t0 = time.time()
        bm25_query_index(spark, idx, qdf, k=10, state_buckets=64).count()
        t_q = time.time() - t0
        print(
            f"SLOPE bm25 history={copies * n_base}: "
            f"ingest_batch(200)={t_ing:.2f}s query={t_q:.2f}s"
        )
        shutil.rmtree(d)

    batch_emb = (
        emb.select((F.col("vec_id") + 900_000_000).alias("vec_id"), "embedding")
        .limit(200)
        .localCheckpoint()
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for copies in (10, 50, 200):
        d = tempfile.mkdtemp()
        idx = f"{d}/ivf"
        ivf_ingest_batch(rep_emb(copies), idx, n_lists=64)
        t0 = time.time()
        ivf_ingest_batch(batch_emb, idx, n_lists=64)
        t_ing = time.time() - t0
        t0 = time.time()
        ivf_query_index(spark, idx, q, k=5, n_probe=3).count()
        t_q = time.time() - t0
        print(
            f"SLOPE ivf history={copies * n_base}: "
            f"ingest_batch(200)={t_ing:.2f}s query(20q,3/64 probes)={t_q:.2f}s"
        )
        shutil.rmtree(d)
    spark.stop()


if __name__ == "__main__":
    main()
