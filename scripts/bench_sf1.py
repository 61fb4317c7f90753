#!/usr/bin/env python
"""sf1 scaling point: replicate the sf0.1 tables 10x (deterministically,
structure-preserving) and run the most expensive registry queries engine-only.

This is the cheapest available 100x-design evidence: cover-size-bound
queries (compact_cover, cover_set_ops) should stay ~flat while row-bound
queries scale ~linearly, and raster-bound queries (grid_disk,
focal_smoothing) saturate with the cell count.

Replication is STRUCTURE-PRESERVING, not copy-paste — a 10x organic corpus
has 10x the near-dup clusters, not 10x-bigger clusters:
  * keys offset per replica (orders/lineitem/documents/embeddings);
  * document text passes through a per-replica 10-character alphabet
    rotation (a character bijection, one DISTINCT rotation per replica:
    within-replica shingle/jaccard structure is EXACT, cross-replica texts
    decorrelate);
  * embeddings get a per-replica cyclic dimension shift (an orthogonal map:
    within-replica dot products are EXACT, cross-replica pairs decorrelate).

Usage: python scripts/bench_sf1.py [--regen] — prints one JSON line.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# SPARK_GRAFT_SF_REPLICAS=30 + SPARK_GRAFT_SF_DST=/tmp/a5spark_sf3 gives the
# sf3 point (same structure-preserving replication, one more 3x step)
REPLICAS = int(os.environ.get("SPARK_GRAFT_SF_REPLICAS", "10"))
DST = os.environ.get("SPARK_GRAFT_SF_DST", "/tmp/a5spark_sf1")

QUERIES = [
    "cell_density_r7",
    "compact_cover",
    "cover_set_ops",
    "jaccard_verify",
    "minhash_lsh",
    "embed_neardup",
    "ann_lsh",
    "knn_images",
    "pip_join",
    "grid_disk",
    "focal_smoothing",
    "tile_pyramid",
    "line_trace",
]


def generate(spark):
    from pyspark.sql import functions as F

    rep = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("__r")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    n_ord = orders.count()
    if not os.path.isdir(f"{DST}/orders.parquet"):
        orders.select("*", rep).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.col("__r") * n_ord
        ).drop("__r").write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    if not os.path.isdir(f"{DST}/lineitem.parquet"):
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        li.select("*", rep).withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__r") * n_ord
        ).drop("__r").write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    if not os.path.isdir(f"{DST}/documents.parquet"):
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        n_doc = docs.count()
        alpha = "aeiousnrtl"  # 10 chars -> 10 DISTINCT rotations per replica
        # translate() takes literal alphabets only — branch per rotation
        rot = F.col("text")
        for i in range(1, REPLICAS):
            rot = F.when(
                F.col("__r") == i,
                F.translate(F.col("text"), alpha, alpha[i:] + alpha[:i]),
            ).otherwise(rot)
        docs.select("*", rep).withColumn(
            "doc_id", F.col("doc_id") + F.col("__r") * n_doc
        ).withColumn("text", rot).drop("__r").write.mode("overwrite").parquet(
            f"{DST}/documents.parquet"
        )

    if not os.path.isdir(f"{DST}/embeddings.parquet"):
        emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        n_vec = emb.count()
        dim = len(emb.select("embedding").first()[0])
        shifted = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.element_at(
                F.col("embedding"),
                (F.pmod(j + F.col("__r") * 7, F.lit(dim)) + 1).cast("int"),
            ),
        )
        emb.select("*", rep).withColumn(
            "vec_id", F.col("vec_id") + F.col("__r") * n_vec
        ).withColumn("embedding", shifted).drop("__r").write.mode(
            "overwrite"
        ).parquet(f"{DST}/embeddings.parquet")


def main():
    from a5spark import cache
    from a5spark.entry_queries import QUERIES as REGISTRY
    from a5spark.session import get_spark

    os.environ["SPARK_GRAFT_SKIP_SNAPSHOT"] = "1"  # engine-only
    spark = get_spark("a5spark-sf1", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    if "--regen" in sys.argv and os.path.isdir(DST):
        shutil.rmtree(DST)
    tables = ["orders", "lineitem", "documents", "embeddings"]
    if not all(os.path.isdir(f"{DST}/{t}.parquet") for t in tables):
        t0 = time.time()
        generate(spark)
        print(f"generated {DST} in {time.time()-t0:.1f}s", file=sys.stderr)

    # warm workers
    REGISTRY["cell_density_r7"](spark, DST).count()
    cache.release_persisted()

    reps = int(os.environ.get("SPARK_GRAFT_SF1_REPS", "2"))
    subset = [a for a in sys.argv[1:] if not a.startswith("--")] or QUERIES
    times = {}
    rows = {}
    for name in subset:
        best = None
        for _ in range(reps):
            t0 = time.time()
            n = REGISTRY[name](spark, DST).count()
            dt = time.time() - t0
            cache.release_persisted()
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        rows[name] = n
        print(f"{name}: {times[name]}s ({n} rows)", file=sys.stderr)
    print(
        json.dumps(
            {
                "sf": round(0.1 * REPLICAS, 2),
                "rows": 150_000 * REPLICAS,
                "queries": times,
                "result_rows": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
