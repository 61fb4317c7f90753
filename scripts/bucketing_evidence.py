#!/usr/bin/env python
"""Measured evidence for the cell-bucketed co-located join (BASELINE.md).

Builds two image feeds (disjoint halves of the corpus, A5-encoded at res 3),
materializes them twice — plain parquet and cell-bucketed tables
(operators/bucketing.py) — then runs the identical join+agg query both ways
(broadcast pinned off: the big×big shape) and reports, best-of-N:

  * wall time,
  * Exchange-operator count in the compiled plan (bucketed must be 0),
  * actual shuffle bytes written per run, read app-wide from the
    AppStatusStore stage totals (delta around each run) — the measured
    volume the bucketed layout removes, which at cluster scale is 2× the
    joined columns' table bytes of NETWORK traffic per query,
  * one-time layout write cost both ways (the amortization denominator).

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/bucketing_evidence.py
Defaults to the 10×-replicated sf1 tables if present (1.5M images → two
~750k-row feeds), else sf0.1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DEFAULT = "/tmp/a5spark_sf1" if os.path.isdir("/tmp/a5spark_sf1") else "/root/testdata/sf0.1"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", _DEFAULT)
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
N_BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "32"))
# Join-key resolution. SCALE RULE (learned at the sf10 point, BASELINE.md):
# per-key join fan-out is quadratic in rows-per-cell, so the key resolution
# must grow with the corpus to keep rows/cell bounded — res 3 is right for
# ~150k images, res 7 for ~15M; a fixed-res key turns ANY equi-join
# (bucketed or shuffled) quadratic at scale.
RES = int(os.environ.get("SPARK_GRAFT_BUCKET_RES", "3"))
BASE = "/tmp/a5spark_bucketing_evidence"


def shuffle_totals(spark):
    """App-wide cumulative (write, read) shuffle bytes from the status store."""
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark.sparkContext._jvm
    args = [jvm.java.util.ArrayList()] + [
        getattr(store, f"stageList$default${i}")() for i in range(2, 6)
    ]
    stages = store.stageList(*args)
    w = r = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
    return w, r


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main():
    from pyspark.sql import functions as F

    from a5spark.operators.bucketing import (
        bucketed_join,
        count_exchanges,
        write_bucketed_table,
    )
    from a5spark.operators.spatial import assign_cells
    from a5spark.session import get_spark
    from a5spark.sources.images import images_from_sf_dir

    spark = get_spark("a5spark-bucketing-evidence")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    img = assign_cells(images_from_sf_dir(spark, SF_DIR), RES)
    feed_a = img.filter(F.col("k") % 2 == 0).select(
        "cell", F.col("image_id").alias("a_id"), F.col("w").alias("a_w")
    )
    feed_b = img.filter(F.col("k") % 2 == 1).select(
        "cell", F.col("image_id").alias("b_id"), F.col("w").alias("b_w")
    )

    # one-time materialization, both ways (the encode UDF cost is shared and
    # excluded by writing from the same parent frame)
    t_plain_write, _ = timed(
        lambda: [
            feed_a.write.mode("overwrite").parquet(f"{BASE}/plain_a"),
            feed_b.write.mode("overwrite").parquet(f"{BASE}/plain_b"),
        ]
    )
    t_bucket_write, _ = timed(
        lambda: [
            write_bucketed_table(feed_a, "ev_bucketed_a", n_buckets=N_BUCKETS,
                                 path=f"{BASE}/bucketed_a"),
            write_bucketed_table(feed_b, "ev_bucketed_b", n_buckets=N_BUCKETS,
                                 path=f"{BASE}/bucketed_b"),
        ]
    )

    def agg(j):
        return (
            j.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("a_w").cast("long") * F.col("b_w")).alias("sum_ww"),
            )
        )

    def plain_df():
        return agg(
            spark.read.parquet(f"{BASE}/plain_a").join(
                spark.read.parquet(f"{BASE}/plain_b"), "cell"
            )
        )

    def bucketed_df():
        return agg(bucketed_join(spark, "ev_bucketed_a", "ev_bucketed_b"))

    results = {}
    rows = {}
    for name, mk in (("plain", plain_df), ("bucketed", bucketed_df)):
        walls, sw = [], []
        for _ in range(N_RUNS):
            w0, _ = shuffle_totals(spark)
            t, n = timed(lambda: mk().count())
            w1, _ = shuffle_totals(spark)
            walls.append(round(t, 3))
            sw.append(w1 - w0)
            rows[name] = n
        results[name] = {
            "wall_best": min(walls),
            "wall_samples": walls,
            "shuffle_write_bytes": max(sw),  # identical across runs; max vs 0-noise
            "exchanges_in_plan": count_exchanges(mk()),
        }
    assert rows["plain"] == rows["bucketed"], rows

    out = {
        "sf_dir": SF_DIR,
        "feed_rows_each": feed_a.count(),
        "result_rows": rows["plain"],
        "n_buckets": N_BUCKETS,
        "write_sec_plain": round(t_plain_write, 3),
        "write_sec_bucketed": round(t_bucket_write, 3),
        "join": results,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
