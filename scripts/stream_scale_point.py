"""State-store scaling evidence for the two streaming queries (VERDICT r6
item 8): run streaming_dedup_ttl and the gap-sessionizer as REAL
AvailableNow streams over replicated corpora at two scales, several
micro-batches each, and record throughput + state rows per micro-batch
from the StreamingQueryProgress metrics. Results land in BASELINE.md.

Usage: python scripts/stream_scale_point.py [scale1 scale2 ...]
(default scales 1 and 10 over the sf0.1 documents/events tables)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/a5spark_stream_scale"


def _progress_stats(query):
    batches = [p for p in query.recentProgress if p is not None]
    rows = sum(int(p["numInputRows"]) for p in batches)
    state_rows = [
        int(op["numRowsTotal"])
        for p in batches
        for op in p.get("stateOperators", [])
    ]
    return {
        "batches": len(batches),
        "input_rows": rows,
        "max_state_rows": max(state_rows) if state_rows else 0,
    }



def _stage_time_ordered(df, src: str, n_files: int) -> None:
    """Write `df` as n_files range-partitioned-by-ts files whose NAME and
    MTIME order both follow event time: FileStreamSource orders discovery
    by modification time (ties by path), and one parallel write gives all
    parts the same mtime — leaving micro-batch order random vs event time,
    which mass-drops rows as late. A real backfill's files carry
    arrival-ordered mtimes; this stages the same thing."""
    import glob

    stage = f"{src}__stage"
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(src, ignore_errors=True)
    df.repartitionByRange(n_files, "ts").sortWithinPartitions(
        "ts"
    ).write.mode("overwrite").parquet(stage)
    os.makedirs(src, exist_ok=True)
    parts = sorted(glob.glob(f"{stage}/part-*.parquet"))
    now = time.time()
    for i, p in enumerate(parts):
        dest = f"{src}/batch-{i:05d}.parquet"
        shutil.move(p, dest)
        os.utime(dest, (now + i, now + i))
    shutil.rmtree(stage, ignore_errors=True)

def run_dedup(spark, scale: int, n_files: int = 8) -> dict:
    from pyspark.sql import functions as F

    from a5spark.streaming.dedup import streaming_dedup_ttl

    src = f"{WORK}/dedup_src_{scale}"
    out = f"{WORK}/dedup_out_{scale}"
    ckpt = f"{WORK}/dedup_ckpt_{scale}"
    for p in (src, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base_n = docs.count()
    reps = spark.range(scale).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * base_n * 10).alias("doc_id"),
            "text",
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("doc_id") % 86400
            ),
        )
    )
    _stage_time_ordered(big, src, n_files)
    schema = spark.read.parquet(src).schema
    t0 = time.monotonic()
    mapped = streaming_dedup_ttl(
        spark, src, schema, text="text", id_col="doc_id",
        ts_col="ts", ttl="1 hour", watermark="10 minutes",
        source_options={"maxFilesPerTrigger": 1},
    )
    q = (
        mapped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    stats = _progress_stats(q)
    n_out = spark.read.parquet(out).count()
    return {
        "query": "streaming_dedup_ttl",
        "scale": scale,
        "rows": stats["input_rows"],
        "rows_out": n_out,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(stats["input_rows"] / wall, 1),
        "batches": stats["batches"],
        "max_state_rows": stats["max_state_rows"],
    }


def run_sessions(spark, scale: int, n_files: int = 8) -> dict:
    from pyspark.sql import functions as F

    from a5spark.streaming.sessions import streaming_sessions

    src = f"{WORK}/sess_src_{scale}"
    out = f"{WORK}/sess_out_{scale}"
    ckpt = f"{WORK}/sess_ckpt_{scale}"
    for p in (src, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    max_user = ev.agg(F.max("user_id")).collect()[0][0]
    reps = spark.range(scale).select(F.col("id").alias("rep"))
    big = ev.crossJoin(F.broadcast(reps)).select(
        (F.col("user_id") + F.col("rep") * (max_user + 1)).alias("user_id"),
        "ts",
        "value",
    )
    _stage_time_ordered(big, src, n_files)
    schema = spark.read.parquet(src).schema
    t0 = time.monotonic()
    sess = streaming_sessions(
        spark, src, schema, gap="30 minutes", watermark="2 hours",
        source_options={"maxFilesPerTrigger": 1},
    )
    q = (
        sess.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.monotonic() - t0
    stats = _progress_stats(q)
    n_out = spark.read.parquet(out).count()
    return {
        "query": "streaming_sessions",
        "scale": scale,
        "rows": stats["input_rows"],
        "rows_out": n_out,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(stats["input_rows"] / wall, 1),
        "batches": stats["batches"],
        "max_state_rows": stats["max_state_rows"],
    }


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [1, 10]
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from a5spark.session import get_spark

    spark = get_spark("a5spark-stream-scale")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for scale in scales:
        for fn in (run_dedup, run_sessions):
            r = fn(spark, scale)
            results.append(r)
            print(json.dumps(r), flush=True)
    print(json.dumps({"all": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
