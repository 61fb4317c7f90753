"""Resumable batch pipeline: per-partition commit manifest + lineage metrics.

The north rule requires jobs over the trillion-row table to be resumable from
per-partition checkpoints with lineage + row-count metrics. Design (works on
any filesystem; an Iceberg deployment gets this from snapshots, but the
manifest keeps the engine storage-agnostic):

  * work is partitioned by an explicit integer `part` column (e.g.
    pmod(xxhash64(image_id), n_parts) — deterministic lineage);
  * each completed partition writes parquet under out_dir/part=<p>/ plus a
    manifest line {part, rows, min/max keys, wall time} in _manifest/<p>.json;
  * resume = anti-join the partition list against committed manifest entries:
    only missing partitions are recomputed.

All sidecar I/O (manifest read/write, stale-partition cleanup) goes through
the Hadoop FileSystem API resolved from the path's scheme, so the manifest
protocol works identically on local paths, HDFS, and object stores — the
same resolution the parquet writes themselves use. A local-only Python
fallback keeps `committed_partitions` usable without an active session.
"""

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_partition(df: DataFrame, key: str, n_parts: int, out: str = "part") -> DataFrame:
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(key)), F.lit(n_parts)).cast("int"))


def _fs(spark: SparkSession, path_str: str):
    """(Hadoop FileSystem, Path, jvm) for a path of any supported scheme."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def _read_text(spark: SparkSession, path_str: str) -> str:
    fs, p, jvm = _fs(spark, path_str)
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _write_text(spark: SparkSession, path_str: str, text: str) -> None:
    fs, p, _ = _fs(spark, path_str)
    out = fs.create(p, True)  # overwrite: manifest commits are idempotent
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _delete_dir(spark: SparkSession, path_str: str) -> None:
    fs, p, _ = _fs(spark, path_str)
    if fs.exists(p):
        fs.delete(p, True)


def _dir_exists(spark: SparkSession, path_str: str) -> bool:
    fs, p, _ = _fs(spark, path_str)
    return bool(fs.exists(p))


def committed_partitions(out_dir: str, spark: SparkSession | None = None) -> set:
    """Partition ids with a committed manifest entry. Uses the Hadoop
    FileSystem of the active session when available (DFS/object-store
    paths); falls back to local-filesystem listing otherwise."""
    spark = spark or SparkSession.getActiveSession()
    mdir = os.path.join(out_dir, "_manifest")
    parts = set()
    if spark is not None:
        fs, p, _ = _fs(spark, mdir)
        if not fs.exists(p):
            return parts
        for status in fs.listStatus(p):
            name = status.getPath().getName()
            if name.endswith(".json"):
                entry = json.loads(_read_text(spark, os.path.join(mdir, name)))
                if entry.get("status") == "committed":
                    parts.add(int(entry["part"]))
        return parts
    if not os.path.isdir(mdir):
        return parts
    for name in os.listdir(mdir):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                entry = json.load(f)
            if entry.get("status") == "committed":
                parts.add(int(entry["part"]))
    return parts


def run_partitioned(
    df: DataFrame,
    out_dir: str,
    n_parts: int,
    key: str = "image_id",
    batch_parts: int = 8,
) -> dict:
    """Execute df partition-by-partition with commit manifests; skips
    already-committed partitions (resume). Returns summary metrics.

    At cluster scale each `part` group maps to many Spark tasks — `part` is a
    COMMIT unit, not a parallelism unit; within one part the full cluster
    parallelism applies.
    """
    import hashlib

    spark = df.sparkSession
    mfs, mpath, _ = _fs(spark, os.path.join(out_dir, "_manifest"))
    mfs.mkdirs(mpath)
    done = committed_partitions(out_dir, spark)
    todo = [p for p in range(n_parts) if p not in done]
    staged = with_partition(df, key, n_parts)
    # input lineage once per run: the scan's file set, recorded as a count +
    # order-insensitive digest (the full listing can be millions of paths at
    # cluster scale — the digest still pins exactly which inputs produced
    # each committed partition)
    in_files = sorted(df.inputFiles())
    lineage = {
        "source": key,
        "n_parts": n_parts,
        "n_input_files": len(in_files),
        "input_digest": hashlib.md5("\n".join(in_files).encode()).hexdigest(),
    }
    total_rows = 0
    t_start = time.time()
    for i in range(0, len(todo), batch_parts):
        batch = todo[i : i + batch_parts]
        part_df = staged.filter(F.col("part").isin(batch))
        path = os.path.join(out_dir, "data")
        # Drop any leftover data for this batch's UNCOMMITTED partitions
        # before writing: dynamic partition overwrite only replaces
        # partitions the new write produces rows for, so a crashed earlier
        # attempt that wrote part=p could survive if a (nondeterministic)
        # resumed source now yields zero rows for p — and the file-derived
        # count below would commit those stale rows into the manifest.
        # (Hadoop FS delete, so the cleanup also works on DFS/object-store
        # out_dirs, not just local paths.)
        for p in batch:
            _delete_dir(spark, os.path.join(path, f"part={p}"))
        # dynamic partition overwrite makes a re-run of an uncommitted batch
        # idempotent (a crash between the data write and the manifest write
        # would otherwise duplicate rows on resume under append mode)
        part_df.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("part").parquet(path)
        # derive committed counts from the files just written (one metadata
        # scan) — recomputing part_df could diverge for nondeterministic
        # sources, and the manifest must describe what is actually on disk.
        # Read ONLY this batch's partition directories (listing the whole
        # dataset per batch is O(n_parts^2) cumulative work; a batch whose
        # parts were all empty wrote no directories at all).
        batch_dirs = [
            os.path.join(path, f"part={p}")
            for p in batch
            if _dir_exists(spark, os.path.join(path, f"part={p}"))
        ]
        counts = {}
        if batch_dirs:
            counts = {
                r["part"]: (r["n"], r["kmin"], r["kmax"])
                for r in spark.read.option("basePath", path)
                .parquet(*batch_dirs)
                .groupBy("part")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min(key).alias("kmin"),
                    F.max(key).alias("kmax"),
                )
                .collect()
            }
        for p in batch:
            n, kmin, kmax = counts.get(p, (0, None, None))
            # keys may be timestamps/dates/decimals (valid partition keys);
            # stringify anything json.dumps can't take natively, or the
            # manifest write would crash AFTER the data write and force
            # every resume to recompute the batch
            def _j(v):
                return v if isinstance(v, (int, float, str, bool, type(None))) else str(v)

            entry = {
                "part": p,
                "rows": int(n),
                "min_key": _j(kmin),
                "max_key": _j(kmax),
                "status": "committed",
                "lineage": lineage,
                "wall_sec": round(time.time() - t_start, 3),
            }
            _write_text(
                spark,
                os.path.join(out_dir, "_manifest", f"{p}.json"),
                json.dumps(entry),
            )
            total_rows += entry["rows"]
    return {
        "committed_before": len(done),
        "committed_now": len(todo),
        "rows_written": total_rows,
        "wall_sec": round(time.time() - t_start, 3),
    }


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "data"))
