"""SparkSession factory with the engine's scale-oriented defaults.

Defaults are tuned for the local[32] test harness but express the same knobs
a cluster deployment uses: Arrow-batched UDF transfer, AQE with skew-join
splitting, explicit shuffle partition sizing.
"""

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "a5spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(32, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-plan (notably: coalesce tiny shuffle partitions) on TOP
        # of cached plans — the compact/cover operators persist cover-sized
        # frames, and without this every post-shuffle kernel-UDF stage runs
        # at full spark.sql.shuffle.partitions width over ~KB of data, each
        # task paying a Python-worker round-trip (~0.7 s/task measured on
        # this host; compact_cover spent 180 s of executor time at <1% CPU)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
