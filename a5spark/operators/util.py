"""Shared operator utilities."""

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ahead of a fan-out / compute-heavy transform when the
    input has fewer partitions than the cluster has slots. A small-file
    source (one parquet footer) otherwise pins the whole downstream chain —
    explode + hash + aggregate, or a mapInPandas scorer, or a broadcast-join
    pipeline — to ONE task (measured 30-36 s single-threaded vs ~2-3 s
    spread at sf1 in the minhash and IVF paths; broadcast joins preserve
    the probe side's partitioning, so a single-partition lineage survives
    arbitrarily far). The shuffle moved is the COMPACT pre-fan-out
    relation, never the expanded rows; at cluster scale real inputs arrive
    in many splits and this is a no-op."""
    if df.isStreaming:  # .rdd is undefined for streaming plans; streams
        return df  # get their parallelism from the source/shuffle config
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
