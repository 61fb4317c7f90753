"""Streaming spatial density: windowed per-cell event counts.

The batch engine's cell-assignment + density pipeline, re-expressed as a
Structured Streaming job: file/rate source -> watermarked event-time windows
-> per-(window, cell) counts -> sink. The encode UDF is the same Arrow-batched
kernel; watermarking bounds state for late events.

At cluster scale this runs against a Kafka/Iceberg CDC source; the tests
drive it with availableNow triggers over parquet directories (deterministic,
no external services).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a5spark.functions.udfs import a5_lonlat_to_cell
from a5spark.sources.images import scalar_columns


def with_event_location(events: DataFrame) -> DataFrame:
    """Derive deterministic lon/lat for an event stream from user_id (the
    same overflow-safe arithmetic as the images table, so oracles can
    reproduce it)."""
    located = scalar_columns(events.withColumn("k", F.col("user_id")))
    return located.select(events.columns + ["lon", "lat"])


def streaming_cell_density(
    spark: SparkSession,
    source_dir: str,
    schema,
    resolution: int = 7,
    window: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Build the streaming DataFrame (call .writeStream on the result).

    source_dir: directory of parquet event files (streamed as they appear).
    schema: event schema (required for file streams).
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    # watermarks require TIMESTAMP (with timezone); parquet NTZ is cast
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    located = with_event_location(stream)
    cells = located.withColumn(
        "cell", a5_lonlat_to_cell(F.col("lon"), F.col("lat"), F.lit(resolution))
    )
    return (
        cells.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "cell",
            "n_events",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, table_name: str):
    """Drain everything currently in the source into an in-memory sink
    (availableNow trigger) and return the completed query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
