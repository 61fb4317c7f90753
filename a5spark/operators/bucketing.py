"""Cell-bucketed tables: shuffle-free co-located joins for big×big joins.

Complements operators/layout.py. The layout writer optimizes SCANS (a cover
predicate prunes files/row-groups); this module optimizes repeated JOINS
between two LARGE tables on the cell key — the shape where neither side is
broadcastable and every ad-hoc join pays a full shuffle of both tables.

Writing both tables bucketed by the cell column with the SAME bucket count
makes every subsequent equi-join on that column exchange-free: Spark's
bucketing rule recognizes matching `HashPartitioning(cell, n)` output on
both scans and plans a SortMergeJoin with NO Exchange on either side. A
follow-up `groupBy(cell)` aggregation is ALSO satisfied by the join's
output partitioning, so the canonical "join two sensor feeds per cell and
aggregate" pipeline runs scan → scan → merge-join → agg with ZERO shuffles.
At 100 TB that removes the dominant network cost (2× full-table shuffle)
and, like the reference's precomputed spatial index
(/root/reference/a5/core/cell.py lonlat_to_cell as the partition key
contract), the layout cost is paid once and amortized over every query in
the workload.

Spark specifics this module encodes:
 * `bucketBy` requires `saveAsTable` — bucket metadata lives in the catalog
   (here the session's in-memory catalog; in production a metastore or an
   Iceberg table's bucket partition transform). A plain `.parquet(path)`
   write cannot record it.
 * Both sides must bucket the SAME key type with compatible bucket counts —
   we pin one `n_buckets` per co-location group.
 * `sortBy(cell)` lets the merge phase reuse the on-disk order instead of
   re-sorting when a bucket is one file; with multiple files per bucket
   Spark still avoids the Exchange and only pays a local sort.
 * AQE cannot coalesce bucketed-scan partitions (there is no shuffle to
   re-plan), so `n_buckets` IS the join parallelism — size it like you size
   `spark.sql.shuffle.partitions` for the table's volume.
"""

from pyspark.sql import DataFrame, SparkSession

def pick_join_resolution(
    n_rows: int,
    target_rows_per_cell: int = 64,
    min_res: int = 3,
    max_res: int = 12,
) -> int:
    """Density-adaptive JOIN-KEY resolution: the smallest res in
    [min_res, max_res] whose expected rows-per-cell (uniform estimate
    n / num_cells(res)) stays under `target_rows_per_cell`.

    Why (measured, sf10, BASELINE.md round 6): equi-join output per key is
    quadratic in rows-per-key, so a FIXED key resolution turns any
    cell-keyed join — bucketed or shuffled — quadratic as the corpus
    grows (res 3 at 15M images ⇒ ~28 billion joined pairs; the run never
    finished). Growing the key resolution with the corpus keeps per-key
    fan-out bounded: the same rule as `knn.pick_index_resolution`, on the
    join side. Real tables cluster spatially, so treat the uniform
    estimate as a floor and the AQE skew-join / salted path as the
    backstop for hot cells (see the skew witness in tests/test_round6.py).
    """
    from a5spark.kernels.cell_info import get_num_cells

    for res in range(min_res, max_res + 1):
        if n_rows / float(get_num_cells(res)) <= target_rows_per_cell:
            return res
    return max_res


def write_bucketed_table(
    df: DataFrame,
    table: str,
    cell: str = "cell",
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
    pre_shuffle: bool = True,
) -> None:
    """Materialize `df` as a parquet table bucketed (and bucket-sorted) by
    `cell`. With `path` the table is external — the files land at `path`
    (readable by any parquet client, e.g. the DuckDB oracle); bucket
    metadata is recorded in the session catalog under `table`.

    pre_shuffle (default on) repartitions by the bucket key into n_buckets
    partitions first: Spark's bucket id IS HashPartitioning(cell,
    n_buckets), so each write task then holds exactly one bucket and the
    table lands as ONE file per bucket instead of
    (input partitions × n_buckets) files — measured ~500 → 16 files and
    ~1 s off the write at sf0.1, and the file-per-bucket layout is what
    keeps scan/open cost flat as the writing cluster widens (guide §6
    small-files rule). Correctness is identical either way (the writer
    routes every row to its bucket regardless of physical partitioning)."""
    if pre_shuffle:
        df = df.repartition(n_buckets, cell)
    writer = df.write.format("parquet").mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, cell)
    if sort:
        writer = writer.sortBy(cell)
    # overwrite on an external table keeps stale bucket metadata if the
    # bucket count changed — drop first so the catalog entry always matches
    # the files being written
    df.sparkSession.sql(f"DROP TABLE IF EXISTS {table}")
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str = "cell",
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket column. With both
    tables bucketed on `on` with the same count, the physical plan is a
    SortMergeJoin with no Exchange (see count_exchanges)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def count_exchanges(df: DataFrame, shuffle_only: bool = False) -> int:
    """Number of Exchange operators in the compiled physical plan — by
    default ANY data-movement node (shuffle `Exchange` AND
    `BroadcastExchange`), excluding `ReusedExchange` (a reference to one
    already counted). `shuffle_only=True` counts just shuffles — note a
    plan can then report 0 while still paying a broadcast; the
    zero-exchange bucketed-join evidence uses the default (strict) count
    so it cannot pass on a hidden BroadcastExchange.

    Uses the pre-execution plan: under AQE the executed plan is an
    AdaptiveSparkPlan whose initial tree still lists every Exchange that
    would run; bucketed co-located joins must show zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = 0
    for line in plan.splitlines():
        op = line.strip().lstrip(":+-* ")
        if op.startswith("ReusedExchange"):
            continue
        if op.startswith("Exchange"):
            n += 1
        elif op.startswith("BroadcastExchange") and not shuffle_only:
            n += 1
    return n
