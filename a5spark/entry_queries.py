"""Query registry backing __spark_entry__.py.

Each query is a (spark, sf_dir) -> DataFrame callable paired (where ANSI-SQL
expressible) with a DuckDB oracle statement over the same parquet tables.
Column names and types are aligned on both sides — the driver's comparator
sorts columns by name and value-hashes them.

Conventions for oracle-checked queries touching cell IDs: cells are built
with integer arithmetic kept strictly below 2^62 (quintant < 30) so the same
formulas evaluate identically in Spark and DuckDB without overflow, and all
cell values stay positive.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from a5spark.functions import native
from a5spark.operators import spatial
from a5spark.sources.images import images_from_sf_dir


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- synthetic-cell construction shared by the hierarchy queries ------------
# res 9 cell from an integer key: quintant = key % 30, S = (key % 65536) *
# 7919 % 65536, marker bit 41. SQL: q * 2^58 + S * 2^42 + 2^41.

_SQL_CELL9 = (
    "((l_orderkey % 30) * 288230376151711744"  # q << 58
    " + (((l_orderkey % 65536) * 7919) % 65536) * 4398046511104"  # S << 42
    " + 2199023255552)"  # 1 << 41
)


def _spark_cell9(df: DataFrame) -> DataFrame:
    k = F.col("l_orderkey")
    q = (k % 30).cast("long")
    s = ((k % 65536) * 7919) % 65536
    cell = (
        native._shl(q, F.lit(58))
        + native._shl(s, F.lit(42))
        + native._shl(F.lit(1), F.lit(41))
    )
    return df.withColumn("cell", cell)


# --- queries ----------------------------------------------------------------

def q_hier_parent_rollup(spark, sf_dir):
    """Hierarchical rollup: synthetic res-9 cells -> native parent at res 4 ->
    count per parent. Validates cell_to_parent as a Catalyst expression."""
    li = _t(spark, sf_dir, "lineitem")
    df = _spark_cell9(li)
    parent = native.cell_to_parent(F.col("cell"), 4).alias("parent_cell")
    return (
        df.groupBy(parent)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("parent_cell")
    )


def oracle_hier_parent_rollup():
    return f"""
    SELECT (c // 4503599627370496) * 4503599627370496
           + 2251799813685248 AS parent_cell,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM (SELECT {_SQL_CELL9} AS c FROM lineitem)
    GROUP BY 1 ORDER BY 1
    """


def q_hier_resolution(spark, sf_dir):
    """Mixed-resolution cells -> native resolution extraction -> histogram."""
    li = _t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    r = (k % 28 + 2).cast("int")
    q = (k % 30).cast("long")
    sbits = (F.lit(2) * (r - 1)).cast("int")
    s = ((k % 65536) * 7919).cast("long") % native._shl(F.lit(1), sbits)
    cell = (
        native._shl(q, F.lit(58))
        + native._shl(s, F.lit(58) - sbits)
        + native._shl(F.lit(1), F.lit(59) - F.lit(2) * r)
    )
    df = li.withColumn("cell", cell)
    return (
        df.groupBy(native.cell_resolution(F.col("cell")).alias("resolution"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("resolution")
    )


def oracle_hier_resolution():
    return """
    WITH cells AS (
      SELECT (l_orderkey % 30) * 288230376151711744
             + (((l_orderkey % 65536) * 7919) % (1::BIGINT << (2 * ((l_orderkey % 28 + 2) - 1))))
               * (1::BIGINT << (58 - 2 * ((l_orderkey % 28 + 2) - 1)))
             + (1::BIGINT << (59 - 2 * (l_orderkey % 28 + 2))) AS c
      FROM lineitem
    )
    SELECT CAST(CASE WHEN lsb = 56 THEN 1 WHEN lsb = 57 THEN 0
                ELSE (59 - lsb) // 2 END AS INT) AS resolution,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM (SELECT bit_count((c & -c) - 1) AS lsb FROM cells)
    GROUP BY 1 ORDER BY 1
    """


def q_hier_children(spark, sf_dir):
    """Children expansion: distinct res-5 cells from nation keys, exploded to
    res 7 (native sequence); count + extrema validate base/stride layout."""
    na = _t(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    q = (k % 30).cast("long")
    s = (k * 13) % 256
    cell = (
        native._shl(q, F.lit(58))
        + native._shl(s, F.lit(50))
        + native._shl(F.lit(1), F.lit(49))
    )
    cells = na.select(cell.alias("cell")).distinct()
    ch = cells.select(
        F.col("cell"),
        F.explode(native.cell_children(F.col("cell"), 5, 7)).alias("child"),
    )
    return ch.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_children"),
        F.min("child").alias("first_child"),
        F.max("child").alias("last_child"),
    ).orderBy("cell")


def oracle_hier_children():
    # children of a res-5 cell at res 7: marker moves from bit 49 to bit 45;
    # 16 children with stride 2^46.
    return """
    WITH cells AS (
      SELECT DISTINCT (n_nationkey % 30) * 288230376151711744
             + ((n_nationkey * 13) % 256) * 1125899906842624
             + (1::BIGINT << 49) AS cell
      FROM nation
    ), ch AS (
      SELECT cell,
             (cell - (1::BIGINT << 49)) + (1::BIGINT << 45) + i * (1::BIGINT << 46) AS child
      FROM cells, unnest(generate_series(0, 15)) AS t(i)
    )
    SELECT cell, CAST(count(*) AS BIGINT) AS n_children,
           min(child) AS first_child, max(child) AS last_child
    FROM ch GROUP BY cell ORDER BY cell
    """


def q_hier_child_join(spark, sf_dir):
    """Multi-resolution containment join: res-9 point cells vs res-4 parent
    cover via unsigned prefix equality (the is_child_of predicate)."""
    li = _spark_cell9(_t(spark, sf_dir, "lineitem"))
    cover = (
        _t(spark, sf_dir, "supplier")
        .select(((F.col("s_suppkey") % 30).cast("long")).alias("q"))
        .distinct()
        .select(
            (
                native._shl(F.col("q"), F.lit(58))
                + native._shl(F.lit(1), F.lit(51))
            ).alias("parent")
        )
    )
    j = li.join(
        F.broadcast(cover), native.is_child_of(F.col("cell"), F.col("parent"), 4)
    )
    return j.groupBy("parent").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    ).orderBy("parent")


def oracle_hier_child_join():
    return f"""
    WITH pts AS (SELECT {_SQL_CELL9} AS c FROM lineitem),
    cover AS (
      SELECT DISTINCT (s_suppkey % 30) * 288230376151711744
             + (1::BIGINT << 51) AS parent
      FROM supplier
    )
    SELECT parent, CAST(count(*) AS BIGINT) AS n_rows
    FROM pts JOIN cover ON (c // (1::BIGINT << 52)) = (parent // (1::BIGINT << 52))
    GROUP BY parent ORDER BY parent
    """


def q_images_derivation(spark, sf_dir):
    """The deterministic image+caption synthesis chain (w/h/caption/phash and
    lon) grouped by caption — validates the images source end-to-end."""
    img = images_from_sf_dir(spark, sf_dir)
    return (
        img.groupBy("caption")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum(F.col("w").cast("long") * F.col("h")).alias("total_px"),
            F.sum("phash").alias("phash_sum"),
            F.min("image_id").alias("first_image"),
            F.round(F.sum("lon"), 6).alias("lon_sum"),
        )
        .orderBy("caption")
    )


def oracle_images_derivation():
    a = "['aerial','street','satellite','drone','night','winter']"
    b = "['view','scene','photo','capture','shot','frame','image']"
    c = ("['of a harbor','of a forest','of a city block','of farmland',"
         "'of a coastline','of a mountain pass','of a river delta',"
         "'of an airport','of a stadium','of a desert road']")
    return f"""
    WITH img AS (
      SELECT o_orderkey AS k,
             printf('img_%012d', o_orderkey) AS image_id,
             CAST(32 + (o_orderkey % 8) * 8 AS BIGINT) AS w,
             CAST(32 + (o_orderkey % 5) * 8 AS BIGINT) AS h,
             ((o_orderkey % 1048576) * 2654435761 + o_orderkey % 997)
               % 4611686018427387903 AS phash,
             {a}[CAST(o_orderkey % 6 + 1 AS INT)] || ' ' ||
             {b}[CAST(o_orderkey % 7 + 1 AS INT)] || ' ' ||
             {c}[CAST(o_orderkey % 10 + 1 AS INT)] AS caption,
             ((o_orderkey % 1048576) * 9973 + 12345) % 360000 / 1000.0 - 180.0 AS lon
      FROM orders
    )
    SELECT caption, CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(w * h) AS BIGINT) AS total_px,
           CAST(sum(phash) AS BIGINT) AS phash_sum,
           min(image_id) AS first_image,
           round(sum(lon), 6) AS lon_sum
    FROM img GROUP BY caption ORDER BY caption
    """


def q_cell_density_r7(spark, sf_dir):
    """Flagship spatial aggregation (no SQL oracle — the A5 encode is not
    SQL-expressible; correctness is pinned by the kernel fixture tests):
    encode image centroids at res 7, per-cell density, top 50 hot cells."""
    img = images_from_sf_dir(spark, sf_dir)
    df = spatial.assign_cells(img, 7)
    dens = spatial.cell_density(
        df,
        extra_aggs=[
            F.approx_count_distinct("phash").alias("n_uniq_phash"),
            F.avg("w").alias("avg_w"),
        ],
    )
    return spatial.top_k_cells(dens.withColumnRenamed("n", "n_images"), 50, "n_images")


def q_multires_rollup(spark, sf_dir):
    """Multi-resolution density pyramid: encode once at res 9, roll up to
    res 5 JVM-side, count per (resolution, cell). No oracle (encode)."""
    img = images_from_sf_dir(spark, sf_dir)
    df = spatial.assign_cells_multi(img, [5, 7, 9])
    out = None
    for r in (5, 7, 9):
        level = df.groupBy(F.col(f"cell_r{r}").alias("cell")).agg(
            F.count(F.lit(1)).cast("long").alias("n_images")
        ).withColumn("resolution", F.lit(r))
        out = level if out is None else out.unionByName(level)
    return out.orderBy("resolution", "cell")


QUERIES = {
    "hier_parent_rollup": q_hier_parent_rollup,
    "hier_resolution": q_hier_resolution,
    "hier_children": q_hier_children,
    "hier_child_join": q_hier_child_join,
    "images_derivation": q_images_derivation,
    "cell_density_r7": q_cell_density_r7,
    "multires_rollup": q_multires_rollup,
}

ORACLES = {
    "hier_parent_rollup": oracle_hier_parent_rollup(),
    "hier_resolution": oracle_hier_resolution(),
    "hier_children": oracle_hier_children(),
    "hier_child_join": oracle_hier_child_join(),
    "images_derivation": oracle_images_derivation(),
}
