"""k-nearest-neighbor join via grid-disk candidate expansion.

The A5 analogue of the classic cell-grid kNN join (reference grid-disk
semantics, traversal/grid_disk.py:51-70):

  1. queries expand to their k-ring disks (Arrow-batched BFS kernel) —
     candidate cell sets whose radius covers the k nearest neighbors for
     locally-uniform densities;
  2. equi-join candidates against the point table's cell column (shuffle
     hash join keyed by the int64 cell; the query side is usually the small
     side -> broadcast);
  3. exact haversine refinement JVM-side;
  4. per-query top-k with a row_number window.

Scale notes: the expansion factor is |disk| ~ 3k^2, so the shuffle volume is
bounded and explicit; hot query cells are spread by the disk explode itself.
For guaranteed-k results the caller grows `k_ring` and re-runs the residual
queries (standard iterative expansion).
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from a5spark.functions.udfs import haversine_m


@F.pandas_udf(ArrayType(LongType()))
def a5_grid_disk(cell: pd.Series, k: pd.Series) -> pd.Series:
    """Disk of cells within k edge-hops of each input cell (uncompacted)."""
    from a5spark.kernels.serialization import from_signed, to_signed
    from a5spark.kernels.traversal import grid_disk_batch

    cells = from_signed(cell.to_numpy(np.int64))
    kv = k.to_numpy()
    out = [None] * len(cells)
    for kk in np.unique(kv):
        idx = np.where(kv == kk)[0]
        rows, disk = grid_disk_batch(cells[idx], int(kk), edge_only=True, do_compact=False)
        signed = to_signed(disk)
        bounds = np.searchsorted(rows, np.arange(len(idx) + 1))
        for j in range(len(idx)):
            out[idx[j]] = signed[bounds[j] : bounds[j + 1]].tolist()
    return pd.Series(out)


@F.pandas_udf(ArrayType(LongType()))
def a5_spherical_cap(cell: pd.Series, radius_m: pd.Series) -> pd.Series:
    """Cells within a great-circle radius of each cell's center (compacted)."""
    from a5spark.kernels.serialization import from_signed, to_signed
    from a5spark.kernels.traversal import spherical_cap_batch

    cells = from_signed(cell.to_numpy(np.int64))
    rv = radius_m.to_numpy(np.float64)
    out = [None] * len(cells)
    for r in np.unique(rv):
        idx = np.where(rv == r)[0]
        rows, cap = spherical_cap_batch(cells[idx], float(r))
        signed = to_signed(cap)
        bounds = np.searchsorted(rows, np.arange(len(idx) + 1))
        for j in range(len(idx)):
            out[idx[j]] = signed[bounds[j] : bounds[j + 1]].tolist()
    return pd.Series(out)


@F.pandas_udf(ArrayType(LongType()))
def a5_cap_cover(cell: pd.Series, radius_m: pd.Series) -> pd.Series:
    """Uncompacted cap cover at the input cells' own resolution — the
    equi-join expansion form (cap -> uncompact)."""
    from a5spark.kernels.compact import uncompact
    from a5spark.kernels.serialization import from_signed, get_resolution, to_signed
    from a5spark.kernels.traversal import spherical_cap_batch

    cells = from_signed(cell.to_numpy(np.int64))
    rv = radius_m.to_numpy(np.float64)
    out = [None] * len(cells)
    target = int(get_resolution(cells[:1])[0]) if len(cells) else 0
    for r in np.unique(rv):
        idx = np.where(rv == r)[0]
        rows, cap = spherical_cap_batch(cells[idx], float(r))
        bounds = np.searchsorted(rows, np.arange(len(idx) + 1))
        for j in range(len(idx)):
            seg = cap[bounds[j] : bounds[j + 1]]
            out[idx[j]] = to_signed(uncompact(seg, target)).tolist()
    return pd.Series(out)


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    k_ring: int = 2,
    query_id: str = "query_id",
    cell: str = "cell",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Top-k nearest points for each query row.

    queries: (query_id, lon, lat, cell) — cell at the index resolution.
    points:  (..., lon, lat, cell) — same resolution.
    Returns query columns + point columns + dist_m + rank (1..k).
    """
    q = queries.repartition(64).select(
        F.col(query_id),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
        F.explode(a5_grid_disk(F.col(cell), F.lit(k_ring))).alias(cell),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    cand = q.join(points, cell, "inner")
    cand = cand.withColumn(
        "dist_m", haversine_m(F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon"))
    )
    w = Window.partitionBy(query_id).orderBy(F.asc("dist_m"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def radius_join(
    queries: DataFrame,
    points: DataFrame,
    radius_m: float,
    query_id: str = "query_id",
    cell: str = "cell",
    resolution: int | None = None,
) -> DataFrame:
    """All points within radius_m of each query: compacted-cap expansion +
    descendant-range join + exact haversine filter.

    Completeness: the cap is centered on the query CELL center and keeps cells
    by THEIR center, so the cover radius is expanded by twice the conservative
    cell circumradius (query-point offset + candidate-cell extent) — every
    point within radius_m of the query point is guaranteed to be in a covered
    cell; the final haversine filter is exact."""
    from a5spark.functions import native
    from a5spark.kernels.traversal import estimate_cell_radius

    cap_radius = radius_m
    if resolution is not None:
        cap_radius = radius_m + 2.0 * estimate_cell_radius(resolution)

    # Uncompacted cover at the query resolution -> broadcast HASH equi-join
    # (the range-join alternative is a nested loop; at fleet scale the hash
    # join's shuffle-free probe wins decisively). Caps are computed once per
    # DISTINCT query cell — co-located queries share the BFS.
    cell_covers = (
        queries.select(F.col(cell).alias("__qc"))
        .distinct()
        .repartition(64)  # spread the cap BFS across cores
        .select(
            F.col("__qc"),
            F.explode(a5_cap_cover(F.col("__qc"), F.lit(cap_radius))).alias(cell),
        )
    )
    caps = queries.select(
        F.col(query_id),
        F.col("lon").alias("q_lon"),
        F.col("lat").alias("q_lat"),
        F.col(cell).alias("__qc"),
    ).join(cell_covers, "__qc").drop("__qc")
    joined = points.join(F.broadcast(caps), cell)
    joined = joined.withColumn(
        "dist_m", haversine_m(F.col("q_lat"), F.col("q_lon"), F.col("lat"), F.col("lon"))
    )
    return joined.filter(F.col("dist_m") <= radius_m)
