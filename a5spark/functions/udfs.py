"""Arrow-batched pandas UDFs wrapping the numpy kernels.

Per the engine contract (no per-row Python), every UDF receives whole Arrow
batches as pandas Series backed by numpy arrays and calls the vectorized
kernels in a5spark.kernels. Cell IDs cross the Arrow boundary as int64
(two's-complement view of the u64 bit pattern).
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from a5spark.kernels import cell as kcell
from a5spark.kernels import serialization as kser


@F.pandas_udf(LongType())
def a5_lonlat_to_cell(lon: pd.Series, lat: pd.Series, resolution: pd.Series) -> pd.Series:
    """Encode lon/lat to an A5 cell id at `resolution` (may vary per row;
    uniform-resolution batches take one vectorized pass)."""
    res = resolution.to_numpy()
    lon_v = lon.to_numpy(dtype=np.float64)
    lat_v = lat.to_numpy(dtype=np.float64)
    out = np.zeros(len(lon), dtype=np.uint64)
    for r in np.unique(res):
        m = res == r
        out[m] = kcell.lonlat_to_cell(lon_v[m], lat_v[m], int(r))
    return pd.Series(kser.to_signed(out))


@F.pandas_udf(
    StructType(
        [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
    )
)
def a5_cell_to_lonlat(cell: pd.Series) -> pd.DataFrame:
    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    lon, lat = kcell.cell_to_lonlat(cells)
    return pd.DataFrame({"lon": lon, "lat": lat})


def _boundary_lists(cell: pd.Series, segments, closed_ring: bool) -> pd.Series:
    """Shared body for the boundary UDFs: group the batch per resolution
    (the kernel is uniform-res) and emit one lonlat ring list per cell."""
    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    out = [None] * len(cells)
    res = kser.get_resolution(cells)
    for r in np.unique(res):
        m = np.where(res == r)[0]
        if r < 0:
            # WORLD_CELL is unbounded (reference core/cell.py:275-277);
            # res 0/1 rings are real (face pentagon / quintant triangle)
            for i in m:
                out[i] = []
            continue
        rings = kcell.cell_to_boundary(
            cells[m], segments=segments, closed_ring=closed_ring
        )
        for j, i in enumerate(m):
            out[i] = rings[j].tolist()
    return pd.Series(out)


@F.pandas_udf(ArrayType(ArrayType(DoubleType())))
def a5_cell_to_boundary(cell: pd.Series) -> pd.Series:
    """GeoJSON-style closed CCW lonlat ring per cell (default options:
    segments='auto' = 2^(6-res) per edge, closed)."""
    return _boundary_lists(cell, None, True)


def a5_cell_to_boundary_opts(segments=None, closed_ring: bool = True):
    """Factory for a boundary UDF with the reference's cell_to_boundary
    options (core/cell.py:258-310): `segments` per pentagon edge (None or
    'auto' = 2^(6-res), the default densification; an int pins it — the
    reference benches segments=10, benchmarks/bench_cell.py:80-81) and
    `closed_ring` (False drops the repeated first point — the open-ring
    form consumers like deck.gl PolygonLayer accept). Options are plain
    Python values, so each combination compiles to its own Arrow UDF."""
    seg = None if segments in (None, "auto") else int(segments)

    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def _boundary(cell: pd.Series) -> pd.Series:
        return _boundary_lists(cell, seg, closed_ring)

    return _boundary


@F.pandas_udf(LongType())
def a5_cell_to_parent(cell: pd.Series, parent_resolution: pd.Series) -> pd.Series:
    """Full-regime parent (res 0/1/30 included); the Hilbert-range fast path
    is the native expression a5spark.functions.native.cell_to_parent."""
    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    out = kser.cell_to_parent(cells, parent_resolution.to_numpy())
    return pd.Series(kser.to_signed(out))


@F.pandas_udf(IntegerType())
def a5_get_resolution(cell: pd.Series) -> pd.Series:
    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    return pd.Series(kser.get_resolution(cells).astype(np.int32))


@F.pandas_udf(ArrayType(LongType()))
def a5_cell_to_children(cell: pd.Series, child_resolution: pd.Series) -> pd.Series:
    """Children arrays (Hilbert range). For large expansions prefer the
    native sequence expression (functions.native.cell_children)."""
    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    cres = child_resolution.to_numpy()
    out = [None] * len(cells)
    for r in np.unique(cres):
        m = np.where(cres == r)[0]
        base, count, stride = kser.cell_to_children_s_range(cells[m], int(r))
        for j, i in enumerate(m):
            n = int(count[j])
            arr = base[j] + np.arange(n, dtype=np.uint64) * stride
            out[i] = kser.to_signed(arr).tolist()
    return pd.Series(out)


@F.pandas_udf(ArrayType(LongType()))
def a5_cell_neighbors(cell: pd.Series) -> pd.Series:
    """Global neighbors of each cell (across quintant/face boundaries;
    reference a5/traversal/global_neighbors.py:78-124), sorted-set order.
    Mixed-resolution batches group per resolution; res-0/1 cells route
    through the low-regime scalar path (the batch kernel requires res >= 2)."""
    from a5spark.kernels.neighbors import (
        cell_neighbors_batch,
        global_cell_neighbors_scalar,
    )

    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    res = kser.get_resolution(cells)
    out = [None] * len(cells)
    for r in np.unique(res):
        idx = np.where(res == r)[0]
        if r < 0:
            # the world cell (res -1) has no peers — empty neighbor set, so a
            # stray marker row can't fail the whole Arrow batch
            for i in idx:
                out[i] = []
            continue
        if r < 2:
            for i in idx:
                nbrs = np.array(
                    global_cell_neighbors_scalar(int(cells[i])), dtype=np.uint64
                )
                out[i] = kser.to_signed(nbrs).tolist()
            continue
        rows, nbrs = cell_neighbors_batch(cells[idx])
        signed = kser.to_signed(nbrs)
        bounds = np.searchsorted(rows, np.arange(len(idx) + 1))
        for j in range(len(idx)):
            out[idx[j]] = signed[bounds[j] : bounds[j + 1]].tolist()
    return pd.Series(out)


@F.pandas_udf(ArrayType(LongType()))
def a5_uncompact(cell: pd.Series, target_resolution: pd.Series) -> pd.Series:
    """Full-regime descendant expansion (res -1..30 parents, incl. the res-0/1
    marker layouts) via the kernel uncompact; the Hilbert-range fast path is
    the native sequence expression (functions.native.cell_children)."""
    from a5spark.kernels.compact import uncompact as kuncompact

    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    tr = target_resolution.to_numpy()
    out = [None] * len(cells)
    for i in range(len(cells)):
        out[i] = kser.to_signed(kuncompact(cells[i : i + 1], int(tr[i]))).tolist()
    return pd.Series(out)


@F.pandas_udf(ArrayType(LongType()))
def a5_line_to_cells(waypoints: pd.Series, resolution: pd.Series) -> pd.Series:
    """Ordered cell trace of a lonlat polyline (reference
    a5/traversal/line.py:15-92): per-row kernel call (trajectories vary in
    length; the kernel vectorizes internally across segment sample batches).
    `waypoints` is array<array<double>> of [lon, lat] pairs."""
    from a5spark.kernels.line import line_string_to_cells
    from a5spark.kernels.serialization import to_signed

    out = [None] * len(waypoints)
    for i, (wp, r) in enumerate(zip(waypoints, resolution)):
        cells = line_string_to_cells([(float(p[0]), float(p[1])) for p in wp], int(r))
        out[i] = to_signed(np.asarray(cells, dtype=np.uint64)).tolist()
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def a5_cell_area(cell: pd.Series) -> pd.Series:
    from a5spark.kernels.cell_info import cell_area

    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    res = kser.get_resolution(cells)
    return pd.Series(cell_area(res))


@F.pandas_udf(DoubleType())
def a5_cell_area_exact(cell: pd.Series) -> pd.Series:
    """Exact spherical-pentagon area in m^2 (Van Oosterom-Strackee fan over
    the cell boundary; reference a5/geometry/spherical_polygon.py:232-265)."""
    from a5spark.kernels.area import cell_area_exact

    cells = kser.from_signed(cell.to_numpy(dtype=np.int64))
    return pd.Series(cell_area_exact(cells))


@F.pandas_udf(ArrayType(LongType()))
def a5_compact_list(cells: pd.Series) -> pd.Series:
    """Kernel-compact each row's cell list (reference a5/core/compact.py
    semantics via kernels/compact.compact). One exception kept from the
    distributed operator's documented contract: the 12 res-0 cells are NOT
    collapsed into the world cell — a whole-globe cover stays 12 cells (the
    kernel's world result is expanded back)."""
    from a5spark.kernels.compact import compact as kcompact
    from a5spark.kernels.serialization import res0_cells

    out = [None] * len(cells)
    r0 = res0_cells()
    for i, lst in enumerate(cells):
        arr = kser.from_signed(np.asarray(lst, dtype=np.int64))
        had_world = (kser.get_resolution(arr) < 0).any()
        comp = kcompact(arr)
        res = kser.get_resolution(comp)
        if (res < 0).any() and not had_world:
            comp = np.concatenate([comp[res >= 0], np.asarray(r0, dtype=np.uint64)])
        out[i] = kser.to_signed(comp).tolist()
    return pd.Series(out)


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters as a native column expression
    (authalic-radius sphere). JVM-side — used for kNN distance refinement."""
    R = 6371007.2
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * R) * F.asin(F.sqrt(a))
