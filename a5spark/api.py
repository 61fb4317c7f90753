"""Drop-in public API mirroring the reference `a5` package surface
(/root/reference/a5/__init__.py:7-21), backed by the vectorized kernels.

Scalar-friendly: every function accepts a single value (returning a scalar /
list, like the reference) or a sequence/array (returning numpy arrays — the
batch-native form Spark UDFs use). A reference user can switch imports:

    from a5spark import api as a5
    cell = a5.lonlat_to_cell((lon, lat), 9)
"""

import numpy as np

from a5spark.kernels.constants import MAX_RESOLUTION, WORLD_CELL  # noqa: F401
from a5spark.kernels import cell as _cell
from a5spark.kernels import cell_info as _info
from a5spark.kernels import compact as _compact
from a5spark.kernels import line as _line
from a5spark.kernels import neighbors as _nbr
from a5spark.kernels import polyfill as _poly
from a5spark.kernels import serialization as _ser
from a5spark.kernels import traversal as _trav


def _is_scalar_pair(x):
    return len(x) == 2 and np.isscalar(x[0])


def lonlat_to_cell(lonlat, resolution: int):
    """(lon, lat) or arrays -> cell id(s) (int / uint64 array)."""
    if _is_scalar_pair(lonlat):
        return int(
            _cell.lonlat_to_cell(
                np.array([lonlat[0]]), np.array([lonlat[1]]), resolution
            )[0]
        )
    arr = np.asarray(lonlat, dtype=np.float64)
    return _cell.lonlat_to_cell(arr[:, 0], arr[:, 1], resolution)


def cell_to_lonlat(cell):
    if np.isscalar(cell):
        lon, lat = _cell.cell_to_lonlat(np.array([cell], dtype=np.uint64))
        return (float(lon[0]), float(lat[0]))
    lon, lat = _cell.cell_to_lonlat(np.asarray(cell, dtype=np.uint64))
    return np.stack([lon, lat], axis=-1)


def cell_to_boundary(cell, closed_ring: bool = True, segments=None):
    """Cell id -> closed CCW lonlat ring (list of (lon, lat))."""
    ring = _cell.cell_to_boundary(
        np.array([cell], dtype=np.uint64), segments=segments, closed_ring=closed_ring
    )[0]
    return [tuple(p) for p in ring]


def get_resolution(cell):
    if np.isscalar(cell):
        return int(_ser.get_resolution(np.array([cell], dtype=np.uint64))[0])
    return _ser.get_resolution(np.asarray(cell, dtype=np.uint64))


def cell_to_parent(cell, parent_resolution=None):
    if np.isscalar(cell):
        return int(
            _ser.cell_to_parent(np.array([cell], dtype=np.uint64), parent_resolution)[0]
        )
    return _ser.cell_to_parent(np.asarray(cell, dtype=np.uint64), parent_resolution)


def cell_to_children(cell, child_resolution=None):
    res = get_resolution(cell)
    target = child_resolution if child_resolution is not None else res + 1
    return [
        int(v)
        for v in _compact.uncompact(np.array([cell], dtype=np.uint64), target)
    ]


def get_res0_cells():
    return [int(v) for v in _ser.res0_cells()]


def get_num_cells(resolution: int) -> int:
    return _info.get_num_cells(resolution)


def get_num_children(parent_resolution: int, child_resolution: int) -> int:
    return _info.get_num_children(parent_resolution, child_resolution)


def cell_area(resolution: int) -> float:
    return float(_info.cell_area(resolution))


def cell_edge_length_avg(resolution: int) -> float:
    return _info.cell_edge_length_avg(resolution)


def compact(cells):
    return [int(v) for v in _compact.compact(np.asarray(list(cells), dtype=np.uint64))]


def uncompact(cells, target_resolution: int):
    return [
        int(v)
        for v in _compact.uncompact(
            np.asarray(list(cells), dtype=np.uint64), target_resolution
        )
    ]


def get_cell_neighbors(cell, edge_only: bool = False):
    return _nbr.global_cell_neighbors_scalar(int(cell), edge_only)


def grid_disk(cell, k: int):
    rows, out = _trav.grid_disk_batch(
        np.array([cell], dtype=np.uint64), k, edge_only=True
    )
    return [int(v) for v in out]


def grid_disk_vertex(cell, k: int):
    rows, out = _trav.grid_disk_batch(
        np.array([cell], dtype=np.uint64), k, edge_only=False
    )
    return [int(v) for v in out]


def spherical_cap(cell, radius_m: float):
    rows, out = _trav.spherical_cap_batch(np.array([cell], dtype=np.uint64), radius_m)
    return [int(v) for v in out]


def line_string_to_cells(waypoints, resolution: int):
    return [int(v) for v in _line.line_string_to_cells(waypoints, resolution)]


def polygon_to_cells(polygon, resolution: int):
    return [int(v) for v in _poly.polygon_to_cells(polygon, resolution)]


# drop-in type aliases (reference a5/core/coordinate_systems.py:10-11) and
# the deserialized-cell TypedDict (reference a5/core/utils.py:28-36)
from typing import NewType, TypedDict

Degrees = NewType("Degrees", float)
Radians = NewType("Radians", float)


class A5Cell(TypedDict):
    """Deserialized cell position (origin face, segment, Hilbert S, res)."""

    origin: int
    segment: int
    S: int
    resolution: int


def hex_to_u64(h: str) -> int:
    return int(h, 16)


def u64_to_hex(v: int) -> str:
    return format(int(v), "x")


__all__ = [
    "lonlat_to_cell", "cell_to_lonlat", "cell_to_boundary", "get_resolution",
    "cell_to_parent", "cell_to_children", "get_res0_cells", "get_num_cells",
    "get_num_children", "cell_area", "cell_edge_length_avg", "compact",
    "uncompact", "get_cell_neighbors", "grid_disk", "grid_disk_vertex",
    "spherical_cap", "line_string_to_cells", "polygon_to_cells",
    "hex_to_u64", "u64_to_hex", "MAX_RESOLUTION", "WORLD_CELL",
    "Degrees", "Radians", "A5Cell",
]
