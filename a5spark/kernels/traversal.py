"""Batched grid-disk and spherical-cap traversal — the kNN / radius-query
substrate.

Re-expresses reference /root/reference/a5/traversal/grid_disk.py:10-70 and
cap.py:35-129 as frontier-array BFS over many query rows at once: each BFS
level expands the entire (row, cell) frontier through the vectorized neighbor
kernel, with pair-set membership via lexsorted searchsorted.
"""

import math

import numpy as np

from .cell import cell_to_spherical, haversine_internal
from .compact import compact
from .constants import AUTHALIC_RADIUS_EARTH, FIRST_HILBERT_RESOLUTION
from .cell_info import cell_area
from .neighbors import cell_neighbors_batch
from .serialization import cell_to_children_s_range, cell_to_parent, get_resolution

# --- cap radius helpers (cap.py:14-63) -------------------------------------

CELL_RADIUS_SAFETY_FACTOR = 2.0
MIN_CELLS_FOR_SUBDIVISION = 20
_BASE_CELL_RADIUS = CELL_RADIUS_SAFETY_FACTOR * AUTHALIC_RADIUS_EARTH / math.sqrt(15)
CELL_RADIUS = [CELL_RADIUS_SAFETY_FACTOR * AUTHALIC_RADIUS_EARTH / math.sqrt(3)] + [
    _BASE_CELL_RADIUS / (1 << (r - 1)) for r in range(1, 31)
]


def meters_to_h(meters: float) -> float:
    # A radius >= half the great circle covers the whole sphere. Without the
    # clamp sin() folds past pi/2 and the haversine threshold silently SHRINKS
    # again, excluding cells near the antipode — which broke knn_join's
    # "final radius covers the sphere -> provably exact" guarantee whenever a
    # query's true top-k included near-antipodal points.
    if meters >= math.pi * AUTHALIC_RADIUS_EARTH:
        return 1.0
    s = math.sin(meters / (2 * AUTHALIC_RADIUS_EARTH))
    return s * s


def estimate_cell_radius(resolution: int) -> float:
    return CELL_RADIUS[resolution]


def pick_coarse_resolution(radius: float, target_res: int) -> int:
    cap_area = (
        2 * math.pi * AUTHALIC_RADIUS_EARTH**2
        * (1 - math.cos(radius / AUTHALIC_RADIUS_EARTH))
    )
    for res in range(FIRST_HILBERT_RESOLUTION, target_res + 1):
        if cap_area / float(cell_area(res)) >= MIN_CELLS_FOR_SUBDIVISION:
            return res
    return target_res


# --- (row, cell) pair-set helpers -------------------------------------------

def _pair_sort(rows, cells):
    order = np.lexsort((cells, rows))
    return rows[order], cells[order]


def _pair_unique(rows, cells):
    rows, cells = _pair_sort(rows, cells)
    if rows.size == 0:
        return rows, cells
    keep = np.ones(rows.shape[0], dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (cells[1:] != cells[:-1])
    return rows[keep], cells[keep]


def _pair_isin_fast(rows, cells, set_rows, set_cells):
    """Vectorized membership via 128-bit composite keys (two uint64 columns
    compared lexicographically using structured arrays)."""
    if set_rows.size == 0:
        return np.zeros(rows.shape[0], dtype=bool)
    a = np.empty(rows.shape[0], dtype=[("r", np.int64), ("c", np.uint64)])
    a["r"], a["c"] = rows, cells
    b = np.empty(set_rows.shape[0], dtype=[("r", np.int64), ("c", np.uint64)])
    b["r"], b["c"] = set_rows, set_cells
    idx = np.searchsorted(b, a)
    idx = np.minimum(idx, b.shape[0] - 1)
    return b[idx] == a


def grid_disk_batch(cells, k: int, edge_only: bool = True, do_compact: bool = True):
    """k-ring disks for a batch of origin cells (uniform resolution).

    Returns (row, cell) flattened pairs. With do_compact=True each row's disk
    is compacted (reference grid_disk semantics); with False the raw
    fixed-resolution disk is returned (the kNN join expansion form)."""
    cells = np.asarray(cells, dtype=np.uint64)
    M = cells.shape[0]
    if k == 0:
        rows = np.arange(M, dtype=np.int64)
        return rows, cells.copy()

    int_r = [np.empty(0, dtype=np.int64)]
    int_c = [np.empty(0, dtype=np.uint64)]
    prev_r = np.empty(0, dtype=np.int64)
    prev_c = np.empty(0, dtype=np.uint64)
    fr_r = np.arange(M, dtype=np.int64)
    fr_c = cells.copy()

    for _ring in range(1, k + 1):
        if fr_c.size:
            nbr_idx, nbr_c = cell_neighbors_batch(fr_c, edge_only)
            nbr_r = fr_r[nbr_idx]
            nbr_r, nbr_c = _pair_unique(nbr_r, nbr_c)
            mask = ~_pair_isin_fast(nbr_r, nbr_c, prev_r, prev_c)
            mask &= ~_pair_isin_fast(nbr_r, nbr_c, fr_r, fr_c)
            next_r, next_c = nbr_r[mask], nbr_c[mask]
        else:
            next_r = np.empty(0, dtype=np.int64)
            next_c = np.empty(0, dtype=np.uint64)
        int_r.append(prev_r)
        int_c.append(prev_c)
        prev_r, prev_c = fr_r, fr_c
        fr_r, fr_c = next_r, next_c

    rows = np.concatenate(int_r + [prev_r, fr_r])
    out = np.concatenate(int_c + [prev_c, fr_c])
    if not do_compact:
        return _pair_unique(rows, out)
    # compact per row
    rows, out = _pair_sort(rows, out)
    res_r = []
    res_c = []
    bounds = np.searchsorted(rows, np.arange(M + 1))
    for i in range(M):
        seg = out[bounds[i] : bounds[i + 1]]
        if seg.size == 0:
            continue
        comp = compact(seg)
        res_r.append(np.full(comp.shape[0], i, dtype=np.int64))
        res_c.append(comp)
    return np.concatenate(res_r), np.concatenate(res_c)


def spherical_cap_batch(cells, radius: float):
    """All cells within `radius` meters of each origin cell's center
    (reference cap.py:66-129). Uniform-resolution batch; returns (row, cell)
    pairs, each row's result naturally compacted + sorted unsigned."""
    cells = np.asarray(cells, dtype=np.uint64)
    M = cells.shape[0]
    target_res = int(get_resolution(cells)[0])
    coarse_res = pick_coarse_resolution(radius, target_res)
    c_theta, c_phi = cell_to_spherical(cells)
    h_radius = meters_to_h(radius)

    start = (
        cell_to_parent(cells, coarse_res) if coarse_res < target_res else cells.copy()
    )
    h_expanded = meters_to_h(radius + estimate_cell_radius(coarse_res))

    vis_r = np.arange(M, dtype=np.int64)
    vis_c = start.copy()
    vis_r, vis_c = _pair_unique(vis_r, vis_c)
    fr_r, fr_c = vis_r.copy(), vis_c.copy()

    while fr_c.size:
        nbr_idx, nbr_c = cell_neighbors_batch(fr_c, edge_only=False)
        nbr_r = fr_r[nbr_idx]
        nbr_r, nbr_c = _pair_unique(nbr_r, nbr_c)
        fresh = ~_pair_isin_fast(nbr_r, nbr_c, vis_r, vis_c)
        nbr_r, nbr_c = nbr_r[fresh], nbr_c[fresh]
        # visited grows by ALL fresh neighbors (in/out of range alike)
        vis_r, vis_c = _pair_unique(
            np.concatenate([vis_r, nbr_r]), np.concatenate([vis_c, nbr_c])
        )
        if nbr_c.size == 0:
            break
        th, ph = cell_to_spherical(nbr_c)
        h = haversine_internal(c_theta[nbr_r], c_phi[nbr_r], th, ph)
        keep = h <= h_expanded
        fr_r, fr_c = nbr_r[keep], nbr_c[keep]

    # hierarchical refinement coarse -> target
    out_r = [np.empty(0, dtype=np.int64)]
    out_c = [np.empty(0, dtype=np.uint64)]
    bd_r, bd_c = vis_r, vis_c

    for res in range(coarse_res, target_res):
        crad = estimate_cell_radius(res)
        h_inner = meters_to_h(radius - crad) if radius > crad else -1.0
        h_outer = meters_to_h(radius + crad)
        th, ph = cell_to_spherical(bd_c)
        h = haversine_internal(c_theta[bd_r], c_phi[bd_r], th, ph)
        inner = h <= h_inner
        out_r.append(bd_r[inner])
        out_c.append(bd_c[inner])
        split = ~inner & (h <= h_outer)
        sp_r, sp_c = bd_r[split], bd_c[split]
        if sp_c.size == 0:
            bd_r = np.empty(0, dtype=np.int64)
            bd_c = np.empty(0, dtype=np.uint64)
            break
        base, count, stride = cell_to_children_s_range(sp_c, res + 1)
        cnt = int(count[0])
        ch = base[:, None] + np.arange(cnt, dtype=np.uint64)[None, :] * stride
        bd_r = np.repeat(sp_r, cnt)
        bd_c = ch.ravel()

    if bd_c.size:
        th, ph = cell_to_spherical(bd_c)
        h = haversine_internal(c_theta[bd_r], c_phi[bd_r], th, ph)
        keep = h <= h_radius
        out_r.append(bd_r[keep])
        out_c.append(bd_c[keep])

    rows = np.concatenate(out_r)
    out = np.concatenate(out_c)
    return _pair_sort(rows, out)
