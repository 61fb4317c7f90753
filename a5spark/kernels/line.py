"""Polyline -> ordered cell trace (reference /root/reference/a5/traversal/line.py:15-92).

Great-circle arcs sampled at half-cell-radius spacing; per consecutive sample
pair, a strict local BFS (lattice 26-superset neighbors) keeps every cell
whose pentagon the 2D segment crosses in that cell's Face plane. Candidate
batches are tested vectorized (segment-vs-pentagon in numpy).
"""

import math

import numpy as np

from .cell import lonlat_to_cell, _pentagon_for_cells
from .constants import AUTHALIC_RADIUS_EARTH, FIRST_HILBERT_RESOLUTION
from .neighbors import cell_neighbors_batch
from .projections import dodec_forward
from .serialization import deserialize
from .transforms import from_lonlat, to_cartesian, to_lonlat, to_spherical
from .traversal import _pair_isin_fast as _pair_isin, _pair_unique, estimate_cell_radius


def _segments_intersect(p1, p2, p3, p4):
    """Vectorized 2D segment intersection (geometry/pentagon.py:13-28).
    p1/p2: (N, 2) segment endpoints; p3/p4: (N, 2) pentagon edges."""
    d1 = p2 - p1
    d2 = p4 - p3
    denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    ok = np.abs(denom) >= 1e-12
    d = p3 - p1
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (d[:, 0] * d2[:, 1] - d[:, 1] * d2[:, 0]) / denom
        u = (d[:, 0] * d1[:, 1] - d[:, 1] * d1[:, 0]) / denom
    return ok & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)


def _cells_intersect_segment(cells, a_lonlat, b_lonlat):
    """For each cell, does the (short) segment a->b cross its pentagon?
    Projects both endpoints into every candidate cell's Face plane
    (cell.py:329-346). Endpoints may be one pair or per-row arrays."""
    cells = np.asarray(cells, dtype=np.uint64)
    n = cells.shape[0]
    origin_id = deserialize(cells)[0]
    a_lonlat = np.broadcast_to(np.asarray(a_lonlat, dtype=np.float64), (n, 2))
    b_lonlat = np.broadcast_to(np.asarray(b_lonlat, dtype=np.float64), (n, 2))
    th_a, ph_a = from_lonlat(a_lonlat[:, 0], a_lonlat[:, 1])
    th_b, ph_b = from_lonlat(b_lonlat[:, 0], b_lonlat[:, 1])
    a_face = dodec_forward(to_cartesian(th_a, ph_a), origin_id)
    b_face = dodec_forward(to_cartesian(th_b, ph_b), origin_id)
    verts, _ = _pentagon_for_cells(cells)

    from .pentagon import polygon_contains

    inside = (polygon_contains(verts, a_face) > 0) | (polygon_contains(verts, b_face) > 0)
    crossed = inside.copy()
    for e in range(5):
        v1 = verts[:, e]
        v2 = verts[:, (e + 1) % 5]
        crossed |= _segments_intersect(a_face, b_face, v1, v2)
    return crossed


def line_string_to_cells(waypoints, resolution: int) -> np.ndarray:
    """Ordered unique cells along a polyline (list of (lon, lat))."""
    waypoints = [tuple(w) for w in waypoints]
    if not waypoints:
        return np.empty(0, dtype=np.uint64)
    if len(waypoints) == 1:
        return lonlat_to_cell(
            np.array([waypoints[0][0]]), np.array([waypoints[0][1]]), resolution
        )

    seen = set()
    result = []

    def add(cell_int):
        if cell_int not in seen:
            seen.add(cell_int)
            result.append(cell_int)

    # --- build every sub-segment of the whole polyline (vectorized slerp) ---
    interval = estimate_cell_radius(resolution) * 0.5
    seg_a = []  # per sub-segment endpoints (lon, lat)
    seg_b = []
    for i in range(len(waypoints) - 1):
        start, end = waypoints[i], waypoints[i + 1]
        th, ph = from_lonlat(
            np.array([start[0], end[0]]), np.array([start[1], end[1]])
        )
        vecs = to_cartesian(th, ph)
        a_vec, b_vec = vecs[0], vecs[1]
        dot = max(-1.0, min(1.0, float(a_vec @ b_vec)))
        dist = math.acos(dot) * AUTHALIC_RADIUS_EARTH
        n_seg = max(1, math.ceil(dist / interval))
        if n_seg > 1:
            g = math.acos(dot)
            t = np.arange(1, n_seg) / n_seg
            if g < 1e-12:
                pts = a_vec[None, :] + t[:, None] * (b_vec - a_vec)[None, :]
            else:
                sg = math.sin(g)
                pts = (
                    (np.sin((1 - t) * g) / sg)[:, None] * a_vec[None, :]
                    + (np.sin(t * g) / sg)[:, None] * b_vec[None, :]
                )
            ith, iph = to_spherical(pts)
            ilon, ilat = to_lonlat(ith, iph)
            samples = [start] + list(zip(ilon.tolist(), ilat.tolist())) + [end]
        else:
            samples = [start, end]
        for j in range(len(samples) - 1):
            seg_a.append(samples[j])
            seg_b.append(samples[j + 1])

    seg_a = np.asarray(seg_a, dtype=np.float64)
    seg_b = np.asarray(seg_b, dtype=np.float64)
    n_segs = seg_a.shape[0]
    ca = lonlat_to_cell(seg_a[:, 0], seg_a[:, 1], resolution)
    cb = lonlat_to_cell(seg_b[:, 0], seg_b[:, 1], resolution)

    # --- one batched BFS across ALL sub-segments: state is (seg, cell) ---
    active = ca != cb
    fr_seg = np.concatenate([np.where(active)[0], np.where(active)[0]])
    fr_cell = np.concatenate([ca[active], cb[active]])
    fr_seg, fr_cell = _pair_unique(fr_seg, fr_cell)
    vis_seg, vis_cell = fr_seg.copy(), fr_cell.copy()
    kept_layers = []  # (layer, seg, cell) pairs in layer-sorted order

    layer = 0
    while fr_cell.size:
        idx, nbr = cell_neighbors_batch(fr_cell, edge_only=False, lattice=True)
        nseg = fr_seg[idx]
        nseg, nbr = _pair_unique(nseg, nbr)
        fresh = ~_pair_isin(nseg, nbr, vis_seg, vis_cell)
        nseg, nbr = nseg[fresh], nbr[fresh]
        vis_seg, vis_cell = _pair_unique(
            np.concatenate([vis_seg, nseg]), np.concatenate([vis_cell, nbr])
        )
        if nbr.size == 0:
            break
        hit = _cells_intersect_segment(nbr, seg_a[nseg], seg_b[nseg])
        kseg, kcell = nseg[hit], nbr[hit]
        if kcell.size:
            kept_layers.append((layer, kseg, kcell))
        fr_seg, fr_cell = kseg, kcell
        layer += 1

    # --- emit in the sequential order the per-segment walk produces ---
    per_seg_layers = {}
    for lay, kseg, kcell in kept_layers:
        for ss in np.unique(kseg):
            per_seg_layers.setdefault(int(ss), []).append(kcell[kseg == ss])
    for j in range(n_segs):
        add(int(ca[j]))
        add(int(cb[j]))
        for cells_in_layer in per_seg_layers.get(j, []):
            for c in cells_in_layer.tolist():
                add(int(c))
    return np.array(result, dtype=np.uint64)
