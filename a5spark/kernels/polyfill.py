"""Polygon -> compacted cell cover ("polyfill") and vectorized spherical PIP.

Re-expresses reference /root/reference/a5/regions/polygon.py:232-307 and
geometry/prepared_polygon.py:91-181 with numpy batch kernels:

 * dense boundary sampling slerps whole edges at once and encodes every
   sample through the batched `spherical_to_cell`;
 * the prepared-polygon containment test (bounding cap -> crossing-number ->
   winding fallback) evaluates all probe points per ring-edge pass;
 * the interior flood fill runs the 3-move parity BFS on packed triple keys
   with per-quintant boolean bitmaps (vectorized frontier expansion).

The fill itself stays a per-polygon sequential algorithm — the engine
parallelizes ACROSS polygons (one task per polygon via applyInPandas), and
each polygon's cover is a compacted multi-resolution set that downstream
joins consume (see a5spark.operators.polygons).
"""

import math

import numpy as np

from .cell import cell_to_spherical, spherical_to_cell
from .compact import compact
from .constants import AUTHALIC_RADIUS_EARTH, FIRST_HILBERT_RESOLUTION
from .curve import s_to_cell, triple_to_s
from .neighbors import cell_neighbors_batch
from .origins import segment_to_quintant
from .serialization import deserialize, serialize
from .transforms import from_lonlat, to_cartesian, to_spherical
from .traversal import estimate_cell_radius

_CROSSING_EPS = 1e-14


# ---------------------------------------------------------------------------
# prepared polygon
# ---------------------------------------------------------------------------

class PreparedPolygon:
    """Rings as (V, 3) arrays + per-edge normals + bounding cap + ref point."""

    def __init__(self, rings):
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        self.normals = [np.cross(r, np.roll(r, -1, axis=0)) for r in self.rings]

        # bounding cap (prepared_polygon.py:36-69)
        c = self.rings[0].sum(axis=0)
        length = math.sqrt(float(c @ c))
        if length < 1e-12:
            self.cap_center = np.array([0.0, 0.0, 1.0])
            self.cap_min_dot = -1.0
        else:
            c = c / length
            self.cap_center = c
            max_angle = 0.0
            max_edge = 0.0
            for r in self.rings:
                dots = np.clip(r @ c, -1.0, 1.0)
                max_angle = max(max_angle, float(np.arccos(dots).max()))
                edge_dots = np.clip((r * np.roll(r, -1, axis=0)).sum(axis=1), -1.0, 1.0)
                max_edge = max(max_edge, float(np.arccos(edge_dots).max()))
            cap_angle = min(math.pi, max_angle + max_edge / 2)
            self.cap_min_dot = math.cos(cap_angle)

        cap_angle = math.acos(min(1.0, max(-1.0, self.cap_min_dot)))
        self.use_fast = self.cap_min_dot > -1.0 and cap_angle < 1.37
        cc = self.cap_center
        axis = np.array([0.0, 0.0, 1.0]) if abs(cc[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        perp = np.cross(cc, axis)
        d_len = math.sqrt(float(perp @ perp)) or 1.0
        theta = cap_angle + 0.2
        self.ref = cc * math.cos(theta) + perp * (math.sin(theta) / d_len)


def _winding_contains(points, ring):
    """Vectorized point_in_spherical_polygon (spherical_polygon.py:41-68)."""
    P = points
    angle_sum = np.zeros(P.shape[0])
    n = ring.shape[0]
    for i in range(n):
        av = ring[i]
        bv = ring[(i + 1) % n]
        dot_pa = P @ av
        dot_pb = P @ bv
        ap = av[None, :] - dot_pa[:, None] * P
        bp = bv[None, :] - dot_pb[:, None] * P
        cxv = np.cross(ap, bp)
        num = (cxv * P).sum(axis=1)
        den = (ap * bp).sum(axis=1)
        angle_sum += np.arctan2(num, den)
    return np.abs(angle_sum) > math.pi


def _winding_pip(points, prep):
    out = _winding_contains(points, prep.rings[0])
    for ring in prep.rings[1:]:
        out &= ~_winding_contains(points, ring)
    return out


def _crossing_parity(points, prep):
    """Vectorized crossing-number test (prepared_polygon.py:126-169).
    Returns (parity_bool, valid_bool) — invalid rows need the winding
    fallback."""
    P = points
    r = prep.ref
    ab = np.cross(P, np.broadcast_to(r, P.shape))
    crossings = np.zeros(P.shape[0], dtype=np.int64)
    valid = np.ones(P.shape[0], dtype=bool)
    for ri, ring in enumerate(prep.rings):
        norms = prep.normals[ri]
        n = ring.shape[0]
        s_first = ab @ ring[0]
        valid &= np.abs(s_first) >= _CROSSING_EPS
        s_prev = s_first
        for i in range(n):
            if i + 1 == n:
                s_next = s_first
            else:
                s_next = ab @ ring[i + 1]
                valid &= np.abs(s_next) >= _CROSSING_EPS
            straddle = s_prev * s_next < 0
            if straddle.any():
                cd = norms[i]
                cbd = -(cd @ r)
                dac = P @ cd
                valid &= ~(straddle & ((abs(cbd) < _CROSSING_EPS) | (np.abs(dac) < _CROSSING_EPS)))
                acb = -s_prev
                crossings += (straddle & (acb * cbd > 0) & (acb * dac > 0)).astype(np.int64)
            s_prev = s_next
    return (crossings & 1) == 1, valid


def point_in_prepared_polygon(points, prep: PreparedPolygon):
    """Vectorized full containment test over (N, 3) probe points."""
    points = np.asarray(points, dtype=np.float64)
    inside_cap = points @ prep.cap_center >= prep.cap_min_dot
    out = np.zeros(points.shape[0], dtype=bool)
    if not inside_cap.any():
        return out
    probe = points[inside_cap]
    if prep.use_fast:
        parity, valid = _crossing_parity(probe, prep)
        res = parity
        if not valid.all():
            res = parity.copy()
            res[~valid] = _winding_pip(probe[~valid], prep)
    else:
        res = _winding_pip(probe, prep)
    out[inside_cap] = res
    return out


# ---------------------------------------------------------------------------
# ring sampling
# ---------------------------------------------------------------------------

def _ring_winding_sign(ring):
    """spherical_polygon.py:71-85."""
    c = ring.sum(axis=0)
    ln = math.sqrt(float(c @ c))
    if ln > 0:
        c = c / ln
    nxt = np.roll(ring, -1, axis=0)
    s = float((c[None, :] * np.cross(ring, nxt)).sum())
    return 1 if s > 0 else -1


def _sample_ring(ring_vecs, sample_interval):
    """Dense samples along all edges of a ring. Returns (points (M, 3),
    seg_idx (M,)): per-sample segment index (vertices included per segment,
    mirroring _dense_sample_boundary's record order semantics)."""
    n = ring_vecs.shape[0]
    nxt = np.roll(ring_vecs, -1, axis=0)
    dots = np.clip((ring_vecs * nxt).sum(axis=1), -1.0, 1.0)
    gamma = np.arccos(dots)
    dist = gamma * AUTHALIC_RADIUS_EARTH
    num_segments = np.maximum(1, np.ceil(dist / sample_interval)).astype(np.int64)

    pts = []
    seg = []
    for i in range(n):
        k = int(num_segments[i])
        a = ring_vecs[i]
        b = nxt[i]
        # endpoints first (vertex cells), then interior slerp samples
        pts.append(a[None, :])
        seg.append([i])
        if k > 1:
            g = gamma[i]
            if g < 1e-12:
                t = np.arange(1, k) / k
                interior = a[None, :] + t[:, None] * (b - a)[None, :]
            else:
                sg = math.sin(g)
                t = np.arange(1, k) / k
                wa = np.sin((1 - t) * g) / sg
                wb = np.sin(t * g) / sg
                interior = wa[:, None] * a[None, :] + wb[:, None] * b[None, :]
            pts.append(interior)
            seg.append(np.full(k - 1, i))
        pts.append(b[None, :])
        seg.append([(i)])
    return np.concatenate(pts), np.concatenate([np.asarray(s) for s in seg])


# ---------------------------------------------------------------------------
# packed-key flood fill (lattice_flood_fill.py:84-226, bitmap-vectorized)
# ---------------------------------------------------------------------------

def _cells_to_packed(cells, hres, max_row, y_stride):
    """cells (uint64) -> (quintant_index, packed_key) plus context arrays."""
    origin, segment, S, resolution = deserialize(cells)
    quintant, orientation = segment_to_quintant(segment, origin)
    x, y, z, _ = s_to_cell(S, hres, orientation)
    parity = x + y + z
    qidx = origin * 60 + segment
    key = (x + max_row) * y_stride + y * 2 + parity
    return qidx, key, origin, segment, orientation


def _flood_quintant(visited, frontier_keys, max_row, y_stride, max_layers=None):
    """BFS in packed key space within one quintant; visited is a bool bitmap
    or a python set (mutated). Returns (discovered_keys, final_frontier_keys)."""
    use_set = isinstance(visited, set)
    discovered = []
    frontier = frontier_keys
    layers = 0
    while frontier.size and (max_layers is None or layers < max_layers):
        parity = frontier % 2
        y_part = (frontier - parity) % y_stride
        y = y_part // 2
        x = (frontier - y_part - parity) // y_stride - max_row
        step = np.where(parity == 0, 1, -1)
        new_parity = 1 - parity
        y_limit = y - new_parity
        z = parity - x - y

        cands = []
        # x move
        nx = x + step
        ok = (nx <= 0) & (z <= 0) & (nx >= -y_limit) & (z >= -y_limit)
        cands.append(((nx[ok] + max_row) * y_stride + y[ok] * 2 + new_parity[ok]))
        # y move
        ny = y + step
        ny_limit = ny - new_parity
        ok = (ny >= 0) & (ny <= max_row) & (z <= 0) & (x >= -ny_limit) & (z >= -ny_limit)
        cands.append(((x[ok] + max_row) * y_stride + ny[ok] * 2 + new_parity[ok]))
        # z move
        nz = z + step
        ok = (nz <= 0) & (x >= -y_limit) & (nz >= -y_limit)
        cands.append(((x[ok] + max_row) * y_stride + y[ok] * 2 + new_parity[ok]))

        cand = np.unique(np.concatenate(cands))
        if use_set:
            fresh = np.array(
                [k for k in cand.tolist() if k not in visited], dtype=np.int64
            )
            visited.update(fresh.tolist())
        else:
            fresh = cand[~visited[cand]]
            visited[fresh] = True
        discovered.append(fresh)
        frontier = fresh
        layers += 1
    disc = np.concatenate(discovered) if discovered else np.empty(0, dtype=np.int64)
    return disc, frontier


def _packed_to_cells(keys, ctx, hres, max_row, y_stride, resolution):
    """Packed keys -> cell ids for one quintant context (origin, segment,
    orientation)."""
    parity = keys % 2
    y_part = (keys - parity) % y_stride
    y = y_part // 2
    x = (keys - y_part - parity) // y_stride - max_row
    z = parity - x - y
    origin_id, segment, orientation = ctx
    n = keys.shape[0]
    s = triple_to_s(x, y, z, hres, np.full(n, orientation, dtype=np.int64))
    max_s = np.uint64(1) << np.uint64(2 * hres)
    ok = s < max_s
    return serialize(
        np.full(n, origin_id, dtype=np.int64)[ok],
        np.full(n, segment, dtype=np.int64)[ok],
        s[ok],
        resolution,
    )


# ---------------------------------------------------------------------------
# polygon_to_cells
# ---------------------------------------------------------------------------

def _strip_closing(ring):
    if len(ring) > 1 and ring[0][0] == ring[-1][0] and ring[0][1] == ring[-1][1]:
        return ring[:-1]
    return ring


def polygon_to_cells(polygon, resolution: int) -> np.ndarray:
    """Compacted cell cover of a (possibly holed) polygon by center-point
    containment. `polygon` is a ring [[lon, lat], ...] or rings
    [outer, hole, ...]. Returns sorted uint64 cell ids (mixed resolution)."""
    if len(polygon) == 0:
        return np.empty(0, dtype=np.uint64)
    is_nested = hasattr(polygon[0][0], "__len__")
    input_rings = [list(r) for r in polygon] if is_nested else [list(polygon)]
    if not input_rings:
        return np.empty(0, dtype=np.uint64)
    outer = _strip_closing(input_rings[0])
    if len(outer) < 3:
        return np.empty(0, dtype=np.uint64)
    rings = [outer]
    for hole in input_rings[1:]:
        h = _strip_closing(hole)
        if len(h) >= 3:
            rings.append(h)

    ring_vecs = []
    for ring in rings:
        arr = np.asarray(ring, dtype=np.float64)
        th, ph = from_lonlat(arr[:, 0], arr[:, 1])
        ring_vecs.append(to_cartesian(th, ph))

    prep = PreparedPolygon(ring_vecs)

    # --- dense boundary sampling -> cells ---
    cell_radius = estimate_cell_radius(resolution)
    interval = cell_radius * 0.4
    all_pts = []
    all_seg = []
    seg_offset = 0
    for rv in ring_vecs:
        pts, seg = _sample_ring(rv, interval)
        all_pts.append(pts)
        all_seg.append(seg + seg_offset)
        seg_offset += rv.shape[0]
    pts = np.concatenate(all_pts)
    segs = np.concatenate(all_seg)
    th, ph = to_spherical(pts)
    sample_cells = spherical_to_cell(th, ph, resolution)

    # unique boundary cells + (cell, seg) pairs
    boundary_cells = np.unique(sample_cells)
    pair_order = np.lexsort((segs, sample_cells))
    pc, ps = sample_cells[pair_order], segs[pair_order]
    keep = np.ones(pc.shape[0], dtype=bool)
    keep[1:] = (pc[1:] != pc[:-1]) | (ps[1:] != ps[:-1])
    pc, ps = pc[keep], ps[keep]

    # --- per-segment normals + interior signs ---
    seg_normals = []
    seg_signs = []
    for ri, rv in enumerate(ring_vecs):
        sign = (1 if ri == 0 else -1) * _ring_winding_sign(rv)
        seg_normals.append(prep.normals[ri])
        seg_signs.append(np.full(rv.shape[0], sign, dtype=np.float64))
    seg_normals = np.concatenate(seg_normals)
    seg_signs = np.concatenate(seg_signs)

    # --- boundary filter: signed-dot per (cell, seg), PIP fallback ---
    bth, bph = cell_to_spherical(boundary_cells)
    bvec = to_cartesian(bth, bph)
    # map each pair to its cell's row in boundary_cells
    cell_row = np.searchsorted(boundary_cells, pc)
    dots = (bvec[cell_row] * seg_normals[ps]).sum(axis=1)
    ambiguous_pair = np.abs(dots) < 1e-14
    inside_pair = dots * seg_signs[ps] > 0

    nb = boundary_cells.shape[0]
    any_inside = np.zeros(nb, dtype=bool)
    all_inside = np.ones(nb, dtype=bool)
    ambiguous = np.zeros(nb, dtype=bool)
    np.logical_or.at(any_inside, cell_row, inside_pair)
    np.logical_and.at(all_inside, cell_row, inside_pair | ambiguous_pair)
    np.logical_or.at(ambiguous, cell_row, ambiguous_pair)

    need_pip = ambiguous | (any_inside & ~all_inside)
    accept = ~ambiguous & all_inside & any_inside
    if need_pip.any():
        pip = point_in_prepared_polygon(bvec[need_pip], prep)
        accept[need_pip] = pip
    filtered_boundary = boundary_cells[accept]

    # --- shell: one-cell buffer with strict lattice connectivity ---
    rows, shell = cell_neighbors_batch(boundary_cells, edge_only=True, lattice=True)
    shell = np.unique(shell)
    shell = shell[~np.isin(shell, boundary_cells)]
    if shell.size == 0:
        return compact(filtered_boundary)

    sth, sph_ = cell_to_spherical(shell)
    svec = to_cartesian(sth, sph_)
    s_inside = point_in_prepared_polygon(svec, prep)
    interior_seeds = shell[s_inside]
    if interior_seeds.size == 0:
        return compact(filtered_boundary)
    firewall = np.concatenate([boundary_cells, shell[~s_inside]])

    # --- flood fill on packed keys, per quintant ---
    hres = resolution - FIRST_HILBERT_RESOLUTION + 1
    max_row = (1 << hres) - 1
    y_stride = (max_row + 1) * 2
    n_keys = (2 * max_row + 1) * y_stride + 2

    fq, fk, _, _, _ = _cells_to_packed(firewall, hres, max_row, y_stride)
    sq, sk, so, ss, sor = _cells_to_packed(interior_seeds, hres, max_row, y_stride)

    interior_cells = [interior_seeds]
    for q in np.unique(sq):
        mask = sq == q
        ctx = (int(q // 60), int(q % 60), int(sor[mask][0]))
        seeds = np.unique(sk[mask])
        if n_keys <= (1 << 26):
            visited = np.zeros(n_keys, dtype=bool)
            visited[fk[fq == q]] = True
            visited[seeds] = True
        else:
            # resolutions too fine for a bitmap: python-set membership
            visited = set(fk[fq == q].tolist())
            visited.update(seeds.tolist())
        disc, _ = _flood_quintant(visited, seeds, max_row, y_stride)
        if disc.size:
            interior_cells.append(
                _packed_to_cells(disc, ctx, hres, max_row, y_stride, resolution)
            )

    return compact(np.concatenate([filtered_boundary] + interior_cells))
