"""Batched cell-neighbor traversal.

Re-expresses the reference neighbor machinery
(/root/reference/a5/traversal/{neighbors,quintant_neighbors,lattice_boundary,
global_neighbors}.py) as vectorized table gathers over row batches. Neighbors
are determined by fixed triple-delta tables:

 * within-quintant: 5 edge + 2 vertex deltas per pentagon flavor;
 * cross-quintant / cross-face / apex / corner: fixed delta tables selected by
   parity and y-oddness, with quintant/face handoff via FACE_ADJACENCY.

The batch API returns flattened (row_index, neighbor_cell) pairs, deduplicated
and sorted per row in unsigned cell order — ready to feed `explode` in a
pandas UDF or a BFS frontier expansion.
"""

import numpy as np

from .constants import FIRST_HILBERT_RESOLUTION
from .curve import s_to_cell, triple_to_s
from .origins import quintant_to_segment, segment_to_quintant
from .serialization import deserialize, serialize

# Within-quintant neighbor deltas per flavor (traversal/neighbors.py:30-51):
# 5 edge-sharing then 2 vertex-only. Flavors 1/3 are flavors 0/2 negated.
_DELTAS_F0 = [(0, 0, 1), (0, 1, -1), (0, 1, 0), (1, -1, 0), (1, 0, 0), (1, -1, 1), (1, 1, -1)]
_DELTAS_F2 = [(-1, 1, 0), (0, -1, 1), (0, 0, 1), (0, 1, 0), (1, 0, 0), (-1, 1, 1), (1, -1, 1)]
NEIGHBOR_DELTAS = np.array(
    [
        _DELTAS_F0,
        [tuple(-v for v in d) for d in _DELTAS_F0],
        _DELTAS_F2,
        [tuple(-v for v in d) for d in _DELTAS_F2],
    ],
    dtype=np.int64,
)  # (4, 7, 3)

# Cross-quintant / cross-face deltas (lattice_boundary.py:19-50):
# (dx, dy, dz, is_edge), indexed by parity * 2 + y_odd.
LEFT_EDGE_DELTAS = [
    [(0, 0, 0, 1), (0, 0, 1, 0)],
    [(0, 0, 0, 1), (0, 1, 0, 1), (0, -1, 1, 0), (0, 1, -1, 0)],
    [],
    [(0, -1, 0, 1), (0, 0, -1, 0)],
]
RIGHT_EDGE_DELTAS = [
    [(0, 0, 0, 1), (0, 1, 0, 1), (-1, 1, 0, 0), (1, -1, 0, 0)],
    [(0, 0, 0, 1), (1, 0, 0, 0)],
    [(0, -1, 0, 1), (-1, 0, 0, 0)],
    [],
]
CROSS_FACE_DELTAS = [
    [(0, 0, 0, 1), (1, 0, 0, 1), (1, 0, -1, 0)],
    [(0, 0, -1, 1), (0, 0, 0, 0)],
]

# FACE_ADJACENCY[origin][quintant] = (adjacent origin, adjacent quintant)
# (core/face_adjacency.py:11-24).
FACE_ADJACENCY = np.array(
    [
        [[1, 2], [4, 3], [5, 4], [6, 0], [11, 1]],
        [[2, 3], [4, 4], [0, 0], [11, 0], [10, 1]],
        [[9, 2], [3, 0], [4, 0], [1, 0], [10, 0]],
        [[2, 1], [9, 1], [8, 1], [5, 1], [4, 1]],
        [[2, 2], [3, 4], [5, 0], [0, 1], [1, 1]],
        [[4, 2], [3, 3], [8, 0], [6, 1], [0, 2]],
        [[0, 3], [5, 3], [8, 4], [7, 1], [11, 2]],
        [[11, 3], [6, 3], [8, 3], [9, 4], [10, 3]],
        [[5, 2], [3, 2], [9, 0], [7, 2], [6, 2]],
        [[8, 2], [3, 1], [2, 0], [10, 4], [7, 3]],
        [[2, 4], [1, 4], [11, 4], [7, 4], [9, 3]],
        [[1, 3], [0, 4], [6, 4], [7, 0], [10, 2]],
    ],
    dtype=np.int64,
)


def _triple_in_bounds(x, y, z, max_row):
    """traversal bounds test (lattice/triple.py:16-22)."""
    s = x + y + z
    ok = (s == 0) | (s == 1)
    limit = y - s
    return ok & (x <= 0) & (z <= 0) & (y >= 0) & (y <= max_row) & (x >= -limit) & (z >= -limit)


def _emit(acc, rows, x, y, z, hres, orientation, origin, segment, resolution, max_row, exclude_s=None):
    """Bounds-check candidate triples, convert to S, serialize, append to acc."""
    ok = _triple_in_bounds(x, y, z, max_row)
    if not ok.any():
        return
    rows = rows[ok]
    s = triple_to_s(x[ok], y[ok], z[ok], hres, orientation[ok])
    max_s = np.uint64(1) << np.uint64(2 * hres)
    valid = s < max_s
    if exclude_s is not None:
        valid &= s != exclude_s[ok]
    if not valid.any():
        return
    cells = serialize(origin[ok][valid], segment[ok][valid], s[valid], resolution)
    acc[0].append(rows[valid])
    acc[1].append(cells)


def cell_neighbors_batch(
    cells: np.ndarray,
    edge_only: bool = False,
    lattice: bool = False,
):
    """All neighbors of each cell (global: across quintant/face boundaries).

    cells: (N,) uint64, uniform resolution >= 2.
    Returns (row_idx, neighbor_cell): flattened pairs, deduplicated, sorted by
    (row, unsigned cell) — matching the reference's sorted-set semantics
    (global_neighbors.py:78-124).

    With lattice=True the within-quintant candidates are the lattice +-1 moves
    instead of the flavor deltas (lattice_neighbors.py:68-126): edge_only picks
    the 3 parity-valid moves (flood-fill connectivity, corner skipped),
    otherwise the 26-cube superset."""
    cells = np.asarray(cells, dtype=np.uint64)
    N = cells.shape[0]
    origin, segment, S, resolution = deserialize(cells)
    res = int(resolution[0])
    if not (resolution == res).all() or res < FIRST_HILBERT_RESOLUTION:
        raise ValueError("cell_neighbors_batch requires a uniform resolution >= 2")
    hres = res - FIRST_HILBERT_RESOLUTION + 1
    max_row = (1 << hres) - 1

    quintant, orientation = segment_to_quintant(segment, origin)
    x, y, z, flavor = s_to_cell(S, hres, orientation)
    parity = x + y + z
    rows_all = np.arange(N, dtype=np.int64)

    acc = ([], [])

    # --- within-quintant candidates ---
    if lattice:
        if edge_only:
            # 3 parity-valid single-axis moves (+1 on parity 0, -1 on parity 1)
            step = np.where(parity == 0, 1, -1)
            for axis in range(3):
                dx = step if axis == 0 else 0
                dy = step if axis == 1 else 0
                dz = step if axis == 2 else 0
                _emit(acc, rows_all, x + dx, y + dy, z + dz, hres, orientation,
                      origin, segment, res, max_row, exclude_s=S)
        else:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dz in (-1, 0, 1):
                        if dx == 0 and dy == 0 and dz == 0:
                            continue
                        _emit(acc, rows_all, x + dx, y + dy, z + dz, hres,
                              orientation, origin, segment, res, max_row, exclude_s=S)
    else:
        n_deltas = 5 if edge_only else 7
        for d in range(n_deltas):
            # per-delta (N,) gathers instead of one (N, D, 3) gather — same
            # values, far smaller peak allocations (this matters on hosts
            # where first-touch page faults dominate large fresh arrays)
            _emit(
                acc,
                rows_all,
                x + NEIGHBOR_DELTAS[flavor, d, 0],
                y + NEIGHBOR_DELTAS[flavor, d, 1],
                z + NEIGHBOR_DELTAS[flavor, d, 2],
                hres,
                orientation,
                origin,
                segment,
                res,
                max_row,
                exclude_s=S,
            )

    y_odd = (y % 2 != 0).astype(np.int64)
    delta_idx = parity * 2 + y_odd

    def _push_table(mask, base_xyz, table, per_parity_only, t_origin, t_quintant):
        """Apply one of the boundary delta tables to the masked rows."""
        if not mask.any():
            return
        rows = rows_all[mask]
        # hoist the subset gathers out of the variant/delta loops (the old
        # bx[mask][vm] form re-indexed the full array per delta)
        bx, by, bz = (a[mask] for a in base_xyz)
        t_org = t_origin[mask]
        t_seg, t_orient = quintant_to_segment(t_quintant[mask], t_org)
        di = (parity if per_parity_only else delta_idx)[mask]
        for variant in np.unique(di):
            vm = di == variant
            rows_v = rows[vm]
            bxv, byv, bzv = bx[vm], by[vm], bz[vm]
            t_orient_v, t_org_v, t_seg_v = t_orient[vm], t_org[vm], t_seg[vm]
            for dx, dy, dz, is_edge in table[variant]:
                if edge_only and not is_edge:
                    continue
                _emit(
                    acc,
                    rows_v,
                    bxv + dx,
                    byv + dy,
                    bzv + dz,
                    hres,
                    t_orient_v,
                    t_org_v,
                    t_seg_v,
                    res,
                    max_row,
                )

    # --- left edge (z == 0): previous quintant, base [0, y, x] ---
    m = z == 0
    _push_table(m, (z, y, x), LEFT_EDGE_DELTAS, False, origin, (quintant - 1 + 5) % 5)

    # --- right edge (x == 0): next quintant, base [z, y, 0] ---
    m = x == 0
    _push_table(m, (z, y, x * 0), RIGHT_EDGE_DELTAS, False, origin, (quintant + 1) % 5)

    # --- base edge (y == max_row): adjacent face, base [z, max_row, x] ---
    m = y == max_row
    adj = FACE_ADJACENCY[origin, quintant]  # (N, 2)
    _push_table(m, (z, y, x), CROSS_FACE_DELTAS, True, adj[:, 0], adj[:, 1])

    # --- apex [0,0,0]: all other quintants on the same face ---
    m = (x == 0) & (y == 0) & (z == 0)
    if m.any():
        rows = rows_all[m]
        for dq in (1, 2, 3, 4):
            if edge_only and min(dq, 5 - dq) != 1:
                continue
            tq = (quintant[m] + dq) % 5
            t_seg, t_orient = quintant_to_segment(tq, origin[m])
            _emit(acc, rows, x[m], y[m], z[m], hres, t_orient, origin[m], t_seg, res, max_row)

    # --- base-left corner [-max_row, max_row, 0]: 3 faces meet ---
    # (skipped for strict lattice connectivity, lattice_boundary.py:159)
    m = (x == -max_row) & (y == max_row) & (z == 0)
    if lattice and edge_only:
        m = np.zeros_like(m)
    if m.any():
        rows = rows_all[m]
        prev_q = (quintant[m] - 1 + 5) % 5
        padj = FACE_ADJACENCY[origin[m], prev_q]
        ps, po = quintant_to_segment(padj[:, 1], padj[:, 0])
        _emit(acc, rows, x[m], y[m], z[m], hres, po, padj[:, 0], ps, res, max_row)
        cadj = FACE_ADJACENCY[origin[m], quintant[m]]
        nq = (cadj[:, 1] + 1) % 5
        cs, co = quintant_to_segment(nq, cadj[:, 0])
        _emit(acc, rows, x[m], y[m], z[m], hres, co, cadj[:, 0], cs, res, max_row)

    if not acc[0]:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    rows = np.concatenate(acc[0])
    out = np.concatenate(acc[1])
    # Dedup + sort per row (unsigned cell order).
    order = np.lexsort((out, rows))
    rows = rows[order]
    out = out[order]
    keep = np.ones(rows.shape[0], dtype=bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (out[1:] != out[:-1])
    return rows[keep], out[keep]


def _neighbors_res0(cell: int):
    o, s, S, r = deserialize(np.array([cell], dtype=np.uint64))
    adj = FACE_ADJACENCY[int(o[0])][:, 0]
    out = serialize(
        np.unique(adj), np.zeros(len(set(adj.tolist())), dtype=np.int64),
        np.zeros(len(set(adj.tolist())), dtype=np.uint64), 0,
    )
    return sorted(int(v) for v in set(out.tolist()))


def _serialize_res1(origin_id: int, quintant: int) -> int:
    seg, _ = quintant_to_segment(np.array([quintant]), np.array([origin_id]))
    return int(
        serialize(np.array([origin_id]), seg, np.zeros(1, dtype=np.uint64), 1)[0]
    )


def _neighbors_res1(cell: int, edge_only: bool):
    o, seg, S, r = deserialize(np.array([cell], dtype=np.uint64))
    oid = int(o[0])
    q, _ = segment_to_quintant(seg, o)
    q = int(q[0])
    out = set()
    left_q, right_q = (q - 1 + 5) % 5, (q + 1) % 5
    out.add(_serialize_res1(oid, left_q))
    out.add(_serialize_res1(oid, right_q))
    af, aq = FACE_ADJACENCY[oid][q]
    out.add(_serialize_res1(int(af), int(aq)))
    if not edge_only:
        out.add(_serialize_res1(oid, (q - 2 + 5) % 5))
        out.add(_serialize_res1(oid, (q + 2) % 5))
        out.add(_serialize_res1(int(af), (int(aq) - 1 + 5) % 5))
        out.add(_serialize_res1(int(af), (int(aq) + 1) % 5))
        lf, lq = FACE_ADJACENCY[oid][left_q]
        out.add(_serialize_res1(int(lf), int(lq)))
        out.add(_serialize_res1(int(lf), (int(lq) - 1 + 5) % 5))
        rf, rq = FACE_ADJACENCY[oid][right_q]
        out.add(_serialize_res1(int(rf), int(rq)))
        out.add(_serialize_res1(int(rf), (int(rq) + 1) % 5))
    return sorted(out)


def global_cell_neighbors_scalar(cell: int, edge_only: bool = False):
    """Scalar convenience wrapper (parity with global_neighbors.py:78-124)."""
    arr = np.array([cell], dtype=np.uint64)
    res = int(deserialize(arr)[3][0])
    if res == 0:
        return _neighbors_res0(cell)
    if res == 1:
        return _neighbors_res1(cell, edge_only)
    rows, out = cell_neighbors_batch(arr, edge_only)
    return [int(v) for v in out]
