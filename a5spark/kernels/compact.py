"""Vectorized compact / uncompact over cell-ID arrays.

Semantics: reference /root/reference/a5/core/compact.py:25-142 — sorted-dedup,
then repeatedly collapse complete, contiguous sibling groups (4 Hilbert / 5
res-1 / 12 res-0 siblings detected by first-child alignment + stride
adjacency) into parents until fixpoint. Parents keep sort order, so no
re-sorting between passes.
"""

import numpy as np

from .cell_info import get_num_children
from .constants import FIRST_HILBERT_RESOLUTION, MAX_RESOLUTION
from .serialization import (
    cell_to_children_s_range,
    cell_to_parent,
    get_resolution,
    get_stride_scalar,
    is_first_child,
)

_U = np.uint64


def compact(cells: np.ndarray) -> np.ndarray:
    """Compact a set of cells (uint64). Returns sorted (unsigned) unique,
    maximally-collapsed array."""
    cur = np.unique(np.asarray(cells, dtype=np.uint64))
    if cur.size == 0:
        return cur
    changed = True
    while changed:
        changed = False
        n = cur.size
        res = get_resolution(cur)
        isf = is_first_child(cur, res) & (res >= 0)

        # stride per row
        stride = np.zeros(n, dtype=np.uint64)
        for r in np.unique(res):
            if r >= 0:
                stride[res == r] = _U(get_stride_scalar(int(r)))

        exp = np.where(
            res >= FIRST_HILBERT_RESOLUTION, 4, np.where(res == 1, 5, 12)
        )
        match = isf.copy()
        for j in range(1, 12):
            active = match & (j < exp)
            if not active.any():
                break
            idx = np.where(active)[0]
            ok = idx + j < n
            good = np.zeros(idx.shape, dtype=bool)
            gi = idx[ok]
            good[ok] = cur[gi + j] == cur[gi] + _U(j) * stride[gi]
            match[idx[(j < exp[idx])]] &= np.where(
                j < exp[idx], good, True
            )[j < exp[idx]]
        # positions consumed by a matched group
        if not match.any():
            break
        consumed = np.zeros(n, dtype=bool)
        emit_parent = np.zeros(n, dtype=bool)
        starts = np.where(match)[0]
        for i in starts:
            if consumed[i]:
                continue  # cannot happen (groups disjoint), kept for safety
            consumed[i : i + int(exp[i])] = True
            emit_parent[i] = True
        out = []
        keep = ~consumed
        parents = cell_to_parent(cur[emit_parent], res[emit_parent] - 1)
        merged = np.empty(int(keep.sum()) + parents.size, dtype=np.uint64)
        # interleave: walk positions in order
        pos_keep = np.where(keep)[0]
        pos_par = np.where(emit_parent)[0]
        order = np.argsort(np.concatenate([pos_keep, pos_par]), kind="stable")
        merged_vals = np.concatenate([cur[pos_keep], parents])
        merged = merged_vals[order]
        changed = True
        cur = merged
    return cur


def uncompact(cells: np.ndarray, target_resolution: int) -> np.ndarray:
    """Expand each cell to all descendants at target_resolution (uint64)."""
    cells = np.asarray(cells, dtype=np.uint64)
    if cells.size == 0:
        return cells
    res = get_resolution(cells)
    if (res > target_resolution).any():
        raise ValueError("cannot uncompact to a coarser resolution")
    chunks = []
    for r in np.unique(res):
        m = res == r
        if r == target_resolution:
            chunks.append((np.where(m)[0], cells[m][:, None]))
            continue
        if r >= FIRST_HILBERT_RESOLUTION and target_resolution < MAX_RESOLUTION:
            base, count, stride = cell_to_children_s_range(cells[m], target_resolution)
            cnt = int(count[0])
            ch = base[:, None] + np.arange(cnt, dtype=np.uint64)[None, :] * stride
            chunks.append((np.where(m)[0], ch))
        else:
            # low-res / res-30 regimes: expand per row via serialization ranges
            rows = np.where(m)[0]
            outs = []
            for c in cells[m]:
                outs.append(_children_generic(int(c), int(r), target_resolution))
            width = get_num_children(int(r), target_resolution)
            arr = np.array(outs, dtype=np.uint64).reshape(len(rows), width)
            chunks.append((rows, arr))
    # reassemble in input order
    n_out = sum(ch.shape[0] * ch.shape[1] for _, ch in chunks)
    parts = [None] * cells.shape[0]
    for rows, ch in chunks:
        for k, row in enumerate(rows):
            parts[row] = ch[k]
    return np.concatenate(parts)


def _children_generic(cell: int, res: int, target: int) -> list:
    """Children across the non-Hilbert regimes (serialization.py:151-184)."""
    from .origins import ORIGIN_FIRST
    from .serialization import deserialize, serialize

    o, seg, S, r = deserialize(np.array([cell], dtype=np.uint64))
    origins = [int(o[0])]
    segments = [int(seg[0])]
    if res == -1:
        origins = list(range(12))
    if (res == -1 and target > 0) or res == 0:
        segments = list(range(5))
    diff = target - max(res, FIRST_HILBERT_RESOLUTION - 1)
    count = 4 ** max(0, diff)
    shifted = int(S[0]) << (2 * max(0, diff))
    out = []
    for no in origins:
        for ns in segments:
            base = serialize(
                np.full(count, no, dtype=np.int64),
                np.full(count, ns, dtype=np.int64),
                np.arange(shifted, shifted + count, dtype=np.uint64),
                target,
            )
            out.extend(int(v) for v in base)
    return out
