"""A5 L-system space-filling curve — the reference's NEW (non-compat) curve.

The curve is a turtle L-system on the triangular lattice (reference
a5/lattice/lsystem/__init__.py, a5/lattice/curve.py:14-20). Its grammar,
compiled to flat tables, is pure data and is generated from the reference by
scripts/gen_lsystem_tables.py into kernels/lsystem_tables.py; the descents
below are this engine's own implementation over those tables:

  forward   s -> triple        digit walk accumulating a turtle position and
                               one flip bit; corner sum -> triple is an exact
                               rational map (no floats survive).
  inverse   triple -> s        exact-path branchless classifier (3 separator
                               dot products + LUT per level).
  fractional point -> s        hull-scan argmax per level (ij_to_s — the
                               new-curve variant). The reference's early-exit
                               scan order is decision-relevant on boundary
                               ties, so the scan here reproduces it
                               faithfully.

Batch entry points take numpy arrays; the descent is O(resolution) per row of
scalar table arithmetic (this curve variant is not on any engine hot path —
the engine's canonical serialization uses the compat curve in curve.py, which
matches cell IDs of the reference's public API).

Reference parity is pinned by tests/test_lsystem.py against the live
reference library over random fractional points, exhaustive s sweeps, and all
six orientations.
"""

import math

import numpy as np

from .lsystem_tables import (
    BSP_EPS,
    CHILD_FLIP,
    CHILD_OFF_A,
    CHILD_OFF_B,
    CHILD_TOKEN,
    CLASS_LUT,
    CLASS_SEP,
    FP_EDGES,
    LEAF_FLAVOR,
    LEAF_SUM,
    LEAF_TRI,
    MOTIF_IDX,
)

_POW2 = [float(1 << k) for k in range(64)]

# orientation -> (axiom motif index, walk curve backward, B-frame shift)
ORIENTATIONS = {
    "uv": (MOTIF_IDX["A"], False, False),
    "vu": (MOTIF_IDX["A"], True, False),
    "uw": (MOTIF_IDX["C"], False, False),
    "wu": (MOTIF_IDX["C"], True, False),
    "vw": (MOTIF_IDX["B"], True, True),
    "wv": (MOTIF_IDX["B"], False, True),
}


# ---- exact corner-sum <-> triple rational maps (no floating point) ----

def ab_to_triple(sum_a: float, sum_b: float):
    """Corner sum (a, b) -> integer triple (x, y, z). Exact: the composed
    turtle/triple bases cancel their sqrt3 factors, leaving
    y - z = (2a + b - 12)/12 and 2x - y - z = (b + 4)/4 with the parity
    x + y + z in {0, 1} pinning the rest."""
    sa = int(round(sum_a))
    sb = int(round(sum_b))
    if (2 * sa + sb) % 12 != 0 or sb % 4 != 0:
        raise ValueError(f"off-lattice corner sum ({sum_a}, {sum_b})")
    yz = (2 * sa + sb - 12) // 12
    e = (sb + 4) // 4
    for parity in (0, 1):
        if (e + parity) % 3 != 0:
            continue
        x = (e + parity) // 3
        r = parity - x
        if (r + yz) % 2 != 0:
            continue
        return x, (r + yz) // 2, (r - yz) // 2
    raise ValueError(f"no integer triple for corner sum ({sum_a}, {sum_b})")


def triple_to_ab(x: int, y: int, z: int):
    b = 4 * (2 * x - y - z) - 4
    a = (12 * (y - z) + 12 - b) // 2
    return float(a), float(b)


# ---- descents ----

def _leaf_walk(motif: int, flip: int, pos_a: float, pos_b: float, d0: int):
    base = motif * 2 + flip
    return (
        3.0 * pos_a + LEAF_SUM[base * 8 + d0 * 2],
        3.0 * pos_b + LEAF_SUM[base * 8 + d0 * 2 + 1],
        LEAF_FLAVOR[base * 4 + d0],
    )


def _forward(s: int, R: int, axiom: int):
    """s -> (corner_sum_a, corner_sum_b, flavor) by digit walk."""
    motif, flip = axiom, 0
    pos_a = pos_b = 0.0
    for level in range(R, 1, -1):
        d = (s >> ((level - 1) * 2)) & 3
        ci = motif * 4 + d
        scale = -_POW2[level - 2] if flip else _POW2[level - 2]
        pos_a += CHILD_OFF_A[ci] * scale
        pos_b += CHILD_OFF_B[ci] * scale
        flip ^= CHILD_FLIP[ci]
        motif = CHILD_TOKEN[ci]
    d0 = (s & 3) if R >= 1 else 0
    return _leaf_walk(motif, flip, pos_a, pos_b, d0)


def _hull_score(motif: int, flip: int, lvl: int, pos_a, pos_b, ta, tb, best):
    """Signed clearance of the target inside the (motif, flip) hull at level
    lvl, with the reference's early-exit: once the running minimum is both
    non-positive and <= `best` the partial minimum is returned — decision-
    equivalent for the argmax (a rejected child stays rejected) and exact
    when the scan completes."""
    scale = _POW2[lvl - 1]
    edges = FP_EDGES[motif * 2 + flip]
    ra = ta - 3.0 * pos_a
    rb = tb - 3.0 * pos_b
    lo = math.inf
    for e in range(0, len(edges), 4):
        dta = ra - edges[e] * scale
        dtb = rb - edges[e + 1] * scale
        cross = edges[e + 2] * dtb - edges[e + 3] * dta
        if cross < lo:
            lo = cross
            if lo <= 0.0 and lo <= best:
                return lo
    return lo


def _inverse(ta: float, tb: float, R: int, axiom: int, exact: bool):
    """target -> (s, flavor). exact=True: ta/tb is a real cell's corner sum
    (branchless classifier per level); exact=False: fractional point
    (hull-scan argmax — the reference's scan order, which settles boundary
    ties)."""
    motif, flip = axiom, 0
    pos_a = pos_b = 0.0
    s_val = 0
    for level in range(R, 1, -1):
        scale = _POW2[level - 2]
        sign = -scale if flip else scale
        if exact:
            st = motif * 2 + flip
            ra = ta - 3.0 * pos_a
            rb = tb - 3.0 * pos_b
            b = st * 9
            thr = -BSP_EPS * scale
            pat = (
                (1 if CLASS_SEP[b] * ra + CLASS_SEP[b + 1] * rb + CLASS_SEP[b + 2] * scale >= thr else 0)
                | ((1 if CLASS_SEP[b + 3] * ra + CLASS_SEP[b + 4] * rb + CLASS_SEP[b + 5] * scale >= thr else 0) << 1)
                | ((1 if CLASS_SEP[b + 6] * ra + CLASS_SEP[b + 7] * rb + CLASS_SEP[b + 8] * scale >= thr else 0) << 2)
            )
            d_pick = CLASS_LUT[st * 8 + pat]
        else:
            d_pick = 0
            best = -math.inf
            for d in range(4):
                ci = motif * 4 + d
                score = _hull_score(
                    CHILD_TOKEN[ci],
                    flip ^ CHILD_FLIP[ci],
                    level - 1,
                    pos_a + CHILD_OFF_A[ci] * sign,
                    pos_b + CHILD_OFF_B[ci] * sign,
                    ta,
                    tb,
                    best,
                )
                if score > best:
                    best = score
                    d_pick = d
                    if score > 0.0:
                        break
        ci = motif * 4 + d_pick
        pos_a += CHILD_OFF_A[ci] * sign
        pos_b += CHILD_OFF_B[ci] * sign
        flip ^= CHILD_FLIP[ci]
        motif = CHILD_TOKEN[ci]
        s_val += d_pick << (2 * (level - 1))

    base = motif * 2 + flip
    ra = ta - 3.0 * pos_a
    rb = tb - 3.0 * pos_b
    d0 = 0
    if exact:
        for d in range(4):
            if LEAF_SUM[base * 8 + d * 2] == ra and LEAF_SUM[base * 8 + d * 2 + 1] == rb:
                d0 = d
                break
        else:
            raise ValueError(f"no leaf match for corner sum ({ta}, {tb})")
    else:
        best = -math.inf
        for d in range(4):
            lo = math.inf
            for e in range(3):
                o = base * 48 + d * 12 + e * 4
                dta = ra - LEAF_TRI[o]
                dtb = rb - LEAF_TRI[o + 1]
                cross = LEAF_TRI[o + 2] * dtb - LEAF_TRI[o + 3] * dta
                if cross < lo:
                    lo = cross
            if lo > best:
                best = lo
                d0 = d
                if lo > 0.0:
                    break
    return s_val + d0, LEAF_FLAVOR[base * 4 + d0]


# ---- public scalar entry points ----

def s_to_triple(s: int, resolution: int, orientation: str = "uv"):
    """Curve position -> triple (reference lsystem s_to_cell/s_to_triple)."""
    axiom, reverse, is_b = ORIENTATIONS[orientation]
    s_ax = ((1 << (2 * resolution)) - 1 - s) if reverse else s
    a, b, _fl = _forward(s_ax, resolution, axiom)
    x, y, z = ab_to_triple(a, b)
    if is_b:
        p = 1 << resolution
        return x - p, y + p, z
    return x, y, z


def triple_to_s_lattice(x: int, y: int, z: int, resolution: int, orientation: str = "uv") -> int:
    """Triple -> curve position (exact inverse of s_to_triple)."""
    axiom, reverse, is_b = ORIENTATIONS[orientation]
    # B-frame orientations fold their triple shift into the corner-sum-frame
    # tau offset below — the given triple feeds triple_to_ab unshifted
    a, b = triple_to_ab(x, y, z)
    tau = 12.0 * _POW2[resolution] if is_b else 0.0
    s_ax = _inverse(a - tau, b + tau, resolution, axiom, True)[0]
    return ((1 << (2 * resolution)) - 1 - s_ax) if reverse else s_ax


def sum_point_to_s(ta: float, tb: float, resolution: int, orientation: str = "uv") -> int:
    """Fractional corner-sum-frame point -> s of the containing cell."""
    axiom, reverse, is_b = ORIENTATIONS[orientation]
    tau = 12.0 * _POW2[resolution] if is_b else 0.0
    s_ax = _inverse(ta - tau, tb + tau, resolution, axiom, False)[0]
    return ((1 << (2 * resolution)) - 1 - s_ax) if reverse else s_ax


def ij_to_s_lsystem(i, j, resolution: int, orientation: str = "uv") -> np.ndarray:
    """Fractional IJ points -> curve positions of their containing cells —
    the NEW-curve ij_to_s (reference a5/lattice/curve.py:14-20). The IJ plane
    maps into the corner-sum frame by the exact affine target =
    (12*(i+j), -12*j). Batch over numpy arrays; returns uint64."""
    i = np.asarray(i, dtype=np.float64)
    j = np.asarray(j, dtype=np.float64)
    out = np.empty(i.shape[0], dtype=np.uint64)
    for r in range(i.shape[0]):
        ii, jj = float(i[r]), float(j[r])
        out[r] = sum_point_to_s(12.0 * (ii + jj), -12.0 * jj, resolution, orientation)
    return out
