"""Vectorized A5 space-filling curve (the canonical "compat" construction).

The engine reproduces the reference's canonical curve — the original
shift-digits construction (reference /root/reference/a5/lattice/compat.py,
exported as the plain `ij_to_s` / `s_to_cell` names by
/root/reference/a5/lattice/__init__.py:5-24) — as level-wise numpy digit
transducers over row batches:

  ij_to_s(i, j, resolution, orientation)        fractional point -> curve pos
  s_to_cell(s, resolution, orientation)         curve pos -> (triple, flavor)
  triple_to_s(x, y, z, resolution, orientation) inverse

The two-motif W/Z L-system the construction rides on is represented by its
compiled descent tables (motifs W=0 Z=1 w=2 z=3; per (motif, digit) child
offset/flip/token, per (motif, flip) leaf corner sums / flavors, and the
3-separator child classifier). The tables are small constants fully determined
by the grammar {W: W+++Z---WZ, Z: Z+++W---ZW; draws W->E, Z->+e-}
(compat.py:37) and were derived by compiling that grammar with the table
construction of reference lattice/lsystem/tables.py; they are pinned by the
curve fixtures in tests.

All arithmetic is integer or exact small-float (lattice coordinates), so
results are bit-identical to the reference.
"""

import numpy as np

from .origins import ORIENT_FLIP_IJ, ORIENT_INVERT_J, ORIENT_REVERSE

# ---------------------------------------------------------------------------
# Compiled ORIGINAL (W/Z) grammar tables. Entry ci = motif * 4 + digit.
# ---------------------------------------------------------------------------

CHILD_TOKEN = np.array([0, 1, 0, 1, 1, 0, 1, 0, 3, 2, 3, 2, 2, 3, 2, 3], dtype=np.int64)
CHILD_FLIP = np.array([0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0], dtype=np.int64)
CHILD_OFF_A = np.array(
    [0, 8, 8, 16, 0, 0, -8, -8, 0, 0, 8, 8, 0, 8, 8, 0], dtype=np.float64
)
CHILD_OFF_B = np.array(
    [0, 0, -8, -8, 0, 8, 8, 16, 0, 8, 8, 0, 0, 0, 8, 8], dtype=np.float64
)
# Leaf host-cell corner sums per (base = motif * 2 + flip, digit): (a, b) pairs.
LEAF_SUM = np.array(
    [
        8, -4, 16, -8, 20, -16, 20, -4,
        -8, 4, -16, 8, -20, 16, -20, 4,
        -4, 8, -8, 16, -16, 20, -4, 20,
        4, -8, 8, -16, 16, -20, 4, -20,
        4, 4, 4, 16, 8, 8, 16, 4,
        -4, -4, -4, -16, -8, -8, -16, -4,
        4, 4, 16, 4, 8, 8, 4, 16,
        -4, -4, -16, -4, -8, -8, -4, -16,
    ],
    dtype=np.float64,
).reshape(8, 4, 2)
LEAF_FLAVOR = np.array(
    [
        2, 3, 2, 2, 3, 2, 3, 3,
        2, 3, 2, 2, 3, 2, 3, 3,
        3, 3, 2, 3, 2, 2, 3, 2,
        3, 3, 2, 3, 2, 2, 3, 2,
    ],
    dtype=np.int64,
).reshape(8, 4)
# Branchless child classifier per state k = motif * 2 + flip: 3 separating
# lines (nx, ny, c) + 8-entry LUT on the 3-bit sign pattern.
CLASS_SEP = np.array(
    [
        24, 0, -576, 24, 24, -576, 0, -24, -576,
        -24, 0, -576, -24, -24, -576, 0, 24, -576,
        0, 24, -576, 24, 24, -576, -24, 0, -576,
        0, -24, -576, -24, -24, -576, 24, 0, -576,
        24, 24, -576, 0, -24, 576, 24, 0, -576,
        -24, -24, -576, 0, 24, 576, -24, 0, -576,
        24, 24, -576, -24, 0, 576, 0, 24, -576,
        -24, -24, -576, 24, 0, 576, 0, -24, -576,
    ],
    dtype=np.float64,
).reshape(8, 3, 3)
CLASS_LUT = np.array(
    [
        0, 1, 0, 3, 0, 2, 0, 3,
        0, 1, 0, 3, 0, 2, 0, 3,
        0, 1, 0, 3, 0, 2, 0, 3,
        0, 1, 0, 3, 0, 2, 0, 3,
        0, 1, 0, 2, 0, 1, 0, 3,
        0, 1, 0, 2, 0, 1, 0, 3,
        0, 1, 0, 2, 0, 1, 0, 3,
        0, 1, 0, 2, 0, 1, 0, 3,
    ],
    dtype=np.int64,
).reshape(8, 8)

BSP_EPS = 1e-6

# shift-digit rearrangement patterns (compat.py:48-51).
_PATTERN = np.array([0, 1, 3, 4, 5, 6, 7, 2], dtype=np.int64)
_PATTERN_FLIPPED = np.array([0, 1, 2, 7, 3, 4, 5, 6], dtype=np.int64)


def _reverse_pattern(p):
    out = np.empty_like(p)
    out[p] = np.arange(len(p))
    return out


_PATTERN_REV = _reverse_pattern(_PATTERN)
_PATTERN_FLIPPED_REV = _reverse_pattern(_PATTERN_FLIPPED)

# Child anchor offsets in IJ units, [flip_index][digit] -> (di, dj)
# (compat.py:251-256); flip_index = (flips0<0) + 2*(flips1<0).
_CHILD_OFFSET_IJ = np.array(
    [
        [(0, 0), (1, 0), (0, 1), (1, 1)],
        [(0, 0), (1, -1), (0, -1), (1, -2)],
        [(0, 0), (-1, 1), (0, 1), (-1, 2)],
        [(0, 0), (-1, 0), (0, -1), (-1, -1)],
    ],
    dtype=np.float64,
)


# ---------------------------------------------------------------------------
# shift-digit recode, vectorized level-by-level over a digit matrix
# digits: (N, R) int64, digits[:, i] = quaternary digit at level i (LSB first)
# ---------------------------------------------------------------------------

def _shift_level(digits, i, flips0, flips1, invert_j, pattern):
    """Vectorized compat.py:54-77 at digit position i (mutates digits)."""
    if i <= 0:
        return
    parent_k = digits[:, i]
    child_k = digits[:, i - 1]
    F = flips0 + flips1
    # invert_j != (F == 0)
    cond = np.logical_xor(invert_j, F == 0)
    needs_shift = np.where(
        cond, (parent_k == 1) | (parent_k == 2), parent_k < 2
    )
    first = np.where(cond, parent_k == 1, parent_k == 0)
    src = np.where(first, child_k, child_k + 4)
    dst = pattern[src]
    new_child = dst % 4
    new_parent = (parent_k + 4 + dst // 4 - src // 4) % 4
    digits[:, i - 1] = np.where(needs_shift, new_child, child_k)
    digits[:, i] = np.where(needs_shift, new_parent, parent_k)


def _apply_digit_flips(flips0, flips1, d):
    """flips update per digit (compat.py:82-87): digit 1 negates flips1,
    digit 3 negates flips0. Returns new (flips0, flips1)."""
    return np.where(d == 3, -flips0, flips0), np.where(d == 1, -flips1, flips1)


def _forward_shift(digits, invert_j, flip_ij):
    """Vectorized compat.py:89-101; returns final (flips0, flips1)."""
    N, R = digits.shape
    pattern = _PATTERN_FLIPPED if flip_ij else _PATTERN
    flips0 = np.ones(N, dtype=np.int64)
    flips1 = np.ones(N, dtype=np.int64)
    for i in range(R - 1, -1, -1):
        _shift_level(digits, i, flips0, flips1, invert_j, pattern)
        flips0, flips1 = _apply_digit_flips(flips0, flips1, digits[:, i])
    return flips0, flips1


def _inverse_shift(digits, invert_j, flip_ij):
    """Vectorized compat.py:104-117 (mutates digits)."""
    N, R = digits.shape
    pattern = _PATTERN_FLIPPED_REV if flip_ij else _PATTERN_REV
    flips0 = np.ones(N, dtype=np.int64)
    flips1 = np.ones(N, dtype=np.int64)
    for i in range(R):
        flips0, flips1 = _apply_digit_flips(flips0, flips1, digits[:, i])
    for i in range(R):
        flips0, flips1 = _apply_digit_flips(flips0, flips1, digits[:, i])
        _shift_level(digits, i, flips0, flips1, invert_j, pattern)


def _digits_of(s, resolution):
    """(N,) uint64 -> (N, resolution) int64 quaternary digits, LSB first."""
    s = np.asarray(s, dtype=np.uint64)
    out = np.empty((s.shape[0], resolution), dtype=np.int64)
    for i in range(resolution):
        out[:, i] = ((s >> np.uint64(2 * i)) & np.uint64(3)).astype(np.int64)
    return out


def _pack_digits(digits):
    """(N, R) -> (N,) uint64."""
    N, R = digits.shape
    s = np.zeros(N, dtype=np.uint64)
    for i in range(R - 1, -1, -1):
        s = (s << np.uint64(2)) | digits[:, i].astype(np.uint64)
    return s


# ---------------------------------------------------------------------------
# W/Z L-system forward descent (reference lsystem/__init__.py:91-112)
# ---------------------------------------------------------------------------

def _leaf_cell(digits):
    """Descend the geometric digits (MSB->LSB) through the W/Z tables.
    digits: (N, R). Returns (a, b, flavor) of the leaf host cell."""
    N, R = digits.shape
    motif = np.zeros(N, dtype=np.int64)  # axiom W
    flip = np.zeros(N, dtype=np.int64)
    pos_a = np.zeros(N)
    pos_b = np.zeros(N)
    for level in range(R, 1, -1):
        d = digits[:, level - 1]
        ci = motif * 4 + d
        scale = np.where(flip == 1, -(2.0 ** (level - 2)), 2.0 ** (level - 2))
        pos_a = pos_a + CHILD_OFF_A[ci] * scale
        pos_b = pos_b + CHILD_OFF_B[ci] * scale
        flip = flip ^ CHILD_FLIP[ci]
        motif = CHILD_TOKEN[ci]
    d0 = digits[:, 0] if R >= 1 else np.zeros(N, dtype=np.int64)
    base = motif * 2 + flip
    a = 3.0 * pos_a + LEAF_SUM[base, d0, 0]
    b = 3.0 * pos_b + LEAF_SUM[base, d0, 1]
    return a, b, LEAF_FLAVOR[base, d0]


def _target_to_s_exact(ta, tb, resolution):
    """Inverse descent for exact corner-sum targets
    (reference lsystem/__init__.py:152-224, exact=True path)."""
    N = ta.shape[0]
    motif = np.zeros(N, dtype=np.int64)
    flip = np.zeros(N, dtype=np.int64)
    pos_a = np.zeros(N)
    pos_b = np.zeros(N)
    s_val = np.zeros(N, dtype=np.uint64)
    for level in range(resolution, 1, -1):
        scale = 2.0 ** (level - 2)
        state = motif * 2 + flip
        rel_a = ta - 3.0 * pos_a
        rel_b = tb - 3.0 * pos_b
        sep = CLASS_SEP[state]  # (N, 3, 3)
        thr = -BSP_EPS * scale
        val = sep[:, :, 0] * rel_a[:, None] + sep[:, :, 1] * rel_b[:, None] + sep[:, :, 2] * scale
        bits = (val >= thr).astype(np.int64)
        pat = bits[:, 0] | (bits[:, 1] << 1) | (bits[:, 2] << 2)
        d = CLASS_LUT[state, pat]
        ci = motif * 4 + d
        sign = np.where(flip == 1, -scale, scale)
        pos_a = pos_a + CHILD_OFF_A[ci] * sign
        pos_b = pos_b + CHILD_OFF_B[ci] * sign
        flip = flip ^ CHILD_FLIP[ci]
        motif = CHILD_TOKEN[ci]
        s_val += d.astype(np.uint64) << np.uint64(2 * (level - 1))
    base = motif * 2 + flip
    rel_a = ta - 3.0 * pos_a
    rel_b = tb - 3.0 * pos_b
    match = (LEAF_SUM[base, :, 0] == rel_a[:, None]) & (
        LEAF_SUM[base, :, 1] == rel_b[:, None]
    )
    if not match.any(axis=1).all():
        bad = np.where(~match.any(axis=1))[0]
        raise ValueError(f"no leaf match for corner sums at rows {bad[:5]}")
    d0 = match.argmax(axis=1)
    return s_val + d0.astype(np.uint64)


# ---------------------------------------------------------------------------
# exact (a,b) corner sum <-> triple (lsystem/__init__.py:62-84)
# ---------------------------------------------------------------------------

def ab_to_triple(sum_a, sum_b):
    """(N,) float corner sums -> integer triple (x, y, z)."""
    sa = np.rint(sum_a).astype(np.int64)
    sb = np.rint(sum_b).astype(np.int64)
    yz = (2 * sa + sb - 12) // 12
    e = (sb + 4) // 4
    x = np.zeros_like(sa)
    y = np.zeros_like(sa)
    z = np.zeros_like(sa)
    found = np.zeros(sa.shape, dtype=bool)
    for parity in (0, 1):
        ok = ((e + parity) % 3 == 0) & ~found
        xp = (e + parity) // 3
        r = parity - xp
        ok &= (r + yz) % 2 == 0
        x = np.where(ok, xp, x)
        y = np.where(ok, (r + yz) // 2, y)
        z = np.where(ok, (r - yz) // 2, z)
        found |= ok
    if not found.all():
        raise ValueError("ab_to_triple: off-lattice corner sum")
    return x, y, z


def triple_to_ab(x, y, z):
    b = 4 * (2 * x - y - z) - 4
    a = (12 * (y - z) + 12 - b) // 2
    return a.astype(np.float64), b.astype(np.float64)


# ---------------------------------------------------------------------------
# public curve API (matching reference compat.py:148-292 semantics)
# ---------------------------------------------------------------------------

def _compat_flavor(flips0, flips1, q):
    """Closed-form pentagon flavor (compat.py:148-162)."""
    rotate = (flips1 == -1).astype(np.int64)
    reflect = np.where(
        flips0 + flips1 == 0,
        (q == 0) | (q == 3),
        (q == 2) | (q == 3),
    ).astype(np.int64)
    return rotate | (reflect << 1)


def s_to_cell(s, resolution, orientation):
    """Curve position s (N,) uint64 -> (x, y, z, flavor) at `resolution`
    under per-row orientation codes (N,). Vectorized compat.py:165-194."""
    s = np.asarray(s, dtype=np.uint64)
    orientation = np.asarray(orientation)
    reverse = ORIENT_REVERSE[orientation] == 1
    invert_j = ORIENT_INVERT_J[orientation] == 1
    flip_ij = ORIENT_FLIP_IJ[orientation] == 1

    n_max = np.uint64((1 << (2 * resolution)) - 1)
    v = np.where(reverse, n_max - s, s)

    # invert_j / flip_ij enter the digit recode as booleans; process the four
    # (invert_j, flip_ij) groups separately since the recode branches on them.
    x = np.zeros(s.shape, dtype=np.int64)
    y = np.zeros(s.shape, dtype=np.int64)
    z = np.zeros(s.shape, dtype=np.int64)
    flavor = np.zeros(s.shape, dtype=np.int64)
    for ij_flag in (False, True):
        for fl_flag in (False, True):
            m = (invert_j == ij_flag) & (flip_ij == fl_flag)
            if not m.any():
                continue
            digits = _digits_of(v[m], resolution)
            f0, f1 = _forward_shift(digits, ij_flag, fl_flag)
            a, b, _ = _leaf_cell(digits)
            xx, yy, zz = ab_to_triple(a, b)
            if fl_flag:
                xx, zz = zz, xx
            if ij_flag:
                n1 = (1 << resolution) - 1
                xx, yy = yy - n1, xx + n1
            q = digits[:, 0] if resolution >= 1 else np.zeros(m.sum(), dtype=np.int64)
            ff0 = -f0 if ij_flag else f0
            fla = _compat_flavor(ff0, f1, q)
            x[m], y[m], z[m], flavor[m] = xx, yy, zz, fla
    return x, y, z, flavor


def triple_to_s(x, y, z, resolution, orientation):
    """Triple -> curve position (vectorized compat.py:197-215). Assumes valid
    parity (x + y + z in {0, 1})."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.asarray(z, dtype=np.int64)
    orientation = np.asarray(orientation)
    reverse = ORIENT_REVERSE[orientation] == 1
    invert_j = ORIENT_INVERT_J[orientation] == 1
    flip_ij = ORIENT_FLIP_IJ[orientation] == 1

    out = np.zeros(x.shape, dtype=np.uint64)
    n_max = np.uint64((1 << (2 * resolution)) - 1)
    for ij_flag in (False, True):
        for fl_flag in (False, True):
            m = (invert_j == ij_flag) & (flip_ij == fl_flag)
            if not m.any():
                continue
            rx, ry, rz = x[m], y[m], z[m]
            if ij_flag:
                n1 = (1 << resolution) - 1
                rx, ry = ry - n1, rx + n1
            if fl_flag:
                rx, rz = rz, rx
            ta, tb = triple_to_ab(rx, ry, rz)
            s_geo = _target_to_s_exact(ta, tb, resolution)
            digits = _digits_of(s_geo, resolution)
            _inverse_shift(digits, ij_flag, fl_flag)
            out[m] = _pack_digits(digits)
    return np.where(reverse, n_max - out, out)


def _ij_to_quaternary(u, v, flips0, flips1):
    """Vectorized sign tests (compat.py:225-245)."""
    a = np.where(flips0 == -1, -(u + v), u + v)
    b = np.where(flips1 == -1, -u, u)
    c = np.where(flips0 == -1, -v, v)
    one_flip = flips0 + flips1 == 0
    # one-flip branch
    d_one = np.where(c < 1.0, 0, np.where(b > 1.0, 3, np.where(a > 1.0, 2, 1)))
    # no/both-flips branch
    d_two = np.where(a < 1.0, 0, np.where(b > 1.0, 3, np.where(c > 1.0, 2, 1)))
    return np.where(one_flip, d_one, d_two)


def ij_to_s(i, j, resolution, orientation):
    """Fractional IJ point (N,) -> curve position of the containing cell.
    Vectorized compat.py:259-292."""
    i = np.asarray(i, dtype=np.float64).copy()
    j = np.asarray(j, dtype=np.float64).copy()
    orientation = np.asarray(orientation)
    reverse = ORIENT_REVERSE[orientation] == 1
    invert_j = ORIENT_INVERT_J[orientation] == 1
    flip_ij = ORIENT_FLIP_IJ[orientation] == 1

    n_max = np.uint64((1 << (2 * resolution)) - 1)
    out = np.zeros(i.shape, dtype=np.uint64)
    for ij_flag in (False, True):
        for fl_flag in (False, True):
            m = (invert_j == ij_flag) & (flip_ij == fl_flag)
            if not m.any():
                continue
            u = i[m]
            v = j[m]
            if fl_flag:
                u, v = v, u
            if ij_flag:
                v = float(2 ** resolution) - (u + v)
            N = u.shape[0]
            digits = np.zeros((N, resolution), dtype=np.int64)
            flips0 = np.ones(N, dtype=np.int64)
            flips1 = np.ones(N, dtype=np.int64)
            pivot_i = np.zeros(N)
            pivot_j = np.zeros(N)
            for lvl in range(resolution - 1, -1, -1):
                scale = 1.0 / (1 << lvl)
                d = _ij_to_quaternary(
                    (u - pivot_i) * scale, (v - pivot_j) * scale, flips0, flips1
                )
                digits[:, lvl] = d
                fi = (flips0 == -1).astype(np.int64) + 2 * (flips1 == -1).astype(np.int64)
                off = _CHILD_OFFSET_IJ[fi, d]
                up = float(1 << lvl)
                pivot_i = pivot_i + off[:, 0] * up
                pivot_j = pivot_j + off[:, 1] * up
                flips1 = np.where(d == 1, -flips1, flips1)
                flips0 = np.where(d == 3, -flips0, flips0)
            _inverse_shift(digits, ij_flag, fl_flag)
            out[m] = _pack_digits(digits)
    return np.where(reverse, n_max - out, out)
