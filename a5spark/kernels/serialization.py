"""Vectorized A5 cell-ID serialization and hierarchy bit operations.

Bit layout (reference /root/reference/a5/core/serialization.py:8-14):
64-bit unsigned IDs; top 6 bits quintant (5*origin + segment_n) for res >= 1
(origin id alone for res 0), then 2*(res-1) Hilbert S bits, then a single
marker 1 bit whose position encodes the resolution. Res 30 uses variable-width
markers. WORLD_CELL = 0 (res -1).

All kernels operate on np.uint64 arrays; the int64 two's-complement view of
these values is the engine's Spark LongType representation.
"""

import numpy as np

from .constants import (
    FIRST_HILBERT_RESOLUTION,
    HILBERT_START_BIT,
    MAX_RESOLUTION,
)
from .origins import ORIGIN_FIRST

_U = np.uint64
_ONE = _U(1)


def get_resolution(index: np.ndarray) -> np.ndarray:
    """Vectorized serialization.py:17-39: resolution from the position of the
    lowest set marker bit. Returns int64 (N,) with -1 for the world cell."""
    index = np.asarray(index, dtype=np.uint64)
    out = np.full(index.shape, -1, dtype=np.int64)
    nonzero = index != 0
    is30 = (
        ((index & _ONE) != 0)
        | ((index & _U(0b111)) == _U(0b100))
        | ((index & _U(0b11111)) == _U(0b10000))
    ) & nonzero
    out[is30] = MAX_RESOLUTION

    rest = nonzero & ~is30
    if rest.any():
        idx = index[rest]
        # Position of lowest set bit
        lsb = np.zeros(idx.shape, dtype=np.int64)
        v = idx.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = (v & ((_ONE << _U(shift)) - _ONE)) == 0
            lsb[mask] += shift
            v = np.where(mask, v >> _U(shift), v)
        # Hilbert-range markers sit at bit 59 - 2*res for res in [2, 29]
        # (marker walks 2 bits per resolution down from bit 57 at res 1...).
        # Res 1 marker: bit 56; res 0 marker: bit 57.
        res = np.where(
            lsb >= 56,
            np.where(lsb == 56, 1, np.where(lsb == 57, 0, -1)),
            (59 - lsb) // 2,
        )
        # bits below FIRST_HILBERT marker move 1/level, handled above; odd
        # marker positions below 56 are invalid but (59-lsb)//2 mirrors the
        # reference's while-loop for the valid even positions.
        out[rest] = res
    return out


def serialize(origin_id, segment, S, resolution: int) -> np.ndarray:
    """Vectorized serialization.py:89-149 for a single resolution.
    origin_id, segment (N,) int64; S (N,) uint64. Returns uint64 cell IDs."""
    origin_id = np.asarray(origin_id, dtype=np.int64)
    segment = np.asarray(segment, dtype=np.int64)
    S = np.asarray(S, dtype=np.uint64)
    if resolution > MAX_RESOLUTION:
        raise ValueError(f"resolution {resolution} too large")
    if resolution == -1:
        return np.zeros(origin_id.shape, dtype=np.uint64)

    segment_n = (segment - ORIGIN_FIRST[origin_id] + 5) % 5

    if resolution < FIRST_HILBERT_RESOLUTION:
        R = resolution + 1
    else:
        hilbert_resolution = 1 + resolution - FIRST_HILBERT_RESOLUTION
        R = 2 * hilbert_resolution + 1

    if resolution == 0:
        index = origin_id.astype(np.uint64) << _U(HILBERT_START_BIT)
        return index | (_ONE << _U(HILBERT_START_BIT - R))

    quintant = (5 * origin_id + segment_n).astype(np.uint64)

    if resolution == MAX_RESOLUTION:
        # Variable-width marker; quintants >= 42 fall back to res 29 with S>>2.
        out = np.empty(origin_id.shape, dtype=np.uint64)
        q = quintant.astype(np.int64)
        m1 = q <= 31
        m3 = (q > 31) & (q <= 39)
        m5 = (q > 39) & (q <= 41)
        mfb = q > 41
        for mask, extra, qoff in ((m1, 1, 0), (m3, 3, 32), (m5, 5, 40)):
            if mask.any():
                shift = _U(HILBERT_START_BIT + extra)
                idx = (quintant[mask] - _U(qoff)) << shift
                hilbert_bits = 2 * (MAX_RESOLUTION - FIRST_HILBERT_RESOLUTION + 1)
                idx |= S[mask] << (shift - _U(hilbert_bits))
                idx |= _ONE << (shift - _U(R))
                out[mask] = idx
        if mfb.any():
            out[mfb] = serialize(
                origin_id[mfb], segment[mfb], S[mfb] >> _U(2), MAX_RESOLUTION - 1
            )
        return out

    index = quintant << _U(HILBERT_START_BIT)
    if resolution >= FIRST_HILBERT_RESOLUTION:
        hilbert_bits = 2 * (1 + resolution - FIRST_HILBERT_RESOLUTION)
        index = index + (S << _U(HILBERT_START_BIT - hilbert_bits))
    return index | (_ONE << _U(HILBERT_START_BIT - R))


def deserialize(index: np.ndarray):
    """Vectorized serialization.py:42-86. Returns (origin_id, segment, S,
    resolution) arrays; world cells give (0, 0, 0, -1)."""
    index = np.asarray(index, dtype=np.uint64)
    resolution = get_resolution(index)
    N = index.shape[0]
    origin_id = np.zeros(N, dtype=np.int64)
    segment = np.zeros(N, dtype=np.int64)
    S = np.zeros(N, dtype=np.uint64)

    live = resolution != -1
    if not live.any():
        return origin_id, segment, S, resolution

    quintant_shift = np.full(N, HILBERT_START_BIT, dtype=np.uint64)
    quintant_offset = np.zeros(N, dtype=np.uint64)
    is30 = resolution == MAX_RESOLUTION
    if is30.any():
        mk1 = is30 & ((index & _ONE) != 0)
        mk3 = is30 & ~mk1 & ((index & _U(0b100)) != 0)
        mk5 = is30 & ~mk1 & ~mk3
        quintant_shift[mk1] = HILBERT_START_BIT + 1
        quintant_shift[mk3] = HILBERT_START_BIT + 3
        quintant_shift[mk5] = HILBERT_START_BIT + 5
        quintant_offset[mk3] = 32
        quintant_offset[mk5] = 40

    top_bits = (index >> quintant_shift) + quintant_offset

    res0 = resolution == 0
    origin_id = np.where(res0, top_bits.astype(np.int64), (top_bits // _U(5)).astype(np.int64))
    seg_n = np.where(res0, 0, (top_bits % _U(5)).astype(np.int64))
    origin_id = np.where(live, origin_id, 0)
    segment = np.where(
        live & ~res0, (seg_n + ORIGIN_FIRST[np.where(live, origin_id, 0)]) % 5, 0
    )

    hilbert = live & (resolution >= FIRST_HILBERT_RESOLUTION)
    if hilbert.any():
        hilbert_bits = (2 * (resolution - FIRST_HILBERT_RESOLUTION + 1)).astype(np.uint64)
        removal_mask = (_ONE << quintant_shift) - _ONE
        S = np.where(
            hilbert,
            (index & removal_mask) >> np.where(hilbert, quintant_shift - hilbert_bits, _U(0)),
            _U(0),
        )
    return origin_id, segment, S, resolution


def _is_max_resolution(index):
    return (
        ((index & _ONE) != 0)
        | ((index & _U(0b111)) == _U(0b100))
        | ((index & _U(0b11111)) == _U(0b10000))
    )


def _normalize_res30(index):
    """Vectorized serialization.py:198-211."""
    out = np.empty(index.shape, dtype=np.uint64)
    mk1 = (index & _ONE) != 0
    mk3 = ~mk1 & ((index & _U(0b100)) != 0)
    mk5 = ~mk1 & ~mk3
    for mask, q_shift, q_offset, marker_bits in (
        (mk1, 59, 0, 1),
        (mk3, 61, 32, 3),
        (mk5, 63, 40, 5),
    ):
        if mask.any():
            q = (index[mask] >> _U(q_shift)) + _U(q_offset)
            s58 = (index[mask] >> _U(marker_bits)) & ((_ONE << _U(58)) - _ONE)
            out[mask] = (q << _U(58)) | ((s58 >> _U(2)) << _U(2)) | (_ONE << _ONE)
    return out


def cell_to_parent(index: np.ndarray, parent_resolution=None) -> np.ndarray:
    """Vectorized serialization.py:214-263 (pure bit ops, no deserialize)."""
    index = np.asarray(index, dtype=np.uint64)
    if parent_resolution is None:
        parent_resolution = get_resolution(index) - 1
    pr = np.broadcast_to(np.asarray(parent_resolution, dtype=np.int64), index.shape)

    out = np.zeros(index.shape, dtype=np.uint64)
    world_target = pr == -1
    active = ~world_target

    c = index.copy()
    is30 = _is_max_resolution(index) & (index != 0)
    keep30 = is30 & (pr == MAX_RESOLUTION)
    norm = is30 & ~keep30
    if norm.any():
        c[norm] = _normalize_res30(index[norm])
    out[keep30] = index[keep30]
    done = world_target | keep30
    is29 = norm & (pr == MAX_RESOLUTION - 1)
    out[is29] = c[is29]
    done |= is29

    hil = active & ~done & (pr >= FIRST_HILBERT_RESOLUTION)
    if hil.any():
        keep_shift = (60 - 2 * pr[hil]).astype(np.uint64)
        out[hil] = ((c[hil] >> keep_shift) << keep_shift) | (
            _ONE << (_U(59) - _U(2) * pr[hil].astype(np.uint64))
        )
    r1 = active & ~done & (pr == 1)
    if r1.any():
        out[r1] = ((c[r1] >> _U(58)) << _U(58)) | (_ONE << _U(56))
    r0 = active & ~done & (pr == 0)
    if r0.any():
        cc = c[r0]
        already = (cc & ((_ONE << _U(57)) - _ONE)) == 0
        res0 = (((cc >> _U(58)) // _U(5)) << _U(58)) | (_ONE << _U(57))
        out[r0] = np.where(already, cc, res0)
    return out


def cell_to_children_s_range(index: np.ndarray, child_resolution: int):
    """For Hilbert-range cells (res >= 2) at a fixed child resolution:
    children are the arithmetic progression [base, base + stride * count).
    Returns (base, count, stride) uint64 arrays — the vectorized analogue of
    serialization.py:151-184 exploiting sibling adjacency
    (serialization.py:324-336)."""
    index = np.asarray(index, dtype=np.uint64)
    res = get_resolution(index)
    if np.any(res < FIRST_HILBERT_RESOLUTION) or child_resolution >= MAX_RESOLUTION:
        raise ValueError("cell_to_children_s_range requires 2 <= res and child < 30")
    if np.any(res > child_resolution):
        raise ValueError("child resolution must be >= cell resolution")
    diff = (child_resolution - res).astype(np.uint64)
    count = _ONE << (_U(2) * diff)
    stride = _U(get_stride_scalar(child_resolution))
    # Clear the parent marker, then set the child marker.
    marker_parent = _ONE << (_U(59) - _U(2) * res.astype(np.uint64))
    marker_child = _ONE << _U(59 - 2 * child_resolution)
    base = (index ^ marker_parent) | marker_child
    return base, count, stride


def get_stride_scalar(resolution: int) -> int:
    """serialization.py:324-336."""
    if resolution < 2:
        return 1 << HILBERT_START_BIT
    if resolution == MAX_RESOLUTION:
        return 2
    return 1 << (2 * (MAX_RESOLUTION - resolution))


def is_first_child(index: np.ndarray, resolution=None) -> np.ndarray:
    """Vectorized serialization.py:284-303."""
    index = np.asarray(index, dtype=np.uint64)
    if resolution is None:
        resolution = get_resolution(index)
    res = np.broadcast_to(np.asarray(resolution, dtype=np.int64), index.shape)
    out = np.zeros(index.shape, dtype=bool)

    low = res < 2
    if low.any():
        top6 = (index[low] >> _U(HILBERT_START_BIT)).astype(np.int64)
        child_count = np.where(res[low] == 0, 12, 5)
        out[low] = top6 % child_count == 0
    r30 = res == MAX_RESOLUTION
    if r30.any():
        idx = index[r30]
        marker_bits = np.where(
            (idx & _ONE) != 0, 1, np.where((idx & _U(0b100)) != 0, 3, 5)
        ).astype(np.uint64)
        out[r30] = (idx & (_U(3) << marker_bits)) == 0
    mid = ~low & ~r30
    if mid.any():
        s_pos = (2 * (MAX_RESOLUTION - res[mid])).astype(np.uint64)
        out[mid] = (index[mid] & (_U(3) << s_pos)) == 0
    return out


def is_child_of(child: np.ndarray, parent: np.ndarray, parent_resolution) -> np.ndarray:
    """Vectorized serialization.py:306-321: prefix equality after shift.
    Valid for parent_resolution in [2, 29] and non-res-30 children."""
    child = np.asarray(child, dtype=np.uint64)
    parent = np.asarray(parent, dtype=np.uint64)
    shift = (60 - 2 * np.asarray(parent_resolution, dtype=np.int64)).astype(np.uint64)
    return (child >> shift) == (parent >> shift)


def cell_range(parent: np.ndarray, parent_resolution) -> np.ndarray:
    """Unsigned [lo, hi] inclusive range of all descendants of `parent` —
    the range-join form of is_child_of. Returns (N, 2) uint64."""
    parent = np.asarray(parent, dtype=np.uint64)
    shift = (60 - 2 * np.asarray(parent_resolution, dtype=np.int64)).astype(np.uint64)
    lo = (parent >> shift) << shift
    hi = lo | ((_ONE << shift) - _ONE)
    return np.stack([lo, hi], axis=-1)


def res0_cells() -> np.ndarray:
    """The 12 res-0 cells (serialization.py:270-281)."""
    ids = np.arange(12, dtype=np.int64)
    return serialize(ids, np.zeros(12, dtype=np.int64), np.zeros(12, dtype=np.uint64), 0)


def to_signed(cells: np.ndarray) -> np.ndarray:
    """uint64 bit pattern -> int64 view (Spark LongType representation)."""
    return np.asarray(cells, dtype=np.uint64).view(np.int64)


def from_signed(cells: np.ndarray) -> np.ndarray:
    """int64 Spark representation -> uint64 bit pattern."""
    return np.asarray(cells, dtype=np.int64).view(np.uint64)


def shifted_key(cells: np.ndarray) -> np.ndarray:
    """Order-preserving signed key: unsigned value XOR 2^63 as int64. Use for
    BETWEEN-range predicates so signed comparisons respect u64 order."""
    return (np.asarray(cells, dtype=np.uint64) ^ _U(1 << 63)).view(np.int64)
