"""Pure-numpy S2 cell-ID encoder (cross-index side-car).

Implements the public S2 geometry cell-id scheme (s2geometry.io — quadratic
ST projection + per-face Hilbert curve), vectorized over point batches:
lat/lng -> XYZ -> face/UV -> ST -> IJ(30) -> Hilbert position -> 64-bit id.

Used for cross-index joins alongside A5 cells. Property-tested (hierarchy
consistency, locality, valid structure); when the `s2sphere` library is
available the tests also cross-check ids bit-for-bit (import-try — the lib is
not present in this environment).
"""

import numpy as np

MAX_LEVEL = 30

# Hilbert sub-cell orderings (public S2 constants).
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # orientation 0
        [0, 3, 1, 2],  # swap
        [2, 3, 1, 0],  # invert
        [2, 1, 3, 0],  # swap | invert
    ],
    dtype=np.int64,
)
_POS_TO_ORIENTATION = np.array([1, 0, 0, 3], dtype=np.int64)


def lonlat_to_xyz(lon_deg, lat_deg):
    lon = np.radians(lon_deg)
    lat = np.radians(lat_deg)
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lon), cl * np.sin(lon), np.sin(lat)], axis=-1)


def xyz_to_face_uv(p):
    ax = np.abs(p)
    face = np.argmax(ax, axis=-1)
    # negative dominant component -> face + 3
    dom = np.take_along_axis(p, face[:, None], axis=-1)[:, 0]
    face = np.where(dom < 0, face + 3, face)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    u = np.empty(x.shape)
    v = np.empty(x.shape)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def uv_to_st(u):
    """Quadratic projection (S2's default)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_ij(s):
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def lonlat_to_cell(lon_deg, lat_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """Encode to S2 cell ids at `level` (uint64)."""
    p = lonlat_to_xyz(np.asarray(lon_deg, np.float64), np.asarray(lat_deg, np.float64))
    face, u, v = xyz_to_face_uv(p)
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))

    n = i.shape[0]
    pos = np.zeros(n, dtype=np.uint64)
    orientation = (face & 1).astype(np.int64)
    for k in range(MAX_LEVEL - 1, -1, -1):
        bit_i = (i >> k) & 1
        bit_j = (j >> k) & 1
        ij = 2 * bit_i + bit_j
        p4 = _IJ_TO_POS[orientation, ij]
        pos = (pos << np.uint64(2)) | p4.astype(np.uint64)
        orientation = orientation ^ _POS_TO_ORIENTATION[p4]

    cid = (
        (face.astype(np.uint64) << np.uint64(61))
        | (pos << np.uint64(1))
        | np.uint64(1)
    )
    if level < MAX_LEVEL:
        cid = cell_parent(cid, level)
    return cid


def cell_level(cid: np.ndarray) -> np.ndarray:
    """Level from the lsb position."""
    cid = np.asarray(cid, dtype=np.uint64)
    low = cid & (~cid + np.uint64(1))
    lsb_pos = np.zeros(cid.shape, dtype=np.int64)
    v = low.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (v >> np.uint64(shift)) != 0
        lsb_pos[mask] += shift
        v = np.where(mask, v >> np.uint64(shift), v)
    return MAX_LEVEL - lsb_pos // 2


def cell_parent(cid: np.ndarray, level: int) -> np.ndarray:
    """Ancestor at `level`: clear bits below the level's lsb, set the lsb."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cid & ~(lsb - np.uint64(1))) | lsb


def cell_token(cid: np.ndarray):
    """Canonical S2 token: hex with trailing zeros stripped."""
    out = []
    for v in np.asarray(cid, dtype=np.uint64):
        h = format(int(v), "016x").rstrip("0")
        out.append(h if h else "X")
    return out
