"""The tiling pentagon, lattice basis and quintant rotations as numpy tables.

Re-derives the reference's planar tiling geometry
(/root/reference/a5/core/pentagon.py, /root/reference/a5/core/tiling.py) into
constant arrays plus vectorized cell-geometry kernels:

  PENTAGON_VERTS      (5, 2)   base pentagon (CCW)
  TRIANGLE_VERTS      (3, 2)   one quintant triangle (CCW)
  BASIS / BASIS_INV   (2, 2)   lattice eigenbasis
  QUINTANT_ROT        (5, 2, 2) rotation matrices
  FLAVOR_VERTS        (4, 5, 2) pentagon under the 4 flavor orientations (CCW)
  FLAVOR_CENTERS      (4, 2)

Kernels:
  pentagon_vertices(resolution, quintant, triple, flavor) -> (N, 5, 2)
  pentagon_center(...) -> (N, 2)
  pentagon_contains(verts, point) -> signed margin, reference
  geometry/pentagon.py:115-153 semantics.
"""

import math

import numpy as np

from .constants import DISTANCE_TO_EDGE, PI_OVER_5, PI_OVER_10, TWO_PI_OVER_5


def _signed_area(verts):
    """The reference's shoelace variant (geometry/pentagon.py:37-44):
    sum (x_j - x_i) * (y_j + y_i); >= 0 counts as 'correct' winding."""
    s = 0.0
    n = len(verts)
    for i in range(n):
        j = (i + 1) % n
        s += (verts[j][0] - verts[i][0]) * (verts[j][1] + verts[i][1])
    return s


def _enforce_winding(verts):
    if _signed_area(verts) < 0:
        return list(reversed(verts))
    return list(verts)


def _build_base_geometry():
    # Raw pentagon vertices before scaling/rotation (core/pentagon.py:21-26).
    a = (0.0, 0.0)
    b = (0.0, 1.0)
    c = (0.7885966681787006, 1.6149108024237764)
    d = (1.6171013659387945, 1.054928690397459)
    e = (math.cos(PI_OVER_10), math.sin(PI_OVER_10))

    c_norm = math.hypot(c[0], c[1])
    edge_midpoint_d = 2.0 * c_norm * math.cos(PI_OVER_5)
    basis_rotation = PI_OVER_5 - math.atan2(c[1], c[0])
    scale = 2.0 * DISTANCE_TO_EDGE / edge_midpoint_d

    cr, sr = math.cos(basis_rotation), math.sin(basis_rotation)

    def tf(p):
        x, y = p[0] * scale, p[1] * scale
        return (x * cr - y * sr, x * sr + y * cr)

    a, b, c, d, e = tf(a), tf(b), tf(c), tf(d), tf(e)
    pentagon = _enforce_winding([a, b, c, d, e])

    bisector_angle = math.atan2(c[1], c[0]) - PI_OVER_5
    L = DISTANCE_TO_EDGE / math.cos(PI_OVER_5)
    V = bisector_angle + PI_OVER_5
    W = bisector_angle - PI_OVER_5
    v = (L * math.cos(V), L * math.sin(V))
    w = (L * math.cos(W), L * math.sin(W))
    triangle = _enforce_winding([(0.0, 0.0), v, w])

    basis = np.array([[v[0], w[0]], [v[1], w[1]]])
    det = basis[0, 0] * basis[1, 1] - basis[0, 1] * basis[1, 0]
    basis_inv = (
        np.array([[basis[1, 1], -basis[0, 1]], [-basis[1, 0], basis[0, 0]]]) / det
    )
    return np.array(pentagon), np.array(triangle), basis, basis_inv, np.array(v), np.array(w)


PENTAGON_VERTS, TRIANGLE_VERTS, BASIS, BASIS_INV, VERT_V, VERT_W = _build_base_geometry()

QUINTANT_ROT = np.array(
    [
        [
            [math.cos(TWO_PI_OVER_5 * q), -math.sin(TWO_PI_OVER_5 * q)],
            [math.sin(TWO_PI_OVER_5 * q), math.cos(TWO_PI_OVER_5 * q)],
        ]
        for q in range(5)
    ]
)


def _build_flavor_verts():
    """Pentagon vertex lists for the 4 flavors, each kept CCW by mirroring the
    reference op order: clone -> rotate180 (bit 0) -> reflect_y + reverse
    (bit 1) (tiling.py:52-86, geometry/pentagon.py:60-78)."""
    out = np.zeros((4, 5, 2))
    for flavor in range(4):
        verts = [tuple(p) for p in PENTAGON_VERTS]
        if flavor & 1:
            verts = [(-x, -y) for x, y in verts]
        if flavor & 2:
            verts = [(x, -y) for x, y in verts]
            verts = list(reversed(verts))
        out[flavor] = verts
    return out


FLAVOR_VERTS = _build_flavor_verts()
FLAVOR_CENTERS = FLAVOR_VERTS.mean(axis=1)

# Triangle used for res-1 cells (quintants) and pentagon of res-0 (whole face).
# Explicit mul-add (not BLAS matmul) keeps bitwise identity with the scalar
# reference's 2x2 transform.
FACE_VERTS = np.array(
    _enforce_winding(
        [
            (
                QUINTANT_ROT[q, 0, 0] * VERT_V[0] + QUINTANT_ROT[q, 0, 1] * VERT_V[1],
                QUINTANT_ROT[q, 1, 0] * VERT_V[0] + QUINTANT_ROT[q, 1, 1] * VERT_V[1],
            )
            for q in range(5)
        ]
    )
)


def quintant_triangle(quintant: np.ndarray) -> np.ndarray:
    """(N,) -> (N, 3, 2) the quintant triangle vertices (tiling.py:104-107)."""
    rot = QUINTANT_ROT[quintant]  # (N, 2, 2)
    return np.einsum("nij,vj->nvi", rot, TRIANGLE_VERTS)


def _ref_translation(x, y, flavor):
    """BASIS @ (x + y, -x + (flavor & 1)) (tiling.py:44-49, 81)."""
    ref_i = x + y
    ref_j = -x + (flavor & 1)
    tx = BASIS[0, 0] * ref_i + BASIS[0, 1] * ref_j
    ty = BASIS[1, 0] * ref_i + BASIS[1, 1] * ref_j
    return tx, ty


def pentagon_vertices(resolution, quintant, x, y, flavor):
    """Vectorized tiling.py:52-86. All args (N,) int arrays; resolution is the
    Hilbert resolution. Returns (N, 5, 2) float64, CCW winding."""
    verts = FLAVOR_VERTS[flavor]  # (N, 5, 2)
    tx, ty = _ref_translation(x, y, flavor)
    scale = 1.0 / (2.0 ** np.asarray(resolution, dtype=np.float64))
    vx = (verts[..., 0] + tx[:, None]) * scale[:, None]
    vy = (verts[..., 1] + ty[:, None]) * scale[:, None]
    rot = QUINTANT_ROT[quintant]  # (N, 2, 2)
    out = np.empty(verts.shape)
    out[..., 0] = rot[:, 0, 0][:, None] * vx + rot[:, 0, 1][:, None] * vy
    out[..., 1] = rot[:, 1, 0][:, None] * vx + rot[:, 1, 1][:, None] * vy
    return out


def pentagon_center(resolution, quintant, x, y, flavor):
    """Vectorized tiling.py:89-101 (O(1) center via flavor centers)."""
    c = FLAVOR_CENTERS[flavor]  # (N, 2)
    tx, ty = _ref_translation(x, y, flavor)
    scale = 2.0 ** np.asarray(resolution, dtype=np.float64)
    ox = (c[:, 0] + tx) / scale
    oy = (c[:, 1] + ty) / scale
    rot = QUINTANT_ROT[quintant]
    return np.stack(
        [
            rot[:, 0, 0] * ox + rot[:, 0, 1] * oy,
            rot[:, 1, 0] * ox + rot[:, 1, 1] * oy,
        ],
        axis=-1,
    )


def polygon_contains(verts: np.ndarray, point: np.ndarray) -> np.ndarray:
    """Signed containment margin of point (N, 2) in polygon verts (N, V, 2),
    replicating geometry/pentagon.py:115-153: 1 if inside, else the most
    negative edge cross product normalized by |point - v1|."""
    v1 = verts
    v2 = np.roll(verts, -1, axis=1)
    dx = v1[..., 0] - v2[..., 0]
    dy = v1[..., 1] - v2[..., 1]
    px = point[:, None, 0] - v1[..., 0]
    py = point[:, None, 1] - v1[..., 1]
    cross = dx * py - dy * px  # (N, V)
    p_len = np.sqrt(px * px + py * py)
    with np.errstate(divide="ignore", invalid="ignore"):
        norm = np.where(cross < 0, cross / p_len, 1.0)
    return np.minimum(1.0, norm.min(axis=1))
