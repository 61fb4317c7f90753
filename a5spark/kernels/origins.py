"""The 12 dodecahedron-face origins as flat numpy tables.

Re-derivation of the reference's origin construction
(/root/reference/a5/core/origin.py:48-99 and
/root/reference/a5/core/dodecahedron_quaternions.py) into arrays indexed by the
final (Hilbert-ordered) origin id:

  ORIGIN_AXIS_SPH   (12, 2)  (theta, phi) of the face center
  ORIGIN_AXIS_CART  (12, 3)  unit vector of the face center
  ORIGIN_QUAT       (12, 4)  rotation pole -> face  [x, y, z, w]
  ORIGIN_INV_QUAT   (12, 4)  conjugate
  ORIGIN_ANGLE      (12,)    in-face rotation angle
  ORIGIN_FIRST      (12,)    first quintant of the face
  ORIGIN_STEP       (12,)    +1 counter-clockwise faces, -1 clockwise faces
  ORIGIN_ORIENT     (12, 5)  orientation code per face-relative quintant

Orientation codes: 0 uv, 1 vu, 2 uw, 3 wu, 4 vw, 5 wv, decoded by the curve
kernels as (reverse, invert_j, flip_ij) per reference lattice/compat.py:138-145.
"""

import math

import numpy as np

from .constants import INTERHEDRAL_ANGLE, PI_OVER_5, TWO_PI_OVER_5
from .transforms import quat_conjugate, to_cartesian

# Orientation string -> code
ORIENT_UV, ORIENT_VU, ORIENT_UW, ORIENT_WU, ORIENT_VW, ORIENT_WV = range(6)

# (reverse, invert_j, flip_ij) per orientation code (compat.py:138-145).
ORIENT_REVERSE = np.array([0, 1, 0, 1, 1, 0], dtype=np.int64)
ORIENT_INVERT_J = np.array([0, 0, 0, 0, 1, 1], dtype=np.int64)
ORIENT_FLIP_IJ = np.array([0, 0, 1, 1, 0, 0], dtype=np.int64)

# Quintant layouts (origin.py:21-24), as orientation codes.
_CLOCKWISE_FAN = [ORIENT_VU, ORIENT_UW, ORIENT_VW, ORIENT_VW, ORIENT_VW]
_CLOCKWISE_STEP = [ORIENT_WU, ORIENT_UW, ORIENT_VW, ORIENT_VU, ORIENT_UW]
_COUNTER_STEP = [ORIENT_WU, ORIENT_UV, ORIENT_WV, ORIENT_WU, ORIENT_UW]
_COUNTER_JUMP = [ORIENT_VU, ORIENT_UV, ORIENT_WV, ORIENT_WU, ORIENT_UW]

# Per pre-reorder face id: (layout, step). Step is -1 for the clockwise
# layouts, +1 for the counter layouts (origin.py:26-39, 101-115).
_FACE_LAYOUTS = [
    (_CLOCKWISE_FAN, -1),   # 0 Arctic
    (_COUNTER_JUMP, +1),    # 1 North America
    (_COUNTER_STEP, +1),    # 2 South America
    (_CLOCKWISE_STEP, -1),  # 3 North Atlantic / W Europe / Africa
    (_COUNTER_STEP, +1),    # 4 South Atlantic / Africa
    (_COUNTER_JUMP, +1),    # 5 Europe / Middle East / C Africa
    (_COUNTER_STEP, +1),    # 6 Indian Ocean
    (_CLOCKWISE_STEP, -1),  # 7 Asia
    (_CLOCKWISE_STEP, -1),  # 8 Australia
    (_CLOCKWISE_STEP, -1),  # 9 North Pacific
    (_COUNTER_JUMP, +1),    # 10 South Pacific
    (_COUNTER_JUMP, +1),    # 11 Antarctic
]

_QUINTANT_FIRST = [4, 2, 3, 2, 0, 4, 3, 2, 2, 0, 3, 0]

# Hilbert-curve placement of faces: position i holds pre-reorder face id.
ORIGIN_ORDER = [0, 1, 2, 4, 3, 5, 7, 8, 6, 11, 10, 9]


def _build_quaternions():
    """The 12 pole->face rotation quaternions (dodecahedron_quaternions.py)."""
    sqrt5 = math.sqrt(5.0)
    inv_sqrt5 = math.sqrt(0.2)
    sin_alpha = math.sqrt((1.0 - inv_sqrt5) / 2.0)
    cos_alpha = math.sqrt((1.0 + inv_sqrt5) / 2.0)
    A = 0.5
    B = math.sqrt((2.5 - sqrt5) / 10.0)
    C = math.sqrt((2.5 + sqrt5) / 10.0)
    D = math.sqrt((1.0 + inv_sqrt5) / 8.0)
    E = math.sqrt((1.0 - inv_sqrt5) / 8.0)
    F = math.sqrt((3.0 - sqrt5) / 8.0)
    G = math.sqrt((3.0 + sqrt5) / 8.0)

    face_centers = [
        (0.0, 0.0),
        (sin_alpha, 0.0), (B, A), (-D, F), (-D, -F), (B, -A),
        (-cos_alpha, 0.0), (-E, -G), (C, -A), (C, A), (-E, G),
        (0.0, 0.0),
    ]
    quats = []
    for i, (x, y) in enumerate(face_centers):
        if i == 0:
            quats.append((0.0, 0.0, 0.0, 1.0))
        elif i == 11:
            quats.append((0.0, -1.0, 0.0, 0.0))
        else:
            ax, ay = -y, x  # cross with z axis
            w = cos_alpha if i < 6 else sin_alpha
            quats.append((ax, ay, 0.0, w))
    return quats


def _build_origins():
    quats = _build_quaternions()
    # Pre-reorder list of (axis_theta, axis_phi, angle, quat), indexed by
    # original face id in construction order (origin.py:48-61).
    pre = [None] * 12
    pre[0] = (0.0, 0.0, 0.0, quats[0])
    for i in range(5):
        alpha = i * TWO_PI_OVER_5
        pre[2 * i + 1] = (alpha, INTERHEDRAL_ANGLE, PI_OVER_5, quats[i + 1])
        pre[2 * i + 2] = (
            alpha + PI_OVER_5,
            math.pi - INTERHEDRAL_ANGLE,
            PI_OVER_5,
            quats[(i + 3) % 5 + 6],
        )
    pre[11] = (0.0, math.pi, 0.0, quats[11])

    axis_sph = np.zeros((12, 2))
    angle = np.zeros(12)
    quat = np.zeros((12, 4))
    first = np.zeros(12, dtype=np.int64)
    step = np.zeros(12, dtype=np.int64)
    orient = np.zeros((12, 5), dtype=np.int64)

    for new_id, old_id in enumerate(ORIGIN_ORDER):
        th, ph, ang, q = pre[old_id]
        axis_sph[new_id] = (th, ph)
        angle[new_id] = ang
        quat[new_id] = q
        first[new_id] = _QUINTANT_FIRST[old_id]
        layout, st = _FACE_LAYOUTS[old_id]
        step[new_id] = st
        orient[new_id] = layout
    return axis_sph, angle, quat, first, step, orient


ORIGIN_AXIS_SPH, ORIGIN_ANGLE, ORIGIN_QUAT, ORIGIN_FIRST, ORIGIN_STEP, ORIGIN_ORIENT = (
    _build_origins()
)
ORIGIN_INV_QUAT = quat_conjugate(ORIGIN_QUAT)
ORIGIN_AXIS_CART = to_cartesian(ORIGIN_AXIS_SPH[:, 0], ORIGIN_AXIS_SPH[:, 1])


def find_nearest_origin_spherical(theta: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """Vectorized argmin of the reference's modified haversine
    (origin.py:129-141, 163-182). Returns origin ids (N,)."""
    ax_th = ORIGIN_AXIS_SPH[:, 0]  # (12,)
    ax_ph = ORIGIN_AXIS_SPH[:, 1]
    dtheta = ax_th[None, :] - theta[:, None]
    dphi = ax_ph[None, :] - phi[:, None]
    a1 = np.sin(dphi / 2.0)
    a2 = np.sin(dtheta / 2.0)
    d = a1 * a1 + a2 * a2 * (np.sin(phi)[:, None] * np.sin(ax_ph)[None, :])
    return np.argmin(d, axis=1)


def find_nearest_origin_cartesian(xyz: np.ndarray) -> np.ndarray:
    """Argmin of 1 - dot(point, axis) (origin.py:143-157)."""
    d = 1.0 - xyz @ ORIGIN_AXIS_CART.T
    return np.argmin(d, axis=1)


def quintant_to_segment(quintant: np.ndarray, origin_id: np.ndarray):
    """Vectorized origin.py:101-115. Returns (segment, orientation_code)."""
    first = ORIGIN_FIRST[origin_id]
    step = ORIGIN_STEP[origin_id]
    delta = (quintant - first + 5) % 5
    face_rel = (step * delta + 5) % 5
    orientation = ORIGIN_ORIENT[origin_id, face_rel]
    segment = (first + face_rel) % 5
    return segment, orientation


def segment_to_quintant(segment: np.ndarray, origin_id: np.ndarray):
    """Vectorized origin.py:117-127. Returns (quintant, orientation_code)."""
    first = ORIGIN_FIRST[origin_id]
    step = ORIGIN_STEP[origin_id]
    face_rel = (segment - first + 5) % 5
    orientation = ORIGIN_ORIENT[origin_id, face_rel]
    quintant = (first + step * face_rel + 5) % 5
    return quintant, orientation
