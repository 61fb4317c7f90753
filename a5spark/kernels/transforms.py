"""Vectorized coordinate transforms between the A5 coordinate systems.

All functions operate on numpy float64 arrays with shapes (N,) / (N, 2) /
(N, 3). Semantics follow the reference scalar implementations
(/root/reference/a5/core/coordinate_transforms.py) with identical operation
order so outputs match bit-for-bit.

Coordinate systems:
  lonlat    : (lon, lat) degrees, geodetic
  spherical : (theta, phi) radians on the rotated authalic sphere
  cartesian : unit-sphere (x, y, z)
  polar     : (rho, gamma) in a dodecahedron face plane
  face      : 2D cartesian in a face plane
  ij        : lattice eigenbasis coordinates within a quintant
"""

import numpy as np

from .authalic import authalic_to_geodetic, geodetic_to_authalic
from .constants import DEG2RAD, LONGITUDE_OFFSET_DEG, RAD2DEG


def from_lonlat(lon: np.ndarray, lat: np.ndarray):
    """(lon, lat) degrees -> (theta, phi) radians in the internal frame.

    Matches reference coordinate_transforms.py:77-94 (+93 deg longitude
    rotation, geodetic->authalic latitude).
    """
    theta = (lon + LONGITUDE_OFFSET_DEG) * DEG2RAD
    authalic_lat = geodetic_to_authalic(lat * DEG2RAD)
    phi = np.pi / 2 - authalic_lat
    return theta, phi


def normalize_longitude(lon: np.ndarray) -> np.ndarray:
    """Normalize longitudes to [-180, 180)."""
    return ((lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0


def to_lonlat(theta: np.ndarray, phi: np.ndarray):
    """(theta, phi) internal spherical -> (lon, lat) degrees."""
    lon = normalize_longitude(theta * RAD2DEG - LONGITUDE_OFFSET_DEG)
    geodetic_lat = authalic_to_geodetic(np.pi / 2 - phi)
    lat = geodetic_lat * RAD2DEG
    return lon, lat


def to_cartesian(theta: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """Spherical -> unit cartesian, stacked (N, 3)."""
    sin_phi = np.sin(phi)
    return np.stack(
        [sin_phi * np.cos(theta), sin_phi * np.sin(theta), np.cos(phi)], axis=-1
    )


def to_spherical(xyz: np.ndarray):
    """Cartesian (N, 3) -> (theta, phi). Handles non-unit vectors like the
    reference (phi = acos(z / |v|))."""
    theta = np.arctan2(xyz[..., 1], xyz[..., 0])
    r = np.sqrt(xyz[..., 0] ** 2 + xyz[..., 1] ** 2 + xyz[..., 2] ** 2)
    phi = np.arccos(xyz[..., 2] / r)
    return theta, phi


def to_polar(xy: np.ndarray):
    """Face (N, 2) -> (rho, gamma)."""
    rho = np.sqrt(xy[..., 0] ** 2 + xy[..., 1] ** 2)
    gamma = np.arctan2(xy[..., 1], xy[..., 0])
    return rho, gamma


def polar_to_face(rho: np.ndarray, gamma: np.ndarray) -> np.ndarray:
    return np.stack([rho * np.cos(gamma), rho * np.sin(gamma)], axis=-1)


def transform_quat(v: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Rotate vectors v (N, 3) by quaternions q (N, 4) [x, y, z, w].

    Standard gl-matrix formula: out = v + 2w (q_v x v) + 2 (q_v x (q_v x v)).
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    uv = np.cross(qv, v)
    uuv = np.cross(qv, uv)
    return v + uv * (2.0 * w) + uuv * 2.0


def quat_conjugate(q: np.ndarray) -> np.ndarray:
    out = q.copy()
    out[..., :3] = -out[..., :3]
    return out
