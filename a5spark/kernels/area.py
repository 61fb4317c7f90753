"""Exact spherical polygon areas (Van Oosterom–Strackee excess fan).

Batched re-derivation of the reference's SphericalPolygonShape.get_area
(reference a5/geometry/spherical_polygon.py:21-38 triangle excess,
:232-265 centroid fan): signed spherical-triangle excess via
2*atan2(triple(v1,v2,v3), 1 + v1.v2 + v2.v3 + v3.v1), fanned around the
normalized vertex centroid for K > 3 polygons. atan2 keeps precision for
tiny triangles and does not fold areas above pi.
"""

import numpy as np

from .constants import AUTHALIC_RADIUS_EARTH


def spherical_triangle_area(v1: np.ndarray, v2: np.ndarray, v3: np.ndarray) -> np.ndarray:
    """Signed excess (steradians) of unit-vector triangles; inputs (N, 3)."""
    triple = np.einsum("ij,ij->i", v1, np.cross(v2, v3))
    norm = (
        1.0
        + np.einsum("ij,ij->i", v1, v2)
        + np.einsum("ij,ij->i", v2, v3)
        + np.einsum("ij,ij->i", v3, v1)
    )
    return 2.0 * np.arctan2(triple, norm)


def spherical_polygon_area(verts: np.ndarray) -> np.ndarray:
    """Signed area (steradians) of spherical polygons on the unit sphere.

    verts: (N, K, 3) unit vectors, OPEN rings (no repeated closing vertex),
    CCW positive. K == 3 computes the direct triangle excess (reference
    fast path); K > 3 fans around the normalized centroid, skipping NaN
    triangles like the reference."""
    verts = np.asarray(verts, dtype=np.float64)
    n, k, _ = verts.shape
    if k < 3:
        return np.zeros(n)
    if k == 3:
        return spherical_triangle_area(verts[:, 0], verts[:, 1], verts[:, 2])
    center = verts.sum(axis=1)
    center /= np.linalg.norm(center, axis=1, keepdims=True)
    total = np.zeros(n)
    for i in range(k):
        tri = spherical_triangle_area(center, verts[:, i], verts[:, (i + 1) % k])
        total += np.where(np.isnan(tri), 0.0, tri)
    return total


def cell_area_exact(cells: np.ndarray) -> np.ndarray:
    """Exact area in m^2 of each cell's spherical pentagon (authalic sphere).
    Cells must be in the pentagon regime (resolution >= 2); uniform-resolution
    batches take one vectorized pass per resolution."""
    from .cell import cell_to_boundary
    from .serialization import get_resolution
    from .transforms import from_lonlat, to_cartesian

    cells = np.asarray(cells, dtype=np.uint64)
    out = np.full(cells.shape[0], np.nan)
    res = get_resolution(cells)
    for r in np.unique(res):
        idx = np.where(res == r)[0]
        if r < 2:
            continue
        rings = cell_to_boundary(cells[idx])
        open_rings = np.stack([ring[:-1] for ring in rings])  # drop closing pt
        m, k, _ = open_rings.shape
        lon = open_rings[..., 0].ravel()
        lat = open_rings[..., 1].ravel()
        th, ph = from_lonlat(lon, lat)
        vecs = to_cartesian(th, ph).reshape(m, k, 3)
        out[idx] = spherical_polygon_area(vecs) * AUTHALIC_RADIUS_EARTH**2
    return out
