"""Vectorized point <-> cell kernels: the engine's encode / decode hot paths.

Re-expresses the reference's scalar pipeline
(/root/reference/a5/core/cell.py:56-310) as batch numpy kernels:

  lonlat_to_cell(lon, lat, resolution)  -> uint64 cell ids
  cell_to_lonlat(cells)                 -> (lon, lat)
  cell_to_boundary(cells, segments)     -> (N, V, 2) lonlat rings

The encoder runs the common path fully vectorized (projection -> quintant ->
curve descent -> containment verify) and drops to a masked spiral-search loop
for the small residual of rows whose lattice estimate misses (reference
cell.py:102-147, utils/spiral.py). The reference's single-entry cache is
unnecessary here — batch vectorization amortizes far better.
"""

import math

import numpy as np

from .constants import (
    FIRST_HILBERT_RESOLUTION,
    MAX_RESOLUTION,
    PI_OVER_5,
    TWO_PI_OVER_5,
)
from .curve import ij_to_s, s_to_cell
from .origins import (
    ORIGIN_ANGLE,
    find_nearest_origin_cartesian,
    find_nearest_origin_spherical,
    quintant_to_segment,
    segment_to_quintant,
)
from .pentagon import (
    BASIS_INV,
    FACE_VERTS,
    pentagon_center,
    pentagon_vertices,
    polygon_contains,
    quintant_triangle,
)
from .projections import dodec_forward, dodec_inverse
from .serialization import deserialize, serialize
from .transforms import (
    from_lonlat,
    normalize_longitude,
    to_cartesian,
    to_lonlat,
    to_spherical,
)

# Spiral-search constants (reference utils/spiral.py:17-31, cell.py:153).
SPIRAL_SAMPLE_COUNT = 24
_ANGLE_STEP_RAD = 1.4
_SPIRAL_SCALE_RAD = 70 * math.pi / 180
_SPIRAL_DIRECTIONS = np.array(
    [
        [math.cos((i + 1) * _ANGLE_STEP_RAD), math.sin((i + 1) * _ANGLE_STEP_RAD), 0.0]
        for i in range(SPIRAL_SAMPLE_COUNT)
    ]
)
_POLE = np.array([0.0, 0.0, 1.0])


def _face_to_estimate(face, origin_id, resolution):
    """Vectorized cell.py:172-196: face point + origin -> (origin, segment, S).
    Returns (segment, S, quintant, orientation)."""
    gamma = np.arctan2(face[:, 1], face[:, 0])
    quintant = (np.rint(gamma / TWO_PI_OVER_5).astype(np.int64) + 5) % 5
    segment, orientation = quintant_to_segment(quintant, origin_id)

    if resolution < FIRST_HILBERT_RESOLUTION:
        return segment, np.zeros(face.shape[0], dtype=np.uint64), quintant, orientation

    # Rotate into quintant 0
    extra_angle = 2 * PI_OVER_5 * quintant
    c = np.cos(-extra_angle)
    s = np.sin(-extra_angle)
    fx = np.where(quintant != 0, c * face[:, 0] - s * face[:, 1], face[:, 0])
    fy = np.where(quintant != 0, s * face[:, 0] + c * face[:, 1], face[:, 1])

    hilbert_resolution = 1 + resolution - FIRST_HILBERT_RESOLUTION
    scale_factor = float(2 ** hilbert_resolution)
    fx = fx * scale_factor
    fy = fy * scale_factor

    # face -> IJ (coordinate_transforms.py:44-51)
    i = BASIS_INV[0, 0] * fx + BASIS_INV[0, 1] * fy
    j = BASIS_INV[1, 0] * fx + BASIS_INV[1, 1] * fy
    S = ij_to_s(i, j, hilbert_resolution, orientation)
    return segment, S, quintant, orientation


def _estimate_pentagon_margin(spherical_cart, origin_id, quintant, orientation, S, resolution):
    """Containment margin of the original point in the estimated cell's
    pentagon (cell.py:312-326). spherical_cart: cartesian of the query point."""
    face = dodec_forward(spherical_cart, origin_id)
    if resolution == FIRST_HILBERT_RESOLUTION - 1:
        verts = quintant_triangle(quintant)
        return polygon_contains(verts, face)
    if resolution == FIRST_HILBERT_RESOLUTION - 2:
        verts = np.broadcast_to(FACE_VERTS, (face.shape[0], 5, 2))
        return polygon_contains(verts, face)
    hres = resolution - FIRST_HILBERT_RESOLUTION + 1
    x, y, z, flavor = s_to_cell(S, hres, orientation)
    verts = pentagon_vertices(
        np.full(x.shape, hres, dtype=np.int64), quintant, x, y, flavor
    )
    return polygon_contains(verts, face)


def _quat_rotation_to_pole(cart):
    """Quaternion rotating the +z pole onto each row of cart (N, 3)
    (gl-matrix rotation_to with a = pole)."""
    N = cart.shape[0]
    out = np.zeros((N, 4))
    dot = cart[:, 2]  # pole . b
    anti = dot < -0.999999
    ident = dot > 0.999999
    rest = ~anti & ~ident
    # rest: axis = pole x b = (-b1? ...): cross((0,0,1), b) = (-b[1], b[0], 0)
    out[rest, 0] = -cart[rest, 1]
    out[rest, 1] = cart[rest, 0]
    out[rest, 2] = 0.0
    out[rest, 3] = 1.0 + dot[rest]
    norm = np.sqrt((out[rest] ** 2).sum(axis=1))
    out[rest] /= norm[:, None]
    out[ident] = (0.0, 0.0, 0.0, 1.0)
    # antipode: pi rotation around axis cross(x_unit, pole) = (0, -1, 0)
    out[anti] = (0.0, -math.sin(math.pi / 2), 0.0, math.cos(math.pi / 2))
    return out


def _rotate_by_quat(v, q):
    qv = q[:, :3]
    w = q[:, 3:4]
    uv = np.cross(qv, v)
    uuv = np.cross(qv, uv)
    return v + uv * (2.0 * w) + uuv * 2.0


def lonlat_to_cell(lon, lat, resolution: int) -> np.ndarray:
    """Vectorized encoder (cell.py:56-147). Returns uint64 cell IDs."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    theta, phi = from_lonlat(lon, lat)
    return spherical_to_cell(theta, phi, resolution)


def spherical_to_cell(theta, phi, resolution: int) -> np.ndarray:
    N = theta.shape[0]
    if resolution == -1:
        return np.zeros(N, dtype=np.uint64)

    cart = to_cartesian(theta, phi)
    origin_id = find_nearest_origin_spherical(theta, phi)
    face = dodec_forward(cart, origin_id)
    segment, S, quintant, orientation = _face_to_estimate(face, origin_id, resolution)

    if resolution < FIRST_HILBERT_RESOLUTION:
        return serialize(origin_id, segment, S, resolution)

    keys = serialize(origin_id, segment, S, resolution)
    margin = _estimate_pentagon_margin(cart, origin_id, quintant, orientation, S, resolution)
    ok = margin > 0
    if ok.all():
        return keys

    # --- spiral fallback over the residual rows (cell.py:102-147) ---
    resid = np.where(~ok)[0]
    n = resid.shape[0]
    hilbert_resolution = 1 + resolution - FIRST_HILBERT_RESOLUTION
    scale = _SPIRAL_SCALE_RAD / (2 ** hilbert_resolution)

    r_cart = cart[resid]
    quat = _quat_rotation_to_pole(r_cart)

    # Candidate history: keys + margins, slot 0 = first estimate.
    max_slots = 1 + SPIRAL_SAMPLE_COUNT
    cand_keys = np.zeros((n, max_slots), dtype=np.uint64)
    cand_margin = np.full((n, max_slots), -np.inf)
    cand_keys[:, 0] = keys[resid]
    cand_margin[:, 0] = margin[resid]
    n_cand = np.ones(n, dtype=np.int64)

    active = np.ones(n, dtype=bool)
    result = np.zeros(n, dtype=np.uint64)

    for i in range(SPIRAL_SAMPLE_COUNT):
        if not active.any():
            break
        rows = np.where(active)[0]
        dirs = _rotate_by_quat(
            np.broadcast_to(_SPIRAL_DIRECTIONS[i], (rows.shape[0], 3)), quat[rows]
        )
        R = ((i + 1) / (SPIRAL_SAMPLE_COUNT + 1)) * scale
        sample = r_cart[rows] + dirs * R

        s_oid = find_nearest_origin_cartesian(sample)
        s_face = dodec_forward(sample, s_oid)
        s_seg, s_S, s_quin, s_orient = _face_to_estimate(s_face, s_oid, resolution)
        s_keys = serialize(s_oid, s_seg, s_S, resolution)

        # dedup against seen candidates per row
        seen = (cand_keys[rows] == s_keys[:, None]).any(axis=1)
        fresh = ~seen
        if not fresh.any():
            continue
        frows = rows[fresh]
        m = _estimate_pentagon_margin(
            r_cart[frows], s_oid[fresh], s_quin[fresh], s_orient[fresh],
            s_S[fresh], resolution,
        )
        slot = n_cand[frows]
        cand_keys[frows, slot] = s_keys[fresh]
        cand_margin[frows, slot] = m
        n_cand[frows] += 1
        hit = m > 0
        if hit.any():
            hrows = frows[hit]
            result[hrows] = s_keys[fresh][hit]
            active[hrows] = False

    # Residual after spiral: try neighbors of the best candidates, then
    # fall back to max-margin (cell.py:122-147). Stable sort keeps insertion
    # order on ties, matching the reference's list.sort.
    if active.any():
        try:
            from .neighbors import global_cell_neighbors_scalar
        except ImportError:  # neighbor traversal not built yet
            def global_cell_neighbors_scalar(_key):
                return []

        for r in np.where(active)[0]:
            k = n_cand[r]
            order = np.argsort(-cand_margin[r, :k], kind="stable")
            keys_r = list(cand_keys[r, :k][order])
            margins_r = list(cand_margin[r, :k][order])
            seen = set(int(x) for x in cand_keys[r, :k])
            found = False
            for kk in range(min(3, len(keys_r))):
                for nb in global_cell_neighbors_scalar(int(keys_r[kk])):
                    if nb in seen:
                        continue
                    seen.add(nb)
                    o2, s2, S2, _ = deserialize(np.array([nb], dtype=np.uint64))
                    q2, or2 = segment_to_quintant(s2, o2)
                    m2 = _estimate_pentagon_margin(
                        r_cart[r : r + 1], o2, q2, or2, S2, resolution
                    )[0]
                    if m2 > 0:
                        result[r] = nb
                        active[r] = False
                        found = True
                        break
                    keys_r.append(np.uint64(nb))
                    margins_r.append(m2)
                if found:
                    break
            if not found:
                best = int(np.argmax(np.array(margins_r)))
                # ties: first occurrence (matches stable re-sort in reference)
                result[r] = keys_r[best]
                active[r] = False

    keys[resid] = result
    return keys


def _cells_to_face_parts(cells):
    """Deserialize + curve-decode a batch of cells. Returns dict of parts."""
    origin_id, segment, S, resolution = deserialize(cells)
    quintant, orientation = segment_to_quintant(segment, origin_id)
    return origin_id, segment, S, resolution, quintant, orientation


def cell_to_spherical(cells) -> tuple:
    """Cell centers in the internal spherical frame (cell.py:219-239).
    Mixed resolutions split internally. Returns (theta, phi)."""
    cells = np.asarray(cells, dtype=np.uint64)
    N = cells.shape[0]
    theta = np.zeros(N)
    phi = np.zeros(N)
    origin_id, segment, S, resolution, quintant, orientation = _cells_to_face_parts(cells)
    for res in np.unique(resolution):
        m = resolution == res
        if res == -1:
            continue
        if res >= FIRST_HILBERT_RESOLUTION:
            hres = int(res) - FIRST_HILBERT_RESOLUTION + 1
            x, y, z, flavor = s_to_cell(S[m], hres, orientation[m])
            center = pentagon_center(
                np.full(int(m.sum()), hres, dtype=np.int64), quintant[m], x, y, flavor
            )
        elif res == FIRST_HILBERT_RESOLUTION - 1:
            center = quintant_triangle(quintant[m]).mean(axis=1)
        else:
            center = np.broadcast_to(FACE_VERTS.mean(axis=0), (int(m.sum()), 2)).copy()
        th, ph = dodec_inverse(center, origin_id[m])
        theta[m] = th
        phi[m] = ph
    return theta, phi


def haversine_internal(theta1, phi1, theta2, phi2):
    """The reference's modified haversine 'angle' metric (origin.py:163-182)."""
    dtheta = theta2 - theta1
    dphi = phi2 - phi1
    a1 = np.sin(dphi / 2.0)
    a2 = np.sin(dtheta / 2.0)
    return a1 * a1 + a2 * a2 * np.sin(phi1) * np.sin(phi2)


def cell_to_lonlat(cells) -> tuple:
    """Vectorized cell.py:219-256. Requires uniform-resolution batches for the
    Hilbert path; mixed batches are split internally. World cells -> (0, 0)."""
    cells = np.asarray(cells, dtype=np.uint64)
    N = cells.shape[0]
    lon = np.zeros(N)
    lat = np.zeros(N)
    origin_id, segment, S, resolution, quintant, orientation = _cells_to_face_parts(cells)

    for res in np.unique(resolution):
        m = resolution == res
        if res == -1:
            continue
        if res >= FIRST_HILBERT_RESOLUTION:
            hres = int(res) - FIRST_HILBERT_RESOLUTION + 1
            x, y, z, flavor = s_to_cell(S[m], hres, orientation[m])
            center = pentagon_center(
                np.full(m.sum(), hres, dtype=np.int64), quintant[m], x, y, flavor
            )
        elif res == FIRST_HILBERT_RESOLUTION - 1:
            verts = quintant_triangle(quintant[m])
            center = verts.mean(axis=1)
        else:
            center = np.broadcast_to(
                FACE_VERTS.mean(axis=0), (int(m.sum()), 2)
            ).copy()
        theta, phi = dodec_inverse(center, origin_id[m])
        lo, la = to_lonlat(theta, phi)
        lon[m] = lo
        lat[m] = la
    return lon, lat


def _split_edges(verts, segments: int):
    """(N, V, 2) -> (N, V*segments, 2), lerping `segments` points per edge
    (geometry/pentagon.py:173-203)."""
    if segments <= 1:
        return verts
    v1 = verts
    v2 = np.roll(verts, -1, axis=1)
    t = np.arange(segments) / segments  # (segments,)
    out = v1[:, :, None, :] + t[None, None, :, None] * (v2 - v1)[:, :, None, :]
    return out.reshape(verts.shape[0], -1, 2)


def _pentagon_for_cells(cells):
    """Vertex rings (N, 5, 2) for uniform-resolution Hilbert cells (res>=2)."""
    origin_id, segment, S, resolution, quintant, orientation = _cells_to_face_parts(cells)
    res = int(resolution[0])
    hres = res - FIRST_HILBERT_RESOLUTION + 1
    x, y, z, flavor = s_to_cell(S, hres, orientation)
    verts = pentagon_vertices(
        np.full(cells.shape[0], hres, dtype=np.int64), quintant, x, y, flavor
    )
    return verts, origin_id


def cell_to_boundary(cells, segments=None, closed_ring: bool = True):
    """Vectorized cell.py:258-310 for a uniform-resolution batch (res >= 2).

    Returns (N, P, 2) lonlat rings (CCW, antimeridian-normalized, closed if
    closed_ring)."""
    cells = np.asarray(cells, dtype=np.uint64)
    origin_id, segment, S, resolution, quintant, orientation = _cells_to_face_parts(cells)
    res = int(resolution[0])
    if not (resolution == res).all():
        raise ValueError("cell_to_boundary batch must share one resolution")
    if segments is None:
        segments = max(1, 2 ** (6 - res))

    if res >= FIRST_HILBERT_RESOLUTION:
        verts, _ = _pentagon_for_cells(cells)
    elif res == 1:
        verts = quintant_triangle(quintant)
    else:
        verts = np.broadcast_to(FACE_VERTS, (cells.shape[0], 5, 2)).copy()

    split = _split_edges(verts, segments)
    N, P, _ = split.shape
    flat = split.reshape(-1, 2)
    oid_flat = np.repeat(origin_id, P)
    theta, phi = dodec_inverse(flat, oid_flat)
    lon, lat = to_lonlat(theta, phi)
    lon = lon.reshape(N, P)
    lat = lat.reshape(N, P)

    # normalize longitudes per ring (coordinate_transforms.py:144-181)
    th2, ph2 = from_lonlat(lon.ravel(), lat.ravel())
    cart = to_cartesian(th2, ph2).reshape(N, P, 3)
    center = cart.sum(axis=1)
    clen = np.sqrt((center ** 2).sum(axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        center = np.where(clen[:, None] > 0, center / clen[:, None], center)
    cth, cph = to_spherical(center)
    clon, clat = to_lonlat(cth, cph)
    polar = (clat > 89.99) | (clat < -89.99)
    clon = np.where(polar, lon[:, 0], clon)
    clon = normalize_longitude(clon)
    delta = lon - clon[:, None]
    # shift into [-180, 180] around center; exact +-180 deltas stay put
    # (matches the reference's strict-inequality while loops)
    k = np.zeros_like(delta)
    hi = delta > 180.0
    lo2 = delta < -180.0
    k[hi] = np.ceil((delta[hi] - 180.0) / 360.0)
    k[lo2] = np.floor((delta[lo2] + 180.0) / 360.0)
    lon = lon - 360.0 * k

    ring = np.stack([lon, lat], axis=-1)
    if closed_ring:
        ring = np.concatenate([ring, ring[:, :1]], axis=1)
    return ring[:, ::-1]  # reverse to CCW (cell.py:309)
