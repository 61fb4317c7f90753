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


def _signed_min_margin_for_keys(cart, keys):
    """Signed minimum edge margin (see _signed_min_margin) of each point in
    the cell its KEY denotes after deserialization — used to classify res-30
    fallback keys against the res-29 pentagon they actually encode."""
    keys = np.asarray(keys, dtype=np.uint64)
    origin_id, segment, S, resolution = deserialize(keys)
    quintant, orientation = segment_to_quintant(segment, origin_id)
    face = dodec_forward(cart, origin_id)
    out = np.full(keys.shape[0], -np.inf)
    for res in np.unique(resolution):
        m = resolution == res
        hres = int(res) - FIRST_HILBERT_RESOLUTION + 1
        x, y, z, flavor = s_to_cell(S[m], hres, orientation[m])
        out[m] = _signed_min_margin(
            face[m], hres, quintant[m], x, y, flavor
        )
    return out


def _margin_for_keys(cart, keys):
    """Reference-faithful containment margin of each point in the cell its
    KEY denotes (deserialize -> that resolution's pentagon). This matters at
    res 30 where out-of-bounds quintants serialize as res-29 cells and the
    reference therefore verifies against the res-29 pentagon
    (serialization.py:123-134, cell.py:95-99)."""
    keys = np.asarray(keys, dtype=np.uint64)
    origin_id, segment, S, resolution = deserialize(keys)
    quintant, orientation = segment_to_quintant(segment, origin_id)
    out = np.full(keys.shape[0], -np.inf)
    for res in np.unique(resolution):
        m = resolution == res
        out[m] = _estimate_pentagon_margin(
            cart[m], origin_id[m], quintant[m], orientation[m], S[m], int(res)
        )
    return out


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
    return spherical_to_cell(theta, phi, resolution, lonlat=(lon, lat))


def _lattice_flavor(x, y, z):
    """Pentagon flavor as a closed-form lattice function: flavor =
    parity | (((y & 1) ^ parity) << 1). Verified exhaustively against the
    curve descent over full quintants at res 6, all 6 orientations."""
    parity = x + y + z
    return parity | (((y & 1) ^ parity) << 1)


def _signed_min_margin(face, hres, quintant, x, y, flavor):
    """Signed minimum edge margin of the (unscaled) face-frame point in the
    lattice cell (x, y, flavor) of `quintant`: min over edges of
    cross / |p - v1|. Positive = inside; magnitude below the per-resolution
    noise floor means the numpy and reference libm chains may disagree."""
    verts = pentagon_vertices(
        np.full(x.shape, hres, dtype=np.int64), quintant, x, y, flavor
    )
    v2 = np.roll(verts, -1, axis=1)
    dx = verts[..., 0] - v2[..., 0]
    dy = verts[..., 1] - v2[..., 1]
    px = face[:, None, 0] - verts[..., 0]
    py = face[:, None, 1] - verts[..., 1]
    cross = dx * py - dy * px
    p_len = np.sqrt(px * px + py * py)
    with np.errstate(divide="ignore", invalid="ignore"):
        d = np.where(p_len > 0, cross / p_len, cross)
    return d.min(axis=1)


def _noise_floor(hres: int) -> float:
    """Knife-edge threshold on the signed face-unit margin. The numpy and
    libm (math.*) projection chains agree to ~2e-16 in face coordinates
    (measured over 20k points), so margins beyond 1e-13 classify identically
    under both; rows inside the band (exact-edge ties, where the reference's
    answer depends on its literal search order) route to the scalar-exact
    encoder. Constant in face units — margins are face-unit quantities."""
    return 1e-13


def _origin_order_spherical(theta, phi):
    """Origin ids sorted by the modified-haversine metric, ascending (N, 12)."""
    from .origins import ORIGIN_AXIS_SPH

    ax_th = ORIGIN_AXIS_SPH[:, 0]
    ax_ph = ORIGIN_AXIS_SPH[:, 1]
    dtheta = ax_th[None, :] - theta[:, None]
    dphi = ax_ph[None, :] - phi[:, None]
    a1 = np.sin(dphi / 2.0)
    a2 = np.sin(dtheta / 2.0)
    d = a1 * a1 + a2 * a2 * (np.sin(phi)[:, None] * np.sin(ax_ph)[None, :])
    return np.argsort(d, axis=1, kind="stable")


def _locate_in_face(face, origin_id, resolution: int, quintant_override):
    """One location attempt in a given origin's face frame: curve estimate +
    margin verification + 7-neighbor pass with knife-edge detection.
    Returns (keys, quintant, orientation, S, solved_mask, knife_mask);
    unsolved rows carry the estimate values. Knife rows are those whose
    classification sits within the libm noise floor — the caller must route
    them to the scalar-exact encoder."""
    from .curve import triple_to_s
    from .neighbors import NEIGHBOR_DELTAS

    if quintant_override is None:
        gamma = np.arctan2(face[:, 1], face[:, 0])
        quintant = (np.rint(gamma / TWO_PI_OVER_5).astype(np.int64) + 5) % 5
    else:
        quintant = np.asarray(quintant_override, dtype=np.int64)
    segment, orientation = quintant_to_segment(quintant, origin_id)
    extra_angle = 2 * PI_OVER_5 * quintant
    c = np.cos(-extra_angle)
    s = np.sin(-extra_angle)
    fx = np.where(quintant != 0, c * face[:, 0] - s * face[:, 1], face[:, 0])
    fy = np.where(quintant != 0, s * face[:, 0] + c * face[:, 1], face[:, 1])
    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION
    scale_factor = float(2 ** hres)
    fx = fx * scale_factor
    fy = fy * scale_factor
    i = BASIS_INV[0, 0] * fx + BASIS_INV[0, 1] * fy
    j = BASIS_INV[1, 0] * fx + BASIS_INV[1, 1] * fy
    S = ij_to_s(i, j, hres, orientation)
    keys = serialize(origin_id, segment, S, resolution)

    thr = _noise_floor(hres)
    x, y, z, flavor = s_to_cell(S, hres, orientation)
    amin = _signed_min_margin(face, hres, quintant, x, y, flavor)
    knife = np.abs(amin) <= thr
    ok = amin > thr
    est_ok = ok.copy()
    if (ok | knife).all():
        return keys, quintant, orientation, S, ok, knife, est_ok

    rs = np.where(~ok & ~knife)[0]
    nx = x[rs, None] + NEIGHBOR_DELTAS[flavor[rs]][:, :, 0]
    ny = y[rs, None] + NEIGHBOR_DELTAS[flavor[rs]][:, :, 1]
    nz = z[rs, None] + NEIGHBOR_DELTAS[flavor[rs]][:, :, 2]
    psum = nx + ny + nz
    max_row = (1 << hres) - 1
    limit = ny - psum
    in_bounds = (
        ((psum == 0) | (psum == 1))
        & (nx <= 0)
        & (nz <= 0)
        & (ny >= 0)
        & (ny <= max_row)
        & (nx >= -limit)
        & (nz >= -limit)
    )
    nfl = _lattice_flavor(nx, ny, nz)
    hits = np.zeros(rs.shape[0], dtype=np.int64) - 1
    n_hits = np.zeros(rs.shape[0], dtype=np.int64)
    nb_knife = np.zeros(rs.shape[0], dtype=bool)
    for d in range(7):
        m = in_bounds[:, d]
        if not m.any():
            continue
        am = np.full(rs.shape[0], -np.inf)
        am[m] = _signed_min_margin(
            face[rs][m], hres, quintant[rs][m], nx[m, d], ny[m, d], nfl[m, d]
        )
        nb_knife |= np.abs(am) <= thr
        contains = am > thr
        hits = np.where(contains & (n_hits == 0), d, hits)
        n_hits += contains.astype(np.int64)
    knife[rs] |= nb_knife
    resolved = (n_hits == 1) & ~nb_knife
    if resolved.any():
        d = hits[resolved]
        sel = np.arange(rs.shape[0])[resolved]
        rr = rs[resolved]
        S2 = triple_to_s(nx[sel, d], ny[sel, d], nz[sel, d], hres, orientation[rr])
        S = S.copy()
        S[rr] = S2
        keys[rr] = serialize(origin_id[rr], segment[rr], S2, resolution)
        ok = ok.copy()
        ok[rr] = True
    return keys, quintant, orientation, S, ok, knife, est_ok
def spherical_to_cell(theta, phi, resolution: int, lonlat=None) -> np.ndarray:
    """Batch encoder. `lonlat` optionally carries the original geodetic
    inputs so the scalar-exact fallback reproduces the reference's full
    math.* chain from lon/lat; without it the fallback starts from the given
    internal spherical coordinates (the reference's spherical_to_cell entry,
    used by dense polygon sampling)."""
    N = theta.shape[0]
    if resolution == -1:
        return np.zeros(N, dtype=np.uint64)

    cart = to_cartesian(theta, phi)
    origin_id = find_nearest_origin_spherical(theta, phi)
    face = dodec_forward(cart, origin_id)

    if resolution < FIRST_HILBERT_RESOLUTION:
        segment, S, quintant, orientation = _face_to_estimate(face, origin_id, resolution)
        return serialize(origin_id, segment, S, resolution)

    # --- attempt chain: natural frame -> adjacent quintants -> 2nd/3rd
    # nearest origins. Each attempt accepts only margins clear of the libm
    # noise floor, so the container found equals the reference's answer (the
    # strict container is unique for interior points). Knife-edge rows and
    # rows with no clear container route to the scalar-exact encoder, which
    # mirrors the reference bit-for-bit. ---
    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION

    k0, q0, o0, S0, solved, knife, est_ok = _locate_in_face(
        face, origin_id, resolution, None
    )
    keys = k0
    unresolved = np.where(~solved & ~knife)[0]

    if resolution == MAX_RESOLUTION:
        # Fallback quintants (>= 42) serialize sibling res-30 cells onto one
        # res-29 key, and the reference DEDUPES candidates by key — so when
        # its first estimate misses, the true container's key is permanently
        # skipped and the answer depends on the literal search order. Rows
        # whose key fell back AND whose first estimate missed must therefore
        # replicate that order exactly (scalar path).
        from .serialization import get_resolution as _getres

        fell_back = _getres(keys) != MAX_RESOLUTION
        quirky = fell_back & ~est_ok
        knife = knife | quirky
        unresolved = np.where(~solved & ~knife)[0]

    # adjacent quintants (same origin)
    for dq in (1, 4):
        if not unresolved.size:
            break
        sub = unresolved
        qq = (q0[sub] + dq) % 5
        k2, q2, o2, S2, s2, kn2, _eo2 = _locate_in_face(
            face[sub], origin_id[sub], resolution, qq
        )
        hit = s2 & ~kn2
        keys[sub[hit]] = k2[hit]
        knife[sub[kn2]] = True
        unresolved = sub[~hit & ~kn2]

    # 2nd and 3rd nearest origins (face seams / corners)
    for rank in (1, 2):
        if not unresolved.size:
            break
        sub = unresolved
        oid2 = _origin_order_spherical(theta[sub], phi[sub])[:, rank]
        face2 = dodec_forward(cart[sub], oid2)
        k2, q2, o2, S2, s2, kn2, _eo2 = _locate_in_face(face2, oid2, resolution, None)
        hit = s2 & ~kn2
        keys[sub[hit]] = k2[hit]
        knife[sub[kn2]] = True
        unresolved = sub[~hit & ~kn2]

    # --- scalar-exact fallback (reference-order search, math.* geodetic
    # chain per row, curve/margin kernels batched across the residual rows —
    # decision-identical to the per-row scalar search) ---
    resid = np.union1d(unresolved, np.where(knife)[0])
    if resid.size:
        from .scalar_encode import spiral_search_batch

        if lonlat is not None:
            lon_a, lat_a = lonlat
            keys[resid] = spiral_search_batch(
                resid, resolution, lonlat=(lon_a[resid], lat_a[resid])
            )
        else:
            keys[resid] = spiral_search_batch(
                resid, resolution, theta_phi=(theta[resid], phi[resid])
            )
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
    """Vectorized cell.py:258-310 for a uniform-resolution batch (res >= 0).

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
