"""Scalar (math.*) exact encoder — the knife-edge fallback.

The vectorized encoder's transcendentals come from numpy's SIMD libm, which
can differ from CPython's `math` module (= the reference's libm) by 1 ulp.
For points whose containment margin is within the float noise floor of a cell
edge, that ulp decides WHICH cell the reference returns. Those rows (an
~1e-7 fraction) are routed here: a scalar mirror of the reference's search
(/root/reference/a5/core/cell.py:70-147) whose every transcendental is
`math.*` — bitwise-identical results to the reference on the same platform.

All pure-float arithmetic (curve descents, serialization, pentagon algebra)
is IEEE-exact in either engine, so those pieces are reused from the
vectorized kernels with size-1 arrays.
"""

import math

import numpy as np

from .constants import (
    DEG2RAD,
    DISTANCE_TO_EDGE,
    FIRST_HILBERT_RESOLUTION,
    LONGITUDE_OFFSET_DEG,
    PI_OVER_5,
    TWO_PI_OVER_5,
)
from .authalic import _GEODETIC_TO_AUTHALIC
from .curve import ij_to_s, s_to_cell
from .origins import (
    ORIGIN_ANGLE,
    ORIGIN_AXIS_CART,
    ORIGIN_AXIS_SPH,
    ORIGIN_INV_QUAT,
    quintant_to_segment,
)
from .pentagon import BASIS_INV, FACE_VERTS, pentagon_vertices, quintant_triangle
from .projections import (
    EA_AREA_ABC,
    EA_VOLUME_ABC,
    FACE_TRI,
    SPH_TRI,
)
from .serialization import deserialize, serialize

SPIRAL_SAMPLE_COUNT = 24
_SPIRAL_SCALE_RAD = 70 * math.pi / 180
_DIRS = [(math.cos((i + 1) * 1.4), math.sin((i + 1) * 1.4), 0.0) for i in range(24)]


def _from_lonlat(lon, lat):
    theta = (lon + LONGITUDE_OFFSET_DEG) * DEG2RAD
    phi_in = lat * DEG2RAD
    sin_phi = math.sin(phi_in)
    cos_phi = math.cos(phi_in)
    X = 2.0 * (cos_phi - sin_phi) * (cos_phi + sin_phi)
    C = _GEODETIC_TO_AUTHALIC
    u0 = X * C[5] + C[4]
    u1 = X * u0 + C[3]
    u0 = X * u1 - u0 + C[2]
    u1 = X * u0 - u1 + C[1]
    u0 = X * u1 - u0 + C[0]
    authalic = phi_in + 2.0 * sin_phi * cos_phi * u0
    return theta, math.pi / 2 - authalic


def _to_cartesian(theta, phi):
    sp = math.sin(phi)
    return (sp * math.cos(theta), sp * math.sin(theta), math.cos(phi))


def _nearest_origin_spherical(theta, phi):
    best, bid = float("inf"), 0
    for i in range(12):
        th2, ph2 = ORIGIN_AXIS_SPH[i]
        a1 = math.sin((ph2 - phi) / 2)
        a2 = math.sin((th2 - theta) / 2)
        d = a1 * a1 + a2 * a2 * math.sin(phi) * math.sin(ph2)
        if d < best:
            best, bid = d, i
    return bid


def _nearest_origin_cartesian(c):
    best, bid = float("inf"), 0
    for i in range(12):
        ax = ORIGIN_AXIS_CART[i]
        d = 1.0 - (c[0] * ax[0] + c[1] * ax[1] + c[2] * ax[2])
        if d < best:
            best, bid = d, i
    return bid


def _tquat(v, q):
    qx, qy, qz, qw = q
    x, y, z = v
    uvx = qy * z - qz * y
    uvy = qz * x - qx * z
    uvz = qx * y - qy * x
    uuvx = qy * uvz - qz * uvy
    uuvy = qz * uvx - qx * uvz
    uuvz = qx * uvy - qy * uvx
    w2 = qw * 2
    return (x + uvx * w2 + uuvx * 2, y + uvy * w2 + uuvy * 2, z + uvz * w2 + uuvz * 2)


def _sta(v1, v2, v3):
    norm = (
        1.0
        + (v1[0] * v2[0] + v1[1] * v2[1] + v1[2] * v2[2])
        + (v2[0] * v3[0] + v2[1] * v3[1] + v2[2] * v3[2])
        + (v3[0] * v1[0] + v3[1] * v1[1] + v3[2] * v1[2])
    )
    tp = (
        v1[0] * (v2[1] * v3[2] - v2[2] * v3[1])
        + v1[1] * (v2[2] * v3[0] - v2[0] * v3[2])
        + v1[2] * (v2[0] * v3[1] - v2[1] * v3[0])
    )
    return 2.0 * math.atan2(tp, norm)


def _dodec_forward(cart, origin_id):
    """Scalar dodecahedron.py:49-74."""
    rotated = _tquat(cart, ORIGIN_INV_QUAT[origin_id])
    theta = math.atan2(rotated[1], rotated[0])
    r = math.sqrt(rotated[0] ** 2 + rotated[1] ** 2 + rotated[2] ** 2)
    phi = math.acos(rotated[2] / r)
    rho = math.tan(phi)
    gamma = theta - ORIGIN_ANGLE[origin_id]

    tri_idx = (int(math.floor(gamma / PI_OVER_5)) + 10) % 10
    segment = gamma / TWO_PI_OVER_5
    beta = (segment - round(segment)) * TWO_PI_OVER_5
    reflect = 1 if rho * math.cos(beta) > DISTANCE_TO_EDGE else 0

    A, B, C = SPH_TRI[origin_id, tri_idx, reflect]
    p1, p2, p3 = FACE_TRI[tri_idx, reflect]

    bxc = (
        B[1] * C[2] - B[2] * C[1],
        B[2] * C[0] - B[0] * C[2],
        B[0] * C[1] - B[1] * C[0],
    )
    volume_vbc = cart[0] * bxc[0] + cart[1] * bxc[1] + cart[2] * bxc[2]
    P = [cart[k] * EA_VOLUME_ABC - A[k] * volume_vbc for k in range(3)]
    D = math.sqrt(P[0] ** 2 + P[1] ** 2 + P[2] ** 2)
    ooD = 1.0 / D if D > 0 else 1.0
    P = (P[0] * ooD, P[1] * ooD, P[2] * ooD)
    area_abp = max(0.0, _sta(A, B, P))
    alpha = area_abp / EA_AREA_ABC
    AdotP = A[0] * P[0] + A[1] * P[1] + A[2] * P[2]
    AdotV = A[0] * cart[0] + A[1] * cart[1] + A[2] * cart[2]
    rho2 = (D / EA_VOLUME_ABC) * math.sqrt((1.0 + AdotP) / (1.0 + AdotV))
    b0 = 1.0 - rho2
    b1 = rho2 * (1.0 - alpha)
    b2 = rho2 * alpha
    return (
        b0 * p1[0] + b1 * p2[0] + b2 * p3[0],
        b0 * p1[1] + b1 * p2[1] + b2 * p3[1],
    )


def _face_to_estimate(face, origin_id, resolution):
    gamma = math.atan2(face[1], face[0])
    quintant = (round(gamma / TWO_PI_OVER_5) + 5) % 5
    seg, orient = quintant_to_segment(np.array([quintant]), np.array([origin_id]))
    segment, orientation = int(seg[0]), int(orient[0])
    if resolution < FIRST_HILBERT_RESOLUTION:
        return segment, 0, quintant, orientation
    fx, fy = face
    if quintant != 0:
        extra = 2 * PI_OVER_5 * quintant
        c = math.cos(-extra)
        s = math.sin(-extra)
        fx, fy = c * face[0] - s * face[1], s * face[0] + c * face[1]
    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION
    sf = float(2 ** hres)
    fx *= sf
    fy *= sf
    i = BASIS_INV[0, 0] * fx + BASIS_INV[0, 1] * fy
    j = BASIS_INV[1, 0] * fx + BASIS_INV[1, 1] * fy
    S = int(ij_to_s(np.array([i]), np.array([j]), hres, np.array([orientation]))[0])
    return segment, S, quintant, orientation


def _cell_margin(cart, origin_id, segment, S, res):
    """Reference a5cell_contains_point of an (origin, segment, S, res) cell —
    the PRE-serialization estimate form (cell.py:95-99 verifies the estimate's
    own pentagon, res-30 S untruncated)."""
    from .origins import segment_to_quintant

    o = np.array([origin_id])
    seg = np.array([segment])
    S = np.array([S], dtype=np.uint64)
    q, orient = segment_to_quintant(seg, o)
    face = _dodec_forward(cart, origin_id)
    if res >= FIRST_HILBERT_RESOLUTION:
        hres = res - FIRST_HILBERT_RESOLUTION + 1
        x, y, z, fl = s_to_cell(S, hres, orient)
        verts = pentagon_vertices(np.array([hres]), q, x, y, fl)[0]
    elif res == 1:
        verts = quintant_triangle(q)[0]
    else:
        verts = FACE_VERTS
    d_max = 1.0
    n = verts.shape[0]
    for e in range(n):
        v1 = verts[e]
        v2 = verts[(e + 1) % n]
        dx = v1[0] - v2[0]
        dy = v1[1] - v2[1]
        px = face[0] - v1[0]
        py = face[1] - v1[1]
        cross = dx * py - dy * px
        if cross < 0:
            p_len = math.sqrt(px * px + py * py)
            d_max = min(d_max, cross / p_len)
    return d_max


def _key_margin(cart, key):
    """Margin of the cell a serialized KEY denotes (deserialize first) —
    used by the neighbor fallback, mirroring cell.py:138-141."""
    o, seg, S, res = deserialize(np.array([key], dtype=np.uint64))
    return _cell_margin(cart, int(o[0]), int(seg[0]), int(S[0]), int(res[0]))


def encode_scalar(lon: float, lat: float, resolution: int) -> int:
    """Reference-exact scalar encode (mirrors cell.py:56-67 with math.*)."""
    theta, phi = _from_lonlat(lon, lat)
    return spherical_to_cell_scalar(theta, phi, resolution)


def spherical_to_cell_scalar(theta: float, phi: float, resolution: int) -> int:
    """Reference-exact scalar encode from internal spherical coordinates
    (mirrors cell.py:70-147 with math.*)."""
    if resolution == -1:
        return 0
    cart = _to_cartesian(theta, phi)
    origin_id = _nearest_origin_spherical(theta, phi)
    face = _dodec_forward(cart, origin_id)
    segment, S, quintant, orientation = _face_to_estimate(face, origin_id, resolution)
    first_key = int(
        serialize(
            np.array([origin_id]), np.array([segment]),
            np.array([S], dtype=np.uint64), resolution,
        )[0]
    )
    if resolution < FIRST_HILBERT_RESOLUTION:
        return first_key

    first_margin = _cell_margin(cart, origin_id, segment, S, resolution)
    if first_margin > 0:
        return first_key

    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION
    scale = _SPIRAL_SCALE_RAD / (2 ** hres)
    seen = {first_key}
    cells = [(first_key, first_margin)]

    # spiral: pole->center quaternion (gl-matrix rotation_to)
    dot = cart[2]
    if dot < -0.999999:
        q = (0.0, -math.sin(math.pi / 2), 0.0, math.cos(math.pi / 2))
    elif dot > 0.999999:
        q = (0.0, 0.0, 0.0, 1.0)
    else:
        qx, qy, qz, qw = -cart[1], cart[0], 0.0, 1.0 + dot
        ln = math.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
        inv = 1.0 / ln
        q = (qx * inv, qy * inv, qz * inv, qw * inv)

    for i in range(SPIRAL_SAMPLE_COUNT):
        d = _tquat(_DIRS[i], q)
        R = ((i + 1) / (SPIRAL_SAMPLE_COUNT + 1)) * scale
        sample = (cart[0] + d[0] * R, cart[1] + d[1] * R, cart[2] + d[2] * R)
        s_oid = _nearest_origin_cartesian(sample)
        s_face = _dodec_forward(sample, s_oid)
        seg2, S2, _, _ = _face_to_estimate(s_face, s_oid, resolution)
        key = int(
            serialize(
                np.array([s_oid]), np.array([seg2]),
                np.array([S2], dtype=np.uint64), resolution,
            )[0]
        )
        if key in seen:
            continue
        seen.add(key)
        m = _cell_margin(cart, s_oid, seg2, S2, resolution)
        if m > 0:
            return key
        cells.append((key, m))

    # neighbors of the best three candidates (cell.py:122-142)
    from .neighbors import global_cell_neighbors_scalar

    cells.sort(key=lambda kv: kv[1], reverse=True)
    for k in range(min(3, len(cells))):
        for nb in global_cell_neighbors_scalar(cells[k][0]):
            if nb in seen:
                continue
            seen.add(nb)
            m = _key_margin(cart, nb)
            if m > 0:
                return nb
            cells.append((nb, m))

    cells.sort(key=lambda kv: kv[1], reverse=True)
    return cells[0][0]


# --- batched spiral search --------------------------------------------------
# Decision-for-decision identical to spherical_to_cell_scalar, restructured so
# the curve/serialization/pentagon kernels run ONCE over all rows' candidates
# instead of per size-1 array (which dominated the scalar path's cost). Every
# geodetic/trig quantity is still computed per row with math.* (the libm
# parity requirement); the batched pieces (ij_to_s, s_to_cell, serialize,
# pentagon_vertices, elementwise float algebra) are the very same numpy
# functions the scalar path called with length-1 arrays, and numpy ufuncs are
# per-element deterministic — so results are bitwise-identical by
# construction (asserted against the scalar path in tests).


def _estimate_inputs(face, origin_id, resolution):
    """Per-row math.* prefix of _face_to_estimate: returns
    (segment, orientation, quintant, i, j) — the curve descent itself is done
    in one batch later."""
    gamma = math.atan2(face[1], face[0])
    quintant = (round(gamma / TWO_PI_OVER_5) + 5) % 5
    seg, orient = quintant_to_segment(np.array([quintant]), np.array([origin_id]))
    fx, fy = face
    if quintant != 0:
        extra = 2 * PI_OVER_5 * quintant
        c = math.cos(-extra)
        s = math.sin(-extra)
        fx, fy = c * face[0] - s * face[1], s * face[0] + c * face[1]
    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION
    sf = float(2 ** hres)
    fx *= sf
    fy *= sf
    i = BASIS_INV[0, 0] * fx + BASIS_INV[0, 1] * fy
    j = BASIS_INV[1, 0] * fx + BASIS_INV[1, 1] * fy
    return int(seg[0]), int(orient[0]), quintant, i, j


def _margins_batch(face_xy, hres, quintant, x, y, flavor):
    """Batch twin of _cell_margin's edge loop: d = min(1.0, min over
    negative-cross edges of cross/|p|). Same IEEE ops, order-independent."""
    verts = pentagon_vertices(
        np.full(x.shape, hres, dtype=np.int64), quintant, x, y, flavor
    )
    v2 = np.roll(verts, -1, axis=1)
    dx = verts[..., 0] - v2[..., 0]
    dy = verts[..., 1] - v2[..., 1]
    px = face_xy[:, None, 0] - verts[..., 0]
    py = face_xy[:, None, 1] - verts[..., 1]
    cross = dx * py - dy * px
    with np.errstate(divide="ignore", invalid="ignore"):
        contrib = np.where(
            cross < 0, cross / np.sqrt(px * px + py * py), np.inf
        )
    return np.minimum(1.0, contrib.min(axis=1))


# scalar-libm transcendental loops: every sin/cos/tan/acos/atan2 still goes
# through CPython math.* (the bitwise-parity requirement); only the
# SURROUNDING pure-float arithmetic is vectorized — IEEE +,-,*,/,sqrt,floor,
# rint are correctly rounded and therefore bit-identical in numpy and math.

def _m_atan2(y, x):
    return np.array(
        list(map(math.atan2, y.ravel().tolist(), x.ravel().tolist()))
    ).reshape(y.shape)


def _m_unary(arr, f):
    return np.array(list(map(f, arr.ravel().tolist()))).reshape(arr.shape)


def _tquat_batch(vx, vy, vz, q):
    """Vector rotate-by-quaternion, op-for-op the scalar _tquat (pure
    arithmetic -> bitwise identical). q: (m, 4); v components broadcastable."""
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    uvx = qy * vz - qz * vy
    uvy = qz * vx - qx * vz
    uvz = qx * vy - qy * vx
    uuvx = qy * uvz - qz * uvy
    uuvy = qz * uvx - qx * uvz
    uuvz = qx * uvy - qy * uvx
    w2 = qw * 2
    return vx + uvx * w2 + uuvx * 2, vy + uvy * w2 + uuvy * 2, vz + uvz * w2 + uuvz * 2


def _nearest_origin_cartesian_batch(carts):
    """argmin over the 12 origin axes; strict-< scan == first-occurrence
    argmin, per-origin dot product in the scalar's left-to-right order."""
    m = carts.shape[0]
    d = np.empty((m, 12))
    for i in range(12):
        ax = ORIGIN_AXIS_CART[i]
        d[:, i] = 1.0 - (carts[:, 0] * ax[0] + carts[:, 1] * ax[1] + carts[:, 2] * ax[2])
    return np.argmin(d, axis=1)


def _dodec_forward_batch(carts, origin_ids):
    """Batch twin of _dodec_forward (scalar dodecahedron.py:49-74): math.*
    transcendentals element-wise, everything else exact IEEE vector ops."""
    q = ORIGIN_INV_QUAT[origin_ids]
    rx, ry, rz = _tquat_batch(carts[:, 0], carts[:, 1], carts[:, 2], q)
    theta = _m_atan2(ry, rx)
    r = np.sqrt(rx**2 + ry**2 + rz**2)
    phi = _m_unary(rz / r, math.acos)
    rho = _m_unary(phi, math.tan)
    gamma = theta - ORIGIN_ANGLE[origin_ids]

    tri_idx = (np.floor(gamma / PI_OVER_5).astype(np.int64) + 10) % 10
    segment = gamma / TWO_PI_OVER_5
    beta = (segment - np.rint(segment)) * TWO_PI_OVER_5
    reflect = (rho * _m_unary(beta, math.cos) > DISTANCE_TO_EDGE).astype(np.int64)

    ABC = SPH_TRI[origin_ids, tri_idx, reflect]  # (m, 3, 3)
    P123 = FACE_TRI[tri_idx, reflect]  # (m, 3, 2)
    A0, A1, A2 = ABC[:, 0, 0], ABC[:, 0, 1], ABC[:, 0, 2]
    B0, B1, B2 = ABC[:, 1, 0], ABC[:, 1, 1], ABC[:, 1, 2]
    C0, C1, C2 = ABC[:, 2, 0], ABC[:, 2, 1], ABC[:, 2, 2]
    cx, cy, cz = carts[:, 0], carts[:, 1], carts[:, 2]

    bxc0 = B1 * C2 - B2 * C1
    bxc1 = B2 * C0 - B0 * C2
    bxc2 = B0 * C1 - B1 * C0
    volume_vbc = cx * bxc0 + cy * bxc1 + cz * bxc2
    P0 = cx * EA_VOLUME_ABC - A0 * volume_vbc
    P1 = cy * EA_VOLUME_ABC - A1 * volume_vbc
    P2 = cz * EA_VOLUME_ABC - A2 * volume_vbc
    D = np.sqrt(P0**2 + P1**2 + P2**2)
    with np.errstate(divide="ignore"):
        ooD = np.where(D > 0, 1.0 / D, 1.0)
    P0, P1, P2 = P0 * ooD, P1 * ooD, P2 * ooD

    # _sta(A, B, P) with the scalar's exact expression order
    norm = (
        1.0
        + (A0 * B0 + A1 * B1 + A2 * B2)
        + (B0 * P0 + B1 * P1 + B2 * P2)
        + (P0 * A0 + P1 * A1 + P2 * A2)
    )
    tp = (
        A0 * (B1 * P2 - B2 * P1)
        + A1 * (B2 * P0 - B0 * P2)
        + A2 * (B0 * P1 - B1 * P0)
    )
    sta = 2.0 * _m_atan2(tp, norm)
    area_abp = np.where(sta > 0.0, sta, 0.0)  # == max(0.0, sta), NaN -> 0.0
    alpha = area_abp / EA_AREA_ABC
    AdotP = A0 * P0 + A1 * P1 + A2 * P2
    AdotV = A0 * cx + A1 * cy + A2 * cz
    rho2 = (D / EA_VOLUME_ABC) * np.sqrt((1.0 + AdotP) / (1.0 + AdotV))
    b0 = 1.0 - rho2
    b1 = rho2 * (1.0 - alpha)
    b2 = rho2 * alpha
    fx = b0 * P123[:, 0, 0] + b1 * P123[:, 1, 0] + b2 * P123[:, 2, 0]
    fy = b0 * P123[:, 0, 1] + b1 * P123[:, 1, 1] + b2 * P123[:, 2, 1]
    return fx, fy


# cos/sin(-2*PI_OVER_5*q) for q = 0..4, computed with the scalar's exact
# math.* calls (same literal inputs -> same libm outputs)
_COS_NEG_EXTRA = np.array(
    [math.cos(-(2 * PI_OVER_5 * q)) for q in range(5)]
)
_SIN_NEG_EXTRA = np.array(
    [math.sin(-(2 * PI_OVER_5 * q)) for q in range(5)]
)


def _estimate_inputs_batch(fx, fy, origin_ids, resolution):
    """Batch twin of _estimate_inputs: per-element math.atan2, table-driven
    quintant rotation (only 5 distinct angles), batched segment lookup."""
    gamma = _m_atan2(fy, fx)
    quintant = (np.rint(gamma / TWO_PI_OVER_5).astype(np.int64) + 5) % 5
    seg, orient = quintant_to_segment(quintant, origin_ids)
    c = _COS_NEG_EXTRA[quintant]
    s = _SIN_NEG_EXTRA[quintant]
    rot_x = c * fx - s * fy
    rot_y = s * fx + c * fy
    nz = quintant != 0  # scalar path rotates only when quintant != 0
    fx = np.where(nz, rot_x, fx)
    fy = np.where(nz, rot_y, fy)
    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION
    sf = float(2**hres)
    fx = fx * sf
    fy = fy * sf
    i = BASIS_INV[0, 0] * fx + BASIS_INV[0, 1] * fy
    j = BASIS_INV[1, 0] * fx + BASIS_INV[1, 1] * fy
    return seg, orient, quintant, i, j


def _from_lonlat_batch(lon, lat):
    """Batch twin of _from_lonlat: math.sin/cos element-wise, the authalic
    Clenshaw chain as exact IEEE vector algebra."""
    theta = (lon + LONGITUDE_OFFSET_DEG) * DEG2RAD
    phi_in = lat * DEG2RAD
    sin_phi = _m_unary(phi_in, math.sin)
    cos_phi = _m_unary(phi_in, math.cos)
    X = 2.0 * (cos_phi - sin_phi) * (cos_phi + sin_phi)
    C = _GEODETIC_TO_AUTHALIC
    u0 = X * C[5] + C[4]
    u1 = X * u0 + C[3]
    u0 = X * u1 - u0 + C[2]
    u1 = X * u0 - u1 + C[1]
    u0 = X * u1 - u0 + C[0]
    authalic = phi_in + 2.0 * sin_phi * cos_phi * u0
    return theta, math.pi / 2 - authalic


def _to_cartesian_batch(theta, phi):
    sp = _m_unary(phi, math.sin)
    out = np.empty((theta.size, 3))
    out[:, 0] = sp * _m_unary(theta, math.cos)
    out[:, 1] = sp * _m_unary(theta, math.sin)
    out[:, 2] = _m_unary(phi, math.cos)
    return out


def _nearest_origin_spherical_batch(theta, phi):
    """Batch twin of _nearest_origin_spherical: per-origin math.sin loops,
    strict-< scan == first-occurrence argmin."""
    n = theta.size
    sphi = _m_unary(phi, math.sin)  # math.sin(phi) recomputed per origin in
    # the scalar loop — same input, same libm result, so hoisting is exact
    d = np.empty((n, 12))
    for i in range(12):
        th2, ph2 = ORIGIN_AXIS_SPH[i]
        a1 = _m_unary((ph2 - phi) / 2, math.sin)
        a2 = _m_unary((th2 - theta) / 2, math.sin)
        d[:, i] = a1 * a1 + a2 * a2 * sphi * math.sin(ph2)
    return np.argmin(d, axis=1)


def _spiral_quat_batch(carts):
    """Batch twin of the pole->point spiral quaternion (gl-matrix
    rotation_to): generic normalized form, pole rows patched by mask."""
    dot = carts[:, 2]
    qx = -carts[:, 1]
    qy = carts[:, 0]
    qw = 1.0 + dot
    with np.errstate(divide="ignore", invalid="ignore"):
        ln = np.sqrt(qx * qx + qy * qy + 0.0 + qw * qw)
        inv = 1.0 / ln
    q = np.empty((carts.shape[0], 4))
    q[:, 0] = qx * inv
    q[:, 1] = qy * inv
    q[:, 2] = 0.0
    q[:, 3] = qw * inv
    south = dot < -0.999999
    north = dot > 0.999999
    q[south] = (0.0, -math.sin(math.pi / 2), 0.0, math.cos(math.pi / 2))
    q[north] = (0.0, 0.0, 0.0, 1.0)
    return q


def spiral_search_batch(rows, resolution, lonlat=None, theta_phi=None):
    """Reference-order spiral search for a batch of rows.

    rows: list of row indices (for error messages only); geodetic inputs come
    from `lonlat` (lon_arr, lat_arr — full reference chain) or `theta_phi`.
    Returns uint64 keys, one per row.

    Decision-for-decision identical to spherical_to_cell_scalar: stage 1
    batches the estimate candidate for every row and EARLY-ACCEPTS positive
    margins (the scalar path's first return, the common case); only residual
    rows pay the 24-sample spiral. All pure-float algebra is exact IEEE
    vector math; every transcendental still goes through math.* element-wise
    (bitwise parity asserted by test_spiral_batch_matches_scalar)."""
    n = len(rows)
    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION

    # --- stage 0: batched geodetic prefix
    if lonlat is not None:
        theta, phi = _from_lonlat_batch(
            np.asarray(lonlat[0], dtype=np.float64),
            np.asarray(lonlat[1], dtype=np.float64),
        )
    else:
        theta = np.asarray(theta_phi[0], dtype=np.float64)
        phi = np.asarray(theta_phi[1], dtype=np.float64)
    carts = _to_cartesian_batch(theta, phi)
    oid0 = _nearest_origin_spherical_batch(theta, phi)

    # --- stage 1: estimate candidate per row, early-accept positive margins
    fx0, fy0 = _dodec_forward_batch(carts, oid0)
    seg0, orient0, quint0, i0, j0 = _estimate_inputs_batch(
        fx0, fy0, oid0, resolution
    )
    S0 = ij_to_s(i0, j0, hres, orient0)
    keys0 = serialize(oid0, seg0, S0, resolution)
    x0, y0, z0, fl0 = s_to_cell(S0, hres, orient0)
    m0 = _margins_batch(
        np.stack([fx0, fy0], axis=1), hres, quint0, x0, y0, fl0
    )
    out = np.zeros(n, dtype=np.uint64)
    done = m0 > 0
    out[done] = keys0[done]
    resid = np.where(~done)[0]
    if resid.size == 0:
        return out

    # --- stage 2: spiral samples for residual rows, in CHUNKS — nearly all
    # residual rows accept within the first few samples, so each chunk
    # resolves most of its rows and the next chunk's batch shrinks (the
    # reference's sample order and dedup/margin decisions are preserved
    # exactly; persistent per-row seen/cells state carries across chunks)
    scale = _SPIRAL_SCALE_RAD / (2 ** hres)
    dirs = np.asarray(_DIRS)
    R = (
        np.arange(1, SPIRAL_SAMPLE_COUNT + 1) / (SPIRAL_SAMPLE_COUNT + 1)
    ) * scale
    seen_map = {}
    cells_map = {}
    for g, k0, mm in zip(resid, keys0[resid], m0[resid]):
        seen_map[int(g)] = {int(k0)}
        cells_map[int(g)] = [(int(k0), float(mm))]
    active = resid.copy()
    _CHUNK = 6
    for c0 in range(0, SPIRAL_SAMPLE_COUNT, _CHUNK):
        if active.size == 0:
            break
        c1 = min(c0 + _CHUNK, SPIRAL_SAMPLE_COUNT)
        ch = c1 - c0
        carts_a = carts[active]
        qts = _spiral_quat_batch(carts_a)
        dx, dy, dz = _tquat_batch(
            dirs[None, c0:c1, 0],
            dirs[None, c0:c1, 1],
            dirs[None, c0:c1, 2],
            qts[:, None, :],
        )
        samp = np.empty((active.size, ch, 3))
        samp[:, :, 0] = carts_a[:, 0:1] + dx * R[c0:c1]
        samp[:, :, 1] = carts_a[:, 1:2] + dy * R[c0:c1]
        samp[:, :, 2] = carts_a[:, 2:3] + dz * R[c0:c1]
        flat_samp = samp.reshape(-1, 3)
        s_orig = _nearest_origin_cartesian_batch(flat_samp)
        sfx, sfy = _dodec_forward_batch(flat_samp, s_orig)
        s_seg, s_orient, s_quint, s_i, s_j = _estimate_inputs_batch(
            sfx, sfy, s_orig, resolution
        )
        Ss = ij_to_s(s_i, s_j, hres, s_orient)
        keys_c = serialize(s_orig, s_seg, Ss, resolution).reshape(
            active.size, ch
        )
        xs, ys, zs, fls = s_to_cell(Ss, hres, s_orient)
        # margin of the ORIGINAL point vs each sample pentagon, in the sample
        # origin's frame (recomputation is deterministic — no cache needed)
        mfx, mfy = _dodec_forward_batch(np.repeat(carts_a, ch, axis=0), s_orig)
        margins_c = _margins_batch(
            np.stack([mfx, mfy], axis=1), hres, s_quint, xs, ys, fls
        ).reshape(active.size, ch)

        next_active = []
        for idx in range(active.size):
            g = int(active[idx])
            seen = seen_map[g]
            cells = cells_map[g]
            answer = None
            for j in range(ch):
                key = int(keys_c[idx, j])
                if key in seen:
                    continue
                seen.add(key)
                mj = float(margins_c[idx, j])
                if mj > 0:
                    answer = key
                    break
                cells.append((key, mj))
            if answer is not None:
                out[g] = np.uint64(answer)
                del seen_map[g], cells_map[g]
            else:
                next_active.append(g)
        active = np.array(next_active, dtype=np.int64)

    if active.size == 0:
        return out

    # rows exhausting all samples enter the neighbor stage (phase D)
    resid = active
    carts_r = carts[active]
    pending = []
    for i_l, g in enumerate(active):
        cells = cells_map[int(g)]
        cells.sort(key=lambda kv: kv[1], reverse=True)
        pending.append((i_l, seen_map[int(g)], cells))

    # --- phase D: neighbors of the best three candidates, batched per res
    nb_keys_per_row = []
    all_nb = []
    for r, seen, cells in pending:
        per = []
        for k in range(min(3, len(cells))):
            per.append(cells[k][0])
        nb_keys_per_row.append(per)
        all_nb.extend(per)
    # neighbor sets per candidate key (grouped by key resolution)
    from .neighbors import cell_neighbors_batch

    uniq = np.unique(np.array(all_nb, dtype=np.uint64))
    key_res = deserialize(uniq)[3]
    nb_map = {}
    for rr in np.unique(key_res):
        grp = uniq[key_res == rr]
        if rr >= FIRST_HILBERT_RESOLUTION:
            rows_idx, nbrs = cell_neighbors_batch(grp)
            bounds = np.searchsorted(rows_idx, np.arange(grp.size + 1))
            for gi in range(grp.size):
                nb_map[int(grp[gi])] = [
                    int(v) for v in nbrs[bounds[gi] : bounds[gi + 1]]
                ]
        else:
            from .neighbors import global_cell_neighbors_scalar

            for c in grp:
                nb_map[int(c)] = [int(v) for v in global_cell_neighbors_scalar(int(c))]

    # margins for every (row, neighbor key) needed, batched by key resolution
    flat_rows = []
    flat_keys = []
    for (r, seen, cells), per in zip(pending, nb_keys_per_row):
        for k_key in per:
            for nb in nb_map[k_key]:
                if nb not in seen:
                    flat_rows.append(r)
                    flat_keys.append(nb)
    nb_margin = {}
    if flat_keys:
        fk = np.array(flat_keys, dtype=np.uint64)
        fr = np.array(flat_rows, dtype=np.int64)
        o2, seg2, S2, res2 = deserialize(fk)
        q2, orient2 = _seg_to_quint_batch(seg2, o2)
        for rr in np.unique(res2):
            m = res2 == rr
            hr2 = int(rr) - FIRST_HILBERT_RESOLUTION + 1
            x2, y2, z2, fl2 = s_to_cell(S2[m], hr2, orient2[m])
            nfx, nfy = _dodec_forward_batch(carts_r[fr[m]], o2[m])
            fxy = np.stack([nfx, nfy], axis=1)
            mg = _margins_batch(fxy, hr2, q2[m], x2, y2, fl2)
            for ii, idx in enumerate(np.where(m)[0]):
                nb_margin[(int(fr[idx]), int(fk[idx]))] = float(mg[ii])

    for (r, seen, cells), per in zip(pending, nb_keys_per_row):
        answer = None
        for k_key in per:
            for nb in nb_map[k_key]:
                if nb in seen:
                    continue
                seen.add(nb)
                m = nb_margin[(r, nb)]
                if m > 0:
                    answer = nb
                    break
                cells.append((nb, m))
            if answer is not None:
                break
        if answer is None:
            cells.sort(key=lambda kv: kv[1], reverse=True)
            answer = cells[0][0]
        out[resid[r]] = np.uint64(answer)
    return out


def _seg_to_quint_batch(segments, origins):
    from .origins import segment_to_quintant

    return segment_to_quintant(segments, origins)
