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


def spiral_search_batch(rows, resolution, lonlat=None, theta_phi=None):
    """Reference-order spiral search for a batch of rows.

    rows: list of row indices (for error messages only); geodetic inputs come
    from `lonlat` (lon_arr, lat_arr — full reference chain) or `theta_phi`.
    Returns uint64 keys, one per row."""
    n = len(rows)
    hres = 1 + resolution - FIRST_HILBERT_RESOLUTION

    # --- phase A: per-row math.* geometry, collecting candidate curve inputs
    K = SPIRAL_SAMPLE_COUNT + 1  # estimate + spiral samples
    c_orig = np.zeros((n, K), dtype=np.int64)
    c_seg = np.zeros((n, K), dtype=np.int64)
    c_orient = np.zeros((n, K), dtype=np.int64)
    c_quint = np.zeros((n, K), dtype=np.int64)
    c_i = np.zeros((n, K))
    c_j = np.zeros((n, K))
    carts = []
    face_cache = []  # per row: {origin_id: (fx, fy)} of the ORIGINAL point
    for r in range(n):
        if lonlat is not None:
            theta, phi = _from_lonlat(float(lonlat[0][r]), float(lonlat[1][r]))
        else:
            theta, phi = float(theta_phi[0][r]), float(theta_phi[1][r])
        cart = _to_cartesian(theta, phi)
        carts.append(cart)
        cache = {}
        face_cache.append(cache)
        oid = _nearest_origin_spherical(theta, phi)
        face = _dodec_forward(cart, oid)
        cache[oid] = face
        seg, orient, q, i, j = _estimate_inputs(face, oid, resolution)
        c_orig[r, 0], c_seg[r, 0], c_orient[r, 0], c_quint[r, 0] = oid, seg, orient, q
        c_i[r, 0], c_j[r, 0] = i, j

        # spiral quaternion (pole -> point)
        dot = cart[2]
        if dot < -0.999999:
            qt = (0.0, -math.sin(math.pi / 2), 0.0, math.cos(math.pi / 2))
        elif dot > 0.999999:
            qt = (0.0, 0.0, 0.0, 1.0)
        else:
            qx, qy, qz, qw = -cart[1], cart[0], 0.0, 1.0 + dot
            ln = math.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
            inv = 1.0 / ln
            qt = (qx * inv, qy * inv, qz * inv, qw * inv)
        scale = _SPIRAL_SCALE_RAD / (2 ** hres)
        for si in range(SPIRAL_SAMPLE_COUNT):
            d = _tquat(_DIRS[si], qt)
            R = ((si + 1) / (SPIRAL_SAMPLE_COUNT + 1)) * scale
            sample = (cart[0] + d[0] * R, cart[1] + d[1] * R, cart[2] + d[2] * R)
            s_oid = _nearest_origin_cartesian(sample)
            s_face = _dodec_forward(sample, s_oid)
            seg2, orient2, q2, i2, j2 = _estimate_inputs(s_face, s_oid, resolution)
            col = si + 1
            c_orig[r, col], c_seg[r, col] = s_oid, seg2
            c_orient[r, col], c_quint[r, col] = orient2, q2
            c_i[r, col], c_j[r, col] = i2, j2

    # --- phase B: one batched curve/serialize/margin pass over N*K candidates
    flat_orient = c_orient.ravel()
    S = ij_to_s(c_i.ravel(), c_j.ravel(), hres, flat_orient)
    keys = serialize(c_orig.ravel(), c_seg.ravel(), S, resolution).reshape(n, K)
    x, y, z, flavor = s_to_cell(S, hres, flat_orient)
    # margin of the ORIGINAL point vs each candidate pentagon, in the
    # candidate origin's face frame (math.* per distinct (row, origin))
    face_xy = np.zeros((n * K, 2))
    flat_orig = c_orig.ravel()
    for r in range(n):
        cache = face_cache[r]
        for col in range(K):
            oid = int(flat_orig[r * K + col])
            f = cache.get(oid)
            if f is None:
                f = _dodec_forward(carts[r], oid)
                cache[oid] = f
            face_xy[r * K + col] = f
    margins = _margins_batch(
        face_xy, hres, c_quint.ravel(), x, y, flavor
    ).reshape(n, K)

    # --- phase C: per-row reference-order sequencing over precomputed values
    out = np.zeros(n, dtype=np.uint64)
    pending = []  # rows entering the neighbor stage: (r, [(key, margin)...])
    for r in range(n):
        seen = set()
        cells = []
        answer = None
        for col in range(K):
            key = int(keys[r, col])
            if key in seen:
                continue
            seen.add(key)
            m = float(margins[r, col])
            if m > 0:
                answer = key
                break
            cells.append((key, m))
        if answer is not None:
            out[r] = np.uint64(answer)
        else:
            cells.sort(key=lambda kv: kv[1], reverse=True)
            pending.append((r, seen, cells))

    if not pending:
        return out

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
            fxy = np.zeros((int(m.sum()), 2))
            for ii, (r_i, o_i) in enumerate(zip(fr[m], o2[m])):
                cache = face_cache[int(r_i)]
                f = cache.get(int(o_i))
                if f is None:
                    f = _dodec_forward(carts[int(r_i)], int(o_i))
                    cache[int(o_i)] = f
                fxy[ii] = f
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
        out[r] = np.uint64(answer)
    return out


def _seg_to_quint_batch(segments, origins):
    from .origins import segment_to_quintant

    return segment_to_quintant(segments, origins)
