"""Vectorized dodecahedral equal-area projection.

Re-derives the reference projection stack
(/root/reference/a5/projections/{gnomonic,equal_area,dodecahedron,crs}.py)
as numpy table gathers + arithmetic over batches:

 * The CRS (62 exact dodecahedron vertices) and every face / spherical
   triangle the projection can use are materialized eagerly at import
   (the reference builds them lazily per process: dodecahedron.py:128-241).
 * `dodec_forward` / `dodec_inverse` operate on (N,) batches with per-row
   origin ids; triangle selection becomes an integer gather.

Operation order matches the scalar reference exactly (mul-adds written out,
reciprocal-multiply normalization) so outputs are bit-identical.
"""

import math

import numpy as np

from .constants import (
    DISTANCE_TO_EDGE,
    DISTANCE_TO_VERTEX,
    INTERHEDRAL_ANGLE,
    PI_OVER_5,
    TWO_PI_OVER_5,
)
from .origins import ORIGIN_ANGLE, ORIGIN_INV_QUAT, ORIGIN_QUAT
from .pentagon import quintant_triangle
from .transforms import to_cartesian, to_spherical, transform_quat


# ---------------------------------------------------------------------------
# scalar-ish helpers used only at table-build time (op order = reference)
# ---------------------------------------------------------------------------

def _normalize3(v):
    x, y, z = v
    len_sq = x * x + y * y + z * z
    if len_sq > 0:
        inv = 1.0 / math.sqrt(len_sq)
        return (x * inv, y * inv, z * inv)
    return (0.0, 0.0, 0.0)


def _tquat(v, q):
    out = transform_quat(np.array([v], dtype=np.float64), np.array([q], dtype=np.float64))[0]
    return (out[0], out[1], out[2])


def spherical_triangle_area(v1, v2, v3):
    """Van Oosterom-Strackee signed spherical excess
    (reference geometry/spherical_polygon.py:21-38). Works on scalars or
    (N, 3) arrays."""
    v1 = np.asarray(v1)
    v2 = np.asarray(v2)
    v3 = np.asarray(v3)
    norm = (
        1.0
        + (v1[..., 0] * v2[..., 0] + v1[..., 1] * v2[..., 1] + v1[..., 2] * v2[..., 2])
        + (v2[..., 0] * v3[..., 0] + v2[..., 1] * v3[..., 1] + v2[..., 2] * v3[..., 2])
        + (v3[..., 0] * v1[..., 0] + v3[..., 1] * v1[..., 1] + v3[..., 2] * v1[..., 2])
    )
    # triple product a . (b x c) with gl-matrix op order
    cx = v2[..., 1] * v3[..., 2] - v2[..., 2] * v3[..., 1]
    cy = v2[..., 2] * v3[..., 0] - v2[..., 0] * v3[..., 2]
    cz = v2[..., 0] * v3[..., 1] - v2[..., 1] * v3[..., 0]
    triple = v1[..., 0] * cx + v1[..., 1] * cy + v1[..., 2] * cz
    return 2.0 * np.arctan2(triple, norm)


# ---------------------------------------------------------------------------
# CRS: 62 exact vertices (12 centers + 20 corners + 30 midpoints)
# ---------------------------------------------------------------------------

def _build_crs():
    """Construction order and dedup tolerance follow reference crs.py:28-121
    so snapped values are identical."""
    from .origins import ORIGIN_AXIS_SPH

    verts = []

    def add(v):
        n = _normalize3(v)
        for e in verts:
            dx, dy, dz = n[0] - e[0], n[1] - e[1], n[2] - e[2]
            if math.sqrt(dx * dx + dy * dy + dz * dz) < 1e-5:
                return
        verts.append(n)

    for i in range(12):
        th, ph = ORIGIN_AXIS_SPH[i]
        c = to_cartesian(np.array([th]), np.array([ph]))[0]
        add((c[0], c[1], c[2]))

    phi_vertex = math.atan(DISTANCE_TO_VERTEX)
    for i in range(12):
        angle = ORIGIN_ANGLE[i]
        for k in range(5):
            theta = (2 * k + 1) * math.pi / 5 + angle
            c = to_cartesian(np.array([theta]), np.array([phi_vertex]))[0]
            add(_tquat((c[0], c[1], c[2]), ORIGIN_QUAT[i]))

    phi_mid = math.atan(DISTANCE_TO_EDGE)
    for i in range(12):
        angle = ORIGIN_ANGLE[i]
        for k in range(5):
            theta = (2 * k) * math.pi / 5 + angle
            c = to_cartesian(np.array([theta]), np.array([phi_mid]))[0]
            add(_tquat((c[0], c[1], c[2]), ORIGIN_QUAT[i]))

    if len(verts) != 62:
        raise RuntimeError(f"CRS build produced {len(verts)} vertices, expected 62")
    return np.array(verts)


CRS_VERTICES = _build_crs()


def _crs_snap(p):
    """First CRS vertex within 1e-5 (crs.py:63-78)."""
    for v in CRS_VERTICES:
        dx, dy, dz = p[0] - v[0], p[1] - v[1], p[2] - v[2]
        if math.sqrt(dx * dx + dy * dy + dz * dz) < 1e-5:
            return (v[0], v[1], v[2])
    raise ValueError("point does not snap to a CRS vertex")


# ---------------------------------------------------------------------------
# face triangles (10 plain, 10 reflected, 10 squashed-reflected)
# ---------------------------------------------------------------------------

def _face_triangle_plain(idx):
    quintant = int(math.floor((idx + 1) / 2)) % 5
    verts = quintant_triangle(np.array([quintant]))[0]
    v_center, v_corner1, v_corner2 = verts[0], verts[1], verts[2]
    v_mid = (
        v_corner1[0] + 0.5 * (v_corner2[0] - v_corner1[0]),
        v_corner1[1] + 0.5 * (v_corner2[1] - v_corner1[1]),
    )
    even = idx % 2 == 0
    if even:
        return [tuple(v_center), v_mid, tuple(v_corner1)]
    return [tuple(v_center), tuple(v_corner2), v_mid]


def _face_triangle_reflected(idx, squashed):
    A, B, C = _face_triangle_plain(idx)
    even = idx % 2 == 0
    A = (-A[0], -A[1])
    mid = B if even else C
    scale = (1.0 + 1.0 / math.cos(INTERHEDRAL_ANGLE)) if squashed else 2.0
    A = (A[0] + mid[0] * scale, A[1] + mid[1] * scale)
    return [A, C, B]


def _build_face_triangles():
    plain = np.array([_face_triangle_plain(i) for i in range(10)])
    refl = np.array([_face_triangle_reflected(i, False) for i in range(10)])
    refl_sq = np.array([_face_triangle_reflected(i, True) for i in range(10)])
    # FACE_TRI[idx, reflected] -> (3, 2)
    return np.stack([plain, refl], axis=1), refl_sq


FACE_TRI, _FACE_TRI_REFL_SQUASHED = _build_face_triangles()


# ---------------------------------------------------------------------------
# spherical triangles (12 origins x 10 indices x {plain, reflected})
# ---------------------------------------------------------------------------

def _build_spherical_triangles():
    sph = np.zeros((12, 10, 2, 3, 3))
    for origin_id in range(12):
        angle = ORIGIN_ANGLE[origin_id]
        q = ORIGIN_QUAT[origin_id]
        for idx in range(10):
            for refl in range(2):
                face_tri = (
                    _FACE_TRI_REFL_SQUASHED[idx] if refl else FACE_TRI[idx, 0]
                )
                for vi, (fx, fy) in enumerate(face_tri):
                    rho = math.sqrt(fx * fx + fy * fy)
                    gamma = math.atan2(fy, fx) + angle
                    # gnomonic inverse: (rho, gamma) -> (theta=gamma, phi=atan rho)
                    c = to_cartesian(np.array([gamma]), np.array([math.atan(rho)]))[0]
                    p = _tquat((c[0], c[1], c[2]), q)
                    sph[origin_id, idx, refl, vi] = _crs_snap(p)
    return sph


SPH_TRI = _build_spherical_triangles()

# dot(A, B) per spherical triangle, for the inverse's odd-orientation test.
_SPH_TRI_ADOTB = np.einsum("oirk,oirk->oir", SPH_TRI[..., 0, :], SPH_TRI[..., 1, :])


# ---------------------------------------------------------------------------
# equal-area constants from the canonical triangle (crs.py:47-61)
# ---------------------------------------------------------------------------

def _build_ea_constants():
    A = CRS_VERTICES[0]
    B = CRS_VERTICES[32]
    C = CRS_VERTICES[12]
    BxC = np.cross(B, C)
    AdotB = float(A @ B)
    AdotC = float(A @ C)
    BdotC = float(B @ C)
    V = float(A @ BxC)
    P = AdotC + BdotC
    Q = AdotB + 1.0
    R = AdotB * BdotC - AdotC
    F = P * P - Q * Q
    G = 2.0 * Q * R
    alpha_transform = np.array([V * V - F, -G, -2.0 * V * P, 2.0 * V * Q, V * V + F, G])
    # math.atan2 (not np.arctan2) so the constant matches the reference libm
    # bit-for-bit — it feeds every forward/inverse projection.
    norm = (
        1.0
        + (A[0] * B[0] + A[1] * B[1] + A[2] * B[2])
        + (B[0] * C[0] + B[1] * C[1] + B[2] * C[2])
        + (C[0] * A[0] + C[1] * A[1] + C[2] * A[2])
    )
    cx = B[1] * C[2] - B[2] * C[1]
    cy = B[2] * C[0] - B[0] * C[2]
    cz = B[0] * C[1] - B[1] * C[0]
    area = 2.0 * math.atan2(A[0] * cx + A[1] * cy + A[2] * cz, norm)
    return AdotB, AdotC, alpha_transform, area, V


EA_ADOTB, EA_ADOTC, EA_ALPHA_TRANSFORM, EA_AREA_ABC, EA_VOLUME_ABC = _build_ea_constants()

# Precomputed odd flag per spherical triangle (equal_area.py:163-169).
SPH_TRI_ODD = np.abs(_SPH_TRI_ADOTB - EA_ADOTB) > np.abs(_SPH_TRI_ADOTB - EA_ADOTC)


# ---------------------------------------------------------------------------
# vectorized projection kernels
# ---------------------------------------------------------------------------

def _polar_in_origin_frame(cart, origin_id):
    """Rotate into the origin's face frame and project gnomonically.
    Returns (rho, gamma) with the origin's in-face angle removed."""
    rotated = transform_quat(cart, ORIGIN_INV_QUAT[origin_id])
    theta, phi = to_spherical(rotated)
    rho = np.tan(phi)
    gamma = theta - ORIGIN_ANGLE[origin_id]
    return rho, gamma


def _triangle_index(gamma):
    """(floor(gamma / (pi/5)) + 10) % 10 (dodecahedron.py:115-126)."""
    return (np.floor(gamma / PI_OVER_5).astype(np.int64) + 10) % 10


def _should_reflect(rho, gamma):
    """Beyond-face-edge test (dodecahedron.py:97-113, 243-259)."""
    segment = gamma / TWO_PI_OVER_5
    beta = (segment - np.rint(segment)) * TWO_PI_OVER_5
    D = rho * np.cos(beta)
    return D > DISTANCE_TO_EDGE


def equal_area_forward(V, sph_tri, face_tri):
    """Vectorized equal_area.py:103-138. V (N,3); sph_tri (N,3,3);
    face_tri (N,3,2) -> face (N,2)."""
    A = sph_tri[:, 0]
    B = sph_tri[:, 1]
    C = sph_tri[:, 2]

    # BxC with explicit component order
    bx, by, bz = B[:, 0], B[:, 1], B[:, 2]
    cx, cy, cz = C[:, 0], C[:, 1], C[:, 2]
    bxc = np.stack([by * cz - bz * cy, bz * cx - bx * cz, bx * cy - by * cx], axis=-1)

    volume_vbc = V[:, 0] * bxc[:, 0] + V[:, 1] * bxc[:, 1] + V[:, 2] * bxc[:, 2]
    P = V * EA_VOLUME_ABC + A * (-volume_vbc)[:, None]
    D = np.sqrt(P[:, 0] ** 2 + P[:, 1] ** 2 + P[:, 2] ** 2)
    with np.errstate(divide="ignore"):
        ooD = np.where(D > 0, 1.0 / D, 1.0)
    P = P * ooD[:, None]

    area_abp = np.maximum(0.0, spherical_triangle_area(A, B, P))
    alpha = area_abp / EA_AREA_ABC
    AdotP = A[:, 0] * P[:, 0] + A[:, 1] * P[:, 1] + A[:, 2] * P[:, 2]
    AdotV = A[:, 0] * V[:, 0] + A[:, 1] * V[:, 1] + A[:, 2] * V[:, 2]
    rho = (D / EA_VOLUME_ABC) * np.sqrt((1.0 + AdotP) / (1.0 + AdotV))

    b0 = 1.0 - rho
    b1 = rho * (1.0 - alpha)
    b2 = rho * alpha
    p1 = face_tri[:, 0]
    p2 = face_tri[:, 1]
    p3 = face_tri[:, 2]
    return np.stack(
        [
            b0 * p1[:, 0] + b1 * p2[:, 0] + b2 * p3[:, 0],
            b0 * p1[:, 1] + b1 * p2[:, 1] + b2 * p3[:, 1],
        ],
        axis=-1,
    )


def equal_area_inverse(face_point, face_tri, sph_tri, odd):
    """Vectorized equal_area.py:140-198 -> cartesian (N, 3)."""
    A = sph_tri[:, 0]
    B = sph_tri[:, 1]
    C = sph_tri[:, 2]
    p1 = face_tri[:, 0]
    p2 = face_tri[:, 1]
    p3 = face_tri[:, 2]

    d31x = p1[:, 0] - p3[:, 0]
    d31y = p1[:, 1] - p3[:, 1]
    d23x = p3[:, 0] - p2[:, 0]
    d23y = p3[:, 1] - p2[:, 1]
    d3px = face_point[:, 0] - p3[:, 0]
    d3py = face_point[:, 1] - p3[:, 1]
    det = d23x * d31y - d23y * d31x
    b0 = (d23x * d3py - d23y * d3px) / det
    b1 = (d31x * d3py - d31y * d3px) / det
    b2 = 1.0 - (b0 + b1)

    B_n = np.where(odd[:, None], C, B)
    C_n = np.where(odd[:, None], B, C)
    b2n = np.where(odd, b1, b2)

    rho = 1.0 - b0
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = (b2n / rho) * EA_AREA_ABC
    alpha = np.where(rho == 0.0, 0.0, alpha)

    m = EA_ALPHA_TRANSFORM
    cos_a = np.cos(alpha)
    sin_a = np.sin(alpha)
    weight_b = m[0] * cos_a + m[2] * sin_a + m[4]
    weight_c = m[1] * cos_a + m[3] * sin_a + m[5]
    P = B_n * weight_b[:, None] + C_n * weight_c[:, None]
    len_sq = P[:, 0] ** 2 + P[:, 1] ** 2 + P[:, 2] ** 2
    with np.errstate(divide="ignore"):
        inv_len = np.where(len_sq > 0, 1.0 / np.sqrt(len_sq), 0.0)
    P = P * inv_len[:, None]

    s = A[:, 0] * P[:, 0] + A[:, 1] * P[:, 1] + A[:, 2] * P[:, 2]
    t = 1.0 + rho * rho * (s - 1.0)
    weight_p = rho * np.sqrt((1.0 + t) / (1.0 + s))
    weight_a = t - s * weight_p
    out = A * weight_a[:, None] + P * weight_p[:, None]

    # Vertex snap thresholds (equal_area.py:155-161)
    threshold = 1.0 - 1e-14
    out = np.where((b0 > threshold)[:, None], A, out)
    out = np.where((b1 > threshold)[:, None], B, out)
    out = np.where((b2 > threshold)[:, None], C, out)
    return out


def dodec_forward(cart, origin_id):
    """Vectorized dodecahedron.py:49-74: cartesian (N, 3) + origin ids (N,)
    -> face coordinates (N, 2)."""
    rho, gamma = _polar_in_origin_frame(cart, origin_id)
    tri_idx = _triangle_index(gamma)
    reflect = _should_reflect(rho, gamma).astype(np.int64)
    sph_tri = SPH_TRI[origin_id, tri_idx, reflect]
    face_tri = FACE_TRI[tri_idx, reflect]
    return equal_area_forward(cart, sph_tri, face_tri)


def dodec_inverse(face, origin_id):
    """Vectorized dodecahedron.py:76-95: face (N, 2) + origin ids (N,)
    -> (theta, phi)."""
    rho = np.sqrt(face[:, 0] ** 2 + face[:, 1] ** 2)
    gamma = np.arctan2(face[:, 1], face[:, 0])
    tri_idx = _triangle_index(gamma)
    reflect = _should_reflect(rho, gamma).astype(np.int64)
    sph_tri = SPH_TRI[origin_id, tri_idx, reflect]
    face_tri = FACE_TRI[tri_idx, reflect]
    odd = SPH_TRI_ODD[origin_id, tri_idx, reflect]
    cart = equal_area_inverse(face, face_tri, sph_tri, odd)
    return to_spherical(cart)
