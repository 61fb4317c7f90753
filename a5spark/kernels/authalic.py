"""Vectorized geodetic <-> authalic latitude conversion.

Order-6 Clenshaw summation with the published series coefficients from
arXiv:2212.05818 (same source as reference /root/reference/a5/projections/authalic.py:13-29).
Operates on numpy float64 arrays; bitwise-identical operation order to the
reference's scalar Clenshaw loop so results match exactly.
"""

import numpy as np

_GEODETIC_TO_AUTHALIC = (
    -2.2392098386786394e-03,
    2.1308606513250217e-06,
    -2.5592576864212742e-09,
    3.3701965267802837e-12,
    -4.6675453126112487e-15,
    6.6749287038481596e-18,
)

_AUTHALIC_TO_GEODETIC = (
    2.2392089963541657e-03,
    2.8831978048607556e-06,
    5.0862207399726603e-09,
    1.0201812377816100e-11,
    2.1912872306767718e-14,
    4.9284235482523806e-17,
)


def _clenshaw(phi: np.ndarray, C) -> np.ndarray:
    sin_phi = np.sin(phi)
    cos_phi = np.cos(phi)
    X = 2.0 * (cos_phi - sin_phi) * (cos_phi + sin_phi)

    u0 = X * C[5] + C[4]
    u1 = X * u0 + C[3]
    u0 = X * u1 - u0 + C[2]
    u1 = X * u0 - u1 + C[1]
    u0 = X * u1 - u0 + C[0]

    return phi + 2.0 * sin_phi * cos_phi * u0


def geodetic_to_authalic(phi: np.ndarray) -> np.ndarray:
    """Geodetic latitude (radians) -> authalic latitude (radians)."""
    return _clenshaw(phi, _GEODETIC_TO_AUTHALIC)


def authalic_to_geodetic(phi: np.ndarray) -> np.ndarray:
    """Authalic latitude (radians) -> geodetic latitude (radians)."""
    return _clenshaw(phi, _AUTHALIC_TO_GEODETIC)
