"""New-curve (L-system) parity vs the live reference library: forward
s -> triple, exact inverse triple -> s, and the fractional ij_to_s variant
(reference a5/lattice/curve.py:14-20) across all six orientations."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference library not present"
)

ORIENTS = ["uv", "vu", "uw", "wu", "vw", "wv"]


def _ref():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import a5.lattice.curve as ref_curve
    import a5.lattice.lsystem as ref_ls

    return ref_curve, ref_ls


def test_forward_s_to_triple_matches_reference():
    _, ref_ls = _ref()
    from a5spark.kernels.lsystem import s_to_triple

    for res in (1, 2, 3, 4):
        for orient in ORIENTS:
            for s in range(1 << (2 * res)):
                want = tuple(ref_ls.s_to_triple(s, res, orient))
                got = s_to_triple(s, res, orient)
                assert got == want, (res, orient, s)


def test_exact_inverse_round_trips_full_range():
    _, ref_ls = _ref()
    from a5spark.kernels.lsystem import s_to_triple, triple_to_s_lattice

    for res in (1, 2, 3, 5):
        for orient in ORIENTS:
            n = 1 << (2 * res)
            step = max(1, n // 256)
            for s in range(0, n, step):
                t = s_to_triple(s, res, orient)
                assert triple_to_s_lattice(*t, res, orient) == s
                # and parity with the reference inverse
                want = ref_ls.triple_to_s_lattice(t, res, orient)
                assert want == s


def test_fractional_ij_to_s_matches_reference():
    ref_curve, _ = _ref()
    from a5spark.kernels.lsystem import ij_to_s_lsystem

    rng = np.random.default_rng(11)
    for res in (1, 2, 4, 6, 8):
        span = float(1 << res)
        i = rng.uniform(0.0, span, 300)
        j = rng.uniform(0.0, span - 1e-9, 300)
        # keep points inside the quintant triangle region the curve covers
        m = (i + j) < span
        i, j = i[m], j[m]
        for orient in ORIENTS:
            got = ij_to_s_lsystem(i, j, res, orient)
            want = np.array(
                [ref_curve.ij_to_s((float(a), float(b)), res, orient) for a, b in zip(i, j)],
                dtype=np.uint64,
            )
            assert np.array_equal(got, want), (res, orient)


def test_fractional_centers_agree_with_exact_inverse():
    """A cell center fed through the fractional path lands on that cell."""
    _, ref_ls = _ref()
    from a5spark.kernels.lsystem import s_to_triple, sum_point_to_s
    from a5spark.kernels.lsystem import triple_to_ab

    for res in (2, 4, 6):
        n = 1 << (2 * res)
        for s in range(0, n, max(1, n // 128)):
            t = s_to_triple(s, res, "uv")
            a, b = triple_to_ab(*t)
            # corner sum IS 3x the centroid — feed it as a fractional target
            assert sum_point_to_s(float(a), float(b), res, "uv") == s
