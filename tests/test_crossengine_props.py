"""Property tests (no Spark session) for the cross-engine arithmetic
conventions the oracle parity rests on: quantization rounding, universal-hash
minhash coefficients, adaptive LSH split depth, and floor-division forms."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-10, max_value=10, allow_nan=False, width=32))
def test_np_quantize_matches_duckdb_round(x):
    """_np_quantize (half away from zero) must equal DuckDB's round() for
    any float32 payload value at both scales used by the engine."""
    from a5spark.operators.similarity import _np_quantize

    for scale in (127, 1000):
        got = int(_np_quantize(np.array([x], dtype=np.float64), scale)[0])
        exp = duckdb.sql(
            f"SELECT CAST(round(CAST({x!r} AS DOUBLE) * {scale}) AS BIGINT)"
        ).fetchone()[0]
        assert got == exp, (x, scale, got, exp)


def test_minhash_params_bounds_and_sql_parity():
    """Coefficients in range ([1, P-1], [0, P-1]); the permutation formula
    evaluates identically in numpy int64 and DuckDB for extreme h."""
    from a5spark.operators.dedup import _MH_PRIME, minhash_params

    params = minhash_params(16)
    assert len(set(params)) == 16
    for a, b in params:
        assert 1 <= a < _MH_PRIME and 0 <= b < _MH_PRIME
    hs = [0, 1, _MH_PRIME - 1, 123456789, 2**30]
    for a, b in params[:4]:
        for h in hs:
            got = (a * np.int64(h) + b) % _MH_PRIME
            exp = duckdb.sql(
                f"SELECT (CAST({a} AS BIGINT) * {h} + {b}) % {_MH_PRIME}"
            ).fetchone()[0]
            assert int(got) == exp


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=21, max_value=10**9), st.integers(min_value=20, max_value=100_000))
def test_adaptive_depth_rule_matches_duckdb(n, cap):
    """eb = clamp(length(bin((n-1)//cap)) + margin, floor, ceiling) must be
    the same number in Python and DuckDB for any bucket width/cap."""
    from a5spark.operators.similarity import _EB_HEADROOM, _EB_MARGIN

    if n <= cap:
        return  # only wide buckets split
    floor_, ceil_ = 12, 12 + _EB_HEADROOM
    d = (n - 1) // cap
    py_eb = min(ceil_, max(floor_, d.bit_length() + _EB_MARGIN))
    sql_eb = duckdb.sql(
        f"SELECT LEAST({ceil_}, GREATEST({floor_}, "
        f"CAST(length(bin(({n} - 1) // {cap})) AS INTEGER) + {_EB_MARGIN}))"
    ).fetchone()[0]
    assert py_eb == sql_eb


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**40), max_value=2**40), st.integers(min_value=1, max_value=10**6))
def test_remainder_corrected_floordiv_matches_duckdb(s, c):
    """(s - ((s % c) + c) % c) / c == Python floor division == DuckDB //
    for negative sums too (the Lloyd centroid mean)."""
    rem = ((s % c) + c) % c
    got = (s - rem) // c
    assert got == s // c  # python floor-div ground truth
    exp = duckdb.sql(f"SELECT ({s} - ((({s} % {c}) + {c}) % {c})) // {c}").fetchone()[0]
    assert got == exp
