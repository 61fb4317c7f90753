"""Traversal, compaction and polyfill parity tests vs the reference fixtures
and (where no fixture exists) the reference library itself."""

import json
import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, fixture_path, reference_available

from a5spark.kernels import cell as kcell
from a5spark.kernels import compact as kcompact
from a5spark.kernels import neighbors as knbr
from a5spark.kernels import polyfill as kpoly
from a5spark.kernels import traversal as ktrav

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference fixtures not available"
)


def _load(*parts):
    with open(fixture_path(*parts)) as f:
        return json.load(f)


def _ref():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import a5

    return a5


def _random_cells(n, res, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(-1, 1, n)
    t = rng.uniform(0, 2 * np.pi, n)
    lat = np.degrees(np.arcsin(u))
    lon = np.degrees(t) - 180
    return kcell.lonlat_to_cell(lon, lat, res)


@needs_ref
def test_neighbors_parity():
    a5 = _ref()
    for res in (2, 5, 9):
        cells = _random_cells(100, res, seed=res)
        for eo in (False, True):
            rows, nbrs = knbr.cell_neighbors_batch(cells, eo)
            for i in range(len(cells)):
                mine = [int(v) for v in nbrs[rows == i]]
                ref = a5.get_cell_neighbors(int(cells[i]), edge_only=eo) if False else None
                from a5.traversal.global_neighbors import get_global_cell_neighbors

                assert mine == get_global_cell_neighbors(int(cells[i]), edge_only=eo)


@needs_ref
def test_grid_disk_parity():
    from a5.traversal.grid_disk import grid_disk, grid_disk_vertex

    _ref()
    cells = _random_cells(10, 9, seed=3)
    for k in (1, 3, 5):
        rows, out = ktrav.grid_disk_batch(cells, k, edge_only=True)
        for i in range(len(cells)):
            assert [int(v) for v in out[rows == i]] == grid_disk(int(cells[i]), k)
    rows, out = ktrav.grid_disk_batch(cells, 2, edge_only=False)
    for i in range(len(cells)):
        assert [int(v) for v in out[rows == i]] == grid_disk_vertex(int(cells[i]), 2)


@needs_ref
def test_spherical_cap_parity():
    from a5.traversal.cap import spherical_cap

    _ref()
    cells = _random_cells(5, 9, seed=5)
    for radius in (10_000.0, 100_000.0):
        rows, out = ktrav.spherical_cap_batch(cells, radius)
        for i in range(len(cells)):
            assert [int(v) for v in out[rows == i]] == spherical_cap(int(cells[i]), radius)


@needs_ref
def test_compact_fixture():
    fix = _load("fixtures", "compact.json")
    from a5.core.compact import compact as ref_compact

    _ref()
    for case in fix["compact"]:
        inp = [int(h, 16) for h in case["input"]]
        got = [int(v) for v in kcompact.compact(np.array(inp, dtype=np.uint64))]
        assert got == ref_compact(inp), case["name"]
    for case in fix["uncompact"]:
        inp = np.array([int(h, 16) for h in case["input"]], dtype=np.uint64)
        if case["name"] == "uncompact_to_lower_resolution":
            with pytest.raises(ValueError):
                kcompact.uncompact(inp, case["targetResolution"])
            continue
        got = kcompact.uncompact(inp, case["targetResolution"])
        assert got.shape[0] == case["expectedCount"], case["name"]


@needs_ref
def test_polygon_fixture():
    fix = _load("regions", "fixtures", "polygon.json")
    from a5.core.compact import uncompact as ref_uncompact

    _ref()
    for case in fix["polygon"]:
        got = kpoly.polygon_to_cells(case["polygon"], case["resolution"])
        gu = sorted(int(v) for v in kcompact.uncompact(got, case["resolution"]))
        exp = sorted(
            ref_uncompact([int(h, 16) for h in case["cells"]], case["resolution"])
        )
        assert gu == exp, case["name"]
    for case in fix["country"]:
        got = kpoly.polygon_to_cells(case["polygon"], case["resolution"])
        n = len(set(int(v) for v in kcompact.uncompact(got, case["resolution"])))
        assert n == case["cellCount"], case["name"]


@needs_ref
def test_line_fixture_and_oracle():
    from a5spark.kernels.line import line_string_to_cells

    fix = _load("traversal", "fixtures", "line.json")
    _ref()
    from a5.traversal.line import line_string_to_cells as ref_line

    for case in fix["lineSegment"]:
        got = sorted(
            int(v)
            for v in line_string_to_cells([case["start"], case["end"]], case["resolution"])
        )
        assert got == sorted(int(h, 16) for h in case["cells"]), case["name"]
    # order parity against the live reference
    wp = [(-0.1276, 51.5074), (2.3522, 48.8566)]  # London -> Paris
    got = [int(v) for v in line_string_to_cells(wp, 7)]
    assert got == ref_line(wp, 7)
