"""Drop-in API parity: a5spark.api mirrors the reference package's public
surface on the same inputs."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

from a5spark import api

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference not available"
)


def _ref():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import a5

    return a5


@needs_ref
def test_api_parity_sample():
    a5 = _ref()
    pts = [(-0.1276, 51.5074), (139.76, 35.68), (-73.98, 40.75), (151.2, -33.87)]
    for lonlat in pts:
        for res in (3, 9, 15):
            c = api.lonlat_to_cell(lonlat, res)
            assert c == a5.lonlat_to_cell(lonlat, res)
            assert api.cell_to_lonlat(c) == pytest.approx(
                a5.cell_to_lonlat(c), abs=1e-10
            )
            ref_b = a5.cell_to_boundary(c)
            got_b = api.cell_to_boundary(c)
            assert np.allclose(got_b, ref_b, atol=1e-10)
            assert api.get_resolution(c) == res
            assert api.cell_to_parent(c, max(0, res - 2)) == a5.cell_to_parent(
                c, max(0, res - 2)
            )
            assert api.cell_to_children(c) == a5.cell_to_children(c)
            from a5.traversal.global_neighbors import get_global_cell_neighbors

            assert api.get_cell_neighbors(c) == get_global_cell_neighbors(c)

    assert api.get_res0_cells() == a5.get_res0_cells()
    for r in (0, 5, 15, 30):
        assert api.get_num_cells(r) == a5.get_num_cells(r)
        assert api.cell_area(r) == pytest.approx(a5.cell_area(r), rel=1e-12)

    c = api.lonlat_to_cell(pts[0], 9)
    assert api.grid_disk(c, 2) == a5.grid_disk(c, 2)
    assert api.spherical_cap(c, 50_000.0) == a5.spherical_cap(c, 50_000.0)
    disk = api.grid_disk(c, 3)
    assert api.compact(disk) == a5.compact(disk)
    assert api.uncompact(api.compact(disk), 9) == a5.uncompact(a5.compact(disk), 9)
    tri = [[-5, -25], [15, -25], [5, -35]]
    assert api.polygon_to_cells([tri], 5) == a5.polygon_to_cells([tri], 5)
    line = [(-0.1276, 51.5074), (2.35, 48.85)]
    assert api.line_string_to_cells(line, 7) == a5.line_string_to_cells(line, 7)
    assert api.u64_to_hex(c) == a5.u64_to_hex(c)
    assert api.hex_to_u64(api.u64_to_hex(c)) == c
