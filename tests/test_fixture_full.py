"""Remaining golden-fixture pins: traversal fixtures, origins, tiling,
projection vector fixtures (reference tolerance: abs 1e-13 per
tests/matchers.py:7-19)."""

import json
import math

import numpy as np
import pytest

from tests.conftest import fixture_path, reference_available

from a5spark.kernels import cell as kcell
from a5spark.kernels import neighbors as knbr
from a5spark.kernels import traversal as ktrav

needs_ref = pytest.mark.skipif(
    not reference_available(), reason="reference fixtures not available"
)

CODE = {"uv": 0, "vu": 1, "uw": 2, "wu": 3, "vw": 4, "wv": 5}


def _load(*parts):
    with open(fixture_path(*parts)) as f:
        return json.load(f)


@needs_ref
def test_grid_disk_fixture():
    from a5spark.kernels.compact import uncompact
    from a5spark.kernels.serialization import get_resolution

    for case in _load("traversal", "fixtures", "grid-disk.json"):
        cid = np.array([int(case["cellId"], 16)], dtype=np.uint64)
        res = int(get_resolution(cid)[0])
        if res < 2:
            continue  # res 0/1 disks handled by the scalar path elsewhere
        rows, out = ktrav.grid_disk_batch(cid, case["k"], edge_only=True)
        got = sorted(int(v) for v in uncompact(out, res))
        assert got == sorted(int(h, 16) for h in case["cells"]), case["cellId"]
        rows, outv = ktrav.grid_disk_batch(cid, case["k"], edge_only=False)
        gotv = sorted(int(v) for v in uncompact(outv, res))
        exp = sorted(
            set(
                int(h, 16)
                for h in case["cells"] + case.get("extraVertexCells", [])
            )
        )
        assert gotv == exp


@needs_ref
def test_cap_fixture():
    fix = _load("traversal", "fixtures", "cap.json")
    from a5spark.kernels.compact import uncompact
    from a5spark.kernels.serialization import get_resolution

    for case in fix["sphericalCap"] + fix["sphericalCapCompact"]:
        cid = np.array([int(case["cellId"], 16)], dtype=np.uint64)
        rows, out = ktrav.spherical_cap_batch(cid, float(case["radius"]))
        exp = sorted(
            int(h, 16) for h in case.get("cells", case.get("compactedCells"))
        )
        assert sorted(int(v) for v in out) == exp, case["cellId"]


@needs_ref
def test_neighbor_fixtures():
    from a5spark.kernels.serialization import get_resolution

    for case in _load("traversal", "fixtures", "global-neighbors.json"):
        cid = int(case["input"]["cellId"], 16)
        exp = sorted(int(h, 16) for h in case["output"]["neighbors"])
        got = knbr.global_cell_neighbors_scalar(
            cid, case["input"].get("edgeOnly", False)
        )
        assert sorted(got) == exp, case["input"]

    from a5spark.kernels.curve import s_to_cell, triple_to_s

    for case in _load("traversal", "fixtures", "quintant-neighbors.json"):
        inp = case["input"]
        res = inp["resolution"]
        oc = np.array([CODE[inp["orientation"]]])
        s = np.array([inp["s"]], dtype=np.uint64)
        x, y, z, fl = s_to_cell(s, res, oc)
        deltas = knbr.NEIGHBOR_DELTAS[int(fl[0])]
        eo = inp.get("edgeOnly", False)
        nd = deltas[:5] if eo else deltas
        out = []
        max_row = (1 << res) - 1
        for d in nd:
            tx, ty, tz = int(x[0] + d[0]), int(y[0] + d[1]), int(z[0] + d[2])
            ssum = tx + ty + tz
            if ssum not in (0, 1):
                continue
            lim = ty - ssum
            if not (tx <= 0 and tz <= 0 and 0 <= ty <= max_row and tx >= -lim and tz >= -lim):
                continue
            s2 = int(triple_to_s(np.array([tx]), np.array([ty]), np.array([tz]), res, oc)[0])
            if 0 <= s2 < 4 ** res and s2 != inp["s"]:
                out.append(s2)
        assert sorted(out) == sorted(case["output"]["neighbors"]), inp

    for case in _load("traversal", "fixtures", "lattice-neighbors.json")["cases"]:
        cid = np.array([int(case["cell"], 16)], dtype=np.uint64)
        rows, eo = knbr.cell_neighbors_batch(cid, edge_only=True, lattice=True)
        assert sorted(int(v) for v in eo) == sorted(
            set(int(h, 16) for h in case["edgeOnlyNeighbors"])
        ), case["cell"]
        rows, sup = knbr.cell_neighbors_batch(cid, edge_only=False, lattice=True)
        assert sorted(int(v) for v in sup) == sorted(
            set(int(h, 16) for h in case["supersetNeighbors"])
        ), case["cell"]


@needs_ref
def test_origins_fixture():
    from a5spark.kernels import origins as ko

    names = ["uv", "vu", "uw", "wu", "vw", "wv"]
    for o in _load("core", "fixtures", "origins.json"):
        i = o["id"]
        assert list(ko.ORIGIN_AXIS_SPH[i]) == pytest.approx(o["axis"], abs=1e-15)
        assert list(ko.ORIGIN_QUAT[i]) == pytest.approx(o["quat"], abs=1e-15)
        assert ko.ORIGIN_ANGLE[i] == pytest.approx(o["angle"], abs=1e-15)
        assert ko.ORIGIN_FIRST[i] == o["firstQuintant"]
        assert [names[c] for c in ko.ORIGIN_ORIENT[i]] == o["orientation"]


@needs_ref
def test_tiling_fixture():
    from a5spark.kernels import pentagon as kp

    fix = _load("core", "fixtures", "tiling.json")
    for case in fix["getPentagonVertices"]:
        inp = case["input"]
        verts = kp.pentagon_vertices(
            np.array([inp["resolution"]]),
            np.array([inp["quintant"]]),
            np.array([inp["triple"]["x"]]),
            np.array([inp["triple"]["y"]]),
            np.array([inp["flavor"]]),
        )[0]
        np.testing.assert_allclose(verts, case["output"]["vertices"], atol=1e-13)
    for case in fix["getQuintantVertices"]:
        verts = kp.quintant_triangle(np.array([case["input"]["quintant"]]))[0]
        np.testing.assert_allclose(verts, case["output"]["vertices"], atol=1e-13)
    np.testing.assert_allclose(
        kp.FACE_VERTS, fix["getFaceVertices"]["vertices"], atol=1e-13
    )
    # The reference's own test skips the boundary cases where the Python and
    # TypeScript implementations round differently (test_tiling.py:130-136);
    # mirror that skip list.
    skip = {
        (1, 0.6283185307179586),
        (1, 3.141592653589793),
        (1, 5.654866776461628),
    }
    for case in fix["getQuintantPolar"]:
        rho, gamma = case["input"]["polar"]
        if (rho, gamma) in skip:
            continue
        q = (round(gamma / (2 * math.pi / 5)) + 5) % 5
        assert q == case["output"]["quintant"]


@needs_ref
def test_projection_vector_fixtures():
    from a5spark.kernels import projections as kproj
    from a5spark.kernels.transforms import to_cartesian

    gno = _load("projections", "fixtures", "gnomonic.json")
    for c in gno["forward"]:
        th, ph = c["input"]
        assert [math.tan(ph), th] == pytest.approx(c["expected"], abs=1e-13)
    for c in gno["inverse"]:
        rho, gamma = c["input"]
        assert [gamma, math.atan(rho)] == pytest.approx(c["expected"], abs=1e-13)

    dod = _load("projections", "fixtures", "dodecahedron.json")
    oid = dod["static"]["ORIGIN_ID"]
    for c in dod["forward"]:
        th, ph = c["input"]
        cart = to_cartesian(np.array([th]), np.array([ph]))
        got = kproj.dodec_forward(cart, np.array([oid]))[0]
        assert list(got) == pytest.approx(c["expected"], abs=1e-13)
    for c in dod["inverse"]:
        got = kproj.dodec_inverse(
            np.array([c["input"]], dtype=np.float64), np.array([oid])
        )
        assert [got[0][0], got[1][0]] == pytest.approx(c["expected"], abs=1e-13)

    ea = _load("projections", "fixtures", "equal-area.json")
    sph_tri = np.array([ea["static"]["TEST_SPHERICAL_TRIANGLE"]])
    face_tri = np.array([ea["static"]["TEST_FACE_TRIANGLE"]])
    A = sph_tri[0, 0]
    adotb = float(A @ sph_tri[0, 1])
    odd = np.array(
        [abs(adotb - kproj.EA_ADOTB) > abs(adotb - kproj.EA_ADOTC)]
    )
    for c in ea["forward"]:
        got = kproj.equal_area_forward(
            np.array([c["input"]], dtype=np.float64), sph_tri, face_tri
        )[0]
        assert list(got) == pytest.approx(c["expected"], abs=1e-13)
    for c in ea["inverse"]:
        got = kproj.equal_area_inverse(
            np.array([c["input"]], dtype=np.float64), face_tri, sph_tri, odd
        )[0]
        assert list(got) == pytest.approx(c["expected"], abs=1e-13)
