"""Hypothesis property tests for kernel invariants (no Spark, fast).

These complement the golden-fixture suite with generated inputs: round-trip
and containment laws that must hold for EVERY valid input, independent of the
reference fixtures' coverage.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from a5spark.kernels.cell import cell_to_lonlat, lonlat_to_cell
from a5spark.kernels.compact import compact, uncompact
from a5spark.kernels.serialization import (
    cell_to_parent,
    from_signed,
    get_resolution,
    to_signed,
)

lon_st = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lat_st = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
res_st = st.integers(min_value=2, max_value=20)


@settings(max_examples=60, deadline=None)
@given(lon=lon_st, lat=lat_st, res=res_st)
def test_encode_is_stable_under_recenter(lon, lat, res):
    """encode(center(encode(p))) == encode(p): the cell's own center encodes
    back to the same cell (idempotence of the assignment)."""
    c = lonlat_to_cell(np.array([lon]), np.array([lat]), res)
    clon, clat = cell_to_lonlat(c)
    c2 = lonlat_to_cell(clon, clat, res)
    assert c2[0] == c[0]


@settings(max_examples=40, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=3, max_value=12))
def test_parent_children_id_containment(lon, lat, res):
    """ID-space nesting law: every coarser serialization parent's descendant
    expansion at the child resolution contains the child cell. (GEOMETRIC
    nesting intentionally does not hold for pentagonal subdivision — the
    reference behaves identically — so the law is about ID prefixes.)"""
    c = lonlat_to_cell(np.array([lon]), np.array([lat]), res)
    for pr in range(2, res):
        parent = cell_to_parent(c, np.array([pr]))
        kids = uncompact(parent, res)
        assert c[0] in kids
        # and the parent is the unique ancestor among its siblings' expansions
        assert get_resolution(parent)[0] == pr


@settings(max_examples=40, deadline=None)
@given(
    lon=lon_st,
    lat=lat_st,
    res=st.integers(min_value=2, max_value=12),
    depth=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_compact_uncompact_round_trip(lon, lat, res, depth, seed):
    """compact(uncompact(S)) == S for a compacted seed set, and compact of a
    random PROPER subset of the expansion never invents cells outside it."""
    c = lonlat_to_cell(np.array([lon]), np.array([lat]), res)
    fine = uncompact(c, res + depth)
    back = compact(fine)
    assert back.shape == (1,) and back[0] == c[0]

    rng = np.random.default_rng(seed)
    keep = rng.random(fine.size) < 0.7
    if 0 < keep.sum() < fine.size:
        sub = fine[keep]
        comp = compact(sub)
        # re-expanding the compacted subset reproduces it exactly
        re_fine = np.sort(uncompact(comp, res + depth))
        assert np.array_equal(re_fine, np.sort(sub))


@settings(max_examples=60, deadline=None)
@given(lon=lon_st, lat=lat_st, res=res_st)
def test_signed_view_round_trip(lon, lat, res):
    """int64 two's-complement view round-trips the u64 cell id, and hex
    encode/decode round-trips both views."""
    c = lonlat_to_cell(np.array([lon]), np.array([lat]), res)
    signed = to_signed(c)
    assert from_signed(signed)[0] == c[0]
    hx = format(int(c[0]), "x")
    assert int(hx, 16) == int(c[0])
    assert get_resolution(c)[0] == res


@settings(max_examples=40, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=2, max_value=15))
def test_neighbor_symmetry(lon, lat, res):
    """b in N(a) implies a in N(b) — the global neighbor relation (incl.
    cross-quintant / cross-face edges) is symmetric."""
    from a5spark.kernels.neighbors import cell_neighbors_batch

    a = lonlat_to_cell(np.array([lon]), np.array([lat]), res)
    _, nbrs = cell_neighbors_batch(a, edge_only=False)
    for b in nbrs:
        _, back = cell_neighbors_batch(np.array([b], dtype=np.uint64), edge_only=False)
        assert int(a[0]) in {int(v) for v in back}, (hex(int(a[0])), hex(int(b)))


@settings(max_examples=25, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=3, max_value=10))
def test_grid_disk_monotone_and_ring1(lon, lat, res):
    """disk(k) is a subset of disk(k+1); disk(1) == cell + edge neighbors."""
    from a5spark.kernels.neighbors import cell_neighbors_batch
    from a5spark.kernels.traversal import grid_disk_batch

    c = lonlat_to_cell(np.array([lon]), np.array([lat]), res)
    _, d1 = grid_disk_batch(c, 1, edge_only=True, do_compact=False)
    _, d2 = grid_disk_batch(c, 2, edge_only=True, do_compact=False)
    s1, s2 = {int(v) for v in d1}, {int(v) for v in d2}
    assert s1 <= s2
    _, nb = cell_neighbors_batch(c, edge_only=True)
    assert s1 == {int(c[0])} | {int(v) for v in nb}


@settings(max_examples=20, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=4, max_value=9))
def test_cap_cover_monotone_in_radius(lon, lat, res):
    """Uncompacted cap covers grow monotonically with radius and always
    contain the origin cell."""
    from a5spark.kernels.compact import uncompact as kuncompact
    from a5spark.kernels.traversal import spherical_cap_batch

    c = lonlat_to_cell(np.array([lon]), np.array([lat]), res)

    def flat(radius):
        _, cap = spherical_cap_batch(c, radius)
        return {int(v) for v in kuncompact(cap, res)}

    small, big = flat(50_000.0), flat(200_000.0)
    assert int(c[0]) in small
    assert small <= big


@settings(max_examples=30, deadline=None)
@given(
    s=st.integers(min_value=0, max_value=(1 << 24) - 1),
    res=st.integers(min_value=1, max_value=12),
    orient=st.sampled_from(["uv", "vu", "uw", "wu", "vw", "wv"]),
)
def test_lsystem_bijection(s, res, orient):
    """The L-system curve is a bijection: triple_to_s(s_to_triple(s)) == s
    for every s in [0, 4^res), any orientation."""
    from a5spark.kernels.lsystem import s_to_triple, triple_to_s_lattice

    s = s % (1 << (2 * res))
    t = s_to_triple(s, res, orient)
    assert triple_to_s_lattice(*t, res, orient) == s
