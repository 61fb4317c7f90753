"""Round-6 tests: multi-part polygon layers (MULTIPOLYGON /
GeometryCollection — WKT and GeoJSON), the holed-POLYGON outer-ring fix,
CAS-safe layout manifest commits, the stdlib PNG codec, boundary options on
the Spark surface, and the bucketed-join hot-cell skew witness."""

import json
import os
import shutil
from functools import reduce

import numpy as np
import pytest

from tests.conftest import fixture_path, reference_available

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from a5spark.session import get_spark

    s = get_spark("a5spark-round6-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _wkt_ring(ring):
    return "(" + ", ".join(f"{p[0]!r} {p[1]!r}" for p in ring) + ")"


def _wkt_polygon(rings):
    return "POLYGON (" + ", ".join(_wkt_ring(r) for r in rings) + ")"


def _wkt_multipolygon(parts):
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_wkt_ring(r) for r in rings) + ")" for rings in parts
    ) + ")"


# --- parsers ----------------------------------------------------------------


def test_wkt_parts_parse_matrix(spark):
    """wkt_polygon_parts across the geometry matrix: POLYGON -> 1 part,
    holed POLYGON -> 1 part 2 rings, MULTIPOLYGON -> n parts (holes kept
    per part), GEOMETRYCOLLECTION -> polygonal members only, Z/M ordinates
    sliced, MULTILINESTRING/MULTIPOINT ring lists NOT false-matched, junk
    -> empty."""
    from pyspark.sql import functions as F

    from a5spark.functions import gis

    rows = [
        ("poly", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", [[5]]),
        (
            "poly_hole",
            "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
            [[5, 5]],
        ),
        (
            "mpoly_hole",
            "MULTIPOLYGON (((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2)),"
            " ((10 10, 14 10, 14 14, 10 14, 10 10)))",
            [[5, 5], [5]],
        ),
        (
            "gc",
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1),"
            " POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)),"
            " MULTIPOLYGON (((10 10, 14 10, 14 14, 10 14, 10 10))))",
            [[5], [5]],
        ),
        ("mpoly_z", "MULTIPOLYGON Z (((0 0 1, 4 0 1, 4 4 1, 0 0 1)))", [[4]]),
        ("mls", "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))", []),
        ("mpt", "MULTIPOINT ((1 2), (3 4))", []),
        ("junk", "not wkt", []),
    ]
    df = spark.createDataFrame([(n, w) for n, w, _ in rows], ["name", "wkt"])
    got = {
        r["name"]: [[len(ring) for ring in part] for part in r["parts"]]
        for r in df.select(
            "name", gis.wkt_polygon_parts(F.col("wkt")).alias("parts")
        ).collect()
    }
    for name, _, want in rows:
        assert got[name] == want, (name, got[name], want)
    # Z ordinates are sliced to lonlat
    z = df.filter(F.col("name") == "mpoly_z").select(
        gis.wkt_polygon_parts(F.col("wkt")).alias("p")
    ).collect()[0]["p"]
    assert all(len(pt) == 2 for pt in z[0][0])


def test_wkt_holed_polygon_keeps_outer_ring(spark):
    """ADVICE r5 (medium): wkt_polygon_ring on a VALID holed POLYGON used to
    return [] (the `((...))` regex could not span the hole); it must return
    the outer ring."""
    from pyspark.sql import functions as F

    from a5spark.functions import gis

    holed = "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    out = spark.createDataFrame([(holed,)], ["wkt"]).select(
        gis.wkt_polygon_ring(F.col("wkt")).alias("ring")
    ).collect()[0]["ring"]
    assert [list(p) for p in out] == [
        [0.0, 0.0], [8.0, 0.0], [8.0, 8.0], [0.0, 8.0], [0.0, 0.0]
    ]


def test_geojson_parts_parse_matrix(spark):
    """geojson_polygon_parts: Polygon, MultiPolygon, MIXED
    GeometryCollection (Polygon + MultiPolygon + ignored Point), and
    malformed input."""
    from pyspark.sql import functions as F

    from a5spark.functions import gis

    ring = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
    ring2 = [[10.0, 10.0], [14.0, 10.0], [14.0, 14.0], [10.0, 10.0]]
    rows = [
        ("p", json.dumps({"type": "Polygon", "coordinates": [ring]}), [[5]]),
        (
            "mp",
            json.dumps({"type": "MultiPolygon", "coordinates": [[ring], [ring2]]}),
            [[5], [4]],
        ),
        (
            "gc",
            json.dumps(
                {
                    "type": "GeometryCollection",
                    "geometries": [
                        {"type": "Point", "coordinates": [1.0, 2.0]},
                        {"type": "Polygon", "coordinates": [ring]},
                        {"type": "MultiPolygon", "coordinates": [[ring2]]},
                    ],
                }
            ),
            [[5], [4]],
        ),
        ("junk", "zzz", []),
    ]
    df = spark.createDataFrame([(n, g) for n, g, _ in rows], ["name", "gj"])
    got = {
        r["name"]: [[len(ring) for ring in part] for part in r["parts"]]
        for r in df.select(
            "name", gis.geojson_polygon_parts(F.col("gj")).alias("parts")
        ).collect()
    }
    for name, _, want in rows:
        assert got[name] == want, (name, got[name], want)


# --- cover parity: multi-part fill == union of per-part fills ---------------


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_multipolygon_cover_union_parity_country_fixtures(spark):
    """The verdict-r5 'done' bar: a MULTIPOLYGON layer fill equals the
    UNION of per-part single-polygon fills — exercised on the reference's
    own country fixtures (Italy and South Africa carry holes), through both
    the WKT and the GeoJSON paths."""
    from pyspark.sql import functions as F

    from a5spark.operators.polygons import (
        polyfill_cover,
        polyfill_cover_geojson,
        polyfill_cover_wkt,
    )

    with open(fixture_path("regions", "fixtures", "polygon.json")) as f:
        countries = {e["name"]: e for e in json.load(f)["country"]}
    parts = [
        countries["Italy"]["polygon"],           # holed (San Marino/Vatican)
        countries["United Kingdom"]["polygon"],
        countries["New Zealand"]["polygon"],
        countries["Fiji"]["polygon"],            # antimeridian-touching
        countries["Russia"]["polygon"],          # antimeridian-spanning
    ]
    res = 4

    per_part = spark.createDataFrame(
        [(f"part{i}", json.dumps(rings)) for i, rings in enumerate(parts)],
        ["polygon_id", "rings_json"],
    )
    part_rows = polyfill_cover(per_part, res).collect()
    by_part = {}
    for r in part_rows:
        by_part.setdefault(r["polygon_id"], set()).add(
            (r["cell"], r["resolution"])
        )
    assert all(len(v) > 0 for v in by_part.values())
    want = set().union(*by_part.values())

    wdf = spark.createDataFrame(
        [("combo", _wkt_multipolygon(parts))], ["polygon_id", "wkt"]
    )
    got_wkt = {
        (r["cell"], r["resolution"])
        for r in polyfill_cover_wkt(wdf, res).collect()
    }
    assert got_wkt == want

    gdf = spark.createDataFrame(
        [
            (
                "combo",
                json.dumps({"type": "MultiPolygon", "coordinates": parts}),
            )
        ],
        ["polygon_id", "geojson"],
    )
    got_gj = {
        (r["cell"], r["resolution"])
        for r in polyfill_cover_geojson(gdf, res).collect()
    }
    assert got_gj == want

    # exactly one row per (id, cell, resolution) even where parts share
    # boundary cells
    rows = polyfill_cover_wkt(wdf, res).collect()
    assert len(rows) == len({(r["cell"], r["resolution"]) for r in rows})


def test_geometrycollection_cover_both_paths(spark):
    """A GEOMETRYCOLLECTION mixing a point, a polygon, and a multipolygon
    covers exactly the union of its polygonal members, identically through
    WKT and GeoJSON."""
    from a5spark.operators.polygons import (
        polyfill_cover,
        polyfill_cover_geojson,
        polyfill_cover_wkt,
    )

    uk = [[-8.0, 50.0], [2.0, 50.0], [2.0, 59.0], [-8.0, 59.0], [-8.0, 50.0]]
    horn = [[40.0, 2.0], [52.0, 2.0], [52.0, 12.0], [44.0, 12.0], [40.0, 2.0]]
    res = 5
    jdf = spark.createDataFrame(
        [("uk", json.dumps([uk])), ("horn", json.dumps([horn]))],
        ["polygon_id", "rings_json"],
    )
    want = {
        (r["cell"], r["resolution"]) for r in polyfill_cover(jdf, res).collect()
    }

    wkt = (
        "GEOMETRYCOLLECTION (POINT (1 2), "
        + _wkt_polygon([uk])
        + ", MULTIPOLYGON ((" + _wkt_ring(horn) + ")))"
    )
    wdf = spark.createDataFrame([("gc", wkt)], ["polygon_id", "wkt"])
    got_w = {
        (r["cell"], r["resolution"])
        for r in polyfill_cover_wkt(wdf, res).collect()
    }
    assert got_w == want and len(want) > 0

    gj = json.dumps(
        {
            "type": "GeometryCollection",
            "geometries": [
                {"type": "Point", "coordinates": [1.0, 2.0]},
                {"type": "Polygon", "coordinates": [uk]},
                {"type": "MultiPolygon", "coordinates": [[horn]]},
            ],
        }
    )
    gdf = spark.createDataFrame([("gc", gj)], ["polygon_id", "geojson"])
    got_g = {
        (r["cell"], r["resolution"])
        for r in polyfill_cover_geojson(gdf, res).collect()
    }
    assert got_g == want


# --- CAS manifest commits ---------------------------------------------------


def _mini_layout(spark, d, n_files=2):
    from pyspark.sql import functions as F

    from a5spark.entry_queries import _spark_cell9
    from a5spark.operators import layout

    shutil.rmtree(d, ignore_errors=True)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = _spark_cell9(li).select("cell", "l_quantity")
    base = df.filter(F.col("l_quantity") <= 20)
    a = df.filter((F.col("l_quantity") > 20) & (F.col("l_quantity") <= 35))
    b = df.filter(F.col("l_quantity") > 35)
    layout.write_cell_layout(base, d, cell="cell", n_files=n_files)
    return df, base, a, b


def test_commit_manifest_cas_rejects_lost_update(spark):
    """Two writers that both read version N can never both commit N+1: the
    version-log create-if-absent is the commit point, so the loser without
    a merge function raises instead of silently overwriting the winner."""
    from a5spark.operators import layout

    d = "/tmp/a5spark_test/cas_reject_r6"
    _mini_layout(spark, d)
    m0 = layout.read_manifest(spark, d)
    layout._commit_manifest(spark, d, {**m0, "marker": "winner"})
    with pytest.raises(layout.ConcurrentCommitError):
        layout._commit_manifest(spark, d, {**m0, "marker": "loser"})
    cur = layout.read_manifest(spark, d)
    assert cur.get("marker") == "winner"
    assert cur["version"] == m0["version"] + 1
    shutil.rmtree(d, ignore_errors=True)


def test_concurrent_append_commits_merge_not_lose(spark):
    """The r5 verdict's lost-update window, closed: writer A reads the
    manifest, writer B appends and commits underneath it, then A commits —
    A's CAS loses the race, re-reads, merges its delta, and commits the
    NEXT version. Both batches' files and ids survive; every manifest
    version is distinct; the pruned scan sees every row."""
    from a5spark.operators import layout

    d = "/tmp/a5spark_test/cas_append_r6"
    df, base, a, b = _mini_layout(spark, d)

    real_read = layout.read_manifest
    state = {"armed": True}

    def hijack(spark_, path_, version=None):
        if state["armed"] and version is None:
            state["armed"] = False  # before B runs: B's reads pass through
            stale = real_read(spark_, path_, version)
            r = layout.append_cell_layout(b, path_, batch_id=7, n_files=2)
            assert not r["skipped"] and r["appended_files"] > 0
            return stale  # writer A proceeds on its pre-B snapshot
        return real_read(spark_, path_, version)

    layout.read_manifest = hijack
    try:
        r = layout.append_cell_layout(a, d, batch_id=3, n_files=2)
    finally:
        layout.read_manifest = real_read
    assert not r["skipped"] and r["appended_files"] > 0
    assert not state["armed"], "interleave hook never fired"

    man = layout.read_manifest(spark, d)
    assert man["batches"] == [3, 7]
    assert sum(e["rows"] for e in man["files"]) == df.count()
    vmax = layout._max_committed_version(spark, d)
    seen = [layout.read_manifest(spark, d, version=v) for v in range(vmax + 1)]
    assert [m["version"] for m in seen] == list(range(vmax + 1))  # none lost
    full = spark.read.parquet(f"{d}/*.parquet")
    # manifest-routed scan over EVERYTHING (degenerate whole-range cover
    # via raw files) — row counts already asserted; check file set parity
    names = {e["file"] for e in man["files"]}
    assert len(names) == len(man["files"])
    shutil.rmtree(d, ignore_errors=True)


def test_read_manifest_prefers_newest_committed_version(spark):
    """The current pointer is a cache: if the version log holds a newer
    commit (stale pointer after out-of-order writers or a crash between
    commit and pointer write), read_manifest returns the newest version."""
    from a5spark.operators import layout
    from a5spark.pipeline.checkpoint import _write_text

    d = "/tmp/a5spark_test/cas_pointer_r6"
    _mini_layout(spark, d)
    m0 = layout.read_manifest(spark, d)
    m1 = layout._commit_manifest(spark, d, {**m0, "marker": "new"})
    # regress the pointer to the OLD version (simulated stale cache)
    _write_text(spark, f"{d}/{layout.MANIFEST_NAME}", json.dumps(m0))
    cur = layout.read_manifest(spark, d)
    assert cur["version"] == m1["version"] and cur.get("marker") == "new"
    shutil.rmtree(d, ignore_errors=True)


def test_optimize_default_retention_keeps_pinned_reader(spark):
    """ADVICE r5: routine maintenance (optimize with defaults) used to open
    with vacuum(retain_versions=1), deleting the files only older versions
    reference — breaking a reader pinned one version back after a
    retain_old=True maintenance. The automatic vacuum now honors a
    2-version window (current + previous), threaded via retain_versions."""
    from a5spark.operators import layout

    d = "/tmp/a5spark_test/cas_retention_r6"
    df, base, a, b = _mini_layout(spark, d, n_files=4)
    man0 = layout.read_manifest(spark, d)
    pin = man0["version"]
    pinned_files = [f'{d}/{e["file"]}' for e in man0["files"]]
    want = spark.read.parquet(*pinned_files).count()

    # maintenance cycle 1: snapshot-isolating optimize (old files retained)
    total = sum(e["bytes"] for e in man0["files"])
    stats = layout.optimize_cell_layout(
        spark, d,
        target_file_bytes=total + 1,
        min_file_bytes=max(e["bytes"] for e in man0["files"]) + 1,
        retain_old=True,
    )
    assert stats["files_after"] < stats["files_before"]
    assert layout.read_manifest(spark, d)["version"] == pin + 1

    # maintenance cycle 2: ROUTINE optimize (defaults). Its leading vacuum
    # must keep the previous version's files: the pinned reader survives.
    layout.optimize_cell_layout(spark, d)
    mpin = layout.read_manifest(spark, d, version=pin)
    got = spark.read.parquet(
        *[f'{d}/{e["file"]}' for e in mpin["files"]]
    ).count()
    assert got == want

    # an explicit 1-version vacuum then reclaims the superseded files
    removed = layout.vacuum_cell_layout(spark, d, retain_versions=1)
    assert removed != []
    shutil.rmtree(d, ignore_errors=True)


# --- stdlib PNG codec -------------------------------------------------------


def _filtered_png(px, ftype):
    """Spec-correct forward filtering (the easy direction) to generate
    decode fixtures for every filter type."""
    import struct
    import zlib

    from a5spark.kernels import png as P

    h, w, ch = px.shape
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    flat = px.reshape(h, stride).astype(np.int64)
    for y in range(h):
        row = flat[y]
        out = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ftype == 0:
                out[x] = row[x]
            elif ftype == 1:
                out[x] = row[x] - a
            elif ftype == 2:
                out[x] = row[x] - b
            elif ftype == 3:
                out[x] = row[x] - ((a + b) >> 1)
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = row[x] - pr
        raw.append(ftype)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = row
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        P._SIGNATURE
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(bytes(raw)))
        + P._chunk(b"IEND", b"")
    )


def test_png_roundtrip_exact():
    from a5spark.kernels.png import png_decode, png_encode

    rng = np.random.default_rng(42)
    for h, w in [(1, 1), (7, 5), (32, 48), (64, 96)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(px)), px)


def test_png_decode_all_filter_types():
    """Each of the five PNG filter types (and a mixed-filter stream built
    row-by-row by an independent forward-filter implementation) decodes to
    the original pixels exactly."""
    from a5spark.kernels.png import png_decode

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    for ftype in range(5):
        assert np.array_equal(png_decode(_filtered_png(px, ftype)), px), ftype


def test_png_decode_color_types():
    """Gray (0), gray+alpha (4), RGBA (6) expand/slice to (h, w, 3)."""
    from a5spark.kernels.png import png_decode

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(9, 6, 1), dtype=np.uint8)
    out = png_decode(_filtered_png(gray, 2))
    assert np.array_equal(out, np.repeat(gray, 3, axis=2))
    ga = rng.integers(0, 256, size=(9, 6, 2), dtype=np.uint8)
    out = png_decode(_filtered_png(ga, 1))
    assert np.array_equal(out, np.repeat(ga[:, :, :1], 3, axis=2))
    rgba = rng.integers(0, 256, size=(9, 6, 4), dtype=np.uint8)
    out = png_decode(_filtered_png(rgba, 4))
    assert np.array_equal(out, rgba[:, :, :3])


def test_png_decode_rejects_unsupported():
    from a5spark.kernels.png import png_decode

    with pytest.raises(ValueError):
        png_decode(b"\x89PNG")  # truncated signature
    with pytest.raises(ValueError):
        png_decode(b"nope" * 4)


def test_png_matches_pillow_when_installed():
    """Cross-codec check (activates only where Pillow exists): Pillow must
    decode our streams to the same pixels, and our decoder must decode
    Pillow's output of the same image exactly."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    from a5spark.kernels.png import png_decode, png_encode

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(21, 17, 3), dtype=np.uint8)
    theirs = np.asarray(
        PIL_Image.open(io.BytesIO(png_encode(px))).convert("RGB")
    )
    assert np.array_equal(theirs, px)
    buf = io.BytesIO()
    PIL_Image.fromarray(px, mode="RGB").save(buf, format="PNG")
    assert np.array_equal(png_decode(buf.getvalue()), px)


def test_png_feeds_existing_image_operators(spark):
    """The verdict-r5 'done' bar for item 3: PNG payloads flow through the
    UNCHANGED stats/aHash operators (image_moments) and produce exactly the
    values the same pixels produce as raw rgb8."""
    from pyspark.sql import functions as F

    from a5spark.operators.multimodal import image_moments, rgb8_to_png
    from a5spark.sources.images import _gen_image_bytes, images_from_sf_dir

    img = images_from_sf_dir(spark, SF_DIR, with_bytes=False).filter(
        F.col("k") % 300 == 0
    )
    img = img.withColumn(
        "bytes", _gen_image_bytes(F.col("k"), F.col("w"), F.col("h"))
    )
    want = sorted(
        tuple(r) for r in image_moments(img).collect()
    )
    png = img.withColumn(
        "bytes", rgb8_to_png(F.col("bytes"), F.col("w"), F.col("h"))
    ).withColumn("fmt", F.lit("png"))
    got = sorted(tuple(r) for r in image_moments(png).collect())
    assert got == want and len(got) > 0


# --- boundary options on the Spark surface ----------------------------------


@pytest.mark.skipif(not reference_available(), reason="reference repo absent")
def test_boundary_options_spark_surface_matches_reference(spark):
    """segments / closed_ring now reach the Spark surface
    (a5_cell_to_boundary_opts): parity vs the live reference at
    segments=10 (the reference's own benchmark configuration,
    benchmarks/bench_cell.py:80-81) and open-ring mode, across
    resolutions."""
    import sys

    from pyspark.sql import functions as F

    from tests.conftest import REFERENCE_ROOT

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import a5

    from a5spark.functions.udfs import a5_cell_to_boundary_opts
    from a5spark.kernels.serialization import to_signed

    pts = [(-0.1276, 51.5074), (139.76, 35.68), (18.42, -33.92),
           (-170.0, -60.0)]
    cells = [
        int(a5.lonlat_to_cell(p, res)) for p in pts for res in (2, 7, 12)
    ]
    sdf = spark.createDataFrame(
        [(int(to_signed(np.uint64(c))),) for c in cells], ["cell"]
    ).coalesce(1)

    for opts in ({"segments": 10}, {"segments": 3, "closed_ring": False},
                 {"closed_ring": False}):
        udf = a5_cell_to_boundary_opts(**opts)
        got = {
            r["cell"]: np.asarray(r["ring"])
            for r in sdf.select("cell", udf(F.col("cell")).alias("ring")).collect()
        }
        for c in cells:
            want = np.asarray(a5.cell_to_boundary(c, dict(opts)))
            g = got[int(to_signed(np.uint64(c)))]
            assert g.shape == want.shape, (opts, c, g.shape, want.shape)
            assert np.abs(g - want).max() <= 1e-10, (opts, c)
            seg = opts.get("segments")
            if seg is not None:
                n = 5 * seg + (1 if opts.get("closed_ring", True) else 0)
                assert g.shape[0] == n


def test_boundary_wkt_honors_segments(spark):
    """cell_to_boundary_wkt(segments=) densifies the exported ring: point
    count is 5*segments+1 and the default export stays unchanged."""
    from pyspark.sql import functions as F

    from a5spark.functions import gis
    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.serialization import to_signed

    cell = int(to_signed(lonlat_to_cell(np.array([-0.1]), np.array([51.5]), 9))[0])
    df = spark.createDataFrame([(cell,)], ["cell"])
    row = df.select(
        gis.cell_to_boundary_wkt(F.col("cell")).alias("w_def"),
        gis.cell_to_boundary_wkt(F.col("cell"), segments=10).alias("w_10"),
        gis.cell_to_boundary_geojson(F.col("cell"), segments=10).alias("g_10"),
    ).collect()[0]
    assert row.w_def.startswith("POLYGON ((")
    n10 = row.w_10.count(",") + 1
    assert n10 == 5 * 10 + 1
    g = json.loads(row.g_10)
    assert len(g["coordinates"][0]) == 51


# --- bucketed-join hot-cell skew witness ------------------------------------


def test_bucketed_join_hot_cell_skew_witness(spark):
    """Verdict-r5 item 5: 50% of the left rows land on ONE cell. The
    bucketed join must stay exact and exchange-free — but ALL hot rows sit
    in one bucket, and because a bucketed scan has no shuffle for AQE to
    re-plan, that bucket is a straggler AQE cannot split (asserted: no
    AQEShuffleRead / skew-split in the plan). This pins the documented
    caveat: under hot-cell skew the salted two-phase path
    (operators/spatial.py salted density) is the fallback; bucketing wins
    only when keys are reasonably spread. PLANS.md records the crossover
    note."""
    from pyspark.sql import functions as F

    from a5spark.operators.bucketing import (
        bucketed_join,
        count_exchanges,
        write_bucketed_table,
    )

    n = 40000
    hot = 7
    df = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, hot)
        .otherwise(F.col("id") % 211)
        .alias("cell"),
        F.col("id").alias("k"),
        (F.col("id") % 13 + 1).alias("v"),
    )
    a = df  # even ids -> cell 7: half the table on one key
    b = (
        spark.range(211)
        .select(F.col("id").alias("cell"), (F.col("id") * 3).alias("w"))
    )
    write_bucketed_table(a, "t_r6_hot", n_buckets=8, path="/tmp/a5spark_r6/bk_hot")
    write_bucketed_table(b, "t_r6_dim", n_buckets=8, path="/tmp/a5spark_r6/bk_dim")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = [F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")]
        got = bucketed_join(spark, "t_r6_hot", "t_r6_dim").groupBy("cell").agg(*agg)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert count_exchanges(got) == 0
        # no shuffle => nothing for AQE's skew-split to operate on
        assert "AQEShuffleRead" not in plan and "skewed=true" not in plan
        want = (
            spark.read.parquet("/tmp/a5spark_r6/bk_hot")
            .join(spark.read.parquet("/tmp/a5spark_r6/bk_dim"), "cell")
            .groupBy("cell")
            .agg(*agg)
        )
        got_rows = sorted(map(tuple, got.collect()))
        assert got_rows == sorted(map(tuple, want.collect()))
        # witness the pileup itself: the hot cell carries >= half the rows,
        # so its bucket is a guaranteed straggler under bucketed execution
        hot_rows = next(r["n"] for r in got.collect() if r["cell"] == hot)
        assert hot_rows >= n // 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# --- density-adaptive kNN index resolution ----------------------------------


def test_pick_index_resolution_tracks_density():
    """The index granularity rule learned at the sf10 point: finest res
    whose cell radius stays >= r_k/4. Reproduces the hand-tuned res 7 at
    150k points and tightens as density grows; monotone non-decreasing in
    n, clamped to [2, max_res]."""
    from a5spark.operators.knn import pick_index_resolution

    assert pick_index_resolution(150_000, 5) == 7
    assert pick_index_resolution(15_000, 5) == 5
    assert pick_index_resolution(15_000_000, 5) == 10
    last = 2
    for n in (100, 10**3, 10**4, 10**5, 10**6, 10**7, 10**8, 10**12):
        r = pick_index_resolution(n, 5)
        assert r >= last and 2 <= r <= 15
        last = r
    assert pick_index_resolution(10**18, 5, max_res=12) == 12


def test_torn_version_log_is_skipped_and_repaired(spark):
    """A writer that crashed between reserving v{N+1} and finishing its
    write leaves a torn version log. Reads must skip it (the newest
    PARSEABLE entry is the newest real commit), a later commit must repair
    the blocker after the grace window instead of spinning forever, and
    vacuum deletes torn entries at or below the committed head."""
    from a5spark.operators import layout
    from a5spark.pipeline.checkpoint import _write_text

    d = "/tmp/a5spark_test/cas_torn_r6"
    _mini_layout(spark, d)
    m0 = layout.read_manifest(spark, d)
    v_torn = m0["version"] + 1
    # simulate the crash window: reservation exists, content incomplete
    _write_text(spark, f"{d}/{layout.VERSIONS_DIR}/v{v_torn:06d}.json",
                '{"version": ')
    # reads skip the torn entry
    assert layout.read_manifest(spark, d)["version"] == m0["version"]
    # a commit repairs the torn reservation and lands AT that version
    # (short grace window so the test doesn't sit out the production
    # 10 s no-progress timeout)
    prev_grace = layout._TORN_GRACE_SEC
    layout._TORN_GRACE_SEC = 1.5
    try:
        m1 = layout._commit_manifest(spark, d, {**m0, "marker": "after_torn"})
    finally:
        layout._TORN_GRACE_SEC = prev_grace
    assert m1["version"] == v_torn
    assert layout.read_manifest(spark, d).get("marker") == "after_torn"
    # vacuum repairs a torn entry below the committed head
    _write_text(spark, f"{d}/{layout.VERSIONS_DIR}/v{m0['version']:06d}.json",
                "junk{")
    layout.vacuum_cell_layout(spark, d, retain_versions=10)
    from a5spark.pipeline import checkpoint as cp
    fs, _, jvm = cp._fs(spark, d)
    assert not fs.exists(jvm.org.apache.hadoop.fs.Path(
        f"{d}/{layout.VERSIONS_DIR}/v{m0['version']:06d}.json"))
    shutil.rmtree(d, ignore_errors=True)


def test_cover_export_multipolygon_roundtrips_through_parser(spark):
    """cover_to_multipolygon_wkt closes the GIS loop: the exported
    MULTIPOLYGON parses back through wkt_polygon_parts into one part per
    cover cell, with each part's ring matching that cell's boundary to
    float-print precision."""
    from pyspark.sql import functions as F

    from a5spark.functions import gis
    from a5spark.functions.udfs import a5_cell_to_boundary
    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.serialization import to_signed
    from a5spark.operators.polygons import cover_to_multipolygon_wkt

    lons = np.array([-0.1, 2.35, 13.4])
    lats = np.array([51.5, 48.86, 52.5])
    cells = [int(c) for c in to_signed(lonlat_to_cell(lons, lats, 6))]
    cover = spark.createDataFrame(
        [("eu", c) for c in cells], ["polygon_id", "cell"]
    )
    out = cover_to_multipolygon_wkt(cover, precision=9).collect()
    assert len(out) == 1 and out[0]["n_parts"] == len(set(cells))
    wkt = out[0]["wkt"]
    assert wkt.startswith("MULTIPOLYGON (((")

    parsed = spark.createDataFrame([(wkt,)], ["wkt"]).select(
        gis.wkt_polygon_parts(F.col("wkt")).alias("parts")
    ).collect()[0]["parts"]
    assert len(parsed) == len(set(cells))
    rings = {
        r["cell"]: np.asarray(r["ring"])
        for r in spark.createDataFrame([(c,) for c in set(cells)], ["cell"])
        .select("cell", a5_cell_to_boundary(F.col("cell")).alias("ring"))
        .collect()
    }
    # parts are in cell order; compare each against its cell's boundary
    for c, part in zip(sorted(set(cells)), parsed):
        got = np.asarray(part[0])
        want = rings[c]
        assert got.shape == want.shape
        assert np.abs(got - want).max() <= 1e-8

    # empty cover -> MULTIPOLYGON EMPTY via the builder directly
    empty = spark.createDataFrame(
        [([],)], "rings: array<array<array<double>>>"
    ).select(gis.rings_to_multipolygon_wkt(F.col("rings")).alias("w")).collect()[0]
    assert empty["w"] == "MULTIPOLYGON EMPTY"


def test_wkt_parts_fuzz_structured(spark):
    """Structured fuzz over the WKT grammar: random polygon/multipolygon/
    collection layouts with random whitespace, Z/M variants, and hole
    counts must parse to exactly the generated part/ring/point structure —
    in ONE Spark pass over the whole generated corpus (the parser is a
    column expression, so fuzzing batches for free)."""
    import random

    from pyspark.sql import functions as F

    from a5spark.functions import gis

    rng = random.Random(20260817)

    def ws():
        return rng.choice(["", " ", "  ", "\t"])

    def ring(n):
        pts = [
            (round(rng.uniform(-179, 179), 4), round(rng.uniform(-89, 89), 4))
            for _ in range(n - 1)
        ]
        pts.append(pts[0])
        dim = rng.choice(["", "z"])
        body = ", ".join(
            f"{x}{ws()} {y}" + (f" {rng.randint(0, 9)}" if dim else "")
            for x, y in pts
        )
        return "(" + body + ")", n, dim

    cases = []
    for i in range(60):
        kind = rng.choice(["poly", "mpoly", "gc"])
        zm = ""
        parts_spec = []
        if kind == "poly":
            n_rings = rng.randint(1, 3)
            rs = [ring(rng.randint(4, 7)) for _ in range(n_rings)]
            zm = "Z" if any(r[2] for r in rs) else ""
            txt = f"POLYGON{ws()}{zm}{ws()}(" + ",".join(r[0] for r in rs) + ")"
            parts_spec = [[r[1] for r in rs]]
        elif kind == "mpoly":
            n_parts = rng.randint(1, 4)
            spec = []
            ptxts = []
            any_z = False
            for _ in range(n_parts):
                rs = [ring(rng.randint(4, 6)) for _ in range(rng.randint(1, 2))]
                any_z = any_z or any(r[2] for r in rs)
                ptxts.append("(" + ",".join(r[0] for r in rs) + ")")
                spec.append([r[1] for r in rs])
            zm = "Z" if any_z else ""
            txt = f"MULTIPOLYGON{ws()}{zm}{ws()}(" + f",{ws()}".join(ptxts) + ")"
            parts_spec = spec
        else:
            r1 = ring(rng.randint(4, 6))
            r2 = ring(rng.randint(4, 6))
            txt = (
                f"GEOMETRYCOLLECTION{ws()}(POINT (1 2), "
                f"POLYGON{ws()}{'Z' if r1[2] else ''}{ws()}(({r1[0][1:-1]})), "
                f"MULTIPOLYGON{ws()}{'Z' if r2[2] else ''}{ws()}((({r2[0][1:-1]}))))"
            )
            parts_spec = [[r1[1]], [r2[1]]]
        cases.append((str(i), txt, parts_spec))

    df = spark.createDataFrame([(n, t) for n, t, _ in cases], ["name", "wkt"])
    got = {
        r["name"]: [[len(ring) for ring in part] for part in r["parts"]]
        for r in df.select(
            "name", gis.wkt_polygon_parts(F.col("wkt")).alias("parts")
        ).collect()
    }
    for name, txt, want in cases:
        assert got[name] == want, (txt, got[name], want)
    # every parsed point is strictly 2-D regardless of Z payloads
    flat = df.select(
        F.explode(F.flatten(F.flatten(gis.wkt_polygon_parts(F.col("wkt"))))).alias("pt")
    ).select(F.size("pt").alias("d")).distinct().collect()
    assert {r["d"] for r in flat} == {2}


def test_optimize_parallel_bins_commit_chain(spark):
    """parallel_bins runs key-disjoint bins as concurrent Spark jobs; their
    CAS commits serialize into a linear version chain with no lost bin:
    every bin lands exactly one commit, rows survive, and the pruned scan
    stays exact."""
    from pyspark.sql import functions as F

    from a5spark.entry_queries import _LAYOUT_COVER, _spark_cell9
    from a5spark.operators import layout

    d = "/tmp/a5spark_test/cas_parallel_opt_r6"
    shutil.rmtree(d, ignore_errors=True)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = _spark_cell9(li).select("cell", "l_quantity")
    layout.write_cell_layout(df, d, cell="cell", n_files=12)
    man0 = layout.read_manifest(spark, d)
    total_rows = sum(e["rows"] for e in man0["files"])
    sizes = [e["bytes"] for e in man0["files"]]
    # force >= 2 bins: small target so a bin holds ~3 files
    target = sum(sizes) // 3
    stats = layout.optimize_cell_layout(
        spark, d,
        target_file_bytes=target,
        min_file_bytes=max(sizes) + 1,
        parallel_bins=4,
    )
    assert stats["bins"] >= 2
    man1 = layout.read_manifest(spark, d)
    assert sum(e["rows"] for e in man1["files"]) == total_rows
    assert stats["files_after"] < stats["files_before"]
    # one commit per bin, linear chain, none lost
    assert man1["version"] == man0["version"] + stats["bins"]
    for v in range(man0["version"], man1["version"] + 1):
        layout.read_manifest(spark, d, version=v)  # every version readable
    scanned, st = layout.scan_cell_layout(spark, d, _LAYOUT_COVER)
    from a5spark.functions import native
    keyed = df.withColumn("cell_key", native.shifted_key(F.col("cell")))
    ranges = layout.cover_key_ranges(_LAYOUT_COVER)
    pred = reduce(
        lambda a, b: a | b,
        [F.col("cell_key").between(lo, hi) for lo, hi in ranges],
    )
    want = sorted(tuple(r) for r in keyed.filter(pred).collect())
    assert sorted(tuple(r) for r in scanned.collect()) == want
    assert layout.vacuum_cell_layout(spark, d, retain_versions=1) == []
    shutil.rmtree(d, ignore_errors=True)


def test_live_append_races_parallel_optimize(spark):
    """Real contention (no monkeypatching): an append commits WHILE a
    parallel optimize is mid-flight. The CAS protocol serializes them —
    no version lost, appended rows AND merged rows all present, and a
    reader pinned to the pre-maintenance version still gets its exact
    snapshot (retain_old)."""
    import threading

    from pyspark.sql import functions as F

    from a5spark.entry_queries import _spark_cell9
    from a5spark.operators import layout

    d = "/tmp/a5spark_test/cas_live_race_r6"
    shutil.rmtree(d, ignore_errors=True)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = _spark_cell9(li).select("cell", "l_quantity")
    base = df.filter(F.col("l_quantity") <= 30)
    extra = df.filter(F.col("l_quantity") > 30)
    layout.write_cell_layout(base, d, cell="cell", n_files=12)
    man0 = layout.read_manifest(spark, d)
    pin = man0["version"]
    base_rows = sum(e["rows"] for e in man0["files"])
    sizes = [e["bytes"] for e in man0["files"]]

    errs = []

    def do_append():
        try:
            layout.append_cell_layout(extra, d, batch_id=99, n_files=2)
        except Exception as e:  # pragma: no cover - failure surface
            errs.append(e)

    t = threading.Thread(target=do_append)
    t.start()
    stats = layout.optimize_cell_layout(
        spark, d,
        target_file_bytes=sum(sizes) // 3,
        min_file_bytes=max(sizes) + 1,
        parallel_bins=4,
        retain_old=True,
    )
    t.join(120)
    assert not t.is_alive() and errs == []
    assert stats["bins"] >= 2

    man = layout.read_manifest(spark, d)
    assert 99 in man.get("batches", [])
    assert sum(e["rows"] for e in man["files"]) == df.count()
    # linear chain: bins + append = exactly that many new versions
    assert man["version"] == pin + stats["bins"] + 1
    for v in range(pin, man["version"] + 1):
        layout.read_manifest(spark, d, version=v)
    # pinned pre-maintenance reader still consistent (retain_old)
    mpin = layout.read_manifest(spark, d, version=pin)
    got = spark.read.parquet(*[f'{d}/{e["file"]}' for e in mpin["files"]]).count()
    assert got == base_rows
    shutil.rmtree(d, ignore_errors=True)


def test_multipolygon_geojson_export_roundtrips(spark):
    """rings_to_multipolygon_geojson mirrors the WKT builder and round-trips
    through geojson_polygon_parts."""
    from pyspark.sql import functions as F

    from a5spark.functions import gis
    from a5spark.functions.udfs import a5_cell_to_boundary
    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.serialization import to_signed

    cells = [int(c) for c in to_signed(
        lonlat_to_cell(np.array([-0.1, 2.35]), np.array([51.5, 48.86]), 6)
    )]
    df = spark.createDataFrame([(c,) for c in cells], ["cell"]).coalesce(1)
    gj = df.agg(
        gis.rings_to_multipolygon_geojson(
            F.array_sort(F.collect_list(a5_cell_to_boundary(F.col("cell")))),
            precision=9,
        ).alias("gj")
    ).collect()[0]["gj"]
    g = json.loads(gj)
    assert g["type"] == "MultiPolygon" and len(g["coordinates"]) == len(set(cells))
    parts = spark.createDataFrame([(gj,)], ["gj"]).select(
        gis.geojson_polygon_parts(F.col("gj")).alias("p")
    ).collect()[0]["p"]
    assert len(parts) == len(set(cells))
    # empty form
    empty = spark.createDataFrame(
        [([],)], "rings: array<array<array<double>>>"
    ).select(gis.rings_to_multipolygon_geojson(F.col("rings")).alias("g")).collect()[0]
    assert json.loads(empty["g"]) == {"type": "MultiPolygon", "coordinates": []}


def test_pick_join_resolution_bounds_fanout():
    from a5spark.operators.bucketing import pick_join_resolution

    assert pick_join_resolution(15_000) == 3       # oracle scale: unchanged
    assert pick_join_resolution(150_000) == 4
    assert pick_join_resolution(15_000_000) == 7  # matches the measured sf10 fix
    last = 3
    for n in (10**3, 10**5, 10**7, 10**9, 10**12):
        r = pick_join_resolution(n)
        assert r >= last and 3 <= r <= 12
        last = r


def test_cover_export_geojson_operator(spark):
    from pyspark.sql import functions as F

    from a5spark.functions import gis
    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.serialization import to_signed
    from a5spark.operators.polygons import cover_to_multipolygon_geojson

    cells = [int(c) for c in to_signed(
        lonlat_to_cell(np.array([-0.1, 2.35, 13.4]), np.array([51.5, 48.86, 52.5]), 6)
    )]
    cover = spark.createDataFrame([("eu", c) for c in cells], ["polygon_id", "cell"])
    row = cover_to_multipolygon_geojson(cover).collect()[0]
    g = json.loads(row["geojson"])
    assert g["type"] == "MultiPolygon"
    assert row["n_parts"] == len(set(cells)) == len(g["coordinates"])
    parts = spark.createDataFrame([(row["geojson"],)], ["gj"]).select(
        gis.geojson_polygon_parts(F.col("gj")).alias("p")
    ).collect()[0]["p"]
    assert len(parts) == len(set(cells))
