"""Round-7 tests: registry-count consistency (the r6 '50/50' bookkeeping
bug), WKT keyword anchoring (ADVICE gis.py), n_parts counted after the
degenerate-ring filter (ADVICE entry_queries/polygons), and the footer-
metadata row-count hint that removes q_bucketed_join's extra count() job."""

import os

import pytest

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from a5spark.session import get_spark

    s = get_spark("a5spark-round7-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


# --- registry bookkeeping -----------------------------------------------


def test_registry_counts_consistent():
    """Docs derive the oracle-board size from the registry; this pins the
    invariants the r6 '50/50' claim violated: every oracle belongs to a
    registered query, the driver surface exposes exactly the registry, and
    every query is oracle-checked (full-strength board, no rows-only
    stragglers)."""
    import __spark_entry__ as entry
    from a5spark.entry_queries import ORACLES, QUERIES, SNAPSHOT_QUERIES

    assert set(ORACLES) <= set(QUERIES)
    assert set(SNAPSHOT_QUERIES) <= set(QUERIES)
    assert set(entry.queries()) == set(QUERIES)
    assert entry.oracle_sql() == ORACLES
    assert set(ORACLES) == set(QUERIES), (
        "every registered query must carry a DuckDB oracle; rows-only "
        f"stragglers: {sorted(set(QUERIES) - set(ORACLES))}"
    )


# --- WKT keyword anchoring (ADVICE gis.py:252) ----------------------------


def test_wkt_keyword_anchoring(spark):
    """A malformed MULTIPOLYGON must yield NO parts (not a half-parse of its
    embedded 'POLYGON' substring), and a non-keyword token like XPOLYGON
    must not parse; real POLYGON/Z variants still do."""
    from pyspark.sql import functions as F

    from a5spark.functions import gis

    rows = [
        # unbalanced MULTIPOLYGON body: first branch fails; the embedded
        # 'POLYGON' substring must not re-match as a bare polygon
        ("torn_mp", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0))", 0),
        # keyword smashed into a preceding word char
        ("xpoly", "XPOLYGON ((0 0, 1 0, 1 1, 0 0))", 0),
        ("multimulti", "MULTIMULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))", 0),
        # controls: the anchors must not reject real geometries
        ("poly", "POLYGON ((0 0, 1 0, 1 1, 0 0))", 1),
        ("poly_z", "POLYGON Z ((0 0 5, 1 0 5, 1 1 5, 0 0 5))", 1),
        ("mp", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2)))", 2),
        # a torn MULTIPOLYGON followed by a separate valid POLYGON: only
        # the valid geometry parses
        ("torn_then_poly",
         "MULTIPOLYGON ((junk)) POLYGON ((0 0, 1 0, 1 1, 0 0))", 1),
    ]
    df = spark.createDataFrame(rows, ["id", "wkt", "want"])
    got = {
        r["id"]: (r["n"], r["want"])
        for r in df.select(
            "id", "want", F.size(gis.wkt_polygon_parts(F.col("wkt"))).alias("n")
        ).collect()
    }
    for rid, (n, want) in got.items():
        assert n == want, f"{rid}: parsed {n} parts, wanted {want}"


# --- n_parts after the degenerate-ring filter (ADVICE entry_queries:2929) --


def test_n_parts_counts_filtered_rings(spark):
    """The exported part count must equal the part count IN the WKT string
    even when an input ring is degenerate (<4 points): both go through the
    same >=4-point filter."""
    from pyspark.sql import functions as F

    from a5spark.functions.gis import rings_to_multipolygon_wkt_fixed

    df = spark.sql(
        """
        SELECT array(
          array(array(0.0D, 0.0D), array(1.0D, 0.0D), array(1.0D, 1.0D),
                array(0.0D, 0.0D)),
          array(array(5.0D, 5.0D), array(6.0D, 5.0D)),            -- degenerate
          array(array(2.0D, 2.0D), array(3.0D, 2.0D), array(3.0D, 3.0D),
                array(2.0D, 2.0D))
        ) AS rings
        """
    )
    out = df.select(
        F.size(F.filter("rings", lambda r: F.size(r) >= 4)).alias("n_parts"),
        rings_to_multipolygon_wkt_fixed(F.col("rings")).alias("wkt"),
    ).collect()[0]
    assert out["n_parts"] == 2
    assert out["wkt"].count("((") == 2, out["wkt"]


def test_cover_export_n_parts_matches_wkt(spark):
    """cover_to_multipolygon_wkt: n_parts equals the part count in the
    string on a real cover (A5 boundaries are all valid, so equality holds
    through the shared filter)."""
    import json

    from a5spark.operators.polygons import (
        cover_to_multipolygon_wkt,
        polyfill_cover,
    )

    pdf = spark.createDataFrame(
        [("t", json.dumps([[[6.0, 44.0], [14.0, 45.0], [10.0, 48.0]]]))],
        ["polygon_id", "rings_json"],
    )
    cover = polyfill_cover(pdf, resolution=4)
    row = cover_to_multipolygon_wkt(cover).collect()[0]
    assert row["n_parts"] >= 1
    assert row["wkt"].count("((") == row["n_parts"]


# --- footer-metadata count hint (VERDICT item 5) ---------------------------


def test_images_count_hint_matches_scan(spark):
    from a5spark.sources.images import images_count_hint, images_from_sf_dir

    hint = images_count_hint(SF_DIR)
    assert hint is not None
    assert hint == images_from_sf_dir(spark, SF_DIR).count()
    assert images_count_hint("/nonexistent/sf_dir") is None
