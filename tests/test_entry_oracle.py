"""Driver-style correctness gate run locally: every queries() entry executes
on sf0.001, and oracle-backed entries are compared against DuckDB row-for-row
(sorted columns, exact values)."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from a5spark.session import get_spark

    s = get_spark("a5spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def test_all_queries_run_and_oracles_match(spark, duck):
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert queries, "queries() is empty"
    failures = []
    for name, fn in queries.items():
        df = fn(spark, SF_DIR)
        pdf = df.toPandas()
        assert len(pdf.columns) > 0
        if name not in oracles:
            assert len(pdf) >= 0
            continue
        want = duck.execute(oracles[name])
        want_cols = [d[0] for d in want.description]
        want_rows = want.fetchall()
        got = _normalize(list(pdf.itertuples(index=False, name=None)), list(pdf.columns))
        exp = _normalize(want_rows, want_cols)
        if sorted(pdf.columns) != sorted(want_cols):
            failures.append(f"{name}: columns {sorted(pdf.columns)} vs {sorted(want_cols)}")
            continue
        if len(got) != len(exp):
            failures.append(f"{name}: row count {len(got)} vs {len(exp)}")
            continue
        bad = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
        if bad:
            i = bad[0]
            failures.append(f"{name}: {len(bad)} row mismatches, first at {i}: {got[i]} vs {exp[i]}")
    assert not failures, "\n".join(failures)


def test_native_hex_roundtrip_sign_bit_cells(spark):
    """hex codec must round-trip cells with bit 63 set (quintant >= 32 —
    half of all real cells) and res-30 ids; regression for the decimal-cast
    CAST_OVERFLOW bug in native.hex_to_cell."""
    import numpy as np
    from pyspark.sql import functions as F

    from a5spark import api
    from a5spark.functions import native
    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.serialization import to_signed

    # southern-hemisphere points land in high quintants; include res 30
    lons = np.array([10.0, -60.0, 140.0, -170.0, 30.0, 100.0])
    lats = np.array([-80.0, -45.0, -33.0, -60.0, -5.0, -89.9])
    cells = []
    for res in (5, 9, 15, 29, 30):
        cells.extend(to_signed(lonlat_to_cell(lons, lats, res)).tolist())
    assert any(c < 0 for c in cells), "test set must include sign-bit cells"
    df = spark.createDataFrame([(c,) for c in cells], ["cell"])
    out = df.select(
        "cell",
        native.cell_to_hex(F.col("cell")).alias("hx"),
        native.hex_to_cell(native.cell_to_hex(F.col("cell"))).alias("decoded"),
    ).collect()
    for r in out:
        assert r.decoded == r.cell, f"roundtrip failed for {r.hx}"
        u64 = r.cell if r.cell >= 0 else r.cell + (1 << 64)
        assert r.hx == api.u64_to_hex(u64)
        assert api.hex_to_u64(r.hx) == u64


def test_compact_cover_matches_kernel(spark):
    """Distributed compact must reproduce the kernel's compact exactly on
    real polygon covers (uncompacted to a fine resolution, then re-compacted),
    per polygon group."""
    import numpy as np

    from a5spark.kernels.compact import compact as kcompact
    from a5spark.kernels.compact import uncompact
    from a5spark.kernels.polyfill import polygon_to_cells
    from a5spark.kernels.serialization import from_signed, to_signed
    from a5spark.operators.spatial import compact_cover

    polys = {
        "uk": [[-8.0, 50.0], [2.0, 50.0], [2.0, 59.0], [-8.0, 59.0]],
        "alps": [[6.0, 44.0], [14.0, 45.0], [10.0, 48.0]],
        "horn": [[40.0, 2.0], [52.0, 2.0], [52.0, 12.0], [44.0, 12.0]],
    }
    rows, expected = [], {}
    for pid, ring in polys.items():
        cover = polygon_to_cells([ring], 6)
        fine = uncompact(cover, 8)
        expected[pid] = set(int(c) for c in kcompact(fine))
        rows += [(pid, int(c)) for c in to_signed(fine)]
    df = spark.createDataFrame(rows, ["polygon_id", "cell"])
    out = compact_cover(df, group_cols=["polygon_id"]).collect()
    got = {}
    for r in out:
        u = int(from_signed(np.array([r.cell], dtype=np.int64))[0])
        got.setdefault(r.polygon_id, set()).add(u)
    assert got == expected


def test_line_udf_matches_reference(spark):
    """Spark line-trace UDF must return the reference's exact ordered trace."""
    import sys

    import pytest as _pytest

    from tests.conftest import REFERENCE_ROOT, reference_available

    if not reference_available():
        _pytest.skip("reference not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import a5

    from a5spark.functions.udfs import a5_line_to_cells
    from pyspark.sql import functions as F

    routes = [
        ("lp", [[-0.1276, 51.5074], [2.35, 48.85]]),
        ("ny", [[-73.98, 40.75], [-87.62, 41.88]]),
    ]
    df = spark.createDataFrame(routes, ["route_id", "waypoints"])
    got = {
        r.route_id: [c if c >= 0 else c + (1 << 64) for c in r.cells]
        for r in df.select(
            "route_id", a5_line_to_cells(F.col("waypoints"), F.lit(7)).alias("cells")
        ).collect()
    }
    for rid, wps in routes:
        want = a5.line_string_to_cells([tuple(w) for w in wps], 7)
        assert got[rid] == list(want), f"trace mismatch for {rid}"


def test_ann_lsh_recall(spark):
    """Banded LSH top-k must recall >= 0.9 of the brute-force quantized
    ground truth (sf0.01: 500 vectors, 20 queries)."""
    from a5spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.01"
    truth = {}
    for r in QUERIES["ann_quantized"](spark, sf).collect():
        if r.q_id % 25 != 0:
            continue  # ann_lsh queries every 25th vector; truth every 10th
        truth.setdefault(r.q_id, set())
        if r.rank <= 3:
            truth[r.q_id].add(r.vec_id)
    got = {}
    for r in QUERIES["ann_lsh"](spark, sf).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9"


def test_cap_cover_mixed_resolution_batch(spark):
    """a5_cap_cover must uncompact each row to ITS OWN resolution when a
    batch mixes resolutions (regression: the target used to come from the
    batch's first row)."""
    import numpy as np
    from pyspark.sql import functions as F

    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.compact import uncompact
    from a5spark.kernels.serialization import from_signed, to_signed
    from a5spark.kernels.traversal import spherical_cap_batch
    from a5spark.operators.knn import a5_cap_cover

    lons = np.array([-0.1276, 139.76, -73.98, 18.42])
    lats = np.array([51.5074, 35.68, 40.75, -33.92])
    rows = []
    for res in (5, 7):  # interleave resolutions within one batch
        cells = to_signed(lonlat_to_cell(lons, lats, res))
        rows += [(int(c), res) for c in cells]
    df = spark.createDataFrame(rows, ["cell", "res"]).coalesce(1)
    got = {
        (r.cell, tuple(sorted(r.cover)))
        for r in df.select(
            "cell", a5_cap_cover(F.col("cell"), F.lit(150000.0)).alias("cover")
        ).collect()
    }
    want = set()
    for cell_signed, res in rows:
        u = from_signed(np.array([cell_signed], dtype=np.int64))
        _, cap = spherical_cap_batch(u, 150000.0)
        cover = to_signed(uncompact(cap, res))
        want.add((cell_signed, tuple(sorted(int(c) for c in cover))))
    assert got == want


def test_uncompact_cover_low_resolution_cells(spark):
    """uncompact_cover must expand res-0/1 cells (non-Hilbert marker layouts)
    through the full-regime kernel path, matching kernels.compact.uncompact."""
    import numpy as np

    from a5spark.kernels.compact import uncompact as kuncompact
    from a5spark.kernels.serialization import from_signed, to_signed
    from a5spark.operators.spatial import uncompact_cover

    # one res-0 cell, one res-1 cell, one res-2 cell
    from a5spark.kernels.serialization import res0_cells

    r0 = res0_cells()[3]
    r1 = kuncompact(np.array([r0], dtype=np.uint64), 1)[2]
    r2 = kuncompact(np.array([r1], dtype=np.uint64), 2)[1]
    cells = np.array([r0, r1, r2], dtype=np.uint64)
    df = spark.createDataFrame([(int(c),) for c in to_signed(cells)], ["cell"])
    got = sorted(
        int(from_signed(np.array([r.cell], dtype=np.int64))[0])
        for r in uncompact_cover(df, 3).collect()
    )
    want = sorted(int(c) for c in kuncompact(cells, 3))
    assert got == want


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def test_sql_compact_chain_full_face_collapse():
    """The generated SQL collapse chain must include the res-1 -> res-0 level:
    a fully covered face collapses to its res-0 cell, matching the kernel
    (regression: the chain used to stop at res-1)."""
    import duckdb as _dd
    import numpy as np

    from a5spark.entry_queries import _sql_compact_chain
    from a5spark.kernels.compact import compact as kcompact
    from a5spark.kernels.compact import uncompact
    from a5spark.kernels.serialization import res0_cells, to_signed

    r0 = res0_cells()
    full_face = uncompact(np.array([r0[7]], dtype=np.uint64), 4)
    lonely = uncompact(np.array([r0[2]], dtype=np.uint64), 4)[:3]
    cells = np.concatenate([full_face, lonely])
    want = sorted(int(v) for v in to_signed(kcompact(cells)))

    vals = ",".join(f"({int(v)})" for v in to_signed(cells))
    src = f"SELECT c FROM (VALUES {vals}) AS t(c)"
    chain = _sql_compact_chain(src, 4)
    con = _dd.connect()
    got = sorted(r[0] for r in con.execute(
        f"WITH {chain} SELECT c FROM compacted"
    ).fetchall())
    assert got == want
