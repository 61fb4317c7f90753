"""Round-3 regression tests: antipodal kNN exactness, world-cell neighbor
UDF, scoped persist registry, checkpoint stale-partition cleanup, LSH bucket
caps (added later this round)."""

import math
import os
import shutil

import numpy as np
import pytest

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from a5spark.session import get_spark

    s = get_spark("a5spark-round3-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_meters_to_h_clamps_past_half_circumference():
    from a5spark.kernels.constants import AUTHALIC_RADIUS_EARTH
    from a5spark.kernels.traversal import meters_to_h

    half = math.pi * AUTHALIC_RADIUS_EARTH
    assert meters_to_h(half) == 1.0
    # pre-fix this folded back below 1.0 and shrank the cap
    assert meters_to_h(half * 1.05) == 1.0
    assert meters_to_h(half * 0.5) < 1.0


def test_knn_join_exact_with_antipodal_neighbors(spark):
    """A query whose true top-k lies near its ANTIPODE: the final full-sphere
    round must include those points (pre-fix the folded haversine threshold
    excluded cells near the antipode)."""
    from pyspark.sql import functions as F

    from a5spark.operators.knn import knn_join
    from a5spark.operators.spatial import assign_cells

    # 2 points near the query at (10, 10); 5 points near the antipode
    pts = [("near_%d" % i, 10.0 + 0.1 * i, 10.0) for i in range(2)]
    pts += [("anti_%d" % i, -170.0 + 0.1 * i, -10.0) for i in range(5)]
    pdf = spark.createDataFrame(pts, ["image_id", "lon", "lat"])
    pdf = assign_cells(pdf, 5)
    q = spark.createDataFrame([("q0", 10.0, 10.0)], ["query_id", "lon", "lat"])
    q = assign_cells(q, 5)

    out = knn_join(q, pdf, k=5, resolution=5, point_id="image_id").collect()
    got = {r["image_id"] for r in out}
    assert len(out) == 5
    # true top-5: both near points + the 3 nearest antipodal points
    assert {"near_0", "near_1"} <= got
    assert len([g for g in got if g.startswith("anti_")]) == 3


def test_world_cell_neighbors_returns_empty(spark):
    from pyspark.sql import functions as F

    from a5spark.functions.udfs import a5_cell_neighbors

    df = spark.createDataFrame([(0,)], ["cell"]).select(
        a5_cell_neighbors(F.col("cell").cast("long")).alias("nbrs")
    )
    row = df.collect()[0]
    assert row["nbrs"] == []


def test_cache_scope_is_isolated(spark):
    from a5spark import cache

    a = spark.range(10)
    b = spark.range(20)
    cache.persist(a)
    with cache.scope():
        cache.persist(b)
        cache.release_persisted()  # releases b only
        assert not b.storageLevel.useMemory
        assert a.storageLevel.useMemory
    assert a.storageLevel.useMemory
    cache.release_persisted()
    assert not a.storageLevel.useMemory


def test_checkpoint_clears_stale_uncommitted_partition(spark, tmp_path):
    """Crash sim: data for part p exists but p is uncommitted, and the
    resumed source yields ZERO rows for p — the stale directory must not be
    committed into the manifest."""
    from pyspark.sql import functions as F

    from a5spark.pipeline.checkpoint import (
        read_output,
        run_partitioned,
        with_partition,
    )
    from a5spark.sources.images import images_from_sf_dir

    out = str(tmp_path / "ckpt")
    df = images_from_sf_dir(spark, SF_DIR).limit(64)
    staged = with_partition(df, "image_id", 4)
    # full first run to lay down directories
    run_partitioned(df, out, n_parts=4, key="image_id")
    n_p2 = staged.filter(F.col("part") == 2).count()
    assert n_p2 > 0
    total = df.count()

    # crash sim: part 2 data on disk, manifest entry gone, source now empty
    os.remove(os.path.join(out, "_manifest", "2.json"))
    df_no_p2 = staged.filter(F.col("part") != 2).drop("part")
    stats = run_partitioned(df_no_p2, out, n_parts=4, key="image_id")
    assert stats["committed_now"] == 1
    assert stats["rows_written"] == 0  # stale rows NOT re-committed
    assert read_output(spark, out).count() == total - n_p2
