"""Spark integration tests: image decode round-trip (PSNR gate), tile
pyramid determinism, checkpoint/resume idempotence, cross-index assignment."""

import os
import shutil

import numpy as np
import pytest

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from a5spark.session import get_spark

    s = get_spark("a5spark-pipeline-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_image_bytes_roundtrip_psnr(spark):
    """input_hint gate: decoded pixels must match the reference bytes at
    PSNR >= 40 dB (deterministic synthesis -> identical -> inf)."""
    from a5spark.operators.multimodal import decode_image, psnr
    from a5spark.sources.images import synthesize_images

    df = synthesize_images(spark, 50).select("image_id", "bytes", "w", "h", "fmt", "k")
    rows = df.collect()
    assert len(rows) == 50
    # regenerate the same table: bytes must be identical
    rows2 = {
        r["image_id"]: r
        for r in synthesize_images(spark, 50)
        .select("image_id", "bytes", "w", "h", "fmt")
        .collect()
    }
    for r in rows:
        other = rows2[r["image_id"]]
        a = decode_image(r["bytes"], r["w"], r["h"], r["fmt"])
        b = decode_image(other["bytes"], other["w"], other["h"], other["fmt"])
        assert psnr(a, b) >= 40.0
        assert a.shape == (r["h"], r["w"], 3)


def test_resize_and_stats(spark):
    from a5spark.operators.multimodal import image_stats, resize_images
    from a5spark.sources.images import synthesize_images

    df = synthesize_images(spark, 20)
    stats = image_stats(df).collect()
    assert len(stats) == 20
    assert all(0 <= r["mean_r"] <= 255 for r in stats)
    resized = resize_images(df, 16, 16).collect()
    assert all(len(r["bytes"]) == 16 * 16 * 3 for r in resized)


def test_codec_unknown_format_raises():
    from a5spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x00" * 12, 2, 2, "webp")
    # a truncated JPEG is a hard parse error, not a silent wrong answer
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff", 10, 10, "jpeg")


def test_tile_pyramid_psnr(spark):
    from a5spark.operators.spatial import assign_cells
    from a5spark.operators.tiles import tile_pyramid, verify_tiles
    from a5spark.sources.images import images_from_sf_dir

    img = assign_cells(images_from_sf_dir(spark, SF_DIR), 7)
    tiles = tile_pyramid(img, [4], fine_cell="cell", tile_px=16)
    collected = tiles.collect()
    assert len(collected) > 0
    assert all(len(r["tile"]) == 16 * 16 for r in collected)
    worst = verify_tiles(tiles, img, [4], tile_px=16)
    assert worst >= 40.0

    # the two-phase (partial-grid + reduce) pipeline must be BIT-identical to
    # a single-pass driver-side render of each cell's full point set
    import json

    import numpy as np

    from a5spark.functions import native
    from a5spark.operators.tiles import render_tile
    from pyspark.sql import functions as F

    pts = img.withColumn("tc", native.cell_to_parent(F.col("cell"), 4)).select(
        "tc", "lon", "lat"
    ).toPandas()
    for r in collected:
        g = pts[pts["tc"] == r["cell"]]
        ring = np.array(json.loads(r["bounds_json"]))
        want = render_tile(
            g["lon"].to_numpy(np.float64), g["lat"].to_numpy(np.float64), ring, 16
        )
        assert r["n_images"] == len(g)
        assert r["tile"] == want.tobytes()


def test_checkpoint_resume(tmp_path, spark):
    from a5spark.pipeline.checkpoint import (
        committed_partitions,
        read_output,
        run_partitioned,
    )
    from a5spark.sources.images import images_from_sf_dir

    out = str(tmp_path / "ckpt")
    df = images_from_sf_dir(spark, SF_DIR)
    n_total = df.count()

    stats1 = run_partitioned(df, out, n_parts=4, key="image_id", batch_parts=2)
    assert stats1["committed_now"] == 4
    assert committed_partitions(out) == {0, 1, 2, 3}
    assert read_output(spark, out).count() == n_total

    # simulate a crash: remove one manifest entry, rerun -> only that part
    os.remove(os.path.join(out, "_manifest", "2.json"))
    shutil.rmtree(os.path.join(out, "data", "part=2"))
    stats2 = run_partitioned(df, out, n_parts=4, key="image_id", batch_parts=2)
    assert stats2["committed_now"] == 1
    assert read_output(spark, out).count() == n_total


def test_cross_index_assignment(spark):
    from a5spark.functions.crossindex import assign_cross_index
    from a5spark.kernels import s2 as ks2
    from a5spark.sources.images import images_from_sf_dir

    df = assign_cross_index(
        images_from_sf_dir(spark, SF_DIR).limit(200), a5_resolution=7, s2_level=10
    )
    rows = df.select("lon", "lat", "a5_cell", "s2_cell").collect()
    lon = np.array([r["lon"] for r in rows])
    lat = np.array([r["lat"] for r in rows])
    exp_s2 = ks2.lonlat_to_cell(lon, lat, 10).view(np.int64)
    got_s2 = np.array([r["s2_cell"] for r in rows], dtype=np.int64)
    assert (exp_s2 == got_s2).all()
    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.serialization import to_signed

    exp_a5 = to_signed(lonlat_to_cell(lon, lat, 7))
    got_a5 = np.array([r["a5_cell"] for r in rows], dtype=np.int64)
    assert (exp_a5 == got_a5).all()


def test_streaming_cell_density(tmp_path, spark):
    import shutil as _sh

    from a5spark.streaming.density import run_available_now, streaming_cell_density

    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt_stream")
    # stage the static events table as the stream source
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    events.write.mode("overwrite").parquet(src)
    schema = events.schema

    stream_df = streaming_cell_density(spark, src, schema, resolution=5)
    run_available_now(stream_df, ckpt, "stream_density")
    out = spark.sql("SELECT * FROM stream_density")
    n = out.count()
    assert n > 0
    # totals must match the batch pipeline over the same data
    total_stream = out.agg({"n_events": "sum"}).collect()[0][0]
    assert total_stream == events.count()


def test_pip_refine_matches_kernel(spark):
    """Distributed (mapInPandas-streamed) PIP refine must keep exactly the
    rows the kernel's prepared-polygon containment keeps."""
    import json

    import numpy as np
    from pyspark.sql import functions as F

    from a5spark.kernels.polyfill import PreparedPolygon, point_in_prepared_polygon
    from a5spark.kernels.transforms import from_lonlat, to_cartesian
    from a5spark.operators.polygons import (
        _prepare_rings,
        pip_refine,
        point_in_polygon_join,
        polyfill_cover,
    )
    from a5spark.operators.spatial import assign_cells
    from a5spark.sources.images import images_from_sf_dir

    polys = [
        ("atl", [[[-40.0, 10.0], [-10.0, 10.0], [-10.0, 40.0], [-40.0, 40.0]]]),
        ("pac", [[[150.0, -20.0], [179.0, -20.0], [179.0, 10.0], [150.0, 10.0]]]),
    ]
    pdf = spark.createDataFrame(
        [(pid, json.dumps(r)) for pid, r in polys], ["polygon_id", "rings_json"]
    )
    cover = polyfill_cover(pdf, resolution=6)
    img = assign_cells(images_from_sf_dir(spark, SF_DIR), 9)
    joined = point_in_polygon_join(img, cover, point_cell="cell", expand_to=9)
    cand = joined.select("polygon_id", "image_id", "lon", "lat").collect()
    assert len(cand) > 0
    refined = pip_refine(joined, pdf).select("polygon_id", "image_id").collect()
    got = {(r.polygon_id, r.image_id) for r in refined}
    want = set()
    preps = {pid: _prepare_rings(json.dumps(r)) for pid, r in polys}
    for r in cand:
        th, ph = from_lonlat(np.array([r.lon]), np.array([r.lat]))
        pts = to_cartesian(th, ph)
        if point_in_prepared_polygon(pts, preps[r.polygon_id])[0]:
            want.add((r.polygon_id, r.image_id))
    assert got == want


def test_streaming_sessions_match_batch(tmp_path, spark):
    """Stateful streaming sessionization (applyInPandasWithState) must close
    exactly the sessions the batch window-function form closes; each user's
    final session stays open in state (no timeout fires in a single
    availableNow batch)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from a5spark.streaming.density import run_available_now
    from a5spark.streaming.sessions import streaming_sessions

    src = str(tmp_path / "events_src2")
    ckpt = str(tmp_path / "ckpt_sessions")
    events = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    events.write.mode("overwrite").parquet(src)

    stream_df = streaming_sessions(spark, src, events.schema, gap="30 minutes")
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }

    # batch reference: same gap rule via window functions
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    sess = ev.withColumn(
        "new_session", (gap.isNull() | (gap > 1800 * 1000000)).cast("int")
    ).withColumn("session_idx", F.sum("new_session").over(w))
    batch = (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .collect()
    )
    last_idx = {}
    for r in batch:
        last_idx[r.user_id] = max(last_idx.get(r.user_id, -1), r.session_idx)
    all_sessions = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in batch
    }
    closed_by_gap = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.total_value, 6))
        for r in batch
        if r.session_idx != last_idx[r.user_id]
    }
    # every gap-closed session must be emitted with identical bounds/stats;
    # final sessions may additionally close via watermark timeout (availableNow
    # can run several micro-batches, advancing the watermark between them)
    assert closed_by_gap <= got <= all_sessions
    assert len(closed_by_gap) > 0
