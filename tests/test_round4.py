"""Round-4 regression tests: grid-disk vertex surface, streaming-dedup TTL,
LSH recall under a biting bucket cap (multi-probe), cross-engine value check
of the triggered multi-probe path."""

import os

import numpy as np
import pytest

SF_DIR = os.environ.get("A5_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from a5spark.session import get_spark

    s = get_spark("a5spark-round4-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_grid_disk_vertex_udf_matches_kernel(spark):
    """The Spark vertex-disk UDF must return the kernel's exact disks and be
    a superset of the edge disk at the same k (reference
    a5/traversal/grid_disk.py grid_disk_vertex)."""
    from pyspark.sql import functions as F

    from a5spark.kernels.cell import lonlat_to_cell
    from a5spark.kernels.serialization import to_signed
    from a5spark.kernels.traversal import grid_disk_batch
    from a5spark.operators.knn import a5_grid_disk, a5_grid_disk_vertex

    lons = np.array([-0.1276, 139.76, -73.98, 18.42, 0.0])
    lats = np.array([51.5074, 35.68, 40.75, -33.92, -89.0])
    cells = lonlat_to_cell(lons, lats, 6)
    df = spark.createDataFrame(
        [(int(c),) for c in to_signed(cells)], ["cell"]
    ).coalesce(1)
    rows = df.select(
        "cell",
        a5_grid_disk(F.col("cell"), F.lit(2)).alias("edge"),
        a5_grid_disk_vertex(F.col("cell"), F.lit(2)).alias("vertex"),
    ).collect()
    got = {r["cell"]: (set(r["edge"]), set(r["vertex"])) for r in rows}
    for i, c in enumerate(cells):
        signed = int(to_signed(np.array([c], dtype=np.uint64))[0])
        _, exp_v = grid_disk_batch(
            np.array([c], dtype=np.uint64), 2, edge_only=False, do_compact=False
        )
        exp_vertex = set(int(v) for v in to_signed(exp_v))
        edge, vertex = got[signed]
        assert vertex == exp_vertex
        assert edge <= vertex  # vertex adjacency is a superset
        assert len(vertex) > len(edge)  # corner neighbors add cells at k=2


def _run_available(stream_df, out_dir, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_dedup_ttl_expires_state(spark, tmp_path):
    """Digest state must drop after `ttl` past the watermark: a replica of an
    expired digest becomes a NEW canonical; a replica inside the window still
    maps to the original."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from a5spark.streaming.dedup import streaming_dedup_ttl

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    t0 = pd.Timestamp("2026-01-01 00:00:00")
    h = pd.Timedelta("1 hour")

    def write_batch(i, rows):
        rows = [(d, t, ts.to_pydatetime()) for d, t, ts in rows]
        df = spark.createDataFrame(rows, schema)
        # append part-files into the monitored dir (the file source does not
        # descend into subdirectories)
        df.coalesce(1).write.mode("append").parquet(src)

    stream = lambda: streaming_dedup_ttl(
        spark, src, schema, ttl="1 hour", watermark="10 minutes"
    )
    # batch 1: two copies of "x" -> canonical 1
    write_batch(1, [(1, "x", t0), (2, "x", t0 + pd.Timedelta("1 minute"))])
    _run_available(stream(), out, ckpt)
    # batch 2: unrelated doc far in the future pushes the watermark past
    # x's timeout (t0 + 1min + 1h)
    write_batch(2, [(50, "y", t0 + 10 * h)])
    _run_available(stream(), out, ckpt)
    # batch 3: another future doc — the watermark now exceeds x's timeout,
    # so this batch FIRES the timeout and removes x's state
    write_batch(3, [(60, "z", t0 + 10 * h + pd.Timedelta("1 minute"))])
    _run_available(stream(), out, ckpt)
    # batch 4: x reappears after expiry -> NEW canonical; y reappears within
    # its window -> still maps to 50
    write_batch(
        4,
        [
            (70, "x", t0 + 10 * h + pd.Timedelta("2 minutes")),
            (71, "y", t0 + 10 * h + pd.Timedelta("2 minutes")),
        ],
    )
    _run_available(stream(), out, ckpt)

    rows = {
        r.doc_id: (r.canonical_id, r.is_dup)
        for r in spark.read.parquet(out).collect()
    }
    assert rows[1] == (1, 0)
    assert rows[2] == (1, 1)  # in-window duplicate maps to the canonical
    assert rows[70] == (70, 0)  # post-TTL replica starts a fresh group
    assert rows[71] == (50, 1)  # y's state survived (within TTL window)


def _hot_cluster(n_hot=300, n_rand=100, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    hot = base[None, :] + 0.25 * rng.normal(size=(n_hot, dim))
    rand = rng.normal(size=(n_rand, dim))
    return np.vstack([hot, rand])


def test_ann_lsh_recall_under_bucket_cap(spark):
    """Recall with the bucket cap ACTIVE (hot cluster splits under suffix
    bits) must stay >= 0.9 of the brute-force quantized ground truth — the
    Hamming-<=2 multi-probe on the query side is what holds it there
    (measured 0.57 without probing, 0.84 with 1-bit flips only)."""
    from a5spark.operators.similarity import lsh_bucket_topk, quantized_topk

    vecs = _hot_cluster()
    n = vecs.shape[0]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    q = df.filter(df.vec_id % 10 == 0).select(df.vec_id.alias("q_id"), "embedding")
    truth = {}
    for r in quantized_topk(q, df, k=3).collect():
        truth.setdefault(r.q_id, set()).add(r.vec_id)
    got = {}
    out = lsh_bucket_topk(
        q, df, k=3, dim=16, n_bits=3, n_tables=12, scale=127,
        bucket_cap=30, extra_bits=4,
    )
    for r in out.collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(truth[k] & got.get(k, set())) for k in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.9, f"capped LSH recall {recall:.3f} < 0.9"


def test_capped_lsh_topk_matches_duckdb(spark, tmp_path):
    """Cross-engine value check of the TRIGGERED multi-probe path: Spark
    lsh_bucket_topk with a biting cap == DuckDB running the generated
    keyed_q/keyed CTE SQL on the same parquet."""
    import duckdb

    from a5spark.entry_queries import _sql_lsh_keyed_ctes
    from a5spark.operators.similarity import lsh_bucket_topk

    vecs = _hot_cluster(n_hot=150, n_rand=50)
    n = vecs.shape[0]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    pq = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(pq)

    q = df.filter(df.vec_id % 10 == 0).select(df.vec_id.alias("q_id"), "embedding")
    got = [
        (r["q_id"], r["rank"], r["vec_id"], r["qdot"])
        for r in lsh_bucket_topk(
            q, df, k=3, dim=16, n_bits=3, n_tables=4, scale=127,
            bucket_cap=20, extra_bits=4,
        )
        .orderBy("q_id", "rank")
        .collect()
    ]
    keyed = _sql_lsh_keyed_ctes(
        n_bits=3, n_tables=4, dim=16, bucket_cap=20, extra_bits=4, probe=True
    )
    sql = f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127)) AS v
      FROM read_parquet('{pq}/*.parquet')
    ), {keyed},
    pairs AS (
      SELECT DISTINCT q.vec_id AS q_id, p.vec_id AS vec_id
      FROM keyed_q q JOIN keyed p ON q.t = p.t AND q.bucket = p.bucket
      WHERE q.vec_id % 10 = 0
    ), scored AS (
      SELECT pr.q_id, pr.vec_id,
             CAST(list_dot_product(a.v, b.v) AS BIGINT) AS qdot,
             row_number() OVER (
               PARTITION BY pr.q_id
               ORDER BY list_dot_product(a.v, b.v) DESC, pr.vec_id ASC
             ) AS rank
      FROM pairs pr
      JOIN qv a ON a.vec_id = pr.q_id
      JOIN qv b ON b.vec_id = pr.vec_id
    )
    SELECT q_id, CAST(rank AS INT) AS rank, vec_id, qdot
    FROM scored WHERE rank <= 3 ORDER BY q_id, rank
    """
    exp = duckdb.sql(sql).fetchall()
    assert got == exp
    assert len(exp) > 0


def test_probed_neardup_selfjoin_matches_duckdb(spark, tmp_path):
    """Cross-engine value check of the TRIGGERED multi-probe SELF-JOIN path
    (the embed_neardup formulation): Spark cosine_neardup_pairs with a
    biting cap and probe_flips on == DuckDB joining keyed_q (A side) against
    keyed (B side) on the same parquet."""
    import duckdb

    from a5spark.entry_queries import _sql_lsh_keyed_ctes
    from a5spark.operators.similarity import cosine_neardup_pairs

    vecs = _hot_cluster(n_hot=150, n_rand=50)
    n = vecs.shape[0]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    pq = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(pq)

    got = [
        (r["id_a"], r["id_b"], r["qdot"])
        for r in cosine_neardup_pairs(
            df, dim=16, threshold_num=4, threshold_den=25,
            n_bits=3, n_tables=4, scale=127, bucket_cap=20, extra_bits=8,
        )
        .orderBy("id_a", "id_b")
        .collect()
    ]
    keyed = _sql_lsh_keyed_ctes(
        n_bits=3, n_tables=4, dim=16, bucket_cap=20, extra_bits=8, probe=True
    )
    sql = f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127)) AS v
      FROM read_parquet('{pq}/*.parquet')
    ), n AS (
      SELECT vec_id, v, CAST(list_dot_product(v, v) AS BIGINT) AS n2 FROM qv
    ), {keyed},
    pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM keyed_q a JOIN keyed b ON a.t = b.t AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
    ), scored AS (
      SELECT p.id_a, p.id_b,
             CAST(list_dot_product(na.v, nb.v) AS BIGINT) AS qdot,
             na.n2 AS n2a, nb.n2 AS n2b
      FROM pairs p
      JOIN n na ON na.vec_id = p.id_a
      JOIN n nb ON nb.vec_id = p.id_b
    )
    SELECT id_a, id_b, qdot FROM scored
    WHERE qdot > 0 AND qdot * qdot * 25 >= 4 * n2a * n2b
    ORDER BY id_a, id_b
    """
    exp = duckdb.sql(sql).fetchall()
    assert got == exp
    assert len(exp) > 0


def test_probed_neardup_pair_recall_under_cap(spark):
    """Output-level pair recall with a biting cap: the Hamming-<=2 probe must
    recover a strict superset of the single-key split's threshold pairs and
    hold a measured floor of the uncapped output (the cap trades tail pairs
    for subquadratic candidate volume; true near-dups survive)."""
    from a5spark.operators.similarity import cosine_neardup_pairs

    vecs = _hot_cluster(n_hot=250, n_rand=80)
    n = vecs.shape[0]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    ).cache()
    common = dict(
        dim=16, threshold_num=4, threshold_den=25,
        n_bits=3, n_tables=12, scale=127,
    )
    full = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(df, bucket_cap=None, **common).collect()
    }
    plain = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(
            df, bucket_cap=30, extra_bits=6, probe_flips=False, **common
        ).collect()
    }
    probed = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(
            df, bucket_cap=30, extra_bits=6, probe_flips=True, **common
        ).collect()
    }
    assert plain <= probed <= full
    assert len(probed) > len(plain), "probe recovered nothing over single-key"
    recall = len(probed) / max(len(full), 1)
    assert recall >= 0.5, f"probed pair recall {recall:.3f} under cap too low"


def test_ivf_topk_matches_duckdb(spark, tmp_path):
    """Cross-engine value check of the IVF pipeline (centroid selection +
    assignment + n_probe search + re-rank) on a clustered corpus — every
    stage is integer arithmetic over the same md5-derived sample, so results
    must be row-identical."""
    import duckdb

    from a5spark.operators.similarity import ivf_topk

    vecs = _hot_cluster(n_hot=150, n_rand=50)
    n = vecs.shape[0]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    )
    pq = str(tmp_path / "emb.parquet")
    df.coalesce(1).write.parquet(pq)

    q = df.filter(df.vec_id % 10 == 0).select(df.vec_id.alias("q_id"), "embedding")
    got = [
        (r["q_id"], r["rank"], r["vec_id"], r["qdot"])
        for r in ivf_topk(q, df, k=3, dim=16, n_lists=8, n_probe=2, scale=127)
        .orderBy("q_id", "rank")
        .collect()
    ]
    from a5spark.entry_queries import _sql_ivf_ctes

    sql = f"""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 127)) AS v
      FROM read_parquet('{pq}/*.parquet')
    ), {_sql_ivf_ctes(8, 2, 3, 16, "q.vec_id % 10 = 0")}
    SELECT q_id, CAST(rank AS INT) AS rank, vec_id, qdot
    FROM scored WHERE rank <= 3 ORDER BY q_id, rank
    """
    exp = duckdb.sql(sql).fetchall()
    assert got == exp
    assert len(exp) > 0


def test_ivf_recall_vs_quantized_truth(spark):
    """IVF recall against the brute-force quantized ground truth at a
    realistic probe fraction (n_probe/n_lists = 1/2 on this tiny 8-list
    index) on the hot-cluster
    corpus (measured 0.875 with the one-step Lloyd refinement)."""
    from a5spark.operators.similarity import ivf_topk, quantized_topk

    vecs = _hot_cluster()
    n = vecs.shape[0]
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(n)], ["vec_id", "embedding"]
    ).cache()
    q = df.filter(df.vec_id % 10 == 0).select(df.vec_id.alias("q_id"), "embedding")
    truth = {}
    for r in quantized_topk(q, df, k=3).collect():
        truth.setdefault(r.q_id, set()).add(r.vec_id)
    got = {}
    for r in ivf_topk(q, df, k=3, dim=16, n_lists=8, n_probe=4).collect():
        got.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(truth[key] & got.get(key, set())) for key in truth)
    total = sum(len(v) for v in truth.values())
    recall = hits / total
    assert recall >= 0.8, f"IVF recall {recall:.3f} < 0.8"


def test_sample_frames_rawv8_and_codec_stub(spark):
    """sample_frames: rawv8 payloads decode for real (frame count from the
    byte length, every_n stride, rgb8 rows consumable by image operators);
    container formats raise the documented codec stub inside the kernel."""
    import pandas as pd
    import pytest as _pytest

    from a5spark.operators.multimodal import decode_image, sample_frames

    w, h, n_frames = 4, 3, 7
    frame = bytes(range(w * h * 3))
    payload = b"".join(bytes((b + f) % 256 for b in frame) for f in range(n_frames))
    df = spark.createDataFrame(
        [("v0", payload, w, h, "rawv8")],
        ["video_id", "bytes", "w", "h", "fmt"],
    )
    rows = sample_frames(df, every_n=3).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    for r in rows:
        px = decode_image(bytes(r["bytes"]), r["w"], r["h"], r["fmt"])
        assert px.shape == (h, w, 3)
        assert px.reshape(-1)[0] == r["frame_idx"] % 256

    bad = spark.createDataFrame(
        [("v1", b"\x00" * 36, w, h, "mp4")],
        ["video_id", "bytes", "w", "h", "fmt"],
    )
    with _pytest.raises(Exception, match="codec"):
        sample_frames(bad).collect()


def test_audio_features_pcm16_and_codec_stub(spark):
    """audio_features: PCM16 windows verified against a hand-computed clip
    (energy / zero crossings / peak / trailing partial window); codec
    formats raise the documented stub inside the kernel."""
    import numpy as np
    import pytest as _pytest

    from a5spark.operators.multimodal import audio_features

    x = np.array([100, -200, 300, 0, -5, 6, 7, -8, 9, 10], dtype="<i2")
    df = spark.createDataFrame(
        [("a0", x.tobytes(), "pcm16")], ["audio_id", "bytes", "fmt"]
    )
    rows = {r["win_idx"]: r for r in audio_features(df, window_samples=4).collect()}
    assert sorted(rows) == [0, 1, 2]
    w0 = rows[0]
    assert w0["n_samples"] == 4
    assert w0["energy"] == 100**2 + 200**2 + 300**2 + 0
    assert w0["zero_crossings"] == 2  # 100,-200 and -200,300; 300,0 is not strict
    assert w0["peak"] == 300
    w2 = rows[2]  # trailing partial window [9, 10]
    assert w2["n_samples"] == 2 and w2["energy"] == 81 + 100 and w2["zero_crossings"] == 0

    bad = spark.createDataFrame([("a1", b"\x00" * 8, "mp3")], ["audio_id", "bytes", "fmt"])
    with _pytest.raises(Exception, match="codec"):
        audio_features(bad).collect()


def test_ann_operators_accept_string_ids(spark):
    """ivf_topk and quantized_topk must work with STRING ids (the images
    table keys by image_id strings) — output id types follow the inputs."""
    import numpy as np

    from a5spark.operators.similarity import ivf_topk, quantized_topk

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 8))
    df = spark.createDataFrame(
        [(f"img_{i:04d}", vecs[i].tolist()) for i in range(60)],
        ["vec_id", "embedding"],
    )
    q = df.limit(5).select(df.vec_id.alias("q_id"), "embedding")
    out1 = ivf_topk(q, df, k=2, dim=8, n_lists=4, n_probe=2).collect()
    out2 = quantized_topk(q, df, k=2).collect()
    assert len(out1) == 10 and all(isinstance(r["vec_id"], str) for r in out1)
    assert len(out2) == 10 and all(isinstance(r["vec_id"], str) for r in out2)
