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


# --- baseline JPEG codec (kernels/jpeg.py) ----------------------------------


def _psnr(a, b):
    import numpy as np

    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_roundtrip_all_modes():
    """Round trip across subsamplings, odd sizes, and restart intervals.
    4:4:4 at the default quality must clear the input_hint's 40 dB lossy
    bar even on worst-case noise; subsampled modes are gated on smooth
    content (the content they are FOR — random chroma is their documented
    worst case, not a defect)."""
    import numpy as np

    from a5spark.kernels.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(11)
    x = np.linspace(0, 255, 57)[None, :].repeat(43, 0)
    smooth = np.stack([x, x[::-1], 0.5 * x + 64], axis=-1).astype(np.uint8)
    noise = rng.randint(0, 256, size=(43, 57, 3), dtype=np.uint8)
    for px in (smooth, noise):
        for sub in ("444", "422", "420"):
            for ri in (0, 3):
                out = jpeg_decode(jpeg_encode(px, 98, sub, restart_interval=ri))
                assert out.shape == px.shape and out.dtype == np.uint8
    assert _psnr(noise, jpeg_decode(jpeg_encode(noise, 98, "444"))) >= 40.0
    for sub in ("422", "420"):
        assert _psnr(smooth, jpeg_decode(jpeg_encode(smooth, 98, sub))) >= 45.0
    # restart markers change framing only, never pixels
    a = jpeg_decode(jpeg_encode(noise, 95, "444", 0))
    b = jpeg_decode(jpeg_encode(noise, 95, "444", 2))
    assert np.array_equal(a, b)
    # deterministic bytes
    assert jpeg_encode(noise, 95) == jpeg_encode(noise, 95)


def test_jpeg_grayscale_and_errors():
    import numpy as np
    import pytest as _pytest

    from a5spark.kernels.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(13)
    g = rng.randint(0, 256, size=(30, 31), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(g, 98, "gray"))
    assert out.shape == (30, 31, 3)
    ref = np.repeat(g[..., None], 3, 2)
    assert _psnr(ref, out) >= 45.0
    # 3-channel input through the gray path uses luma
    rgb = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assert jpeg_decode(jpeg_encode(rgb, 98, "gray")).shape == (16, 16, 3)
    with _pytest.raises(ValueError):
        jpeg_decode(b"\x00\x01")
    with _pytest.raises(ValueError):
        jpeg_decode(b"\xff\xd8\xff\xdb")  # truncated after SOI
    # progressive (SOF2) is explicitly unsupported, not silently wrong
    d = bytearray(jpeg_encode(rgb, 95))
    i = d.find(b"\xff\xc0")
    d[i + 1] = 0xC2
    with _pytest.raises(NotImplementedError):
        jpeg_decode(bytes(d))


def test_jpeg_noninterleaved_scans_and_fill_bytes():
    """Spec-legal baseline layouts beyond the common shape (self-review
    round 7): one NON-interleaved scan per component (T.81 A.2) decodes
    bit-identically to the interleaved layout, and 0xFF fill bytes before
    markers (B.1.1.2) are consumed."""
    import numpy as np

    from a5spark.kernels.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(37)
    px = rng.randint(0, 256, size=(43, 57, 3), dtype=np.uint8)
    for sub in ("444", "422", "420"):
        a = jpeg_decode(jpeg_encode(px, 98, sub, interleave=True))
        b = jpeg_decode(jpeg_encode(px, 98, sub, interleave=False))
        assert np.array_equal(a, b), sub
    d = bytearray(jpeg_encode(px, 95))
    i = d.find(b"\xff\xc0")
    assert jpeg_decode(
        bytes(d[:i]) + b"\xff\xff\xff" + bytes(d[i:])
    ).shape == px.shape


def test_jpeg_pillow_crosscheck():
    """Activates where Pillow exists: Pillow must decode OUR stream (spec
    compliance of the emitted JFIF), and our decoder must decode PILLOW's
    stream, both within IDCT-precision tolerance of each other."""
    import numpy as np
    import pytest as _pytest

    PIL_Image = _pytest.importorskip("PIL.Image")
    import io

    from a5spark.kernels.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(17)
    px = rng.randint(0, 256, size=(40, 48, 3), dtype=np.uint8)
    ours = jpeg_encode(px, 95, "444")
    pil_dec = np.asarray(
        PIL_Image.open(io.BytesIO(ours)).convert("RGB"), dtype=np.uint8
    )
    assert _psnr(jpeg_decode(ours), pil_dec) >= 45.0
    buf = io.BytesIO()
    PIL_Image.fromarray(px, mode="RGB").save(buf, format="JPEG", quality=95)
    assert _psnr(
        jpeg_decode(buf.getvalue()),
        np.asarray(
            PIL_Image.open(io.BytesIO(buf.getvalue())).convert("RGB"),
            dtype=np.uint8,
        ),
    ) >= 45.0


def test_jpeg_oracle_query_matches(spark):
    """Driver-style gate for image_jpeg_psnr at the local sf."""
    import duckdb

    from a5spark.entry_queries import ORACLES, QUERIES

    pdf = QUERIES["image_jpeg_psnr"](spark, SF_DIR).toPandas()
    assert bool(pdf["psnr_ge_40"].all())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/orders.parquet')"
    )
    want = con.execute(ORACLES["image_jpeg_psnr"]).fetchdf()
    assert len(want) == len(pdf)
    got = pdf.sort_values("image_id").reset_index(drop=True)
    want = want.sort_values("image_id").reset_index(drop=True)
    assert (got["n_src_bytes"].to_numpy() == want["n_src_bytes"].to_numpy()).all()
    assert (got["psnr_ge_40"].to_numpy() == want["psnr_ge_40"].to_numpy()).all()


# --- codec robustness: fuzz + decompression-bomb guards ---------------------


def test_jpeg_roundtrip_property():
    """Hypothesis: any uint8 image round-trips through 4:4:4 q98 with
    shape/dtype preserved and PSNR >= 40 (the input_hint invariant)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    from a5spark.kernels.jpeg import jpeg_decode, jpeg_encode

    @settings(max_examples=20, deadline=None)
    @given(
        arrays(
            np.uint8,
            st.tuples(
                st.integers(1, 40), st.integers(1, 40), st.just(3)
            ),
        )
    )
    def check(px):
        out = jpeg_decode(jpeg_encode(px, 98, "444"))
        assert out.shape == px.shape and out.dtype == np.uint8
        assert _psnr(px, out) >= 40.0

    check()


def test_jpeg_corrupt_streams_fail_cleanly():
    """Deterministic byte-mutation fuzz: a corrupted stream either still
    decodes to a correctly-shaped image (corruption in pixel data) or
    raises ValueError/NotImplementedError — never another exception type,
    a hang, or a wrong-shaped array. Segment-length zero (infinite-loop
    hazard) and huge declared frames (decompression bomb) are covered
    explicitly."""
    import struct

    import numpy as np
    import pytest as _pytest

    from a5spark.kernels.jpeg import jpeg_decode, jpeg_encode

    rng = np.random.RandomState(47)
    px = rng.randint(0, 256, size=(24, 31, 3), dtype=np.uint8)
    good = jpeg_encode(px, 95)
    # 2000 trials: the OverflowError class (corrupt DHT defining magnitude
    # categories past T.81's caps) fired ~1-in-4000 at 60 trials — the
    # volume here reaches the deep entropy-layer failure modes too
    for trial in range(2000):
        d = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            d[rng.randint(2, len(d) - 2)] = rng.randint(0, 256)
        try:
            out = jpeg_decode(bytes(d))
            assert out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8
        except (ValueError, NotImplementedError):
            pass
    # zero segment length must raise, not loop forever
    d = bytearray(good)
    i = d.find(b"\xff\xdb")
    d[i + 2 : i + 4] = struct.pack(">H", 0)
    with _pytest.raises(ValueError):
        jpeg_decode(bytes(d))
    # decompression bomb: SOF declaring 65535x65535
    d = bytearray(good)
    i = d.find(b"\xff\xc0")
    d[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    with _pytest.raises(ValueError, match="pixel budget"):
        jpeg_decode(bytes(d))


def test_png_bomb_guard():
    """A PNG whose IHDR declares a huge frame (or whose IDAT would inflate
    far past the declared frame) fails fast with the budget error."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from a5spark.kernels.png import _SIGNATURE, _chunk, png_decode, png_encode

    rng = np.random.RandomState(53)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    good = bytearray(png_encode(px))
    # IHDR is at offset 8 (len+tag) + 8 = byte 16; patch w,h
    good[16:24] = struct.pack(">II", 1 << 16, 1 << 16)
    # CRC now wrong but the decoder doesn't verify CRCs; the guard fires first
    with _pytest.raises(ValueError, match="pixel budget"):
        png_decode(bytes(good))
    # inflate cap: a tiny zlib bomb (1 MB of zeros) against an 8x8 frame
    # must RAISE (data past the declared frame is corruption, and silently
    # truncating it into plausible pixels would mark a corrupt object ok)
    # without ever materializing the 1 MB payload
    bomb = zlib.compress(b"\x00" * (1 << 20))
    data = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="exceeds the declared frame"):
        png_decode(data)


# --- PNG 16-bit / Adam7 / sub-byte depths (round-7 codec completion) --------


def test_png_adam7_and_depth16_roundtrip():
    import numpy as np

    from a5spark.kernels.png import png_decode, png_encode

    rng = np.random.RandomState(19)
    for shape in [(1, 1), (7, 5), (40, 33)]:
        px = rng.randint(0, 256, size=shape + (3,), dtype=np.uint8)
        assert np.array_equal(png_decode(png_encode(px, interlace=True)), px)
    px16 = rng.randint(0, 65536, size=(21, 13, 3)).astype(np.uint16)
    for inter in (False, True):
        out = png_decode(png_encode(px16, interlace=inter))
        assert np.array_equal(out, (px16 >> 8).astype(np.uint8))


def test_png_subbyte_depths_decode():
    """Hand-built depth-4 grayscale and depth-1 palette streams decode
    exactly (gray scales by 17 = 255/15; palette indexes by bit)."""
    import struct
    import zlib

    import numpy as np

    from a5spark.kernels.png import _SIGNATURE, _chunk, png_decode

    rng = np.random.RandomState(23)
    w, h = 5, 3
    g = rng.randint(0, 16, size=(h, w), dtype=np.uint8)
    rows = []
    for y in range(h):
        b = bytearray([0])
        cur, nn = 0, 0
        for v in g[y]:
            cur = (cur << 4) | int(v)
            nn += 1
            if nn == 2:
                b.append(cur)
                cur, nn = 0, 0
        if nn:
            b.append(cur << 4)
        rows.append(bytes(b))
    data = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 4, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), np.repeat((g * 17)[..., None], 3, 2))

    w, h = 10, 2
    idx = rng.randint(0, 2, size=(h, w), dtype=np.uint8)
    pal = np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8)
    rows = [bytes([0]) + np.packbits(idx[y]).tobytes() for y in range(h)]
    data = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 1, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), pal[idx])


def test_png_pillow_crosscheck_extended():
    """Activates where Pillow exists: Pillow decodes our interlaced and
    16-bit streams to the same pixels we do."""
    import io

    import numpy as np
    import pytest as _pytest

    PIL_Image = _pytest.importorskip("PIL.Image")
    from a5spark.kernels.png import png_decode, png_encode

    rng = np.random.RandomState(29)
    px = rng.randint(0, 256, size=(24, 17, 3), dtype=np.uint8)
    data = png_encode(px, interlace=True)
    pil = np.asarray(
        PIL_Image.open(io.BytesIO(data)).convert("RGB"), dtype=np.uint8
    )
    assert np.array_equal(pil, png_decode(data))


# --- stratified cell sampling (training-data balancing) ---------------------


def test_stratified_sample_hot_cell_capped_and_exact(spark):
    """The salted two-phase sampler returns EXACTLY the single-window
    answer (same membership and ranks) and caps a forced Zipfian hot cell
    at cap_per_cell — the geo-balancing property."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from a5spark.operators.spatial import assign_cells, stratified_cell_sample
    from a5spark.sources.images import images_from_sf_dir

    img = assign_cells(images_from_sf_dir(spark, SF_DIR), 4)
    hot = img.agg(F.min("cell")).collect()[0][0]
    skewed = img.select(
        "k",
        F.when(F.col("k") % 2 == 0, F.lit(hot)).otherwise(F.col("cell")).alias(
            "cell"
        ),
        ((F.col("phash") % 999983) * 31 + F.col("k") % 101).alias("sample_key"),
    )
    got = stratified_cell_sample(skewed, cap_per_cell=5).select(
        "cell", "sample_rank", "k"
    )
    w = Window.partitionBy("cell").orderBy("sample_key", "k")
    want = (
        skewed.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 5)
        .select("cell", "sample_rank", "k")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    hot_n = got.filter(F.col("cell") == hot).count()
    assert hot_n == 5  # half the corpus was forced onto this cell


# --- jpeg corpus end-to-end through the image operator stack ----------------


def test_image_operators_over_jpeg_corpus(spark):
    """A corpus whose bytes column holds real JPEG streams (fmt='jpeg')
    flows through the standard operators — image_stats and resize — via the
    decode dispatch, and the stats stay within the lossy tolerance of the
    rgb8 originals. This is the real-corpus shape (input_hint fmt covers
    jpeg); no operator needed changes, only the codec underneath."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    import pandas as pd
    from a5spark.operators.multimodal import image_stats, resize_images
    from a5spark.sources.images import images_from_sf_dir

    @F.pandas_udf(BinaryType())
    def to_jpeg(data: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        from a5spark.kernels.jpeg import jpeg_encode

        out = []
        for d, wi, hi in zip(data, w, h):
            px = np.frombuffer(d, dtype=np.uint8).reshape(int(hi), int(wi), 3)
            out.append(jpeg_encode(px, 98))
        return pd.Series(out)

    img = images_from_sf_dir(spark, SF_DIR, with_bytes=True).filter(
        F.col("k") % 100 == 0
    )
    rgb_stats = {
        r["image_id"]: r
        for r in image_stats(img).collect()
    }
    jimg = img.withColumn(
        "bytes", to_jpeg(F.col("bytes"), F.col("w"), F.col("h"))
    ).withColumn("fmt", F.lit("jpeg"))
    j_stats = image_stats(jimg).collect()
    assert len(j_stats) == len(rgb_stats) > 0
    for r in j_stats:
        ref = rgb_stats[r["image_id"]]
        for c in ("mean_r", "mean_g", "mean_b"):
            assert abs(r[c] - ref[c]) < 1.0, (r["image_id"], c)
    resized = resize_images(jimg, 16, 16).collect()
    assert all(len(r["bytes"]) == 16 * 16 * 3 for r in resized)


# --- H3 cross-index doc-vector parity (activates when h3 is installed) ------


def test_h3_crossindex_doc_vectors(spark):
    """Published H3 test vectors (h3-py quickstart and H3 docs) through the
    UDF — catches lat/lon argument-order bugs in the binding the moment the
    library is present; env-skipped in this sandbox (no pure-python H3
    exists, and the 540-entry base-cell table is data that cannot be
    derived or validated offline — see functions/crossindex.py)."""
    import pytest as _pytest

    _pytest.importorskip("h3")
    from pyspark.sql import functions as F

    from a5spark.functions.crossindex import h3_lonlat_to_cell

    df = spark.createDataFrame(
        [
            (-122.418307270836, 37.7752702151959, 9),
            (-122.0553238, 37.3615593, 5),
        ],
        ["lon", "lat", "res"],
    )
    got = {
        r["res"]: r["c"] & ((1 << 64) - 1)
        for r in df.select(
            "res",
            h3_lonlat_to_cell(
                F.col("lon"), F.col("lat"), F.col("res")
            ).alias("c"),
        ).collect()
    }
    assert got[9] == int("8928308280fffff", 16)
    assert got[5] == int("85283473fffffff", 16)


# --- Iceberg metadata export (layout interop exit ramp) ---------------------


def test_iceberg_export_roundtrips_scan_plan(spark):
    """The Iceberg-model export is lossless for scan planning: a manifest
    reconstructed from the exported metadata ALONE selects the same files
    for a cover (and carries identical rows/bounds/sizes) as the live
    manifest — including for a pinned earlier snapshot after maintenance."""
    import shutil

    from a5spark.entry_queries import _LAYOUT_COVER
    from a5spark.operators import layout
    from a5spark.operators.iceberg_export import (
        iceberg_metadata_to_layout_manifest,
        layout_to_iceberg_metadata,
    )

    d = "/tmp/a5spark_test/r7_iceberg"
    _mini_layout(spark, d, n_files=8)
    man0 = layout.read_manifest(spark, d)
    sizes = [e["bytes"] for e in man0["files"]]
    layout.optimize_cell_layout(
        spark, d,
        target_file_bytes=sum(sizes) // 2,
        min_file_bytes=max(sizes) + 1,
        retain_old=True,
    )
    live = layout.read_manifest(spark, d)

    meta = layout_to_iceberg_metadata(spark, d)
    assert meta["format-version"] == 2
    assert meta["current-snapshot-id"] == live["version"]
    assert len(meta["snapshots"]) >= 2  # base write + >=1 optimize commit

    rebuilt = iceberg_metadata_to_layout_manifest(f"{d}/_iceberg")
    key = lambda m: sorted(  # noqa: E731
        (e["file"], e["lo"], e["hi"], e["rows"], e["bytes"])
        for e in m["files"]
    )
    assert key(rebuilt) == key(live)
    assert rebuilt["key_col"] == live["key_col"]
    ranges = layout.cover_key_ranges(_LAYOUT_COVER)
    assert [e["file"] for e in layout._select_files(rebuilt, ranges)] == [
        e["file"] for e in layout._select_files(live, ranges)
    ]
    # pinned snapshot round-trips too
    pin = man0["version"]
    pinned_live = layout.read_manifest(spark, d, version=pin)
    pinned_rebuilt = iceberg_metadata_to_layout_manifest(
        f"{d}/_iceberg", snapshot_id=pin
    )
    assert key(pinned_rebuilt) == key(pinned_live)
    shutil.rmtree(d, ignore_errors=True)


# --- layout commit-protocol hardening (ADVICE layout.py:306/610) -----------


def _mini_layout(spark, d, n_files=2):
    import shutil

    from pyspark.sql import functions as F

    from a5spark.entry_queries import _spark_cell9
    from a5spark.operators import layout

    shutil.rmtree(d, ignore_errors=True)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = _spark_cell9(li).select("cell", "l_quantity")
    layout.write_cell_layout(df, d, cell="cell", n_files=n_files)
    return df


def test_commit_winner_verifies_own_entry(spark, monkeypatch):
    """A writer whose reservation was repaired and RETAKEN mid-write (its
    create 'succeeded' against a deleted inode) must not report success:
    the post-close readback detects the rival's content and the commit
    retries onto the rival's manifest — the silent-lost-update window the
    round-6 grace repair left open."""
    import json

    from a5spark.operators import layout

    d = "/tmp/a5spark_test/r7_winner_verify"
    _mini_layout(spark, d)
    m0 = layout.read_manifest(spark, d)
    v1 = m0["version"] + 1
    rival = {**m0, "version": v1, "rival": True}
    orig = layout._create_exclusive
    calls = {"n": 0}

    def fake_create(spark_, path_str, text):
        calls["n"] += 1
        if calls["n"] == 1 and path_str.endswith(f"v{v1:06d}.json"):
            # simulate the race: our write landed on a deleted inode while
            # a repairer's rival commit occupies the reservation path
            layout._write_text(spark_, path_str, json.dumps(rival))
            return True
        return orig(spark_, path_str, text)

    monkeypatch.setattr(layout, "_create_exclusive", fake_create)
    committed = layout._commit_manifest(
        spark, d, {**m0, "mine": True},
        retry_update=lambda cur: {**cur, "mine": True},
    )
    # our commit must land AFTER the rival's, with both changes visible
    assert committed["version"] == v1 + 1
    head = layout.read_manifest(spark, d)
    assert head.get("mine") is True and head.get("rival") is True
    assert layout.read_manifest(spark, d, version=v1).get("rival") is True
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_commit_without_retry_raises_on_retaken_reservation(spark, monkeypatch):
    """Same race, single-writer operation (no retry_update): the commit
    must raise instead of silently reporting an invisible commit."""
    import json

    import pytest as _pytest

    from a5spark.operators import layout

    d = "/tmp/a5spark_test/r7_winner_verify_raise"
    _mini_layout(spark, d)
    m0 = layout.read_manifest(spark, d)
    v1 = m0["version"] + 1
    orig = layout._create_exclusive

    def fake_create(spark_, path_str, text):
        if path_str.endswith(f"v{v1:06d}.json"):
            layout._write_text(
                spark_, path_str, json.dumps({**m0, "version": v1, "rival": True})
            )
            return True
        return orig(spark_, path_str, text)

    monkeypatch.setattr(layout, "_create_exclusive", fake_create)
    with _pytest.raises(layout.ConcurrentCommitError):
        layout._commit_manifest(spark, d, {**m0, "mine": True})
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def test_torn_grace_resets_on_write_progress(spark):
    """The repair countdown must RESET while the contended reservation
    shows write progress (growing size/mtime) — a slow live writer is
    never repaired out from under; the torn file is only deleted once
    progress stops for the full window."""
    import json
    import shutil
    import threading
    import time

    from a5spark.operators import layout

    d = "/tmp/a5spark_test/r7_grace_progress"
    _mini_layout(spark, d)
    m0 = layout.read_manifest(spark, d)
    v1 = m0["version"] + 1
    vfile = f"{d}/{layout.VERSIONS_DIR}/v{v1:06d}.json"
    # a "slow writer": appends junk to the reservation every 0.4 s for 2 s,
    # then completes its commit content
    slow_done = threading.Event()

    def slow_writer():
        body = '{"version": '
        for _ in range(5):
            layout._write_text(spark, vfile, body)
            body += " "
            time.sleep(0.4)
        layout._write_text(
            spark, vfile, json.dumps({**m0, "version": v1, "slow": True})
        )
        slow_done.set()

    layout._write_text(spark, vfile, '{"version": ')
    prev = layout._TORN_GRACE_SEC
    layout._TORN_GRACE_SEC = 1.0  # shorter than the slow writer's 2 s total
    try:
        t = threading.Thread(target=slow_writer)
        t.start()
        committed = layout._commit_manifest(
            spark, d, {**m0, "mine": True},
            retry_update=lambda cur: {**cur, "mine": True},
        )
        t.join(30)
    finally:
        layout._TORN_GRACE_SEC = prev
    assert slow_done.is_set()
    # the slow writer's commit survived (progress kept resetting the
    # window) and ours landed after it
    assert layout.read_manifest(spark, d, version=v1).get("slow") is True
    assert committed["version"] == v1 + 1
    assert layout.read_manifest(spark, d).get("mine") is True
    shutil.rmtree(d, ignore_errors=True)


def test_two_optimize_runs_race_without_corruption(spark):
    """Two whole OPTIMIZE runs racing from the same base version (the
    ADVICE layout.py:610 scenario): per-run nonced file names mean the
    loser can never clobber the winner's committed data. End state: all
    rows present, every referenced file exists with exactly its manifest
    row count, pruned scan parity."""
    import shutil
    import threading

    from pyspark.sql import functions as F

    from a5spark.entry_queries import _LAYOUT_COVER
    from a5spark.functions import native
    from a5spark.operators import layout

    d = "/tmp/a5spark_test/r7_double_optimize"
    df = _mini_layout(spark, d, n_files=12)
    man0 = layout.read_manifest(spark, d)
    total_rows = sum(e["rows"] for e in man0["files"])
    sizes = [e["bytes"] for e in man0["files"]]
    results, errs = [], []

    def run_opt():
        try:
            results.append(
                layout.optimize_cell_layout(
                    spark, d,
                    target_file_bytes=sum(sizes) // 3,
                    min_file_bytes=max(sizes) + 1,
                    parallel_bins=2,
                    retain_old=True,
                )
            )
        except layout.ConcurrentCommitError as e:
            errs.append(e)

    ts = [threading.Thread(target=run_opt) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(180)
    assert all(not t.is_alive() for t in ts)
    # every run either completes or aborts with ConcurrentCommitError
    # (racing bins may mutually abort both runs) — but NEVER corrupts
    assert len(results) + len(errs) == 2, [str(e) for e in errs]
    man = layout.read_manifest(spark, d)
    assert sum(e["rows"] for e in man["files"]) == total_rows
    # every referenced file exists and carries exactly its manifest rows
    for e in man["files"]:
        got = spark.read.parquet(f"{d}/{e['file']}").count()
        assert got == e["rows"], (e["file"], got, e["rows"])
    # pruned scan parity against the raw data
    scanned, _ = layout.scan_cell_layout(spark, d, _LAYOUT_COVER)
    keyed = df.withColumn("cell_key", native.shifted_key(F.col("cell")))
    ranges = layout.cover_key_ranges(_LAYOUT_COVER)
    pred = None
    for lo, hi in ranges:
        c = F.col("cell_key").between(lo, hi)
        pred = c if pred is None else (pred | c)
    want = sorted(tuple(r) for r in keyed.filter(pred).collect())
    assert sorted(tuple(r) for r in scanned.collect()) == want
    shutil.rmtree(d, ignore_errors=True)


def test_iceberg_export_empty_layout_raises(spark):
    import shutil

    import pytest as _pytest

    from pyspark.sql import functions as F

    from a5spark.operators import layout
    from a5spark.operators.iceberg_export import layout_to_iceberg_metadata

    d = "/tmp/a5spark_test/r7_iceberg_empty"
    shutil.rmtree(d, ignore_errors=True)
    df = (
        spark.range(1)
        .select(F.lit(1234567).cast("long").alias("cell"))
        .filter(F.lit(False))
    )
    layout.write_cell_layout(df, d, cell="cell", n_files=1)
    with _pytest.raises(ValueError, match="empty layout"):
        layout_to_iceberg_metadata(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def test_optimize_cleans_tmp_dir_on_abort(spark, monkeypatch):
    """An optimize run that aborts (every bin fails) must still remove its
    nonce-named _optimize_tmp-* directory — aborted runs would otherwise
    leak a rewritten copy of their bins forever."""
    import os
    import shutil

    import pytest as _pytest

    from a5spark.operators import layout

    d = "/tmp/a5spark_test/r7_tmp_cleanup"
    _mini_layout(spark, d, n_files=8)
    man = layout.read_manifest(spark, d)
    sizes = [e["bytes"] for e in man["files"]]

    def always_fail(*args, **kwargs):
        raise RuntimeError("injected persistent failure")

    monkeypatch.setattr(layout, "_entry_for_file", always_fail)
    with _pytest.raises(RuntimeError):
        layout.optimize_cell_layout(
            spark, d,
            target_file_bytes=sum(sizes) // 3,
            min_file_bytes=max(sizes) + 1,
            parallel_bins=2,
        )
    local = layout._local_dir(d)
    leftovers = [n for n in os.listdir(local) if n.startswith("_optimize_tmp")]
    assert leftovers == [], leftovers
    shutil.rmtree(d, ignore_errors=True)


def test_optimize_bin_retries_transient_failure(spark, monkeypatch):
    """A transient failure inside one bin (the round-6 flake shape) is
    retried idempotently instead of failing the whole maintenance run."""
    import shutil

    from a5spark.operators import layout

    d = "/tmp/a5spark_test/r7_bin_retry"
    _mini_layout(spark, d, n_files=12)
    man0 = layout.read_manifest(spark, d)
    total_rows = sum(e["rows"] for e in man0["files"])
    sizes = [e["bytes"] for e in man0["files"]]
    orig = layout._entry_for_file
    state = {"failed": False}

    def flaky_entry(*args, **kwargs):
        if not state["failed"]:
            state["failed"] = True
            raise RuntimeError("injected transient bin failure")
        return orig(*args, **kwargs)

    monkeypatch.setattr(layout, "_entry_for_file", flaky_entry)
    stats = layout.optimize_cell_layout(
        spark, d,
        target_file_bytes=sum(sizes) // 3,
        min_file_bytes=max(sizes) + 1,
        parallel_bins=2,
    )
    assert state["failed"] is True
    assert stats["bins"] >= 2
    man = layout.read_manifest(spark, d)
    assert sum(e["rows"] for e in man["files"]) == total_rows
    assert stats["files_after"] < stats["files_before"]
    shutil.rmtree(d, ignore_errors=True)
