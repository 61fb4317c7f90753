"""Multimodal (image / audio / video) column operators.

Images travel as opaque `binary` columns with typed metadata (w, h, fmt) —
the input_hint schema. All pixel work runs in Arrow-batched kernels over
mapInPandas / pandas UDFs; nothing decodes per-row in Python object space.

Codec support: 'png' decodes/encodes through a dependency-free stdlib codec
(kernels/png.py — real everywhere, including this sandbox); 'jpeg' likewise
through the dependency-free baseline codec (kernels/jpeg.py — SOF0, stream
Huffman tables, 4:4:4/4:2:2/4:2:0/grayscale, restart markers), with Pillow
as a cross-check when installed (tests activate automatically). The
synthetic 'rgb8' raw format decodes with numpy frombuffer + reshape.
"""

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """binary -> (h, w, 3) uint8 array. The raw 'rgb8' format decodes with
    numpy alone; 'png' decodes through the dependency-free stdlib codec
    (kernels/png.py — all filter types, gray/RGB/palette/alpha color
    types); 'jpeg' through the dependency-free baseline codec
    (kernels/jpeg.py — SOF0, stream-carried Huffman tables, subsampling,
    restart markers). Both are REAL in this sandbox; Pillow, when
    installed, serves as a cross-check (tests activate automatically)."""
    if fmt == "rgb8":
        return np.frombuffer(data, dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    if fmt == "png":
        from a5spark.kernels.png import png_decode

        return png_decode(data)
    if fmt in ("jpeg", "jpg"):
        from a5spark.kernels.jpeg import jpeg_decode

        return jpeg_decode(data)
    raise NotImplementedError(
        f"decode for format {fmt!r} not supported (rgb8/png/jpeg)"
    )


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "rgb8":
        return px.astype(np.uint8).tobytes()
    if fmt == "png":
        from a5spark.kernels.png import png_encode

        return png_encode(px)
    if fmt in ("jpeg", "jpg"):
        from a5spark.kernels.jpeg import jpeg_encode

        return jpeg_encode(px)
    raise NotImplementedError(
        f"encode for format {fmt!r} not supported (rgb8/png/jpeg)"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return math.inf
    return 10.0 * math.log10(255.0**2 / mse)


_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("std_gray", DoubleType()),
        StructField("phash64", LongType()),
    ]
)


def image_stats(df: DataFrame) -> DataFrame:
    """Per-image channel means, grayscale std and a 64-bit perceptual hash
    (8x8 mean-threshold aHash over the decoded pixels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_image(data, int(w), int(h), fmt)
                f = px.astype(np.float64)
                gray = f.mean(axis=2)
                # 8x8 average hash: block-mean downsample then threshold
                bh, bw = h // 8, w // 8
                small = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
                bitmask = (small > small.mean()).ravel()
                ph = int(np.bitwise_or.reduce(np.left_shift(bitmask.astype(np.uint64), np.arange(64, dtype=np.uint64))))
                rows.append(
                    (
                        img_id,
                        float(f[..., 0].mean()),
                        float(f[..., 1].mean()),
                        float(f[..., 2].mean()),
                        float(gray.std()),
                        np.int64(np.uint64(ph).astype(np.int64)),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "mean_r", "mean_g", "mean_b", "std_gray", "phash64"]
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, _STATS_SCHEMA
    )


_MOMENTS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("sum_s", LongType()),
        StructField("sumsq_s", LongType()),
        StructField("ahash64", LongType()),
    ]
)


@F.pandas_udf(BinaryType())
def rgb8_to_png(data: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
    """Transcode raw rgb8 payloads to PNG (stdlib codec, Arrow-batched) —
    lets every downstream operator exercise the real container-decode path;
    PNG is lossless, so value oracles for the rgb8 pattern hold unchanged."""
    from a5spark.kernels.png import png_encode

    out = []
    for d, wi, hi in zip(data, w, h):
        px = np.frombuffer(d, dtype=np.uint8, count=int(wi) * int(hi) * 3)
        out.append(png_encode(px.reshape(int(hi), int(wi), 3)))
    return pd.Series(out)


_TRANSCODE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_src_bytes", LongType()),
        StructField("n_enc_bytes", LongType()),
        StructField("psnr_db", DoubleType()),
        StructField("psnr_ok", BooleanType()),
    ]
)


def transcode_psnr(
    df: DataFrame,
    fmt: str = "jpeg",
    threshold: float = 40.0,
    quality: int = 98,
    subsampling: str = "444",
) -> DataFrame:
    """Lossy-codec round-trip gate — the input_hint's per-row invariant for
    lossy formats (decoded-pixel PSNR >= 40 dB): decode each row's rgb8
    source, transcode through the real container codec (kernels/jpeg.py or
    kernels/png.py), decode back, and report per-image PSNR + pass flag.
    Arrow-batched mapInPandas; the entropy layer is per-image Python by
    spec (sequential bitstream), DCT/color math is vectorized numpy."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from a5spark.kernels.jpeg import jpeg_encode

        for pdf in batches:
            rows = []
            for iid, data, wi, hi in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"]
            ):
                src = decode_image(bytes(data), int(wi), int(hi), "rgb8")
                if fmt in ("jpeg", "jpg"):
                    enc = jpeg_encode(src, quality, subsampling)
                else:
                    enc = encode_image(src, fmt)
                dec = decode_image(enc, int(wi), int(hi), fmt)
                p = psnr(src, dec)
                rows.append(
                    (iid, int(wi) * int(hi) * 3, len(enc), p, p >= threshold)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _TRANSCODE_SCHEMA]
            )

    return df.select("image_id", "bytes", "w", "h").mapInPandas(
        run, _TRANSCODE_SCHEMA
    )


_HEALTH_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("err_kind", StringType()),
    ]
)


def decode_health(df: DataFrame) -> DataFrame:
    """Per-row decode health for a mixed-quality corpus: attempt the full
    decode and report (ok, error kind) instead of failing the task — at
    100 TB a corrupt row is routine and must cost one flagged row, not a
    task retry storm. Relies on the codecs' error contract (malformed →
    ValueError, unsupported → NotImplementedError; nothing else escapes),
    so any OTHER exception type still fails loudly — a genuine engine bug
    must not be silently absorbed as 'corrupt input'."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, data, wi, hi, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                if data is None or fmt is None or pd.isna(wi) or pd.isna(hi):
                    # NULL payload/metadata is bad INPUT (routine at ingest
                    # scale), not an engine bug — contain it per row too.
                    # pd.isna, not `is None`: NULL IntegerType values arrive
                    # in pandas as NaN floats, which `is None` misses (the
                    # row then fell through to int(NaN) and was mislabeled
                    # err_kind='ValueError' instead of 'NullInput')
                    rows.append((iid, False, "NullInput"))
                    continue
                try:
                    px = decode_image(bytes(data), int(wi), int(hi), fmt)
                    ok = px.shape == (int(hi), int(wi), 3)
                    rows.append((iid, ok, None if ok else "ShapeMismatch"))
                except (ValueError, NotImplementedError) as e:
                    rows.append((iid, False, type(e).__name__))
            yield pd.DataFrame(rows, columns=[f.name for f in _HEALTH_SCHEMA])

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, _HEALTH_SCHEMA
    )


def image_moments(df: DataFrame) -> DataFrame:
    """Integer-exact per-image moments + perceptual hash over decoded pixels:

      n_px                 pixel count (w*h)
      sum_r/g/b            per-channel byte sums
      sum_s, sumsq_s       sum and sum-of-squares of the per-pixel 3-channel
                           total s_p (gray stats derive exactly: mean_gray =
                           sum_s/(3 n_px), var_gray = (n sumsq_s - sum_s^2) /
                           (9 n^2))
      ahash64              8x8 average hash in PURE INTEGER form: bit j set
                           iff 64 * block_sum_j > total_sum over the trimmed
                           (8*floor(h/8)) x (8*floor(w/8)) region — the same
                           threshold as the float aHash but with no float
                           noise, so it is bit-identical across engines and
                           platforms (uint64 bit pattern viewed as int64)

    Everything stays in int64 (worst case ~2^45 for sumsq at 96x64) — unlike
    the float stats these compare bit-for-bit against an independent engine's
    closed-form evaluation, which makes the whole decode path oracle-gateable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                w, h = int(w), int(h)
                px = decode_image(data, w, h, fmt).astype(np.int64)
                s = px.sum(axis=2)  # (h, w) per-pixel channel totals
                bh, bw = h // 8, w // 8
                blocks = (
                    s[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).sum(axis=(1, 3))
                )
                total = int(blocks.sum())
                bits = (64 * blocks > total).ravel()
                ahash = np.bitwise_or.reduce(
                    np.left_shift(
                        bits.astype(np.uint64), np.arange(64, dtype=np.uint64)
                    )
                )
                rows.append(
                    (
                        img_id,
                        w * h,
                        int(px[..., 0].sum()),
                        int(px[..., 1].sum()),
                        int(px[..., 2].sum()),
                        int(s.sum()),
                        int((s * s).sum()),
                        int(np.uint64(ahash).astype(np.int64)),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _MOMENTS_SCHEMA])

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, _MOMENTS_SCHEMA
    )


_CHECKSUM_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_all", LongType()),
    ]
)


def image_checksums(df: DataFrame) -> DataFrame:
    """Integer-exact decoded-pixel checksums per image (R-channel sum + total
    byte sum): the value-level decode gate — unlike float stats, these compare
    bit-for-bit against an independent engine's closed-form evaluation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, sr, sa = [], [], [], []
            for img_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_image(data, int(w), int(h), fmt)
                ids.append(img_id)
                nb.append(px.size)
                sr.append(int(px[..., 0].astype(np.int64).sum()))
                sa.append(int(px.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "sum_r": pd.Series(sr, dtype="int64"),
                    "sum_all": pd.Series(sa, dtype="int64"),
                }
            )

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, _CHECKSUM_SCHEMA
    )


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of the decoded pixels, re-encoded to rgb8.
    Codec formats raise NotImplementedError inside the kernel (stub)."""
    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for img_id, data, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_image(data, int(w), int(h), fmt)
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                out = px[yi][:, xi]
                rows.append((img_id, encode_image(out, "rgb8"), out_w, out_h, "rgb8"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(run, schema)


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling: one rgb8 image row per sampled frame (indices
    0, every_n, 2*every_n, ...).

    The raw 'rawv8' format (frames as concatenated rgb8 planes) decodes for
    REAL: the frame count derives from the payload length (len // (w*h*3)),
    the slices are genuine data-plane work, and downstream image operators
    (checksums, stats, resize) consume the emitted rows unchanged — so the
    whole video -> frames -> per-frame features pipeline is tested and
    value-gated end-to-end. Container formats (mp4/webm) raise inside the
    kernel: decoding them needs codec libraries not present in this
    environment; the Spark-side plumbing is identical either way."""
    schema = StructType(
        [
            StructField("video_id", StringType()),
            StructField("frame_idx", LongType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data, w, h, fmt in zip(
                pdf["video_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                if fmt != "rawv8":
                    raise NotImplementedError(
                        f"frame decode for container format {fmt!r} requires "
                        "codec libraries (not available in this environment)"
                    )
                w, h = int(w), int(h)
                frame_size = w * h * 3
                n_frames = len(data) // frame_size
                for f in range(0, n_frames, every_n):
                    rows.append(
                        (vid, f, data[f * frame_size : (f + 1) * frame_size],
                         w, h, "rgb8")
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "bytes", "w", "h", "fmt"]
            )

    return df.select("video_id", "bytes", "w", "h", "fmt").mapInPandas(run, schema)


_AUDIO_SCHEMA = StructType(
    [
        StructField("audio_id", StringType()),
        StructField("win_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("peak", LongType()),
    ]
)


def audio_features(df: DataFrame, window_samples: int = 1024) -> DataFrame:
    """Windowed audio features over an opaque binary column: per window of
    `window_samples` samples, the integer energy (sum of squares), the
    zero-crossing count (strict-product-negative convention: a pair counts
    only when sample[i] * sample[i+1] < 0, so pairs straddling a zero sample
    do not count) and the absolute peak. The raw 'pcm16' format (little-endian int16 mono) decodes for
    REAL (np.frombuffer + reshape-by-window); codec/container formats
    (mp3/flac/ogg) raise inside the kernel — decoding them needs audio
    libraries not present in this environment, and the Spark-side plumbing
    (schema, Arrow batch shape, UDF signature) is identical either way.

    All outputs are int64 — exact in any engine, so the whole
    decode -> window -> feature pipeline is SQL-oracle-expressible
    (closed-form over the synthetic source; see the audio_features query).
    The trailing partial window is emitted with its true n_samples."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                if fmt != "pcm16":
                    raise NotImplementedError(
                        f"audio decode for format {fmt!r} requires codec "
                        "libraries (not available in this environment)"
                    )
                x = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = x.size
                for w0 in range(0, n, window_samples):
                    win = x[w0 : w0 + window_samples]
                    prod = win[:-1] * win[1:]
                    rows.append(
                        (
                            aid,
                            w0 // window_samples,
                            int(win.size),
                            int((win * win).sum()),
                            int((prod < 0).sum()),
                            int(np.abs(win).max()) if win.size else 0,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "win_idx", "n_samples", "energy",
                    "zero_crossings", "peak",
                ],
            )

    return df.select("audio_id", "bytes", "fmt").mapInPandas(run, _AUDIO_SCHEMA)
