"""Dependency-free PNG codec (stdlib zlib + numpy) — makes one container
image format REAL in environments without Pillow.

Decode scope (round 7 — full mainstream coverage): bit depths 1/2/4/8/16,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
interlace 0 and 1 (Adam7), all five filter types. Alpha is dropped on
decode (matching Pillow's ``convert("RGB")`` for fully opaque images — the
only kind our encoder and pipelines produce); gray replicates to 3
channels; 16-bit samples take their high byte (the standard 16->8
reduction); sub-byte grays scale exactly (255/(2^d-1) is integral for
d in {1,2,4}). The encoder writes filter-0 RGB rows (8-bit uint8 input or
16-bit uint16 input), optionally Adam7-interlaced, with one
zlib-compressed IDAT — the simplest spec-valid stream, chosen for
determinism (byte-stable output for byte-stable input), not ratio.

Reference for parity expectations: the a5-py pipeline treats image bytes as
opaque payloads; per the input_hint the per-row invariant is decoded-pixel
allclose, which for PNG (lossless) means exact equality.
"""

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter0_rows(px: np.ndarray) -> bytes:
    """(h, w, c) sample array -> filter-0 scanline bytes (big-endian for
    16-bit samples)."""
    h = px.shape[0]
    flat = px.reshape(h, -1)
    if px.dtype == np.uint16:
        body = flat.astype(">u2").view(np.uint8).reshape(h, -1)
    else:
        body = flat
    raw = np.empty((h, 1 + body.shape[1]), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = body
    return raw.tobytes()


def png_encode(px: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 (bit depth 8) or uint16 (bit depth 16) -> PNG bytes
    (color type 2, filter 0, optionally Adam7-interlaced)."""
    if px.dtype == np.uint16:
        depth = 16
        px = np.ascontiguousarray(px)
    else:
        depth = 8
        px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"png_encode expects (h, w, 3), got {px.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 2, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter0_rows(sub))
        raw = b"".join(parts)
    else:
        raw = _filter0_rows(px)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-row PNG filtering. raw is (h, 1 + stride) uint8 (filter byte
    per row). Filters None/Up are vectorized; Sub is a modular cumulative
    sum over bpp lanes; Average/Paeth fall back to a per-pixel row loop
    (sequential left-neighbor dependence — unavoidable per spec)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: recon[x] = row[x] + recon[x-bpp]
            for lane in range(bpp):
                np.add.accumulate(row[lane::bpp], out=row[lane::bpp],
                                  dtype=np.uint8)
        elif ftype == 2:  # Up
            row += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                row[x] = (int(row[x]) + pr) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = row
        prev = row
    return out


def _decode_pass(
    raw: np.ndarray, w: int, h: int, depth: int, ch: int
) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub-)image: `raw` starts at the pass's first
    filter byte. Returns ((h, w, ch) sample array in the stream's sample
    width, bytes consumed)."""
    rowbytes = (w * ch * depth + 7) // 8
    need = h * (1 + rowbytes)
    if raw.size < need:
        raise ValueError("PNG pixel data size mismatch")
    bpp = max(1, (ch * depth) // 8)
    rows = _unfilter(raw[:need].reshape(h, 1 + rowbytes), h, rowbytes, bpp)
    if depth == 8:
        px = rows.reshape(h, rowbytes)[:, : w * ch].reshape(h, w, ch)
    elif depth == 16:
        px = (
            rows.reshape(h, rowbytes)
            .view(">u2")[:, : w * ch]
            .astype(np.uint16)
            .reshape(h, w, ch)
        )
    else:  # 1 / 2 / 4 — gray or palette only (ch == 1)
        bits = np.unpackbits(rows, axis=1)  # (h, rowbytes*8), MSB first
        vals = bits[:, : w * depth * ch].reshape(h, -1, depth)
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
        px = (vals * weights).sum(axis=2).astype(np.uint8).reshape(h, w, ch)
    return px, need


def png_decode(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. See module docstring for scope.
    `max_pixels` (default 64M) bounds the frame allocation AND the inflate
    output (zlib is capped at exactly the expected filtered-byte count), so
    a corrupted or adversarial IHDR/IDAT fails fast instead of allocating
    gigabytes — the decompression-bomb guard a real-corpus pipeline needs.
    Error contract: malformed streams raise ValueError (never a raw
    zlib.error/struct.error/IndexError from the parser's internals)."""
    try:
        return _png_decode_impl(bytes(data), max_pixels)
    except (zlib.error, struct.error, KeyError, IndexError) as e:
        raise ValueError(f"malformed PNG stream: {e!r}") from e


def _png_decode_impl(data: bytes, max_pixels: int) -> np.ndarray:
    if bytes(data[:8]) != _SIGNATURE:
        raise ValueError("not a PNG stream (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    palette = None
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG stream missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    if depth not in (1, 2, 4, 8, 16) or (
        depth < 8 and ctype not in (0, 3)
    ) or (depth == 16 and ctype == 3):
        raise ValueError(f"invalid PNG depth/color combination {depth}/{ctype}")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if w == 0 or h == 0 or w * h > max_pixels:
        raise ValueError(
            f"PNG frame {w}x{h} outside the allowed pixel budget "
            f"({max_pixels})"
        )
    ch = _CHANNELS[ctype]

    def _pass_bytes(wp: int, hp: int) -> int:
        return hp * (1 + (wp * ch * depth + 7) // 8) if wp and hp else 0

    if interlace == 0:
        expected = _pass_bytes(w, h)
    else:
        expected = sum(
            _pass_bytes((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
        )
    dobj = zlib.decompressobj()
    raw_bytes = dobj.decompress(b"".join(idat), expected)
    # the cap bounds memory; completeness still matters — an IDAT that
    # would inflate PAST the declared frame is corruption (or a bomb) and
    # must flag, not silently truncate into plausible garbage pixels
    if dobj.unconsumed_tail and dobj.decompress(dobj.unconsumed_tail, 1):
        raise ValueError(
            "PNG pixel data exceeds the declared frame size"
        )
    raw = np.frombuffer(raw_bytes, dtype=np.uint8)
    sample_dtype = np.uint16 if depth == 16 else np.uint8
    if interlace == 0:
        px, _ = _decode_pass(raw, w, h, depth, ch)
    else:
        px = np.zeros((h, w, ch), dtype=sample_dtype)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (w - x0 + dx - 1) // dx
            hp = (h - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue
            sub, used = _decode_pass(raw[off:], wp, hp, depth, ch)
            off += used
            px[y0::dy, x0::dx] = sub

    # normalize sample width to 8-bit
    if depth == 16:
        px = (px >> 8).astype(np.uint8)
    elif depth < 8 and ctype == 0:
        px = (px * (255 // ((1 << depth) - 1))).astype(np.uint8)

    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # ctype == 3: palette lookup
    if palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    return palette[px[:, :, 0]]
