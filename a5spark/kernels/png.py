"""Dependency-free PNG codec (stdlib zlib + numpy) — makes one container
image format REAL in environments without Pillow.

Scope: non-interlaced, bit depth 8, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA); all five filter types on decode.
Alpha is dropped on decode (matching Pillow's ``convert("RGB")`` for fully
opaque images — the only kind our encoder and pipelines produce); gray
replicates to 3 channels. The encoder writes filter-0 RGB rows with one
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


def png_encode(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"png_encode expects (h, w, 3) uint8, got {px.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0 = None) per row, then the raw row
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(h, w * 3)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
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


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. See module docstring for scope."""
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
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG unsupported")
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} unsupported")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    px = _unfilter(raw.reshape(h, 1 + stride), h, stride, ch)
    px = px.reshape(h, w, ch)
    if ctype == 2:
        return px
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
