"""Dependency-free baseline JPEG codec (stdlib + numpy) — makes the most
common real-corpus image format REAL in environments without Pillow, the
same pattern as kernels/png.py did for PNG.

Scope:
 * decode — baseline DCT (SOF0), 8-bit, 1 or 3 components, any sampling
   factors with h,v <= 2 (4:4:4 / 4:2:2 / 4:2:0 / grayscale), stream-carried
   quantization and Huffman tables (arbitrary DHT, not just Annex K),
   restart intervals (DRI/RSTn). Progressive (SOF2), arithmetic coding, and
   12-bit precision raise NotImplementedError.
 * encode — SOF0, 8-bit, YCbCr (JFIF), 4:4:4 or 4:2:0, per-image OPTIMIZED
   canonical Huffman tables (frequency pass + libjpeg-style 16-bit length
   limiting with the reserved pseudo-symbol so no real code is all-ones),
   quality-scaled Annex-K quantization tables. Deterministic: byte-stable
   output for byte-stable input.

Per the input_hint the per-row invariant for lossy formats is decoded-pixel
PSNR >= 40 dB vs the source; the oracle query (entry_queries.q_image_jpeg_
psnr) gates exactly that on an rgb8 -> JPEG -> decode transcode. The
entropy layer is per-image Python over an int bit-buffer (symbols are
sequential by spec); DCT/IDCT, color transforms, and (de)quantization are
vectorized numpy over whole block batches.
"""

import struct

import numpy as np

# ITU T.81 Annex K base quantization tables (public spec constants)
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _zigzag_indices() -> np.ndarray:
    """(row, col) visit order of the JPEG zigzag as flat indices into an
    8x8 block (derived, not memorized: anti-diagonals, odd sums ascend
    rows, even sums descend)."""
    order = []
    for s in range(15):
        rows = range(max(0, s - 7), min(7, s) + 1)
        diag = [(r, s - r) for r in rows]
        if s % 2 == 0:
            diag.reverse()
        order.extend(diag)
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _zigzag_indices()          # block-flat index for zigzag pos
_UNZIGZAG = np.argsort(_ZIGZAG)      # zigzag pos for block-flat index

# orthonormal 8-point DCT-II matrix
_DCT_C = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _s = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _DCT_C[_k, _n] = _s * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = int(min(100, max(1, quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> float64 YCbCr (JFIF full-range BT.601)."""
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W % 8 == 0 -> (H//8 * W//8, 8, 8) in raster order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h8: int, w8: int) -> np.ndarray:
    return (
        blocks.reshape(h8, w8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(h8 * 8, w8 * 8)
    )


def _fdct_quant(blocks: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 64) zigzagged quantized coefficients."""
    f = np.einsum("kn,bnm,lm->bkl", _DCT_C, blocks - 128.0, _DCT_C)
    q = np.round(f / qtbl).astype(np.int32)
    return q.reshape(-1, 64)[:, _ZIGZAG]


# --- Huffman -----------------------------------------------------------------


def _build_optimal_code(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """Length-limited (<=16) canonical Huffman code for 256 symbols + the
    reserved pseudo-symbol 256 (freq 1) that guarantees no REAL symbol is
    assigned the all-ones code (libjpeg's jpeg_gen_optimal_table scheme).
    Returns (bits, vals): bits[i] = #codes of length i+1, vals = symbols
    in canonical order."""
    import heapq

    f = [(int(c), s) for s, c in enumerate(freq) if c > 0]
    if not f:  # table never referenced in the scan: legal empty DHT
        return [0] * 16, []
    f.append((1, 256))  # reserved pseudo-symbol
    heap = [(c, s, (s,)) for c, s in f]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for _, s in f}
    while len(heap) > 1:
        c1, t1, m1 = heapq.heappop(heap)
        c2, t2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (c1 + c2, min(t1, t2), m1 + m2))
    bits32 = [0] * 33
    for s, d in depth.items():
        bits32[min(d, 32)] += 1
    # libjpeg length-limit adjustment: fold codes longer than 16 upward
    for i in range(32, 16, -1):
        while bits32[i] > 0:
            j = i - 2
            while bits32[j] == 0:
                j -= 1
            bits32[i] -= 2
            bits32[i - 1] += 1
            bits32[j + 1] += 2
            bits32[j] -= 1
    # remove the pseudo-symbol: it sits among the longest codes
    for i in range(16, 0, -1):
        if bits32[i] > 0:
            bits32[i] -= 1
            break
    bits = bits32[1:17]
    # canonical symbol order: shorter lengths first; within a length, by
    # ascending symbol value (deterministic across runs)
    lengths: dict[int, int] = {}
    order = sorted((d, s) for s, d in depth.items() if s != 256)
    pos = 0
    vals = []
    for li, n in enumerate(bits, start=1):
        take = n
        while take > 0:
            _, s = order[pos]
            vals.append(s)
            lengths[s] = li
            pos += 1
            take -= 1
    return bits, vals


def _code_assignments(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment: symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for li, n in enumerate(bits, start=1):
        for _ in range(n):
            out[vals[k]] = (code, li)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """DPCM/AC coefficient -> (size category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for non-negative int64 < 2^53 (JPEG magnitudes
    cap at 11 bits): frexp's exponent IS the bit length, exactly."""
    return np.frexp(x.astype(np.float64))[1].astype(np.int64)


def _scan_symbols_vec(comp_zz, scan_order):
    """Vectorized pass 1 for one scan WITHOUT restart markers: the exact
    (symbol, appended-bits) stream `_block_symbols` produces block by block,
    computed over the whole scan at once. Returns (sym, tsel, is_dc,
    extra_val, extra_len) parallel arrays in emission order — byte-identity
    with the per-block reference is pinned by
    tests/test_round8.py::test_jpeg_encode_matches_reference_bytes."""
    B = len(scan_order)
    order_ci = np.fromiter((c for c, _ in scan_order), np.int64, B)
    order_bi = np.fromiter((b for _, b in scan_order), np.int64, B)
    zz = np.empty((B, 64), dtype=np.int64)
    for ci in np.unique(order_ci):
        m = order_ci == ci
        zz[m] = comp_zz[ci][order_bi[m]]

    # DC: DPCM per component along its scan subsequence
    dc = zz[:, 0]
    diff = np.empty(B, dtype=np.int64)
    for ci in np.unique(order_ci):
        idx = np.flatnonzero(order_ci == ci)
        d = dc[idx]
        diff[idx] = d - np.concatenate(([0], d[:-1]))
    s_dc = _bitlen(np.abs(diff))
    bits_dc = np.where(diff >= 0, diff, diff + (np.int64(1) << s_dc) - 1)

    # AC: run-length over the zigzag tail, ZRL for runs >= 16, EOB unless
    # the block's last nonzero sits at position 62
    ac = zz[:, 1:]
    rows, cols = np.nonzero(ac)
    vals = ac[rows, cols]
    n_nz = len(rows)
    if n_nz:
        first = np.empty(n_nz, dtype=bool)
        first[0] = True
        first[1:] = rows[1:] != rows[:-1]
        prev = np.empty(n_nz, dtype=np.int64)
        prev[1:] = cols[:-1]
        prev[first] = -1
        run = cols - prev - 1
        n_zrl = run >> 4
        rem = run & 15
        s_ac = _bitlen(np.abs(vals))
        sym_ac = (rem << 4) | s_ac
        bits_ac = np.where(vals >= 0, vals, vals + (np.int64(1) << s_ac) - 1)
        is_last = np.empty(n_nz, dtype=bool)
        is_last[-1] = True
        is_last[:-1] = rows[1:] != rows[:-1]
        last_col = np.full(B, -1, dtype=np.int64)
        last_col[rows[is_last]] = cols[is_last]
        w = n_zrl + 1
        per_block_w = np.bincount(rows, weights=w, minlength=B).astype(np.int64)
    else:
        last_col = np.full(B, -1, dtype=np.int64)
        per_block_w = np.zeros(B, dtype=np.int64)
    has_eob = (last_col != 62).astype(np.int64)

    tot_block = 1 + per_block_w + has_eob
    block_start = np.concatenate(([0], np.cumsum(tot_block[:-1])))
    N = int(tot_block.sum())
    sym = np.zeros(N, dtype=np.int64)  # unfilled slots ARE the EOBs (0x00)
    extra_val = np.zeros(N, dtype=np.int64)
    extra_len = np.zeros(N, dtype=np.int64)
    is_dc = np.zeros(N, dtype=bool)

    sym[block_start] = s_dc
    extra_val[block_start] = bits_dc
    extra_len[block_start] = s_dc
    is_dc[block_start] = True

    if n_nz:
        cw = np.cumsum(w)
        first_idx = np.flatnonzero(first)
        base = cw[first_idx] - w[first_idx]
        row_base = np.repeat(
            base, np.diff(np.concatenate((first_idx, [n_nz])))
        )
        off = block_start[rows] + 1 + (cw - w - row_base)
        acpos = off + n_zrl
        sym[acpos] = sym_ac
        extra_val[acpos] = bits_ac
        extra_len[acpos] = s_ac
        tz = int(n_zrl.sum())
        if tz:
            zi = np.flatnonzero(n_zrl > 0)
            counts = n_zrl[zi]
            rep = np.repeat(np.arange(len(zi)), counts)
            intra = np.arange(tz) - np.repeat(
                np.cumsum(counts) - counts, counts
            )
            sym[off[zi][rep] + intra] = 0xF0

    tsel = np.repeat(np.where(order_ci == 0, 0, 1), tot_block)
    return sym, tsel, is_dc, extra_val, extra_len


def _codes_to_arrays(codes: dict) -> tuple[np.ndarray, np.ndarray]:
    carr = np.zeros(257, dtype=np.int64)
    larr = np.zeros(257, dtype=np.int64)
    for s, (c, ln) in codes.items():
        carr[s] = c
        larr[s] = ln
    return carr, larr


def _pack_scan_vec(parts, dc_codes, ac_codes) -> bytes:
    """Vectorized pass 2 for one scan WITHOUT restart markers: expand the
    (huffman code, appended bits) pairs to a bit array, np.packbits
    (MSB-first, the JPEG order), pad with 1s to a byte boundary and stuff
    0x00 after every 0xFF — bit/byte-identical to _BitWriter."""
    sym, tsel, is_dc, extra_val, extra_len = parts
    n = len(sym)
    huff_code = np.zeros(n, dtype=np.int64)
    huff_len = np.zeros(n, dtype=np.int64)
    for t in (0, 1):
        for cls, codes in ((0, dc_codes[t]), (1, ac_codes[t])):
            m = (tsel == t) & (is_dc == (cls == 0))
            if not m.any():
                continue
            carr, larr = _codes_to_arrays(codes)
            huff_code[m] = carr[sym[m]]
            huff_len[m] = larr[sym[m]]
    codes2 = np.empty(2 * n, dtype=np.int64)
    lens2 = np.empty(2 * n, dtype=np.int64)
    codes2[0::2] = huff_code
    codes2[1::2] = extra_val
    lens2[0::2] = huff_len
    lens2[1::2] = extra_len
    total = int(lens2.sum())
    pad = (-total) % 8
    if pad:
        codes2 = np.append(codes2, (1 << pad) - 1)
        lens2 = np.append(lens2, pad)
        total += pad
    elems = np.repeat(np.arange(len(codes2)), lens2)
    starts = np.cumsum(lens2) - lens2
    j = np.arange(total) - np.repeat(starts, lens2)
    bits = ((codes2[elems] >> (lens2[elems] - 1 - j)) & 1).astype(np.uint8)
    packed = np.packbits(bits)
    stuff = np.flatnonzero(packed == 0xFF)
    if len(stuff):
        packed = np.insert(packed, stuff + 1, 0)
    return packed.tobytes()


def _block_symbols(zz: np.ndarray, prev_dc: int):
    """One zigzagged block -> (dc_sym, dc_bits, [(ac_sym, ac_bits, ac_len)],
    new_prev_dc)."""
    dc = int(zz[0])
    s, bits = _magnitude(dc - prev_dc)
    acs = []
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = -1
    for idx in nz:
        run = int(idx) - last - 1
        last = int(idx)
        while run >= 16:
            acs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        asize, abits = _magnitude(int(zz[1 + idx]))
        acs.append(((run << 4) | asize, abits, asize))
    if last != 62:
        acs.append((0x00, 0, 0))  # EOB
    return s, bits, acs, dc


def jpeg_encode(
    px: np.ndarray,
    quality: int = 98,
    subsampling: str = "444",
    restart_interval: int = 0,
    interleave: bool = True,
    _force_reference: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grayscale with subsampling='gray')
    -> baseline JFIF JPEG bytes. A non-zero `restart_interval` emits
    DRI + RSTn markers every that many MCUs (the resynchronization points
    real encoders emit for error resilience). `interleave=False` emits one
    NON-interleaved scan per component (T.81 A.2 — a spec-legal baseline
    layout some encoders produce; pairs with the decoder's ns=1 path)."""
    samplings = {
        "444": [(1, 1), (1, 1), (1, 1)],
        "422": [(2, 1), (1, 1), (1, 1)],
        "420": [(2, 2), (1, 1), (1, 1)],
        "gray": [(1, 1)],
    }
    if subsampling not in samplings:
        raise ValueError(f"subsampling must be one of {sorted(samplings)}")
    sampling = samplings[subsampling]
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if subsampling == "gray":
        if px.ndim == 3:
            px = _rgb_to_ycbcr(px)[..., 0]
        full_planes = [px.astype(np.float64)]
    else:
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError(
                f"jpeg_encode expects (h, w, 3) uint8, got {px.shape}"
            )
        ycc = _rgb_to_ycbcr(px)
        full_planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    h, w = px.shape[:2]
    qy, qc = _quality_tables(quality)
    hmax = max(hh for hh, _ in sampling)
    vmax = max(vv for _, vv in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component zigzagged quantized blocks, raster order: pad the full
    # plane to the MCU grid, then box-mean subsample each component to its
    # sampling share so every component tiles the grid exactly
    comp_zz = []
    comp_w8 = []
    for ci, plane in enumerate(full_planes):
        hh, vv = sampling[ci]
        fy, fx = vmax // vv, hmax // hh
        p = np.pad(
            plane,
            ((0, 8 * vmax * mcus_y - h), (0, 8 * hmax * mcus_x - w)),
            mode="edge",
        )
        if fy > 1 or fx > 1:
            p = p.reshape(
                p.shape[0] // fy, fy, p.shape[1] // fx, fx
            ).mean((1, 3))
        zz = _fdct_quant(_to_blocks(p), qy if ci == 0 else qc)
        comp_zz.append(zz)
        comp_w8.append(p.shape[1] // 8)

    # MCU scan order: interleave per spec
    ncomp = len(sampling)
    order = []  # (comp, block_index) in scan order
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                hh, vv = sampling[ci]
                for by in range(vv):
                    for bx in range(hh):
                        order.append(
                            (ci, (my * vv + by) * comp_w8[ci] + mx * hh + bx)
                        )

    # scan layout: one interleaved scan over `order`, or (interleave=False)
    # one non-interleaved scan per component over that component's OWN
    # block grid in raster order (T.81 A.2), DC prediction independent per
    # scan. Restart markers are only emitted for the interleaved layout.
    if interleave or ncomp == 1:
        scan_orders = [order]
    else:
        if restart_interval:
            raise ValueError(
                "restart_interval with interleave=False is not supported"
            )
        scan_orders = []
        for ci in range(ncomp):
            hh, vv = sampling[ci]
            cw = -(-w * hh // hmax)
            chh = -(-h * vv // vmax)
            bwc = -(-cw // 8)
            bhc = -(-chh // 8)
            scan_orders.append(
                [
                    (ci, by * comp_w8[ci] + bx)
                    for by in range(bhc)
                    for bx in range(bwc)
                ]
            )

    # pass 1: symbol stream + frequencies (DC prediction resets at every
    # restart boundary and at every scan start, matching the decoder).
    # Restart-free scans (the hot path) run the fully vectorized pass;
    # restart layouts keep the per-block reference walk — the two produce
    # byte-identical streams (pinned by test_round8).
    blocks_per_mcu = sum(hh * vv for hh, vv in sampling)
    dc_freq = [np.zeros(257, dtype=np.int64), np.zeros(257, dtype=np.int64)]
    ac_freq = [np.zeros(257, dtype=np.int64), np.zeros(257, dtype=np.int64)]
    use_vec = not restart_interval and not _force_reference
    if use_vec:
        scan_parts = [
            _scan_symbols_vec(comp_zz, scan_order)
            for scan_order in scan_orders
        ]
        for sym, tsel, is_dc, _, _ in scan_parts:
            for t in (0, 1):
                dc_freq[t] += np.bincount(
                    sym[is_dc & (tsel == t)], minlength=257
                )
                ac_freq[t] += np.bincount(
                    sym[~is_dc & (tsel == t)], minlength=257
                )
        streams = None
    else:
        streams = []
        for scan_order in scan_orders:
            prev_dc = [0, 0, 0]
            stream = []
            for idx, (ci, bi) in enumerate(scan_order):
                if (
                    restart_interval
                    and idx % blocks_per_mcu == 0
                    and idx
                    and (idx // blocks_per_mcu) % restart_interval == 0
                ):
                    prev_dc = [0, 0, 0]
                t = 0 if ci == 0 else 1
                s, bits, acs, prev = _block_symbols(comp_zz[ci][bi], prev_dc[ci])
                prev_dc[ci] = prev
                dc_freq[t][s] += 1
                for sym, _, _ in acs:
                    ac_freq[t][sym] += 1
                stream.append((t, s, bits, acs))
            streams.append(stream)

    dc_tables = [_build_optimal_code(f[:256]) for f in dc_freq]
    ac_tables = [_build_optimal_code(f[:256]) for f in ac_freq]
    dc_codes = [_code_assignments(*t) for t in dc_tables]
    ac_codes = [_code_assignments(*t) for t in ac_tables]

    # pass 2: one entropy-coded segment per scan (flush + RSTn at restart
    # boundaries within the interleaved scan)
    if use_vec:
        scan_ecs = [
            _pack_scan_vec(parts, dc_codes, ac_codes) for parts in scan_parts
        ]
    else:
        scan_ecs = []
        for stream in streams:
            parts = []
            bw = _BitWriter()
            for idx, (t, s, bits, acs) in enumerate(stream):
                if (
                    restart_interval
                    and idx % blocks_per_mcu == 0
                    and idx
                    and (idx // blocks_per_mcu) % restart_interval == 0
                ):
                    parts.append(bw.flush())
                    rst = (idx // blocks_per_mcu) // restart_interval - 1
                    parts.append(struct.pack(">H", 0xFFD0 + (rst % 8)))
                    bw = _BitWriter()
                code, ln = dc_codes[t][s]
                bw.put(code, ln)
                if s:
                    bw.put(bits, s)
                for sym, abits, asize in acs:
                    code, ln = ac_codes[t][sym]
                    bw.put(code, ln)
                    if asize:
                        bw.put(abits, asize)
            parts.append(bw.flush())
            scan_ecs.append(b"".join(parts))

    # headers
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    n_tables = 1 if ncomp == 1 else 2
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, tbl in ((0, qy), (1, qc))[:n_tables]:
        out += seg(0xFFDB, bytes([tid]) + bytes(
            int(x) for x in tbl.reshape(64)[_ZIGZAG]
        ))
    comps = b""
    for ci in range(ncomp):
        hh, vv = sampling[ci]
        comps += bytes([ci + 1, (hh << 4) | vv, 0 if ci == 0 else 1])
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    for cls, tables in ((0, dc_tables), (1, ac_tables)):
        for tid, (bits_list, vals) in enumerate(tables[:n_tables]):
            out += seg(
                0xFFC4,
                bytes([(cls << 4) | tid]) + bytes(bits_list) + bytes(vals),
            )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    if len(scan_ecs) == 1:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            t = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += seg(0xFFDA, sos)
        out += scan_ecs[0]
    else:  # one non-interleaved SOS per component
        for ci, ecs in enumerate(scan_ecs):
            t = 0 if ci == 0 else 1
            sos = bytes([1, ci + 1, (t << 4) | t, 0, 63, 0])
            out += seg(0xFFDA, sos)
            out += ecs
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------


class _HuffTable:
    """Canonical Huffman decode, two-level: an 8-bit fast table resolves
    codes up to 8 bits (the frequent symbols of an optimized table — the
    overwhelming majority of decoded symbols) in one peek + one list read,
    each entry packing (code length << 9) | symbol; longer codes fall back
    to the T.81 F.2.2.3 canonical walk over (mincode, maxcode, valptr).

    Why not the historic full 16-bit LUT: building 64Ki entries (numpy
    fill + tolist) cost ~1.3 ms per table — and this codec emits per-image
    OPTIMIZED tables, so a decode corpus never repeats tables and paid 4
    builds per image, measured ~40% of total decode wall for small images.
    The 256-entry build is ~20 us; the rare long-code walk is O(8)."""

    __slots__ = ("fast", "mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list[int], vals: bytes):
        fast = np.zeros(256, dtype=np.int32)
        mincode = [0] * 17
        maxcode = [-1] * 17
        valptr = [0] * 17
        code = 0
        k = 0
        for li in range(1, 17):
            n = bits[li - 1]
            valptr[li] = k
            mincode[li] = code
            if n:
                if li <= 8:
                    span = 1 << (8 - li)
                    start = code << (8 - li)
                    syms = np.frombuffer(
                        vals[k : k + n], dtype=np.uint8
                    ).astype(np.int32)
                    fast[start : start + n * span] = (li << 9) | np.repeat(
                        syms, span
                    )
                maxcode[li] = code + n - 1
                code += n
                k += n
            code <<= 1
        # plain list: CPython list indexing avoids numpy scalar boxing in
        # the per-symbol hot loop
        self.fast = fast.tolist()
        self.mincode = mincode
        self.maxcode = maxcode
        self.valptr = valptr
        self.vals = bytes(vals)

    def slow(self, window16: int) -> int:
        """Decode a >8-bit code from the full 16-bit window; returns the
        same (length << 9) | symbol packing as the fast table."""
        for li in range(9, 17):
            c = window16 >> (16 - li)
            if c <= self.maxcode[li]:
                return (li << 9) | self.vals[self.valptr[li] + c - self.mincode[li]]
        raise ValueError("invalid JPEG Huffman code")


_HUFF_CACHE: dict[bytes, _HuffTable] = {}


def _huff_table(bits: list[int], vals: bytes) -> _HuffTable:
    key = bytes(bits) + b"|" + bytes(vals)
    t = _HUFF_CACHE.get(key)
    if t is None:
        while len(_HUFF_CACHE) > 64:  # bound the cache across a long worker
            # FIFO eviction of the oldest entry (dict preserves insertion
            # order) — a full clear() dropped hot entries too, re-paying
            # every table build right after the bound tripped
            _HUFF_CACHE.pop(next(iter(_HUFF_CACHE)))
        t = _HuffTable(bits, vals)
        _HUFF_CACHE[key] = t
    return t


def jpeg_decode(data: bytes, max_pixels: int = 1 << 26) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB. See module docstring.
    Handles interleaved AND non-interleaved scans (a baseline file may
    carry one multi-component scan or several sequential single-component
    scans, T.81 A.2) and fill bytes before markers (B.1.1.2).
    `max_pixels` (default 64M) bounds the frame allocation — a corrupted
    or adversarial SOF declaring 65535x65535 must fail fast instead of
    allocating gigabytes mid-ingest (the decompression-bomb guard a
    real-corpus pipeline needs; Pillow ships the same).

    Error contract (a corrupt-file hygiene a corpus ingest relies on):
    malformed streams raise ValueError, unsupported-but-valid features
    raise NotImplementedError — never a raw KeyError/IndexError/
    struct.error from the parser's internals."""
    try:
        return _jpeg_decode_impl(bytes(data), max_pixels)
    except (KeyError, IndexError, StopIteration, struct.error, OverflowError) as e:
        # OverflowError: a corrupt DHT can define magnitude categories far
        # past T.81's caps, accumulating a DC predictor outside int32
        raise ValueError(f"malformed JPEG stream: {e!r}") from e


def _jpeg_decode_impl(data: bytes, max_pixels: int) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    coeff: dict[int, np.ndarray] = {}  # component id -> (n_blocks, 64)
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # any number of 0xFF fill bytes may precede a marker (T.81 B.1.1.2)
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2:  # would loop forever on a corrupted length field
            raise ValueError(f"invalid JPEG segment length {seglen}")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq = body[bp] >> 4
                tid = body[bp] & 0x0F
                if pq == 0:
                    tbl = np.frombuffer(body[bp + 1 : bp + 65], dtype=np.uint8)
                    bp += 65
                else:
                    tbl = np.frombuffer(
                        body[bp + 1 : bp + 129], dtype=">u2"
                    )
                    bp += 129
                out = np.zeros(64, dtype=np.int32)
                out[_ZIGZAG] = tbl.astype(np.int32)
                qtables[tid] = out.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                cls = body[bp] >> 4
                tid = body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nv = sum(bits)
                vals = body[bp + 17 : bp + 17 + nv]
                htables[(cls, tid)] = _huff_table(bits, vals)
                bp += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1 (baseline-ish)
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            if h == 0 or w == 0 or h * w > max_pixels:
                raise ValueError(
                    f"JPEG frame {w}x{h} outside the allowed pixel budget "
                    f"({max_pixels})"
                )
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            for c in comps:
                if c["h"] not in (1, 2) or c["v"] not in (1, 2):
                    raise NotImplementedError(
                        f"sampling {c['h']}x{c['v']} unsupported"
                    )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                comp = next(c for c in comps if c["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            # entropy-coded data runs to the next non-RST marker
            end = pos
            while end + 1 < n:
                if data[end] == 0xFF and data[end + 1] not in (0x00,) and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    break
                end += 1
            ecs = data[pos:end]
            pos = end
            _decode_scan(
                ecs, scan, comps, h, w, htables, restart_interval, coeff
            )
            if len(coeff) == len(comps):
                return _assemble(coeff, comps, h, w, qtables)
    if coeff and comps is not None and len(coeff) < len(comps):
        raise ValueError(
            "JPEG stream ended before every frame component was scanned"
        )
    raise ValueError("JPEG stream has no SOS scan")


def _frame_geometry(comps, h, w):
    """MCU grid + per-component FRAME block dims (interleaved padding)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _decode_scan(ecs, scan, comps, h, w, htables, restart_interval, coeff):
    """Decode one scan's entropy data into `coeff[component id]` — a
    frame-geometry (n_blocks, 64) zigzag-order array per component. A scan
    with ns > 1 is interleaved (MCU = sampling-factor block cluster); a
    single-component scan is NON-interleaved per T.81 A.2: the MCU is one
    data unit and the block grid is the component's own ceil(cw/8) x
    ceil(ch/8), written into the frame-padded grid (padding blocks stay
    zero and are cropped away after upsampling)."""
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(comps, h, w)

    # frame-geometry storage per scanned component (zigzag order per block)
    store = []
    for c, _, _ in scan:
        bw = mcus_x * c["h"]
        bh = mcus_y * c["v"]
        store.append(
            coeff.setdefault(c["id"], np.zeros((bh * bw, 64), dtype=np.int32))
        )

    # restart segments: split on RSTn, unstuff each
    if restart_interval:
        segments = []
        cur = bytearray()
        i = 0
        while i < len(ecs):
            if ecs[i] == 0xFF and i + 1 < len(ecs):
                nxt = ecs[i + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
            cur.append(ecs[i])
            i += 1
        segments.append(bytes(cur))
    else:
        segments = [ecs.replace(b"\xff\x00", b"\xff")]

    # unit plan: every (si, block index) in scan order, once — the entropy
    # loop below is the decode hot path, so the bit-reader state lives in
    # plain locals and decoded coefficients buffer into Python lists that
    # bulk-assign per component at the end (optimization round 8; ~3x over
    # the per-block method-call form, same error contract — the int32
    # bounds check reproduces the historic OverflowError on a corrupt DHT
    # blowing the DC predictor out of range)
    interleaved = len(scan) > 1
    if interleaved:
        n_units = mcus_x * mcus_y
        plan = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for si, (c, _, _) in enumerate(scan):
                    bw_c = mcus_x * c["h"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            plan.append(
                                (si, (my * c["v"] + by) * bw_c + mx * c["h"] + bx)
                            )
        blocks_per_unit = len(plan) // n_units
    else:
        # non-interleaved: the component's OWN block grid, raster order
        c0 = scan[0][0]
        cw = -(-w * c0["h"] // hmax)
        chh = -(-h * c0["v"] // vmax)
        ni_bw = -(-cw // 8)
        ni_bh = -(-chh // 8)
        n_units = ni_bw * ni_bh
        stride = mcus_x * c0["h"]  # frame-padded row stride
        plan = [
            (0, by * stride + bx) for by in range(ni_bh) for bx in range(ni_bw)
        ]
        blocks_per_unit = 1

    luts = []
    for _, td, ta in scan:
        dc_t = htables[(0, td)]
        ac_t = htables[(1, ta)]
        luts.append((dc_t.fast, dc_t, ac_t.fast, ac_t))

    idx_out = [[] for _ in scan]
    val_out = [[] for _ in scan]
    seg_bound = restart_interval * blocks_per_unit if restart_interval else 0
    n_seg_needed = (
        (len(plan) + seg_bound - 1) // seg_bound if seg_bound else 1
    )
    if len(segments) < n_seg_needed:
        # the historic per-unit reader hit IndexError on segments[] here
        raise ValueError(
            "JPEG entropy data ends before every MCU (missing restart segment)"
        )
    for seg_idx, seg in enumerate(segments):
        data_s = seg
        ns = len(data_s)
        acc = 0
        nbits = 0
        posn = 0
        pred = [0] * len(scan)
        lo = seg_idx * seg_bound if seg_bound else 0
        hi = min(lo + seg_bound, len(plan)) if seg_bound else len(plan)
        # per-symbol budget: 16 huffman + 15 appended bits, so filling the
        # buffer to >=31 bits ONCE per symbol lets huffman consume and the
        # appended-bits extraction share a single acc mask (measured ~1.4x
        # on the loop vs the two-phase fill)
        for si, bi in plan[lo:hi]:
            dc_fast, dc_t, ac_fast, ac_t = luts[si]
            il = idx_out[si]
            vl = val_out[si]
            base = bi << 6
            # DC
            while nbits < 31:
                acc = (acc << 8) | (data_s[posn] if posn < ns else 0)
                posn += 1
                nbits += 8
            e = dc_fast[(acc >> (nbits - 8)) & 0xFF]
            if e == 0:
                e = dc_t.slow((acc >> (nbits - 16)) & 0xFFFF)
            li = e >> 9
            s = e & 0x1FF
            if s > 11:  # T.81 F.1.2.1: 8-bit DC magnitude cap
                raise ValueError(
                    f"JPEG DC magnitude category {s} out of range"
                )
            if s:
                nbits -= li + s
                v = (acc >> nbits) & ((1 << s) - 1)
                if v < (1 << (s - 1)):
                    v += 1 - (1 << s)
                pred[si] += v
            else:
                nbits -= li
            acc &= (1 << nbits) - 1
            p = pred[si]
            if p:
                il.append(base)
                vl.append(p)
            # AC
            k = 1
            while k < 64:
                while nbits < 31:
                    acc = (acc << 8) | (data_s[posn] if posn < ns else 0)
                    posn += 1
                    nbits += 8
                e = ac_fast[(acc >> (nbits - 8)) & 0xFF]
                if e == 0:
                    e = ac_t.slow((acc >> (nbits - 16)) & 0xFFFF)
                li = e >> 9
                rs = e & 0x1FF
                size = rs & 0x0F
                if size == 0:
                    nbits -= li
                    acc &= (1 << nbits) - 1
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    break  # EOB
                k += rs >> 4
                if k > 63:
                    raise ValueError("JPEG AC run past block end")
                nbits -= li + size
                v = (acc >> nbits) & ((1 << size) - 1)
                acc &= (1 << nbits) - 1
                if v < (1 << (size - 1)):
                    v += 1 - (1 << size)
                il.append(base + k)
                vl.append(v)
                k += 1

    for si in range(len(scan)):
        if not idx_out[si]:
            continue
        vals64 = np.asarray(val_out[si], dtype=np.int64)
        if vals64.max() > 2147483647 or vals64.min() < -2147483648:
            raise OverflowError("JPEG DC predictor outside int32 range")
        store[si].reshape(-1)[np.asarray(idx_out[si], dtype=np.int64)] = (
            vals64.astype(np.int32)
        )


def _assemble(coeff, comps, h, w, qtables):
    """Dequantize + IDCT + upsample + color-convert the accumulated
    per-component coefficient grids (vectorized per component)."""
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(comps, h, w)
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        zz = coeff[c["id"]]
        spatial = _dequant_idct_zz(zz, q)
        bw_c = mcus_x * c["h"]
        bh_c = mcus_y * c["v"]
        plane = _from_blocks(spatial, bh_c, bw_c)
        # upsample to full MCU-grid resolution
        ry = (8 * vmax * mcus_y) // plane.shape[0]
        rx = (8 * hmax * mcus_x) // plane.shape[1]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, np.newaxis], 3, axis=2)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])


def _dequant_idct_zz(zz: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """(n, 64) zigzag-order coefficients + row-major 8x8 qtable ->
    (n, 8, 8) spatial."""
    coef = np.zeros((zz.shape[0], 64), dtype=np.float64)
    coef[:, _ZIGZAG] = zz  # zigzag pos k lands at block-flat _ZIGZAG[k]
    coef *= qtbl.reshape(64)[np.newaxis, :]
    coef = coef.reshape(-1, 8, 8)
    return np.einsum("kn,bkl,lm->bnm", _DCT_C, coef, _DCT_C) + 128.0
