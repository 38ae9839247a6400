"""Baseline JPEG codec — pure stdlib + numpy, no codec library.

Decoder: baseline sequential DCT JFIF/EXIF files (SOF0/SOF1): Huffman
entropy decode, dequantize, 8x8 IDCT, chroma upsampling (any integer
sampling factors incl. 4:2:0/4:2:2), YCbCr→RGB, restart markers.
Progressive (SOF2) and arithmetic-coded files raise NotImplementedError
with a clear message — they are a different scan structure, not a
different kind of plumbing.

Encoder: baseline sequential, 4:4:4 or 4:2:0, grayscale or RGB, Annex-K
quant tables scaled by `quality`. The Huffman tables are CANONICAL
FLAT tables (every DC category 4 bits, every AC run/size symbol 8
bits) generated programmatically — valid baseline JPEG (any decoder
reads the DHT from the stream), a few percent larger than the Annex-K
defaults, and zero spec constants to mistype. Encoder and decoder are
therefore self-consistent by construction: tables travel in the file.

Reference parity: the reference pipeline decodes scraped JPEGs with
cv2 (`anonymize_face.py:24-31`); this gives the same capability
without the native dependency. Per-image cost is Python-level — at
production scale swap in a native codec behind the same
(bytes) -> (w, h, c, pixels) contract; the Spark-side mapInPandas
plumbing in `sources/binary.py` is unchanged.
"""

from __future__ import annotations

import numpy as np

# zigzag scan order: ZIGZAG[i] = raster index of the i-th scanned coef
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# ITU T.81 Annex K.1 quantization tables (public spec constants)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99]
    + [18, 21, 26, 66, 99, 99, 99, 99]
    + [24, 26, 56, 99, 99, 99, 99, 99]
    + [47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.float64,
)


def _idct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT basis: spatial = A @ coef @ A.T."""
    a = np.zeros((8, 8))
    for x in range(8):
        for u in range(8):
            cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
            a[x, u] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _idct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg convention)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.floor((base * scale + 50) / 100)
    return np.clip(t, 1, 255)


# ---------------------------------------------------------------------------
# Huffman tables: canonical flat layout (see module docstring)
# ---------------------------------------------------------------------------


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL spec for a canonical table where every symbol has the
    same code `length`. Requires len(symbols) < 2**length so the
    all-ones code stays unused (T.81 C.2 convention)."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for flat code length")
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return counts, symbols


_DC_SYMBOLS = list(range(12))  # categories 0..11
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]  # EOB, ZRL, then (run, size)


class _HuffDecoder:
    def __init__(self, counts: list[int], symbols: list[int]):
        if len(counts) < 16 or sum(counts) > len(symbols):
            raise ValueError("truncated jpeg DHT segment")
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                k += 1
                code += 1
            code <<= 1


def _encoder_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# bit I/O with 0xFF00 byte stuffing
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.d
        if self.pos >= len(d):
            raise ValueError("unexpected end of entropy-coded data")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-read: caller resyncs
                raise _RestartMarker()
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        return b

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.cur = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.nbits = 0
        d = self.d
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    pass


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)

    def restart_marker(self, n: int) -> None:
        """Byte-align and emit RSTn (markers are NOT byte-stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (n % 8)])


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_huff(br: _BitReader, table: _HuffDecoder) -> int:
    code = 0
    lookup = table.lookup
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _decode_block(
    br: _BitReader,
    dc_tab: _HuffDecoder,
    ac_tab: _HuffDecoder,
    pred: int,
) -> tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    t = _decode_huff(br, dc_tab)
    pred += _extend(br.read_bits(t), t)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    return zz, pred


def decode_jpeg(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode baseline JPEG bytes → (width, height, channels, flat uint8
    row-major pixels). Channels is 1 (grayscale) or 3 (RGB)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (w, h, [(cid, hsamp, vsamp, tq)])
    pos = 2
    scan = None
    while pos < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        m = b[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(b[pos : pos + 2], "big")
        seg = b[pos + 2 : pos + seg_len]
        if m == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    i += 64
                else:
                    tbl = np.frombuffer(
                        seg[i : i + 128], dtype=">u2"
                    ).astype(np.float64)
                    i += 128
                qt[tid] = tbl
        elif m in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif m == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2): only baseline sequential supported"
            )
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{m - 0xC0} coding process not supported (baseline only)"
            )
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = list(seg[i + 17 : i + 17 + nsym])
                table = _HuffDecoder(counts, symbols)
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + nsym
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            ncomp = seg[0]
            scan_tables = {}
            for c in range(ncomp):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cid] = (tt >> 4, tt & 0x0F)
            scan = (scan_tables, pos + seg_len)
            break
        pos += seg_len
    if frame is None or scan is None:
        raise ValueError("jpeg missing SOF/SOS")

    w, h, comps = frame
    scan_tables, data_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    preds = {cid: 0 for cid, *_ in comps}
    br = _BitReader(b, data_pos)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                br.sync_restart()
                preds = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                dc_t, ac_t = scan_tables[cid]
                for by in range(vs):
                    for bx in range(hs):
                        try:
                            zz, preds[cid] = _decode_block(
                                br, huff_dc[dc_t], huff_ac[ac_t], preds[cid]
                            )
                        except _RestartMarker as exc:
                            raise ValueError(
                                "restart marker without DRI accounting"
                            ) from exc
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qt[tq]
                        blk = _A @ coef.reshape(8, 8) @ _A.T + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_index += 1

    # upsample each component to full MCU-padded resolution, then crop
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out.reshape(-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.reshape(-1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_plane_block(
    bw: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred: int,
) -> int:
    coef = _A.T @ (block - 128.0) @ _A
    zz = np.round(coef.reshape(-1)[ZIGZAG] / quant).astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, n = dc_codes[t]
    bw.write(code, n)
    if t:
        bw.write(_magnitude_bits(diff, t), t)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 2) if len(last_nz) else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, n = ac_codes[0xF0]  # ZRL
            bw.write(code, n)
            run -= 16
        s = _category(v)
        code, n = ac_codes[(run << 4) | s]
        bw.write(code, n)
        bw.write(_magnitude_bits(v, s), s)
        run = 0
    if end < 64:
        code, n = ac_codes[0x00]  # EOB
        bw.write(code, n)
    return dc


def _pad_to_multiple(p: np.ndarray, m: int) -> np.ndarray:
    h, w = p.shape
    return np.pad(p, ((0, (-h) % m), (0, (-w) % m)), mode="edge")


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes | np.ndarray,
    *,
    channels: int = 3,
    quality: int = 85,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode row-major uint8 pixels as a baseline JPEG.

    `subsample`: '444' (no chroma subsampling) or '420' (2x2 box-mean
    chroma). Grayscale input (`channels=1`) ignores `subsample`.
    `restart_interval`: emit a DRI segment and an RSTn marker every N
    MCUs (0 = none) — what a streaming scraper's camera files carry.
    """
    px = np.asarray(
        np.frombuffer(pixels, dtype=np.uint8)
        if isinstance(pixels, (bytes, bytearray))
        else pixels,
        dtype=np.float64,
    ).reshape(height, width, channels)
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    ql_z = ql.reshape(-1)[ZIGZAG]  # tables stored in zigzag order
    qc_z = qc.reshape(-1)[ZIGZAG]

    if channels == 1:
        planes = [px[:, :, 0]]
        samp = [(1, 1)]
        quants = [(0, ql, ql_z)]
    elif channels == 3:
        r, g, bl = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        if subsample == "420":
            cbp = _pad_to_multiple(cb, 2)
            crp = _pad_to_multiple(cr, 2)
            cb = (
                cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]
            ) / 4.0
            cr = (
                crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]
            ) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsample must be '444' or '420', got {subsample!r}")
        planes = [y, cb, cr]
        quants = [(0, ql, ql_z), (1, qc, qc_z), (1, qc, qc_z)]
    else:
        raise ValueError("channels must be 1 or 3")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    padded = [
        np.pad(
            p,
            ((0, mcuy * vs * 8 - p.shape[0]), (0, mcux * hs * 8 - p.shape[1])),
            mode="edge",
        )
        for p, (hs, vs) in zip(planes, samp)
    ]

    dc_counts, dc_syms = _flat_table(_DC_SYMBOLS, 4)
    ac_counts, ac_syms = _flat_table(_AC_SYMBOLS, 8)
    dc_codes = _encoder_codes(dc_counts, dc_syms)
    ac_codes = _encoder_codes(ac_counts, ac_syms)

    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_index = 0
    rst_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.restart_marker(rst_count)
                rst_count += 1
                preds = [0] * len(planes)
            mcu_index += 1
            for ci, (p, (hs, vs), (_, _q, qz)) in enumerate(
                zip(padded, samp, quants)
            ):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        preds[ci] = _encode_plane_block(
                            bw,
                            p[y0 : y0 + 8, x0 : x0 + 8],
                            qz,
                            dc_codes,
                            ac_codes,
                            preds[ci],
                        )
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql_z.astype(np.uint8)))
    if channels == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qc_z.astype(np.uint8)))
    ncomp = len(planes)
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(ncomp)
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, quants[ci][0]])
    out += seg(0xC0, bytes(sof))
    for tc_th, (counts, syms) in (
        (0x00, (dc_counts, dc_syms)),
        (0x10, (ac_counts, ac_syms)),
        (0x01, (dc_counts, dc_syms)),
        (0x11, (ac_counts, ac_syms)),
    ):
        if ncomp == 1 and tc_th in (0x01, 0x11):
            continue
        out += seg(0xC4, bytes([tc_th]) + bytes(counts) + bytes(syms))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        table = 0x00 if ci == 0 else 0x11
        sos += bytes([ci + 1, table])
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
    out += seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
