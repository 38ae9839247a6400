"""JPEG codec — pure stdlib + numpy, no codec library.

Decoder: baseline sequential (SOF0/SOF1) AND progressive (SOF2)
DCT JFIF/EXIF files: Huffman entropy decode, dequantize, 8x8 IDCT,
chroma upsampling (any integer sampling factors incl. 4:2:0/4:2:2),
YCbCr→RGB, restart markers. Progressive covers the full T.81 Annex G
Huffman feature set — interleaved/non-interleaved DC scans, spectral
selection, successive approximation (DC and AC first + refinement
scans with EOB-run coding). Arithmetic-coded and hierarchical files
raise NotImplementedError with a clear message.

Encoder: baseline sequential AND progressive (`encode_jpeg_progressive`
— configurable scan scripts with spectral selection and successive
approximation; quantization is op-for-op identical to the baseline
encoder, so the two encodings of the same pixels decode identically,
which is what the progressive tests assert). 4:4:4 or 4:2:0, grayscale
or RGB, Annex-K quant tables scaled by `quality`. The Huffman tables
are CANONICAL
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
            return _decode_progressive(b)
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


def _prep_encode(
    width: int,
    height: int,
    pixels: bytes | np.ndarray,
    channels: int,
    quality: int,
    subsample: str,
):
    """Shared encoder front-end: color convert + subsample + MCU-pad.
    Returns (padded planes, samp, quants, mcux, mcuy). Both the
    baseline and progressive encoders run EXACTLY this math, so the two
    encodings quantize to identical coefficients by construction."""
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
    return padded, samp, quants, mcux, mcuy


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
    padded, samp, quants, mcux, mcuy = _prep_encode(
        width, height, pixels, channels, quality, subsample
    )

    ncomp = len(padded)
    ql_z = quants[0][2]
    dc_counts, dc_syms = _flat_table(_DC_SYMBOLS, 4)
    ac_counts, ac_syms = _flat_table(_AC_SYMBOLS, 8)
    dc_codes = _encoder_codes(dc_counts, dc_syms)
    ac_codes = _encoder_codes(ac_counts, ac_syms)

    bw = _BitWriter()
    preds = [0] * ncomp
    mcu_index = 0
    rst_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.restart_marker(rst_count)
                rst_count += 1
                preds = [0] * ncomp
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
        out += seg(0xDB, bytes([0x01]) + bytes(quants[1][2].astype(np.uint8)))
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


# ---------------------------------------------------------------------------
# progressive decoder (T.81 Annex G, Huffman coding)
# ---------------------------------------------------------------------------


def _decode_ac_first(br, ac_tab, coef, Ss, Se, Al, eobrun):
    """AC first scan for one block (G.2.2). `coef` is the block's
    64-entry zigzag int array; returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = Ss
    while k <= Se:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read_bits(r)
            break
        k += r
        if k > Se:
            raise ValueError("AC run past end of spectral band")
        coef[k] = _extend(br.read_bits(s), s) << Al
        k += 1
    return eobrun


def _decode_ac_refine(br, ac_tab, coef, Ss, Se, Al, eobrun):
    """AC refinement scan for one block (G.2.3 / correction-bit
    algorithm). Mutates `coef`; returns the updated EOB run."""
    p1 = 1 << Al
    k = Ss
    if eobrun == 0:
        while k <= Se:
            rs = _decode_huff(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement size must be 1")
                newval = p1 if br.read_bit() else -p1
            while k <= Se:
                v = coef[k]
                if v != 0:
                    if br.read_bit() and (abs(v) & p1) == 0:
                        coef[k] = v + (p1 if v > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= Se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:
            v = coef[k]
            if v != 0 and br.read_bit() and (abs(v) & p1) == 0:
                coef[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a progressive (SOF2) JPEG: accumulate per-block zigzag
    coefficients across scans, then dequantize + IDCT once."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    coefs: dict[int, np.ndarray] = {}  # cid -> (bh, bw, 64) int32
    geom: dict[int, tuple[int, int]] = {}  # cid -> non-interleaved (bh, bw)
    mcu_geom = None  # (mcux, mcuy, hmax, vmax)
    pos = 2
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg (missing SOI)")
    while pos < len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        m = b[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        seg_len = int.from_bytes(b[pos : pos + 2], "big")
        seg = b[pos + 2 : pos + seg_len]
        if m == 0xDB:
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    qt[tid] = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    i += 64
                else:
                    qt[tid] = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.float64
                    )
                    i += 128
        elif m == 0xC2:
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            mcu_geom = (mcux, mcuy, hmax, vmax)
            for cid, hs, vs, _ in comps:
                coefs[cid] = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                cw = -(-(w * hs) // hmax)
                ch = -(-(h * vs) // vmax)
                geom[cid] = (-(-ch // 8), -(-cw // 8))
        elif m in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/unsupported SOF in progressive decode path")
        elif m == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = list(seg[i + 17 : i + 17 + nsym])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(counts, symbols)
                i += 17 + nsym
        elif m == 0xDD:
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            ncomp_s = seg[0]
            scan_comps = []
            for c in range(ncomp_s):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            Ss, Se = seg[1 + 2 * ncomp_s], seg[2 + 2 * ncomp_s]
            a = seg[3 + 2 * ncomp_s]
            Ah, Al = a >> 4, a & 0x0F
            br = _BitReader(b, pos + seg_len)
            _decode_prog_scan(
                br,
                frame,
                scan_comps,
                Ss,
                Se,
                Ah,
                Al,
                coefs,
                geom,
                mcu_geom,
                huff_dc,
                huff_ac,
                restart_interval,
            )
            pos = br.pos
            # resume marker walk right after the scan's entropy data
            continue
        pos += seg_len
    if frame is None:
        raise ValueError("progressive jpeg missing SOF2")
    return _finalize_coefs(frame, coefs, qt, mcu_geom)


def _decode_prog_scan(
    br,
    frame,
    scan_comps,
    Ss,
    Se,
    Ah,
    Al,
    coefs,
    geom,
    mcu_geom,
    huff_dc,
    huff_ac,
    restart_interval,
):
    w, h, comps = frame
    by_cid = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    mcux, mcuy, hmax, vmax = mcu_geom
    if Ss == 0:
        # DC scan: interleaved MCU order if several components
        preds = {cid: 0 for cid, _, _ in scan_comps}
        if len(scan_comps) > 1:
            unit_count = mcux * mcuy
            def blocks_of(unit):
                my, mx = divmod(unit, mcux)
                for cid, dc_t, _ in scan_comps:
                    hs, vs, _ = by_cid[cid]
                    for by in range(vs):
                        for bx in range(hs):
                            yield cid, dc_t, my * vs + by, mx * hs + bx
        else:
            cid0, dc_t0, _ = scan_comps[0]
            bh, bw = geom[cid0]
            unit_count = bh * bw
            def blocks_of(unit):
                yield cid0, dc_t0, unit // bw, unit % bw
        for unit in range(unit_count):
            if restart_interval and unit and unit % restart_interval == 0:
                br.sync_restart()
                preds = {cid: 0 for cid, _, _ in scan_comps}
            for cid, dc_t, by, bx in blocks_of(unit):
                blk = coefs[cid][by, bx]
                if Ah == 0:
                    t = _decode_huff(br, huff_dc[dc_t])
                    preds[cid] += _extend(br.read_bits(t), t)
                    blk[0] = preds[cid] << Al
                else:
                    if br.read_bit():
                        blk[0] = int(blk[0]) | (1 << Al)
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be non-interleaved")
        cid, _, ac_t = scan_comps[0]
        bh, bw = geom[cid]
        eobrun = 0
        fn = _decode_ac_first if Ah == 0 else _decode_ac_refine
        for unit in range(bh * bw):
            if restart_interval and unit and unit % restart_interval == 0:
                br.sync_restart()
                eobrun = 0
            blk = coefs[cid][unit // bw, unit % bw]
            eobrun = fn(br, huff_ac[ac_t], blk, Ss, Se, Al, eobrun)


def _finalize_coefs(frame, coefs, qt, mcu_geom):
    """(per-block zigzag coefficients) → pixels: dequantize, IDCT,
    upsample, color-convert — shared tail for the progressive path."""
    w, h, comps = frame
    mcux, mcuy, hmax, vmax = mcu_geom
    full = []
    for cid, hs, vs, tq in comps:
        zz = coefs[cid].astype(np.float64)  # (bh, bw, 64) zigzag order
        bh, bw = zz.shape[:2]
        deq = zz * qt[tq][None, None, :]
        nat = np.zeros_like(deq)
        nat[:, :, ZIGZAG] = deq
        blocks = nat.reshape(bh, bw, 8, 8)
        # per-block, the exact op order of the baseline decoder, so a
        # progressive re-encode of the same coefficients reconstructs
        # bit-identical float planes (and therefore identical pixels)
        plane = np.empty((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A @ blocks[by, bx] @ _A.T + 128.0
                )
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(plane[:h, :w])
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
# progressive encoder (spectral selection + successive approximation)
# ---------------------------------------------------------------------------

# progressive AC tables additionally need the EOBn symbols (r<<4, r<15)
_AC_PROG_SYMBOLS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)


class _EobState:
    """Pending EOB run + two correction-bit buffers for one scan.

    `eob_bits` belong to blocks already folded into the deferred EOB
    run — the decoder consumes them in those blocks' tail refines, so
    they are emitted right after the EOBn symbol. `cur_bits` are the
    CURRENT block's correction bits since its last emitted symbol —
    the decoder consumes them while advancing past history
    coefficients AFTER the next symbol, so they are emitted after
    that symbol (jcphuff's BE vs BR distinction, re-derived from the
    T.81 G.1.2.3 decoder)."""

    __slots__ = ("run", "eob_bits", "cur_bits")

    def __init__(self) -> None:
        self.run = 0
        self.eob_bits: list[int] = []
        self.cur_bits: list[int] = []


def _flush_eobrun(bw: _BitWriter, ac_codes, st: _EobState) -> None:
    if st.run > 0:
        r = st.run.bit_length() - 1
        code, n = ac_codes[r << 4]
        bw.write(code, n)
        if r:
            bw.write(st.run - (1 << r), r)
        st.run = 0
    for bit in st.eob_bits:
        bw.write(bit, 1)
    st.eob_bits = []


def _emit_cur_bits(bw: _BitWriter, st: _EobState) -> None:
    for bit in st.cur_bits:
        bw.write(bit, 1)
    st.cur_bits = []


def _encode_dc_first_block(bw, dc_codes, dc, pred, Al):
    scaled = int(dc) >> Al
    diff = scaled - pred
    t = _category(diff)
    code, n = dc_codes[t]
    bw.write(code, n)
    if t:
        bw.write(_magnitude_bits(diff, t), t)
    return scaled


def _encode_ac_first_block(bw, ac_codes, zz, Ss, Se, Al, st: _EobState):
    r = 0
    wrote = False
    for k in range(Ss, Se + 1):
        v = int(zz[k])
        t = abs(v) >> Al
        if t == 0:
            r += 1
            continue
        while r > 15:
            _flush_eobrun(bw, ac_codes, st)
            code, n = ac_codes[0xF0]
            bw.write(code, n)
            r -= 16
        _flush_eobrun(bw, ac_codes, st)
        sv = t if v > 0 else -t
        s = _category(sv)
        code, n = ac_codes[(r << 4) | s]
        bw.write(code, n)
        bw.write(_magnitude_bits(sv, s), s)
        r = 0
        wrote = True
    if r > 0 or not wrote:
        st.run += 1
        if st.run == 0x7FFF:
            _flush_eobrun(bw, ac_codes, st)


def _encode_ac_refine_block(bw, ac_codes, zz, Ss, Se, Al, st: _EobState):
    absv = [abs(int(zz[k])) >> Al for k in range(Ss, Se + 1)]
    eob_rel = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob_rel = i
    r = 0
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob_rel:
            _flush_eobrun(bw, ac_codes, st)
            code, n = ac_codes[0xF0]
            bw.write(code, n)
            r -= 16
            _emit_cur_bits(bw, st)
        if t > 1:
            # already-significant coefficient: buffer its correction bit
            st.cur_bits.append(t & 1)
            continue
        # newly significant
        _flush_eobrun(bw, ac_codes, st)
        code, n = ac_codes[(r << 4) | 1]
        bw.write(code, n)
        bw.write(1 if int(zz[Ss + i]) > 0 else 0, 1)
        _emit_cur_bits(bw, st)
        r = 0
    if r > 0 or st.cur_bits:
        st.run += 1
        st.eob_bits.extend(st.cur_bits)
        st.cur_bits = []
        if st.run == 0x7FFF:
            _flush_eobrun(bw, ac_codes, st)


def _quantized_blocks(padded, samp, quants):
    """Per-component (bh, bw, 64) zigzag-quantized int coefficients,
    computed with the EXACT per-block op order of the baseline encoder
    so both encodings agree bit-for-bit on coefficient values."""
    out = []
    for p, (hs, vs), (_, _q, qz) in zip(padded, samp, quants):
        bh, bw_ = p.shape[0] // 8, p.shape[1] // 8
        arr = np.zeros((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _A.T @ (block - 128.0) @ _A
                arr[by, bx] = np.round(coef.reshape(-1)[ZIGZAG] / qz).astype(np.int64)
        out.append(arr)
    return out


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes | np.ndarray,
    *,
    channels: int = 3,
    quality: int = 85,
    subsample: str = "444",
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """Encode row-major uint8 pixels as a progressive (SOF2) JPEG.

    `scans`: list of (component indexes, Ss, Se, Ah, Al). The default
    script exercises the full Annex-G surface — interleaved DC first
    (Al=1), per-component spectral-selection AC first scans (Al=2),
    an AC refinement pass 2→1, a DC refinement pass 1→0, and a final
    AC refinement 1→0. Coefficient quantization is identical to
    `encode_jpeg`, so decoding either file yields identical pixels.
    """
    padded, samp, quants, mcux, mcuy = _prep_encode(
        width, height, pixels, channels, quality, subsample
    )
    ncomp = len(padded)
    coefs = _quantized_blocks(padded, samp, quants)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # non-interleaved block grids for AC scans
    geom = []
    for hs, vs in samp:
        cw = -(-(width * hs) // hmax)
        ch = -(-(height * vs) // vmax)
        geom.append((-(-ch // 8), -(-cw // 8)))
    if scans is None:
        all_c = list(range(ncomp))
        scans = [(all_c, 0, 0, 0, 1)]
        for ci in all_c:
            scans.append(([ci], 1, 5, 0, 2))
        for ci in all_c:
            scans.append(([ci], 6, 63, 0, 2))
        for ci in all_c:
            scans.append(([ci], 1, 63, 2, 1))
        scans.append((all_c, 0, 0, 1, 0))
        for ci in all_c:
            scans.append(([ci], 1, 63, 1, 0))

    dc_counts, dc_syms = _flat_table(_DC_SYMBOLS, 4)
    ac_counts, ac_syms = _flat_table(_AC_PROG_SYMBOLS, 9)
    dc_codes = _encoder_codes(dc_counts, dc_syms)
    ac_codes = _encoder_codes(ac_counts, ac_syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(quants[0][2].astype(np.uint8)))
    if ncomp == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(quants[1][2].astype(np.uint8)))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(ncomp)
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, quants[ci][0]])
    out += seg(0xC2, bytes(sof))
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))

    for comp_idx, Ss, Se, Ah, Al in scans:
        bw = _BitWriter()
        if Ss == 0:
            preds = {ci: 0 for ci in comp_idx}
            if len(comp_idx) > 1:
                units = [
                    (ci, my * vs + by, mx * hs + bx)
                    for my in range(mcuy)
                    for mx in range(mcux)
                    for ci in comp_idx
                    for by in range(samp[ci][1])
                    for bx in range(samp[ci][0])
                    for hs, vs in [samp[ci]]
                ]
            else:
                ci = comp_idx[0]
                bh, bw_ = geom[ci]
                units = [(ci, by, bx) for by in range(bh) for bx in range(bw_)]
            for ci, by, bx in units:
                dc = coefs[ci][by, bx, 0]
                if Ah == 0:
                    preds[ci] = _encode_dc_first_block(bw, dc_codes, dc, preds[ci], Al)
                else:
                    bw.write((int(dc) >> Al) & 1, 1)
        else:
            if len(comp_idx) != 1:
                raise ValueError("progressive AC scan must cover one component")
            ci = comp_idx[0]
            bh, bw_ = geom[ci]
            st = _EobState()
            enc = _encode_ac_first_block if Ah == 0 else _encode_ac_refine_block
            for by in range(bh):
                for bx in range(bw_):
                    enc(bw, ac_codes, coefs[ci][by, bx], Ss, Se, Al, st)
            _flush_eobrun(bw, ac_codes, st)
        sos = bytearray([len(comp_idx)])
        for ci in comp_idx:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([Ss, Se, (Ah << 4) | Al])
        out += seg(0xDA, bytes(sos))
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)
