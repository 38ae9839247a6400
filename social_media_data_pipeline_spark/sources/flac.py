"""FLAC codec — dependency-free, pure stdlib + numpy.

Closes the last compressed-AUDIO boundary in the multimodal path
(`sources/audio.py` previously raised NotImplementedError for flac the
way `sources/binary.py` once did for gif/webp/progressive-jpeg before
those codecs landed). Same house pattern as `sources/jpeg.py`: a REAL
spec decoder plus a scriptable subset encoder so tests can assert
bit-exact lossless roundtrips without any external encoder binary.

Decoder coverage (full for the streams libFLAC emits by default):
  - STREAMINFO parse + metadata-block walk (all block types skipped
    structurally).
  - Frame sync / header parse: fixed & variable blocking strategies,
    all blocksize codes (incl. 8/16-bit escapes), all sample-rate
    codes (incl. kHz / Hz / daHz escapes), sample sizes 8/12/16/20/24/32,
    UTF-8-style coded frame/sample numbers, CRC-8 header check.
  - Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
    (quantized coefficients + shift), wasted-bits unshift.
  - Residuals: Rice (4-bit param) and Rice2 (5-bit param) partitioned
    coding, escape partitions (raw n-bit residuals).
  - Stereo decorrelation: left/side, right/side, mid/side.
  - Frame CRC-16 verification; optional STREAMINFO MD5 check of the
    decoded stream (`verify_md5=True`).

Encoder subset (always spec-valid output): fixed 4096-sample blocks,
independent channels, FIXED predictor order 0-2 chosen per subframe by
cost, single-partition Rice residuals, CONSTANT detection, correct
CRC-8/CRC-16 and STREAMINFO MD5 — decodable by any conforming decoder.

Reference semantics: the reference pipeline's media handling is
PIL/cv2-backed image-only (ImageLabeler.py:133-151); audio is the
LLM-pipeline modality extension, and FLAC here is a codec boundary
turned real, exactly like jpeg.py for images.

Scale shape: decode is map-side inside `mapInPandas` (see audio.py) —
one task per file split, zero shuffle.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# --------------------------------------------------------------- tables

_FIXED_COEFS: dict[int, list[int]] = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATE_CODES = {
    1: 88200,
    2: 176400,
    3: 192000,
    4: 8000,
    5: 16000,
    6: 22050,
    7: 24000,
    8: 32000,
    9: 44100,
    10: 48000,
    11: 96000,
}

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame-header CRC."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


# ------------------------------------------------------------ bit reader


class _BitReader:
    """MSB-first bit reader over a bytes object with a bit cursor."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits

    def read(self, n: int) -> int:
        """Read n bits (0 <= n <= 64) as an unsigned int."""
        if n == 0:
            return 0
        p = self.pos
        end = p + n
        if end > len(self.buf) * 8:
            raise ValueError("flac: bitstream truncated")
        first = p >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.buf[first:last], "big")
        chunk >>= (last << 3) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= 1 << (n - 1) else v

    def read_unary(self) -> int:
        """Count 0-bits until the terminating 1-bit."""
        count = 0
        buf, p = self.buf, self.pos
        nbits = len(buf) * 8
        while True:
            if p >= nbits:
                raise ValueError("flac: bitstream truncated in unary code")
            byte = buf[p >> 3]
            rem = 8 - (p & 7)
            window = byte & ((1 << rem) - 1)
            if window == 0:
                count += rem
                p += rem
                continue
            lead = rem - window.bit_length()
            count += lead
            p += lead + 1
            break
        self.pos = p
        return count

    def read_rice(self, k: int) -> int:
        q = self.read_unary()
        v = (q << k) | self.read(k) if k else q
        return (v >> 1) ^ -(v & 1)  # zigzag → signed

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_coded_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style variable-length number (up to 36 bits)."""
    first = br.read(8)
    if first < 0x80:
        return first
    n_extra = 0
    mask = 0x40
    while first & mask:
        n_extra += 1
        mask >>= 1
    if n_extra == 0 or n_extra > 6:
        raise ValueError(f"flac: invalid coded number lead byte 0x{first:02x}")
    v = first & (mask - 1)
    for _ in range(n_extra):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("flac: invalid coded number continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


# -------------------------------------------------------------- decoder


def flac_info(b: bytes) -> dict:
    """Parse STREAMINFO (header-only, no sample decode)."""
    if b[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    i = 4
    info = None
    while i + 4 <= len(b):
        header = b[i]
        last = bool(header & 0x80)
        btype = header & 0x7F
        size = int.from_bytes(b[i + 1 : i + 4], "big")
        body = b[i + 4 : i + 4 + size]
        if btype == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("flac: STREAMINFO truncated")
            min_bs, max_bs = struct.unpack_from(">HH", body, 0)
            packed = int.from_bytes(body[10:18], "big")
            sr = packed >> 44
            n_ch = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            info = {
                "min_block_size": min_bs,
                "max_block_size": max_bs,
                "sample_rate": sr,
                "n_channels": n_ch,
                "bits_per_sample": bits,
                "total_samples": total,
                "md5": body[18:34],
                "frames_offset": None,
            }
        i += 4 + size
        if last:
            break
    if info is None:
        raise ValueError("flac: no STREAMINFO block")
    info["frames_offset"] = i
    return info


def _decode_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    param_bits = 4 if method == 0 else 5
    escape = (1 << param_bits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise ValueError("flac: block size not divisible by partition count")
    out = np.empty(block_size - order, dtype=np.int64)
    pos = 0
    for p in range(n_part):
        n = (block_size >> porder) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("flac: predictor order exceeds first partition")
        param = br.read(param_bits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                out[pos : pos + n] = 0
            else:
                for j in range(n):
                    out[pos + j] = br.read_signed(raw_bits)
        else:
            for j in range(n):
                out[pos + j] = br.read_rice(param)
        pos += n
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        x = np.full(block_size, br.read_signed(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        x = np.array([br.read_signed(eff) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * x[i - 1 - j]
            x[i] = resid[i - order] + pred
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid LPC precision code 1111")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        x = np.empty(block_size, dtype=np.int64)
        x[:order] = warm
        for i in range(order, block_size):
            pred = 0
            for j in range(order):
                pred += coefs[j] * x[i - 1 - j]
            x[i] = resid[i - order] + (pred >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        x <<= wasted
    return x


def decode_flac_int(
    b: bytes, verify_md5: bool = False, collect_boundaries: list | None = None
) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → (int32 samples shape (n_frames, n_channels),
    sample_rate, bits_per_sample). Lossless: values are the exact PCM
    the encoder saw. CRC-8/CRC-16 verified per frame.

    `collect_boundaries`: optional list that receives (start, end) byte
    offsets of every frame — frames have no length field, so boundary
    discovery IS a decode; the Ogg-FLAC muxer (`sources/ogg.py`) uses
    this to emit one packet per frame as the mapping requires."""
    info = flac_info(b)
    sr0, n_ch0, bps0 = info["sample_rate"], info["n_channels"], info["bits_per_sample"]
    total = info["total_samples"]
    br = _BitReader(b, info["frames_offset"] * 8)
    chunks: list[np.ndarray] = []
    got = 0
    nbits = len(b) * 8
    while br.pos + 16 <= nbits and (total == 0 or got < total):
        frame_start = br.byte_pos()
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"flac: lost frame sync at byte {frame_start}")
        if br.read(1):
            raise ValueError("flac: reserved bit set in frame header")
        br.read(1)  # blocking strategy (affects coded-number meaning only)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: reserved bit set in frame header")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code 0")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            sr = sr0
        elif sr_code in _SAMPLE_RATE_CODES:
            sr = _SAMPLE_RATE_CODES[sr_code]
        elif sr_code == 12:
            sr = br.read(8) * 1000
        elif sr_code == 13:
            sr = br.read(16)
        elif sr_code == 14:
            sr = br.read(16) * 10
        else:
            raise ValueError("flac: invalid sample-rate code 15")
        bps = bps0 if ss_code == 0 else _SAMPLE_SIZE_CODES.get(ss_code)
        if bps is None:
            raise ValueError(f"flac: reserved sample-size code {ss_code}")
        header_crc = br.read(8)
        if _crc8(b[frame_start : br.byte_pos() - 1]) != header_crc:
            raise ValueError("flac: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_decode_subframe(br, block_size, bps) for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            n_ch = 2
            extra = (1, 0) if ch_code == 9 else (0, 1)
            subs = [
                _decode_subframe(br, block_size, bps + extra[c]) for c in range(2)
            ]
            if ch_code == 8:  # left/side
                subs = [subs[0], subs[0] - subs[1]]
            elif ch_code == 9:  # right/side (side stored first)
                subs = [subs[1] + subs[0], subs[1]]
            else:  # mid/side
                side = subs[1]
                mid = (subs[0] << 1) | (side & 1)
                subs = [(mid + side) >> 1, (mid - side) >> 1]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        if n_ch != n_ch0:
            raise ValueError("flac: frame channel count differs from STREAMINFO")

        br.align()
        frame_crc = br.read(16)
        if _crc16(b[frame_start : br.byte_pos() - 2]) != frame_crc:
            raise ValueError("flac: frame CRC-16 mismatch")
        if collect_boundaries is not None:
            collect_boundaries.append((frame_start, br.byte_pos()))
        chunks.append(np.stack(subs, axis=1))
        got += block_size

    x = (
        np.concatenate(chunks, axis=0)
        if chunks
        else np.empty((0, n_ch0), dtype=np.int64)
    )
    if total:
        x = x[:total]
    if verify_md5 and info["md5"] != b"\x00" * 16:
        if _stream_md5(x, bps0) != info["md5"]:
            raise ValueError("flac: decoded stream MD5 mismatch")
    return x.astype(np.int32), sr0, bps0


def decode_flac(b: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (float32 samples in [-1, 1] shape (n, ch),
    sample_rate) — the same contract as `audio.decode_wav`, so the
    whole audio operator surface (resample, features, fingerprint,
    clip windows) composes with FLAC inputs unchanged."""
    x, sr, bits = decode_flac_int(b)
    return x.astype(np.float32) / float(1 << (bits - 1)), sr


# -------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_rice(self, v: int, k: int) -> None:
        u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag
        self.write_unary(u >> k)
        if k:
            self.write(u & ((1 << k) - 1), k)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.out)


def _best_rice_param(resid: np.ndarray, max_param: int = 14) -> int:
    """Pick k minimizing total Rice length for the partition."""
    if resid.size == 0:
        return 0
    zig = np.where(resid < 0, (-resid.astype(np.int64) << 1) - 1, resid.astype(np.int64) << 1)
    best_k, best_cost = 0, None
    for k in range(max_param + 1):
        cost = int(np.sum(zig >> k)) + resid.size * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _rice_cost(resid: np.ndarray, k: int) -> int:
    zig = np.where(resid < 0, (-resid.astype(np.int64) << 1) - 1, resid.astype(np.int64) << 1)
    return int(np.sum(zig >> k)) + resid.size * (k + 1)


def _stream_md5(x: np.ndarray, bits: int) -> bytes:
    """MD5 of the raw interleaved little-endian PCM stream (spec 9.1).

    Samples are packed into ceil(bits/8) bytes each — 12-bit streams hash
    2-byte samples and 20-bit streams 3-byte samples, matching libFLAC.
    """
    width = (bits + 7) // 8
    flat = x.astype(np.int64).reshape(-1)
    if width == 1:
        raw = (flat & 0xFF).astype(np.uint8).tobytes()
    elif width == 2:
        raw = flat.astype("<i2").tobytes()
    elif width == 3:
        u = np.empty((flat.size, 3), dtype=np.uint8)
        m = flat & 0xFFFFFF
        u[:, 0] = m & 0xFF
        u[:, 1] = (m >> 8) & 0xFF
        u[:, 2] = (m >> 16) & 0xFF
        raw = u.tobytes()
    else:
        raw = flat.astype("<i4").tobytes()
    return hashlib.md5(raw).digest()


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    payload = []
    n = v
    while True:
        payload.append(n & 0x3F)
        n >>= 6
        # lead byte capacity shrinks by one bit per continuation byte
        if n < (1 << (6 - len(payload))):
            break
    lead = (0xFF << (7 - len(payload))) & 0xFF | n
    bw.write(lead, 8)
    for p in reversed(payload):
        bw.write(0x80 | p, 8)


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
    """CONSTANT if flat, else best FIXED order 0-2 with one Rice
    partition."""
    if np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    best = None
    for order in range(min(3, x.size)):
        r = x.astype(np.int64)
        for _ in range(order):
            r = np.diff(r)
        k = _best_rice_param(r)
        cost = order * bps + _rice_cost(r, k)
        if best is None or cost < best[0]:
            best = (cost, order, r, k)
    _, order, resid, k = best
    bw.write(0, 1)
    bw.write(8 + order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    for i in range(order):
        bw.write(int(x[i]) & ((1 << bps) - 1), bps)
    bw.write(0, 2)  # residual method: Rice 4-bit
    bw.write(0, 4)  # partition order 0
    bw.write(k, 4)
    for v in resid:
        bw.write_rice(int(v), k)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    block_size: int = 4096,
) -> bytes:
    """float samples in [-1, 1] (1-D mono or (n, ch)) → FLAC bytes.
    Subset encoder: fixed blocks, independent channels, FIXED 0-2
    predictors, single Rice partition — spec-valid, losslessly
    round-trips through `decode_flac_int`."""
    x = np.asarray(samples)
    if x.dtype.kind == "f":
        scale = float((1 << (bits - 1)) - 1)
        xi = np.round(np.clip(x, -1.0, 1.0) * scale).astype(np.int64)
    else:
        xi = x.astype(np.int64)
    if xi.ndim == 1:
        xi = xi[:, None]
    return encode_flac_int(xi, sample_rate, bits, block_size)


def encode_flac_scripted(
    xi: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    block_size: int = 4096,
    channel_mode: str = "independent",
    lpc: tuple[list[int], int] | None = None,
    partition_order: int = 0,
    rice2: bool = False,
    escape_bits: int | None = None,
    wasted_bits: int = 0,
) -> bytes:
    """Scriptable encoder (test harness for the decoder, same role as
    jpeg.py's scriptable progressive encoder): every spec feature the
    default subset encoder does not emit can be forced here —
    `channel_mode` in {independent, left_side, right_side, mid_side},
    an explicit LPC predictor `(coefs, shift)`, Rice partition orders,
    Rice2 (5-bit) params, escape (raw) partitions, and wasted bits
    (requires samples with that many zero LSBs). Output is spec-valid
    and must round-trip bit-exactly through `decode_flac_int`."""
    xi = np.asarray(xi, dtype=np.int64)
    if xi.ndim == 1:
        xi = xi[:, None]
    n_frames, n_ch = xi.shape
    if channel_mode != "independent" and n_ch != 2:
        raise ValueError("stereo decorrelation requires 2 channels")
    if wasted_bits and np.any(xi & ((1 << wasted_bits) - 1)):
        raise ValueError("wasted_bits requires that many zero LSBs")

    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | n_frames
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + _stream_md5(xi, bits)
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    ch_code = {
        "independent": n_ch - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[channel_mode]
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bits]

    def _subframe(bw: _BitWriter, x: np.ndarray, bps: int) -> None:
        eff = bps - wasted_bits
        if wasted_bits and np.any(x & ((1 << wasted_bits) - 1)):
            raise ValueError(
                "wasted_bits: stored channel lacks zero LSBs (stereo "
                "decorrelation can halve a wasted bit — use independent)"
            )
        xe = x >> wasted_bits
        if lpc is None:
            order, coefs, shift, stype = 2, [2, -1], 0, 8 + 2
            if x.size < 3:
                order, coefs, stype = 0, [], 8
        else:
            coefs, shift = lpc
            order = len(coefs)
            stype = 31 + order
        bw.write(0, 1)
        bw.write(stype, 6)
        if wasted_bits:
            bw.write(1, 1)
            bw.write(1, wasted_bits)  # unary count wasted-1 zeros then 1
        else:
            bw.write(0, 1)
        for i in range(order):
            bw.write(int(xe[i]) & ((1 << eff) - 1), eff)
        if stype >= 32:
            precision = max(2, max(abs(c) for c in coefs).bit_length() + 1)
            bw.write(precision - 1, 4)
            bw.write(shift & 0x1F, 5)
            for c in coefs:
                bw.write(c & ((1 << precision) - 1), precision)
        resid = np.empty(xe.size - order, dtype=np.int64)
        for i in range(order, xe.size):
            pred = sum(coefs[j] * int(xe[i - 1 - j]) for j in range(order))
            resid[i - order] = int(xe[i]) - (pred >> shift)
        param_bits = 5 if rice2 else 4
        bw.write(1 if rice2 else 0, 2)
        porder = partition_order
        while xe.size % (1 << porder) or (xe.size >> porder) <= order and porder:
            porder -= 1
        bw.write(porder, 4)
        pos = 0
        for p in range(1 << porder):
            n = (xe.size >> porder) - (order if p == 0 else 0)
            part = resid[pos : pos + n]
            if escape_bits is not None:
                bw.write((1 << param_bits) - 1, param_bits)
                bw.write(escape_bits, 5)
                if escape_bits:
                    for v in part:
                        bw.write(int(v) & ((1 << escape_bits) - 1), escape_bits)
            else:
                k = _best_rice_param(part, 14 if not rice2 else 30)
                bw.write(k, param_bits)
                for v in part:
                    bw.write_rice(int(v), k)
            pos += n

    frame_no = 0
    for start in range(0, max(n_frames, 1), block_size):
        blk = xi[start : start + block_size]
        bs = blk.shape[0]
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 2)
        bw.write(7, 4)  # 16-bit blocksize escape (always explicit)
        bw.write(13, 4)  # 16-bit Hz sample-rate escape
        bw.write(ch_code, 4)
        bw.write(ss_code, 3)
        bw.write(0, 1)
        _write_coded_number(bw, frame_no)
        bw.write(bs - 1, 16)
        bw.write(sample_rate, 16)
        bw.align()
        header = bw.bytes()
        header += bytes([_crc8(header)])
        body = _BitWriter()
        body.out = bytearray(header)
        left, right = blk[:, 0], blk[:, -1]
        if channel_mode == "independent":
            for c in range(n_ch):
                _subframe(body, blk[:, c], bits)
        elif channel_mode == "left_side":
            _subframe(body, left, bits)
            _subframe(body, left - right, bits + 1)
        elif channel_mode == "right_side":
            _subframe(body, left - right, bits + 1)
            _subframe(body, right, bits)
        else:  # mid_side
            _subframe(body, (left + right) >> 1, bits)
            _subframe(body, left - right, bits + 1)
        body.align()
        frame = body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)


def encode_flac_int(
    xi: np.ndarray, sample_rate: int, bits: int = 16, block_size: int = 4096
) -> bytes:
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bits {bits}")
    xi = np.asarray(xi, dtype=np.int64)
    if xi.ndim == 1:
        xi = xi[:, None]
    n_frames, n_ch = xi.shape
    if not 1 <= n_ch <= 8:
        raise ValueError(f"unsupported channel count {n_ch}")

    # STREAMINFO
    packed = (sample_rate << 44) | ((n_ch - 1) << 41) | ((bits - 1) << 36) | n_frames
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + packed.to_bytes(8, "big")
        + _stream_md5(xi, bits)
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    # sample-rate header code
    sr_code = None
    for code, rate in _SAMPLE_RATE_CODES.items():
        if rate == sample_rate:
            sr_code = (code, None, 0)
            break
    if sr_code is None:
        if sample_rate % 1000 == 0 and sample_rate // 1000 < 256:
            sr_code = (12, sample_rate // 1000, 8)
        elif sample_rate < 65536:
            sr_code = (13, sample_rate, 16)
        elif sample_rate % 10 == 0 and sample_rate // 10 < 65536:
            sr_code = (14, sample_rate // 10, 16)
        else:
            raise ValueError(f"cannot encode sample rate {sample_rate}")
    ss_code = {8: 1, 16: 4, 24: 6, 32: 7}[bits]

    frame_no = 0
    for start in range(0, max(n_frames, 1), block_size):
        blk = xi[start : start + block_size]
        bs = blk.shape[0]
        if bs == 0:
            break
        if bs == block_size and 576 <= block_size <= 4608 and block_size in (576, 1152, 2304, 4608):
            bs_code, bs_val, bs_bits = (
                {576: 2, 1152: 3, 2304: 4, 4608: 5}[block_size],
                None,
                0,
            )
        elif bs == block_size and block_size in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
            bs_code, bs_val, bs_bits = (
                {256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}[
                    block_size
                ],
                None,
                0,
            )
        elif bs == 192:
            bs_code, bs_val, bs_bits = 1, None, 0
        elif bs <= 256:
            bs_code, bs_val, bs_bits = 6, bs - 1, 8
        else:
            bs_code, bs_val, bs_bits = 7, bs - 1, 16

        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(bs_code, 4)
        bw.write(sr_code[0], 4)
        bw.write(n_ch - 1, 4)  # independent channels
        bw.write(ss_code, 3)
        bw.write(0, 1)  # reserved
        _write_coded_number(bw, frame_no)
        if bs_bits:
            bw.write(bs_val, bs_bits)
        if sr_code[2]:
            bw.write(sr_code[1], sr_code[2])
        bw.align()
        header = bw.bytes()
        header += bytes([_crc8(header)])

        body = _BitWriter()
        # restart the writer with the header so subframe bits continue
        body.out = bytearray(header)
        for c in range(n_ch):
            _encode_subframe(body, blk[:, c], bits)
        body.align()
        frame = body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1

    return bytes(out)


def split_frames(b: bytes) -> list[bytes]:
    """The stream's audio frames as individual byte strings (decode is
    the only way to find boundaries — FLAC frames carry no length)."""
    bounds: list[tuple[int, int]] = []
    decode_flac_int(b, collect_boundaries=bounds)
    return [b[s:e] for s, e in bounds]
