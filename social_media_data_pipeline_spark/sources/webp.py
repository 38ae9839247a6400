"""Dependency-free lossless-WebP (VP8L) codec: full decoder — prefix
codes (simple + code-length-coded), LZ77 backward references with the
2D distance mapping, color cache, meta-prefix images, and all four
transforms (predictor, color, subtract-green, color-indexing with
pixel bundling) — plus a minimal self-consistent encoder used by tests
to round-trip real bytes, continuing the `sources/jpeg.py` /
`sources/gif.py` pattern.

Reference semantic spec: the reference pipeline decodes scraped media
through PIL (`Preprocessing/ImageLabeler.py:133-151`); this module
supplies the decode contract for lossless WebP without an imaging
library. LOSSY WebP (VP8 intra-frame DCT) remains a documented
NotImplementedError boundary.

Format notes (public VP8L specification):
- values are read LSB-first; prefix-code bits are read MSB-of-code
  first (deflate convention);
- code lengths for the literal/length/distance alphabets are
  themselves prefix-coded over a 19-symbol alphabet in the fixed order
  17,18,0,...,15 with 16/17/18 as repeat codes;
- the green channel multiplexes literals (0-255), LZ77 length prefixes
  (256-279) and color-cache hits (280+);
- distances 1-120 map to a 2D neighborhood table before becoming
  linear offsets;
- transforms apply in reverse declaration order after pixel decode.

The encoder emits a transform-free, cache-free stream with one set of
prefix codes: 8-bit-flat literal trees for G/R/B/A (code-length-coded
as one '8' + repeats) and a single-symbol distance tree — valid input
for any conforming decoder.
"""

from __future__ import annotations

# (dx, dy) neighborhood for distance codes 1..120 (spec table)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class _Bits:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated VP8L stream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Prefix:
    """Canonical prefix code; decode walks bits MSB-of-code-first."""

    def __init__(self, lengths: list[int]):
        self.single = None
        present = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not present:
            raise ValueError("empty prefix code")
        if len(present) == 1:
            self.single = present[0][1]
            return
        # canonical assignment: by (length, symbol)
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        for ln, sym in sorted(present):
            code <<= ln - prev_len
            self.table[(ln, code)] = sym
            code += 1
            prev_len = ln
        self.max_len = present and max(ln for ln, _ in present)

    def decode(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | bits.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    if bits.read(1):  # simple code: 1 or 2 symbols
        num_symbols = bits.read(1) + 1
        first_8bit = bits.read(1)
        sym0 = bits.read(8 if first_8bit else 1)
        if num_symbols == 1:
            p = _Prefix.__new__(_Prefix)
            p.single = sym0
            return p
        sym1 = bits.read(8)
        # spec assigns codes in READ order (0 -> first symbol), not
        # canonically — the two differ when sym0 > sym1
        p = _Prefix.__new__(_Prefix)
        p.single = None
        p.table = {(1, 0): sym0, (1, 1): sym1}
        p.max_len = 1
        return p
    num_clc = 4 + bits.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = bits.read(3)
    clc = _Prefix(clc_lengths)
    if bits.read(1):  # use length
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code = clc.decode(bits)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev_len = code
        elif code == 16:
            for _ in range(3 + bits.read(2)):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif code == 17:
            symbol += 3 + bits.read(3)
        else:  # 18
            symbol += 11 + bits.read(7)
    return _Prefix(lengths)


def _prefix_value(bits: _Bits, sym: int) -> int:
    """LZ77 length/distance prefix decoding (spec: 4 small values then
    exponential ranges with extra bits)."""
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + bits.read(extra) + 1


def _decode_entropy_image(bits: _Bits, w: int, h: int, top_level: bool = False):
    """Spatially-coded ARGB image → list of (a, r, g, b) tuples.
    Sub-resolution images (entropy / predictor / color / palette) use
    the same coding without meta-prefix images."""
    cache_bits = 0
    cache = None
    if bits.read(1):
        cache_bits = bits.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color cache bits {cache_bits}")
        cache = [(0, 0, 0, 0)] * (1 << cache_bits)
    meta = None
    meta_bs = 0
    n_groups = 1
    if top_level and bits.read(1):
        meta_bs = bits.read(3) + 2
        mw = (w + (1 << meta_bs) - 1) >> meta_bs
        mh = (h + (1 << meta_bs) - 1) >> meta_bs
        meta_px = _decode_entropy_image(bits, mw, mh)
        meta = [((p[1] << 8) | p[2]) for p in meta_px]  # (r<<8)|g
        n_groups = max(meta) + 1
        meta_w = mw
    groups = []
    cache_syms = (1 << cache_bits) if cache_bits else 0
    for _ in range(n_groups):
        g_tree = _read_prefix_code(bits, 256 + 24 + cache_syms)
        r_tree = _read_prefix_code(bits, 256)
        b_tree = _read_prefix_code(bits, 256)
        a_tree = _read_prefix_code(bits, 256)
        d_tree = _read_prefix_code(bits, 40)
        groups.append((g_tree, r_tree, b_tree, a_tree, d_tree))
    out: list[tuple[int, int, int, int]] = []
    n = w * h

    def cache_insert(px):
        if cache is not None:
            a, r, g, b = px
            argb = (a << 24) | (r << 16) | (g << 8) | b
            key = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
            cache[key] = px

    while len(out) < n:
        if meta is not None:
            x, y = len(out) % w, len(out) // w
            gidx = meta[(y >> meta_bs) * meta_w + (x >> meta_bs)]
        else:
            gidx = 0
        g_tree, r_tree, b_tree, a_tree, d_tree = groups[gidx]
        s = g_tree.decode(bits)
        if s < 256:
            # stream order after green: red, blue, alpha
            red = r_tree.decode(bits)
            blue = b_tree.decode(bits)
            alpha = a_tree.decode(bits)
            px = (alpha, red, s, blue)
            out.append(px)
            cache_insert(px)
        elif s < 256 + 24:
            length = _prefix_value(bits, s - 256)
            dcode = _prefix_value(bits, d_tree.decode(bits))
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            for _ in range(length):
                if dist > len(out):
                    raise ValueError("LZ77 reference before image start")
                px = out[len(out) - dist]
                out.append(px)
                cache_insert(px)
                if len(out) >= n:
                    break
        else:
            if cache is None:
                raise ValueError("cache hit with no color cache")
            out.append(cache[s - 256 - 24])
    return out


def _avg2(a: int, b: int) -> int:
    return (a + b) // 2


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, left, top, top_left, top_right):
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return top_right
    if mode == 4:
        return top_left
    if mode == 5:
        return tuple(_avg2(_avg2(left[i], top_right[i]), top[i]) for i in range(4))
    if mode == 6:
        return tuple(_avg2(left[i], top_left[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(left[i], top[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(top_left[i], top[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(top[i], top_right[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(left[i], top_left[i]), _avg2(top[i], top_right[i]))
            for i in range(4)
        )
    if mode == 11:  # select
        p = [left[i] + top[i] - top_left[i] for i in range(4)]
        p_left = sum(abs(p[i] - left[i]) for i in range(4))
        p_top = sum(abs(p[i] - top[i]) for i in range(4))
        return left if p_left < p_top else top
    if mode == 12:  # clamped add-subtract full
        return tuple(_clamp(left[i] + top[i] - top_left[i]) for i in range(4))
    if mode == 13:  # clamped add-subtract half
        return tuple(
            _clamp(
                _avg2(left[i], top[i])
                + (_avg2(left[i], top[i]) - top_left[i]) // 2
            )
            for i in range(4)
        )
    raise ValueError(f"bad predictor mode {mode}")


def decode_vp8l(data: bytes):
    """VP8L payload → (width, height, 4, flat uint8 RGBA array)."""
    import numpy as np

    bits = _Bits(data)
    if bits.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    bits.read(1)  # alpha hint
    if bits.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    transforms = []
    spatial_w = w
    while bits.read(1):
        ttype = bits.read(2)
        if ttype in (0, 1):  # predictor / color transform
            size_bits = bits.read(3) + 2
            bw = (spatial_w + (1 << size_bits) - 1) >> size_bits
            bh = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(bits, bw, bh)
            transforms.append((ttype, size_bits, bw, sub))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, None, None))
        else:  # color indexing
            pal_size = bits.read(8) + 1
            pal_px = _decode_entropy_image(bits, pal_size, 1)
            # palette entries are component-delta coded
            palette = []
            prev = (0, 0, 0, 0)
            for p in pal_px:
                cur = tuple((p[i] + prev[i]) & 0xFF for i in range(4))
                palette.append(cur)
                prev = cur
            if pal_size <= 2:
                width_bits = 3
            elif pal_size <= 4:
                width_bits = 2
            elif pal_size <= 16:
                width_bits = 1
            else:
                width_bits = 0
            spatial_w = (spatial_w + (1 << width_bits) - 1) >> width_bits
            transforms.append((3, width_bits, pal_size, palette))
    px = _decode_entropy_image(bits, spatial_w, h, top_level=True)
    cur_w = spatial_w
    for ttype, p1, p2, p3 in reversed(transforms):
        if ttype == 3:  # color indexing: unbundle + palette lookup
            width_bits, pal_size, palette = p1, p2, p3
            if width_bits == 0:
                px = [
                    palette[p[2]] if p[2] < pal_size else (0, 0, 0, 0) for p in px
                ]
                cur_w = w
            else:
                per = 1 << width_bits
                mask = (1 << (8 >> width_bits)) - 1
                ibits = 8 >> width_bits
                out = []
                for y in range(h):
                    row = px[y * cur_w : (y + 1) * cur_w]
                    cnt = 0
                    for p in row:
                        g = p[2]
                        for k in range(per):
                            if cnt >= w:
                                break
                            idx = (g >> (k * ibits)) & mask
                            out.append(
                                palette[idx] if idx < pal_size else (0, 0, 0, 0)
                            )
                            cnt += 1
                px = out
                cur_w = w
        elif ttype == 2:  # add green back
            px = [
                (p[0], (p[1] + p[2]) & 0xFF, p[2], (p[3] + p[2]) & 0xFF)
                for p in px
            ]
        elif ttype == 1:  # inverse color transform
            size_bits, bw, sub = p1, p2, p3
            out = []
            for i, p in enumerate(px):
                x, y = i % cur_w, i // cur_w
                cte = sub[(y >> size_bits) * bw + (x >> size_bits)]
                g2r, g2b, r2b = cte[3], cte[2], cte[1]  # b, g, r channels

                def d(t, c):
                    ts = t - 256 if t >= 128 else t
                    cs = c - 256 if c >= 128 else c
                    return (ts * cs) >> 5

                a, r, g, b = p
                r = (r + d(g2r, g)) & 0xFF
                b = (b + d(g2b, g) + d(r2b, r)) & 0xFF
                out.append((a, r, g, b))
            px = out
        else:  # inverse predictor
            size_bits, bw, sub = p1, p2, p3
            out = []
            for i, p in enumerate(px):
                x, y = i % cur_w, i // cur_w
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = out[i - 1]
                elif x == 0:
                    pred = out[i - cur_w]
                else:
                    mode = sub[(y >> size_bits) * bw + (x >> size_bits)][2]
                    left = out[i - 1]
                    top = out[i - cur_w]
                    top_left = out[i - cur_w - 1]
                    top_right = (
                        out[i - cur_w + 1] if x + 1 < cur_w else out[i - cur_w]
                    )
                    pred = _predict(mode, left, top, top_left, top_right)
                out.append(tuple((p[j] + pred[j]) & 0xFF for j in range(4)))
            px = out
    if len(px) != w * h:
        raise ValueError("decoded pixel count mismatch")
    arr = np.array(px, dtype=np.uint8)  # rows of (a, r, g, b)
    rgba = arr[:, [1, 2, 3, 0]]
    return w, h, 4, rgba.reshape(-1).copy()


def decode_webp(b: bytes):
    """RIFF container → first image chunk. VP8L (lossless) decodes for
    real; lossy VP8 raises the documented codec boundary."""
    if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a webp")
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        payload = b[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(payload)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8 intra-frame DCT) needs a codec library; "
                "lossless VP8L decodes dependency-free"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("webp contains no image chunk")


# -- encoder (tests): transform-free, cache-free, one prefix-code set --


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        """LSB-first value write."""
        self.acc |= value << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, n: int) -> None:
        """Prefix-code write: MSB of the code first."""
        for i in range(n - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def finish(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
        return bytes(self.buf)


def _write_flat8_tree(wr: _BitWriter, alphabet_size: int) -> None:
    """Code-length-code a tree with 256 symbols of length 8 (complete:
    256 * 2^-8 = 1) and `alphabet_size - 256` trailing zero lengths."""
    wr.write(0, 1)  # not simple
    wr.write(8, 4)  # num_code_lengths = 12 (covers clc symbols 8, 16, 18)
    # clc lengths over order 17,18,0,1,2,3,4,5,16,6,7,8: {8:1, 16:2, 18:2}
    clc = {18: 2, 16: 2, 8: 1}
    for i in range(12):
        wr.write(clc.get(_CLC_ORDER[i], 0), 3)
    wr.write(0, 1)  # no max_symbol shortcut
    # canonical over {8:1, 16:2, 18:2}: 8 -> 0 (1 bit), 16 -> 10, 18 -> 11
    wr.write_code(0b0, 1)  # symbol 8: one literal length-8
    emitted = 1
    while emitted < 256:
        take = min(6, 256 - emitted)
        if take < 3:
            # emit literal 8s (codes for clc symbol 8)
            wr.write_code(0b0, 1)
            emitted += 1
            continue
        wr.write_code(0b10, 2)  # symbol 16: repeat prev length
        wr.write(take - 3, 2)
        emitted += take
    rest = alphabet_size - 256
    while rest > 0:
        take = min(138, rest)
        if take < 11:
            wr.write_code(0b0, 1)  # shouldn't happen for our alphabets
            raise ValueError("alphabet tail too short for repeat-18")
        wr.write_code(0b11, 2)  # symbol 18: run of zeros
        wr.write(take - 11, 7)
        rest -= take


def encode_vp8l(width: int, height: int, rgba: bytes) -> bytes:
    """RGBA buffer → minimal VP8L payload (literal-only, no transforms,
    no cache, flat 8-bit trees)."""
    if len(rgba) != width * height * 4:
        raise ValueError("rgba buffer does not match dimensions")
    wr = _BitWriter()
    wr.write(0x2F, 8)
    wr.write(width - 1, 14)
    wr.write(height - 1, 14)
    wr.write(1, 1)  # alpha used hint
    wr.write(0, 3)  # version
    wr.write(0, 1)  # no transform
    wr.write(0, 1)  # no color cache
    wr.write(0, 1)  # no meta-prefix image
    _write_flat8_tree(wr, 256 + 24)  # green
    for _ in range(3):  # red, blue, alpha
        _write_flat8_tree(wr, 256)
    # distance: simple code, single symbol 0
    wr.write(1, 1)
    wr.write(0, 1)  # num_symbols - 1 = 0
    wr.write(0, 1)  # first symbol in 1 bit
    wr.write(0, 1)  # symbol 0
    for i in range(0, len(rgba), 4):
        r, g, b, a = rgba[i], rgba[i + 1], rgba[i + 2], rgba[i + 3]
        wr.write_code(g, 8)
        wr.write_code(r, 8)
        wr.write_code(b, 8)
        wr.write_code(a, 8)
    return wr.finish()


def encode_webp(width: int, height: int, rgba: bytes) -> bytes:
    payload = encode_vp8l(width, height, rgba)
    if len(payload) & 1:
        payload += b"\x00"
    riff_size = 4 + 8 + len(payload)
    return (
        b"RIFF"
        + riff_size.to_bytes(4, "little")
        + b"WEBP"
        + b"VP8L"
        + len(payload).to_bytes(4, "little")
        + payload
    )
