"""VP8L (lossless WebP) codec tests: encoder round-trip plus
hand-crafted bitstreams exercising the decoder paths a literal-only
encoder never emits — LZ77 backward references with the 2D distance
mapping, the color cache, and the subtract-green / palette /
predictor transforms."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.sources.webp import (
    _CLC_ORDER,
    _BitWriter,
    decode_vp8l,
    decode_webp,
    encode_webp,
)


def header(wr: _BitWriter, w: int, h: int) -> None:
    wr.write(0x2F, 8)
    wr.write(w - 1, 14)
    wr.write(h - 1, 14)
    wr.write(1, 1)
    wr.write(0, 3)


def simple_tree(wr: _BitWriter, *symbols: int) -> dict[int, tuple[int, int]]:
    """1- or 2-symbol simple prefix code (symbols must fit 8 bits);
    codes are assigned in WRITE order per spec. Returns symbol →
    (code, nbits)."""
    assert 1 <= len(symbols) <= 2 and all(s < 256 for s in symbols)
    wr.write(1, 1)
    wr.write(len(symbols) - 1, 1)
    first = symbols[0]
    if len(symbols) == 1:
        if first < 2:
            wr.write(0, 1)
            wr.write(first, 1)
        else:
            wr.write(1, 1)
            wr.write(first, 8)
        return {first: (0, 0)}
    wr.write(1, 1)  # first symbol in 8 bits
    wr.write(first, 8)
    wr.write(symbols[1], 8)
    return {first: (0, 1), symbols[1]: (1, 1)}


def full_tree(wr: _BitWriter, lengths: dict[int, int], alphabet: int):
    """Code-length-coded tree for arbitrary (symbol → length) maps —
    the only way to give symbols >= 256 (LZ77 lengths, cache hits) a
    code. Emits zero runs with clc 17/18. Returns symbol →
    (canonical code, nbits)."""
    used = sorted(set(lengths.values()))
    assert used and all(1 <= ln <= 7 for ln in used)
    # clc: the used lengths + 0 + 17 + 18, all at 3 bits (<= 8 symbols
    # -> kraft <= 1; _Prefix accepts incomplete codes)
    clc_syms = sorted(set(used) | {0, 17, 18})
    clc_len = {s: 3 for s in clc_syms}
    # canonical 3-bit codes in symbol order
    clc_code = {s: i for i, s in enumerate(clc_syms)}
    num_clc = max(_CLC_ORDER.index(s) for s in clc_syms) + 1
    wr.write(0, 1)  # not simple
    wr.write(num_clc - 4, 4)
    for i in range(num_clc):
        wr.write(clc_len.get(_CLC_ORDER[i], 0), 3)
    wr.write(0, 1)  # no max_symbol shortcut
    sym = 0
    while sym < alphabet:
        if sym in lengths:
            wr.write_code(clc_code[lengths[sym]], 3)
            sym += 1
            continue
        run = 0
        while sym + run < alphabet and (sym + run) not in lengths:
            run += 1
        while run >= 11:
            take = min(138, run)
            wr.write_code(clc_code[18], 3)
            wr.write(take - 11, 7)
            run -= take
            sym += take
        while run >= 3:
            take = min(10, run)
            wr.write_code(clc_code[17], 3)
            wr.write(take - 3, 3)
            run -= take
            sym += take
        for _ in range(run):
            wr.write_code(clc_code[0], 3)
            sym += 1
    # canonical codes for the main tree
    out = {}
    code = 0
    prev = 0
    for ln, s in sorted((ln, s) for s, ln in lengths.items()):
        code <<= ln - prev
        out[s] = (code, ln)
        code += 1
        prev = ln
    return out


class TestVp8lRoundTrip:
    def test_random_rgba(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (21, 17, 4), dtype=np.uint8)
        w, h, c, px = decode_webp(encode_webp(17, 21, img.tobytes()))
        assert (w, h, c) == (17, 21, 4)
        assert np.array_equal(px.reshape(21, 17, 4), img)

    def test_lossy_vp8_is_documented_boundary(self):
        b = (
            b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4
        )
        with pytest.raises(NotImplementedError, match="lossy"):
            decode_webp(b)

    def test_rejects_non_webp(self):
        with pytest.raises(ValueError, match="not a webp"):
            decode_webp(b"GIF89a" + b"\x00" * 20)


class TestHandCraftedStreams:
    def test_lz77_row_copy_via_distance_map(self):
        # 8x2: one literal row, then a length-8 backref with distance
        # code 1 -> _DIST_MAP (0,1) -> one row up
        w, h = 8, 2
        wr = _BitWriter()
        header(wr, w, h)
        wr.write(0, 1)  # no transform
        wr.write(0, 1)  # no cache
        wr.write(0, 1)  # no meta
        # green: literal 7 and length-symbol 261 (prefix value 7/8)
        g = full_tree(wr, {7: 1, 261: 1}, 256 + 24)
        simple_tree(wr, 50)
        simple_tree(wr, 60)
        simple_tree(wr, 255)
        simple_tree(wr, 0)  # distance: prefix value 1 -> dist code 1
        for _ in range(w):
            wr.write_code(*g[7])
        wr.write_code(*g[261])
        wr.write(1, 1)  # length extra bit: (2+1)<<1 + 1 + 1 = 8
        # distance symbol 0 is a single-symbol code: zero bits
        _, _, _, px = decode_vp8l(wr.finish())
        img = px.reshape(h, w, 4)
        assert (img == [50, 7, 60, 255]).all()

    def test_color_cache_hit(self):
        # literal pixel inserted into a 4-bit cache, then a cache hit
        w, h = 2, 1
        cache_bits = 4
        argb = (255 << 24) | (50 << 16) | (7 << 8) | 60
        key = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
        wr = _BitWriter()
        header(wr, w, h)
        wr.write(0, 1)  # no transform
        wr.write(1, 1)  # cache
        wr.write(cache_bits, 4)
        wr.write(0, 1)  # no meta
        g = full_tree(wr, {7: 1, 256 + 24 + key: 1}, 256 + 24 + (1 << cache_bits))
        simple_tree(wr, 50)
        simple_tree(wr, 60)
        simple_tree(wr, 255)
        simple_tree(wr, 0)
        wr.write_code(*g[7])
        wr.write_code(*g[256 + 24 + key])
        _, _, _, px = decode_vp8l(wr.finish())
        assert (px.reshape(1, 2, 4) == [50, 7, 60, 255]).all()

    def test_subtract_green_inverse(self):
        w, h = 1, 1
        wr = _BitWriter()
        header(wr, w, h)
        wr.write(1, 1)  # transform present
        wr.write(2, 2)  # subtract green
        wr.write(0, 1)  # no more transforms
        wr.write(0, 1)  # no cache
        wr.write(0, 1)  # no meta
        # stored residuals: g=10, r=200, b=250 -> out r=210, b=4 (mod 256)
        simple_tree(wr, 10)
        simple_tree(wr, 200)
        simple_tree(wr, 250)
        simple_tree(wr, 9)
        simple_tree(wr, 0)
        # all trees single-symbol: zero data bits for the one pixel
        _, _, _, px = decode_vp8l(wr.finish())
        assert list(px) == [210, 10, 4, 9]

    def test_palette_with_pixel_bundling(self):
        # 6 wide, palette of 4 -> width_bits=2, indices packed 4/byte in
        # the green channel; palette entries are delta-coded
        w, h = 6, 1
        wr = _BitWriter()
        header(wr, w, h)
        wr.write(1, 1)
        wr.write(3, 2)  # color indexing
        wr.write(3, 8)  # palette_size - 1
        # palette sub-image (4x1 entropy image): r-deltas of 10 build
        # entries r=10,20,30,40; alpha delta 255 then three zeros
        wr.write(0, 1)  # no cache
        simple_tree(wr, 0)  # green deltas
        simple_tree(wr, 10)  # red deltas
        simple_tree(wr, 0)  # blue deltas
        pa = simple_tree(wr, 255, 0)  # alpha deltas
        simple_tree(wr, 0)
        for alpha in (255, 0, 0, 0):
            wr.write_code(*pa[alpha])
        wr.write(0, 1)  # end of transforms
        wr.write(0, 1)  # no cache (spatial image)
        wr.write(0, 1)  # no meta
        # spatial image is ceil(6/4)=2 wide: packed greens
        # indices 0,1,2,3 -> 0|1<<2|2<<4|3<<6 = 0xE4; then 0,1 -> 0x04
        sg = simple_tree(wr, 0xE4, 0x04)
        simple_tree(wr, 0)
        simple_tree(wr, 0)
        simple_tree(wr, 255)
        simple_tree(wr, 0)
        wr.write_code(*sg[0xE4])
        wr.write_code(*sg[0x04])
        _, _, _, px = decode_vp8l(wr.finish())
        img = px.reshape(1, 6, 4)
        assert [int(p[0]) for p in img[0]] == [10, 20, 30, 40, 10, 20]
        assert all(int(p[3]) == 255 for p in img[0])

    def test_predictor_transform_top_mode(self):
        # 2x2, one predictor block with mode 2 (top): row 0 predicts
        # left/black by edge rules, row 1 adds the pixel above
        w, h = 2, 2
        wr = _BitWriter()
        header(wr, w, h)
        wr.write(1, 1)
        wr.write(0, 2)  # predictor transform
        wr.write(0, 3)  # size_bits = 2 -> one 4x4 block covers all
        wr.write(0, 1)  # sub-image: no cache
        simple_tree(wr, 2)  # green = mode 2 (top)
        simple_tree(wr, 0)
        simple_tree(wr, 0)
        simple_tree(wr, 0)
        simple_tree(wr, 0)
        wr.write(0, 1)  # end transforms
        wr.write(0, 1)  # no cache
        wr.write(0, 1)  # no meta
        # residuals: every pixel (a,r,g,b) = (1,2,3,4)
        simple_tree(wr, 3)
        simple_tree(wr, 2)
        simple_tree(wr, 4)
        simple_tree(wr, 1)
        simple_tree(wr, 0)
        _, _, _, px = decode_vp8l(wr.finish())
        img = px.reshape(2, 2, 4).astype(int)
        # (0,0): pred = opaque black (a=255) -> alpha wraps to 0
        assert list(img[0, 0]) == [2, 3, 4, 0]
        # (1,0): top row predicts LEFT; (0,1): left column predicts TOP
        assert list(img[0, 1]) == [4, 6, 8, 1]
        assert list(img[1, 0]) == [4, 6, 8, 1]
        # (1,1): mode 2 adds the pixel above
        assert list(img[1, 1]) == [6, 9, 12, 2]


class TestWebpThroughDecodeImage:
    def test_mapinpandas_decode(self, spark, tmp_path):
        from social_media_data_pipeline_spark.sources import binary as binary_source

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (5, 4, 4), dtype=np.uint8)
        (tmp_path / "im_1.webp").write_bytes(encode_webp(4, 5, img.tobytes()))
        df = binary_source.read_binary_folder(spark, str(tmp_path), "*.webp")
        rows = binary_source.decode_image(df).collect()
        assert len(rows) == 1
        row = rows[0]
        assert (row.format, row.width, row.height, row.channels) == ("webp", 4, 5, 4)
        assert np.array_equal(
            np.array(row.pixels, dtype=np.uint8).reshape(5, 4, 4), img
        )
