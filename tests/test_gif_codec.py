"""GIF codec tests: encoder round-trip, a genuinely-compressed LZW
stream (dictionary growth, variable code width, KwKwK), interlace, and
the decode_image mapInPandas integration."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.sources import binary as binary_source
from social_media_data_pipeline_spark.sources.gif import (
    _BitWriter,
    decode_gif,
    encode_gif,
)


def lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """Reference GIF LZW compressor (test-local): real dictionary,
    variable width mirroring the decoder's early-change rule — produces
    streams a literal-only encoder never would."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    writer = _BitWriter()
    writer.write(clear, width)
    dec_len = clear + 2  # decoder's table length, tracked for width sync
    emitted_any = False

    def emit(code: int) -> None:
        nonlocal dec_len, width, emitted_any
        writer.write(code, width)
        if emitted_any and dec_len < 4096:
            dec_len += 1  # decoder adds one entry per code after the first
        emitted_any = True
        if dec_len == (1 << width) and width < 12:
            width += 1

    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(end)
    return writer.finish()


def wrap_gif(w: int, h: int, palette: np.ndarray, data: bytes, min_code: int,
             interlaced: bool = False) -> bytes:
    """Container plumbing around an externally-produced LZW stream."""
    bits = max(1, int(len(palette) - 1).bit_length())
    full = np.zeros((1 << bits, 3), dtype=np.uint8)
    full[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (bits - 1), 0, 0])
    out += full.tobytes()
    # a graphic-control extension, to exercise extension skipping
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    out += b"\x2c" + b"\x00" * 4
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlaced else 0x00])
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


class TestGifCodec:
    def test_round_trip_random(self):
        rng = np.random.default_rng(7)
        pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 8, (17, 23))]
        w, h, c, px = decode_gif(encode_gif(23, 17, img.tobytes()))
        assert (w, h, c) == (23, 17, 3)
        assert np.array_equal(px.reshape(17, 23, 3), img)

    def test_round_trip_full_palette(self):
        rng = np.random.default_rng(11)
        pal = np.array([[i, 255 - i, (i * 7) % 256] for i in range(256)], dtype=np.uint8)
        img = pal[rng.integers(0, 256, (31, 29))]
        _, _, _, px = decode_gif(encode_gif(29, 31, img.tobytes()))
        assert np.array_equal(px.reshape(31, 29, 3), img)

    def test_real_lzw_stream_with_dictionary_growth(self):
        # repetitive data compresses into multi-byte dictionary entries
        # and grows the code width past min+1
        rng = np.random.default_rng(3)
        pattern = rng.integers(0, 4, 37, dtype=np.uint8).tobytes()
        indices = (pattern * 200)[: 80 * 80]
        pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
        data = lzw_compress(indices, min_code_size=2)
        # sanity: genuinely compressed, not literal codes
        assert len(data) < len(indices) * 3 // 8
        b = wrap_gif(80, 80, pal, data, 2)
        w, h, c, px = decode_gif(b)
        assert (w, h) == (80, 80)
        expect = pal[np.frombuffer(indices, dtype=np.uint8)]
        assert np.array_equal(px.reshape(-1, 3), expect)

    def test_kwkwk_case(self):
        # 'aaaa...' is the canonical KwKwK stream: code N emitted before
        # the decoder has table[N]
        indices = bytes([1] * 64)
        pal = np.array([[0, 0, 0], [200, 100, 50]], dtype=np.uint8)
        data = lzw_compress(indices, min_code_size=2)
        _, _, _, px = decode_gif(wrap_gif(8, 8, pal, data, 2))
        assert np.array_equal(px.reshape(-1, 3), pal[np.frombuffer(indices, np.uint8)])

    def test_interlaced(self):
        # rows are stored in pass order; decoder must un-shuffle them
        h, w = 13, 5
        pal = np.array([[i * 16, 0, 0] for i in range(16)], dtype=np.uint8)
        img_idx = np.arange(h * w, dtype=np.uint8).reshape(h, w) % 16
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        stored = img_idx[order].reshape(-1).tobytes()
        data = lzw_compress(stored, min_code_size=4)
        _, _, _, px = decode_gif(wrap_gif(w, h, pal, data, 4, interlaced=True))
        assert np.array_equal(px.reshape(h, w, 3), pal[img_idx])

    def test_encode_rejects_too_many_colors(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (30, 30, 3), dtype=np.uint8)  # ~900 colors
        with pytest.raises(ValueError, match="palette"):
            encode_gif(30, 30, img.tobytes())

    def test_decode_rejects_non_gif(self):
        with pytest.raises(ValueError, match="not a gif"):
            decode_gif(b"P6\n1 1\n255\nxyz")


class TestRealWorldGifs:
    """Cross-validation against files produced by real GIF encoders
    (CPython's idlelib icons, present wherever the pyenv CPython tree
    is) — these carry genuinely compressed LZW streams no test-local
    encoder produced."""

    ICONS = "/root/.pyenv/versions/3.11.7/lib/python3.11/idlelib/Icons"

    def test_decodes_real_encoder_output(self):
        import glob
        import os

        paths = sorted(glob.glob(os.path.join(self.ICONS, "*.gif")))
        if not paths:
            pytest.skip("no real-world gif fixtures on this machine")
        for p in paths:
            b = open(p, "rb").read()
            w, h, c, px = decode_gif(b)
            # the decode must fill the frame exactly — any LZW desync
            # (bad width sync, bad dictionary) raises before this
            assert w > 0 and h > 0 and c == 3
            assert px.shape == (w * h * 3,) and px.dtype.name == "uint8"


class TestGifThroughDecodeImage:
    def test_mapinpandas_decode(self, spark, tmp_path):
        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        img = pal[rng.integers(0, 4, (6, 7))]
        path = tmp_path / "img_1.gif"
        path.write_bytes(encode_gif(7, 6, img.tobytes()))
        df = binary_source.read_binary_folder(spark, str(tmp_path), "*.gif")
        out = binary_source.decode_image(df).collect()
        assert len(out) == 1
        row = out[0]
        assert (row.format, row.width, row.height, row.channels) == ("gif", 7, 6, 3)
        assert np.array_equal(
            np.array(row.pixels, dtype=np.uint8).reshape(6, 7, 3), img
        )
