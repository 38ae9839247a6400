"""Tests: TIFF codec (`sources/tiff.py`) — every compression, both
byte orders, multi-strip layout, gray + RGB, boundary reporting, and
the decode_image dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.sources import tiff


def _gradient(w, h, c):
    px = np.arange(w * h * c, dtype=np.uint8)  # wraps mod 256: runs + variety
    return bytes(px)


class TestTiffRoundTrip:
    @pytest.mark.parametrize("comp", [1, 5, 32773])
    @pytest.mark.parametrize("big", [False, True])
    def test_rgb_roundtrip(self, comp, big):
        w, h = 13, 9
        data = _gradient(w, h, 3)
        blob = tiff.encode_tiff(w, h, data, channels=3, compression=comp, big_endian=big)
        gw, gh, gc, px = tiff.decode_tiff(blob)
        assert (gw, gh, gc) == (w, h, 3)
        assert bytes(px) == data

    @pytest.mark.parametrize("comp", [1, 5, 32773])
    def test_gray_multistrip(self, comp):
        w, h = 21, 17
        data = _gradient(w, h, 1)
        blob = tiff.encode_tiff(w, h, data, channels=1, compression=comp, rows_per_strip=4)
        gw, gh, gc, px = tiff.decode_tiff(blob)
        assert (gw, gh, gc) == (w, h, 1)
        assert bytes(px) == data

    def test_lzw_table_reset_on_large_image(self):
        """Enough distinct strings to force the encoder's table reset
        (next_code 4094) and the decoder's mid-stream CLEAR path."""
        rng = np.random.default_rng(4)
        w, h = 128, 64
        data = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        blob = tiff.encode_tiff(w, h, data, channels=3, compression=5)
        _, _, _, px = tiff.decode_tiff(blob)
        assert bytes(px) == data

    def test_packbits_run_compression_effective(self):
        w, h = 64, 8
        data = bytes([7]) * (w * h)  # pure runs
        # codec level: 512 run bytes pack into 128-byte max runs
        assert len(tiff._packbits(data)) <= 2 * ((len(data) + 127) // 128)
        blob = tiff.encode_tiff(w, h, data, channels=1, compression=32773)
        assert bytes(tiff.decode_tiff(blob)[3]) == data

    def test_min_is_white_inverted(self):
        # hand-build photometric 0 by patching the encoder output's tag
        w, h = 4, 2
        data = _gradient(w, h, 1)
        blob = bytearray(tiff.encode_tiff(w, h, data, channels=1))
        # tag 262 value: locate the entry and flip its inline value
        # simpler: encoder writes photometric=1 for gray; flip the value
        idx = blob.find((262).to_bytes(2, "little"))
        assert idx > 0
        blob[idx + 8] = 0
        _, _, _, px = tiff.decode_tiff(bytes(blob))
        assert bytes(px) == bytes(255 - b for b in data)

    def test_boundaries_reported(self):
        with pytest.raises(ValueError, match="not a tiff"):
            tiff.decode_tiff(b"XXXX")
        blob = bytearray(tiff.encode_tiff(3, 3, _gradient(3, 3, 1), channels=1))
        idx = blob.find((259).to_bytes(2, "little"))
        blob[idx + 8] = 7  # compression 7 = JPEG-in-TIFF
        with pytest.raises(NotImplementedError, match="compression 7"):
            tiff.decode_tiff(bytes(blob))

    def test_truncated_strip_reported(self):
        blob = tiff.encode_tiff(8, 8, _gradient(8, 8, 3), channels=3, compression=5)
        with pytest.raises(ValueError, match="LZW|truncated"):
            tiff.decode_tiff(blob[:-10])


class TestDispatch:
    def test_decode_image_handles_tiff(self, spark):
        from social_media_data_pipeline_spark.sources.binary import decode_image

        w, h = 6, 4
        data = _gradient(w, h, 3)
        blob = tiff.encode_tiff(w, h, data, channels=3, compression=5)
        df = spark.createDataFrame(
            [("t.tiff", bytearray(blob))], "image string, content binary"
        )
        row = decode_image(df).collect()[0]
        assert row["format"] == "tiff"
        assert (row["width"], row["height"], row["channels"]) == (w, h, 3)
        assert bytes(bytearray([x & 0xFF for x in row["pixels"]])) == data
