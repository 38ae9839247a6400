"""Tests: MJPEG AVI container — parse, frame sampling, Spark wiring
(`sources/avi.py` + `sources/binary.py:sample_video_frames`)."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.sources import avi
from social_media_data_pipeline_spark.sources import binary as binary_source
from social_media_data_pipeline_spark.sources.jpeg import decode_jpeg, encode_jpeg


def _frames(n, w=32, h=16):
    out = []
    for i in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx * 3 + i * 11) % 256, (yy * 5 + i * 7) % 256, (xx + yy + i) % 256],
            axis=-1,
        ).astype(np.uint8)
        out.append(img.tobytes())
    return out


class TestAviContainer:
    def test_parse_header_and_directory(self):
        b = avi.encode_avi_mjpeg(32, 16, _frames(5), fps=25.0)
        info = avi.parse_avi(b)
        assert (info["width"], info["height"]) == (32, 16)
        assert info["codec"] == "MJPG" and info["n_frames"] == 5
        assert abs(info["fps"] - 25.0) < 0.01
        assert binary_source._sniff_format(b) == "avi"

    def test_frame_payloads_are_jpegs_matching_roundtrip(self):
        frames = _frames(3)
        b = avi.encode_avi_mjpeg(32, 16, frames, quality=80)
        decoded = list(avi.decode_avi_mjpeg_frames(b, every_n=1))
        assert [d[0] for d in decoded] == [0, 1, 2]
        for (idx, w, h, rgb), orig in zip(decoded, frames):
            # must equal decoding the standalone JPEG of the same frame
            ref = decode_jpeg(encode_jpeg(32, 16, orig, channels=3, quality=80))[3]
            assert np.array_equal(rgb.reshape(-1), ref)

    def test_sampling_skips_without_decoding(self):
        b = avi.encode_avi_mjpeg(32, 16, _frames(10))
        idxs = [d[0] for d in avi.decode_avi_mjpeg_frames(b, every_n=4)]
        assert idxs == [0, 4, 8]

    def test_non_mjpeg_codec_is_boundary(self):
        b = bytearray(avi.encode_avi_mjpeg(32, 16, _frames(1)))
        i = b.find(b"vids") + 4
        b[i : i + 4] = b"H264"
        with pytest.raises(NotImplementedError, match="inter-frame"):
            list(avi.decode_avi_mjpeg_frames(bytes(b), every_n=1))

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            avi.parse_avi(b"RIFF\x00\x00\x00\x00WAVE")
        with pytest.raises(ValueError):
            avi.encode_avi_mjpeg(8, 8, [])


class TestSparkAviSampling:
    def test_sample_video_frames_mixed_formats(self, spark, tmp_path):
        frames = _frames(6, 16, 16)
        (tmp_path / "clip.avi").write_bytes(avi.encode_avi_mjpeg(16, 16, frames))
        rgb_arrays = [np.frombuffer(f, np.uint8).reshape(16, 16, 3) for f in frames[:2]]
        (tmp_path / "clip.y4m").write_bytes(
            binary_source.encode_y4m(16, 16, rgb_arrays, colorspace="444")
        )
        df = binary_source.read_binary_folder(spark, str(tmp_path), glob="*")
        df = df.withColumnRenamed("image", "video")
        out = binary_source.sample_video_frames(df, every_n=3)
        rows = out.select("video", "frame_idx", "width", "height").collect()
        got = sorted((r["video"], r["frame_idx"]) for r in rows)
        assert got == [("clip.avi", 0), ("clip.avi", 3), ("clip.y4m", 0)]
        # sampled frames are valid ppm consumable by decode_image
        frame_df = binary_source.decode_image(
            out.selectExpr("video as image", "frame as content"), key_col="image"
        )
        assert frame_df.count() == 3
