"""Tests: MPEG audio frame-header metadata (`sources/mp3.py`) — CBR
and VBR walks, ID3v2 skip, trailing-tag tolerance, corrupt-stream
reporting, and the Spark metadata path."""

from __future__ import annotations

import pytest

from social_media_data_pipeline_spark.sources import mp3


class TestMp3Info:
    def test_cbr_walk(self):
        b = mp3.encode_mp3_skeleton(100, bitrate_kbps=128, sample_rate=44100)
        info = mp3.mp3_info(b)
        assert info["n_frames"] == 100
        assert info["sample_rate"] == 44100
        assert info["layer"] == 3 and info["version"] == "1"
        assert info["avg_bitrate"] == 128000 and info["vbr"] is False
        assert abs(info["duration_s"] - 100 * 1152 / 44100) < 1e-9
        assert info["n_channels"] == 2

    def test_vbr_average_is_sample_weighted(self):
        rates = [64, 128, 256, 128]
        b = mp3.encode_mp3_skeleton(4, sample_rate=44100, bitrates_per_frame=rates)
        info = mp3.mp3_info(b)
        assert info["vbr"] is True
        assert info["avg_bitrate"] == int(round(sum(r * 1000 for r in rates) / 4))

    def test_id3v2_tag_skipped(self):
        b = mp3.encode_mp3_skeleton(10, id3v2_bytes=500)
        info = mp3.mp3_info(b)
        assert info["n_frames"] == 10

    def test_trailing_id3v1_tolerated(self):
        b = mp3.encode_mp3_skeleton(10) + b"TAG" + b"\x00" * 125
        assert mp3.mp3_info(b)["n_frames"] == 10

    def test_mid_stream_corruption_reported(self):
        b = bytearray(mp3.encode_mp3_skeleton(10))
        # clobber the 6th frame header (frame length 417 @128kbps/44.1k)
        flen = 144 * 128000 // 44100
        b[5 * flen] = 0x00
        with pytest.raises(ValueError, match="lost MPEG frame sync"):
            mp3.mp3_info(bytes(b))

    def test_layer1_and_mono(self):
        b = mp3.encode_mp3_skeleton(8, bitrate_kbps=384, layer=1, mode=3)
        info = mp3.mp3_info(b)
        assert info["layer"] == 1 and info["n_channels"] == 1
        assert info["total_samples"] == 8 * 384

    def test_not_mpeg_raises(self):
        with pytest.raises(ValueError, match="no MPEG audio frame"):
            mp3.mp3_info(b"\x00" * 5000)


class TestSparkMetadataPath:
    def test_audio_metadata_fills_mp3_fields(self, spark):
        from social_media_data_pipeline_spark.sources.audio import audio_metadata

        blob = mp3.encode_mp3_skeleton(50, bitrate_kbps=192, sample_rate=32000)
        df = spark.createDataFrame([(1, bytearray(blob))], "id long, content binary")
        row = audio_metadata(df).collect()[0]["meta"]
        assert row["format"] == "mp3"
        assert row["sample_rate"] == 32000
        assert row["n_frames"] == 50 * 1152
        # meta struct stores float32 — compare at that precision
        assert abs(row["duration_s"] - 50 * 1152 / 32000) < 1e-5


class TestTruncationAndMixedRate:
    """r7: truncated final frames are REPORTED; duration accumulates at
    each frame's own sample rate."""

    def test_truncated_final_frame_raises(self):
        b = mp3.encode_mp3_skeleton(10)
        flen = 144 * 128000 // 44100
        with pytest.raises(ValueError, match="truncated final MPEG frame"):
            mp3.mp3_info(b[: -flen // 2])  # cut the last frame in half

    def test_mixed_sample_rate_duration_per_frame(self):
        # two structurally-valid streams at different rates concatenated:
        # walker accepts mid-stream rate changes, duration must weight
        # each frame by its own rate (not the first frame's)
        a = mp3.encode_mp3_skeleton(10, sample_rate=44100)
        b = mp3.encode_mp3_skeleton(10, sample_rate=32000)
        info = mp3.mp3_info(a + b)
        assert info["n_frames"] == 20
        want = 10 * 1152 / 44100 + 10 * 1152 / 32000
        assert abs(info["duration_s"] - want) < 1e-9
