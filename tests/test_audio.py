"""Tests: audio modality — WAV codec round-trips, DSP features,
Spark mapInPandas plumbing (decode / metadata / frame features /
clip windowing)."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.sources import audio
from social_media_data_pipeline_spark.sources import binary as binary_source


def sine(freq=440.0, sr=8000, dur=0.5, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


class TestWavCodec:
    @pytest.mark.parametrize("bits,tol", [(8, 1e-2), (16, 1e-4), (24, 1e-6), (32, 1e-7), (33, 1e-7)])
    def test_round_trip_mono(self, bits, tol):
        x = sine()
        b = audio.encode_wav(x, 8000, bits=bits)
        y, sr = audio.decode_wav(b)
        assert sr == 8000 and y.shape == (x.size, 1)
        assert np.max(np.abs(y[:, 0] - x)) < tol

    def test_round_trip_stereo(self):
        left, right = sine(300), sine(600)
        x = np.stack([left, right], axis=1)
        b = audio.encode_wav(x, 16000, bits=16)
        y, sr = audio.decode_wav(b)
        assert sr == 16000 and y.shape == x.shape
        assert np.max(np.abs(y - x)) < 1e-4

    def test_info_and_sniff(self):
        b = audio.encode_wav(sine(), 8000, bits=16)
        info = audio.wav_info(b)
        assert info["sample_rate"] == 8000 and info["n_channels"] == 1
        assert info["bits_per_sample"] == 16 and info["n_frames"] == 4000
        assert binary_source._sniff_format(b) == "wav"
        assert audio._sniff_audio(b) == "wav"

    def test_extensible_fmt_tag(self):
        # rewrap a PCM wav as WAVE_FORMAT_EXTENSIBLE: tag 0xFFFE + GUID
        import struct

        x = sine(dur=0.1)
        raw = np.round(np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 4)  # cbSize, valid bits, channel mask
        fmt += struct.pack("<H", 1) + b"\x00" * 14  # subformat GUID, first 2 bytes = PCM
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(raw)) + raw
        b = b"RIFF" + struct.pack("<I", len(body)) + body
        y, sr = audio.decode_wav(b)
        assert sr == 8000 and abs(y.shape[0] - x.size) <= 1

    def test_compressed_tag_is_boundary(self):
        import struct

        fmt = struct.pack("<HHIIHH", 0x0055, 1, 8000, 1000, 1, 0)  # MP3-in-WAV
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        b = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(NotImplementedError):
            audio.decode_wav(b)

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            audio.decode_wav(b"not a wav at all")


class TestTelephonyCodecs:
    @pytest.mark.parametrize("law,tol", [("mulaw", 0.04), ("alaw", 0.04)])
    def test_g711_round_trip(self, law, tol):
        x = sine()
        b = audio.encode_wav_g711(x, 8000, law=law)
        info = audio.wav_info(b)
        assert info["format_tag"] == (7 if law == "mulaw" else 6)
        assert info["n_frames"] == x.size and info["bits_per_sample"] == 8
        y, sr = audio.decode_wav(b)
        assert sr == 8000 and y.shape == (x.size, 1)
        # logarithmic companding: max step near full scale bounds error
        assert np.max(np.abs(y[:, 0] - x)) < tol

    @pytest.mark.parametrize("law", ["mulaw", "alaw"])
    def test_g711_requantization_fixed_point(self, law):
        # encode(decode(encode(x))) == encode(x): decoded values are
        # exact quantizer reconstruction levels
        x = sine(freq=123.0, dur=0.2)
        b1 = audio.encode_wav_g711(x, 8000, law=law)
        y, _ = audio.decode_wav(b1)
        b2 = audio.encode_wav_g711(y[:, 0], 8000, law=law)
        assert b1 == b2

    def test_g711_stereo(self):
        x = np.stack([sine(300, dur=0.1), sine(600, dur=0.1)], axis=1)
        y, sr = audio.decode_wav(audio.encode_wav_g711(x, 16000, law="alaw"))
        assert sr == 16000 and y.shape == x.shape
        assert np.max(np.abs(y - x)) < 0.04

    @pytest.mark.parametrize("n", [505, 505 * 3, 505 * 2 + 101])
    def test_ima_adpcm_round_trip(self, n):
        # partial final block exercises the fact-chunk frame trim
        sr = 8000
        t = np.arange(n) / sr
        x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        b = audio.encode_wav_ima_adpcm(x, sr)
        info = audio.wav_info(b)
        assert info["format_tag"] == 0x11 and info["samples_per_block"] == 505
        assert info["n_frames"] == n
        y, got_sr = audio.decode_wav(b)
        assert got_sr == sr and y.shape == (n, 1)
        # adaptive 4-bit prediction tracks a smooth signal closely once
        # the step size has ramped up from its block-1 cold start
        assert np.max(np.abs(y[64:, 0] - x[64:])) < 0.06
        assert np.mean(np.abs(y[:, 0] - x)) < 0.03

    def test_ima_adpcm_block_headers_resync(self):
        # a step discontinuity at a block boundary: each block header
        # re-seeds the predictor, so the decode must re-lock immediately
        sr = 8000
        x = np.concatenate([np.full(505, -0.6), np.full(505, 0.6)])
        y, _ = audio.decode_wav(audio.encode_wav_ima_adpcm(x, sr))
        assert abs(y[505, 0] - 0.6) < 1e-3  # block-2 header predictor is exact
        assert np.max(np.abs(y[600:1010, 0] - 0.6)) < 0.02


class TestDsp:
    def test_resample_preserves_duration_and_tone(self):
        x = sine(440, 8000, 1.0)
        y = audio.resample_linear(x, 8000, 16000)
        assert abs(y.size - 16000) <= 1
        feats = audio.frame_features(y, 16000, frame_len=2048, hop=1024)
        # spectral centroid of a pure sine sits near its frequency
        assert abs(feats["centroid_hz"].median() - 440) < 60

    def test_frame_features_shapes(self):
        x = sine(1000, 8000, 0.5, amp=0.25)
        feats = audio.frame_features(x, 8000, frame_len=1024, hop=512)
        assert len(feats) == 1 + (x.size - 1024) // 512
        # RMS of a sine = amp / sqrt(2)
        assert abs(feats["rms"].median() - 0.25 / np.sqrt(2)) < 0.01
        # ZCR of a 1 kHz tone at 8 kHz = 2*f/sr = 0.25
        assert abs(feats["zcr"].median() - 0.25) < 0.02

    def test_silence_and_short_input(self):
        z = np.zeros(4096, dtype=np.float32)
        feats = audio.frame_features(z, 8000)
        assert (feats["rms"] == 0).all() and (feats["centroid_hz"] == 0).all()
        assert len(audio.frame_features(np.zeros(10, dtype=np.float32), 8000)) == 0

    def test_log_mel_shape_and_energy_ordering(self):
        lo, hi = sine(200, 8000, 0.5), sine(3000, 8000, 0.5)
        m_lo = audio.log_mel_spectrogram(lo, 8000, n_mels=20)
        m_hi = audio.log_mel_spectrogram(hi, 8000, n_mels=20)
        assert m_lo.shape == m_hi.shape and m_lo.shape[1] == 20
        # low tone concentrates energy in low mel bands, high in high
        assert m_lo.mean(axis=0).argmax() < m_hi.mean(axis=0).argmax()


class TestSparkAudio:
    @pytest.fixture()
    def wav_folder(self, tmp_path):
        for name, freq, sr, dur in [("a.wav", 440, 8000, 0.6), ("b.wav", 880, 16000, 1.2)]:
            (tmp_path / name).write_bytes(audio.encode_wav(sine(freq, sr, dur), sr, bits=16))
        return str(tmp_path)

    def test_metadata(self, spark, wav_folder):
        df = binary_source.read_binary_folder(spark, wav_folder, glob="*.wav")
        meta = audio.audio_metadata(df).select("image", "meta.*").orderBy("image").collect()
        assert [r["format"] for r in meta] == ["wav", "wav"]
        assert [r["sample_rate"] for r in meta] == [8000, 16000]
        assert abs(meta[0]["duration_s"] - 0.6) < 1e-3

    def test_decode_resample(self, spark, wav_folder):
        df = binary_source.read_binary_folder(spark, wav_folder, glob="*.wav")
        out = audio.decode_audio(df, target_sr=8000).select("image", "sample_rate", "n_samples")
        rows = {r["image"]: r for r in out.collect()}
        assert rows["a.wav"]["sample_rate"] == 8000 and rows["b.wav"]["sample_rate"] == 8000
        # b.wav: 1.2 s at 16 kHz resampled to 8 kHz -> ~9600 samples
        assert abs(rows["b.wav"]["n_samples"] - 9600) <= 2

    def test_frame_features_df(self, spark, wav_folder):
        df = binary_source.read_binary_folder(spark, wav_folder, glob="a.wav")
        feats = audio.audio_frame_features(df, frame_len=1024, hop=512)
        pdf = feats.select("image", "frame", "centroid_hz").toPandas()
        assert (pdf["image"] == "a.wav").all() and len(pdf) == 1 + (4800 - 1024) // 512
        assert abs(pdf["centroid_hz"].median() - 440) < 60

    def test_clip_windows_round_trip(self, spark, wav_folder):
        df = binary_source.read_binary_folder(spark, wav_folder, glob="b.wav")
        clips = audio.sample_audio_windows(
            df, window_s=0.25, every_s=0.5, max_windows=3
        ).collect()
        assert 1 <= len(clips) <= 3
        x, sr = audio.decode_wav(bytes(clips[0]["clip"]))
        assert sr == 16000 and x.shape[0] == 4000  # 0.25 s at 16 kHz


class TestAudioFingerprint:
    def _ham(self, a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    def _tone_mix(self, seed, sr=8000, dur=1.0):
        rng = np.random.default_rng(seed)
        t = np.arange(int(sr * dur)) / sr
        x = np.zeros_like(t)
        for f, a in zip(rng.uniform(100, 3000, 4), rng.uniform(0.1, 0.3, 4)):
            x += a * np.sin(2 * np.pi * f * t)
        return (x / np.max(np.abs(x)) * 0.8).astype(np.float32)

    def test_invariance_and_discrimination(self):
        x = self._tone_mix(1)
        fp = audio.audio_fingerprint64(x, 8000)
        # gain change: gradients unaffected
        assert self._ham(fp, audio.audio_fingerprint64(x * 0.4, 8000)) <= 2
        # 16-bit re-encode round trip: tiny distance
        y16, _ = audio.decode_wav(audio.encode_wav(x, 8000, bits=16))
        assert self._ham(fp, audio.audio_fingerprint64(y16[:, 0], 8000)) <= 2
        # 8-bit re-encode (harsh -48 dB quantization noise): still well
        # under the cross-material distances
        y8, _ = audio.decode_wav(audio.encode_wav(x, 8000, bits=8))
        assert self._ham(fp, audio.audio_fingerprint64(y8[:, 0], 8000)) <= 12
        # resample to 16 kHz: near-identical (canonical internal rate)
        z = audio.resample_linear(x, 8000, 16000)
        assert self._ham(fp, audio.audio_fingerprint64(z, 16000)) <= 2
        # different material: far
        other = audio.audio_fingerprint64(self._tone_mix(77), 8000)
        assert self._ham(fp, other) > 12

    def test_spark_dedup_trio_machinery(self, spark, tmp_path):
        from social_media_data_pipeline_spark.functions.sketches import (
            hamming_blocked_pairs,
        )
        from pyspark.sql import functions as F

        base = self._tone_mix(5)
        (tmp_path / "a.wav").write_bytes(audio.encode_wav(base, 8000, bits=16))
        # resampled re-encode: a true near-dup (canonical-rate hash)
        (tmp_path / "b.wav").write_bytes(
            audio.encode_wav(
                audio.resample_linear(base, 8000, 16000), 16000, bits=16
            )
        )
        (tmp_path / "c.wav").write_bytes(
            audio.encode_wav(self._tone_mix(99), 8000, bits=16)
        )
        df = binary_source.read_binary_folder(spark, str(tmp_path), glob="*.wav")
        hashes = audio.audio_dhash(df)
        pairs = hamming_blocked_pairs(
            hashes.select(F.col("audio").alias("doc"), F.col("afp").alias("fp")),
            tau=8,
            bits=64,
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in pairs} == {("a.wav", "b.wav")}

    def test_empty_audio_fingerprint_zero(self):
        assert audio.audio_fingerprint64(np.zeros(10, np.float32), 8000) == 0
