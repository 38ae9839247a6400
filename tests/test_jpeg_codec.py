"""Baseline JPEG codec round-trip tests (`sources/jpeg.py`).

Pure-Python/numpy codec, no Spark session needed: the Spark-side
plumbing (mapInPandas dispatch) is covered in test_sources_and_ml.py;
here we exercise the codec itself — subsampling modes, restart
markers, grayscale, edge dimensions, and the unsupported-format
boundaries.
"""

import numpy as np
import pytest

from social_media_data_pipeline_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _gradient(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)


def _psnr(a, b):
    err = (a.astype(float) - b.astype(float)) ** 2
    return 10 * np.log10(255**2 / max(err.mean(), 1e-9))


def _roundtrip(img, **kw):
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    enc = encode_jpeg(w, h, img, channels=c, **kw)
    W, H, C, px = decode_jpeg(enc)
    assert (W, H, C) == (w, h, c)
    return np.asarray(px, dtype=np.uint8).reshape(h, w, c).squeeze(), enc


class TestRoundTrip:
    def test_444_high_quality(self):
        img = _gradient(67, 41)
        out, _ = _roundtrip(img, quality=90, subsample="444")
        assert _psnr(out, img) > 40

    def test_420_subsampled(self):
        img = _gradient(67, 41)
        out, enc444 = _roundtrip(img, quality=90, subsample="444")
        out420, enc420 = _roundtrip(img, quality=90, subsample="420")
        assert _psnr(out420, img) > 35
        assert len(enc420) < len(enc444)  # subsampling shrinks the file

    def test_solid_color_exact(self):
        img = np.full((16, 24, 3), 128, np.uint8)
        out, _ = _roundtrip(img, quality=95)
        assert np.array_equal(out, img)  # flat DC block is DCT-exact

    def test_grayscale(self):
        g = (np.arange(41 * 67, dtype=np.int64).reshape(41, 67) % 256).astype(
            np.uint8
        )
        out, _ = _roundtrip(g, quality=90)
        assert _psnr(out, g) > 30

    def test_restart_markers(self):
        """DRI/RSTn: decode must resync and reset DC predictors, output
        matching the no-restart encode of the same pixels."""
        img = _gradient(67, 41)
        base, _ = _roundtrip(img, quality=90, subsample="444")
        for ri in (1, 2, 5):
            out, enc = _roundtrip(
                img, quality=90, subsample="444", restart_interval=ri
            )
            assert np.array_equal(out, base), f"restart_interval={ri}"
            assert b"\xff\xdd" in enc  # DRI segment present
        out420, _ = _roundtrip(
            img, quality=90, subsample="420", restart_interval=3
        )
        assert _psnr(out420, img) > 35

    def test_non_multiple_of_8_and_tiny(self):
        for w, h in [(1, 1), (7, 3), (9, 17), (8, 8)]:
            img = _gradient(w, h)
            out, _ = _roundtrip(img, quality=95)
            assert out.reshape(h, w, 3).shape == (h, w, 3)

    def test_quality_monotonic_size(self):
        img = _gradient(67, 41)
        sizes = [
            len(encode_jpeg(67, 41, img, quality=q)) for q in (30, 60, 90)
        ]
        assert sizes == sorted(sizes)

    def test_higher_quality_higher_fidelity(self):
        img = _gradient(67, 41)
        lo, _ = _roundtrip(img, quality=30)
        hi, _ = _roundtrip(img, quality=95)
        assert _psnr(hi, img) > _psnr(lo, img)


class TestBoundaries:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"nope")

    def test_arithmetic_rejected_clearly(self):
        # SOI + SOF9 (arithmetic sequential): decoder names the limitation
        sof9 = bytes([0xFF, 0xC9, 0x00, 0x0B, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
        with pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg(b"\xff\xd8" + sof9)

    def test_truncated_stream(self):
        img = _gradient(16, 16)
        enc = encode_jpeg(16, 16, img, quality=90)
        with pytest.raises(ValueError):
            decode_jpeg(enc[: len(enc) // 2])

    def test_bad_channels(self):
        with pytest.raises(ValueError, match="channels"):
            encode_jpeg(2, 2, np.zeros((2, 2, 2), np.uint8), channels=2)

    def test_bad_subsample(self):
        with pytest.raises(ValueError, match="subsample"):
            encode_jpeg(
                8, 8, np.zeros((8, 8, 3), np.uint8), subsample="422"
            )


class TestProgressive:
    """Progressive (SOF2) coverage. The encoder quantizes with the
    exact op order of the baseline encoder, so decoding the progressive
    file must yield pixels IDENTICAL to the baseline round-trip — a
    full-pipeline equality check with the independently-validated
    baseline path as the reference."""

    def _both(self, img, scans=None, **kw):
        from social_media_data_pipeline_spark.sources.jpeg import (
            encode_jpeg_progressive,
        )

        h, w = img.shape[:2]
        c = 1 if img.ndim == 2 else img.shape[2]
        base = encode_jpeg(w, h, img, channels=c, **kw)
        prog = encode_jpeg_progressive(w, h, img, channels=c, scans=scans, **kw)
        return decode_jpeg(base), decode_jpeg(prog), prog

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("q", [55, 85])
    def test_matches_baseline_rgb(self, sub, q):
        img = _gradient(37, 23)
        b, p, prog = self._both(img, quality=q, subsample=sub)
        assert b[:3] == p[:3]
        assert np.array_equal(b[3], p[3])
        # really progressive: SOF2 marker + multiple SOS scans
        assert b"\xff\xc2" in prog and prog.count(b"\xff\xda") >= 6

    def test_matches_baseline_grayscale(self):
        img = _gradient(24, 17)[:, :, 0]
        b, p, _ = self._both(img, quality=70)
        assert np.array_equal(b[3], p[3])

    def test_spectral_selection_only_script(self):
        # no successive approximation: DC then two AC bands, Ah=Al=0
        img = _gradient(16, 16)
        scans = [([0, 1, 2], 0, 0, 0, 0)]
        scans += [([c], 1, 31, 0, 0) for c in range(3)]
        scans += [([c], 32, 63, 0, 0) for c in range(3)]
        b, p, _ = self._both(img, scans=scans, quality=80)
        assert np.array_equal(b[3], p[3])

    def test_deep_successive_approximation(self):
        # three AC refinement levels exercises EOB-run + correction bits
        img = _gradient(40, 32)
        scans = [([0, 1, 2], 0, 0, 0, 2)]
        scans += [([c], 1, 63, 0, 3) for c in range(3)]
        scans += [([c], 1, 63, 3, 2) for c in range(3)]
        scans += [([c], 1, 63, 2, 1) for c in range(3)]
        scans += [([0, 1, 2], 0, 0, 2, 1), ([0, 1, 2], 0, 0, 1, 0)]
        scans += [([c], 1, 63, 1, 0) for c in range(3)]
        b, p, _ = self._both(img, scans=scans, quality=75, subsample="420")
        assert np.array_equal(b[3], p[3])

    def test_truncated_progressive(self):
        from social_media_data_pipeline_spark.sources.jpeg import (
            encode_jpeg_progressive,
        )

        img = _gradient(16, 16)
        enc = encode_jpeg_progressive(16, 16, img, channels=3, quality=80)
        with pytest.raises(ValueError):
            decode_jpeg(enc[: len(enc) // 3])
