"""Tests: perceptual image hashing + hamming-blocked image near-dup
(`functions/imagehash.py`)."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_data_pipeline_spark.functions import imagehash
from social_media_data_pipeline_spark.sources import binary as binary_source
from social_media_data_pipeline_spark.sources.jpeg import encode_jpeg


def _photo(seed=0, w=64, h=48):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3)).astype(float)
    for _ in range(3):
        px = (px + np.roll(px, 1, 0) + np.roll(px, 1, 1) + np.roll(px, -1, 0) + np.roll(px, -1, 1)) / 5
    return px.astype(np.uint8)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


class TestDhash:
    def test_reencode_invariance_and_discrimination(self):
        img = _photo(1)
        h_orig = imagehash.dhash64(img)
        # same photo re-encoded at low JPEG quality: small hamming
        from social_media_data_pipeline_spark.sources.jpeg import decode_jpeg

        jj = encode_jpeg(64, 48, img.tobytes(), quality=40)
        w, h, c, px = decode_jpeg(jj)
        h_lossy = imagehash.dhash64(np.asarray(px, np.uint8).reshape(h, w, c))
        assert _ham(h_orig, h_lossy) <= 6
        # same photo downscaled 2x: small hamming (area-resample path)
        small = img[::2, ::2]
        assert _ham(h_orig, imagehash.dhash64(small)) <= 10
        # different photo: large hamming
        other = imagehash.dhash64(_photo(99))
        assert _ham(h_orig, other) > 16

    def test_brightness_shift_invariance(self):
        img = _photo(2).astype(np.int16)
        brighter = np.clip(img + 25, 0, 255).astype(np.uint8)
        assert _ham(imagehash.dhash64(img.astype(np.uint8)), imagehash.dhash64(brighter)) <= 8

    def test_grayscale_and_signed_range(self):
        g = _photo(3)[:, :, 0]
        v = imagehash.dhash64(g)
        assert -(1 << 63) <= v < (1 << 63)


class TestSparkImageNearDup:
    @pytest.fixture()
    def image_folder(self, tmp_path):
        base = _photo(7)
        # a.jpg and its re-encode b.jpg are near-dups; c.jpg is distinct
        (tmp_path / "a.jpg").write_bytes(encode_jpeg(64, 48, base.tobytes(), quality=90))
        (tmp_path / "b.jpg").write_bytes(encode_jpeg(64, 48, base.tobytes(), quality=35))
        (tmp_path / "c.jpg").write_bytes(
            encode_jpeg(64, 48, _photo(1234).tobytes(), quality=90)
        )
        return str(tmp_path)

    def test_hash_and_pairs(self, spark, image_folder):
        df = binary_source.read_binary_folder(spark, image_folder, glob="*.jpg")
        hashes = imagehash.image_dhash(df)
        rows = {r["image"]: r for r in hashes.collect()}
        assert set(rows) == {"a.jpg", "b.jpg", "c.jpg"}
        assert rows["a.jpg"]["width"] == 64
        pairs = imagehash.image_near_dup_pairs(hashes, tau=6).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        assert got == {("a.jpg", "b.jpg")}

    def test_blocking_is_equi_join(self, spark, image_folder):
        df = binary_source.read_binary_folder(spark, image_folder, glob="*.jpg")
        pairs = imagehash.image_near_dup_pairs(imagehash.image_dhash(df), tau=6)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
