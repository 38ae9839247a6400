"""Tri-modal near-dup composition (r11): text simhash, image dhash and
audio fingerprints all land in ONE fingerprint table and ONE
`hamming_blocked_pairs` pigeonhole join — the COVERAGE claim "one
blocking shape for all three modalities" tested as a composition over
a single mixed corpus, not per-modality. The planted corpus carries
the same content re-encoded through the in-repo codecs (JPEG quality
drop, WAV resample, one-word text edit) plus a distinct item per
modality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_spark.functions import imagehash
from social_media_data_pipeline_spark.functions.sketches import (
    hamming_blocked_pairs,
    simhash64,
)
from social_media_data_pipeline_spark.sources import audio
from social_media_data_pipeline_spark.sources import binary as binary_source
from social_media_data_pipeline_spark.sources.jpeg import encode_jpeg


def _photo(seed=0, w=64, h=48):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    # smooth it so JPEG quality drop stays a NEAR dup, not noise
    sm = base.astype(np.int32)
    sm = (sm + np.roll(sm, 1, 0) + np.roll(sm, 1, 1) + np.roll(sm, -1, 0)) // 4
    return sm.astype(np.uint8)


def _tone_mix(seed):
    t = np.arange(0, 1.5, 1 / 8000.0, dtype=np.float32)
    rng = np.random.default_rng(seed)
    f1, f2 = rng.uniform(200, 900), rng.uniform(1000, 2400)
    return (0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)).astype(
        np.float32
    )


BASE_TEXT = (
    "the migration pipeline reads every parquet shard from the landing "
    "zone and validates schema then deduplicates records by content hash "
    "before publishing curated tables to the warehouse for downstream "
    "training jobs that consume tokenized documents in fixed size batches"
)


class TestTriModalNearDup:
    @pytest.fixture()
    def mixed_corpus(self, tmp_path):
        img_dir = tmp_path / "img"
        aud_dir = tmp_path / "aud"
        img_dir.mkdir()
        aud_dir.mkdir()
        img = _photo(7)
        (img_dir / "a.jpg").write_bytes(encode_jpeg(64, 48, img.tobytes(), quality=90))
        (img_dir / "b.jpg").write_bytes(encode_jpeg(64, 48, img.tobytes(), quality=35))
        (img_dir / "c.jpg").write_bytes(
            encode_jpeg(64, 48, _photo(1234).tobytes(), quality=90)
        )
        clip = _tone_mix(5)
        (aud_dir / "a.wav").write_bytes(audio.encode_wav(clip, 8000, bits=16))
        (aud_dir / "b.wav").write_bytes(
            audio.encode_wav(audio.resample_linear(clip, 8000, 16000), 16000, bits=16)
        )
        (aud_dir / "c.wav").write_bytes(
            audio.encode_wav(_tone_mix(99), 8000, bits=16)
        )
        texts = [
            ("t1", BASE_TEXT),
            ("t2", BASE_TEXT.replace("curated", "verified")),
            ("t3", "completely unrelated prose about mountain weather and "
                   "seasonal hiking routes with altitude acclimatization tips "
                   "plus gear lists for multi day treks in alpine terrain and "
                   "notes on water sources shelter options and trail permits"),
        ]
        return img_dir, aud_dir, texts

    def _tri_modal_fps(self, spark, mixed_corpus):
        img_dir, aud_dir, texts = mixed_corpus
        img_fp = imagehash.image_dhash(
            binary_source.read_binary_folder(spark, str(img_dir), glob="*.jpg")
        ).select(
            F.concat(F.lit("img:"), F.col("image")).alias("doc"),
            F.col("dhash").alias("fp"),
        )
        aud_fp = audio.audio_dhash(
            binary_source.read_binary_folder(spark, str(aud_dir), glob="*.wav")
        ).select(
            F.concat(F.lit("aud:"), F.col("audio")).alias("doc"),
            F.col("afp").alias("fp"),
        )
        txt_fp = (
            spark.createDataFrame(texts, "doc_id string, text string")
            .select(
                F.concat(F.lit("txt:"), F.col("doc_id")).alias("doc"),
                simhash64("text").alias("fp"),
            )
        )
        return img_fp.unionByName(aud_fp).unionByName(txt_fp)

    def test_one_corpus_one_join_three_modalities(self, spark, mixed_corpus):
        fps = self._tri_modal_fps(spark, mixed_corpus)
        assert fps.count() == 9
        pairs = hamming_blocked_pairs(fps, tau=8, bits=64).collect()
        got = {(r["id_a"], r["id_b"]) for r in pairs}
        # each modality's planted near-dup lands through the SHARED
        # join; no cross-modality pair and no distinct-item pair
        assert got == {
            ("aud:a.wav", "aud:b.wav"),
            ("img:a.jpg", "img:b.jpg"),
            ("txt:t1", "txt:t2"),
        }

    def test_shared_join_is_equi_join(self, spark, mixed_corpus):
        fps = self._tri_modal_fps(spark, mixed_corpus)
        plan = (
            hamming_blocked_pairs(fps, tau=8, bits=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
