"""Tests: exploratory-analytics bundle + CLI orchestrator entry point."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from social_media_data_pipeline_spark import cli, schemas
from social_media_data_pipeline_spark.analytics import explore
from tests.fixtures import make_posts_rows


@pytest.fixture(scope="module")
def posts(spark):
    return spark.createDataFrame(make_posts_rows(120), schema=schemas.POSTS)


class TestExplore:
    def test_posts_per_period_grains(self, posts):
        out = explore.posts_per_period(posts)
        assert set(out) == {"W", "M", "Q", "Y"}
        yearly = out["Y"].collect()
        assert sum(r.n_posts for r in yearly) == posts.count()

    def test_hashtag_frequency_desc(self, posts):
        rows = explore.hashtag_frequency(posts).collect()
        counts = [r["count"] for r in rows]
        assert counts == sorted(counts, reverse=True)

    def test_profile_covers_all_columns(self, posts):
        prof = explore.profile(posts)
        assert prof.count() == len(posts.columns)

    def test_analyze_dataset_bundle(self, posts):
        bundle = explore.analyze_dataset(posts)
        assert {"summary", "profile", "posts_per_M", "hashtag_frequency", "correlation"} <= set(
            bundle
        )
        # correlation is long-format over the numeric cols
        corr = bundle["correlation"].collect()
        assert all(abs(r.corr) <= 1.0 + 1e-9 for r in corr if r.corr is not None)

    def test_category_share_over_time_sums_to_one(self, posts):
        out = explore.category_share_over_time(posts, "timestamp", "search_mode", freq="Y")
        sums = out.groupBy("period").agg(F.sum("share").alias("s")).collect()
        assert all(abs(r.s - 1.0) < 1e-9 for r in sums)


class TestCli:
    def test_cli_end_to_end(self, spark, posts, tmp_path):
        root = tmp_path / "data"
        dataset_dir = root / "CliCity_CliBuilding"
        dataset_dir.mkdir(parents=True)
        posts.write.parquet(str(dataset_dir / "posts"))
        config = {
            "dataset_name": "CliCity_CliBuilding",
            "skip_stage_if_exists": True,
            "stages": [
                {
                    "name": "Preprocessing",
                    "implementation": "PreprocessorStage",
                    "input": "posts",
                    "output": "posts_preprocessed",
                    "enabled": True,
                    "params": {
                        "dataset_name": "CliCity_CliBuilding",
                        "remove_duplicates": True,
                        "images_only": True,
                        "year_filter": [2010, 2020],
                        "lowercase_hashtags": True,
                    },
                },
                {
                    "name": "Exploratory Analysis",
                    "implementation": "ExploratoryanalysisStage",
                    "input": "posts_preprocessed",
                    "output": "exploratory_analysis",
                    "enabled": True,
                    "params": {},
                },
            ],
        }
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(json.dumps(config))
        rc = cli.main(["--config", str(cfg_path), "--root_dir", str(root)])
        assert rc == 0
        out = spark.read.parquet(str(dataset_dir / "posts_preprocessed"))
        assert out.columns == schemas.POSTS_PREPROCESSED_COLUMNS

    def test_cli_rejects_unknown_implementation(self, tmp_path):
        config = {
            "dataset_name": "X_Y",
            "stages": [
                {
                    "name": "Bad",
                    "implementation": "NoSuchStage",
                    "input": None,
                    "output": "o",
                    "enabled": True,
                    "params": {},
                }
            ],
        }
        cfg_path = tmp_path / "c.json"
        cfg_path.write_text(json.dumps(config))
        assert cli.main(["--config", str(cfg_path), "--root_dir", str(tmp_path)]) == 2
