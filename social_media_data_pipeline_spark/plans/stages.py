"""Stage registry: the reference's nine stage implementations
(`stages.py:47-158`, names confirmed across `config/*.json`) wired to
engine transforms. Same config contract — a reference config file runs
unmodified against this registry (CSV paths land as parquet tables).

Network-backed stages (feed/image scrape) take their HttpClient from the
stage params (`client` key) so pipelines are testable offline; absent a
client they fail the stage rather than touching the network implicitly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_media_data_pipeline_spark import nlp, preprocessing
from social_media_data_pipeline_spark.analytics import explore
from social_media_data_pipeline_spark.ml import backends, inference, models
from social_media_data_pipeline_spark.operators import setops
from social_media_data_pipeline_spark.sources import binary as binary_source
from social_media_data_pipeline_spark.sources import rest


@dataclass
class InstagramFeedScraperStage:
    """`stages.py:47-85`: one cursor scrape per search term, results
    unioned (U1) and deduped on (id, shortcode) (D2)."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        client = self.params["client"]
        terms = self.params["terms"]
        bronze_root = self.params["bronze_dir"]
        frames = []
        for term in terms:
            src = rest.CursorFeedSource(
                client=client,
                url=f"feed/{term}",
                bronze_dir=f"{bronze_root}/{term}",
                max_tries=self.params.get("max_tries", 3),
            )
            src.scrape()
            df = src.to_dataframe(spark).withColumn("search_term", F.lit(term))
            frames.append(df)
        merged = setops.union_by_name(frames)
        # E4: epoch-seconds → timestamp (`InstagramFeedScraper.py:219`)
        ts_field = next((f for f in merged.schema.fields if f.name == "timestamp"), None)
        if ts_field is not None and ts_field.dataType.simpleString() == "bigint":
            merged = merged.withColumn(
                "timestamp", F.timestamp_seconds(F.col("timestamp")).cast("timestamp_ntz")
            )
        return merged.dropDuplicates(["id", "shortcode"])  # `InstagramFeedScraper.py:220`


@dataclass
class PreprocessorStage:
    """`stages.py:88-93` → preprocessing.preprocess_posts."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        df = spark.read.parquet(input_path)
        p = self.params
        return preprocessing.preprocess_posts(
            df,
            preprocessing.PreprocessParams(
                dataset_name=p.get("dataset_name", "City_Building"),
                remove_duplicates="shortcode" if p.get("remove_duplicates") else None,
                images_only=p.get("images_only", False),
                year_filter=tuple(p["year_filter"]) if p.get("year_filter") else None,
                lowercase_hashtags=p.get("lowercase_hashtags", False),
                hashtag_filter_include=p.get("hashtag_filter_include", []),
                hashtag_filter_exclude=p.get("hashtag_filter_exclude", []),
                max_images_per_year=p.get("max_images_per_year", -1),
            ),
        )


@dataclass
class CTPreprocessorStage:
    """`stages.py:95-100` → preprocessing.preprocess_ct_posts."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        return preprocessing.preprocess_ct_posts(spark.read.parquet(input_path))


@dataclass
class ExploratoryanalysisStage:
    """`stages.py:102-107`: materializes the analysis bundle as one
    union-able long table of (metric, key, value) per aggregate — the
    reference writes a folder of CSVs; the engine writes one table and
    keeps each aggregate queryable."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        df = spark.read.parquet(input_path)
        monthly = explore.posts_per_period(df)["M"].select(
            F.lit("posts_per_month").alias("metric"),
            F.col("period").cast("string").alias("key"),
            F.col("n_posts").cast("double").alias("value"),
        )
        tags = explore.hashtag_frequency(df).select(
            F.lit("hashtag_count").alias("metric"),
            F.col("hashtag").alias("key"),
            F.col("count").cast("double").alias("value"),
        )
        if self.params.get("report_path"):
            # presentation-layer analog of the reference's savefig
            # exports (`plotting.py` fpath args): render the SAME
            # aggregates to one markdown report, driver-side
            from social_media_data_pipeline_spark.analytics import report

            report.save_report(
                {
                    "posts_per_month": report.timeseries_chart(
                        explore.posts_per_period(df)["M"],
                        "period",
                        "n_posts",
                        smooth_sigma=self.params.get("smooth_sigma"),
                        title="posts per month",
                    ),
                    "hashtag_frequency": report.bar_chart(
                        explore.hashtag_frequency(df).limit(30),
                        "hashtag",
                        "count",
                        order_by=[F.desc("count")],
                        title="top hashtags",
                    ),
                },
                self.params["report_path"],
            )
        return monthly.unionByName(tags)


@dataclass
class TranslatorStage:
    """`stages.py:109-115` → nlp.translate_table (stub models by default)."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        df = spark.read.parquet(input_path)
        target_language = self.params.get("target_language", "en")
        return nlp.translate_table(
            df,
            self.params.get("target_column", "caption"),
            target_language,
            self.params.get("detector_factory", models.HeuristicLangDetector),
            self.params.get(
                "translator_factory",
                backends.resolve_translator_factory(target_language),
            ),
        )


@dataclass
class InstagramImageScraperStage:
    """`stages.py:117-133`: per-image fetch with retry budget; output is
    the scrape-state table (binary payloads land in bronze)."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        df = spark.read.parquet(input_path)
        if "scrape_image" in df.columns:
            df = df.filter(F.col("scrape_image"))  # `stages.py:125-126` (P3)
        src = rest.RetryBudgetSource(
            client=self.params["client"],
            url_template=self.params.get("url_template", "image/{item_id}"),
            bronze_dir=self.params["bronze_dir"],
            max_attempts=self.params.get("max_attempts", 3),
        )
        # The REST client is inherently a driver/edge-side actor (single
        # state file, single rate-limit budget — reference semantics),
        # but the id list must never be: toLocalIterator streams one
        # partition at a time, so driver memory is bounded by one batch
        # regardless of table size (was: unbounded .collect()). State
        # persists per batch, so a crash resumes mid-table.
        batch_size = int(self.params.get("id_batch_size", 10_000))
        batch: list = []
        for row in df.select("id").distinct().toLocalIterator():
            batch.append(row.id)
            if len(batch) >= batch_size:
                src.scrape(batch)
                batch = []
        if batch:
            src.scrape(batch)
        return src.state_dataframe(spark)


@dataclass
class ImageLabelerStage:
    """`stages.py:135-140` → ml.inference.label_images over a binaryFile
    scan (stub Places365 by default)."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        images = binary_source.read_binary_folder(
            spark, self.params["image_dir"], self.params.get("glob", "*")
        )
        return inference.label_images(
            images,
            self.params.get("labeler_factory", backends.resolve_scene_labeler_factory()),
        )


@dataclass
class ImageFeatureVectorStage:
    """`stages.py:142-150` → ml.inference.extract_features."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        images = binary_source.read_binary_folder(
            spark, self.params["image_dir"], self.params.get("glob", "*")
        )
        dim = self.params.get("dim", 2048)
        return inference.extract_features(
            images,
            self.params.get(
                "extractor_factory", backends.resolve_feature_extractor_factory(dim)
            ),
        )


@dataclass
class ImageAnonymizerStage:
    """`stages.py:152-158` → ml.inference.anonymize_images (binary→binary)."""

    params: dict

    def run(self, spark: SparkSession, input_path: str | None, output_path: str) -> DataFrame:
        images = binary_source.read_binary_folder(
            spark, self.params["image_dir"], self.params.get("glob", "*")
        )
        return inference.anonymize_images(
            images,
            self.params.get(
                "anonymizer_factory", backends.resolve_face_anonymizer_factory()
            ),
        )


def default_registry() -> dict[str, Callable[[dict], object]]:
    """Implementation-name → factory, matching `config/*.json` names."""
    return {
        "InstagramFeedScraperStage": InstagramFeedScraperStage,
        "PreprocessorStage": PreprocessorStage,
        "CTPreprocessorStage": CTPreprocessorStage,
        "ExploratoryanalysisStage": ExploratoryanalysisStage,
        "TranslatorStage": TranslatorStage,
        "InstagramImageScraperStage": InstagramImageScraperStage,
        "ImageLabelerStage": ImageLabelerStage,
        "ImageFeatureVectorStage": ImageFeatureVectorStage,
        "ImageAnonymizerStage": ImageAnonymizerStage,
    }
