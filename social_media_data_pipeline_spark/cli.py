"""CLI entry point — the orchestrator equivalent.

Usage (same shape as the reference, `orchestrator.py:68-82`):

    python -m social_media_data_pipeline_spark.cli \
        --config config/test.json --root_dir /data/pipelines
"""

from __future__ import annotations

import argparse
import json
import sys

from social_media_data_pipeline_spark.plans.pipeline import PipelineRunner, summarize
from social_media_data_pipeline_spark.plans.stages import default_registry
from social_media_data_pipeline_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description="Run the Spark data pipeline")
    parser.add_argument("--config", required=True, help="pipeline config JSON")
    parser.add_argument("--root_dir", required=True, help="dataset root directory")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config = json.load(f)

    spark = get_spark(f"pipeline:{config.get('dataset_name', '?')}")
    runner = PipelineRunner(spark, default_registry())
    missing = runner.analyze(config)
    if missing:
        print(f"Unresolved stage implementations: {missing}", file=sys.stderr)
        return 2
    results = runner.run(config, args.root_dir)
    print(summarize(results))
    return 0 if all(r.result in ("Success", "Skipped", "Disabled") for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
