"""Operator library: every SURVEY.md §2 semantic unit as a pure
``DataFrame -> DataFrame`` transform, composable via ``DataFrame.transform``.

Reference analog: stages accept arbitrary ``func(df, *args)`` filter
functions (`Preprocessing/Preprocessor.py:13-21`); here the whole operator
inventory is first-class, declarative, and Catalyst-optimizable.
"""

from social_media_data_pipeline_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    derive,
    filters,
    joins,
    sampling,
    setops,
    sort,
    windows,
)
