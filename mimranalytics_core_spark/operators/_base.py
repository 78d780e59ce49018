"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mimranalytics_core_spark import catalog

# Cache of loaded table dicts keyed by (session id, sf_dir): repeated query
# invocations (driver runs every declared op against one sf_dir) re-use the
# same lazy DataFrames instead of re-reading footers per op.
_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        _CACHE[key] = catalog.load(spark, sf_dir)
    return _CACHE[key]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables(spark, sf_dir)[name]
