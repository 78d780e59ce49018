"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mimranalytics_core_spark import catalog

# Cache of loaded table dicts keyed by (session id, sf_dir): repeated query
# invocations (driver runs every declared op against one sf_dir) re-use the
# same lazy DataFrames instead of re-reading footers per op.
_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}
# Which sf_dir's temp views are currently registered per session: SQL-path
# operators (recursive CTEs, UDTF lateral joins) resolve by VIEW NAME, so
# switching sf_dir within one session must re-point the views — a cache hit
# alone is not enough.
_ACTIVE_SF: dict[int, str] = {}


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (id(spark), sf_dir)
    if key not in _CACHE:
        _CACHE[key] = catalog.load(spark, sf_dir)  # load() registers the views
    elif _ACTIVE_SF.get(id(spark)) != sf_dir:
        for name, df in _CACHE[key].items():
            df.createOrReplaceTempView(name)
    _ACTIVE_SF[id(spark)] = sf_dir
    return _CACHE[key]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables(spark, sf_dir)[name]
