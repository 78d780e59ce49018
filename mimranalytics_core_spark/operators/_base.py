"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mimranalytics_core_spark import catalog

# Cache of loaded table dicts keyed by ((applicationId, id(spark)), sf_dir):
# repeated query invocations (driver runs every declared op against one
# sf_dir) re-use the same lazy DataFrames instead of re-reading footers per
# op. The compound key closes both aliasing holes: applicationId alone would
# alias sibling sessions created via spark.newSession() (same app, separate
# catalogs — the second session would skip its own temp-view registration);
# id(spark) alone can be reused by CPython after a stopped session is
# garbage-collected, handing back DataFrames bound to a dead SparkContext.
_CACHE: dict[tuple[tuple[str, int], str], dict[str, DataFrame]] = {}
# Which sf_dir's temp views are currently registered per session: SQL-path
# operators (recursive CTEs, UDTF lateral joins) resolve by VIEW NAME, so
# switching sf_dir within one session must re-point the views — a cache hit
# alone is not enough.
_ACTIVE_SF: dict[tuple[str, int], str] = {}


def _session_key(spark: SparkSession) -> tuple[str, int]:
    return (spark.sparkContext.applicationId, id(spark))


def tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    sid = _session_key(spark)
    key = (sid, sf_dir)
    if key not in _CACHE:
        _CACHE[key] = catalog.load(spark, sf_dir)  # load() registers the views
    elif _ACTIVE_SF.get(sid) != sf_dir:
        for name, df in _CACHE[key].items():
            df.createOrReplaceTempView(name)
    _ACTIVE_SF[sid] = sf_dir
    return _CACHE[key]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables(spark, sf_dir)[name]
