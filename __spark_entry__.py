"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (SURVEY.md §7.2) at sf0.001;
``queries``/``oracle_sql`` expose every registered operator from
``mimranalytics_core_spark.registry`` (one entry per SURVEY.md §2 row; ops
without SQL-expressible semantics omit the oracle → rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mimranalytics_core_spark.registry import all_ops
    from mimranalytics_core_spark.session import ensure_engine_confs

    ensure_engine_confs(spark)
    return all_ops()["flagship_exposure_rollup"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn):
    from mimranalytics_core_spark.session import ensure_engine_confs

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_engine_confs(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mimranalytics_core_spark.registry import all_ops

    return {name: _wrap(spec.fn) for name, spec in all_ops().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from mimranalytics_core_spark.registry import oracles

    return oracles()
