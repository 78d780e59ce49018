"""Operator registry: every SURVEY.md §2 op registers itself here.

Each op is a (name, spark_builder, oracle_sql) triple; ``__spark_entry__.py``
collects ``queries()`` / ``oracle_sql()`` straight from this registry, so an
operator is "declared" exactly when its module is imported.

``oracle_sql=None`` marks the genuinely non-SQL-expressible ops (streaming
state, approx aggregates, iterative fixpoints) — the driver then records the
weaker rows-only check (``__spark_entry__.py`` contract).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class OpSpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    notes: str = ""


_REGISTRY: dict[str, OpSpec] = {}


def register(name: str, category: str, oracle: str | None, notes: str = ""):
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate op name: {name}")
        _REGISTRY[name] = OpSpec(name=name, fn=fn, oracle=oracle, category=category, notes=notes)
        return fn

    return deco


def all_ops() -> dict[str, OpSpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: spec.fn for n, spec in all_ops().items()}


def oracles() -> dict[str, str]:
    return {n: spec.oracle for n, spec in all_ops().items() if spec.oracle is not None}


_LOADED = False


def _load_all_modules() -> None:
    """Import every operator module exactly once (triggers registration)."""
    global _LOADED
    if _LOADED:
        return
    from mimranalytics_core_spark.operators import (  # noqa: F401
        aggregates,
        extensions,
        functions_scalar,
        graph,
        joins,
        scans,
        setops,
        similarity,
        sorts,
        streaming_batch,
        text,
        timeseries,
        windows,
    )

    _LOADED = True
