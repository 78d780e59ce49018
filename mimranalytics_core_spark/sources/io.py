"""Sources and sinks (SURVEY.md §2.1): audit-report export + format readers.

Provenance: the reference exports "graph visualizations and underlying
relational data" for audit-ready reports (reference README.md:19). Our sink
surface is the relational half: any operator result → parquet/CSV/JSON
artifact with a deterministic column order and (optionally) pinned row order.

Scale posture: exports write partitioned (one file per task) by default —
coalesce(1) is opt-in for small human-facing reports only; a 100 TB export
must never funnel through one task. ``partition_by`` maps to hive-style
directory partitioning so downstream scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def export_report(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    order_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> None:
    """Write a relational report artifact (README.md:19 export semantics)."""
    out = df
    if order_by:
        out = out.orderBy(*order_by)
    if single_file:
        out = out.coalesce(1)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", "true").csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)


def read_any(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Format-dispatched reader (parquet/csv/json); schema-on-read when given."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", "true").option("inferSchema", schema is None).csv(path)
    if fmt == "json":
        return reader.json(path)
    if fmt == "orc":
        return reader.orc(path)
    return reader.parquet(path)
