"""SparkSession factory for the engine.

Pins every session conf the engine depends on (SURVEY.md §7.1):

- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the ``events`` table stores
  ``timestamp[ns]`` which Spark 4.x cannot read natively (FIXTURES.md gotcha);
  with this conf the column reads as bigint epoch-nanos and
  :func:`mimranalytics_core_spark.catalog.load` converts it once, centrally.
- UTC session timezone — orders/lineitem are ``timestamp_ntz``; keeping the
  session in UTC removes any tz-dependent drift vs the DuckDB oracle.
- AQE on (default in Spark 4, pinned explicitly) — runtime partition
  coalescing + skew-join handling is the 100 TB skew mitigation of record.
- Low ``shuffle.partitions`` for the small local scale factors; on a real
  cluster this would be sized to ~128 MB of shuffle data per partition (AQE
  coalescing makes the initial number far less critical).

Scale posture: at 100 TB nothing here changes except ``shuffle.partitions``
(or better, ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``)
and executor sizing; the engine code never hard-codes partition counts in
operator paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def apply_engine_confs(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply the engine's required confs to any builder (driver or ours)."""
    return (
        builder.config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Recursive-CTE safety valve: the 1M-row default trips on the walk
        # closures (graph_shortest_path) one decade above the driver's bench
        # scale; 100M keeps runaway recursion bounded while letting declared
        # depth-bounded traversals complete at sf1+.
        .config("spark.sql.cteRecursionRowLimit", str(100_000_000))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/mimranalytics_warehouse")
    )


def get_spark(app_name: str = "mimranalytics-core-spark") -> SparkSession:
    """Create (or fetch) the engine SparkSession on local[N]."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    spark = apply_engine_confs(builder).getOrCreate()
    return spark


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Set the runtime-settable engine confs on an externally-provided session.

    The driver hands ``entry(spark)`` a session we didn't build;
    ``nanosAsLong`` is session-settable at runtime (verified), so the events
    table remains readable. Static confs (driver memory) can't change here.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.cteRecursionRowLimit", str(100_000_000))
    # Runtime-settable PERF confs (round-15): an externally-built session
    # carries Spark's defaults (200 shuffle partitions, 10 MB broadcast
    # threshold) — far off this engine's pinned posture. Both are
    # session-settable, so driver-run queries now plan exactly like the
    # bench session's (same parameterisation: the partition count follows
    # SPARK_GRAFT_SHUFFLE_PARTITIONS, with AQE coalescing making the
    # initial number non-critical at any scale).
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    return spark
