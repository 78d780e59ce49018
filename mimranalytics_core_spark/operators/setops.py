"""Set operators + exact dedup (SURVEY.md §2.7).

Provenance: graph snapshot merging/diffing (reference README.md:17 —
entities appearing/disappearing between time slices); exact dedup is the
north-star dedup baseline.

Scale posture: UNION ALL is free (no shuffle); DISTINCT/INTERSECT/EXCEPT each
shuffle on the full row hash — at 100 TB these run on pre-projected narrow
columns (as below) so shuffled bytes stay proportional to the key width, and
AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register

_CUT = "TIMESTAMP '1997-01-01 00:00:00'"


def _snapshots(spark, sf_dir):
    """Customer-key snapshots: who had orders before vs after a time slice."""
    o = t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    before = o.filter(F.col("o_orderdate") < cut).select("o_custkey").distinct()
    after = o.filter(F.col("o_orderdate") >= cut).select("o_custkey").distinct()
    return before, after


@register(
    "set_union_all",
    "setops",
    oracle="""
        SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
    """,
    notes="bag union of entity lists — narrow projection, zero shuffle",
)
def set_union_all(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@register(
    "set_union_distinct",
    "setops",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    notes="set union (distinct nations with any counterparty)",
)
def set_union_distinct(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    "setops",
    oracle=f"""
        SELECT o_custkey FROM orders WHERE o_orderdate < {_CUT}
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderdate >= {_CUT}
    """,
    notes="entities present in both time-slice snapshots (README.md:17 diffing)",
)
def set_intersect(spark, sf_dir):
    before, after = _snapshots(spark, sf_dir)
    return before.intersect(after)


@register(
    "set_except",
    "setops",
    oracle=f"""
        SELECT o_custkey FROM orders WHERE o_orderdate < {_CUT}
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderdate >= {_CUT}
    """,
    notes="disappeared entities between snapshots (set difference)",
)
def set_except(spark, sf_dir):
    before, after = _snapshots(spark, sf_dir)
    return before.subtract(after)


@register(
    "dedup_distinct",
    "setops",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
    notes="exact row dedup via hash-distinct on projected columns",
)
def dedup_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_shipdate").distinct()


@register(
    "dedup_keyed_latest",
    "setops",
    oracle="""
        SELECT user_id, event_id, ts, event_type FROM (
            SELECT user_id, event_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    notes="keep-latest-per-key dedup (row_number=1) — the CDC/compaction primitive",
)
def dedup_keyed_latest(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.select("user_id", "event_id", "ts", "event_type", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "set_symmetric_diff",
    "setops",
    oracle="""
        WITH h1 AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderdate < TIMESTAMP '1994-01-01'),
        h2 AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '1994-01-01'),
        only1 AS (SELECT o_custkey FROM h1 EXCEPT SELECT o_custkey FROM h2),
        only2 AS (SELECT o_custkey FROM h2 EXCEPT SELECT o_custkey FROM h1)
        SELECT o_custkey, 'early_only' AS cohort FROM only1
        UNION ALL
        SELECT o_custkey, 'late_only' FROM only2
    """,
    notes=(
        "symmetric difference (customers active ONLY before vs ONLY after "
        "a cutover) — churn/new-arrival identification; completes the set-"
        "op family as two anti-join-shaped EXCEPTs over distinct key sets, "
        "labeled and unioned (each EXCEPT is one shuffle on the key)"
    ),
)
def set_symmetric_diff(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    cutoff = F.lit("1994-01-01").cast("timestamp")
    h1 = o.filter(F.col("o_orderdate") < cutoff).select("o_custkey").distinct()
    h2 = o.filter(F.col("o_orderdate") >= cutoff).select("o_custkey").distinct()
    only1 = h1.exceptAll(h2).select("o_custkey", F.lit("early_only").alias("cohort"))
    only2 = h2.exceptAll(h1).select("o_custkey", F.lit("late_only").alias("cohort"))
    return only1.unionByName(only2)


@register(
    "set_union_schema_evolve",
    "setops",
    oracle="""
        SELECT * FROM (
            SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
            FROM orders WHERE o_orderstatus = 'F'
            UNION ALL BY NAME
            SELECT o_orderkey, o_orderpriority FROM orders
            WHERE o_orderstatus = 'O'
        )
    """,
    notes=(
        "schema-evolving union (unionByName allowMissingColumns — the "
        "append every long-lived pipeline needs when a column arrives "
        "mid-stream; the read-side twin is scan_schema_evolution): an old "
        "frame (key, price) and a new frame (key, priority) union by NAME "
        "with missing columns null-filled, matching DuckDB's UNION ALL BY "
        "NAME. Scan-local, no shuffle"
    ),
)
def set_union_schema_evolve(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")
    new = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey", "o_orderpriority")
    return old.unionByName(new, allowMissingColumns=True)
