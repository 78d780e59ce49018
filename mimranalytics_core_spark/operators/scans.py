"""Scans / sources / projection / filter operators (SURVEY.md §2.1–2.2).

Provenance: reference README.md:19 (relational export), README.md:25 (property
store w/ dynamic props → JSON extraction), README.md:17 (Time-Slider → as-of
predicates). Scale posture: every op here is a single parquet scan stage —
predicate pushdown and column pruning reach the reader (verified via
``explain``; see tests/test_plans.py), so at 100 TB these read only the row
groups and columns they need.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mimranalytics_core_spark.functions.numeric import dround, dround_sql
from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "scan_parquet",
    "scans",
    oracle="SELECT * FROM nation",
    notes="full columnar scan; trivially partition-parallel",
)
def scan_parquet(spark, sf_dir):
    return t(spark, sf_dir, "nation")


@register(
    "scan_pruned",
    "scans",
    oracle="""
        SELECT l_orderkey, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 45.0 AND l_returnflag = 'R'
    """,
    notes="column pruning + predicate pushdown into the parquet reader",
)
def scan_pruned(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 45.0) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_extendedprice")
    )


@register(
    "scan_events_ns",
    "scans",
    oracle="""
        SELECT event_id, ts, user_id, event_type
        FROM events
        WHERE event_type = 'purchase'
    """,
    notes="ns-timestamp parquet read via nanosAsLong + single conversion point (catalog)",
)
def scan_events_ns(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", "event_type"
    )


@register(
    "json_extract_props",
    "scans",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
    """,
    notes="typed field extraction from a JSON property bag (dynamic-props analog)",
)
def json_extract_props(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_id", k.alias("prop_k"))
        .filter(F.col("prop_k") > 50)
    )


@register(
    "project_compute",
    "projection",
    oracle=f"""
        SELECT
            l_orderkey,
            l_linenumber,
            {dround_sql('l_extendedprice * (1 - l_discount)', 4)} AS net_price,
            {dround_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 4)} AS charged,
            CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_band
        FROM lineitem
    """,
    notes="derived arithmetic + CASE projection (Cypher RETURN expr analog); dround for bit-identical per-row rounding",
)
def project_compute(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(net, 4).alias("net_price"),
        dround(net * (1 + F.col("l_tax")), 4).alias("charged"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_band"),
    )


@register(
    "filter_pred",
    "filter",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus IN ('F', 'P')
          AND o_totalprice BETWEEN 1000 AND 50000
          AND o_orderpriority LIKE '1-%'
          AND o_custkey IS NOT NULL
    """,
    notes="conjunctive predicates: IN, BETWEEN, LIKE, IS NULL — all pushed to scan",
)
def filter_pred(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "filter_asof",
    "filter",
    oracle="""
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders
        WHERE o_orderdate <= TIMESTAMP '1997-06-30 00:00:00'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    notes="point-in-time validity predicate — the Time-Slider primitive (README.md:17)",
)
def filter_asof(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") <= F.lit("1997-06-30 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderdate", "o_totalprice")


_CORR_SUBQ_SQL = """
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE c_acctbal > (SELECT FLOOR(AVG(c2.c_acctbal) * 1e6 + 0.5) / 1e6
                       FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
"""


@register(
    "subquery_scalar_correlated",
    "scans",
    oracle=_CORR_SUBQ_SQL,
    notes=(
        "correlated scalar subquery (Cypher WHERE-over-aggregate analog, "
        "F6 — 'customers above their nation's average balance'): verbatim "
        "SQL in both engines (E2 entry). Catalyst DECORRELATES it "
        "(RewriteCorrelatedScalarSubquery) into one grouped aggregate + "
        "equi-join — no per-row subquery execution; asserted in "
        "tests/test_plans.py. The threshold is dround'd to 1e-6 inside the "
        "subquery so the comparison runs on the same bits in both engines "
        "(AVG's partial-sum order is engine-specific at the ulp)"
    ),
)
def subquery_scalar_correlated(spark, sf_dir):
    from mimranalytics_core_spark.operators._base import tables

    tables(spark, sf_dir)
    return spark.sql(_CORR_SUBQ_SQL)


@register(
    "scan_partition_pruned",
    "scans",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderstatus = 'F'
    """,
    notes=(
        "hive-partitioned parquet layout + partition-PRUNED read (the "
        "100 TB table layout: a filter on the partition key reads only "
        "that directory, no footer even opened elsewhere): orders written "
        "partitionBy(o_orderstatus), read back with the status filter; "
        "the plan shows the predicate under PartitionFilters (asserted in "
        "tests/test_plans.py) rather than as a data filter. The declared "
        "result is the re-read frame, so the oracle certifies the "
        "write/prune/read cycle including partition-column recovery"
    ),
)
def scan_partition_pruned(spark, sf_dir):
    import os

    dest = (
        f"/tmp/mimranalytics_reports/{os.path.basename(sf_dir.rstrip('/'))}/orders_by_status"
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(dest)
    back = spark.read.parquet(dest).filter(F.col("o_orderstatus") == "F")
    return back.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
    )


@register(
    "scan_dynamic_partition_pruning",
    "scans",
    oracle="""
        WITH dim AS (SELECT DISTINCT o_orderpriority AS pri FROM orders
                     WHERE o_orderpriority LIKE '1-%')
        SELECT o.o_orderkey, o.o_custkey, o.o_orderpriority
        FROM orders o JOIN dim ON o.o_orderpriority = dim.pri
    """,
    notes=(
        "DYNAMIC partition pruning (the runtime sibling of "
        "scan_partition_pruned's static pruning — at 100 TB the fact's "
        "partition filter usually arrives from a dimension join, not a "
        "literal): orders re-written hive-partitioned by priority, joined "
        "to a filtered priority dim; Spark injects a dynamicpruning "
        "subquery so only the dim-selected partitions are even read "
        "(asserted in tests/test_plans.py). The oracle runs the plain "
        "join — layout and DPP change nothing semantically"
    ),
)
def scan_dynamic_partition_pruning(spark, sf_dir):
    import os

    dest = (
        f"/tmp/mimranalytics_reports/{os.path.basename(sf_dir.rstrip('/'))}/orders_by_pri"
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    # overwrite unconditionally (like scan_partition_pruned): a _SUCCESS-keyed
    # cache served stale data when a source fixture was regenerated under the
    # same sf_dir basename (round-4 ADVICE)
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dest)
    fact = spark.read.parquet(dest)
    dim = (
        t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("pri"))
        .filter(F.col("pri").like("1-%"))
        .distinct()
    )
    return fact.join(dim, fact.o_orderpriority == dim.pri).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderpriority").cast("string").alias("o_orderpriority"),
    )
