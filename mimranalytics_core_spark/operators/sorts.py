"""Sort / limit / top-k operators (SURVEY.md §2.6).

Provenance: Cypher ORDER BY / LIMIT (reference README.md:25), API pagination
(README.md:26). Null-ordering pinned explicitly — Spark's asc default is
NULLS FIRST, DuckDB's NULLS LAST (SURVEY.md §5).

Scale posture: global top-k compiles to TakeOrderedAndProject (per-partition
heap of k, merge at driver) — O(k) memory, no global sort. Full ORDER BY is a
range-partitioned sort (sampling → range exchange → per-partition sort) and
is only declared on bounded outputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "sort_multi",
    "sorts",
    oracle="""
        SELECT s_suppkey, s_nationkey, ROUND(s_acctbal, 2) AS acctbal
        FROM supplier
        ORDER BY s_nationkey ASC NULLS LAST, acctbal DESC NULLS LAST, s_suppkey ASC
    """,
    notes="multi-key mixed asc/desc sort with pinned null placement",
)
def sort_multi(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey", "s_nationkey", F.round("s_acctbal", 2).alias("acctbal")
    ).orderBy(
        F.col("s_nationkey").asc_nulls_last(),
        F.col("acctbal").desc_nulls_last(),
        F.col("s_suppkey").asc(),
    )


@register(
    "sort_limit_topk",
    "sorts",
    oracle="""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        ORDER BY totalprice DESC, o_orderkey ASC
        LIMIT 25
    """,
    notes="global top-k → TakeOrderedAndProject (no full sort); unique-key tiebreak",
)
def sort_limit_topk(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "limit_offset",
    "sorts",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        ORDER BY c_custkey ASC
        LIMIT 20 OFFSET 40
    """,
    notes="deterministic pagination (FastAPI paging analog, README.md:26): order on unique key first",
)
def limit_offset(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name").orderBy(F.col("c_custkey").asc()).offset(40).limit(20)


@register(
    "limit_keyset_pagination",
    "sorts",
    oracle="""
        WITH anchor AS (
            SELECT o_orderkey AS k FROM orders
            ORDER BY o_orderkey ASC LIMIT 1 OFFSET 199
        )
        SELECT o_orderkey, o_custkey,
               FLOOR(o_totalprice * 100 + 0.5) / 100 AS totalprice
        FROM orders, anchor
        WHERE o_orderkey > anchor.k
        ORDER BY o_orderkey ASC
        LIMIT 100
    """,
    notes=(
        "keyset (seek) pagination — the scale-correct alternative to "
        "LIMIT/OFFSET (README.md:26 paging): OFFSET n scans and discards n "
        "rows on every page, O(pages²) total at 100 TB; keyset filters "
        "`key > last_seen` so each page is a pruned range scan + top-k. "
        "The anchor here is derived in-query (page-2 boundary) to keep the "
        "op self-contained and oracle-checkable"
    ),
)
def limit_keyset_pagination(spark, sf_dir):
    from mimranalytics_core_spark.functions.numeric import dround

    o = t(spark, sf_dir, "orders")
    anchor = (
        o.select(F.col("o_orderkey").alias("k"))
        .orderBy(F.col("k").asc())
        .offset(199)
        .limit(1)
    )
    return (
        o.crossJoin(F.broadcast(anchor))
        .filter(F.col("o_orderkey") > F.col("k"))
        .select("o_orderkey", "o_custkey", dround(F.col("o_totalprice"), 2).alias("totalprice"))
        .orderBy(F.col("o_orderkey").asc())
        .limit(100)
    )
