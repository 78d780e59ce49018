"""Bucketing evidence for the 100 TB layout claim (SCALE.md): writing both
fact tables bucketed on the join key makes the fact⋈fact join shuffle-free —
no shuffle Exchange on either side of the SortMergeJoin, scans read
Bucketed: true. (Broadcast is disabled for the test: at real scale neither
fact side fits a broadcast, which is exactly when bucketing matters.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark):
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    # fresh sessions use an in-memory catalog: a stale warehouse dir from a
    # previous run isn't droppable via SQL — remove the locations directly
    for name in ("li_bucketed", "o_bucketed"):
        shutil.rmtree(f"/tmp/mimranalytics_warehouse/{name}", ignore_errors=True)
    li = t(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    o = t(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    return spark.table("li_bucketed"), spark.table("o_bucketed")


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_shuffle(spark, bucketed, no_broadcast):
    li, o = bucketed
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan  # co-located by bucket: zero shuffle
    assert "Bucketed: true" in plan
    assert joined.count() == t(spark, SF_SMALL, "lineitem").count()


def test_bucketed_agg_has_no_shuffle(spark, bucketed, no_broadcast):
    li, _ = bucketed
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_shuffle(spark, no_broadcast):
    """Control: the same join on plain parquet shuffles both sides."""
    li = t(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    o = t(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
