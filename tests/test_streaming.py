"""Streaming forms equal their oracle-checked batch twins (SURVEY.md §7.6):
events parquet replayed as a bounded file stream, drained with
trigger(availableNow), compared to the batch computation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.streaming import jobs
from tests.conftest import SF_SMALL


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_tumbling_matches_batch(spark):
    stream = jobs.events_stream(spark, SF_SMALL)
    res = jobs.run_available_now(
        jobs.tumbling_counts(stream), "t_tumbling", spark, output_mode="complete"
    )
    batch = (
        t(spark, SF_SMALL, "events")
        .groupBy(F.window("ts", "1 hour").start.alias("win_start"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _rows(res, cols) == _rows(batch, cols)


def test_stream_session_matches_batch(spark):
    stream = jobs.events_stream(spark, SF_SMALL)
    res = jobs.run_available_now(
        jobs.session_windows(stream), "t_session", spark, output_mode="complete"
    )
    batch = (
        t(spark, SF_SMALL, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sess_value"))
        .select("user_id", F.col("win").start.alias("sess_start"), "n_events", "sess_value")
    )
    cols = ["user_id", "sess_start", "n_events", "sess_value"]
    assert _rows(res, cols) == _rows(batch, cols)


def test_stream_dedup_within_watermark(spark):
    stream = jobs.events_stream(spark, SF_SMALL)
    res = jobs.run_available_now(jobs.dedup_within_watermark(stream), "t_dedup", spark)
    batch = t(spark, SF_SMALL, "events")
    # event_id is unique in the fixture → dedup is identity on cardinality
    assert res.count() == batch.count()
    assert res.select("event_id").distinct().count() == res.count()


def test_stream_enrich_matches_batch(spark):
    from pyspark.sql import Window

    stream = jobs.events_stream(spark, SF_SMALL)
    c = t(spark, SF_SMALL, "customer")
    w = Window.partitionBy(F.col("c_custkey") % 150).orderBy(F.col("c_custkey").asc())
    dim = (
        c.select("c_custkey", "c_mktsegment", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            (F.col("c_custkey") % 150).alias("join_key"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    res = jobs.run_available_now(jobs.enrich_with_dim(stream, dim), "t_enrich", spark)
    ev = t(spark, SF_SMALL, "events")
    batch = ev.join(F.broadcast(dim), ev.user_id % 150 == dim.join_key, "left").select(
        "event_id", "user_id", "event_type", "segment"
    )
    cols = ["event_id", "user_id", "event_type", "segment"]
    assert _rows(res, cols) == _rows(batch, cols)


def test_stream_stateful_anomaly(spark):
    """applyInPandasWithState runs and produces one output row per event,
    with z-scores that reflect per-user running state (first event per user
    has z=0: no prior state)."""
    stream = jobs.events_stream(spark, SF_SMALL)
    res = jobs.run_available_now(jobs.anomaly_flags_stateful(stream), "t_anom", spark)
    ev = t(spark, SF_SMALL, "events")
    assert res.count() == ev.count()
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc())
    firsts = (
        res.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("zscore")
        .collect()
    )
    assert all(r.zscore == 0.0 for r in firsts)


def test_rocksdb_state_store_equivalent_results(spark):
    """The RocksDB state-store provider (executor-disk state — the 100 TB
    posture for stateful streaming) must produce identical results to the
    default heap provider for both built-in (dedup) and custom
    (applyInPandasWithState) stateful queries."""
    stream = jobs.events_stream(spark, SF_SMALL)
    heap = jobs.run_available_now(
        jobs.dedup_within_watermark(stream), "t_dedup_heap", spark
    ).select("event_id")
    rocks = jobs.run_available_now(
        jobs.dedup_within_watermark(jobs.events_stream(spark, SF_SMALL)),
        "t_dedup_rocks",
        spark,
        state_store="rocksdb",
    ).select("event_id")
    assert heap.exceptAll(rocks).isEmpty() and rocks.exceptAll(heap).isEmpty()

    z = jobs.run_available_now(
        jobs.anomaly_flags_stateful(jobs.events_stream(spark, SF_SMALL)),
        "t_anom_rocks",
        spark,
        state_store="rocksdb",
    )
    assert z.count() > 0
    # provider conf restored after the run
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", "unset")
        != jobs.ROCKSDB_PROVIDER
    )


def test_transform_with_state_equals_apply_in_pandas_with_state(spark):
    """The Spark 4 StatefulProcessor pipeline must produce row-identical
    z-scores to the applyInPandasWithState form — same Welford recurrence,
    two state APIs. Skips when google.protobuf is unusable (the TWS driver
    worker speaks protobuf to the state server; this container ships a
    broken namespace package and installs are not allowed)."""
    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState env-blocked")
    legacy = jobs.run_available_now(
        jobs.anomaly_flags_stateful(jobs.events_stream(spark, SF_SMALL)),
        "t_tws_legacy",
        spark,
    )
    tws = jobs.run_available_now(
        jobs.anomaly_flags_tws(jobs.events_stream(spark, SF_SMALL)),
        "t_tws_new",
        spark,
        state_store="rocksdb",
    )
    key = lambda r: (r.user_id, r.ts, r.value)
    assert sorted(map(tuple, tws.collect()), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, legacy.collect()), key=lambda t: (t[0], t[1])
    )


def test_stream_session_real_registered_op_agrees_with_batch(spark):
    """The declared rows-only query (stream_session_real) drains the real
    F.session_window streaming query; its rows must equal the batch
    session_window computation on the same fixture."""
    from mimranalytics_core_spark.registry import all_ops

    res = all_ops()["stream_session_real"].fn(spark, SF_SMALL)
    batch = (
        t(spark, SF_SMALL, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sess_value"))
        .select("user_id", F.col("win").start.alias("sess_start"), "n_events", "sess_value")
    )
    cols = ["user_id", "sess_start", "n_events", "sess_value"]
    assert _rows(res, cols) == _rows(batch, cols)


def test_stream_dedup_real_registered_op(spark):
    """The declared rows-only query (stream_dedup_real): replay keeps every
    unique event_id exactly once."""
    from mimranalytics_core_spark.registry import all_ops

    res = all_ops()["stream_dedup_real"].fn(spark, SF_SMALL)
    batch = t(spark, SF_SMALL, "events")
    assert res.count() == batch.select("event_id").distinct().count()
    assert res.select("event_id").distinct().count() == res.count()


def test_stream_stream_join_agrees_with_batch(spark):
    """The declared rows-only query (stream_stream_join): the watermarked
    stream-stream interval join must emit exactly the batch join's rows on
    the bounded replay (availableNow drains everything, so no row is late)."""
    from mimranalytics_core_spark.registry import all_ops

    res = all_ops()["stream_stream_join"].fn(spark, SF_SMALL)
    ev = t(spark, SF_SMALL, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"), F.col("value").alias("amount"),
    )
    batch = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("v_user", "view_id", "v_ts", "purchase_id", "p_ts", "amount")
    cols = ["v_user", "view_id", "purchase_id"]
    assert _rows(res, cols) == _rows(batch, cols)
    assert res.count() > 0
