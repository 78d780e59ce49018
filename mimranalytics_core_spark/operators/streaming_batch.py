"""Event-time operators: batch twins of the streaming surface (SURVEY.md §2.10).

Provenance: temporal analysis (reference README.md:17); alarm-stream text
analytics pattern (PAPERS.md). Strategy per SURVEY.md §7.6: each op has a
batch event-time form here (SQL-expressible → oracle-checked); the
``mimranalytics_core_spark.streaming`` package exposes the same logic over
``readStream`` (rows-only demos — streaming state is not oracle-visible).

Scale posture: tumbling/sliding windows are groupBy on (window, key) —
partial aggregation bounds shuffle; sessionization is one window shuffle per
user + running sum (no self-join). In true streaming these carry watermarks so
state is evicted; batch twins are stateless scans.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "stream_tumbling",
    "event_time",
    oracle="""
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    notes="1h tumbling windows (batch twin ≡ date_trunc); streaming form adds watermark",
)
def stream_tumbling(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").start.cast("timestamp_ntz").alias("win_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "stream_sliding",
    "event_time",
    oracle="""
        WITH slides AS (
            SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + (CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900 - 900 * s.i)
                     * INTERVAL 1 SECOND AS win_start,
                   value
            FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS i) s
        )
        SELECT win_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        FROM slides
        GROUP BY win_start
    """,
    notes=(
        "sliding 1h/15m windows: each event lands in 4 windows "
        "(win_start = event's 15m slot minus 0..3 slides); F.window expansion "
        "matches the explicit slide-enumeration oracle"
    ),
)
def stream_sliding(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").start.cast("timestamp_ntz").alias("win_start"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "stream_session",
    "event_time",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
            FROM flagged
        )
        SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id, COUNT(*) AS n_events,
               MIN(ts) AS sess_start, MAX(ts) AS sess_end,
               ROUND(SUM(value), 2) AS sess_value
        FROM sessions
        GROUP BY user_id, sess_id
    """,
    notes=(
        "30-min gap sessionization (lag-gap → running-sum session ids); "
        "streaming twin uses F.session_window (mimranalytics_core_spark.streaming)"
    ),
)
def stream_session(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("new_sess"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.select(
        "user_id", "ts", "value", F.sum("new_sess").over(w2).alias("sess_id")
    )
    return sessions.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        F.round(F.sum("value"), 2).alias("sess_value"),
    )


@register(
    "stream_dedup_state",
    "event_time",
    oracle="""
        SELECT event_id, min(ts) AS first_ts
        FROM events
        GROUP BY event_id
    """,
    notes=(
        "dedup-by-id batch twin (first occurrence per event_id); streaming "
        "form is dropDuplicatesWithinWatermark (state-store bounded by watermark)"
    ),
)
def stream_dedup_state(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_id").agg(F.min("ts").alias("first_ts"))


@register(
    "stream_join_enrich",
    "event_time",
    oracle="""
        WITH dim AS (
            SELECT c_custkey % 150 AS join_key,
                   arg_min(c_mktsegment, c_custkey) AS segment
            FROM customer GROUP BY 1
        )
        SELECT e.event_id, e.user_id, e.event_type, d.segment
        FROM events e JOIN dim d ON e.user_id % 150 = d.join_key
    """,
    notes=(
        "stream–static dimension enrich (events ⋈ customer via surrogate key); "
        "static side broadcast in the streaming form — no stream shuffle"
    ),
)
def stream_join_enrich(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy(F.col("c_custkey") % 150).orderBy(F.col("c_custkey").asc())
    dim = (
        c.select("c_custkey", "c_mktsegment", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select((F.col("c_custkey") % 150).alias("join_key"), F.col("c_mktsegment").alias("segment"))
    )
    return ev.join(F.broadcast(dim), (ev.user_id % 150) == dim.join_key).select(
        "event_id", "user_id", "event_type", "segment"
    )


@register(
    "stream_anomaly_flag",
    "event_time",
    oracle="""
        WITH stats AS (
            SELECT user_id,
                   AVG(value) AS mu,
                   COALESCE(STDDEV_SAMP(value), 0.0) AS sd
            FROM events GROUP BY user_id
        )
        SELECT e.event_id, e.user_id,
               ROUND(e.value, 2) AS value,
               (e.value > s.mu + 2 * s.sd) AS is_anomaly
        FROM events e JOIN stats s ON e.user_id = s.user_id
    """,
    notes=(
        "per-key anomaly flag (alarm-verification pattern): batch twin of the "
        "custom stateful op in mimranalytics_core_spark.streaming.stateful "
        "(applyInPandasWithState keeps running mean/var per key)"
    ),
)
def stream_anomaly_flag(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("user_id").alias("su")).agg(
        F.avg("value").alias("mu"),
        F.coalesce(F.stddev_samp("value"), F.lit(0.0)).alias("sd"),
    )
    return ev.join(stats, ev.user_id == stats.su).select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        (F.col("value") > F.col("mu") + 2 * F.col("sd")).alias("is_anomaly"),
    )
