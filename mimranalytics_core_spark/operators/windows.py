"""Window-function operators (SURVEY.md §2.5).

Provenance: "highlight" top owners (reference README.md:13), temporal
evolution / running exposure (README.md:17), report percentiles (README.md:19).

Scale posture: a window is one shuffle on partitionBy + a per-partition sort.
All windows here partition on real keys (custkey/user_id/nation) so state per
partition is bounded; an unpartitioned window (global running total) would be
a single-task bottleneck at 100 TB and is deliberately absent — global
ordering needs are served by sort_limit_topk (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mimranalytics_core_spark.functions.numeric import dround, dround_sql
from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "win_rank",
    "windows",
    oracle="""
        SELECT c_nationkey, c_custkey,
               ROUND(c_acctbal, 2) AS acctbal,
               ROW_NUMBER() OVER w AS rn,
               RANK()       OVER w AS rnk,
               DENSE_RANK() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    notes="per-group ranking (top-owner highlight, README.md:13); custkey tiebreak pins order",
)
def win_rank(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_topk_per_group",
    "windows",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    notes="top-k per group: rank window + filter; Spark prunes with WindowGroupLimit",
)
def win_topk_per_group(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_lag_lead",
    "windows",
    oracle="""
        SELECT user_id, event_id, ts,
               lag(ts)  OVER w AS prev_ts,
               lead(ts) OVER w AS next_ts,
               CAST(date_diff('second', lag(ts) OVER w, ts) AS BIGINT) AS gap_sec
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    notes="temporal diffing vs previous event (Time-Slider delta, README.md:17)",
)
def win_lag_lead(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        prev_ts.alias("prev_ts"),
        F.lead("ts").over(w).alias("next_ts"),
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).cast("bigint").alias("gap_sec"),
    )


@register(
    "win_running_sum",
    "windows",
    oracle=f"""
        SELECT user_id, event_id, ts,
               {dround_sql("SUM(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 2)} AS running_value
        FROM events
    """,
    notes="cumulative exposure over time per user (README.md:17)",
)
def win_running_sum(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        dround(F.sum("value").over(w), 2).alias("running_value"),
    )


@register(
    "win_range_frame",
    "windows",
    oracle="""
        SELECT user_id, event_id, ts,
               SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                         RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) / 100.0 AS sum_24h
        FROM events
    """,
    notes=(
        "sliding 24h value-range frame (moving exposure); range on epoch "
        "seconds. Summed as exact integer cents: float range-frame sums are "
        "evaluated by segment tree in DuckDB vs sequentially in Spark, and "
        "the ordering ulp flips rounded digits at scale (observed at sf0.1) "
        "-- integer sums are order-independent and engine-exact"
    ),
)
def win_range_frame(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-86400, 0)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.sum(cents).over(w) / 100.0).alias("sum_24h"),
    )


@register(
    "win_ntile_percent",
    "windows",
    oracle="""
        SELECT c_custkey, c_nationkey,
               NTILE(4) OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 4) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
    notes="distribution buckets for report percentiles (README.md:19)",
)
def win_ntile_percent(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "win_first_last",
    "windows",
    oracle="""
        SELECT user_id, event_id, ts,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type)  OVER w AS last_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    notes="as-of snapshot first/last per entity with a full frame (README.md:17)",
)
def win_first_last(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    )


@register(
    "win_funnel_pattern",
    "windows",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_id, event_type, ts,
                   LEAD(event_type) OVER w AS nxt_type,
                   LEAD(event_id) OVER w AS nxt_id,
                   LEAD(ts) OVER w AS nxt_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id AS view_id, nxt_id AS purchase_id,
               CAST(date_diff('microsecond', ts, nxt_ts) // 1000000 AS BIGINT)
                   AS gap_seconds
        FROM ordered
        WHERE event_type = 'view' AND nxt_type = 'purchase'
          AND date_diff('microsecond', ts, nxt_ts) <= 3600000000
    """,
    notes=(
        "MATCH_RECOGNIZE-style consecutive-row sequence detection: a view "
        "IMMEDIATELY followed by a purchase within 1h, per user — the "
        "strict-adjacency funnel (stream_stream_join is the relaxed "
        "any-pair form; together they cover both funnel semantics). One "
        "window shuffle on user_id, row-local pattern predicate — "
        "MATCH_RECOGNIZE compiles to exactly this shape for fixed-length "
        "patterns"
    ),
)
def win_funnel_pattern(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    o = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lead("event_type").over(w).alias("nxt_type"),
        F.lead("event_id").over(w).alias("nxt_id"),
        F.lead("ts").over(w).alias("nxt_ts"),
    )
    gap_us = F.expr("timestampdiff(MICROSECOND, ts, nxt_ts)")
    gap = F.floor(gap_us / F.lit(1000000)).cast("long")
    return (
        o.filter(
            (F.col("event_type") == "view")
            & (F.col("nxt_type") == "purchase")
            & (gap_us <= 3600000000)
        )
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("nxt_id").alias("purchase_id"),
            gap.alias("gap_seconds"),
        )
    )


@register(
    "win_gap_islands",
    "windows",
    oracle="""
        WITH days AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
            FROM events
        ),
        numbered AS (
            SELECT user_id, d,
                   d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
            FROM days
        )
        SELECT user_id, MIN(d) AS start_day, MAX(d) AS end_day,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM numbered
        GROUP BY user_id, grp
    """,
    notes=(
        "gaps-and-islands: maximal runs of consecutive active days per "
        "user via the classic d - row_number() constant-per-run key — "
        "activity-streak analytics without self-joins or iteration. One "
        "window shuffle on user_id; the groupBy reuses the same "
        "partitioning (no second exchange)"
    ),
)
def win_gap_islands(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    numbered = days.select(
        "user_id", "d", (F.col("d") - F.row_number().over(w)).alias("grp")
    )
    return (
        numbered.groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("start_day"),
            F.max("d").alias("end_day"),
            F.count("*").alias("n_days"),
        )
        .drop("grp")
    )


@register(
    "win_retention_cohorts",
    "windows",
    oracle="""
        WITH activity AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                       AS week
            FROM events
        ),
        cohorts AS (
            SELECT user_id, MIN(week) AS cohort FROM activity GROUP BY user_id
        )
        SELECT c.cohort,
               CAST(a.week - c.cohort AS BIGINT) AS age_weeks,
               CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS active_users
        FROM activity a JOIN cohorts c ON c.user_id = a.user_id
        GROUP BY c.cohort, a.week - c.cohort
    """,
    notes=(
        "cohort retention matrix — the product-analytics staple: cohort = "
        "first-activity week, age = weeks since cohort, cell = distinct "
        "users still active. Two partial-agg passes on user_id (the "
        "cohort dim re-joins the activity rows, broadcast-sized per "
        "cohort-week domain); count-distinct is the only wide agg and "
        "its key domain is |cohorts|x|ages| — bounded"
    ),
)
def win_retention_cohorts(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    week = (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) / 7).cast("long")
    activity = ev.select("user_id", week.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort"))
    return (
        activity.join(F.broadcast(cohorts), "user_id")
        .groupBy("cohort", (F.col("week") - F.col("cohort")).alias("age_weeks"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "win_sessionize_ids",
    "windows",
    oracle="""
        WITH marked AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR date_diff('microsecond', LAG(ts) OVER w, ts)
                                > 1800000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id, ts,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS session_id
        FROM marked
    """,
    notes=(
        "explicit session-ID assignment (30-minute gap rule): the gap-flag "
        "+ running-sum idiom — stream_session aggregates sessions, this op "
        "LABELS every event with its session so downstream joins can use "
        "the id. Both windows share one user_id shuffle; exact-microsecond "
        "gaps keep the engines' boundary decisions identical"
    ),
)
def win_sessionize_ids(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) over "
        "(partition by user_id order by ts, event_id), ts)"
    )
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap_us.isNull() | (gap_us > 1800000000), 1).otherwise(0).alias("new_sess"),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return marked.select(
        "user_id", "event_id", "ts", F.sum("new_sess").over(wsum).alias("session_id")
    )


@register(
    "win_distinct_running",
    "windows",
    oracle="""
        SELECT user_id, event_id,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_types_seen
        FROM (
            SELECT user_id, event_id, ts,
                   CASE WHEN ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts ASC, event_id ASC) = 1
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        )
    """,
    notes=(
        "running DISTINCT count per key (how many event types has this "
        "user touched so far) — a feature Spark SQL lacks natively "
        "(COUNT(DISTINCT) OVER is unsupported): implemented as "
        "size(collect_set() OVER rows-unbounded-preceding), state bounded "
        "by the type domain (5). The oracle is an INDEPENDENT formulation "
        "— first-occurrence marker + running integer sum — so the hash "
        "match certifies the semantics, not the implementation. One "
        "window shuffle on user_id, integer-only"
    ),
)
def win_distinct_running(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types_seen"),
    )


@register(
    "win_pareto_share",
    "windows",
    oracle="""
        WITH rev AS (
            SELECT o.o_custkey, c.c_nationkey,
                   CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey, c.c_nationkey
        )
        SELECT c_nationkey, o_custkey, rev_cents,
               FLOOR(CAST(SUM(rev_cents) OVER (
                         PARTITION BY c_nationkey
                         ORDER BY rev_cents DESC, o_custkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS DOUBLE)
                     / CAST(SUM(rev_cents) OVER (PARTITION BY c_nationkey)
                            AS DOUBLE) * 1e6 + 0.5) / 1e6 AS cum_share,
               CASE WHEN CAST(SUM(rev_cents) OVER (
                             PARTITION BY c_nationkey
                             ORDER BY rev_cents DESC, o_custkey ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                         ) AS DOUBLE)
                        - CAST(rev_cents AS DOUBLE)
                        < 0.8 * CAST(SUM(rev_cents) OVER (
                              PARTITION BY c_nationkey) AS DOUBLE)
                    THEN TRUE ELSE FALSE END AS in_top80
        FROM rev
    """,
    notes=(
        "Pareto / 80-20 concentration analysis per nation (the 'which "
        "customers carry 80% of exposure' highlight, README.md:13): "
        "revenue in EXACT integer cents, descending cumulative share from "
        "one ordered window (running integer sums — immune to frame "
        "accumulation order, the ts_rolling_corr discipline), in_top80 "
        "marks customers whose cumulative share before them is under the "
        "threshold (so the flag set always covers >= 80%). One partial-agg "
        "shuffle + one window shuffle on the nation key"
    ),
)
def win_pareto_share(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    cents = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", "c_nationkey")
        .agg(F.sum(cents).cast("bigint").alias("rev_cents"))
    )
    wc = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.desc("rev_cents"), F.asc("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("c_nationkey")
    cum = F.sum("rev_cents").over(wc).cast("double")
    tot = F.sum("rev_cents").over(wt).cast("double")
    return rev.select(
        "c_nationkey",
        "o_custkey",
        "rev_cents",
        (F.floor(cum / tot * 1e6 + F.lit(0.5)) / 1e6).alias("cum_share"),
        (cum - F.col("rev_cents").cast("double") < 0.8 * tot).alias("in_top80"),
    )


@register(
    "win_median_rolling",
    "windows",
    oracle="""
        WITH base AS (
            SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
                   CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents
            FROM lineitem
        ),
        fr AS (
            SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
                   list(cents) OVER w AS l,
                   ROW_NUMBER() OVER (PARTITION BY l_suppkey
                       ORDER BY l_shipdate ASC, l_orderkey ASC,
                                l_linenumber ASC) AS rn
            FROM base
            WINDOW w AS (PARTITION BY l_suppkey
                         ORDER BY l_shipdate ASC, l_orderkey ASC,
                                  l_linenumber ASC
                         ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        )
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               (CAST(list_sort(l)[10] AS DOUBLE)
                + CAST(list_sort(l)[11] AS DOUBLE)) / 2.0 / 100.0
                   AS rolling_median
        FROM fr WHERE rn >= 20
    """,
    notes=(
        "rolling 20-row exact MEDIAN price per supplier — a window Spark "
        "SQL cannot express natively (no median/percentile over frames): "
        "array_sort(collect_list() OVER frame) + the two middle elements, "
        "on exact integer cents so the interpolated midpoint is "
        "bit-identical in both engines regardless of frame accumulation "
        "order (the ts_rolling_corr discipline; the oracle sorts a "
        "windowed list() the same way). Full frames only; per-row state "
        "is the 20-element frame list — bounded by the frame, not the "
        "partition"
    ),
)
def win_median_rolling(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    order = [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w = (
        Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-19, Window.currentRow)
    )
    wr = Window.partitionBy("l_suppkey").orderBy(*order)
    arr = F.array_sort(F.collect_list("cents").over(w))
    return (
        base.select(
            "l_suppkey",
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            arr.alias("l"),
            F.row_number().over(wr).alias("rn"),
        )
        .filter(F.col("rn") >= 20)
        .select(
            "l_suppkey",
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            (
                (
                    F.element_at("l", 10).cast("double")
                    + F.element_at("l", 11).cast("double")
                )
                / 2.0
                / 100.0
            ).alias("rolling_median"),
        )
    )
