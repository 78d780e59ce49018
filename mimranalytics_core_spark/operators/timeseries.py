"""Time-series analytics operators (Time-Slider analytics family,
reference README.md:17) beyond plain windows: exponential smoothing, pivot
reports, sampling.

Scale posture: EWMA is a per-key ordered scan inside one window shuffle —
same cost envelope as win_running_sum; pivot compiles to one pass of
conditional aggregates (the pivoted column's domain must be bounded — it is:
5 event types); sampling is scan-local (no shuffle)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mimranalytics_core_spark.functions.numeric import dround, dround_sql
from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register

_ALPHA = 0.3


_EWMA_SQL = """
    WITH RECURSIVE ordered AS (
        -- pre-filter to the recursion horizon so each level joins 20·|users|
        -- rows, not the full table
        SELECT * FROM (
            SELECT user_id, event_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        ) WHERE rn <= 20
    ),
    ewma_rec(user_id, event_id, ts, rn, y) AS (
        SELECT user_id, event_id, ts, rn, value FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.ts, o.rn, 0.3 * o.value + 0.7 * e.y
        FROM ewma_rec e JOIN ordered o
          ON o.user_id = e.user_id AND o.rn = e.rn + 1
        WHERE e.rn < 20
    )
    SELECT user_id, event_id, ts, FLOOR(y * 1e4 + 0.5) / 1e4 AS ewma
    FROM ewma_rec
"""


@register(
    "ts_resample_ffill",
    "event_time",
    oracle="""
        WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value
                    FROM events WHERE user_id < 10),
        daily AS (SELECT user_id, day, COUNT(*) AS n_events,
                         FLOOR(SUM(value) * 100 + 0.5) / 100 AS day_value
                  FROM ev GROUP BY user_id, day),
        days AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                                    DATE '2024-01-30',
                                                    INTERVAL 1 DAY)) AS DATE) AS day),
        users AS (SELECT DISTINCT user_id FROM ev),
        grid AS (SELECT user_id, day FROM users CROSS JOIN days),
        j AS (SELECT g.user_id, g.day,
                     COALESCE(d.n_events, 0) AS n_events, d.day_value
              FROM grid g LEFT JOIN daily d USING (user_id, day))
        SELECT user_id, CAST(day AS TIMESTAMP) AS day, n_events,
               COALESCE(LAST_VALUE(day_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
                   AS filled_value
        FROM j
    """,
    notes=(
        "regular-grid resample + forward fill (Time-Slider analytics, "
        "README.md:17 — the gap-filling step every downsampled time-series "
        "report needs): per-user DAILY grid over the fixture's pinned "
        "[2024-01-01, 2024-01-30] window (sequence+explode), daily sums "
        "left-joined on, gaps carried forward with last(ignorenulls) over "
        "an ordered per-user window, 0 before first activity. Scale: the "
        "grid is |users|×|days| rows built without shuffle, the join is a "
        "plain equi-join, and the fill is ONE window pass per user — same "
        "cost envelope as win_running_sum; user slice bounds the declared "
        "op, the helper takes any frame"
    ),
)
def ts_resample_ffill(spark, sf_dir):
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select("user_id", F.to_date("ts").alias("day"), "value")
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.count("*").alias("n_events"),
        (F.floor(F.sum("value") * 100 + F.lit(0.5)) / 100).alias("day_value"),
    )
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(days)
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # DATE round-trips as python objects through Arrow while DuckDB DATE
    # lands as datetime64 — emit timestamps (the kind every temporal op
    # uses) so the canonicalized frames agree in dtype, not just in str()
    return j.select(
        "user_id",
        F.col("day").cast("timestamp_ntz").alias("day"),
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.last("day_value", ignorenulls=True).over(w), F.lit(0.0)).alias(
            "filled_value"
        ),
    )


@register(
    "ts_ewma",
    "event_time",
    oracle=_EWMA_SQL,
    notes=(
        "per-user EWMA (alpha=0.3): y_t = 0.3 x_t + 0.7 y_(t-1), first 20 "
        "events per key. Spark side: grouped applyInPandas running "
        "pandas ewm(adjust=False) per key (one shuffle, Arrow-batched, "
        "recurrence in C — no per-row Python loop) -- the identical IEEE "
        "op sequence, bit-identical to the DuckDB "
        "recursive-CTE oracle. A closed-form prefix-sum window variant "
        "matched only to ~1e-14, which flips digits because 2-decimal "
        "inputs land EWMA values exactly on round boundaries, and a Spark "
        "recursive CTE paid ~0.4 s/level in job overhead"
    ),
)
def ts_ewma(spark, sf_dir):
    import numpy as np
    import pandas as pd

    w_rn = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # JVM-side pre-filter: only the recursion horizon crosses the Arrow
    # boundary (20·|users| rows, not the full table)
    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value", F.row_number().over(w_rn).alias("rn"))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )

    def ewma_partition(batches):
        # One pandas frame PER PARTITION, not per user: the window exchange
        # already co-located and sorted each user's rows, so mapInPandas +
        # a groupby here runs ~32 Python calls instead of |users| tiny
        # applyInPandas groups (measured 6 s of per-group overhead for 1500
        # users at sf0.1 — the grouped-UDF small-groups pathology). The
        # concat is bounded by the JVM pre-filter (≤20 rows/user).
        pdf = pd.concat(list(batches), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        # ewm(adjust=False) runs y_t = 0.3·x_t + 0.7·y_{t-1} in C — the SAME
        # IEEE op sequence as the recursive-CTE oracle (add is commutative,
        # the weight normalizer is exactly 1.0), so results stay
        # bit-identical to the per-row Python loop this replaced (A/B'd:
        # identical driver hash); floor-rounding applies to output only.
        y = pdf.groupby("user_id", sort=False)["value"].transform(
            lambda s: s.ewm(alpha=0.3, adjust=False).mean()
        )
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "ewma": np.floor(y.to_numpy() * 1e4 + 0.5) / 1e4,
            }
        )

    # No repartition needed: the row_number window above hash-partitioned by
    # user_id, so every user's rows are complete within one partition.
    return ev.mapInPandas(
        ewma_partition, schema="user_id BIGINT, event_id BIGINT, ts TIMESTAMP_NTZ, ewma DOUBLE"
    )


@register(
    "agg_pivot",
    "aggregates",
    oracle=f"""
        SELECT user_id,
               {dround_sql("COALESCE(SUM(CASE WHEN event_type = 'click' THEN value END), 0.0)", 2)} AS click_value,
               {dround_sql("COALESCE(SUM(CASE WHEN event_type = 'view' THEN value END), 0.0)", 2)} AS view_value,
               {dround_sql("COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0.0)", 2)} AS purchase_value
        FROM events
        GROUP BY user_id
    """,
    notes=(
        "true pivot (df.groupBy().pivot(values)) — long→wide report shape "
        "(README.md:19); compiles to one pass of conditional aggregates, "
        "pivot domain explicitly bounded (never pivot on unbounded keys)"
    ),
)
def agg_pivot(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.sum("value"))
    )
    return wide.select(
        "user_id",
        dround(F.coalesce(F.col("click"), F.lit(0.0)), 2).alias("click_value"),
        dround(F.coalesce(F.col("view"), F.lit(0.0)), 2).alias("view_value"),
        dround(F.coalesce(F.col("purchase"), F.lit(0.0)), 2).alias("purchase_value"),
    )


@register(
    "sample_stratified",
    "scans",
    oracle=None,  # RNG differs per engine → rows-only; invariants unit-tested
    notes=(
        "seeded stratified sample (50% of clicks, 10% of everything else) via "
        "sampleBy — the pipeline down-sampling primitive; scan-local, no "
        "shuffle. Fraction bounds + determinism asserted in "
        "tests/test_invariants.py"
    ),
)
def sample_stratified(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    fractions = {"click": 0.5, "view": 0.1, "purchase": 0.1, "signup": 0.1, "error": 0.1}
    return ev.sampleBy("event_type", fractions, seed=42).select(
        "event_id", "event_type", "user_id"
    )


@register(
    "ts_zscore_anomaly",
    "timeseries",
    oracle="""
        WITH w AS (
            SELECT user_id, event_id, ts, value,
                   AVG(value) OVER fr AS m,
                   STDDEV(value) OVER fr AS s
            FROM events
            WINDOW fr AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
        )
        SELECT user_id, event_id, ts, value,
               FLOOR((value - m) / s * 1e6 + 0.5) / 1e6 AS zscore
        FROM w
        WHERE s > 0 AND ABS((value - m) / s) > 3
    """,
    notes=(
        "rolling z-score anomaly detection (Time-Slider analytics, "
        "README.md:17; the alarm-verification shape of PAPERS.md:9): each "
        "event scored against the mean/stddev of its user's previous 20 "
        "events (strictly-preceding frame — no self-inclusion leakage), "
        "|z| > 3 flagged. One window shuffle on user_id, frame math "
        "codegen'd; sample stddev in both engines, floor-HALF_UP rounding. "
        "The streaming twin of this shape is stream_stateful_custom "
        "(per-key running stats in state)"
    ),
)
def ts_zscore_anomaly(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    fr = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-20, -1)
    )
    m = F.avg("value").over(fr)
    s = F.stddev("value").over(fr)
    z = (F.col("value") - m) / s
    return (
        ev.select("user_id", "event_id", "ts", "value", s.alias("s"), z.alias("z"))
        .filter((F.col("s") > 0) & (F.abs(F.col("z")) > 3))
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            (F.floor(F.col("z") * 1e6 + F.lit(0.5)) / 1e6).alias("zscore"),
        )
    )


@register(
    "ts_mad_outlier",
    "timeseries",
    oracle="""
        WITH med AS (
            SELECT event_type, median(value) AS m FROM events GROUP BY event_type
        ),
        dev AS (
            SELECT e.event_id, e.event_type, e.value, m.m,
                   ABS(e.value - m.m) AS d
            FROM events e JOIN med m ON m.event_type = e.event_type
        ),
        mad AS (SELECT event_type, median(d) AS mad FROM dev GROUP BY event_type)
        SELECT dev.event_id AS event_id, dev.event_type AS event_type,
               dev.value AS value,
               FLOOR(dev.m * 1000000.0 + 0.5) / 1000000.0 AS med,
               FLOOR(mad.mad * 1000000.0 + 0.5) / 1000000.0 AS mad
        FROM dev JOIN mad ON mad.event_type = dev.event_type
        WHERE dev.d > 4.4478 * mad.mad
    """,
    notes=(
        "robust outlier detection: median absolute deviation per event "
        "type, flag |x-med| > 3*1.4826*MAD (=4.4478, the normal-consistency "
        "constant). Two exact-median passes (Spark F.median == DuckDB "
        "median incl. even-count interpolation); the per-type stats are "
        "5-row dims broadcast back — at 100 TB this is two partial-agg "
        "shuffles on a 5-key column plus a broadcast join, no sort of the "
        "full data (median via exact percentile is per-group, bounded key "
        "domain)"
    ),
)
def ts_mad_outlier(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type", "value", "m", F.abs(F.col("value") - F.col("m")).alias("d")
    )
    mad = dev.groupBy("event_type").agg(F.median("d").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("d") > 4.4478 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            dround(F.col("m"), 6).alias("med"),
            dround(F.col("mad"), 6).alias("mad"),
        )
    )


@register(
    "ts_scd2_intervals",
    "timeseries",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events
        ),
        ch AS (
            SELECT user_id, event_type, ts, event_id FROM ordered
            WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
               (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
                   AS is_current
        FROM ch
    """,
    notes=(
        "SCD-type-2 history build: collapse each user's event stream to "
        "state-change rows and derive [valid_from, valid_to) validity "
        "intervals (open interval = current). The warehouse-dimension "
        "staple. One window shuffle on user_id serves both the change "
        "filter and the interval windows (same partitioning reused across "
        "stages — no second shuffle)"
    ),
)
def ts_scd2_intervals(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ch = (
        ev.select("user_id", "event_type", "ts", "event_id",
                  F.lag("event_type").over(w).alias("prev"))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ch.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@register(
    "ts_interpolate_linear",
    "timeseries",
    oracle="""
        WITH known AS (
            SELECT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                   FLOOR(AVG(value) * 1000000.0 + 0.5) / 1000000.0 AS val
            FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT user_id, MIN(d) AS mn, MAX(d) AS mx FROM known GROUP BY user_id),
        grid AS (SELECT user_id, unnest(generate_series(mn, mx)) AS d FROM bounds),
        j AS (
            SELECT g.user_id, g.d, k.val
            FROM grid g LEFT JOIN known k ON k.user_id = g.user_id AND k.d = g.d
        ),
        f AS (
            SELECT user_id, d, val,
                   LAST_VALUE(val IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                   LAST_VALUE(CASE WHEN val IS NOT NULL THEN d END IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                   FIRST_VALUE(val IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY d
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                   FIRST_VALUE(CASE WHEN val IS NOT NULL THEN d END IGNORE NULLS) OVER
                       (PARTITION BY user_id ORDER BY d
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
            FROM j
        )
        SELECT user_id, d AS day_idx, (val IS NOT NULL) AS is_observed,
               FLOOR((CASE WHEN val IS NOT NULL THEN val
                           WHEN pv IS NOT NULL AND nv IS NOT NULL
                                THEN pv + (nv - pv) * (d - pd) / (nd - pd)
                           ELSE COALESCE(pv, nv) END) * 1000000.0 + 0.5)
                   / 1000000.0 AS value
        FROM f
    """,
    notes=(
        "gap-filling by linear interpolation on the per-user daily grid "
        "(complement of ts_resample_ffill's step-fill): day buckets as "
        "integer day numbers (no tz arithmetic), per-user sequence() grid, "
        "prev/next located with IGNORE NULLS frame scans — one window "
        "shuffle on user_id covers all four scans. Daily knowns are "
        "dround'd BEFORE interpolating so both engines interpolate from "
        "identical decimals"
    ),
)
def ts_interpolate_linear(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    known = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
            "value",
        )
        .groupBy("user_id", "d")
        .agg((F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias("val"))
    )
    bounds = known.groupBy("user_id").agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    grid = bounds.select("user_id", F.explode(F.sequence("mn", "mx")).alias("d"))
    j = grid.join(known, ["user_id", "d"], "left")
    wp = Window.partitionBy("user_id").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("user_id").orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    pv = F.last("val", ignorenulls=True).over(wp)
    pd_ = F.last(F.when(F.col("val").isNotNull(), F.col("d")), ignorenulls=True).over(wp)
    nv = F.first("val", ignorenulls=True).over(wn)
    nd = F.first(F.when(F.col("val").isNotNull(), F.col("d")), ignorenulls=True).over(wn)
    interp = (
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(
            pv.isNotNull() & nv.isNotNull(),
            pv + (nv - pv) * (F.col("d") - pd_) / (nd - pd_),
        )
        .otherwise(F.coalesce(pv, nv))
    )
    return j.select(
        "user_id",
        F.col("d").alias("day_idx"),
        F.col("val").isNotNull().alias("is_observed"),
        (F.floor(interp * 1e6 + F.lit(0.5)) / 1e6).alias("value"),
    )


@register(
    "ts_forecast_backtest",
    "timeseries",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                   FLOOR(AVG(value) * 1000000.0 + 0.5) / 1000000.0 AS val
            FROM events GROUP BY 1, 2
        ),
        feat AS (
            SELECT user_id, d, val,
                   LAG(val) OVER w AS naive_pred,
                   FLOOR(AVG(val) OVER (PARTITION BY user_id ORDER BY d
                                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
                         * 1000000.0 + 0.5) / 1000000.0 AS ma_pred
            FROM daily
            WINDOW w AS (PARTITION BY user_id ORDER BY d)
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_evals,
               FLOOR(AVG(ABS(val - naive_pred)) * 1000000.0 + 0.5) / 1000000.0
                   AS mae_naive,
               FLOOR(AVG(ABS(val - ma_pred)) * 1000000.0 + 0.5) / 1000000.0
                   AS mae_ma,
               (AVG(ABS(val - ma_pred)) < AVG(ABS(val - naive_pred))) AS ma_wins
        FROM feat
        WHERE naive_pred IS NOT NULL AND ma_pred IS NOT NULL
        GROUP BY user_id
    """,
    notes=(
        "rolling-origin forecast backtest: per user-day, score the naive "
        "(yesterday) and 7-day-moving-average forecasters against the "
        "actual, report per-user MAE and the winner — the standard "
        "baseline-model evaluation loop done in-engine. Daily values are "
        "dround'd before differencing (cross-engine float discipline); one "
        "window shuffle on user_id feeds both forecasters and the final "
        "agg reuses the partitioning"
    ),
)
def ts_forecast_backtest(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
            "value",
        )
        .groupBy("user_id", "d")
        .agg((F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias("val"))
    )
    w = Window.partitionBy("user_id").orderBy("d")
    wma = Window.partitionBy("user_id").orderBy("d").rowsBetween(-7, -1)
    feat = daily.select(
        "user_id",
        "val",
        F.lag("val").over(w).alias("naive_pred"),
        (F.floor(F.avg("val").over(wma) * 1e6 + F.lit(0.5)) / 1e6).alias("ma_pred"),
    )
    return (
        feat.filter(F.col("naive_pred").isNotNull() & F.col("ma_pred").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_evals"),
            (F.floor(F.avg(F.abs(F.col("val") - F.col("naive_pred"))) * 1e6 + F.lit(0.5)) / 1e6).alias("mae_naive"),
            (F.floor(F.avg(F.abs(F.col("val") - F.col("ma_pred"))) * 1e6 + F.lit(0.5)) / 1e6).alias("mae_ma"),
            (
                F.avg(F.abs(F.col("val") - F.col("ma_pred")))
                < F.avg(F.abs(F.col("val") - F.col("naive_pred")))
            ).alias("ma_wins"),
        )
    )


@register(
    "sample_hash_deterministic",
    "sampling",
    oracle="""
        SELECT event_type, event_id, user_id
        FROM (
            SELECT event_type, event_id, user_id,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY md5(CAST(event_id AS VARCHAR)),
                                               event_id) AS rn
            FROM events
        ) WHERE rn <= 100
    """,
    notes=(
        "deterministic stratified sampling: rank rows inside each stratum "
        "by md5(id) — a uniform pseudo-random order that is REPRODUCIBLE "
        "across engines, reruns, and partitionings (true RNG samplers "
        "cannot be oracle-checked or resumed; this one is hash-exact). "
        "The oracle-checked counterpart of the rows-only "
        "sample_stratified. Top-100-per-stratum via rank-over-window; at "
        "100 TB the same semantics run as a per-partition TakeOrdered "
        "heap per stratum (k·strata memory)"
    ),
)
def sample_hash_deterministic(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id").asc()
    )
    return (
        ev.select("event_type", "event_id", "user_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 100)
        .drop("rn")
    )


@register(
    "pipeline_train_test_split",
    "sampling",
    oracle="""
        WITH tagged AS (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10
                       AS bucket
            FROM documents
        ),
        split AS (
            SELECT doc_id,
                   CASE WHEN bucket < 8 THEN 'train'
                        WHEN bucket = 8 THEN 'val'
                        ELSE 'test' END AS split
            FROM tagged
        )
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
        FROM split GROUP BY split
    """,
    notes=(
        "deterministic train/val/test split (80/10/10) by md5(doc_id) "
        "bucket — the split is a PURE FUNCTION of the id: reproducible "
        "across engines, reruns, repartitions, and incremental ingests (a "
        "new doc never moves an old one between splits — the property "
        "random splits lack and training pipelines require). Row-local, "
        "zero shuffles before the summary agg; md5-hex→BIGINT parity with "
        "DuckDB proven by the simhash/random-walk family"
    ),
)
def pipeline_train_test_split(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    split = (
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test")
    )
    return (
        d.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "ml_feature_scale",
    "sampling",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   MIN(value) AS mn, MAX(value) AS mx,
                   AVG(value) AS mu, stddev_samp(value) AS sigma
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type,
               FLOOR((e.value - s.mn) / (s.mx - s.mn) * 1000000.0 + 0.5)
                   / 1000000.0 AS minmax,
               FLOOR((e.value - s.mu) / s.sigma * 1000000.0 + 0.5)
                   / 1000000.0 AS zscore
        FROM events e JOIN stats s ON s.event_type = e.event_type
    """,
    notes=(
        "feature scaling for training pipelines: min-max to [0,1] and "
        "z-score per event type in one pass — per-group stats are a "
        "5-row dim broadcast back onto the fact (no sort, no second "
        "fact shuffle); the fit/transform split every feature store "
        "implements, expressed as agg + broadcast join"
    ),
)
def ml_feature_scale(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        (F.floor((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 1e6 + F.lit(0.5)) / 1e6).alias("minmax"),
        (F.floor((F.col("value") - F.col("mu")) / F.col("sigma") * 1e6 + F.lit(0.5)) / 1e6).alias("zscore"),
    )


@register(
    "ts_changepoint_naive",
    "timeseries",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                   FLOOR(AVG(value) * 1000000.0 + 0.5) / 1000000.0 AS val
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT user_id, d, val,
                   SUM(val) OVER w AS cs, COUNT(*) OVER w AS cn,
                   SUM(val) OVER (PARTITION BY user_id) AS ts_,
                   COUNT(*) OVER (PARTITION BY user_id) AS tn
            FROM daily
            WINDOW w AS (PARTITION BY user_id ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ),
        scored AS (
            SELECT user_id, d,
                   FLOOR(ABS(cs / cn - (ts_ - cs) / (tn - cn)) * 1000000000.0 + 0.5)
                       / 1000000000.0 AS shift
            FROM cum
            WHERE cn >= 3 AND tn - cn >= 3
        )
        SELECT user_id, d AS changepoint_day,
               FLOOR(shift * 1000000.0 + 0.5) / 1000000.0 AS mean_shift
        FROM (
            SELECT user_id, d, shift,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY shift DESC, d ASC) AS rn
            FROM scored
        ) WHERE rn = 1
    """,
    notes=(
        "naive changepoint detection: the split day maximizing "
        "|mean(before) - mean(after)| with >=3 points per side — the "
        "binary-segmentation primitive, computed from cumulative sums in "
        "ONE window pass (no per-candidate rescan: O(n) per key, not "
        "O(n^2)). Shift dround(9)'d before the argmax ranking so both "
        "engines pick identical ties"
    ),
)
def ts_changepoint_naive(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
            "value",
        )
        .groupBy("user_id", "d")
        .agg((F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias("val"))
    )
    w = Window.partitionBy("user_id").orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("user_id")
    cum = daily.select(
        "user_id",
        "d",
        F.sum("val").over(w).alias("cs"),
        F.count("*").over(w).alias("cn"),
        F.sum("val").over(wall).alias("ts_"),
        F.count("*").over(wall).alias("tn"),
    )
    shift = F.floor(
        F.abs(F.col("cs") / F.col("cn") - (F.col("ts_") - F.col("cs")) / (F.col("tn") - F.col("cn")))
        * 1e9
        + F.lit(0.5)
    ) / 1e9
    scored = cum.filter((F.col("cn") >= 3) & (F.col("tn") - F.col("cn") >= 3)).select(
        "user_id", "d", shift.alias("shift")
    )
    wr = Window.partitionBy("user_id").orderBy(F.col("shift").desc(), F.col("d").asc())
    return (
        scored.select("user_id", "d", "shift", F.row_number().over(wr).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("d").alias("changepoint_day"),
            (F.floor(F.col("shift") * 1e6 + F.lit(0.5)) / 1e6).alias("mean_shift"),
        )
    )


@register(
    "ts_autocorr",
    "timeseries",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
                   FLOOR(AVG(value) * 1000000.0 + 0.5) / 1000000.0 AS val
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT user_id, val,
                   LAG(val, 1) OVER w AS l1,
                   LAG(val, 2) OVER w AS l2
            FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)
        )
        SELECT user_id,
               FLOOR(corr(val, l1) * 1000000.0 + 0.5) / 1000000.0 AS acf1,
               FLOOR(corr(val, l2) * 1000000.0 + 0.5) / 1000000.0 AS acf2,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM lagged
        GROUP BY user_id
        HAVING COUNT(l2) >= 5
    """,
    notes=(
        "autocorrelation at lags 1-2 per user's daily series — the "
        "seasonality/persistence screen before any forecasting model: one "
        "lag window + grouped corr (mergeable sufficient statistics); the "
        "window and the agg share the user_id partitioning. Pairwise-"
        "deletion semantics: corr ignores rows whose lag is NULL "
        "(identical in both engines)"
    ),
)
def ts_autocorr(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
            "value",
        )
        .groupBy("user_id", "d")
        .agg((F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias("val"))
    )
    w = Window.partitionBy("user_id").orderBy("d")
    lagged = daily.select(
        "user_id",
        "val",
        F.lag("val", 1).over(w).alias("l1"),
        F.lag("val", 2).over(w).alias("l2"),
    )
    return (
        lagged.groupBy("user_id")
        .agg(
            (F.floor(F.corr("val", "l1") * 1e6 + F.lit(0.5)) / 1e6).alias("acf1"),
            (F.floor(F.corr("val", "l2") * 1e6 + F.lit(0.5)) / 1e6).alias("acf2"),
            F.count("*").alias("n_days"),
            F.count("l2").alias("n_l2"),
        )
        .filter(F.col("n_l2") >= 5)
        .drop("n_l2")
    )


@register(
    "ts_rolling_corr",
    "timeseries",
    oracle="""
        WITH base AS (
            SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS p
            FROM lineitem
        ),
        fr AS (
            SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
                   COUNT(*) OVER w AS n,
                   SUM(q) OVER w AS sq, SUM(p) OVER w AS sp,
                   SUM(q * p) OVER w AS sqp,
                   SUM(q * q) OVER w AS sqq, SUM(p * p) OVER w AS spp,
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
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                          - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) = 0
                      OR (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                          - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)) = 0
                    THEN NULL
                    ELSE FLOOR(
                        (CAST(n AS DOUBLE) * CAST(sqp AS DOUBLE)
                         - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE))
                        / (SQRT(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                                - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                           * SQRT(CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                                  - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)))
                        * 1e6 + 0.5) / 1e6
               END AS rolling_r
        FROM fr WHERE rn >= 20
    """,
    notes=(
        "rolling 20-row Pearson correlation (price vs quantity per "
        "supplier — the co-movement screen a risk desk runs per "
        "counterparty): computed from EXACT integer power sums (quantity "
        "as int, price as cents) over the ordered frame, so the sufficient "
        "statistics are bit-identical in both engines regardless of frame "
        "accumulation order (DuckDB's segment-tree window merges vs "
        "Spark's streaming frames — float sums would ulp-diverge, integer "
        "sums cannot). One window shuffle on suppkey; per-row state is 5 "
        "longs. Full-frame rows only (rn >= 20)"
    ),
)
def ts_rolling_corr(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("q"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint").alias("p"),
    )
    order = [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w = (
        Window.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-19, Window.currentRow)
    )
    wr = Window.partitionBy("l_suppkey").orderBy(*order)
    fr = base.select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.count("*").over(w).alias("n"),
        F.sum("q").over(w).alias("sq"),
        F.sum("p").over(w).alias("sp"),
        F.sum(F.col("q") * F.col("p")).over(w).alias("sqp"),
        F.sum(F.col("q") * F.col("q")).over(w).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).over(w).alias("spp"),
        F.row_number().over(wr).alias("rn"),
    )
    nd = F.col("n").cast("double")
    sq = F.col("sq").cast("double")
    sp = F.col("sp").cast("double")
    sqp = F.col("sqp").cast("double")
    sqq = F.col("sqq").cast("double")
    spp = F.col("spp").cast("double")
    var_q = nd * sqq - sq * sq
    var_p = nd * spp - sp * sp
    r = (nd * sqp - sq * sp) / (F.sqrt(var_q) * F.sqrt(var_p))
    return (
        fr.filter(F.col("rn") >= 20)
        .select(
            "l_suppkey",
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            F.when((var_q == 0) | (var_p == 0), F.lit(None).cast("double"))
            .otherwise(F.floor(r * 1e6 + F.lit(0.5)) / 1e6)
            .alias("rolling_r"),
        )
    )


@register(
    "ts_seasonal_hour",
    "timeseries",
    oracle="""
        WITH h AS (SELECT event_type, hour(ts) AS hr, COUNT(*) AS cnt
                   FROM events GROUP BY event_type, hour(ts)),
        tot AS (SELECT event_type, SUM(cnt) AS total FROM h GROUP BY event_type)
        SELECT h.event_type, CAST(h.hr AS INTEGER) AS hr,
               CAST(h.cnt AS BIGINT) AS cnt,
               FLOOR(h.cnt * 24.0 / tot.total * 1e6 + 0.5) / 1e6
                   AS seasonal_index
        FROM h JOIN tot ON h.event_type = tot.event_type
    """,
    notes=(
        "hour-of-day seasonal profile per event type (the multiplicative "
        "seasonal-index step of classical decomposition — index > 1 marks "
        "peak hours; the load-shaping signal for the Time-Slider stream, "
        "README.md:17): two partial-agg shuffles on a 5x24-cell grid, "
        "index math on exact integer ratios. At 100 TB the hour counts "
        "are mergeable partials — the canonical pre-aggregation shape"
    ),
)
def ts_seasonal_hour(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    h = ev.groupBy("event_type", F.hour("ts").alias("hr")).agg(
        F.count("*").alias("cnt")
    )
    tot = h.groupBy("event_type").agg(F.sum("cnt").alias("total"))
    return h.join(tot, "event_type").select(
        "event_type",
        F.col("hr").cast("int").alias("hr"),
        F.col("cnt").cast("bigint").alias("cnt"),
        (F.floor(F.col("cnt") * 24.0 / F.col("total") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "seasonal_index"
        ),
    )


_HOLT_SQL = """
    WITH RECURSIVE ordered AS (
        SELECT * FROM (
            SELECT user_id, event_id, ts, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS rn
            FROM events
        ) WHERE rn <= 20
    ),
    holt(user_id, event_id, ts, rn, l, b) AS (
        SELECT user_id, event_id, ts, rn, CAST(value AS DOUBLE),
               CAST(0.0 AS DOUBLE)
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.ts, o.rn,
               0.5 * o.value + 0.5 * (h.l + h.b),
               0.3 * ((0.5 * o.value + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b
        FROM holt h JOIN ordered o
          ON o.user_id = h.user_id AND o.rn = h.rn + 1
        WHERE h.rn < 20
    )
    SELECT user_id, event_id, ts,
           FLOOR(l * 1e4 + 0.5) / 1e4 AS level,
           FLOOR(b * 1e4 + 0.5) / 1e4 AS trend,
           FLOOR((l + b) * 1e4 + 0.5) / 1e4 AS forecast_next
    FROM holt
"""


@register(
    "ts_holt_linear",
    "timeseries",
    oracle=_HOLT_SQL,
    notes=(
        "Holt double exponential smoothing (level + trend, alpha=0.5 "
        "beta=0.3, b0=0 — the one-step forecaster a Time-Slider overlay "
        "draws, README.md:17) over each user's first 20 events: the "
        "ts_ewma execution pattern — JVM pre-filter to the recursion "
        "horizon, ONE Arrow batch per partition, the coupled recurrence "
        "run as a numpy loop whose op sequence matches the oracle's "
        "recursive CTE term for term (the CTE computes l_new twice — "
        "identical expressions give identical bits, so the duplication is "
        "free determinism); floor-round on output only. Per-user state is "
        "two doubles — the applyInPandasWithState shape if run streaming"
    ),
)
def ts_holt_linear(spark, sf_dir):
    import numpy as np
    import pandas as pd

    w_rn = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value", F.row_number().over(w_rn).alias("rn"))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )

    def holt_partition(batches):
        pdf = pd.concat(list(batches), ignore_index=True)
        if not len(pdf):
            return
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        levels = np.empty(len(pdf))
        trends = np.empty(len(pdf))
        i = 0
        for _, g in pdf.groupby("user_id", sort=False):
            x = g["value"].to_numpy()
            l, b = x[0], 0.0
            levels[i], trends[i] = l, b
            for j in range(1, len(x)):
                l_new = 0.5 * x[j] + 0.5 * (l + b)
                b = 0.3 * (l_new - l) + 0.7 * b
                l = l_new
                levels[i + j], trends[i + j] = l, b
            i += len(x)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "level": np.floor(levels * 1e4 + 0.5) / 1e4,
                "trend": np.floor(trends * 1e4 + 0.5) / 1e4,
                "forecast_next": np.floor((levels + trends) * 1e4 + 0.5) / 1e4,
            }
        )

    return ev.mapInPandas(
        holt_partition,
        schema=(
            "user_id bigint, event_id bigint, ts timestamp, "
            "level double, trend double, forecast_next double"
        ),
    )


@register(
    "ts_week_over_week",
    "timeseries",
    oracle="""
        WITH wk AS (
            SELECT event_type, date_trunc('week', ts) AS week_start,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, CAST(week_start AS TIMESTAMP) AS week_start,
               CAST(n AS BIGINT) AS n,
               CAST(LAG(n) OVER (PARTITION BY event_type
                                 ORDER BY week_start ASC) AS BIGINT) AS prev_n,
               CASE WHEN LAG(n) OVER (PARTITION BY event_type
                                      ORDER BY week_start ASC) IS NULL THEN NULL
                    ELSE FLOOR((n - LAG(n) OVER (PARTITION BY event_type
                                                 ORDER BY week_start ASC))
                               * 1.0
                               / LAG(n) OVER (PARTITION BY event_type
                                              ORDER BY week_start ASC)
                               * 1e6 + 0.5) / 1e6
               END AS wow_change
        FROM wk
    """,
    notes=(
        "week-over-week growth per event type (the KPI delta every "
        "monitoring report leads with, Time-Slider family README.md:17): "
        "weekly partial-agg counts (mergeable — the 100 TB shape), one lag "
        "window over the tiny type-by-week grid, integer-ratio change "
        "dround 6. date_trunc('week') is Monday-start in both engines "
        "(probed)"
    ),
)
def ts_week_over_week(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    wk = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").alias("week_start")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.asc("week_start"))
    prev = F.lag("n").over(w)
    return wk.select(
        "event_type",
        F.col("week_start").cast("timestamp_ntz").alias("week_start"),
        F.col("n").cast("bigint").alias("n"),
        prev.cast("bigint").alias("prev_n"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .otherwise(F.floor((F.col("n") - prev) * 1.0 / prev * 1e6 + F.lit(0.5)) / 1e6)
        .alias("wow_change"),
    )


@register(
    "ts_gap_distribution",
    "timeseries",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   (epoch_us(ts) - epoch_us(LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts ASC, event_id ASC)))
                       // 1000000 AS gap_s
            FROM events
        ),
        b AS (SELECT event_type,
                     CAST(FLOOR(LN(gap_s + 1.0) / LN(2.0)) AS INTEGER)
                         AS log2_bucket
              FROM g WHERE gap_s IS NOT NULL)
        SELECT event_type, log2_bucket, CAST(COUNT(*) AS BIGINT) AS n_gaps
        FROM b GROUP BY event_type, log2_bucket
    """,
    notes=(
        "inter-arrival gap distribution per event type (the burstiness "
        "profile an ops monitor draws; heavy upper buckets = outage "
        "candidates, cf. win_gap_islands): per-user consecutive gaps in "
        "whole seconds (integer microsecond diff + floor division — the "
        "win_funnel_pattern cross-engine lesson), bucketed on log2(gap+1). "
        "One lag window on user_id + one partial agg over the tiny "
        "(type, bucket) grid; ln-ratio on exact integer inputs, "
        "floor-bucketed, so the bucket index is deterministic"
    ),
)
def ts_gap_distribution(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev = F.lag("ts").over(w)
    gap_us = F.expr("timestampdiff(MICROSECOND, __prev_ts, ts)")
    g = (
        ev.select("event_type", "ts", prev.alias("__prev_ts"))
        .select("event_type", F.floor(gap_us / F.lit(1000000)).alias("gap_s"))
        .filter(F.col("gap_s").isNotNull())
    )
    bucket = F.floor(F.log(F.col("gap_s") + 1.0) / F.log(F.lit(2.0))).cast("int")
    return (
        g.select("event_type", bucket.alias("log2_bucket"))
        .groupBy("event_type", "log2_bucket")
        .agg(F.count("*").cast("bigint").alias("n_gaps"))
    )
