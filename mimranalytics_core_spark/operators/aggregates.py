"""Aggregation operators (SURVEY.md §2.4).

Provenance: Cypher aggregates over grouped patterns (reference README.md:25);
report rollups (README.md:19); approx-distinct is the 100 TB north-star path.

Scale posture: every groupBy below compiles to two-phase hash aggregation
(partial map-side combine → shuffle on group key → final), so shuffled bytes
are proportional to |groups|, not |rows|. Low-cardinality group keys
(returnflag×linestatus = 6 groups) shuffle almost nothing at any scale.
collect_list keeps per-group lists bounded (grouped on nation → ≤ |customers
per nation| elements); unbounded collect on a hot key would be re-designed as
top-k or a sketch at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mimranalytics_core_spark.functions.numeric import dround, dround_sql
from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "agg_global",
    "aggregates",
    oracle=f"""
        SELECT COUNT(*) AS n_rows,
               {dround_sql('SUM(l_quantity)', 2)} AS sum_qty,
               {dround_sql('AVG(l_extendedprice)', 2)} AS avg_price,
               {dround_sql('MIN(l_extendedprice)', 2)} AS min_price,
               {dround_sql('MAX(l_extendedprice)', 2)} AS max_price,
               COUNT(DISTINCT l_suppkey) AS n_supp
        FROM lineitem
    """,
    notes="ungrouped aggregate — single partial+final reduction, no group shuffle",
)
def agg_global(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dround(F.sum("l_quantity"), 2).alias("sum_qty"),
        dround(F.avg("l_extendedprice"), 2).alias("avg_price"),
        dround(F.min("l_extendedprice"), 2).alias("min_price"),
        dround(F.max("l_extendedprice"), 2).alias("max_price"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )


@register(
    "agg_groupby_hash",
    "aggregates",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {dround_sql('SUM(l_quantity)', 2)} AS sum_qty,
               {dround_sql('SUM(l_extendedprice)', 2)} AS sum_base_price,
               {dround_sql('SUM(l_extendedprice * (1 - l_discount))', 2)} AS sum_disc_price,
               {dround_sql('SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))', 2)} AS sum_charge,
               {dround_sql('AVG(l_quantity)', 4)} AS avg_qty,
               {dround_sql('AVG(l_discount)', 4)} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    notes="TPC-H-Q1-shaped pricing summary; 6 groups → negligible shuffle at any SF",
)
def agg_groupby_hash(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(F.sum(disc_price), 2).alias("sum_disc_price"),
            dround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "agg_count_distinct",
    "aggregates",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    notes="exact distinct → Spark expand + two-phase agg; swap to HLL at 100 TB (see agg_approx_distinct)",
)
def agg_count_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@register(
    "agg_approx_distinct",
    "aggregates",
    oracle=None,  # approx result ≠ deterministic oracle; rows-only check
    notes=(
        "HyperLogLog++ distinct (rsd=0.02): constant memory per group — the "
        "100 TB substitute for exact distinct. Unit test asserts ±5% of exact."
    ),
)
def agg_approx_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


@register(
    "agg_approx_percentile",
    "aggregates",
    oracle=None,  # sketch result ≠ deterministic oracle; rows-only check
    notes=(
        "approximate percentiles (Greenwald-Khanna sketch, accuracy 10k): "
        "p50/p90/p99 of order value per priority in one pass with bounded "
        "memory — the 100 TB substitute for exact sort-based quantiles. "
        "Unit test asserts each within 1% rank error of the exact quantile."
    ),
)
def agg_approx_percentile(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    pcts = F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000)
    return o.groupBy("o_orderpriority").agg(
        pcts.getItem(0).alias("p50"),
        pcts.getItem(1).alias("p90"),
        pcts.getItem(2).alias("p99"),
    )


@register(
    "agg_hll_sketch_merge",
    "aggregates",
    oracle=None,  # sketch bytes are engine-specific; rows-only check
    notes=(
        "HLL sketch build + MERGE (Apache DataSketches via hll_sketch_agg / "
        "hll_union_agg): per-(event_type, dow) sketches built in one pass, "
        "then UNIONED across dow to per-event_type distincts — the "
        "pre-aggregation shape that lets a 100 TB pipeline keep daily "
        "sketches and answer arbitrary-range distinct queries by merging "
        "bytes instead of rescanning raw data. Unit test asserts the merged "
        "estimate within 3% of the exact distinct."
    ),
)
def agg_hll_sketch_merge(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
    )


@register(
    "agg_collect",
    "aggregates",
    oracle="""
        SELECT n_name,
               list_aggregate(list_sort(list(DISTINCT c_mktsegment)), 'string_agg', '|')
                   AS segments,
               COUNT(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    notes=(
        "Cypher collect() analog; collect_set + array_sort, exported as a "
        "'|'-joined string so the result is hash-stable for scalar comparators"
    ),
)
def agg_collect(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), "|").alias("segments"),
            F.count("*").alias("n_cust"),
        )
    )


@register(
    "agg_rollup",
    "aggregates",
    oracle="""
        SELECT r_name, n_name, COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS sum_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    notes="subtotal hierarchy region→nation→grand-total (audit report shape, README.md:19)",
)
def agg_rollup(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("sum_bal"))
    )


@register(
    "agg_cube",
    "aggregates",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    notes="all subtotal combinations (CUBE) — expand-based, groups stay tiny",
)
def agg_cube(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


@register(
    "agg_grouping_sets",
    "aggregates",
    oracle="""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    notes="explicit grouping sets via SQL entry (lifecycle E2)",
)
def agg_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "customer")  # ensure view registered
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_cust
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@register(
    "agg_stats",
    "aggregates",
    oracle="""
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
               ROUND(VAR_SAMP(l_quantity), 2) AS var_qty,
               ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               ROUND(MEDIAN(l_quantity), 2) AS med_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    notes="statistical aggregates incl. exact median (both engines exact)",
)
def agg_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.median("l_quantity"), 2).alias("med_qty"),
    )


@register(
    "agg_conditional",
    "aggregates",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
               ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS rev_f
        FROM orders GROUP BY o_orderpriority
    """,
    notes="filtered/pivot-style aggregates in one pass over the fact",
)
def agg_conditional(spark, sf_dir):
    o = t(spark, sf_dir, "orders")

    def cnt(status):
        return F.sum(F.when(F.col("o_orderstatus") == status, 1).otherwise(0))

    return o.groupBy("o_orderpriority").agg(
        cnt("F").alias("n_f"),
        cnt("O").alias("n_o"),
        cnt("P").alias("n_p"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias("rev_f"),
    )


@register(
    "agg_mode_exact",
    "aggregates",
    oracle="""
        SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
        FROM (
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                      ORDER BY COUNT(*) DESC, o_orderpriority ASC) AS rn
            FROM orders GROUP BY o_orderstatus, o_orderpriority
        ) WHERE rn = 1
    """,
    notes=(
        "deterministic exact mode per group (most frequent value, ties "
        "broken lexicographically — unlike F.mode, whose tie choice is "
        "unspecified): two-level agg, count per (group, value) then "
        "row_number pick. Both shuffles hash on bounded key domains; at "
        "100 TB the first agg partial-combines map-side so the shuffle "
        "carries one row per distinct (group, value)"
    ),
)
def agg_mode_exact(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "agg_corr",
    "aggregates",
    oracle="""
        SELECT 'qty_price' AS pair,
               FLOOR(corr(l_quantity, l_extendedprice) * 1000000.0 + 0.5)
                   / 1000000.0 AS r
        FROM lineitem
        UNION ALL
        SELECT 'qty_discount',
               FLOOR(corr(l_quantity, l_discount) * 1000000.0 + 0.5) / 1000000.0
        FROM lineitem
        UNION ALL
        SELECT 'price_discount',
               FLOOR(corr(l_extendedprice, l_discount) * 1000000.0 + 0.5) / 1000000.0
        FROM lineitem
    """,
    notes=(
        "pairwise Pearson correlation over the fact's measure columns in "
        "ONE scan (all three F.corr aggregates share the pass — Catalyst "
        "fuses them into a single partial-agg shuffle of constant-size "
        "state; the oracle's UNION ALL form is three scans but DuckDB-"
        "exact). corr's sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) "
        "are mergeable — the 100 TB shape"
    ),
)
def agg_corr(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    agg = li.agg(
        dround(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price"),
        dround(F.corr("l_quantity", "l_discount"), 6).alias("qty_discount"),
        dround(F.corr("l_extendedprice", "l_discount"), 6).alias("price_discount"),
    )
    unpivot = F.expr(
        "stack(3, 'qty_price', qty_price, 'qty_discount', qty_discount, "
        "'price_discount', price_discount) AS (pair, r)"
    )
    return agg.select(unpivot)


@register(
    "agg_percentile_exact",
    "aggregates",
    oracle="""
        SELECT l_returnflag,
               FLOOR(quantile_cont(l_quantity, 0.25) * 1000000.0 + 0.5)
                   / 1000000.0 AS p25,
               FLOOR(quantile_cont(l_quantity, 0.5) * 1000000.0 + 0.5)
                   / 1000000.0 AS p50,
               FLOOR(quantile_cont(l_quantity, 0.75) * 1000000.0 + 0.5)
                   / 1000000.0 AS p75
        FROM lineitem GROUP BY l_returnflag
    """,
    notes=(
        "exact linear-interpolated percentiles per group (the hash-checked "
        "counterpart of the rows-only agg_approx_percentile sketch): Spark "
        "F.percentile == DuckDB quantile_cont semantics. Exact percentiles "
        "sort per group — the scale note is explicit: at 100 TB you use "
        "approx_percentile (mergeable KLL-style sketch, declared "
        "separately); this op is the audit/verification form on bounded "
        "groups, and the oracle pins the sketch's ground truth"
    ),
)
def agg_percentile_exact(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dround(F.percentile("l_quantity", F.lit(0.25)), 6).alias("p25"),
        dround(F.percentile("l_quantity", F.lit(0.5)), 6).alias("p50"),
        dround(F.percentile("l_quantity", F.lit(0.75)), 6).alias("p75"),
    )


@register(
    "agg_regr",
    "aggregates",
    oracle="""
        SELECT l_returnflag,
               FLOOR(regr_slope(l_extendedprice, l_quantity) * 10000.0 + 0.5)
                   / 10000.0 AS slope,
               FLOOR(regr_intercept(l_extendedprice, l_quantity) * 10000.0 + 0.5)
                   / 10000.0 AS intercept,
               FLOOR(regr_r2(l_extendedprice, l_quantity) * 1000000.0 + 0.5)
                   / 1000000.0 AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag
    """,
    notes=(
        "grouped OLS regression aggregates (price ~ quantity per return "
        "flag): slope/intercept/R² from the standard sufficient statistics "
        "(n, Σx, Σy, Σxy, Σx², Σy²) — fully mergeable partial aggs, one "
        "scan for all four functions; the in-database linear-model shape "
        "that replaces a driver-side sklearn fit at 100 TB"
    ),
)
def agg_regr(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        dround(F.regr_slope(y, x), 4).alias("slope"),
        dround(F.regr_intercept(y, x), 4).alias("intercept"),
        dround(F.regr_r2(y, x), 6).alias("r2"),
        F.regr_count(y, x).alias("n"),
    )


@register(
    "agg_entropy",
    "aggregates",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        tot AS (SELECT user_id, SUM(n) AS tot FROM counts GROUP BY user_id),
        terms AS (
            SELECT c.user_id,
                   FLOOR((-(c.n * 1.0 / t.tot) * LN(c.n * 1.0 / t.tot))
                         * 1000000000.0 + 0.5) / 1000000000.0 AS term
            FROM counts c JOIN tot t ON t.user_id = c.user_id
        )
        SELECT user_id,
               FLOOR(SUM(term) * 1000000.0 + 0.5) / 1000000.0 AS entropy
        FROM terms GROUP BY user_id
    """,
    notes=(
        "Shannon entropy of each user's event-type distribution — the "
        "behavioral-diversity / anomaly feature. Two partial-agg passes on "
        "user_id (the second reuses the first's partitioning); per-term "
        "-p·ln p is dround'd to 9 digits before the sum so cross-engine "
        "summation order cannot move the 6-digit result"
    ),
)
def agg_entropy(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = counts.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") * 1.0 / F.col("tot")
    term = F.floor((-p * F.log(p)) * 1e9 + F.lit(0.5)) / 1e9
    return (
        counts.join(tot, "user_id")
        .select("user_id", term.alias("term"))
        .groupBy("user_id")
        .agg((F.floor(F.sum("term") * 1e6 + F.lit(0.5)) / 1e6).alias("entropy"))
    )


@register(
    "agg_histogram",
    "aggregates",
    oracle="""
        SELECT event_type,
               CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
               CAST(FLOOR(value / 50.0) * 50 AS DOUBLE) AS bucket_lo,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type, FLOOR(value / 50.0)
    """,
    notes=(
        "fixed-width histogram per measure group (width 50) — the BI/"
        "profiling staple: bucket = floor(value/width), one partial-agg "
        "pass; bucket keys are bounded by the value range so the shuffle "
        "carries one row per (group, bucket) at any scale"
    ),
)
def agg_histogram(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    bucket = F.floor(F.col("value") / 50.0)
    return ev.groupBy(
        "event_type",
        bucket.cast("long").alias("bucket"),
    ).agg(F.count("*").alias("n")).select(
        "event_type",
        "bucket",
        (F.col("bucket") * 50).cast("double").alias("bucket_lo"),
        "n",
    )


@register(
    "agg_funnel_conversion",
    "aggregates",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_pur
            FROM events GROUP BY user_id
        ),
        flags AS (
            SELECT user_id,
                   (t_view IS NOT NULL) AS s1,
                   (t_view IS NOT NULL AND t_click IS NOT NULL
                    AND t_click > t_view) AS s2,
                   (t_view IS NOT NULL AND t_click IS NOT NULL
                    AND t_click > t_view AND t_pur IS NOT NULL
                    AND t_pur > t_click) AS s3
            FROM firsts
        )
        SELECT CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after,
               CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_after,
               FLOOR(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) * 1.0
                     / SUM(CASE WHEN s1 THEN 1 ELSE 0 END)
                     * 1000000.0 + 0.5) / 1000000.0 AS conversion
        FROM flags
    """,
    notes=(
        "ordered funnel conversion (view -> first click after it -> first "
        "purchase after that) at corpus level: one conditional-MIN pass "
        "per user, then row-local stage flags and a global roll-up — the "
        "product-analytics complement of win_funnel_pattern (which finds "
        "the per-user adjacent pairs). Single shuffle on user_id; the "
        "ordering constraint is pure MIN-timestamp comparison, no "
        "sequence enumeration"
    ),
)
def agg_funnel_conversion(spark, sf_dir):
    ev = t(spark, sf_dir, "events")

    def first(et):
        return F.min(F.when(F.col("event_type") == et, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first("view").alias("t_view"),
        first("click").alias("t_click"),
        first("purchase").alias("t_pur"),
    )
    s1 = F.col("t_view").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_view"))
    s3 = s2 & F.col("t_pur").isNotNull() & (F.col("t_pur") > F.col("t_click"))
    flags = firsts.select(
        s1.cast("int").alias("s1"), s2.cast("int").alias("s2"), s3.cast("int").alias("s3")
    )
    return flags.agg(
        F.sum("s1").alias("n_view"),
        F.sum("s2").alias("n_click_after"),
        F.sum("s3").alias("n_purchase_after"),
        (
            F.floor(F.sum("s3") * 1.0 / F.sum("s1") * 1e6 + F.lit(0.5)) / 1e6
        ).alias("conversion"),
    )


@register(
    "agg_gini",
    "aggregates",
    oracle="""
        WITH ranked AS (
            SELECT o_orderpriority, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey) AS i,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
                   SUM(o_totalprice) OVER (PARTITION BY o_orderpriority) AS tot
            FROM orders
        )
        SELECT o_orderpriority,
               FLOOR((2.0 * SUM(i * o_totalprice) / (n * tot) - (n + 1.0) / n)
                     * 1000000.0 + 0.5) / 1000000.0 AS gini,
               CAST(n AS BIGINT) AS n
        FROM ranked
        GROUP BY o_orderpriority, n, tot
    """,
    notes=(
        "Gini concentration coefficient of order value per priority class "
        "(the inequality/profiling metric): rank-weighted-sum identity "
        "G = 2Σ(i·x_i)/(n·Σx) − (n+1)/n over one rank window + one agg — "
        "a per-group sort (window) and nothing quadratic; deterministic "
        "rank ties via orderkey"
    ),
)
def agg_gini(spark, sf_dir):
    from pyspark.sql import Window

    o = t(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority")
    wr = wp.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    ranked = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(wr).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("o_totalprice").over(wp).alias("tot"),
    )
    gini = (
        F.floor(
            (2.0 * F.sum(F.col("i") * F.col("o_totalprice")) / (F.col("n") * F.col("tot"))
             - (F.col("n") + 1.0) / F.col("n"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        ranked.groupBy("o_orderpriority", "n", "tot")
        .agg(gini.alias("gini"))
        .select("o_orderpriority", "gini", F.col("n").cast("long").alias("n"))
    )


@register(
    "agg_skew_kurtosis",
    "aggregates",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                        AS DOUBLE) AS s2,
                   CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s3,
                   CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                            * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                        AS DOUBLE) AS s4
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               FLOOR(((s3 / n) - 3.0 * (s1 / n) * (s2 / n) + 2.0 * (s1 / n) * (s1 / n) * (s1 / n))
                     / POWER((s2 / n) - (s1 / n) * (s1 / n), 1.5) * 1e6 + 0.5) / 1e6
                   AS skewness,
               FLOOR(((s4 / n) - 4.0 * (s1 / n) * (s3 / n) + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                     / (((s2 / n) - (s1 / n) * (s1 / n)) * ((s2 / n) - (s1 / n) * (s1 / n)))
                     * 1e6 + 0.5) / 1e6 - 3.0 AS kurtosis
        FROM s
    """,
    notes=(
        "population skewness + excess kurtosis per group from EXACT integer "
        "power sums S1..S4 (quantity is integer-valued; q^4 * |group| stays "
        "far inside int64, so the moments are bit-identical in both engines "
        "and the float formula runs on identical operands — the engine "
        "built-ins are deliberately NOT used because Spark's skewness is "
        "population-form while DuckDB's is sample-adjusted). One fused "
        "partial-agg scan; 5 longs of mergeable state — the 100 TB shape"
    ),
)
def agg_skew_kurtosis(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
        F.sum(q * q * q * q).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = (s2 / n) - mean * mean
    m3 = (s3 / n) - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean
    m4 = (
        (s4 / n)
        - F.lit(4.0) * mean * (s3 / n)
        + F.lit(6.0) * mean * mean * (s2 / n)
        - F.lit(3.0) * mean * mean * mean * mean
    )
    return s.select(
        "l_returnflag",
        (F.floor(m3 / F.pow(m2, 1.5) * 1e6 + F.lit(0.5)) / 1e6).alias("skewness"),
        (F.floor(m4 / (m2 * m2) * 1e6 + F.lit(0.5)) / 1e6 - F.lit(3.0)).alias("kurtosis"),
    )


@register(
    "agg_weighted_median",
    "aggregates",
    oracle="""
        WITH w AS (
            SELECT l_returnflag, l_extendedprice,
                   SUM(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice ASC, l_orderkey ASC,
                                l_linenumber ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_w,
                   SUM(CAST(l_quantity AS BIGINT)) OVER (
                       PARTITION BY l_returnflag) AS tot_w
            FROM lineitem
        )
        SELECT l_returnflag, MIN(l_extendedprice) AS weighted_median
        FROM w WHERE cum_w * 2 >= tot_w
        GROUP BY l_returnflag
    """,
    notes=(
        "exact quantity-weighted median price per group (the "
        "volume-weighted mid-price a trade report quotes): ordered running "
        "weight sum, first row whose cumulative weight crosses half the "
        "total — deterministic because the weights are exact integers and "
        "the order pins ties with the row key. One window shuffle on the "
        "group key; the 100 TB form replaces the full sort with the "
        "grouped exact-percentile pre-aggregation (agg_percentile_exact's "
        "note) when groups are huge"
    ),
)
def agg_weighted_median(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy(F.asc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    q = F.col("l_quantity").cast("bigint")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(q).over(wc).alias("cum_w"),
        F.sum(q).over(wt).alias("tot_w"),
    )
    return (
        w.filter(F.col("cum_w") * 2 >= F.col("tot_w"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median"))
    )


@register(
    "agg_string_agg",
    "aggregates",
    oracle="""
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               string_agg(c_name, '|' ORDER BY c_name ASC) AS roster
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    notes=(
        "ordered string aggregation (the roster/concat column every audit "
        "report export wants, F5 README.md:19): "
        "array_join(array_sort(collect_list())) — Cypher collect() + "
        "join in one op, with the engine's pinned-lexical-order "
        "determinism (DuckDB's ORDER BY inside string_agg is the oracle "
        "twin). Per-group state is the member list — bounded by the "
        "group's cardinality; at 100 TB the roster column is capped or "
        "top-k'd, as OPERATORS.md notes for agg_collect"
    ),
)
def agg_string_agg(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_cust"),
            F.array_join(F.array_sort(F.collect_list("c_name")), "|").alias("roster"),
        )
    )


@register(
    "agg_stats_rollup_merge",
    "aggregates",
    oracle="""
        SELECT r_name,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(AVG(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) / 100.0
                     * 1e6 + 0.5) / 1e6 AS mean_bal,
               FLOOR(((SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)
                           * CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT))
                       - CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT))
                              AS DOUBLE)
                         * SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT))
                         / COUNT(*))
                      / COUNT(*) / 10000.0) * 1e6 + 0.5) / 1e6 AS var_bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    notes=(
        "hierarchical statistics roll-up from MERGEABLE PARTIALS — the "
        "explicit demonstration of the pattern every 100 TB aggregate "
        "rides: per-NATION sufficient statistics (n, sum, sum-of-squares "
        "over exact integer cents) are merged into REGION mean/variance "
        "WITHOUT rescanning rows (the second aggregate sums the partials; "
        "Chan's merge reduces to plain sums because the statistics are "
        "raw power sums). The oracle computes region stats straight from "
        "the raw rows — the hash match proves partial-merge exactness. "
        "Integer cents make the partials bit-identical; only the final "
        "mean/variance division is float, on identical operands"
    ),
)
def agg_stats_rollup_merge(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    cents = F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("bigint")
    # stage 1: per-nation partials (the map-side/pre-aggregated layer a
    # 100 TB pipeline would keep materialized)
    partials = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("pn"),
            F.sum(cents).alias("ps"),
            F.sum(cents * cents).alias("pss"),
        )
    )
    # stage 2: merge partials to regions — sums of sums, never the raw rows
    merged = partials.groupBy("r_name").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("ps").alias("s"),
        F.sum("pss").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n") / 100.0
    var = (
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / F.col("n")
        / 10000.0
    )
    return merged.select(
        "r_name",
        "n",
        (F.floor(mean * 1e6 + F.lit(0.5)) / 1e6).alias("mean_bal"),
        (F.floor(var * 1e6 + F.lit(0.5)) / 1e6).alias("var_bal"),
    )


@register(
    "agg_bitmap_distinct",
    "aggregates",
    oracle="""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    notes=(
        "EXACT distinct counting via Spark's bitmap aggregates "
        "(bitmap_bucket_number / bitmap_bit_position / "
        "bitmap_construct_agg + bitmap_count — the mergeable-exact sibling "
        "of the HLL sketch family): user ids land in 32k-bit bucket "
        "bitmaps built per (type, bucket) partial, then per-type counts "
        "are the SUM of per-bucket popcounts. Unlike COUNT(DISTINCT)'s "
        "expand+dedup, the bitmap partials are fixed-size, mergeable and "
        "storable — a 100 TB pipeline keeps daily bucket bitmaps and "
        "answers range distincts by OR-ing bytes, exactly (the HLL note's "
        "pattern without the error bar). Oracle is plain COUNT(DISTINCT) "
        "— the hash match proves the bitmap path exact"
    ),
)
def agg_bitmap_distinct(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    buckets = (
        ev.groupBy(
            "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
        ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("b"))
    )
    return buckets.groupBy("event_type").agg(
        F.sum(F.bitmap_count("b")).alias("n_users")
    )


@register(
    "agg_skew_salted",
    "aggregates",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_returnflag
    """,
    notes=(
        "two-stage SALTED aggregation for a hot group key (the agg-side "
        "twin of join_skew_salted): stage 1 aggregates on "
        "(key, hash(row) % 16) so a skewed key's rows spread over 16 "
        "reducers, stage 2 merges the 16 salted partials per key — sums "
        "over exact integer cents, so the two-stage result is provably "
        "identical to the direct group-by oracle. With only 3 return "
        "flags over millions of rows, the UNSALTED plan would bottleneck "
        "on 3 reducers at scale (Spark's partial agg already mitigates "
        "for algebraic functions; salting is the explicit form that also "
        "covers non-algebraic per-key work)"
    ),
)
def agg_skew_salted(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    salted = (
        li.select("l_returnflag", cents.alias("c"))
        .withColumn("salt", F.pmod(F.hash("c"), 16))  # value-derived, seed-free
        .groupBy("l_returnflag", "salt")
        .agg(F.count("*").alias("pn"), F.sum("c").alias("ps"))
    )
    return salted.groupBy("l_returnflag").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("ps").cast("bigint").alias("rev_cents"),
    )
