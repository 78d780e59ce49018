"""Join operators (SURVEY.md §2.3) + the flagship query (§7.2).

Provenance: Cypher ``MATCH (a)-[r]->(b)`` is an equi-join of node/edge sets
(reference README.md:25); N-tier patterns are join chains (README.md:11);
conflict detection is a self-join on a shared attribute (README.md:15);
as-of / interval joins realize the Time-Slider (README.md:17).

Scale posture: dimension tables (region/nation/supplier/part at TPC-H ratios)
are broadcast — no shuffle of the fact side; fact-fact joins (lineitem⋈orders)
shuffle on the join key and would be bucketed on l_orderkey/o_orderkey in a
persisted 100 TB layout. Non-equi joins are written with an equi prefix
wherever possible so Spark picks SMJ/BHJ instead of BNLJ; the pure-range join
documents the time-bucketing rewrite used at scale (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "flagship_exposure_rollup",
    "flagship",
    oracle="""
        WITH revenue AS (
            SELECT o.o_custkey AS custkey,
                   SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
        ),
        ranked AS (
            SELECT r.r_name AS region_name,
                   n.n_name AS nation_name,
                   c.c_custkey AS custkey,
                   ROUND(rev.rev, 2) AS revenue,
                   ROW_NUMBER() OVER (
                       PARTITION BY r.r_name
                       ORDER BY rev.rev DESC, c.c_custkey ASC
                   ) AS rn
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            JOIN revenue rev ON rev.custkey = c.c_custkey
        )
        SELECT region_name, nation_name, custkey, revenue, rn
        FROM ranked
        WHERE rn <= 5
        ORDER BY region_name ASC, rn ASC
    """,
    notes=(
        "M1 flagship: 2-tier ownership-tree traversal (customer→nation→region, "
        "README.md:11) ⋈ order revenue (README.md:19), top-5 'highlighted' "
        "customers per region (README.md:13 'highlight'). Exercises scan, "
        "broadcast join chain, partial agg, window, sort in one plan."
    ),
)
def flagship_exposure_rollup(spark, sf_dir):
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")

    # Fact-fact join shuffles on orderkey; agg is map-side partial first.
    revenue = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(orders.o_custkey.alias("custkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
    )
    # Dim chain is broadcast: nation (25) and region (5) never shuffle the fact.
    enriched = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(revenue, revenue.custkey == customer.c_custkey)
    )
    w = Window.partitionBy("r_name").orderBy(F.col("rev").desc(), F.col("c_custkey").asc())
    return (
        enriched.select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            F.col("c_custkey").alias("custkey"),
            F.round("rev", 2).alias("revenue"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy(F.col("region_name").asc(), F.col("rn").asc())
    )


@register(
    "join_inner_hash",
    "joins",
    oracle="""
        SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
               ROUND(l.l_extendedprice, 2) AS price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    """,
    notes="fact⋈fact equi join; shuffles both sides on orderkey (bucket-able at scale)",
)
def join_inner_hash(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        F.round("l_extendedprice", 2).alias("price"),
    )


@register(
    "join_multiway",
    "joins",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation_name, r.r_name AS region_name
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name IN ('ASIA', 'EUROPE')
    """,
    notes="fixed-depth N-tier traversal (README.md:11) as a broadcast join chain",
)
def join_multiway(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation_name"), F.col("r_name").alias("region_name"))
    )


@register(
    "join_left",
    "joins",
    oracle="""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
    """,
    notes="left outer preserving customers with no qualifying order",
)
def join_left(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 100000)
    return c.join(o, cond, "left").select("c_custkey", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    "joins",
    oracle="""
        WITH cn AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
             sn AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
        SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey, cn.n_cust, sn.n_supp
        FROM cn FULL OUTER JOIN sn ON cn.c_nationkey = sn.s_nationkey
    """,
    notes="full outer join of two aggregates (snapshot union completeness, F5)",
)
def join_full_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    s = t(spark, sf_dir, "supplier").groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "join_semi",
    "joins",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    notes="existence filter (Cypher WHERE EXISTS analog) → left-semi hash join",
)
def join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    "joins",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    notes="non-existence (WHERE NOT EXISTS) → left-anti join",
)
def join_anti(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast",
    "joins",
    oracle="""
        SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name,
               ROUND(s.s_acctbal, 2) AS acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    notes="explicit broadcast-hash join: zero shuffle of the probe side (100 TB posture)",
)
def join_broadcast(spark, sf_dir):
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey",
        "s_name",
        F.col("n_name").alias("nation_name"),
        F.round("s_acctbal", 2).alias("acctbal"),
    )


@register(
    "join_self_conflict",
    "joins",
    oracle="""
        WITH b AS (
            SELECT c_custkey, c_nationkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey ORDER BY c_custkey) AS rn,
                   COUNT(*) OVER (PARTITION BY c_nationkey) AS n
            FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        SELECT b1.c_nationkey AS shared_nation,
               b1.c_custkey AS cust_a, b2.c_custkey AS cust_b,
               CAST(b1.n * (b1.n - 1) / 2 AS BIGINT) AS nation_pair_count
        FROM b b1 JOIN b b2
          ON b1.c_nationkey = b2.c_nationkey AND b1.rn < b2.rn
        WHERE b1.rn <= 5 AND b2.rn <= 5
    """,
    notes=(
        "conflict detection (README.md:15): entities sharing an attribute. "
        "Round-14 scale fix (r13 verdict #1): the full pair enumeration is "
        "Σ_k n_k·(n_k−1)/2 over per-key group sizes — with a FIXED key "
        "domain (25 nations) that output is quadratic in sf (measured "
        "100.8× rows/decade, gate RED at 10.78× wall). The op now returns "
        "the scale-honest answer its own notes prescribed: per-key conflict "
        "PAIR COUNT computed arithmetically from group size (no pair "
        "materialization, one window shuffle) plus the top-K=5 exemplar "
        "pairs per key (row_number cap before the self-join, ≤ K(K−1)/2 "
        "pairs per key). Output is Θ(#keys), wall is the linear scan + one "
        "hash shuffle — decade ratio is scan-bound, not output-bound. At "
        "100 TB the same plan holds: the window shuffle partitions by the "
        "conflict key; a dominant key salts the count (sum of salted "
        "partials) without touching the capped exemplar join."
    ),
)
def join_self_conflict(spark, sf_dir):
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_nationkey")
    )
    wk = Window.partitionBy("c_nationkey")
    b = c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(wk.orderBy("c_custkey")).alias("rn"),
        F.count(F.lit(1)).over(wk).alias("n"),
    ).filter(F.col("rn") <= 5)
    b1, b2 = b.alias("b1"), b.alias("b2")
    return b1.join(
        b2,
        (F.col("b1.c_nationkey") == F.col("b2.c_nationkey"))
        & (F.col("b1.rn") < F.col("b2.rn")),
    ).select(
        F.col("b1.c_nationkey").alias("shared_nation"),
        F.col("b1.c_custkey").alias("cust_a"),
        F.col("b2.c_custkey").alias("cust_b"),
        (F.col("b1.n") * (F.col("b1.n") - 1) / 2).cast("long").alias("nation_pair_count"),
    )


@register(
    "join_theta_range",
    "joins",
    oracle="""
        SELECT p.p_partkey, p.p_retailprice, b.band_id
        FROM part p JOIN (
            SELECT 0 AS band_id, 0.0 AS lo, 500.0 AS hi UNION ALL
            SELECT 1, 500.0, 1000.0 UNION ALL
            SELECT 2, 1000.0, 1500.0 UNION ALL
            SELECT 3, 1500.0, 100000.0
        ) b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    """,
    notes=(
        "non-equi band join; small band table broadcast → BNLJ over 4 rows is "
        "cheap at any scale. Pure fact-fact range joins use the time-bucket "
        "equi-prefix rewrite instead (SURVEY.md §4.3)."
    ),
)
def join_theta_range(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(0, 0.0, 500.0), (1, 500.0, 1000.0), (2, 1000.0, 1500.0), (3, 1500.0, 100000.0)],
        "band_id INT, lo DOUBLE, hi DOUBLE",
    )
    return p.join(
        F.broadcast(bands),
        (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
    ).select("p_partkey", "p_retailprice", "band_id")


@register(
    "join_asof",
    "joins",
    oracle="""
        SELECT o.o_orderkey, o.o_orderdate, le.last_ship
        FROM orders o
        LEFT JOIN (
            SELECT l_orderkey, MAX(l_shipdate) AS last_ship
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_orderkey
        ) le ON le.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    notes=(
        "as-of join (latest event at-or-before t per key, README.md:17): "
        "keyed variant reduces to filter+max-agg+equi-join — no BNLJ. "
        "General as-of (per-row cutoff) uses union+window: see win_first_last."
    ),
)
def join_asof(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = t(spark, sf_dir, "lineitem")
    last_event = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("last_ship"))
    )
    return o.join(last_event, o.o_orderkey == last_event.l_orderkey, "left").select(
        "o_orderkey", "o_orderdate", "last_ship"
    )


@register(
    "join_interval_overlap",
    "joins",
    oracle="""
        SELECT o.o_orderkey, l.l_linenumber
        FROM orders o JOIN lineitem l
          ON o.o_orderkey = l.l_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    """,
    notes=(
        "interval-overlap join (validity windows, README.md:17) with an equi "
        "prefix on the key → SMJ/SHJ + residual range filter, not a cartesian"
    ),
)
def join_interval_overlap(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cond = (
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return o.join(li, cond).select("o_orderkey", "l_linenumber")


@register(
    "join_cross_nl",
    "joins",
    oracle="""
        SELECT r1.r_name AS region_a, r2.r_name AS region_b
        FROM region r1 CROSS JOIN region r2
        WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    notes="explicit cartesian (BNLJ) — only ever used on bounded dims",
)
def join_cross_nl(spark, sf_dir):
    r1 = t(spark, sf_dir, "region").alias("r1")
    r2 = t(spark, sf_dir, "region").alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") != F.col("r2.r_regionkey"))
        .select(F.col("r1.r_name").alias("region_a"), F.col("r2.r_name").alias("region_b"))
    )


@register(
    "join_right",
    "joins",
    oracle="""
        SELECT o.o_orderkey, c.c_custkey, c.c_name
        FROM orders o RIGHT JOIN customer c
          ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    """,
    notes="right outer join preserving all customers (completes the outer-join family)",
)
def join_right(spark, sf_dir):
    o = t(spark, sf_dir, "orders").alias("o")
    c = t(spark, sf_dir, "customer").alias("c")
    cond = (F.col("o.o_custkey") == F.col("c.c_custkey")) & (F.col("o.o_orderstatus") == "P")
    return o.join(c, cond, "right").select("o_orderkey", "c_custkey", "c_name")


@register(
    "report_top_unshipped",
    "reports",
    oracle="""
        SELECT l.l_orderkey,
               FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
    notes=(
        "TPC-H-Q3-shaped shipping-priority report: segment filter pushed to "
        "the customer scan, date filters to orders/lineitem scans, 3-way "
        "join + agg + top-k; the composite plan a product dashboard runs "
        "(README.md:19)"
    ),
)
def report_top_unshipped(spark, sf_dir):
    from mimranalytics_core_spark.functions.numeric import dround

    cut = F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "report_nation_volume",
    "reports",
    oracle="""
        SELECT n.n_name AS nation_name,
               CAST(year(o.o_orderdate) AS INT) AS yr,
               FLOOR(SUM(l.l_extendedprice * (1 - l.l_discount)) * 100 + 0.5) / 100 AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name, year(o.o_orderdate)
    """,
    notes=(
        "TPC-H-Q9-shaped supplier-nation volume rollup: fact⋈fact shuffle on "
        "orderkey, dims broadcast, per-(nation,year) two-phase agg — the "
        "multi-join rollup shape of an audit report (README.md:19)"
    ),
)
def report_nation_volume(spark, sf_dir):
    from mimranalytics_core_spark.functions.numeric import dround

    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "join_skew_salted",
    "joins",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(SUM(l_quantity) * 100 + 0.5) / 100 AS qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    notes=(
        "skew-mitigated equi-join (SURVEY.md §4.3): the hot side's shuffle "
        "key is salted into 8 sub-keys and the other side replicated 8x "
        "(functions/skew.salted_join), spreading a pathological key over 8 "
        "reducers; the oracle is the plain join, proving salting is "
        "semantics-preserving. This is the explicit fallback for skew AQE "
        "cannot fix (broadcast-ineligible, known-pathological keys)"
    ),
)
def join_skew_salted(spark, sf_dir):
    from mimranalytics_core_spark.functions.numeric import dround
    from mimranalytics_core_spark.functions.skew import salted_join

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(li, o, "l_orderkey", "o_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        dround(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "cdc_merge_upsert",
    "cdc",
    oracle="""
        WITH upd AS (
            SELECT o_orderkey,
                   FLOOR(o_totalprice * 1.1 * 100 + 0.5) / 100 AS o_totalprice,
                   'updated' AS src
            FROM orders WHERE o_orderkey % 97 = 0
        ),
        ins AS (
            SELECT o_orderkey + 1000000000 AS o_orderkey,
                   FLOOR(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
                   'inserted' AS src
            FROM orders WHERE o_orderkey % 101 = 0
        ),
        kept AS (
            SELECT o.o_orderkey,
                   FLOOR(o.o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
                   'kept' AS src
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.o_orderkey = o.o_orderkey)
        )
        SELECT * FROM kept
        UNION ALL SELECT * FROM upd
        UNION ALL SELECT * FROM ins
    """,
    notes=(
        "MERGE INTO / CDC-apply realized Spark-native (no table format in "
        "the container, so the MERGE is the plan, not the metadata op): "
        "change set = deterministic updates (key % 97: price uplift) + "
        "inserts (key % 101, offset key space); merged = target anti-join "
        "changes (WHEN MATCHED THEN UPDATE) union change rows (WHEN NOT "
        "MATCHED THEN INSERT). At 100 TB both the anti-join and the union "
        "hash on the table's bucket key, so a bucketed target makes the "
        "apply co-located — the Delta/Iceberg MERGE execution shape"
    ),
)
def cdc_merge_upsert(spark, sf_dir):
    from mimranalytics_core_spark.functions.numeric import dround

    o = t(spark, sf_dir, "orders")
    upd = o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        dround(F.col("o_totalprice") * 1.1, 2).alias("o_totalprice"),
        F.lit("updated").alias("src"),
    )
    ins = o.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        dround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        F.lit("inserted").alias("src"),
    )
    kept = (
        o.join(upd.select("o_orderkey"), "o_orderkey", "left_anti")
        .select(
            "o_orderkey",
            dround(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.lit("kept").alias("src"),
        )
    )
    return kept.unionByName(upd).unionByName(ins)


@register(
    "join_asof_nearest",
    "joins",
    oracle="""
        WITH err AS (
            SELECT user_id, event_id AS err_id, ts AS err_ts
            FROM events WHERE event_type = 'error'
        ),
        pur AS (
            SELECT user_id, event_id AS pur_id, ts AS pur_ts
            FROM events WHERE event_type = 'purchase'
        ),
        ranked AS (
            SELECT e.user_id, e.err_id, p.pur_id,
                   ABS(date_diff('microsecond', e.err_ts, p.pur_ts)) AS gap_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.err_id
                       ORDER BY ABS(date_diff('microsecond', e.err_ts, p.pur_ts)),
                                p.pur_id) AS rn
            FROM err e JOIN pur p ON p.user_id = e.user_id
        )
        SELECT user_id, err_id, pur_id,
               CAST(gap_us // 1000000 AS BIGINT) AS gap_seconds
        FROM ranked WHERE rn = 1
    """,
    notes=(
        "NEAREST-match asof join (join_asof is the backward/most-recent "
        "form): each error event pairs with its temporally closest "
        "purchase by the same user, either direction — the event-"
        "correlation shape (incident ↔ nearest transaction). Per-key "
        "candidate join + rank; at 100 TB the candidate set is bounded by "
        "bucketing both sides on user and windowing candidates to a time "
        "horizon (here per-user streams are small by fixture design). "
        "Exact-microsecond gaps keep both engines tie-identical"
    ),
)
def join_asof_nearest(spark, sf_dir):
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("pur_id"),
        F.col("ts").alias("pur_ts"),
    )
    gap_us = F.abs(F.expr("timestampdiff(MICROSECOND, err_ts, pur_ts)"))
    w = Window.partitionBy("err_id").orderBy(F.col("gap_us").asc(), F.col("pur_id").asc())
    return (
        err.join(pur, err.user_id == pur.p_user)
        .select("user_id", "err_id", "pur_id", gap_us.alias("gap_us"))
        .select("user_id", "err_id", "pur_id", "gap_us", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "err_id",
            "pur_id",
            F.floor(F.col("gap_us") / F.lit(1000000)).cast("long").alias("gap_seconds"),
        )
    )


@register(
    "join_range_bucketed",
    "joins",
    oracle="""
        SELECT o.o_orderkey, l.l_orderkey, l.l_linenumber
        FROM orders o JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        WHERE o.o_custkey < 10
    """,
    notes=(
        "PURE range join (no equi prefix — 'all shipments within a week of "
        "this order', across orders) executed via the documented 100 TB "
        "mitigation (SURVEY.md §4.3.2): both sides bucketed to the window "
        "width (7 days), orders exploded to the 2 covering buckets, "
        "EQUI-join on bucket + residual range filter. Each matching pair "
        "lands in exactly one bucket (the lineitem side has one bucket), "
        "so no dedup shuffle is needed. Turns the O(n*m) BNLJ Spark would "
        "otherwise pick into per-bucket hash joins — the plan assertion in "
        "tests/test_plans.py checks no CartesianProduct/BNLJ survives. "
        "Oracle is the naive range join, proving the rewrite exact"
    ),
)
def join_range_bucketed(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 10)
    li = t(spark, sf_dir, "lineitem")
    epoch = F.lit("1992-01-01").cast("date")
    ob = o.select(
        "o_orderkey",
        "o_orderdate",
        F.floor(F.datediff("o_orderdate", epoch) / 7).alias("b0"),
    ).select(
        "o_orderkey",
        "o_orderdate",
        F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("bucket"),
    )
    lb = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.floor(F.datediff("l_shipdate", epoch) / 7).alias("bucket"),
    )
    return (
        ob.join(lb, "bucket")
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (F.col("l_shipdate") < F.date_add("o_orderdate", 7))
        )
        .select("o_orderkey", "l_orderkey", "l_linenumber")
    )


@register(
    "join_fuzzy_name_blocked",
    "joins",
    oracle="""
        SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
               a.c_name AS a_name, b.c_name AS b_name,
               CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS lev
        FROM customer a JOIN customer b
          ON substr(a.c_name, 1, length(a.c_name) - 2)
             = substr(b.c_name, 1, length(b.c_name) - 2)
         AND a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    notes=(
        "BLOCKED fuzzy-name join (F3 conflict detection, README.md:15 — "
        "near-identical entity names are the classic duplicate-registration "
        "signal): candidate pairs equi-joined on a blocking key (name minus "
        "its last 2 chars) then verified with levenshtein <= 1 — the "
        "candidate-generation-then-verify shape shared with MinHash/LSH; "
        "never all-pairs (block size is bounded by the key's tail "
        "cardinality, here <= 100). At 100 TB the blocking key would be a "
        "phonetic/normalized form; the plan shape — hash join on block + "
        "residual edit-distance filter — is identical"
    ),
)
def join_fuzzy_name_blocked(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    block = F.expr("substring(c_name, 1, length(c_name) - 2)")
    a = c.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        block.alias("blk"),
    )
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        block.alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("a_key") < F.col("b_key"))
        .filter(F.levenshtein("a_name", "b_name") <= 1)
        .select(
            "a_key",
            "b_key",
            "a_name",
            "b_name",
            F.levenshtein("a_name", "b_name").cast("int").alias("lev"),
        )
    )


@register(
    "pipeline_entity_resolution",
    "pipeline",
    oracle="""
        WITH RECURSIVE pairs AS (
            SELECT a.c_custkey AS a, b.c_custkey AS b
            FROM customer a JOIN customer b
              ON substr(a.c_name, 1, length(a.c_name) - 2)
                 = substr(b.c_name, 1, length(b.c_name) - 2)
             AND a.c_custkey < b.c_custkey
            WHERE levenshtein(a.c_name, b.c_name) <= 1
        ),
        e2 AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        reach(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM e2)
            UNION
            SELECT e2.a, r.lab FROM reach r JOIN e2 ON e2.b = r.node
        ),
        lbl AS (SELECT node, MIN(lab) AS canon FROM reach GROUP BY node)
        SELECT c.c_custkey,
               COALESCE(lbl.canon, c.c_custkey) AS canonical_key,
               CAST(COALESCE(COUNT(*) OVER (PARTITION BY COALESCE(lbl.canon,
                                                                  c.c_custkey)),
                             1) AS BIGINT) AS cluster_size
        FROM customer c LEFT JOIN lbl ON c.c_custkey = lbl.node
    """,
    notes=(
        "end-to-end ENTITY RESOLUTION (F3, README.md:15 — the dedup every "
        "registry product ships): blocked fuzzy pairs (exactly the "
        "join_fuzzy_name_blocked stage) -> connected components over the "
        "pair graph (min-label Pregel, transitive closure of same-entity-"
        "ness) -> canonical id = MIN custkey per cluster, singletons kept "
        "as their own canonical entity. The pair graph holds only entities "
        "WITH a candidate duplicate; the full-population frame arrives via "
        "one left join. Same composition shape as dedup_canonical_docs, "
        "over the entity table — oracle is the recursive min-label closure "
        "of the identical pair set"
    ),
)
def pipeline_entity_resolution(spark, sf_dir):
    from mimranalytics_core_spark.functions.graph_algos import connected_components

    c = t(spark, sf_dir, "customer")
    pairs = join_fuzzy_name_blocked(spark, sf_dir).select("a_key", "b_key")
    # fixed-round closure, no convergence-check jobs: pair edges live only
    # WITHIN a blocking key (the join is on blk), and any two names in a
    # block are <= 2 single-char edits apart via a shared intermediate, so
    # every cluster has diameter <= 2 -> min-label propagation settles in
    # 2 rounds; 4 is a 2x margin (the bound holds at any SF because the
    # name format is fixed-width)
    comp = connected_components(
        pairs.select(F.col("a_key").alias("src"), F.col("b_key").alias("dst")),
        max_iter=4,
        check_convergence=False,
    )
    base = c.select("c_custkey").join(
        comp.select(F.col("node").alias("c_custkey"), F.col("component")),
        "c_custkey",
        "left",
    ).select(
        "c_custkey",
        F.coalesce("component", "c_custkey").alias("canonical_key"),
    )
    wc = Window.partitionBy("canonical_key")
    return base.select(
        "c_custkey",
        "canonical_key",
        F.count("*").over(wc).cast("bigint").alias("cluster_size"),
    )


@register(
    "join_null_safe",
    "joins",
    oracle="""
        WITH a AS (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
                   FROM customer),
        b AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
                     CAST(COUNT(*) AS BIGINT) AS seg_size
              FROM customer GROUP BY 1)
        SELECT a.c_custkey, a.seg, b.seg_size
        FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
    """,
    notes=(
        "NULL-safe equality join (Spark's <=> / eqNullSafe vs SQL's IS "
        "NOT DISTINCT FROM): the suppressed segment becomes NULL on both "
        "sides and still matches — a plain equi join would silently drop "
        "those rows, the classic dimension-with-unknown-bucket bug. "
        "Catalyst plans null-safe equality as a HASH join key (not a "
        "theta fallback), so the scale shape is identical to join_inner_hash"
    ),
)
def join_null_safe(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    a = c.select("c_custkey", seg.alias("seg"))
    b = c.select(seg.alias("seg_b")).groupBy("seg_b").agg(
        F.count("*").cast("bigint").alias("seg_size")
    )
    return a.join(b, a.seg.eqNullSafe(b.seg_b)).select("c_custkey", "seg", "seg_size")


@register(
    "join_bucketed_colocated",
    "joins",
    oracle="""
        SELECT o.o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
    """,
    notes=(
        "co-located BUCKETED fact-to-fact join — THE 100 TB layout move "
        "(SCALE.md; tests/test_bucketing.py carries the no-Exchange plan "
        "evidence): both facts are written bucketBy(8, orderkey) + sortBy "
        "into warehouse tables once per sf_dir, and the join then reads "
        "Bucketed: true with NO shuffle Exchange on either side — at real "
        "scale neither fact side broadcasts, which is exactly when "
        "bucketing pays. The declared result aggregates revenue in exact "
        "integer cents per status; the oracle runs the plain (unbucketed) "
        "join, proving layout changes nothing semantically"
    ),
)
def join_bucketed_colocated(spark, sf_dir):
    import os

    import shutil

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_").replace("-", "_")
    li_tbl, o_tbl = f"li_bkt_{tag}", f"o_bkt_{tag}"
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if not spark.catalog.tableExists(li_tbl):
        # fresh sessions use an in-memory catalog: a location left by a
        # previous session isn't droppable via SQL — clear it directly
        # (the test_bucketing fixture's lesson)
        shutil.rmtree(os.path.join(warehouse, li_tbl), ignore_errors=True)
        (
            t(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice")
            .write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable(li_tbl)
        )
    if not spark.catalog.tableExists(o_tbl):
        shutil.rmtree(os.path.join(warehouse, o_tbl), ignore_errors=True)
        (
            t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus")
            .write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable(o_tbl)
        )
    li = spark.table(li_tbl)
    o = spark.table(o_tbl)
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(cents).cast("bigint").alias("rev_cents"),
        )
    )
