"""Table catalog: load the driver parquet tables and derived graph views.

Data model (SURVEY.md §1.2): relational star schema + an events stream table
+ documents/embeddings for the LLM-pipeline operators. Graph operators run on
*derived* vertex/edge DataFrames built here (FIXTURES.md "Derived graph
views") — the corporate-ownership analog of the reference's property graph
(reference README.md:25 declares Neo4j/Memgraph; we model nodes/edges as
DataFrames, GraphFrames-convention).

Single conversion point for the ns-timestamp gotcha: ``events.ts`` is read as
bigint epoch-nanos (session conf ``nanosAsLong``) and converted to a proper
timestamp here, floor-truncated to microseconds exactly like DuckDB's native
read of the same file (FIXTURES.md).

Scale posture: loads are lazy DataFrames (no collect); at 100 TB these would
be partitioned/bucketed tables behind the same names — every operator sees
only the DataFrame, so the storage layout can change freely underneath.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table, applying engine-level column fixes."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if dict(df.dtypes).get("ts") == "bigint":
            # ns-epoch → µs timestamp; integer DIV (never float /: epoch-nanos
            # exceed double's 53-bit mantissa) floor-matches DuckDB's ns→µs read.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if "props" in df.columns:
            # Catalog-level VariantType property bag (README.md:25 dynamic
            # props): the JSON text is parsed ONCE here; every variant-path
            # consumer reads typed fields via variant_get with no per-query
            # re-parse. Lazy + column-pruned — operators that never touch
            # props_v pay nothing (plan-asserted in tests/test_plans.py).
            df = df.withColumn("props_v", F.parse_json("props"))
    return df


def load(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all tables and register them as temp views.

    Registered views let every operator choose DataFrame or SQL form
    (lifecycle entries E1/E2, SURVEY.md §3.2) over identical inputs.
    """
    tables = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        tables[name] = df
    return tables


# ---------------------------------------------------------------------------
# Derived graph views (FIXTURES.md §"Derived graph views")
# ---------------------------------------------------------------------------

def hierarchy_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed, weighted edge list of the 3-tier ownership-tree analog.

    customer→nation, supplier→nation, nation→region.  Node ids are
    namespaced strings (``c:17``, ``n:3``, ``r:0``, ``s:5``) so the three key
    spaces can't collide.  ``weight`` models an ownership fraction: each
    customer's share of its nation's total positive acctbal (UBO math needs
    multiplicative weights along paths, reference README.md:13).

    Scale: built by narrow projections + a single small agg per tier; the
    nation/region tiers are tiny (broadcastable) at any scale factor.
    """
    customer = spark.table("customer")
    supplier = spark.table("supplier")
    nation = spark.table("nation")

    cust_pos = customer.select(
        "c_custkey",
        "c_nationkey",
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal"),
    )
    nat_tot = cust_pos.groupBy("c_nationkey").agg(F.sum("bal").alias("tot"))
    c_edges = (
        cust_pos.join(nat_tot, "c_nationkey")
        .select(
            F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
            F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
            F.lit("customer_of").alias("rel_type"),
            F.when(F.col("tot") > 0, F.col("bal") / F.col("tot")).otherwise(0.0).alias("weight"),
        )
    )
    s_edges = supplier.select(
        F.concat(F.lit("s:"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("s_nationkey")).alias("dst"),
        F.lit("supplier_of").alias("rel_type"),
        F.lit(1.0).alias("weight"),
    )
    n_edges = nation.select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
        F.lit("nation_of").alias("rel_type"),
        F.lit(1.0).alias("weight"),
    )
    return c_edges.unionByName(s_edges).unionByName(n_edges)


def hierarchy_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-attribute table for the hierarchy graph:
    (id, label, name, acctbal, mktsegment, nationkey, regionkey).

    The property side of the property-graph model (reference README.md:25 —
    Neo4j nodes carry labels + properties): namespaced ids matching
    :func:`hierarchy_edges`, the node's entity label, and its display name.
    Round-7 widened the per-label surface with ``acctbal`` (numeric —
    customer + supplier balances; Neo4j semantics: a property absent on a
    label reads as null, so nation/region carry typed nulls) and
    ``mktsegment`` (customer-only string). Cypher property access
    (``n.name``, ``n.acctbal``, ``n.nationkey``) resolves through this view
    via an equi-join. Round-11 widened it again with the natural FK columns
    a migrating user filters on first — ``nationkey`` (customer, supplier,
    nation) and ``regionkey`` (nation, region), typed long, null off-label.
    Scale: four narrow projections + union — no shuffle; the
    join against it is a plain equi-join on the node id that AQE sizes
    (the nation/region tiers are broadcast-small at any SF).
    """
    customer = spark.table("customer")
    supplier = spark.table("supplier")
    nation = spark.table("nation")
    region = spark.table("region")
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    return (
        customer.select(
            F.concat(F.lit("c:"), F.col("c_custkey")).alias("id"),
            F.lit("customer").alias("label"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("c_nationkey").cast("long").alias("nationkey"),
            null_l.alias("regionkey"),
        )
        .unionByName(
            supplier.select(
                F.concat(F.lit("s:"), F.col("s_suppkey")).alias("id"),
                F.lit("supplier").alias("label"),
                F.col("s_name").alias("name"),
                F.col("s_acctbal").cast("double").alias("acctbal"),
                null_s.alias("mktsegment"),
                F.col("s_nationkey").cast("long").alias("nationkey"),
                null_l.alias("regionkey"),
            )
        )
        .unionByName(
            nation.select(
                F.concat(F.lit("n:"), F.col("n_nationkey")).alias("id"),
                F.lit("nation").alias("label"),
                F.col("n_name").alias("name"),
                null_d.alias("acctbal"),
                null_s.alias("mktsegment"),
                F.col("n_nationkey").cast("long").alias("nationkey"),
                F.col("n_regionkey").cast("long").alias("regionkey"),
            )
        )
        .unionByName(
            region.select(
                F.concat(F.lit("r:"), F.col("r_regionkey")).alias("id"),
                F.lit("region").alias("label"),
                F.col("r_name").alias("name"),
                null_d.alias("acctbal"),
                null_s.alias("mktsegment"),
                null_l.alias("nationkey"),
                F.col("r_regionkey").cast("long").alias("regionkey"),
            )
        )
    )


def temporal_ownership_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed, weighted ownership edges carrying [valid_from, valid_to]
    validity intervals as primary data (Time-Slider over the ownership graph
    itself, reference README.md:17+13).

    Tiers: customer→supplier (owns_stake; validity = the span of their order
    activity, weight = the customer's volume share — renormalize within a
    snapshot after the as-of filter), supplier→nation (supplier_of; validity
    = the supplier's shipping span), nation→region (nation_of; timeless —
    open interval). Mirrors the shared recursive-CTE text in
    operators/graph.py::_UBO_ASOF_SQL.

    Scale: one grouped agg per tier; validity columns make the edge table
    date-partitionable so as-of filters prune files before any join.
    """
    orders = spark.table("orders")
    lineitem = spark.table("lineitem")
    supplier = spark.table("supplier")
    nation = spark.table("nation")

    far_past = F.lit("1900-01-01 00:00:00").cast("timestamp_ntz")
    far_future = F.lit("9999-01-01 00:00:00").cast("timestamp_ntz")

    cs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(
            F.min("o_orderdate").alias("valid_from"),
            F.max("o_orderdate").alias("valid_to"),
            F.sum("l_extendedprice").alias("vol"),
        )
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
            F.lit("owns_stake").alias("rel_type"),
            F.col("vol").alias("weight"),  # renormalize per-src post-filter
            "valid_from",
            "valid_to",
        )
    )
    sn = (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .groupBy("l_suppkey", "s_nationkey")
        .agg(F.min("l_shipdate").alias("valid_from"), F.max("l_shipdate").alias("valid_to"))
        .select(
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("n:"), F.col("s_nationkey")).alias("dst"),
            F.lit("supplier_of").alias("rel_type"),
            F.lit(1.0).alias("weight"),
            "valid_from",
            "valid_to",
        )
    )
    nr = nation.select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
        F.lit("nation_of").alias("rel_type"),
        F.lit(1.0).alias("weight"),
        far_past.alias("valid_from"),
        far_future.alias("valid_to"),
    )
    return cs.unionByName(sn).unionByName(nr)


def trade_credit_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed edge list of the bounded trade-credit digraph — the engine's
    CYCLIC fixture (mirrors operators/graph.py::TRADE_CREDIT_SQL exactly).

    customer→supplier (``buys_from``: the customer purchased from the
    supplier) and supplier→customer (``co_located``: same nation — the
    local-supply relationship), both restricted to custkey/suppkey < 50 so
    path enumeration stays subgraph-sized at every SF (the bound is part of
    the declared semantics, as for graph_cycles). Cycles = customers buying
    from suppliers in their own nation — the circular-ownership analog
    (reference README.md:15). This is the graph Cypher trail semantics and
    shortestPath() are exercised on: walk vs trail closure only differ in
    the presence of cycles.
    """
    orders = spark.table("orders")
    lineitem = spark.table("lineitem")
    supplier = spark.table("supplier")
    customer = spark.table("customer")
    buys = (
        orders.filter(F.col("o_custkey") < 50)
        .join(lineitem.filter(F.col("l_suppkey") < 50), F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .select("src", "dst", F.lit("buys_from").alias("rel_type"), F.lit(1.0).alias("weight"))
    )
    colo = (
        supplier.filter(F.col("s_suppkey") < 50)
        .join(
            customer.filter(F.col("c_custkey") < 50),
            F.col("s_nationkey") == F.col("c_nationkey"),
        )
        .select(
            F.concat(F.lit("s:"), F.col("s_suppkey")).alias("src"),
            F.concat(F.lit("c:"), F.col("c_custkey")).alias("dst"),
        )
        .distinct()
        .select("src", "dst", F.lit("co_located").alias("rel_type"), F.lit(1.0).alias("weight"))
    )
    return buys.unionByName(colo)


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part—supplier co-occurrence edges from lineitem.

    The tripartite order—part—supplier multigraph collapsed to its
    part↔supplier projection (distinct pairs), used by common-neighbor /
    triangle / component ops.  Distinct is a single shuffle on the pair key.
    """
    li = spark.table("lineitem")
    return (
        li.select(
            F.concat(F.lit("p:"), F.col("l_partkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
