"""Product-level API: the reference's backend surface re-expressed on Spark.

The reference exposes its capabilities through a Python backend
(reference README.md:26, FastAPI): interactive expansion (README.md:11), UBO
reports (README.md:13), conflict detection (README.md:15), the Time-Slider
(README.md:17), audit export (README.md:19). This module is that surface —
each function takes a SparkSession + sf_dir (the dataset root) and returns a
DataFrame a JSON/HTTP layer would serialize. A user of the reference finds
every product operation here, backed by the distributed operators instead of
Neo4j+NetworkX.

All functions are thin compositions over ``catalog`` edge views and
``functions/graph_algos`` — no new execution logic, so everything inherits
the engine's oracle-tested semantics and scale posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimranalytics_core_spark import catalog
from mimranalytics_core_spark.functions.graph_algos import (
    betweenness,
    bfs_distances,
    connected_components,
    pagerank,
    ubo_closure,
    undirect,
)
from mimranalytics_core_spark.operators._base import tables


def expand_neighborhood(
    spark: SparkSession, sf_dir: str, entities: list[str], hops: int = 2
) -> DataFrame:
    """Interactive relationship expansion (README.md:11): the ≤k-hop
    undirected neighborhood of a seed entity set → (node, hop)."""
    tables(spark, sf_dir)
    edges = undirect(catalog.hierarchy_edges(spark, sf_dir))
    seeds = spark.createDataFrame([(e,) for e in entities], "node STRING")
    return bfs_distances(edges, seeds, max_depth=hops).withColumnRenamed("dist", "hop")


def ubo_report(
    spark: SparkSession, sf_dir: str, threshold: float = 0.25, max_depth: int = 6
) -> DataFrame:
    """UBO identification (README.md:13): owners whose effective (multi-path,
    depth-bounded) ownership of an entity meets the threshold."""
    tables(spark, sf_dir)
    edges = catalog.hierarchy_edges(spark, sf_dir)
    owners = edges.filter(F.col("rel_type") == "customer_of").select("src").distinct()
    ubo = ubo_closure(edges, max_depth=max_depth, threshold=threshold)
    return (
        ubo.join(owners, ubo.owner == owners.src, "left_semi")
        .select(
            "owner",
            "entity",
            F.round("effective_ownership", 6).alias("effective_ownership"),
        )
        .orderBy(F.col("effective_ownership").desc(), F.col("owner").asc(), F.col("entity").asc())
    )


def conflict_report(spark: SparkSession, sf_dir: str, max_levenshtein: int = 3) -> DataFrame:
    """Conflict detection (README.md:15): entity pairs sharing an attribute
    (same nation = shared-registered-address analog) whose names are also
    near-identical — the duplicate-entity / hidden-link signal."""
    tbls = tables(spark, sf_dir)
    c = tbls["customer"]
    a = c.alias("a")
    b = c.alias("b")
    lev = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"))
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter(lev <= max_levenshtein)
        .select(
            F.col("a.c_custkey").alias("entity_a"),
            F.col("b.c_custkey").alias("entity_b"),
            F.col("a.c_nationkey").alias("shared_attribute"),
            lev.alias("name_distance"),
        )
    )


def circular_ownership(spark: SparkSession, sf_dir: str, max_len: int = 4) -> DataFrame:
    """Circular-ownership loops (README.md:15) on the trade-credit digraph:
    entities with a directed walk back to themselves within ``max_len``."""
    from mimranalytics_core_spark.operators.graph import TRADE_CREDIT_SQL

    tables(spark, sf_dir)
    return spark.sql(
        f"""
        WITH RECURSIVE {TRADE_CREDIT_SQL},
        walk(origin, node, depth) AS (
            SELECT src AS origin, dst AS node, 1 AS depth FROM tc_edges
            UNION ALL
            SELECT w.origin, e.dst, w.depth + 1
            FROM walk w JOIN tc_edges e ON e.src = w.node
            WHERE w.depth < {int(max_len)} AND w.node <> w.origin
        )
        SELECT DISTINCT origin AS entity_on_cycle FROM walk WHERE node = origin
        """
    )


def snapshot_asof(spark: SparkSession, sf_dir: str, as_of: str) -> DataFrame:
    """Time-Slider (README.md:17): the interaction graph as of a timestamp."""
    ev = tables(spark, sf_dir)["events"]
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_seen"))
        .filter(F.col("first_seen") <= F.lit(as_of).cast("timestamp_ntz"))
    )


def structure_diff(spark: SparkSession, sf_dir: str, t1: str, t2: str) -> DataFrame:
    """Time-Slider diff (README.md:17): edges added/removed between t1 and t2
    → (user_id, event_type, change ∈ {added, removed})."""
    s1 = snapshot_asof(spark, sf_dir, t1).select("user_id", "event_type")
    s2 = snapshot_asof(spark, sf_dir, t2).select("user_id", "event_type")
    added = s2.subtract(s1).withColumn("change", F.lit("added"))
    removed = s1.subtract(s2).withColumn("change", F.lit("removed"))
    return added.unionByName(removed)


def centrality(spark: SparkSession, sf_dir: str, kind: str = "pagerank") -> DataFrame:
    """Centrality (README.md:28): pagerank | degree | component | betweenness."""
    tables(spark, sf_dir)
    edges = catalog.hierarchy_edges(spark, sf_dir)
    if kind == "pagerank":
        return pagerank(edges.select("src", "dst"), iters=10).select(
            "node", F.round("rank", 6).alias("score")
        )
    if kind == "component":
        return connected_components(edges.select("src", "dst"))
    if kind == "betweenness":
        und = undirect(edges)
        sources = (
            und.select("src")
            .filter(F.col("src").startswith("n:") | F.col("src").startswith("r:"))
            .distinct()
            .select(F.col("src").alias("node"))
        )
        return betweenness(und, sources).withColumnRenamed("betweenness", "score")
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return out_deg.join(in_deg, "node", "full").select(
        "node",
        (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias("score"),
    )


def match_path(
    spark: SparkSession,
    sf_dir: str,
    edge_types: list[str] | None = None,
    min_hops: int = 1,
    max_hops: int = 3,
    src_pred: str | None = None,
    as_of: str | None = None,
    carry_weight: bool = False,
) -> DataFrame:
    """Declarative graph-pattern entry point — the Cypher-shaped surface.

    ``match_path(["owns_stake", "supplier_of"], 1, 4)`` is the analog of
    ``MATCH (a)-[:OWNS_STAKE|SUPPLIER_OF*1..4]->(b)`` (reference README.md:25
    — the store speaks Cypher; every semantic is already covered by the §2.9
    operators, this builder gives reference users the pattern-shaped entry
    point; :mod:`mimranalytics_core_spark.cypher` parses actual Cypher
    strings into these args). Returns (src, dst, hops[, path_weight]).

    Semantics: **bounded walk closure**, not Cypher trail semantics —
    edges and nodes may repeat along a path (matching the UBO/reach
    operators and their oracles), whereas Cypher variable-length patterns
    enforce relationship uniqueness. The two coincide on DAG-shaped data
    like the ownership hierarchy; on cyclic graphs hop counts and
    carry_weight sums here include edge-repeating walks Cypher excludes.

    - ``edge_types``: restrict traversed relationship types (None = any).
    - ``min_hops``/``max_hops``: variable-length bound (``*min..max``).
    - ``src_pred``: SQL boolean over the start node id, e.g.
      ``"src LIKE 'c:%'"`` — the ``(a:Label {…})`` filter.
    - ``as_of``: Time-Slider — traverse only edges whose
      [valid_from, valid_to] contains the timestamp (validity-carrying edge
      table; tier-1 ownership weights renormalize within the snapshot).
    - ``carry_weight``: multiply edge weights along the path and sum over
      parallel paths (the UBO closure shape).

    Compiles to the same bounded iterative-join plan as the recursive-CTE
    operators: ``max_hops`` self-joins on the (pre-filtered, narrow) edge
    list — every hop is one hash shuffle on the frontier key; the type and
    as-of filters prune edges BEFORE the first join.
    """
    tables(spark, sf_dir)
    if as_of is not None:
        e = catalog.temporal_ownership_edges(spark, sf_dir)
        at = F.lit(as_of).cast("timestamp_ntz")
        e = e.filter((F.col("valid_from") <= at) & (at <= F.col("valid_to")))
        # ownership fractions are shares of the snapshot-valid volume
        from pyspark.sql import Window

        tot = F.sum(F.when(F.col("rel_type") == "owns_stake", F.col("weight"))).over(
            Window.partitionBy("src")
        )
        e = e.withColumn(
            "weight",
            F.when(F.col("rel_type") == "owns_stake", F.col("weight") / tot).otherwise(
                F.col("weight")
            ),
        )
    else:
        e = catalog.hierarchy_edges(spark, sf_dir)
    if edge_types is not None:
        e = e.filter(F.col("rel_type").isin(list(edge_types)))
    e = e.select("src", "dst", "weight")

    if not 1 <= min_hops <= max_hops:
        raise ValueError(f"need 1 <= min_hops <= max_hops, got {min_hops}..{max_hops}")

    frontier = e.select(
        "src", "dst", F.lit(1).alias("hops"), F.col("weight").alias("path_weight")
    )
    if src_pred is not None:
        frontier = frontier.filter(F.expr(src_pred))
    levels = [frontier]
    nxt = e.select(
        F.col("src").alias("__m"), F.col("dst").alias("__d"), F.col("weight").alias("__w")
    )
    for _ in range(max_hops - 1):
        frontier = (
            frontier.join(nxt, frontier.dst == F.col("__m"))
            .select(
                "src",
                F.col("__d").alias("dst"),
                (F.col("hops") + 1).alias("hops"),
                (F.col("path_weight") * F.col("__w")).alias("path_weight"),
            )
        )
        levels.append(frontier)

    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    out = out.filter(F.col("hops") >= min_hops)
    if carry_weight:
        return out.groupBy("src", "dst").agg(
            F.min("hops").alias("hops"),
            F.round(F.sum("path_weight"), 6).alias("path_weight"),
        )
    return out.select("src", "dst", "hops").distinct()


def cypher(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Execute a Cypher MATCH string (the migrating-user entry point —
    reference README.md:25). Thin delegate to
    :func:`mimranalytics_core_spark.cypher.run`; see that module for the
    supported subset and the walk-vs-trail semantics note."""
    from mimranalytics_core_spark import cypher as _cypher

    return _cypher.run(spark, sf_dir, query)


def export_audit_report(
    spark: SparkSession, sf_dir: str, df: DataFrame, path: str, fmt: str = "csv"
) -> None:
    """Audit-ready export (README.md:19): graph/analytic result → file
    artifact via the engine sink."""
    from mimranalytics_core_spark.sources.io import export_report

    export_report(df, path, fmt=fmt, single_file=True)


def export_graph_viz(
    spark: SparkSession,
    sf_dir: str,
    entities: list[str],
    hops: int = 2,
    path: str | None = None,
) -> DataFrame:
    """Graph-visualization payload (README.md:19): the ≤``hops`` undirected
    neighborhood of ``entities`` as node rows (kind='node', a=id, hop) plus
    the directed edges with both endpoints inside it (kind='edge', a=src,
    b=dst, hop=-1). When ``path`` is given the frame is also written as a
    JSON artifact (the serialization a viz front-end consumes)."""
    from mimranalytics_core_spark.functions.graph_algos import bfs_distances, undirect
    from mimranalytics_core_spark.sources.io import export_report

    tables(spark, sf_dir)
    edges = catalog.hierarchy_edges(spark, sf_dir).select("src", "dst")
    seeds = spark.createDataFrame([(e,) for e in entities], "node STRING")
    nodes = bfs_distances(undirect(edges), seeds, max_depth=hops)
    keep = nodes.select("node")
    sub_edges = (
        edges.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .distinct()
    )
    payload = nodes.select(
        F.lit("node").alias("kind"),
        F.col("node").alias("a"),
        F.lit("").alias("b"),
        F.col("dist").cast("int").alias("hop"),
    ).unionByName(
        sub_edges.select(
            F.lit("edge").alias("kind"),
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.lit(-1).cast("int").alias("hop"),
        )
    )
    if path is not None:
        export_report(payload, path, fmt="json", partition_by=["kind"])
    return payload
