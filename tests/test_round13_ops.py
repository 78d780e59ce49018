"""Round-13 guard tests.

Covers the r12 ADVICE items (cross-clause NULL-join-key row drop; literal
display names for auto-aliased RETURN items; sanitized error messages;
shuffle-partitions conf restore symmetry) and the r12 VERDICT #1 feature:
composable path expressions — count(p), nested nodes(p)/relationships(p)/
length(p), and bare `UNWIND nodes(p) AS z` after MATCH.
"""

import pytest

from mimranalytics_core_spark import api
from mimranalytics_core_spark.cypher import CypherSyntaxError

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


# ---- 1. cross-clause joins must key on VARIABLE columns only (r12 ADVICE
# high: pre-attached var__prop helper columns carried NULLs — acctbal on
# nation/region — into the join keys, silently dropping matching rows) ------


def test_cross_clause_null_prop_rows_survive(spark):
    # 190 hierarchy nodes at sf0.001 × 5 regions × 5 regions = 4750 rows;
    # only the 160 customer+supplier nodes have acctbal → k = 160 × 25.
    # The pre-fix engine returned n = 4000 (NULL acctbal rows dropped).
    row = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (a), (b:Region) MATCH (a), (c:Region) "
        "RETURN count(a.acctbal) AS k, count(*) AS n",
    ).collect()[0]
    assert (row.k, row.n) == (4000, 4750)


def test_cross_clause_shared_prop_read_still_resolves(spark):
    # the same variable reads the same property in BOTH clauses — the
    # duplicate helper column from the second clause frame is dropped, not
    # joined on, and the value still projects
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (a:Region), (b:Region) WHERE a.regionkey = b.regionkey "
        "MATCH (a), (c:Nation) WHERE c.regionkey = a.regionkey "
        "RETURN a.name AS rname, count(*) AS n ORDER BY rname",
    ).collect()
    assert len(rows) == 5 and all(r.n == 5 for r in rows)


# ---- 2. composable path expressions (r12 VERDICT #1) ----------------------


def test_count_path_variable(spark):
    # count(p) counts matched paths — one per-path row each (Neo4j)
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n:Nation) "
        "RETURN count(p) AS n",
    ).collect()
    assert rows[0].n == 150


def test_count_distinct_path_variable(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n:Nation) "
        "RETURN count(DISTINCT p) AS n",
    ).collect()
    assert rows[0].n == 150


def test_size_nodes_nested(spark):
    # size(nodes(p)) = hops + 1, inside an aggregate AND as a plain item
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) "
        "RETURN size(nodes(p)) AS s, count(*) AS n ORDER BY s",
    ).collect()
    assert [(r.s, r.n) for r in rows] == [(2, 150), (3, 150)]


def test_length_in_where(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) WHERE length(p) > 1 "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 150


def test_head_nodes_nested(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WHERE c.id = 'c:1' RETURN head(nodes(p)) AS h",
    ).collect()
    assert rows[0].h == "c:1"


def test_with_pipes_path_nodes_keeps_list_type(spark):
    # a WITH that pipes nodes(p) keeps list-typedness: size() downstream
    # must take the cardinality() path, not the string length()
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WITH nodes(p) AS ns RETURN size(ns) AS s LIMIT 1",
    ).collect()
    assert rows[0].s == 2


def test_unwind_nodes_bare_after_match(spark):
    # Neo4j's commonest path idiom: UNWIND directly after MATCH, no WITH
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n) "
        "UNWIND nodes(p) AS z RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 300  # 150 paths × 2 nodes each


def test_unwind_nodes_property_resolution(spark):
    # unwound node ids resolve properties through the global attr join
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n) WHERE c.id = 'c:1' "
        "UNWIND nodes(p) AS z RETURN z.label AS lab ORDER BY lab",
    ).collect()
    assert [r.lab for r in rows] == ["customer", "nation"]


def test_unwind_after_where_boundary(spark):
    # the stage-0 WHERE scanner must terminate at UNWIND (round-13: it
    # previously swallowed 'UNWIND …' into the predicate text)
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) WHERE length(p) = 2 "
        "UNWIND nodes(p) AS z RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 450  # 150 two-hop paths × 3 nodes


def test_unwind_then_with_aggregation(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n) "
        "UNWIND nodes(p) AS z WITH z, count(*) AS k "
        "RETURN count(*) AS groups, sum(k) AS total",
    ).collect()
    # 150 customers + 25 nations = 175 distinct nodes; 300 unwound rows
    assert (rows[0].groups, rows[0].total) == (175, 300)


def test_unwind_var_collision_rejected(spark):
    with pytest.raises(CypherSyntaxError, match="collides"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n) "
            "UNWIND nodes(p) AS c RETURN count(*) AS n",
        )


def test_shortest_path_reconstruction(spark):
    # round-13 #3: nodes(p)/relationships(p) on shortestPath patterns
    # reconstruct the actual chain (predecessor-carrying BFS)
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = shortestPath((a)-[*1..4]->(b)) WHERE a.id = 'c:1' "
        "RETURN b.id AS dst, nodes(p) AS ns, relationships(p) AS rs "
        "ORDER BY dst",
    ).collect()
    by_dst = {r.dst: r for r in rows}
    n_dst = next(d for d in by_dst if d.startswith("n:"))
    r_dst = next(d for d in by_dst if d.startswith("r:"))
    assert by_dst[n_dst].ns == ["c:1", n_dst]
    assert by_dst[r_dst].ns == ["c:1", n_dst, r_dst]
    assert by_dst[r_dst].rs == [f"c:1>{n_dst}", f"{n_dst}>{r_dst}"]


def test_shortest_path_nested_and_unwind(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = shortestPath((a)-[*1..4]->(b)) WHERE a.id = 'c:1' "
        "UNWIND nodes(p) AS z RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 5  # 2-node chain + 3-node chain


def test_all_shortest_paths_fns_still_targeted(spark):
    # allShortestPaths keeps the targeted error: σ counts paths without
    # enumerating them
    with pytest.raises(CypherSyntaxError, match="allShortestPaths"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = allShortestPaths((a)-[*1..4]->(b)) "
            "WHERE a.id = 'c:1' RETURN size(nodes(p)) AS s",
        )


def test_count_path_on_shortest_works(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = shortestPath((a)-[*1..4]->(b)) WHERE a.id = 'c:1' "
        "RETURN count(p) AS n",
    ).collect()
    assert rows[0].n == 2  # c:1 → its nation → its region


def test_multi_clause_path_fn_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="single-"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n) MATCH (n)-[:NATION_OF]->(r) "
            "RETURN size(nodes(p)) AS s",
        )


# ---- 3. literal display names for auto-aliased items (r12 ADVICE low) -----


def test_auto_alias_displays_literal_text(spark):
    # o.orderdate.year rewrites to year(o.orderdate) internally, but the
    # column name must be the LITERAL query text, as Neo4j names it
    df = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "RETURN o.orderdate.year LIMIT 1",
    )
    assert df.columns == ["o.orderdate.year"]


def test_auto_alias_arithmetic_literal_text(spark):
    df = api.cypher(
        spark, SF_SMALL, "MATCH (n:Nation) RETURN n.nationkey + 1 LIMIT 1"
    )
    assert df.columns == ["n.nationkey + 1"]


def test_error_messages_hide_synthetic_alias(spark):
    # rejection errors must not leak ' AS __auto_itemN'
    with pytest.raises(CypherSyntaxError) as ei:
        api.cypher(spark, SF_SMALL, "MATCH (n:Nation) RETURN foo(n.nationkey)")
    assert "__auto_item" not in str(ei.value)


# ---- 4. the :SUPPLIES supplier→part fact edge (r12 VERDICT #2) ------------


def test_supplies_edge_matches_lineitem_pairs(spark):
    # one edge per DISTINCT (l_suppkey, l_partkey) pair
    n_pairs = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .count()
    )
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (s:Supplier)-[:SUPPLIES]->(p:Part) RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == n_pairs


def test_supplies_weight_is_quantity_sum(spark):
    import pyspark.sql.functions as F

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    expect = (
        li.filter((F.col("l_suppkey") == 1))
        .groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("q"))
        .orderBy("l_partkey")
        .collect()
    )
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (s:Supplier)-[r:SUPPLIES]->(p:Part) WHERE s.id = 's:1' "
        "RETURN p.partkey AS pk, r.weight AS qty ORDER BY pk",
    ).collect()
    assert [(r.pk, r.qty) for r in rows] == [
        (e.l_partkey, float(e.q)) for e in expect
    ]


def test_supplies_routes_default_graph_to_business(spark):
    # naming :SUPPLIES alone (no explicit graph=) must route onto the
    # business superset — the fact-tier routing rule extended
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (s)-[:SUPPLIES]->(p) RETURN count(*) AS n",
    ).collect()
    assert rows[0].n > 0


def test_supplies_as_of_first_shipment(spark):
    # AS OF before the dataset's history: no supply relationship yet
    early = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (s:Supplier)-[:SUPPLIES]->(p:Part) "
        "AS OF '1990-01-01 00:00:00' RETURN count(*) AS n",
    ).collect()[0]
    late = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (s:Supplier)-[:SUPPLIES]->(p:Part) "
        "AS OF '1999-01-01 00:00:00' RETURN count(*) AS n",
    ).collect()[0]
    assert early.n == 0 and late.n > 0


def test_business_edge_view_carries_supplies(spark):
    # the /schema payload mirrors this contract (test_serving covers the
    # HTTP layer); here: the business edge view itself declares the type
    from mimranalytics_core_spark import catalog
    from mimranalytics_core_spark.operators._base import tables

    tables(spark, SF_SMALL)
    types = {
        r.rel_type
        for r in catalog.business_edges(spark, SF_SMALL)
        .select("rel_type")
        .distinct()
        .collect()
    }
    assert "supplies" in types


# ---- 5. schema procedures (r12 VERDICT #4) ---------------------------------


def test_db_labels_hierarchy_and_business(spark):
    # default graph → entity tiers only; business → + fact tiers
    h = api.cypher(spark, SF_SMALL, "CALL db.labels()")
    assert h.columns == ["label"]
    assert [r.label for r in h.collect()] == [
        "Customer", "Nation", "Region", "Supplier",
    ]
    b = api.cypher(spark, SF_SMALL, "CALL db.labels()", graph="business")
    assert [r.label for r in b.collect()] == [
        "Customer", "Nation", "Order", "Part", "Region", "Supplier",
    ]


def test_db_relationship_types_match_views(spark):
    from mimranalytics_core_spark import catalog
    from mimranalytics_core_spark.operators._base import tables

    tables(spark, SF_SMALL)
    b = api.cypher(
        spark, SF_SMALL, "CALL db.relationshipTypes()", graph="business"
    )
    declared = {r.relationshipType for r in b.collect()}
    live = {
        r.rel_type.upper()
        for r in catalog.business_edges(spark, SF_SMALL)
        .select("rel_type")
        .distinct()
        .collect()
    }
    assert declared == live


def test_db_property_keys_match_attribute_view(spark):
    from mimranalytics_core_spark import catalog
    from mimranalytics_core_spark.operators._base import tables

    tables(spark, SF_SMALL)
    pk = api.cypher(spark, SF_SMALL, "CALL db.propertyKeys()")
    assert pk.columns == ["propertyKey"]
    assert [r.propertyKey for r in pk.collect()] == sorted(
        catalog.hierarchy_nodes(spark, SF_SMALL).columns
    )


def test_db_procedures_yield_and_errors(spark):
    y = api.cypher(spark, SF_SMALL, "CALL db.labels() YIELD label")
    assert y.count() == 4
    with pytest.raises(CypherSyntaxError, match="yields one column"):
        api.cypher(spark, SF_SMALL, "CALL db.labels() YIELD wrong")
    with pytest.raises(CypherSyntaxError, match="db.labels"):
        api.cypher(spark, SF_SMALL, "CALL db.schema.visualization()")


# ---- 6. quoted-literal IN <listvar> (round-13 probe find) ------------------


def test_literal_in_path_nodes(spark):
    # 'n:2' IN nodes(p) previously leaked Spark's raw PARSE_SYNTAX_ERROR
    # (the outside-quotes list-membership pass never saw the literal LHS)
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) WHERE 'n:2' IN nodes(p) "
        "RETURN count(*) AS n",
    ).collect()
    # paths touching n:2: one 1-hop + one 2-hop per customer of nation 2
    import pyspark.sql.functions as F

    n_cust2 = (
        spark.read.parquet(f"{SF_SMALL}/customer.parquet")
        .filter(F.col("c_nationkey") == 2)
        .count()
    )
    assert rows[0].n == 2 * n_cust2


def test_literal_in_collect_output(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WITH n, collect(c.id) AS ids WHERE 'c:1' IN ids "
        "RETURN n.id AS nid",
    ).collect()
    assert len(rows) == 1 and rows[0].nid.startswith("n:")


def test_literal_in_as_return_item(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WITH n, collect(c.id) AS ids "
        "RETURN n.id AS nid, 'c:1' IN ids AS has1 ORDER BY nid",
    ).collect()
    assert sum(1 for r in rows if r.has1) == 1


# ---- 7. variable-reference property-map values (round-13 probe find) -------


def test_prop_map_unwind_variable_value(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "UNWIND range(1, 5) AS i MATCH (c:Customer {custkey: i}) "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 5


def test_prop_map_var_prop_join_style(spark):
    # (o:Order {custkey: c.custkey}) — the join-style map Neo4j users
    # write; must equal the explicit WHERE spelling
    a = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer)-[:PLACED]->(o:Order {custkey: c.custkey}) "
        "RETURN count(*) AS n",
    ).collect()[0].n
    b = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "WHERE o.custkey = c.custkey RETURN count(*) AS n",
    ).collect()[0].n
    assert a == b > 0


def test_prop_map_unbound_variable_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="unknown variable"):
        api.cypher(
            spark, SF_SMALL, "MATCH (c:Customer {custkey: qqq}) RETURN c.name"
        )


def test_prop_map_literal_checks_unchanged(spark):
    # the round-12 literal/dtype checks must still fire
    with pytest.raises(CypherSyntaxError, match="ids are strings"):
        api.cypher(spark, SF_SMALL, "MATCH (c:Customer {id: 1}) RETURN c.name")


# ---- 8. WITH p — piping the path binding through stages (round-13) --------


def test_with_path_topk_then_project(spark):
    # the top-k-paths-then-project idiom: WITH p ORDER BY length(p) LIMIT
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) "
        "WITH p ORDER BY length(p) DESC LIMIT 3 RETURN nodes(p) AS ns",
    ).collect()
    assert len(rows) == 3 and all(len(r.ns) == 3 for r in rows)


def test_with_path_where_length_after_pipe(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) WITH p, x "
        "MATCH (x)-[:NATION_OF]->(r) WHERE length(p) = 1 "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 150  # 1-hop paths end at nations, all have regions


def test_with_path_unwind_downstream(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) WITH p "
        "UNWIND nodes(p) AS z RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 750  # 150×2 + 150×3


def test_with_distinct_p_dedups_paths_not_lengths(spark):
    # path_nodes always rides the pipe: it is the engine's path identity,
    # so DISTINCT p keeps all 300 distinct paths (hops alone would
    # collapse them to 2 length groups)
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[*1..2]->(x) WITH DISTINCT p "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 300


def test_with_p_all_shortest_targeted(spark):
    with pytest.raises(CypherSyntaxError, match="allShortestPaths"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = allShortestPaths((a)-[*1..4]->(b)) "
            "WHERE a.id = 'c:1' WITH p RETURN count(*) AS n",
        )


def test_return_p_still_targeted_after_pipe(spark):
    with pytest.raises(CypherSyntaxError):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = (c:Customer)-[*1..2]->(x) WITH p RETURN p",
        )


def test_unpiped_hops_after_with_still_targeted(spark):
    # without `WITH p`, pattern-stage tokens stay out of post-WITH scope
    with pytest.raises(CypherSyntaxError, match="pattern-stage scope"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = (c:Customer)-[*1..2]->(x) WITH x "
            "MATCH (x)-[:NATION_OF]->(r) WHERE hops = 1 RETURN count(*) AS n",
        )


# ---- 9. to* conversions with quoted literals in the argument --------------


def test_conversion_arg_with_quoted_literal(spark):
    # toInteger(split(c.id, ':')[1]) previously leaked Spark's raw
    # UNRESOLVED_ROUTINE: the per-segment rewrite's balanced-paren scan
    # was truncated at the quote (round-13; now whole-string, quote-aware)
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WHERE toInteger(split(c.id, ':')[1]) < 5 "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 5


def test_conversion_as_return_item_with_quotes(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) RETURN toInteger(split(c.id, ':')[1]) AS k "
        "ORDER BY k LIMIT 2",
    ).collect()
    assert [r.k for r in rows] == [0, 1]


def test_conversion_null_on_unparseable_still(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WHERE toInteger(c.name) IS NULL "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 150


def test_where_bare_typo_targeted_error(spark):
    # WHERE c.custkey = qqq previously leaked Spark's raw
    # UNRESOLVED_COLUMN at analysis; now a parse-time targeted error
    with pytest.raises(CypherSyntaxError, match="qqq"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH (c:Customer) WHERE c.custkey = qqq RETURN count(*) AS n",
        )


def test_leading_optional_match(spark):
    # round-14 (r13 verdict #6): a query may OPEN with OPTIONAL MATCH —
    # zero pattern matches yield ONE all-null row; matches pass through
    rows = api.cypher(
        spark,
        SF_SMALL,
        "OPTIONAL MATCH (x:Customer {name: 'nope'}) RETURN x.name AS n",
    ).collect()
    assert len(rows) == 1 and rows[0].n is None
    rows = api.cypher(
        spark, SF_SMALL, "OPTIONAL MATCH (x:Customer) RETURN count(x) AS n"
    ).collect()
    assert rows[0].n == 150


# ---- 10. cycle-closing patterns (round-13 probe find) ----------------------


def test_cycle_closure_by_repeated_variable(spark):
    # (a)-->(b)-->(a) — Neo4j's cycle idiom; previously rejected by the
    # within-chain distinctness guard. 21 two-hop trade-credit cycles at
    # sf0.001, verified against the relational oracle.
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (a)-[:BUYS_FROM]->(b)-[:CO_LOCATED]->(a) "
        "RETURN count(*) AS cycles",
        graph="trade_credit",
    ).collect()
    assert rows[0].cycles == 21


def test_cycle_closure_trail_uniqueness_still_applies(spark):
    # the SAME edge cannot bind two relationship slots (Neo4j): a
    # duplicated chain across the comma requires two distinct edges
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer)-[:CUSTOMER_OF]->(n)<-[:SUPPLIER_OF]-(s), "
        "(c)-[:CUSTOMER_OF]->(n) RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 0


def test_self_loop_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="self-loop"):
        api.cypher(
            spark, SF_SMALL, "MATCH (a)-[:CUSTOMER_OF]->(a) RETURN count(*) AS n"
        )


# ---- 11. shuffle-partitions conf restore symmetry (r12 ADVICE low) --------


def test_run_available_now_unsets_leaked_shuffle_conf(spark):
    # when no previous value existed, the override must be UNSET after the
    # replay (mirrors the state-store provider branch) — not left at 8
    from mimranalytics_core_spark.streaming import jobs

    part_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(part_key, None)
    try:
        spark.conf.unset(part_key)
        out = jobs.tumbling_counts(jobs.events_stream(spark, SF_SMALL))
        jobs.run_available_now(
            out, "t13_conf_restore", spark, output_mode="complete",
            shuffle_partitions=8,
        )
        assert spark.conf.get(part_key, None) is None
    finally:
        if prev is not None:
            spark.conf.set(part_key, prev)
