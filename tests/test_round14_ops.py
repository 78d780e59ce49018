"""Round-14 guard tests.

Covers the r13 VERDICT items: the bounded join_self_conflict decade fix
(#1), multi-segment path variables (#3), schema procedures with a RETURN
tail (#4), prop-map-only correlation after WITH (#5), leading OPTIONAL
MATCH (#6), and IN over list comprehensions in WHERE (#10).
"""

import pytest

from mimranalytics_core_spark import api
from mimranalytics_core_spark.cypher import CypherSyntaxError

SF = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


# ---- 1. join_self_conflict: bounded output (r13 VERDICT #1) ----------------


def test_join_self_conflict_bounded_output(spark):
    from mimranalytics_core_spark.registry import all_ops

    df = all_ops()["join_self_conflict"].fn(spark, SF_SMALL)
    rows = df.collect()
    # top-K=5 exemplars per key → at most K(K-1)/2 = 10 pairs per nation,
    # 25 nations → ≤ 250 rows at ANY scale factor
    assert 0 < len(rows) <= 250
    # the arithmetic pair count matches the exemplar-visible group:
    # every nation with ≥2 BUILDING customers reports n*(n-1)/2
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.shared_nation, set()).add(r.nation_pair_count)
    assert all(len(v) == 1 for v in by_nation.values())
    # exemplar pairs are ordered and deduped
    assert all(r.cust_a < r.cust_b for r in rows)


# ---- 2. multi-segment path variable (r13 VERDICT #3) -----------------------


def test_multiseg_path_nodes_and_length(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(:Nation)"
        "-[:NATION_OF]->(r:Region) "
        "RETURN nodes(p) AS ns, length(p) AS l, relationships(p) AS rs "
        "ORDER BY c.id LIMIT 1",
    ).collect()
    assert len(rows) == 1
    ns, l, rs = rows[0].ns, rows[0].l, rows[0].rs
    assert l == 2 and len(ns) == 3 and len(rs) == 2
    assert ns[0].startswith("c:") and ns[1].startswith("n:")
    assert ns[2].startswith("r:")
    assert rs[0] == f"{ns[0]}>{ns[1]}" and rs[1] == f"{ns[1]}>{ns[2]}"


def test_multiseg_path_reverse_arrows_written_order(spark):
    # written node order is preserved through <- normalization
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (r:Region)<-[:NATION_OF]-(n:Nation)"
        "<-[:CUSTOMER_OF]-(c:Customer) "
        "RETURN nodes(p) AS ns LIMIT 1",
    ).collect()
    ns = rows[0].ns
    assert ns[0].startswith("r:") and ns[2].startswith("c:")


def test_multiseg_path_composes_in_where_and_unwind(spark):
    row = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n:Nation)"
        "-[:NATION_OF]->(r:Region) "
        "WHERE 'n:1' IN nodes(p) RETURN count(*) AS cnt",
    ).collect()[0]
    # nation 1's customers at sf0.001
    assert row.cnt == 6
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer {custkey: 1})-[:CUSTOMER_OF]->(n:Nation)"
        "-[:NATION_OF]->(r:Region) UNWIND nodes(p) AS z RETURN z",
    ).collect()
    assert [r.z[:2] for r in rows] == ["c:", "n:", "r:"]


def test_multiseg_path_varlength_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="fixed single-hop"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = (c:Customer)-[:CUSTOMER_OF*1..2]->(n)"
            "-[:NATION_OF]->(r:Region) RETURN count(*) AS cnt",
        )


def test_multiseg_path_undirected_relationships_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="directed segments"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = (c:Customer)-[:CUSTOMER_OF]-(n:Nation)"
            "-[:NATION_OF]-(r:Region) RETURN relationships(p) AS rs",
        )


def test_single_segment_path_unchanged(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF*1..2]->(x) "
        "RETURN count(p) AS cnt",
    ).collect()
    assert rows[0].cnt == 150


# ---- 3. CALL db.proc() YIELD x RETURN x (r13 VERDICT #4) -------------------


def test_schema_proc_yield_return(spark):
    rows = api.cypher(
        spark, SF_SMALL, "CALL db.labels() YIELD label RETURN label"
    ).collect()
    assert [r.label for r in rows] == [
        "Customer", "Nation", "Region", "Supplier",
    ]


def test_schema_proc_yield_return_order_limit(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "CALL db.labels() YIELD label RETURN label "
        "ORDER BY label DESC LIMIT 2",
    ).collect()
    assert [r.label for r in rows] == ["Supplier", "Region"]


def test_schema_proc_return_name_mismatch_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="RETURN wrong"):
        api.cypher(
            spark, SF_SMALL, "CALL db.labels() YIELD label RETURN wrong"
        )
    with pytest.raises(CypherSyntaxError, match="ORDER BY wrong"):
        api.cypher(
            spark,
            SF_SMALL,
            "CALL db.labels() YIELD label RETURN label ORDER BY wrong",
        )


# ---- 4. prop-map correlation after WITH (r13 VERDICT #5) -------------------


def test_propmap_correlation_after_with(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WITH c "
        "MATCH (o:Order {custkey: c.custkey}) "
        "RETURN count(*) AS cnt",
    ).collect()
    assert rows[0].cnt == 1500  # every sf0.001 order has a customer


def test_propmap_correlation_plan_is_hash_join(spark):
    df = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WITH c "
        "MATCH (o:Order {custkey: c.custkey}) "
        "RETURN count(*) AS cnt",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_propmap_correlation_with_literal_conjunct(spark):
    # literal conjuncts in the same map post-filter; the ref conjunct joins
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WITH c "
        "MATCH (o:Order {custkey: c.custkey, orderstatus: 'F'}) "
        "RETURN count(*) AS cnt",
    ).collect()
    assert 0 < rows[0].cnt < 1500


def test_unshared_stage_match_still_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="share a variable"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH (c:Customer) WITH c LIMIT 5 "
            "MATCH (s:Supplier) RETURN count(*) AS cnt",
        )


# ---- 5. leading OPTIONAL MATCH (r13 VERDICT #6) ----------------------------


def test_leading_optional_zero_match_null_row(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "OPTIONAL MATCH (c:Customer {name: 'nope'}) RETURN c.name AS n",
    ).collect()
    assert len(rows) == 1 and rows[0].n is None


def test_leading_optional_passthrough_on_match(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "OPTIONAL MATCH (c:Customer) RETURN count(c) AS n",
    ).collect()
    assert rows[0].n == 150


def test_leading_optional_where_scopes_into_pattern(spark):
    # WHERE filters the optional pattern BEFORE null-extension: count = 0,
    # not an empty frame
    rows = api.cypher(
        spark,
        SF_SMALL,
        "OPTIONAL MATCH (c:Customer) WHERE c.name = 'nope' "
        "RETURN count(c) AS n",
    ).collect()
    assert len(rows) == 1 and rows[0].n == 0


def test_leading_optional_relationship_pattern(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "OPTIONAL MATCH (c:Customer {name: 'nope'})-[:CUSTOMER_OF]->"
        "(n:Nation) RETURN c.id AS cid, n.id AS nid",
    ).collect()
    assert len(rows) == 1 and rows[0].cid is None and rows[0].nid is None


def test_leading_optional_then_plain_match(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "OPTIONAL MATCH (c:Customer {custkey: 1}) "
        "MATCH (c)-[:CUSTOMER_OF]->(n:Nation) RETURN n.name AS nn",
    ).collect()
    assert len(rows) == 1 and rows[0].nn.startswith("NATION_")


# ---- 6. IN over list comprehensions in WHERE (r13 VERDICT #10) -------------


def test_in_list_comprehension_in_where(spark):
    base = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF*1..2]->(x) "
        "WHERE 'n:1' IN nodes(p) RETURN count(*) AS n",
    ).collect()[0].n
    comp = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF*1..2]->(x) "
        "WHERE 'n:1' IN [z IN nodes(p) | z] RETURN count(*) AS n",
    ).collect()[0].n
    assert comp == base == 6


def test_in_comprehension_with_predicate(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF*1..2]->(x) "
        "WHERE 'n:1' IN [z IN nodes(p) WHERE z <> 'c:1' | z] "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 6


def test_in_literal_list_and_empty_list_unchanged(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WHERE c.nationkey IN [1, 2] "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 13
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WHERE c.nationkey IN [] RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 0


def test_indexing_after_in_fix_unchanged(spark):
    # the membership carve-out must not break bracket INDEXING
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF*1..1]->(x) "
        "RETURN nodes(p)[0] AS first LIMIT 1",
    ).collect()
    assert rows[0].first.startswith("c:")


# ---- 7. bounded-K allShortestPaths enumeration (r13 'missing' #6) ----------


def test_k_shortest_paths_cap_is_exact(spark):
    # hand-built diamond fan: s -> m1|m2|m3 -> t gives sigma=3; k=2 must
    # keep exactly the 2 lexicographically-smallest paths while sigma
    # stays the TRUE count
    from mimranalytics_core_spark.functions.graph_algos import (
        multi_source_k_shortest_paths,
    )

    edges = spark.createDataFrame(
        [("s", "m1"), ("s", "m2"), ("s", "m3"),
         ("m1", "t"), ("m2", "t"), ("m3", "t")],
        "src string, dst string",
    )
    sources = spark.createDataFrame([("s",)], "node string")
    out = multi_source_k_shortest_paths(edges, sources, max_depth=2, k=2)
    row = {r.node: r for r in out.collect()}
    assert row["t"].sigma == 3
    assert row["t"].paths == ["s|m1|t", "s|m2|t"]
    assert row["m2"].paths == ["s|m2"] and row["m2"].sigma == 1


def test_k_shortest_paths_min_hop_only(spark):
    # a node reachable at hops 1 AND 2 reports only the min-hop paths
    from mimranalytics_core_spark.functions.graph_algos import (
        multi_source_k_shortest_paths,
    )

    edges = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "b")], "src string, dst string"
    )
    sources = spark.createDataFrame([("s",)], "node string")
    out = multi_source_k_shortest_paths(edges, sources, max_depth=3, k=3)
    row = {r.node: r for r in out.collect()}
    assert row["b"].dist == 1 and row["b"].sigma == 1
    assert row["b"].paths == ["s|b"]


def test_graph_k_shortest_paths_cap_bites_at_sf001(spark):
    from mimranalytics_core_spark.registry import all_ops

    df = all_ops()["graph_k_shortest_paths"].fn(spark, SF)
    import pyspark.sql.functions as F

    capped = df.filter(F.col("sigma") > 3).count()
    over = df.filter(
        F.col("sigma") > F.size(F.split(F.col("paths_str"), ","))
    ).count()
    assert capped == 0  # sigma tops out at 3 on this fixture
    assert over > 0  # …so with k=2 the cap visibly bites


def test_api_k_shortest_paths_surface(spark):
    rows = (
        api.k_shortest_paths(
            spark,
            SF_SMALL,
            k=2,
            max_hops=2,
            src_pred="src LIKE 'c:1'",
        )
        .orderBy("dst")
        .collect()
    )
    assert rows and all(r.n_paths >= len(r.paths) for r in rows)
    assert all(p.startswith("c:1|") for r in rows for p in r.paths)


def test_allshortest_error_names_bounded_variant(spark):
    with pytest.raises(CypherSyntaxError, match="k_shortest_paths"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH p = allShortestPaths((a)-[*1..3]->(b)) "
            "RETURN nodes(p) AS ns",
        )


# ---- 8. WITH p over multi-segment chains -----------------------------------


def test_with_p_multiseg_chain(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n:Nation)"
        "-[:NATION_OF]->(r:Region) "
        "WITH p WHERE 'n:1' IN nodes(p) RETURN count(*) AS cnt",
    ).collect()
    assert rows[0].cnt == 6
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH p = (c:Customer)-[:CUSTOMER_OF]->(n:Nation)"
        "-[:NATION_OF]->(r:Region) "
        "WITH DISTINCT p RETURN count(*) AS cnt",
    ).collect()
    assert rows[0].cnt == 150


# ---- 9. probe find: row UNWIND over var.prop lists -------------------------


def test_row_unwind_over_prop_list(spark):
    # UNWIND [c.custkey, c.nationkey] previously leaked Spark's raw
    # UNRESOLVED_COLUMN (the explode ran before the attribute join); the
    # needed attributes now pre-attach
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer {custkey: 1}) "
        "UNWIND [c.custkey, c.nationkey] AS v RETURN v ORDER BY v",
    ).collect()
    assert [r.v for r in rows] == [1, 19]


# ---- 10. probe finds: boolean items + string reduce ------------------------


def test_boolean_expression_items(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) RETURN c.acctbal > 5000 AS rich, "
        "count(*) AS cnt ORDER BY rich",
    ).collect()
    assert [(r.rich, r.cnt) for r in rows] == [(False, 84), (True, 66)]
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (n) RETURN n.acctbal IS NULL AS isnull, count(*) AS cnt "
        "ORDER BY isnull",
    ).collect()
    assert [(r.isnull, r.cnt) for r in rows] == [(False, 160), (True, 30)]


def test_boolean_item_typo_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="qqq"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH (c:Customer) RETURN c.acctbal > qqq AS rich, "
            "count(*) AS n",
        )


def test_string_reduce_concat(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "WITH ['a', 'bc'] AS xs "
        "RETURN reduce(s = '<', x IN xs | s + x + '-') AS cat",
    ).collect()
    assert rows[0].cat == "<a-bc-"
    # numeric reduce keeps +
    rows = api.cypher(
        spark,
        SF_SMALL,
        "WITH [1, 2, 3] AS xs RETURN reduce(s = 0, x IN xs | s + x) AS t",
    ).collect()
    assert rows[0].t == 6


def test_comparison_chaining(spark):
    import pyspark.sql.functions as F  # noqa: F401

    base = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WHERE 1000 <= c.acctbal AND c.acctbal <= 2000 "
        "RETURN count(*) AS n",
    ).collect()[0].n
    chained = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WHERE 1000 <= c.acctbal <= 2000 "
        "RETURN count(*) AS n",
    ).collect()[0].n
    assert chained == base == 11
    # NOT wraps the WHOLE chain
    neg = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WHERE NOT 1000 <= c.acctbal <= 2000 "
        "RETURN count(*) AS n",
    ).collect()[0].n
    assert neg == 150 - 11
    # stage WHERE chains
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer) WITH c.acctbal AS bal WHERE 100 < bal < 1000 "
        "RETURN count(*) AS n",
    ).collect()
    assert rows[0].n == 20


def test_map_literal_return_item(spark):
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer {custkey: 1}) "
        "RETURN {name: c.name, bal: c.acctbal, rich: c.acctbal > 1000} AS m",
    ).collect()
    m = rows[0].m
    assert m.name == "Customer#000000001" and m.rich is True
    with pytest.raises(CypherSyntaxError, match="qqq"):
        api.cypher(
            spark, SF_SMALL,
            "MATCH (c:Customer {custkey: 1}) RETURN {x: qqq} AS m",
        )


def test_rel_var_return_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match=r"type\(r\)"):
        api.cypher(
            spark, SF_SMALL,
            "MATCH (a:Customer)-[r:CUSTOMER_OF]->(b) RETURN r LIMIT 1",
        )
    with pytest.raises(CypherSyntaxError, match="relationship LIST"):
        api.cypher(
            spark, SF_SMALL,
            "MATCH (a:Customer)-[rs:CUSTOMER_OF*1..2]->(b) RETURN rs",
        )


def test_parse_exception_net(spark):
    # degenerate-but-typed spellings that compile to SQL Spark's parser
    # rejects surface as CypherSyntaxError, never a raw PARSE_SYNTAX_ERROR
    with pytest.raises(CypherSyntaxError, match="failed to parse"):
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH (c:Customer) WHERE c.acctbal IS NULL IS NULL "
            "RETURN count(*) AS n",
        )
