"""Round-12 guard tests.

First half: the r11 VERDICT's lead defect (`{id: <int>}` crashing mid-job
with a raw ANSI CAST_INVALID_INPUT instead of a targeted parse error) and
the five r11 ADVICE items (duration.between normalization semantics,
quoted-paren temporal bases, XOR inside CASE bodies, dynamic slice bounds,
try_cast for the to* conversions).
"""

import pytest

from mimranalytics_core_spark import api
from mimranalytics_core_spark.cypher import CypherSyntaxError

SF = "/root/testdata/sf0.01"


# ---- 1. id / property-map literal type checks (VERDICT r11 "What's wrong"
# #1: the only crash-on-plausible-input on the probed surface) --------------


@pytest.mark.parametrize(
    "bad",
    [
        "MATCH (c:Customer {id: 1}) RETURN c.name",
        "MATCH (c:Customer) WHERE c.id = 1 RETURN c.name",
        "MATCH (c:Customer) WHERE id(c) = 1 RETURN c.name",
        "MATCH (c:Customer) WHERE 1 = c.id RETURN c.name",
        "MATCH (c:Customer) WHERE id(c) <> 7 RETURN c.name",
        "MATCH (c:Customer {id: true}) RETURN c.name",
    ],
)
def test_id_numeric_literal_targeted_error(spark, bad):
    # node ids are strings ('c:1') — a numeric/boolean literal comparison
    # previously died at RUNTIME with a raw Spark CAST_INVALID_INPUT
    with pytest.raises(CypherSyntaxError, match="ids are strings"):
        api.cypher(spark, SF, bad)


@pytest.mark.parametrize(
    "bad,msg",
    [
        ("MATCH (c:Customer {acctbal: 'high'}) RETURN c.name", "numeric"),
        ("MATCH (c:Customer {nationkey: 1.5}) RETURN c.name", "integer"),
        ("MATCH (c:Customer {name: 42}) RETURN c.name", "string"),
    ],
)
def test_prop_map_literal_dtype_check(spark, bad, msg):
    with pytest.raises(CypherSyntaxError, match=msg):
        api.cypher(spark, SF, bad)


def test_prop_map_correctly_typed_literals_still_work(spark):
    assert (
        api.cypher(
            spark, SF, "MATCH (c:Customer {id: 'c:1'}) RETURN c.name AS n"
        ).count()
        == 1
    )
    assert (
        api.cypher(
            spark, SF, "MATCH (n:Nation {nationkey: 3}) RETURN n.name AS n"
        ).count()
        == 1
    )
    assert (
        api.cypher(
            spark,
            SF,
            "MATCH (c:Customer) WHERE id(c) = 'c:1' RETURN c.name AS n",
        ).count()
        == 1
    )


# ---- 2. duration.between normalization (r11 ADVICE, high) -----------------
# (value tests live in test_round11_ops.py::test_duration_between_days and
# test_duration_between_day_remainder — updated to the Neo4j-normalized
# semantics in the same commit)


def test_duration_indays_bad_accessor_targeted(spark):
    with pytest.raises(CypherSyntaxError, match="not\\s+supported"):
        api.cypher(
            spark,
            SF,
            "RETURN duration.inDays(date('2020-01-01'), "
            "date('2020-03-01')).months AS m",
        )


# ---- 3. quoted parens inside a temporal-accessor base (r11 ADVICE) --------


def test_temporal_accessor_base_with_quoted_paren(spark):
    r = api.cypher(
        spark,
        SF,
        "RETURN date(substr('2020-01-15 (x)', 1, 10)).year AS y",
    ).collect()[0]
    assert r.y == 2020


# ---- 4. XOR inside CASE…END bodies (r11 ADVICE) ---------------------------


def test_xor_in_case_when_body(spark):
    rows = api.cypher(
        spark,
        SF,
        "UNWIND [1,2,3,4] AS x RETURN x, CASE WHEN x > 1 XOR x > 3 "
        "THEN 'mid' ELSE 'edge' END AS c ORDER BY x",
    ).collect()
    assert [(r.x, r.c) for r in rows] == [
        (1, "edge"), (2, "mid"), (3, "mid"), (4, "edge"),
    ]


def test_xor_in_nested_case_and_else(spark):
    rows = api.cypher(
        spark,
        SF,
        "UNWIND [1,2] AS x RETURN CASE WHEN (x=1) XOR false THEN "
        "CASE WHEN x=1 XOR x=2 THEN 1 ELSE 0 END ELSE 9 END AS v "
        "ORDER BY v",
    ).collect()
    assert [r.v for r in rows] == [1, 9]
    rows = api.cypher(
        spark,
        SF,
        "UNWIND [1,2] AS x RETURN CASE WHEN x=1 THEN true "
        "ELSE x=1 XOR x=2 END AS v ORDER BY x",
    ).collect()
    assert [r.v for r in rows] == [True, True]


# ---- 5. dynamic slice bounds get a targeted error (r11 ADVICE) ------------


def test_dynamic_slice_bound_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="slice bounds"):
        api.cypher(
            spark,
            SF,
            "WITH [1,2,3,4] AS xs UNWIND [1,2] AS n RETURN xs[0..n] AS s",
        )


def test_literal_slices_still_work(spark):
    r = api.cypher(
        spark,
        SF,
        "WITH [1,2,3,4] AS xs RETURN xs[1..3] AS s, xs[..2] AS t, "
        "xs[-2..] AS u",
    ).collect()[0]
    assert (r.s, r.t, r.u) == ([2, 3], [1, 2], [3, 4])


# ---- 6. to* conversions return null on unparseable (r11 ADVICE) -----------


def test_to_casts_null_on_unparseable(spark):
    r = api.cypher(
        spark,
        SF,
        "WITH 'maybe' AS a, 'true' AS b, 'zz' AS c, '42' AS d "
        "RETURN toBoolean(a) AS ba, toBoolean(b) AS bb, "
        "toInteger(c) AS ic, toInteger(d) AS id2, toFloat(a) AS fa",
    ).collect()[0]
    assert r.ba is None and r.ic is None and r.fa is None
    assert r.bb is True and r.id2 == 42

# ---- 7. the business graph: Order/Part fact tiers (VERDICT r11 missing #1,
# #2), type(r) on untyped segments (#4), unknown-rel-type errors (#5),
# unaliased RETURN expressions (#3) ----------------------------------------


def test_order_label_and_placed_edges(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:PLACED]->(o:Order),
                 (c)-[:CUSTOMER_OF]->(n:Nation)
           RETURN n.name AS nation, count(*) AS orders ORDER BY nation""",
    ).collect()
    assert len(rows) == 25 and all(r.orders > 0 for r in rows)


def test_natural_key_prop_map_seek(spark):
    rows = api.cypher(
        spark,
        SF,
        "MATCH (c:Customer {custkey: 1})-[:PLACED]->(o:Order) "
        "RETURN o.orderkey AS k ORDER BY k",
    ).collect()
    assert rows and all(r.k is not None for r in rows)


def test_contains_weight_is_quantity(spark):
    r = api.cypher(
        spark,
        SF,
        "MATCH (o:Order)-[r:CONTAINS]->(p:Part) "
        "RETURN round(sum(r.weight), 2) AS qty, count(*) AS pairs",
    ).collect()[0]
    assert r.pairs > 0 and r.qty > r.pairs  # quantities are >= 1 per pair


def test_fact_tier_routing_keeps_hierarchy_stable(spark):
    # a query NOT naming the fact tier stays on the entity hierarchy —
    # unlabeled node scans do not grow when the business tier exists
    from mimranalytics_core_spark import catalog

    n_default = (
        api.cypher(spark, SF, "MATCH (n) RETURN count(*) AS c").collect()[0].c
    )
    assert n_default == catalog.hierarchy_nodes(spark, SF).count()
    n_business = (
        api.cypher(spark, SF, "MATCH (n) RETURN count(*) AS c", graph="business")
        .collect()[0]
        .c
    )
    assert n_business == catalog.business_nodes(spark, SF).count()
    assert n_business > n_default


def test_order_keys_and_properties(spark):
    r = api.cypher(
        spark, SF, "MATCH (o:Order) RETURN keys(o) AS k LIMIT 1"
    ).collect()[0]
    assert r.k == [
        "id", "label", "custkey", "orderkey", "orderstatus",
        "totalprice", "orderdate", "orderpriority",
    ]


def test_type_fn_on_untyped_segment(spark):
    rows = api.cypher(
        spark,
        SF,
        "MATCH (a)-[r]->(b) RETURN type(r) AS t, count(*) AS n ORDER BY t",
    ).collect()
    assert [r.t for r in rows] == ["CUSTOMER_OF", "NATION_OF", "SUPPLIER_OF"]
    rows_b = api.cypher(
        spark,
        SF,
        "MATCH (a)-[r]->(b) RETURN type(r) AS t, count(*) AS n ORDER BY t",
        graph="business",
    ).collect()
    assert [r.t for r in rows_b] == [
        "CONTAINS", "CUSTOMER_OF", "NATION_OF", "PLACED", "SUPPLIER_OF",
        "SUPPLIES",  # round-13: the supplier→part fact edge
    ]


def test_type_fn_undirected_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="undirected"):
        api.cypher(spark, SF, "MATCH (a)-[r]-(b) RETURN type(r) AS t")


def test_unknown_rel_type_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="unknown relationship type"):
        api.cypher(spark, SF, "MATCH (a:Supplier)-[:OWNS]->(b) RETURN count(*) AS n")
    with pytest.raises(CypherSyntaxError, match="LOCATED_IN"):
        api.cypher(
            spark, SF, "MATCH (a)-[:LOCATED_IN]->(b) RETURN count(*) AS n"
        )


def test_unaliased_return_expression_auto_names(spark):
    df = api.cypher(
        spark,
        SF,
        "MATCH (n:Nation) WITH n.regionkey AS rk, avg(n.nationkey) AS ab "
        "RETURN rk, round(ab,2) ORDER BY rk",
    )
    assert df.columns == ["rk", "round(ab,2)"]
    assert df.count() == 5
    with pytest.raises(CypherSyntaxError, match="duplicate"):
        api.cypher(
            spark,
            SF,
            "MATCH (n:Nation) RETURN round(n.nationkey,1), round(n.nationkey,1)",
        )


def test_order_asof_snapshot(spark):
    early = api.cypher(
        spark,
        SF,
        "MATCH (c:Customer)-[:PLACED]->(o:Order) AS OF '1990-01-01 00:00:00' "
        "RETURN count(*) AS n",
    ).collect()[0]
    assert early.n == 0  # no orders placed before the dataset's history
    late = api.cypher(
        spark,
        SF,
        "MATCH (c:Customer)-[:PLACED]->(o:Order) AS OF '1999-01-01 00:00:00' "
        "RETURN count(*) AS n",
    ).collect()[0]
    assert late.n > 0


# ---- 8. disconnected comma patterns (VERDICT r11 missing #6) --------------


def test_disconnected_comma_pattern_joins_via_where(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (a:Supplier), (b:Customer)
           WHERE a.nationkey = b.nationkey
           RETURN a.nationkey AS nk, count(*) AS pairs ORDER BY nk""",
    ).collect()
    assert len(rows) == 25 and all(r.pairs > 0 for r in rows)


def test_disconnected_unfiltered_cartesian(spark):
    n = (
        api.cypher(
            spark, SF, "MATCH (a:Nation), (r:Region) RETURN count(*) AS n"
        )
        .collect()[0]
        .n
    )
    assert n == 125  # 25 nations x 5 regions — Neo4j cartesian semantics


def test_disconnected_mixed_segment_and_node_chain(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation), (r:Region)
           WHERE n.regionkey = r.regionkey
           RETURN r.name AS region, count(*) AS members ORDER BY region""",
    ).collect()
    assert len(rows) == 5 and sum(r.members for r in rows) == 1500


def test_disconnected_two_segment_components(spark):
    r = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation),
                 (s:Supplier)-[:SUPPLIER_OF]->(n2:Nation)
           WHERE n.name = n2.name
           RETURN count(*) AS pairs""",
    ).collect()[0]
    # one row per (customer, supplier) pair in the same nation
    assert r.pairs == 5949


# ---- 9. temporal accessors on date-typed property bases -------------------


def test_date_prop_accessor(spark):
    rows = api.cypher(
        spark,
        SF,
        "MATCH (o:Order) RETURN o.orderdate.year AS y, count(*) AS n "
        "ORDER BY y LIMIT 2",
    ).collect()
    assert all(1990 < r.y < 2005 and r.n > 0 for r in rows)
    n = api.cypher(
        spark,
        SF,
        "MATCH (o:Order) WHERE o.orderdate.year = 1995 RETURN count(*) AS n",
    ).collect()[0].n
    assert n > 0


def test_date_prop_accessor_time_component_targeted(spark):
    with pytest.raises(CypherSyntaxError, match="time-of-day"):
        api.cypher(spark, SF, "MATCH (o:Order) RETURN o.orderdate.hour AS h")
