"""HTTP serving-layer tests: the request → query → JSON response lifecycle
(reference README.md:26) must return exactly what the programmatic API
returns, and reject malformed queries with client-error codes."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from mimranalytics_core_spark import api
from mimranalytics_core_spark.serving import serve_background
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def server(spark):
    srv, port = serve_background(spark, SF_SMALL)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(base, path, **params):
    qs = urllib.parse.urlencode(params)
    with urllib.request.urlopen(f"{base}{path}?{qs}", timeout=120) as r:
        return json.loads(r.read())


def test_health(server):
    assert _get(server, "/health") == {"status": "ok"}


def test_ubo_endpoint_matches_api(server, spark):
    got = _get(server, "/ubo", threshold=0.25)
    want = [r.asDict() for r in api.ubo_report(spark, SF_SMALL, threshold=0.25).collect()]
    assert got["n"] == len(want)
    assert {(r["owner"], r["entity"]) for r in got["rows"]} == {
        (r["owner"], r["entity"]) for r in want
    }


def test_cypher_endpoint_runs_saved_query(server):
    got = _get(
        server,
        "/cypher",
        q="MATCH (c)-[:CUSTOMER_OF]->(n) RETURN n AS nation, count(*) AS k",
    )
    assert got["n"] > 0
    assert all(r["nation"].startswith("n:") and r["k"] >= 1 for r in got["rows"])


def test_cypher_endpoint_400_on_syntax_error(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/cypher", q="CREATE (a)-[:X]->(b)")
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())


def test_unknown_endpoint_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/nope")
    assert ei.value.code == 404


def test_expand_endpoint_row_cap(server):
    got = _get(server, "/expand", entities="c:1", hops=2, max_rows=3)
    assert got["n"] <= 3


def test_cypher_endpoint_binds_params(server):
    """$name placeholders bind per request — the FastAPI parameterized-
    query lifecycle (round-4 verdict item 6)."""
    body = _get(
        server,
        "/cypher",
        q=(
            "UNWIND $ids AS cid MATCH (c)-[:CUSTOMER_OF]->(n) "
            "WHERE c.id = cid RETURN cid, n ORDER BY cid"
        ),
        params=json.dumps({"ids": ["c:1", "c:4"]}),
    )
    assert body["n"] == 2
    assert [r["cid"] for r in body["rows"]] == ["c:1", "c:4"]


def test_cypher_endpoint_400_on_missing_param(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/cypher", q="UNWIND $ids AS x RETURN x")
    assert ei.value.code == 400


def _post(server, path, body):
    import urllib.request

    req = urllib.request.Request(
        f"{server}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def test_cypher_post_body_binds_params(server):
    """POST /cypher with a JSON body — the canonical parameterized form."""
    got = _post(
        server,
        "/cypher",
        {
            "q": (
                "UNWIND $ids AS cid MATCH (c)-[:CUSTOMER_OF]->(n) "
                "WHERE c.id = cid RETURN cid, n ORDER BY cid"
            ),
            "params": {"ids": ["c:1", "c:4"]},
            "max_rows": 10,
        },
    )
    assert got["n"] == 2 and [r["cid"] for r in got["rows"]] == ["c:1", "c:4"]


def test_cypher_post_bad_body_is_400(server):
    import urllib.error
    import urllib.request

    for raw in (b"not json", b"[1, 2]"):
        req = urllib.request.Request(f"{server}/cypher", data=raw, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400


def test_post_unknown_endpoint_404(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server, "/nope", {})
    assert ei.value.code == 404


def test_explain_endpoint_returns_plan(server):
    body = _get(
        server,
        "/explain",
        q="MATCH (c)-[:CUSTOMER_OF]->(n) WHERE c.id STARTS WITH 'c:1' RETURN c, n",
    )
    assert "Physical Plan" in body["plan"]
    # the pushed-down prefix filter must be visible in the served plan
    assert "PushedFilters" in body["plan"] or "Filter" in body["plan"]


def test_ops_catalog_lists_registry(server):
    got = _get(server, "/ops")
    assert got["n"] >= 280
    by_name = {o["name"]: o for o in got["ops"]}
    assert by_name["scan_parquet"]["oracle"] is True
    assert by_name["agg_approx_distinct"]["oracle"] is False
    graph_only = _get(server, "/ops", family="graph")
    assert 0 < graph_only["n"] < got["n"]
    assert all(o["family"] == "graph" for o in graph_only["ops"])


def test_run_endpoint_executes_saved_query(server, spark):
    got = _get(server, "/run", name="scan_pruned", max_rows=5)
    assert 0 < got["n"] <= 5


def test_run_endpoint_unknown_name_400(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/run", name="nope_nope")
    assert ei.value.code == 400


def test_schema_endpoint_matches_attribute_view(server, spark):
    """/schema declares the catalog contract; the hierarchy label/property
    claims must match the live attribute view's actual columns and the
    Cypher layer's property surface."""
    from mimranalytics_core_spark import catalog
    from mimranalytics_core_spark.cypher import _PROPS

    sch = _get(server, "/schema")
    h = sch["graphs"]["hierarchy"]
    assert set(h["labels"]) == {"Customer", "Supplier", "Nation", "Region"}
    view_cols = set(catalog.hierarchy_nodes(spark, SF_SMALL).columns)
    for label, props in h["labels"].items():
        assert set(props) <= view_cols
    # every declared non-universal property is Cypher-reachable
    assert {"acctbal", "mktsegment"} <= set(_PROPS)
    assert sch["universal_properties"] == ["id", "label", "name"]
    assert "CUSTOMER_OF" in h["relationship_types"]
    # round-12: the business superset carries the fact tiers and declares
    # its routing; its label/property claims match business_nodes
    b = sch["graphs"]["business"]
    assert set(b["labels"]) == {
        "Customer", "Supplier", "Nation", "Region", "Order", "Part",
    }
    bcols = set(catalog.business_nodes(spark, SF_SMALL).columns)
    for label, props in b["labels"].items():
        assert set(props) <= bcols
    assert {"PLACED", "CONTAINS", "SUPPLIES"} <= set(b["relationship_types"])
    assert {"custkey", "suppkey", "orderkey", "partkey"} <= set(_PROPS)


def test_cypher_endpoint_schema_procedures(server):
    # round-13: the connect-time procedures Neo4j drivers fire, through
    # the same /cypher lifecycle every other query rides
    labs = _get(server, "/cypher", q="CALL db.labels()")
    assert [r["label"] for r in labs["rows"]] == [
        "Customer", "Nation", "Region", "Supplier",
    ]
    rels = _get(server, "/cypher", q="CALL db.relationshipTypes()")
    assert [r["relationshipType"] for r in rels["rows"]] == [
        "CUSTOMER_OF", "NATION_OF", "SUPPLIER_OF",
    ]


def test_cypher_endpoint_supply_chain_routes(server):
    # :SUPPLIES alone routes the default graph onto the business superset
    got = _get(
        server, "/cypher",
        q="MATCH (s:Supplier)-[:SUPPLIES]->(p:Part) RETURN count(*) AS n",
    )
    assert got["rows"][0]["n"] > 0


def test_cypher_endpoint_call_subquery_with_now_param(server):
    # round-9 surface through HTTP: CALL { } subqueries and the $now
    # session parameter both ride the same /cypher params lifecycle
    got = _get(
        server,
        "/cypher",
        q=(
            "MATCH (n:Nation) "
            "CALL { WITH n MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
            "RETURN count(*) AS nc } "
            "RETURN n.name AS nm, nc, date() AS d ORDER BY nm LIMIT 3"
        ),
        params=json.dumps({"now": "1995-06-17 00:00:00"}),
    )
    assert got["n"] == 3
    assert all(r["d"] == "1995-06-17" for r in got["rows"])
    assert all(r["nc"] >= 0 for r in got["rows"])


def test_cypher_endpoint_round10_surface(server):
    # the round-10 additions are reachable through the HTTP lifecycle:
    # CALL tails (top-k per group), correlated UNION ALL, pattern
    # comprehensions, map projections, quantified relationships
    got = _get(
        server,
        "/cypher",
        q=(
            "MATCH (n:Nation) CALL { WITH n "
            "MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
            "RETURN c.name AS top_c ORDER BY top_c LIMIT 1 } "
            "RETURN n.name AS nm, top_c ORDER BY nm LIMIT 3"
        ),
    )
    assert got["n"] == 3 and all(r["top_c"].startswith("Customer#") for r in got["rows"])
    got = _get(
        server,
        "/cypher",
        q=(
            "MATCH (n:Nation) CALL { WITH n "
            "MATCH (c:Customer)-[:CUSTOMER_OF]->(n) RETURN c.name AS who "
            "UNION ALL WITH n "
            "MATCH (s:Supplier)-[:SUPPLIER_OF]->(n) RETURN s.name AS who } "
            "RETURN count(*) AS k"
        ),
    )
    assert got["rows"][0]["k"] == 160  # 150 customers + 10 suppliers
    got = _get(
        server,
        "/cypher",
        q=(
            "MATCH (r:Region) RETURN r.name AS rn, "
            "[(n:Nation)-[:NATION_OF]->(r) | n.name] AS ns ORDER BY rn"
        ),
    )
    assert got["n"] == 5 and all(len(r["ns"]) == 5 for r in got["rows"])
    got = _get(
        server,
        "/cypher",
        q="MATCH (n:Nation) RETURN n {.name} AS m, n.name AS nm ORDER BY nm LIMIT 1",
    )
    assert got["rows"][0]["m"] == {"name": "NATION_0"}
    got = _get(
        server,
        "/cypher",
        q="MATCH (c:Customer)-[]->{2}(x) RETURN count(*) AS k",
    )
    assert got["rows"][0]["k"] == 150


def test_cypher_endpoint_400_on_bad_now(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/cypher", q="RETURN date() AS d", params='{"now": "6/1/1997"}')
    assert ei.value.code == 400


def test_cypher_endpoint_fact_tier_and_typed_literal_400(server):
    """Round-12 over HTTP: a fact-tier query routes onto the business
    superset on the default graph; the {id: <int>} class surfaces as a
    targeted 400, not a mid-job executor failure."""
    got = _get(
        server,
        "/cypher",
        q="MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN count(*) AS n",
    )
    assert got["rows"][0]["n"] > 0
    b = _get(server, "/cypher", q="MATCH (n) RETURN count(*) AS n", graph="business")
    h = _get(server, "/cypher", q="MATCH (n) RETURN count(*) AS n")
    assert b["rows"][0]["n"] > h["rows"][0]["n"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/cypher", q="MATCH (c:Customer {id: 1}) RETURN c.name")
    assert ei.value.code == 400
    assert "string literal" in json.loads(ei.value.read())["error"]
