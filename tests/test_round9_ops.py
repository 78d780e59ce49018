"""Round-9 Cypher surface: per-label keys()/properties()."""

from __future__ import annotations

from mimranalytics_core_spark import api

SF = "/root/testdata/sf0.001"


def test_keys_labeled_fold_per_label(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (s:Supplier)-[:SUPPLIER_OF]->(n:Nation)
           RETURN array_join(keys(s), ',') AS sk,
                  array_join(keys(n), ',') AS nk,
                  count(*) AS k""",
    ).collect()
    assert rows[0].sk == "id,label,name,acctbal,nationkey,suppkey"
    assert rows[0].nk == "id,label,name,nationkey,regionkey"


def test_keys_unlabeled_runtime_case(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (x)
           RETURN array_join(keys(x), ',') AS ks, count(*) AS n
           ORDER BY ks""",
    ).collect()
    got = {r.ks: r.n for r in rows}
    assert got["id,label,name,acctbal,mktsegment,nationkey,custkey"] > 0  # customers
    assert got["id,label,name,acctbal,nationkey,suppkey"] > 0  # suppliers
    assert got["id,label,name,nationkey,regionkey"] == 25  # nations
    assert got["id,label,name,regionkey"] == 5  # regions


def test_properties_labeled_carries_per_label_fields(spark):
    row = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WHERE c.id = 'c:1'
           RETURN properties(c) AS cp, properties(n) AS np""",
    ).collect()[0]
    assert set(row.cp.asDict()) == {
        "id", "label", "name", "acctbal", "mktsegment", "nationkey", "custkey"
    }
    assert row.cp.id == "c:1" and row.cp.label == "customer"
    assert row.cp.acctbal is not None and row.cp.mktsegment is not None
    assert set(row.np.asDict()) == {"id", "label", "name", "nationkey", "regionkey"}


def test_with_skip_limit_without_order_by(spark):
    # r8 verdict #6: Neo4j allows unordered WITH pagination — now lifted
    # via an implicit ascending total order over all stage outputs, so the
    # page is deterministic across runs/partitionings
    q = """MATCH (n:Nation)
           WITH n.name AS nm SKIP 3 LIMIT 4
           RETURN nm ORDER BY nm"""
    first = [r.nm for r in api.cypher(spark, SF, q).collect()]
    second = [r.nm for r in api.cypher(spark, SF, q).collect()]
    assert first == second and len(first) == 4
    # implicit order = ascending over the stage output, so the page is
    # exactly nations 3..6 in name order
    allnm = [
        r.nm
        for r in api.cypher(
            spark, SF, "MATCH (n:Nation) WITH n.name AS nm RETURN nm ORDER BY nm"
        ).collect()
    ]
    assert first == sorted(allnm)[3:7]


def test_now_param_pins_noarg_temporals(spark):
    # r8 verdict #8 stretch: $now makes no-arg now()/date()/datetime()
    # deterministic at bind time
    import datetime

    row = api.cypher(
        spark,
        SF,
        "RETURN date() AS d, now() AS ts, datetime() AS dt",
        params={"now": "1997-06-01 12:30:00"},
    ).collect()[0]
    assert row.d == datetime.date(1997, 6, 1)
    assert row.ts == datetime.datetime(1997, 6, 1, 12, 30)
    assert row.dt == row.ts


def test_noarg_temporals_without_now_still_rejected(spark):
    from mimranalytics_core_spark.cypher import CypherSyntaxError

    import pytest as _pytest

    with _pytest.raises(CypherSyntaxError):
        api.cypher(spark, SF, "RETURN now() AS ts")


def test_now_inside_string_literal_untouched(spark):
    row = api.cypher(
        spark,
        SF,
        "RETURN 'date()' AS s",
        params={"now": "1997-06-01 12:30:00"},
    ).collect()[0]
    assert row.s == "date()"


def test_collect_subquery_list_semantics(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (r:Region)
           RETURN r.name AS rn,
                  COLLECT { (n:Nation)-[:NATION_OF]->(r)
                            RETURN n.name } AS nations
           ORDER BY rn""",
    ).collect()
    assert len(rows) == 5
    assert all(len(r.nations) == 5 for r in rows)
    assert all(r.nations == sorted(r.nations) for r in rows)  # lexical pin


def test_collect_subquery_zero_match_reads_empty_list(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           RETURN n.name AS nm,
                  COLLECT { (s:Supplier)-[:SUPPLIER_OF]->(n)
                            RETURN DISTINCT s.name } AS sups
           ORDER BY nm""",
    ).collect()
    assert len(rows) == 25
    assert any(r.sups == [] for r in rows)  # never null, always a list
    assert all(r.sups is not None for r in rows)


def test_collect_subquery_order_by_rejected(spark):
    import pytest as _pytest

    from mimranalytics_core_spark.cypher import CypherSyntaxError

    with _pytest.raises(CypherSyntaxError, match="ORDER BY/SKIP/LIMIT inside COLLECT"):
        api.cypher(
            spark,
            SF,
            """MATCH (r:Region)
               RETURN r.name AS rn,
                      COLLECT { (n:Nation)-[:NATION_OF]->(r)
                                RETURN n.name ORDER BY n.name LIMIT 2 } AS xs""",
        )
