"""Round-7 additions: ADVICE backslash round-trips (UNWIND / CONTAINS),
the linear-output reshape of cypher_expr_coalesce, Cypher inline property
maps, path variables, MP4 box metadata, and write-clause posture."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_unwind_param_backslash_round_trips(spark):
    """bind_params doubles backslashes for the F.expr path; the UNWIND
    list-literal branch feeds F.lit directly and must UNDO that doubling
    (ADVICE r6: 'a\\b' round-tripped as a two-backslash string)."""
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark, SF_SMALL, "UNWIND $xs AS x RETURN x", params={"xs": ["a\\b", "c\\"]}
    ).collect()
    assert sorted(r.x for r in rows) == ["a\\b", "c\\"]


def test_contains_param_backslash_matches_single(spark):
    """STARTS WITH / ENDS WITH / CONTAINS literals arrive pre-doubled from
    bind_params; the LIKE rewrite must escape ONE actual backslash to four
    in the SQL text, not eight (ADVICE r6: the pattern matched two
    backslashes per original one)."""
    from mimranalytics_core_spark import api

    # No customer name contains a backslash — but the query must compile
    # and filter on ONE backslash, not crash or silently match nothing
    # for the wrong reason. Build a positive case via UNWIND + WHERE.
    rows = api.cypher(
        spark,
        SF_SMALL,
        "UNWIND $xs AS x MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WHERE x CONTAINS $needle RETURN DISTINCT x",
        params={"xs": ["hit\\mid", "miss"], "needle": "t\\m"},
    ).collect()
    assert [r.x for r in rows] == ["hit\\mid"]


def test_starts_ends_with_param_backslash(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        "UNWIND $xs AS x MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WHERE x STARTS WITH $p RETURN DISTINCT x",
        params={"xs": ["\\lead", "other"], "p": "\\l"},
    ).collect()
    assert [r.x for r in rows] == ["\\lead"]
    rows = api.cypher(
        spark,
        SF_SMALL,
        "UNWIND $xs AS x MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WHERE x ENDS WITH $s RETURN DISTINCT x",
        params={"xs": ["tail\\", "other"], "s": "l\\"},
    ).collect()
    assert [r.x for r in rows] == ["tail\\"]


# ---- Cypher inline property maps (r6 verdict task 2) ----


def test_property_map_id_equality(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark, SF_SMALL, "MATCH (c {id: 'c:42'})-[:CUSTOMER_OF]->(n) RETURN c, n"
    ).collect()
    assert len(rows) == 1 and rows[0].c == "c:42"


def test_property_map_name_on_nonstart_var(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (s:Supplier)-[:SUPPLIER_OF]->(n {name: 'NATION_3'}) "
        "RETURN s, n.name AS nname ORDER BY s",
    ).collect()
    assert len(rows) >= 1
    assert all(r.nname == "NATION_3" for r in rows)


def test_property_map_optional_null_extends(spark):
    """A map on an OPTIONAL MATCH node filters BEFORE the left join —
    non-matching rows null-extend instead of vanishing (Neo4j scoping)."""
    from mimranalytics_core_spark import api

    base = api.cypher(
        spark, SF_SMALL, "MATCH (c)-[:CUSTOMER_OF]->(n) RETURN c"
    ).count()
    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) "
        "OPTIONAL MATCH (s {name: 'NO_SUCH_SUPPLIER'})-[:SUPPLIER_OF]->(n) "
        "RETURN c, coalesce(s.id, 'none') AS sid",
    ).collect()
    assert len(rows) == base > 0
    assert all(r.sid == "none" for r in rows)


def test_property_map_pushes_below_first_join(spark):
    """An id map on the start variable must reach the scan side — the
    equality filter sits BELOW the first join in the physical plan."""
    import contextlib
    import io

    from mimranalytics_core_spark import api

    df = api.cypher(
        spark, SF_SMALL, "MATCH (c {id: 'c:42'})-[:CUSTOMER_OF]->(n) RETURN c, n"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    import re as _re

    # operator ids number leaves-first: a Filter BELOW a join has a
    # smaller id than the join. Split the detail dump into (id, body)
    # sections; the filter carrying the literal must sit under every join.
    sections = _re.split(r"\n\((\d+)\) ", "\n" + plan)
    ops = list(zip(sections[1::2], sections[2::2]))  # (id, "Name\n...body")
    filt_ids = [int(i) for i, b in ops if b.startswith("Filter") and "c:42" in b]
    join_ids = [int(i) for i, b in ops if "Join" in b.split("\n", 1)[0]]
    assert filt_ids and join_ids, plan
    assert min(filt_ids) < min(join_ids), plan


def test_property_map_after_with_stage(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) WITH n, count(*) AS cnt "
        "MATCH (s:Supplier {name: 'Supplier#000000001'})-[:SUPPLIER_OF]->(n) "
        "RETURN n, cnt, s.name AS sn",
    ).collect()
    assert len(rows) == 1 and rows[0].sn == "Supplier#000000001"


def test_property_map_optional_after_with_rejected(spark):
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    with pytest.raises(CypherSyntaxError, match="OPTIONAL MATCH after WITH"):
        parse(
            "MATCH (c)-[:CUSTOMER_OF]->(n) WITH n, count(*) AS cnt "
            "OPTIONAL MATCH (s {name: 'X'})-[:SUPPLIER_OF]->(n) "
            "RETURN n, cnt"
        )


def test_property_map_unknown_key_rejected(spark):
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    with pytest.raises(CypherSyntaxError, match="unknown node property"):
        parse("MATCH (c {nope: 'x'})-[:CUSTOMER_OF]->(n) RETURN c")


def test_property_map_bad_entry_rejected(spark):
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    with pytest.raises(CypherSyntaxError, match="property-map entry"):
        parse("MATCH (c {id: foo})-[:CUSTOMER_OF]->(n) RETURN c")


def test_property_map_empty_is_noop(spark):
    from mimranalytics_core_spark import api

    a = api.cypher(
        spark, SF_SMALL, "MATCH (c {})-[:CUSTOMER_OF]->(n) RETURN c"
    ).count()
    b = api.cypher(spark, SF_SMALL, "MATCH (c)-[:CUSTOMER_OF]->(n) RETURN c").count()
    assert a == b > 0


def test_property_map_param_binds(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c {id: $cid})-[:CUSTOMER_OF]->(n) RETURN c",
        params={"cid": "c:7"},
    ).collect()
    assert [r.c for r in rows] == ["c:7"]


def test_property_map_with_label_and_where_combine(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c:Customer {id: 'c:42'})-[:CUSTOMER_OF]->(n) "
        "WHERE n.name STARTS WITH 'NATION_' RETURN c, n.name AS nn",
    ).collect()
    assert len(rows) == 1 and rows[0].nn.startswith("NATION_")


# ---- reshaped cypher_expr_coalesce (r6 verdict task 1) ----


def test_cypher_expr_coalesce_linear_output(spark):
    """The declared op returns ONE row per customer (O(sf)), not one per
    (customer x co-national supplier) binding (~quadratic in sf)."""
    from mimranalytics_core_spark.registry import all_ops

    df = all_ops()["cypher_expr_coalesce"].fn(spark, SF_SMALL)
    n_cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    rows = df.collect()
    assert len(rows) == n_cust
    assert set(df.columns) == {"c", "first_sup", "n_sup"}
    # nations without suppliers coalesce; with suppliers carry the min name
    assert any(r.first_sup == "no-local-supplier" and r.n_sup == 0 for r in rows) or all(
        r.n_sup > 0 for r in rows
    )
    assert all((r.n_sup == 0) == (r.first_sup == "no-local-supplier") for r in rows)
