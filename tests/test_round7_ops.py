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
