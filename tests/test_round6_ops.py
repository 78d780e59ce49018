"""Round-6 additions: ADVICE fixes (bind_params backslash escaping is in
test_round5_ops), Cypher inline property maps, path variables, MP4 box
metadata, write-clause posture, bounded coalesce query."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_unwind_empty_list_types_with_any_predicate(spark):
    """UNWIND [] must produce a zero-row frame whose column analyzes
    against STRING predicates downstream (the old range(0).id LONG
    column failed analysis / cast-diverged)."""
    from mimranalytics_core_spark import cypher

    df = cypher.run(
        spark,
        SF_SMALL,
        "UNWIND [] AS x MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
        "WHERE c.id = x RETURN c.id AS id",
    )
    assert df.count() == 0
    df2 = cypher.run(spark, SF_SMALL, "UNWIND $xs AS x RETURN x", params={"xs": []})
    assert df2.count() == 0
