"""Round-10 regressions: the four r9 ADVICE items.

1. (medium, cypher.py _apply_call) a correlated CALL body that returns a
   grouping key ALONGSIDE an aggregate yields ZERO rows per zero-match
   outer row in Neo4j (grouped aggregate over an empty frame) — the old
   unconditional left-join+coalesce fabricated `key=None, count=0` rows.
2. (low, cypher.py _prepare_call) a RETURN alias shadowing an
   importing-WITH variable made the textual re-append check treat the
   import as present, silently equi-joining ids against the shadowing
   expression — now rejected at parse time (Neo4j: variable already
   declared).
3. (low, bench.py) SPARK_GRAFT_BENCH_ONLY without SPARK_GRAFT_BENCH_OUT
   would overwrite the full sf0.1 BENCH_LOCAL.json with a partial record —
   now a fast SystemExit before Spark starts.
4. (low, cypher.py bind_params) a non-ISO $now produced a malformed
   date('…') literal that died later as an opaque Spark error — now a
   bind-time CypherSyntaxError.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

from mimranalytics_core_spark import api
from mimranalytics_core_spark.cypher import CypherSyntaxError, bind_params

SF = "/root/testdata/sf0.001"
REPO = Path(__file__).resolve().parents[1]

MIXED_BODY = """MATCH (n:Nation)
   {opt}CALL {{ WITH n MATCH (s:Supplier)-[:SUPPLIER_OF]->(n)
          RETURN s.name AS sname, count(*) AS k }}
   RETURN n.name AS nm, sname, k ORDER BY nm"""


def test_mixed_key_agg_call_drops_zero_match_rows(spark):
    # plain CALL + grouped aggregate body: zero-supplier nations get ZERO
    # body rows (not a fabricated sname=None, k=0 row)
    rows = api.cypher(spark, SF, MIXED_BODY.format(opt="")).collect()
    assert rows, "suppliers exist at sf0.001"
    assert all(r.sname is not None for r in rows)
    assert all(r.k >= 1 for r in rows)
    # sf0.001 has supplier-less nations → they drop entirely
    assert len({r.nm for r in rows}) < 25


def test_mixed_key_agg_optional_call_null_extends_without_coalesce(spark):
    # OPTIONAL CALL keeps every outer row; the zero-match extension is
    # all-null — k must stay null, NOT be coalesced to 0 (0 would claim a
    # grouped row that Neo4j never produces)
    rows = api.cypher(spark, SF, MIXED_BODY.format(opt="OPTIONAL ")).collect()
    assert len({r.nm for r in rows}) == 25
    null_ext = [r for r in rows if r.sname is None]
    assert null_ext, "sf0.001 has supplier-less nations"
    assert all(r.k is None for r in null_ext)
    matched = [r for r in rows if r.sname is not None]
    assert matched and all(r.k >= 1 for r in matched)


def test_pure_agg_call_still_coalesces_to_zero(spark):
    # the pure-aggregate path (every non-import item an aggregate) keeps
    # the left-join + count-coalesce cardinality
    rows = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           CALL { WITH n MATCH (s:Supplier)-[:SUPPLIER_OF]->(n)
                  RETURN count(*) AS ns }
           RETURN n.name AS nm, ns ORDER BY nm""",
    ).collect()
    assert len(rows) == 25
    assert min(r.ns for r in rows) == 0 and all(r.ns is not None for r in rows)


def test_return_alias_shadowing_import_rejected(spark):
    with pytest.raises(CypherSyntaxError, match="shadows importing-WITH"):
        api.cypher(
            spark,
            SF,
            """MATCH (n:Nation)
               CALL { WITH n MATCH (s:Supplier)-[:SUPPLIER_OF]->(n)
                      RETURN s.name AS n }
               RETURN n""",
        )


def test_bare_import_passthrough_still_allowed(spark):
    # `RETURN n` (the bare import) is the legal passthrough, not a shadow
    rows = api.cypher(
        spark,
        SF,
        """MATCH (r:Region)
           CALL { WITH r MATCH (n:Nation)-[:NATION_OF]->(r) RETURN n, r }
           RETURN r.name AS rn, count(n) AS c ORDER BY rn""",
    ).collect()
    assert [r.c for r in rows] == [5] * 5


@pytest.mark.parametrize("bad", ["6/1/1997", "866764800000", "June 1 1997", "97-06-01"])
def test_non_iso_now_rejected_at_bind_time(bad):
    with pytest.raises(CypherSyntaxError, match=r"\$now must be an ISO"):
        bind_params("RETURN date() AS d", {"now": bad})


@pytest.mark.parametrize(
    "good",
    ["1997-06-01", "1997-06-01 12:30:00", "1997-06-01T12:30:00.123", "1997-06-01 12:30"],
)
def test_iso_now_accepted(good):
    out = bind_params("RETURN date() AS d", {"now": good})
    assert "date('1997-06-01')" in out


def test_bench_only_without_out_exits_before_spark():
    env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY="agg_global")
    env.pop("SPARK_GRAFT_BENCH_OUT", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=60,  # guard fires before Spark init, so this is instant
    )
    assert proc.returncode != 0
    assert "SPARK_GRAFT_BENCH_OUT" in proc.stderr


# --- pattern comprehensions (desugar to COLLECT{}) ---


def test_pattern_comprehension_basic(spark):
    import pyspark.sql.functions as F

    df = api.cypher(
        spark,
        SF,
        """MATCH (r:Region)
           RETURN r.name AS rn, [(n:Nation)-[:NATION_OF]->(r) | n.name] AS ns
           ORDER BY rn""",
    )
    rows = df.select("rn", F.size("ns").alias("k")).collect()
    assert len(rows) == 5 and all(r.k == 5 for r in rows)


def test_pattern_comprehension_where_and_empty_list(spark):
    import pyspark.sql.functions as F

    rows = (
        api.cypher(
            spark,
            SF,
            """MATCH (n:Nation)
               RETURN n.name AS nm,
                      [(c:Customer)-[:CUSTOMER_OF]->(n)
                       WHERE c.acctbal > 9000 | c.name] AS vip
               ORDER BY nm""",
        )
        .select("nm", F.size("vip").alias("k"))
        .collect()
    )
    assert len(rows) == 25  # zero-match nations read [] (k=0), not drop
    assert min(r.k for r in rows) == 0 and max(r.k for r in rows) >= 1


def test_pattern_comprehension_reltype_alternation_pipe(spark):
    import pyspark.sql.functions as F

    rows = (
        api.cypher(
            spark,
            SF,
            """MATCH (n:Nation)
               RETURN n.name AS nm,
                      [(x)-[:CUSTOMER_OF|SUPPLIER_OF]->(n) | x.name] AS members
               ORDER BY nm""",
        )
        .select(F.sum(F.size("members")).alias("t"))
        .collect()
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    supp = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert rows[0].t == cust + supp


def test_list_expressions_not_mistaken_for_pattern_comprehension(spark):
    # literals, slices, and list comprehensions keep their own paths
    row = api.cypher(
        spark,
        SF,
        "RETURN [1, 2, 3][-1] AS last_el, "
        "[x IN range(1, 5) WHERE x % 2 = 0 | x * x][0] AS lc",
    ).collect()[0]
    assert row.last_el == 3 and row.lc == 4


def test_pattern_comprehension_helper_unit():
    from mimranalytics_core_spark.cypher import _pattern_comprehension_to_collect as pc

    assert (
        pc("[(a)-[:X]->(b) | b.name] AS xs")
        == "COLLECT { (a)-[:X]->(b) RETURN b.name } AS xs"
    )
    assert (
        pc("[(a)-[:X|Y]->(b) WHERE b.v > 1 | b.name] AS xs")
        == "COLLECT { (a)-[:X|Y]->(b) WHERE b.v > 1 RETURN b.name } AS xs"
    )
    assert pc("[1, 2, 3] AS lit") is None
    assert pc("[x IN lst | x] AS lc") is None  # no leading node pattern
    assert pc("[(a)-->(b) | coalesce(b.name, '|')] AS xs") is not None


# --- map projections ---


def test_map_projection_selectors(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           RETURN c {.name, .acctbal} AS cm, n.name AS nm
           ORDER BY nm LIMIT 3""",
    ).collect()
    assert rows and set(rows[0].cm.asDict()) == {"name", "acctbal"}
    assert rows[0].cm.name.startswith("Customer#")


def test_map_projection_star_is_properties(spark):
    row = api.cypher(
        spark,
        SF,
        "MATCH (c:Customer) RETURN c {.*} AS cm, c.name AS nm ORDER BY nm LIMIT 1",
    ).collect()[0]
    assert set(row.cm.asDict()) == {
        "id", "label", "name", "acctbal", "mktsegment", "nationkey", "custkey"
    }


def test_map_projection_id_selector(spark):
    row = api.cypher(
        spark,
        SF,
        "MATCH (n:Nation) RETURN n {.id, .name} AS m, n.name AS nm ORDER BY nm LIMIT 1",
    ).collect()[0]
    assert row.m.asDict() == {"id": "n:0", "name": "NATION_0"}


def test_map_projection_star_with_selectors_rejected(spark):
    with pytest.raises(CypherSyntaxError, match=r"`\.\*` must be the only"):
        api.cypher(spark, SF, "MATCH (n:Nation) RETURN n {.*, .name} AS m")


def test_pattern_property_maps_untouched_by_map_projection(spark):
    rows = api.cypher(
        spark, SF, "MATCH (n:Nation {name: 'NATION_3'}) RETURN n.name AS nm"
    ).collect()
    assert len(rows) == 1 and rows[0].nm == "NATION_3"


# --- quantified-relationship shorthand (Neo4j 5) ---


def test_quantified_rel_equals_varlength(spark):
    a = api.cypher(
        spark, SF, "MATCH (c:Customer)-[]->{1,2}(x) RETURN c, x ORDER BY c, x"
    ).collect()
    b = api.cypher(
        spark, SF, "MATCH (c:Customer)-[*1..2]->(x) RETURN c, x ORDER BY c, x"
    ).collect()
    assert a == b and a


def test_quantified_rel_exact_and_left_arrow(spark):
    k2 = api.cypher(
        spark, SF, "MATCH (c:Customer)-[]->{2}(x) RETURN count(*) AS k"
    ).collect()[0].k
    assert k2 == spark.read.parquet(f"{SF}/customer.parquet").count()
    kl = api.cypher(
        spark, SF, "MATCH (x)<-[]-{2}(c:Customer) RETURN count(*) AS k"
    ).collect()[0].k
    assert kl == k2


@pytest.mark.parametrize(
    "q,frag",
    [
        ("MATCH (a)-[:CUSTOMER_OF]->+(b) RETURN a", "unbounded relationship quantifiers"),
        ("MATCH (a)-[:CUSTOMER_OF]->{0,2}(b) RETURN a", "zero/open-start"),
        ("MATCH (a)-[:CUSTOMER_OF]->{1,}(b) RETURN a", "unbounded quantifier"),
        ("MATCH (a)-[:CUSTOMER_OF*1..2]->{1,2}(b) RETURN a", "double quantifier"),
        ("MATCH ((a)-[:CUSTOMER_OF]->(b)){1,2} RETURN a", "parenthesized quantified path"),
    ],
)
def test_quantified_rel_rejections(spark, q, frag):
    with pytest.raises(CypherSyntaxError, match=frag):
        api.cypher(spark, SF, q)


def test_element_id_is_id(spark):
    # Neo4j 5 elementId(n) — same identity as id(n) on the namespaced ids
    rows = api.cypher(
        spark,
        SF,
        "MATCH (n:Nation) WHERE elementId(n) = 'n:3' "
        "RETURN elementId(n) AS eid, id(n) AS iid",
    ).collect()
    assert len(rows) == 1 and rows[0].eid == "n:3" == rows[0].iid


def test_left_right_string_fns(spark):
    row = api.cypher(
        spark,
        SF,
        "MATCH (n:Nation) RETURN left(n.name, 6) AS l6, right(n.name, 2) AS r2, "
        "n.name AS nm ORDER BY nm LIMIT 1",
    ).collect()[0]
    assert row.l6 == "NATION" and row.r2 == "_0"


def test_size_of_pattern_comprehension_is_count_subquery(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (r:Region)
           RETURN r.name AS rn,
                  size([(n:Nation)-[:NATION_OF]->(r) | n.name]) AS k
           ORDER BY rn""",
    ).collect()
    assert len(rows) == 5 and all(r.k == 5 for r in rows)
    # literal-list and string size() keep the length() path
    row = api.cypher(
        spark,
        SF,
        "MATCH (n:Nation) RETURN size([1, 2, 3]) AS lk, size(n.name) AS sk, "
        "n.name AS nm ORDER BY nm LIMIT 1",
    ).collect()[0]
    assert row.lk == 3 and row.sk == len("NATION_0")


# --- COUNT { … } comparisons in WHERE (degree filters) ---


def test_count_where_degree_filter(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           WHERE COUNT { (c:Customer)-[:CUSTOMER_OF]->(n) } >= 8
           RETURN n.name AS nm ORDER BY nm""",
    ).collect()
    chk = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           RETURN n.name AS nm, COUNT { (c:Customer)-[:CUSTOMER_OF]->(n) } AS k""",
    ).collect()
    assert [r.nm for r in rows] == sorted(r.nm for r in chk if r.k >= 8)


def test_count_where_zero_selects_matchless(spark):
    # = 0 must keep exactly the rows with NO match (left join + coalesce;
    # a semi-join formulation cannot express this)
    row = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           WHERE COUNT { (s:Supplier)-[:SUPPLIER_OF]->(n) } = 0
           RETURN count(*) AS k""",
    ).collect()[0]
    assert row.k == 15


def test_count_where_reversed_literal_flips(spark):
    a = api.cypher(
        spark,
        SF,
        "MATCH (n:Nation) WHERE 2 > COUNT { (s:Supplier)-[:SUPPLIER_OF]->(n) } "
        "RETURN count(*) AS k",
    ).collect()[0].k
    b = api.cypher(
        spark,
        SF,
        "MATCH (n:Nation) WHERE COUNT { (s:Supplier)-[:SUPPLIER_OF]->(n) } < 2 "
        "RETURN count(*) AS k",
    ).collect()[0].k
    assert a == b


def test_count_where_no_anchor_rejected(spark):
    with pytest.raises(CypherSyntaxError, match="must share at least one"):
        api.cypher(
            spark,
            SF,
            "MATCH (n:Nation) WHERE COUNT { (a:Customer)-[:CUSTOMER_OF]->"
            "(b:Nation) } > 1 RETURN n",
        )


def test_quantified_rel_composes_with_shortestpath_and_exists(spark):
    a = api.cypher(
        spark,
        SF,
        "MATCH p = shortestPath((c:Customer)-[]->{1,4}(r:Region)) "
        "RETURN c, r, length(p) AS hops ORDER BY c LIMIT 5",
    ).collect()
    b = api.cypher(
        spark,
        SF,
        "MATCH p = shortestPath((c:Customer)-[*1..4]->(r:Region)) "
        "RETURN c, r, length(p) AS hops ORDER BY c LIMIT 5",
    ).collect()
    assert a == b and a
    row = api.cypher(
        spark,
        SF,
        "MATCH (c:Customer) WHERE EXISTS { (c)-[]->{2}(r:Region) } "
        "RETURN count(*) AS k",
    ).collect()[0]
    assert row.k == 150


# --- EXISTS{} / COUNT{} in WITH-stage WHERE ---


def test_with_where_exists_filter(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WITH n, count(*) AS k
           WHERE k >= 5 AND EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) }
           RETURN n.name AS nm, k ORDER BY nm""",
    ).collect()
    chk = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WITH n, count(*) AS k
           RETURN n.name AS nm, k,
                  EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) } AS f ORDER BY nm""",
    ).collect()
    assert [(r.nm, r.k) for r in rows] == [
        (r.nm, r.k) for r in chk if r.k >= 5 and r.f
    ]
    assert rows  # non-trivial at sf0.001


def test_with_where_not_exists_filter(spark):
    row = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WITH n, count(*) AS k
           WHERE NOT EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) }
           RETURN count(*) AS z""",
    ).collect()[0]
    assert row.z == 15  # supplier-less nations (every nation has customers)


def test_with_where_count_comparison(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WITH n, count(*) AS k
           WHERE COUNT { (s:Supplier)-[:SUPPLIER_OF]->(n) } >= 1
           RETURN count(*) AS z""",
    ).collect()
    assert rows[0].z == 10  # nations with >= 1 supplier


def test_with_where_exists_anchor_must_be_stage_output(spark):
    with pytest.raises(CypherSyntaxError, match="must anchor on at least one"):
        api.cypher(
            spark,
            SF,
            """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
               WITH n.name AS nm, count(*) AS k
               WHERE EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) }
               RETURN nm""",
        ).collect()


# --- OR-connected / expression-embedded EXISTS (flag compilation) ---


def _exists_truth(spark):
    return api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           RETURN n.name AS nm,
                  EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) } AS hs,
                  EXISTS { (c:Customer {mktsegment: 'BUILDING'})-[:CUSTOMER_OF]->(n) } AS hb
           ORDER BY nm""",
    ).collect()


def test_exists_or_exists(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           WHERE EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) }
              OR EXISTS { (c:Customer {mktsegment: 'BUILDING'})-[:CUSTOMER_OF]->(n) }
           RETURN n.name AS nm ORDER BY nm""",
    ).collect()
    chk = _exists_truth(spark)
    assert [r.nm for r in rows] == sorted(r.nm for r in chk if r.hs or r.hb)


def test_not_parenthesized_exists_and_scalar(spark):
    row = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           WHERE NOT (EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) }
                      AND n.name STARTS WITH 'NATION_1')
           RETURN count(*) AS k""",
    ).collect()[0]
    chk = _exists_truth(spark)
    assert row.k == len(
        [r for r in chk if not (r.hs and r.nm.startswith("NATION_1"))]
    )


def test_exists_or_scalar(spark):
    row = api.cypher(
        spark,
        SF,
        """MATCH (n:Nation)
           WHERE EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) } OR n.name = 'NATION_3'
           RETURN count(*) AS k""",
    ).collect()[0]
    chk = _exists_truth(spark)
    assert row.k == len([r for r in chk if r.hs or r.nm == "NATION_3"])


def test_exists_or_optional_anchor_still_rejected(spark):
    with pytest.raises(CypherSyntaxError, match="OPTIONAL MATCH variable"):
        api.cypher(
            spark,
            SF,
            """MATCH (n:Nation) OPTIONAL MATCH (s:Supplier)-[:SUPPLIER_OF]->(n)
               WHERE EXISTS { (c:Customer)-[:CUSTOMER_OF]->(s) } OR n.name = 'x'
               RETURN n""",
        ).collect()


def test_bare_pattern_in_or_targeted_error(spark):
    with pytest.raises(CypherSyntaxError, match="wrap them in EXISTS"):
        api.cypher(
            spark,
            SF,
            """MATCH (n:Nation)
               WHERE (s1:Supplier)-[:SUPPLIER_OF]->(n) OR n.name = 'x'
               RETURN n""",
        ).collect()


def test_with_where_exists_or_scalar(spark):
    rows = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WITH n, count(*) AS k
           WHERE EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) } OR k >= 9
           RETURN n.name AS nm ORDER BY nm""",
    ).collect()
    truth = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WITH n, count(*) AS k
           RETURN n.name AS nm, k,
                  EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) } AS hs ORDER BY nm""",
    ).collect()
    assert [r.nm for r in rows] == sorted(r.nm for r in truth if r.hs or r.k >= 9)


def test_with_where_not_exists_inside_parens(spark):
    row = api.cypher(
        spark,
        SF,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
           WITH n, count(*) AS k
           WHERE k >= 2 AND (NOT EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) }
                             OR k >= 9)
           RETURN count(*) AS z""",
    ).collect()[0]
    assert row.z == 17


def test_with_where_count_in_or_rejected(spark):
    with pytest.raises(CypherSyntaxError, match="top-level AND conjunct"):
        api.cypher(
            spark,
            SF,
            """MATCH (c:Customer)-[:CUSTOMER_OF]->(n:Nation)
               WITH n, count(*) AS k
               WHERE COUNT { (s:Supplier)-[:SUPPLIER_OF]->(n) } >= 1 OR k >= 9
               RETURN n""",
        ).collect()
