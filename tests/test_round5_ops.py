"""Round-5 regression/verification tests: ADVICE fixes (zero-vector int8
quantize, PNG IDAT-length validation), Cypher grammar breadth (undirected /
reverse patterns, multi-pattern MATCH, per-clause OPTIONAL WHERE, per-path
multi-segment rows, UNWIND / $param), and the curation-order variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t, tables
from mimranalytics_core_spark.registry import all_ops
from tests.conftest import SF_SMALL

OPS = all_ops()


def test_quantize_int8_all_zero_vector(spark):
    """An all-zero embedding has scale 0 — the guard must reconstruct 0.0
    exactly (no 0/0 NaN) so both engines agree (round-4 ADVICE)."""
    from mimranalytics_core_spark.operators import _base

    df = spark.createDataFrame(
        [(0, [0.0] * 8), (1, [1.0, -2.0] * 4)], "vec_id int, embedding array<double>"
    )
    sid = _base._session_key(spark)
    fake = "mem://zero-vec-fixture"
    _base._CACHE[(sid, fake)] = {"embeddings": df}
    try:
        out = {
            r.vec_id: r
            for r in OPS["sim_embedding_quantize_int8"].fn(spark, fake).collect()
        }
    finally:
        del _base._CACHE[(sid, fake)]
        _base._ACTIVE_SF.pop(sid, None)
    assert out[0].scale == 0.0 and out[0].mse == 0.0 and out[0].max_abs_err == 0.0
    assert out[1].scale > 0.0


def test_png_decode_rejects_truncated_idat():
    import struct as _struct
    import zlib as _zlib

    from mimranalytics_core_spark.functions.multimodal import png_decode, png_pack

    def chunk(tag, body):
        return (
            _struct.pack(">I", len(body))
            + tag
            + body
            + _struct.pack(">I", _zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # truncated IDAT: 2 rows declared, only 1 row of data
    raw = b"\x00" + bytes(4)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt PNG IDAT"):
        png_decode(png)
    # IDAT with no preceding IHDR
    png2 = b"\x89PNG\r\n\x1a\n" + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IHDR"):
        png_decode(png2)


# ---- Cypher direction support (round-4 verdict item 1) ----


def test_cypher_reverse_normalizes_and_pushes_pred():
    from mimranalytics_core_spark.cypher import parse

    p = parse("MATCH (n)<-[:CUSTOMER_OF]-(c) WHERE c.id STARTS WITH 'c:1' RETURN n, c")
    seg = p["segments"][0]
    # (n)<-[:R]-(c) traverses FROM c: normalized forward segment c -> n
    assert (seg["src"], seg["dst"]) == ("c", "n")
    assert seg["direction"] == "out"
    # the predicate names only the traversal start var -> pushes to src_pred
    assert p["src_pred"] is not None and "src LIKE" in p["src_pred"]
    assert p["post_pred"] is None


def test_cypher_reverse_pred_on_written_first_var_is_post_filter():
    from mimranalytics_core_spark.cypher import parse

    p = parse("MATCH (n)<-[:CUSTOMER_OF]-(c) WHERE n.id STARTS WITH 'n:1' RETURN n, c")
    # n is the traversal DST after normalization: must NOT push as src_pred
    assert p["src_pred"] is None
    assert p["post_pred"] is not None and "n LIKE" in p["post_pred"]


def test_cypher_bidirectional_arrow_rejected():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    with pytest.raises(CypherSyntaxError, match="both ways"):
        parse("MATCH (a)<-[:CUSTOMER_OF]->(b) RETURN a, b")


def test_cypher_undirected_parses_direction_both():
    from mimranalytics_core_spark.cypher import parse

    p = parse("MATCH (a:Nation)-[*1..2]-(b) RETURN a, b, hops")
    assert p["segments"][0]["direction"] == "both"


def test_undirected_trail_relationship_identity(spark):
    """Neo4j undirected uniqueness: a 2-hop backtrack over ONE relationship
    is excluded; parallel opposite relationships give TWO distinct 2-hop
    trails (one per traversal order)."""
    from mimranalytics_core_spark.functions.graph_algos import path_rows

    one = spark.createDataFrame([("a", "b", 1.0)], "src string, dst string, weight double")
    rows = path_rows(one, 2, 2, unique_edges=True, undirected=True).collect()
    assert rows == []  # a-b-a over the single relationship is NOT a trail

    par = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], "src string, dst string, weight double"
    )
    rows = path_rows(par, 2, 2, unique_edges=True, undirected=True).collect()
    back = [r for r in rows if r.src == "a" and r.dst == "a"]
    assert len(back) == 2  # r1 then r2, and r2 then r1


# ---- comma multi-pattern + per-clause WHERE (verdict items 2-3) ----


def test_comma_pattern_parses_as_one_clause():
    from mimranalytics_core_spark.cypher import parse

    p = parse(
        "MATCH (c)-[:CUSTOMER_OF]->(n), (s)-[:SUPPLIER_OF]->(n) RETURN n, count(*) AS k"
    )
    assert len(p["clauses"]) == 1
    assert len(p["clauses"][0]["segments"]) == 2
    assert {s["dst"] for s in p["clauses"][0]["segments"]} == {"n"}


def test_comma_pattern_disconnected_parses(spark):
    # round-12 (r11 VERDICT missing #6): disconnected comma chains are
    # Neo4j cartesian products now — the parse succeeds and the frame
    # cross-joins (hash-joined when the WHERE carries the equality; see
    # tests/test_round12_ops.py and the plan assert)
    from mimranalytics_core_spark.cypher import parse

    p = parse("MATCH (a)-[:CUSTOMER_OF]->(b), (x)-[:SUPPLIER_OF]->(y) RETURN a, x")
    assert len(p["clauses"][0]["segments"]) == 2


def test_per_clause_where_attaches_to_clause():
    from mimranalytics_core_spark.cypher import parse

    p = parse(
        "MATCH (c)-[:CUSTOMER_OF]->(n) "
        "OPTIONAL MATCH (s)-[:SUPPLIER_OF]->(n) WHERE s.id STARTS WITH 's:1' "
        "RETURN n, count(s) AS k"
    )
    assert p["clauses"][0]["where"] is None
    assert p["clauses"][1]["where"] is not None and "s LIKE" in p["clauses"][1]["where"]
    assert p["post_pred"] is None


def test_per_clause_where_foreign_var_rejected():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    with pytest.raises(CypherSyntaxError, match="that clause's pattern variables"):
        parse(
            "MATCH (c)-[:CUSTOMER_OF]->(n) "
            "OPTIONAL MATCH (s)-[:SUPPLIER_OF]->(n) WHERE c.id STARTS WITH 'c:1' "
            "OPTIONAL MATCH (n)-[:NATION_OF]->(r) "
            "RETURN n, count(s) AS k"
        )


def test_trailing_where_optional_conjunct_rescoped():
    from mimranalytics_core_spark.cypher import parse

    p = parse(
        "MATCH (c)-[:CUSTOMER_OF]->(n) "
        "OPTIONAL MATCH (s)-[:SUPPLIER_OF]->(n) "
        "WHERE s.id STARTS WITH 's:1' AND c.id STARTS WITH 'c:1' "
        "RETURN n, count(s) AS k"
    )
    # the s-conjunct moved into the optional clause; the c-conjunct stayed
    assert p["clauses"][1]["where"] is not None and "s LIKE" in p["clauses"][1]["where"]
    assert p["post_pred"] is not None and "c LIKE" in p["post_pred"]
    assert "s LIKE" not in p["post_pred"]


def test_optional_where_null_extends_not_drops(spark):
    """THE divergence regression (verdict item 3 done-criterion): an
    impossible per-clause predicate must null-extend every row (Neo4j),
    where a post-filter would return an empty frame."""
    from mimranalytics_core_spark import api

    base = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n)
           RETURN n, count(c) AS n_cust ORDER BY n""",
    ).collect()
    opt = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n)
           OPTIONAL MATCH (s)-[:SUPPLIER_OF]->(n) WHERE s.id STARTS WITH 'zzz'
           RETURN n, count(c) AS n_cust, count(s) AS n_sup ORDER BY n""",
    ).collect()
    assert len(opt) == len(base) > 0
    assert all(r.n_sup == 0 for r in opt)
    assert [(r.n, r.n_cust) for r in opt] == [(r.n, r.n_cust) for r in base]


# ---- UNWIND + $param (verdict item 6) ----


def test_bind_params_outside_quotes_and_types():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, bind_params

    q = bind_params(
        "MATCH (a) WHERE a.id = $s AND '$s' = '$s' AND hops >= $n RETURN a LIMIT $n",
        {"s": "c:1", "n": 3},
    )
    assert q == "MATCH (a) WHERE a.id = 'c:1' AND '$s' = '$s' AND hops >= 3 RETURN a LIMIT 3"
    assert bind_params("RETURN $xs", {"xs": [1, 2.5, "a"]}) == "RETURN [1, 2.5, 'a']"
    with pytest.raises(CypherSyntaxError, match="missing query parameter"):
        bind_params("RETURN $nope", {})
    with pytest.raises(CypherSyntaxError, match="single quotes"):
        bind_params("RETURN $s", {"s": "o'brien"})


def test_bind_params_escapes_backslashes():
    """A trailing-backslash param must not shift string boundaries
    (Spark SQL treats \\' as an escaped quote — injection vector)."""
    from mimranalytics_core_spark.cypher import bind_params

    q = bind_params(
        "MATCH (a) WHERE a.id = $a AND a.id = $b RETURN a",
        {"a": "x\\", "b": " OR 1=1 --"},
    )
    # Each backslash doubled; the closing quote stays a closing quote.
    assert q == (
        "MATCH (a) WHERE a.id = 'x\\\\' AND a.id = ' OR 1=1 --' RETURN a"
    )
    assert bind_params("RETURN $s", {"s": "a\\b"}) == "RETURN 'a\\\\b'"


def test_bind_params_backslash_end_to_end(spark):
    """Round-trip through Spark SQL: a backslash-containing parameter
    must stay an always-false predicate (no node id contains a
    backslash), not become a match-all via a shifted string boundary."""
    from mimranalytics_core_spark import cypher

    out = cypher.run(
        spark,
        SF_SMALL,
        "MATCH (c:Customer)-[:CUSTOMER_OF]->(n) WHERE c.id = $a RETURN c.id AS id",
        params={"a": "x\\"},
    )
    assert out.count() == 0


def test_unwind_parse_and_guards():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    p = parse("UNWIND [1, 2, 3] AS x RETURN x ORDER BY x")
    assert p["unwinds"] == [{"var": "x", "values": [("i", 1), ("i", 2), ("i", 3)]}]
    assert p["clauses"] == [] and p["segments"] == []
    with pytest.raises(CypherSyntaxError, match="collides"):
        parse("UNWIND [1] AS a MATCH (a)-[:CUSTOMER_OF]->(b) RETURN a, b")
    with pytest.raises(CypherSyntaxError, match="no properties"):
        parse("UNWIND [1] AS x MATCH (a)-[:CUSTOMER_OF]->(b) WHERE a.id = x RETURN x.name")
    # an empty list is VALID and yields zero rows (Neo4j semantics)
    assert parse("UNWIND [] AS x RETURN x")["unwinds"] == [{"var": "x", "values": []}]


# ---- scalar expression items ----


def test_scalar_expression_items(spark):
    from mimranalytics_core_spark import api
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    rows = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[r:CUSTOMER_OF]->(n)
           RETURN c, round(r.weight * 100, 1) AS pct
           ORDER BY pct DESC, c ASC LIMIT 3""",
    ).collect()
    assert rows == sorted(rows, key=lambda r: (-r.pct, r.c))
    # coalesce over an OPTIONAL MATCH null-extension
    got = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[:CUSTOMER_OF]->(n)
           OPTIONAL MATCH (s:Supplier)-[:SUPPLIER_OF]->(n)
           RETURN c, coalesce(s.id, 'none') AS sup ORDER BY c, sup""",
    ).collect()
    assert any(r.sup == "none" for r in got)
    assert any(r.sup.startswith("s:") for r in got)
    # expression as implicit grouping key + CAST's inner AS parsing
    agg = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) "
        "RETURN CAST(length(c.name) AS STRING) AS ln, count(*) AS k ORDER BY ln",
    ).collect()
    assert agg and all(r.k > 0 for r in agg)
    # unknown function/identifier fails at parse time
    with pytest.raises(CypherSyntaxError):
        parse("MATCH (a)-[:CUSTOMER_OF]->(b) RETURN nonsense(zz) + 1 AS x")
    # top-level comma split keeps function arguments intact
    p = parse(
        "MATCH (a)-[:CUSTOMER_OF]->(b) RETURN a, coalesce(a.name, 'x, y') AS v"
    )
    assert [it["name"] for it in p["projection"]] == ["a", "v"]


# ---- per-segment relationship weights ----


def test_multi_segment_rel_weights(spark):
    from mimranalytics_core_spark import api
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    rows = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[r1:CUSTOMER_OF]->(n)-[r2:NATION_OF]->(reg)
           RETURN c, r1.weight AS w1, r2.weight AS w2 ORDER BY c LIMIT 5""",
    ).collect()
    assert rows and all(0.0 <= r.w1 <= 1.0 and r.w2 == 1.0 for r in rows)
    # single-segment r.weight still rides path_weight (unchanged behavior)
    p = parse("MATCH (a)-[r:CUSTOMER_OF]->(b) RETURN a, r.weight AS w")
    assert any(it.get("col") == "path_weight" for it in p["projection"])
    # var-length segment rejects r.weight (Neo4j binds a list there)
    with pytest.raises(CypherSyntaxError, match="single-hop segment"):
        parse(
            "MATCH (a)-[r:CUSTOMER_OF*1..2]->(b)-[:NATION_OF]->(c) "
            "RETURN r.weight"
        )
    # per-nation share sums are ~1.0 (the renormalized ownership weights)
    sums = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[r1:CUSTOMER_OF]->(n)-[r2:NATION_OF]->(reg)
           RETURN n, sum(r1.weight) AS tot ORDER BY n""",
    ).collect()
    assert sums and all(abs(r.tot - 1.0) < 1e-4 for r in sums)


# ---- round-5 review fixes ----


def test_exists_inherits_as_of_time_slice():
    """An EXISTS sub-query must run on the SAME time slice as the outer
    MATCH (review finding: it ran against the un-sliced graph)."""
    from mimranalytics_core_spark.cypher import parse

    p = parse(
        "MATCH (a)-[:OWNS_STAKE]->(b) AS OF '2020-06-01' "
        "WHERE EXISTS { (a)-[:OWNS_STAKE]->(x) } RETURN a, b"
    )
    assert "AS OF '2020-06-01'" in p["exists_preds"][0]["query"]
    inner = parse(p["exists_preds"][0]["query"])
    assert inner["as_of"] == "2020-06-01"


def test_exists_on_optional_variable_is_rejected():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    with pytest.raises(CypherSyntaxError, match="OPTIONAL MATCH variable"):
        parse(
            "MATCH (c)-[:CUSTOMER_OF]->(n) OPTIONAL MATCH (s)-[:SUPPLIER_OF]->(n) "
            "WHERE EXISTS { (s)-[:SUPPLIER_OF]->(n2) } RETURN n"
        )


def test_brace_literal_in_string_survives(spark):
    """A literal containing braces or keyword-cased words must survive the
    EXISTS brace masking byte-for-byte (review finding: '{match}' was
    corrupted to '{MATCH}')."""
    from mimranalytics_core_spark import api
    from mimranalytics_core_spark.cypher import parse

    p = parse("MATCH (c)-[:CUSTOMER_OF]->(n) WHERE c.name = '{match}' RETURN c")
    assert "'{match}'" in p["post_pred"]
    assert api.cypher(
        spark, SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) WHERE c.name = '{match}' RETURN c",
    ).collect() == []


def test_unwind_empty_and_comma_string_lists(spark):
    """UNWIND [] yields zero rows (Neo4j), and a $param string containing a
    comma round-trips through the list literal."""
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark, SF_SMALL,
        "UNWIND $ids AS x MATCH (c)-[:CUSTOMER_OF]->(n) WHERE c.id = x RETURN x",
        params={"ids": []},
    ).collect()
    assert rows == []
    vals = api.cypher(
        spark, SF_SMALL, "UNWIND $xs AS x RETURN x ORDER BY x",
        params={"xs": ["a,b", "c"]},
    ).collect()
    assert [r.x for r in vals] == ["a,b", "c"]


def test_bind_params_rejects_non_dict():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, bind_params

    with pytest.raises(CypherSyntaxError, match="JSON object"):
        bind_params("RETURN $x", 5)


def test_match_path_keep_edges_requires_trail(spark):
    from mimranalytics_core_spark import api

    with pytest.raises(ValueError, match="keep_edges requires trail"):
        api.match_path(spark, SF_SMALL, trail=False, keep_edges=True)


# ---- second review batch (cypher.py deep review) ----


def test_where_before_as_of_order():
    """WHERE … AS OF must slice time, not smuggle the AS OF text into the
    predicate (review: as_of was silently dropped)."""
    from mimranalytics_core_spark.cypher import parse

    p = parse(
        "MATCH (a)-[:OWNS_STAKE]->(b) WHERE a.id STARTS WITH 'e:' "
        "AS OF '2024-01-01' RETURN a, b"
    )
    assert p["as_of"] == "2024-01-01"
    assert "AS OF" not in (p["src_pred"] or "") + (p["post_pred"] or "")


def test_keywords_inside_literals_do_not_break_tail(spark):
    from mimranalytics_core_spark import api
    from mimranalytics_core_spark.cypher import parse

    p = parse(
        "MATCH (a)-[:CUSTOMER_OF]->(b) WHERE a.name CONTAINS 'x WITH y' RETURN a"
    )
    assert "x WITH y" in p["post_pred"]
    assert (
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH (a)-[:CUSTOMER_OF]->(b) "
            "WHERE a.name CONTAINS 'x RETURN y' RETURN a",
        ).collect()
        == []
    )


def test_backslash_in_string_predicate_executes(spark):
    """A literal backslash needs four in the compiled SQL text (review:
    two crashed with INVALID_FORMAT.ESC_IN_THE_MIDDLE)."""
    from mimranalytics_core_spark import api

    assert (
        api.cypher(
            spark,
            SF_SMALL,
            r"MATCH (a)-[:CUSTOMER_OF]->(b) WHERE a.name CONTAINS 'x\y' RETURN a",
        ).collect()
        == []
    )


def test_optional_rel_weight_conjunct_null_extends(spark):
    """A trailing conjunct on an OPTIONAL clause's relationship variable
    must scope into the clause — rows without a match null-extend instead
    of vanishing (review: they were post-filtered away)."""
    from mimranalytics_core_spark import api

    base = api.cypher(
        spark, SF_SMALL, "MATCH (c:Customer)-[:CUSTOMER_OF]->(n) RETURN c, n"
    ).collect()
    opt = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n)
           OPTIONAL MATCH (s)-[r:SUPPLIER_OF]->(n)
           WHERE r.weight > 2.0
           RETURN c, n, count(s) AS n_sup""",
    ).collect()
    # weight > 2.0 matches nothing -> every base row survives with 0
    assert len(opt) == len(base) > 0
    assert all(r.n_sup == 0 for r in opt)


def test_pipe_rel_variable_reuse_rejected():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    with pytest.raises(CypherSyntaxError, match="collides"):
        parse(
            "MATCH (a)-[r:CUSTOMER_OF]->(b) WITH a, b "
            "MATCH (b)-[r:NATION_OF]->(c) RETURN c"
        )


def test_unwind_bool_and_scientific_floats(spark):
    from mimranalytics_core_spark import api

    flags = api.cypher(
        spark, SF_SMALL, "UNWIND $fs AS f RETURN f ORDER BY f",
        params={"fs": [True, False]},
    ).collect()
    assert [r.f for r in flags] == [False, True]
    tiny = api.cypher(
        spark, SF_SMALL, "UNWIND $xs AS x RETURN x", params={"xs": [1e-05]}
    ).collect()
    assert tiny[0].x == 1e-05


def test_order_by_desc_puts_nulls_first(spark):
    """Neo4j treats null as the largest value: last on ASC, FIRST on
    DESC — with LIMIT this changes the returned row set."""
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c:Customer)-[:CUSTOMER_OF]->(n)
           OPTIONAL MATCH (s)-[:SUPPLIER_OF]->(n)
           RETURN c, s.name AS sup ORDER BY sup DESC, c ASC LIMIT 5""",
    ).collect()
    n_null_nations = len(
        api.cypher(
            spark,
            SF_SMALL,
            "MATCH (c:Customer)-[:CUSTOMER_OF]->(n) "
            "WHERE NOT EXISTS { (s)-[:SUPPLIER_OF]->(n) } RETURN c",
        ).collect()
    )
    if n_null_nations >= 5:
        assert all(r.sup is None for r in rows)


# ---- toLower/toUpper + WITH DISTINCT ----


def test_tolower_toupper_and_with_distinct(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) "
        "WHERE toUpper(c.id) STARTS WITH 'C:1' RETURN c ORDER BY c LIMIT 3",
    ).collect()
    assert rows and all(r.c.startswith("c:1") for r in rows)
    # a '$' or 'toLower(' inside a string literal must survive untouched
    none = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) WHERE c.name = 'toLower(x)' RETURN c",
    ).collect()
    assert none == []
    # WITH DISTINCT equals count(DISTINCT ...)
    a = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) WITH DISTINCT n RETURN count(*) AS k",
    ).collect()[0].k
    b = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) RETURN count(DISTINCT n.id) AS k",
    ).collect()[0].k
    assert a == b > 0


# ---- PII redaction ----


def test_pii_redact_counts_and_placeholders(spark):
    from mimranalytics_core_spark.registry import all_ops

    rows = all_ops()["text_pii_redact"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows[:20]:
        assert r.n_email >= 1 and r.n_phone >= 1 and r.n_ip >= 1
        assert "[EMAIL]" in r.redacted and "[PHONE]" in r.redacted and "[IP]" in r.redacted
        assert "@example.com" not in r.redacted
        assert "555-" not in r.redacted


# ---- WITH ... ORDER BY ... SKIP/LIMIT ----


def test_with_stage_topk_and_subclause_order(spark):
    from mimranalytics_core_spark import api
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    full = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) WITH n, count(*) AS c "
        "ORDER BY c DESC, n ASC RETURN n, c",
    ).collect()
    top2 = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) WITH n, count(*) AS c "
        "ORDER BY c DESC, n ASC LIMIT 2 RETURN n, c ORDER BY n",
    ).collect()
    assert sorted((r.n, r.c) for r in top2) == sorted(
        (r.n, r.c) for r in full[:2]
    )
    # SKIP pages past the top rows deterministically
    page2 = api.cypher(
        spark,
        SF_SMALL,
        "MATCH (c)-[:CUSTOMER_OF]->(n) WITH n, count(*) AS c "
        "ORDER BY c DESC, n ASC SKIP 2 LIMIT 2 RETURN n, c ORDER BY n",
    ).collect()
    assert sorted((r.n, r.c) for r in page2) == sorted(
        (r.n, r.c) for r in full[2:4]
    )
    # WHERE applies AFTER limit (openCypher subclause order): a filter that
    # rejects the top rows yields EMPTY, not the next-best rows
    empty = api.cypher(
        spark,
        SF_SMALL,
        f"MATCH (c)-[:CUSTOMER_OF]->(n) WITH n, count(*) AS c "
        f"ORDER BY c DESC, n ASC LIMIT 2 WHERE c < {min(r.c for r in full[:2])} "
        "RETURN n, c",
    ).collect()
    assert empty == []
    # unordered pagination is ACCEPTED as of round-9 (r8 verdict #6):
    # an implicit ascending order over all stage outputs makes it
    # deterministic (Neo4j allows the form; behavior tested in
    # test_round9_ops.test_with_skip_limit_without_order_by)
    p_unord = parse("MATCH (a)-[:CUSTOMER_OF]->(b) WITH b LIMIT 3 RETURN b")
    assert p_unord["pipes"][0]["order_by"] == [("b", True)]
    assert p_unord["pipes"][0]["limit"] == 3
    # ORDER BY key must be a WITH output
    with pytest.raises(CypherSyntaxError, match="WITH output column"):
        parse("MATCH (a)-[:CUSTOMER_OF]->(b) WITH b ORDER BY nope RETURN b")


# ---- CASE expressions ----


def test_case_expression_forms(spark):
    from mimranalytics_core_spark import api
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    # plain projection + string predicate inside the CASE body
    rows = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[:CUSTOMER_OF]->(n)
           RETURN c, CASE WHEN c.id ENDS WITH '1' THEN 'one' ELSE 'other' END AS tag
           ORDER BY c LIMIT 4""",
    ).collect()
    assert [r.tag for r in rows] == [
        "one" if r.c.endswith("1") else "other" for r in rows
    ]
    # CASE as an implicit grouping key in a WITH stage
    agg = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[:CUSTOMER_OF]->(n)
           WITH n, CASE WHEN n.id ENDS WITH '1' THEN 1 ELSE 0 END AS is1
           RETURN is1, count(*) AS cnt ORDER BY is1""",
    ).collect()
    assert [r.is1 for r in agg] == [0, 1] and all(r.cnt > 0 for r in agg)
    # round-12: an unaliased CASE item auto-names with the expression text
    p = parse("MATCH (a)-[:CUSTOMER_OF]->(b) RETURN CASE WHEN a.id = 'c:1' THEN 1 ELSE 0 END")
    assert p["projection"][0]["name"].startswith("CASE WHEN")


# ---- EXISTS { pattern } predicates ----


def test_exists_parse_and_guards():
    from mimranalytics_core_spark.cypher import CypherSyntaxError, parse

    p = parse(
        "MATCH (c)-[:CUSTOMER_OF]->(n) "
        "WHERE EXISTS { (s:Supplier)-[:SUPPLIER_OF]->(n) } RETURN n"
    )
    assert len(p["exists_preds"]) == 1
    ex = p["exists_preds"][0]
    assert not ex["negated"] and ex["anchors"] == ["n"]
    assert p["post_pred"] is None  # the EXISTS conjunct left nothing behind
    # NOT form + residual conjunct stays behind
    p2 = parse(
        "MATCH (c)-[:CUSTOMER_OF]->(n) WHERE NOT EXISTS { "
        "(s)-[:SUPPLIER_OF]->(n) } AND c.id STARTS WITH 'c:' RETURN n"
    )
    assert p2["exists_preds"][0]["negated"]
    # the residual conjunct names only the start variable -> pushes down
    assert "LIKE" in p2["src_pred"] and p2["post_pred"] is None
    # no shared variable
    with pytest.raises(CypherSyntaxError, match="share at least one"):
        parse("MATCH (a)-[:CUSTOMER_OF]->(b) WHERE EXISTS { (x)-[:SUPPLIER_OF]->(y) } RETURN a")
    # OR around EXISTS (round-10): no longer rejected — the span compiles
    # to a boolean flag column and the whole predicate filters over it
    p3 = parse(
        "MATCH (a)-[:CUSTOMER_OF]->(b) "
        "WHERE EXISTS { (a)-[:NATION_OF]->(x) } OR a.id = 'c:1' RETURN a"
    )
    assert len(p3["exists_flags"]) == 1
    assert p3["exists_flags"][0]["anchors"] == ["a"]
    assert "__exf0" in p3["post_pred"] and " OR " in p3["post_pred"].upper()


def test_exists_semantics_vs_manual_semijoin(spark):
    from mimranalytics_core_spark import api

    got = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[:CUSTOMER_OF]->(n)
           WHERE EXISTS { (s)-[:SUPPLIER_OF]->(n) }
           RETURN c, n ORDER BY c, n""",
    ).collect()
    base = api.cypher(
        spark, SF_SMALL, "MATCH (c)-[:CUSTOMER_OF]->(n) RETURN c, n"
    ).collect()
    sups = {
        r.n
        for r in api.cypher(
            spark, SF_SMALL, "MATCH (s)-[:SUPPLIER_OF]->(n) RETURN s, n"
        ).collect()
    }
    expect = sorted((r.c, r.n) for r in base if r.n in sups)
    assert [(r.c, r.n) for r in got] == expect
    # NOT EXISTS is the exact complement over the same frame
    anti = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[:CUSTOMER_OF]->(n)
           WHERE NOT EXISTS { (s)-[:SUPPLIER_OF]->(n) }
           RETURN c, n ORDER BY c, n""",
    ).collect()
    assert len(anti) + len(got) == len(base)


def test_exists_inner_where_and_no_row_multiplication(spark):
    from mimranalytics_core_spark import api

    # a nation with MANY suppliers must still yield one row per customer
    rows = api.cypher(
        spark,
        SF_SMALL,
        """MATCH (c)-[:CUSTOMER_OF]->(n)
           WHERE EXISTS { MATCH (s)-[:SUPPLIER_OF]->(n) WHERE s.id STARTS WITH 's:' }
           RETURN c, n""",
    ).collect()
    assert len({(r.c, r.n) for r in rows}) == len(rows)


def test_curation_orderings_genuinely_diverge(spark):
    """gate-before-dedup vs dedup-before-gate (round-4 verdict item 8):
    when a cluster's full-corpus canonical doc is itself gated out, the
    end2end ordering drops the WHOLE cluster (every survivor points at
    the vanished canonical) while gated-first re-canonicalizes to the
    smallest surviving doc and keeps it. Built on the shared helpers so
    the divergence is pinned at the exact semantic boundary."""
    from pyspark.sql import functions as F

    from mimranalytics_core_spark.operators.text import _canonicalize, _minhash_pairs

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliett " \
           "kilo lima mike november oscar papa quebec romeo".split()  # 18 toks
    docs = spark.createDataFrame(
        [
            (1, " ".join(base + ["sierra"])),               # 19 toks: len-gated out
            (2, " ".join(base + ["sierra", "tango", "uniform"])),  # 21: J(1,2)=19/21
            (3, " ".join(base + ["sierra", "tango", "victor"])),   # 21: J(2,3)=20/22
            (9, "unrelated words entirely different content here " * 5),
        ],
        "doc_id long, text string",
    )
    pairs_full = _minhash_pairs(spark, docs, docs)
    canon_full = {
        r.doc_id: r.canonical_id for r in _canonicalize(pairs_full).collect()
    }
    assert canon_full[2] == canon_full[3] == 1  # full-corpus canonical is doc 1
    # end2end ordering: gate AFTER dedup — docs 2,3 point at gated-out 1 → dropped
    survivors = {2, 3}  # the length gate (>= 20 tokens) drops doc 1
    end2end_kept = {d for d in survivors if canon_full.get(d, d) == d}
    assert end2end_kept == set()
    # gated-first: dedup over survivors only — {2,3} re-canonicalize to 2
    gated_docs = docs.filter(F.col("doc_id").isin([2, 3]))
    canon_gated = {
        r.doc_id: r.canonical_id
        for r in _canonicalize(_minhash_pairs(spark, docs, gated_docs)).collect()
    }
    gated_kept = {d for d in survivors if canon_gated.get(d, d) == d}
    assert gated_kept == {2}


def test_unwind_cross_join_multiplicities(spark):
    from mimranalytics_core_spark import api

    rows = api.cypher(
        spark,
        SF_SMALL,
        "UNWIND [1, 2] AS a UNWIND [10, 20, 30] AS b RETURN a, b ORDER BY a, b",
    ).collect()
    assert [(r.a, r.b) for r in rows] == [
        (1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (2, 30)
    ]
