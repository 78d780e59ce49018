"""Cypher text front-end for the graph surface (reference README.md:25 —
the store is Neo4j/Memgraph, so migrating users arrive with saved Cypher
strings). Parses the variable-length path subset

    MATCH (a)-[:TYPE1|TYPE2*min..max]->(b)
      [AS OF '<timestamp>']            -- Time-Slider extension (README.md:17)
      [WHERE <predicate on a.id / b.id>]
      RETURN <items>

into :func:`mimranalytics_core_spark.api.match_path` builder args, so every
Cypher string executes through the same oracle-verified bounded-traversal
plan as the §2.9 operators.

Semantics note (deliberate, documented divergence): variable-length
patterns here are **bounded walk closure** — edges and nodes may repeat
along a path, matching the UBO/reach operators and their DuckDB oracles —
whereas Cypher's ``*min..max`` enforces relationship uniqueness (trail
semantics). On DAG-shaped data (the ownership hierarchy) the two coincide;
on cyclic graphs walk closure can count edge-repeating paths Cypher would
exclude. hops is min-hops per (src, dst) pair; path_weight sums the weight
product over ALL distinct walks.

Grammar subset:

- Node patterns carry no inline labels/props — start-node filtering is the
  WHERE clause (``a.id STARTS WITH 'c:'`` → pushed below the first join).
- Relationship types are case-insensitive (``:CUSTOMER_OF`` → the catalog's
  ``customer_of``); omitted types traverse every edge.
- ``*`` bounds: ``*2..4``, ``*..3`` (min 1), ``*2..`` is REJECTED (no
  unbounded traversal — the engine requires a hop bound, like the
  recursive-CTE operators), bare ``*`` defaults to 1..3, no star = 1..1.
- RETURN items: ``a``/``b`` (the endpoints), ``hops``, ``path_weight``
  (requesting path_weight switches on carry_weight aggregation); ``AS``
  aliases are honored.
- Aggregates in RETURN (Cypher's implicit grouping): ``count(*)``,
  ``count([DISTINCT] expr)``, ``sum/min/max/avg(hops|path_weight)`` —
  non-aggregate RETURN items become the grouping keys, exactly as in
  Cypher. ``sum``/``avg`` results are rounded to 6 places (the engine's
  float-hash discipline; per-pair path_weight is already round-6).
- ``ORDER BY item [ASC|DESC], ...`` over RETURN output columns (aliases
  or default names), then ``SKIP n`` / ``LIMIT n``. Ties are NOT broken
  implicitly — order by a unique column (e.g. the entity id) before
  LIMIT for deterministic pagination, as the §2.6 operators do.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PATTERN = re.compile(
    r"""^\s*MATCH\s*
        \(\s*(?P<a>[A-Za-z_]\w*)\s*\)\s*
        -\s*\[\s*
            (?::\s*(?P<types>[A-Za-z_]\w*(?:\s*\|\s*[A-Za-z_]\w*)*))?
            \s*(?P<star>\*)?\s*
            (?:(?<=\*)|(?=\s*\]))        # bounds only legal after a star
            (?P<min>\d+)?\s*(?P<dots>\.\.)?\s*(?P<max>\d+)?
        \s*\]\s*->\s*
        \(\s*(?P<b>[A-Za-z_]\w*)\s*\)
        (?:\s+AS\s+OF\s+'(?P<asof>[^']+)')?
        (?:\s+WHERE\s+(?P<where>.*?))?
        \s+RETURN\s+(?P<ret>.+?)
        (?:\s+ORDER\s+BY\s+(?P<order>.+?))?
        (?:\s+SKIP\s+(?P<skip>\d+))?
        (?:\s+LIMIT\s+(?P<limit>\d+))?
        \s*;?\s*$""",
    re.IGNORECASE | re.VERBOSE | re.DOTALL,
)

_AGG_ITEM = re.compile(
    r"^(?P<fn>count|sum|min|max|avg)\s*\(\s*(?P<distinct>DISTINCT\s+)?(?P<arg>\*|[\w.]+)\s*\)"
    r"(?:\s+AS\s+(?P<alias>\w+))?$",
    re.IGNORECASE,
)

_STARTS_WITH = re.compile(r"(?P<col>\bsrc\b|\bdst\b)\s+STARTS\s+WITH\s+'(?P<lit>[^']*)'", re.I)


class CypherSyntaxError(ValueError):
    """Raised when a query falls outside the supported MATCH subset."""


def _translate_pred(where: str, a: str, b: str) -> str:
    """Rewrite `a.id` / `b.id` to src/dst and STARTS WITH to LIKE."""
    pred = re.sub(rf"\b{re.escape(a)}\.id\b", "src", where)
    pred = re.sub(rf"\b{re.escape(b)}\.id\b", "dst", pred)
    if re.search(r"\b\w+\.\w+\b", pred.replace("src", "").replace("dst", "")):
        raise CypherSyntaxError(f"unsupported property access in WHERE: {where!r}")
    # STARTS WITH 'x' → LIKE 'x%' (escape SQL-LIKE wildcards in the literal)
    def _sw(m: re.Match) -> str:
        lit = m.group("lit").replace("\\", "\\\\").replace("%", r"\%").replace("_", r"\_")
        return f"{m.group('col')} LIKE '{lit}%'"

    return _STARTS_WITH.sub(_sw, pred)


def parse(query: str) -> dict:
    """Parse a Cypher string → match_path kwargs + return projection.

    Returns a dict with keys ``edge_types``, ``min_hops``, ``max_hops``,
    ``as_of``, ``src_pred``, ``post_pred``, ``carry_weight``, ``projection``
    (list of (source_col, output_name)).
    """
    m = _PATTERN.match(query)
    if not m:
        raise CypherSyntaxError(f"unsupported Cypher (MATCH subset only): {query!r}")
    a, b = m.group("a"), m.group("b")
    if a == b:
        raise CypherSyntaxError("start and end variables must differ")

    types = m.group("types")
    edge_types = [t.strip().lower() for t in types.split("|")] if types else None

    if m.group("star"):
        lo = int(m.group("min")) if m.group("min") else 1
        if m.group("dots"):
            if m.group("max") is None:
                raise CypherSyntaxError(
                    "unbounded variable-length patterns (*n..) are not supported: "
                    "the engine requires a hop bound"
                )
            hi = int(m.group("max"))
        else:
            hi = int(m.group("min")) if m.group("min") else 3  # bare * → 1..3
    else:
        lo = hi = 1

    # WHERE: predicates naming only the start endpoint push below the first
    # join (match_path's src_pred); anything touching dst filters the result.
    src_pred = post_pred = None
    where = m.group("where")
    if where:
        pred = _translate_pred(where.strip(), a, b)
        if re.search(r"\bdst\b", pred):
            post_pred = pred
        else:
            src_pred = pred

    colmap = {a: "src", b: "dst", f"{a}.id": "src", f"{b}.id": "dst"}

    def _map_col(expr: str, ctx: str) -> str:
        col = colmap.get(expr, expr.lower())
        if col not in ("src", "dst", "hops", "path_weight"):
            raise CypherSyntaxError(f"unsupported {ctx}: {expr!r}")
        return col

    projection: list[dict] = []
    carry_weight = False
    for item in m.group("ret").split(","):
        item = item.strip()
        am = _AGG_ITEM.match(item)
        if am:
            fn = am.group("fn").lower()
            arg = am.group("arg")
            if arg == "*":
                if fn != "count":
                    raise CypherSyntaxError(f"only count(*) may take '*': {item!r}")
                col, default = None, "count_star"
            else:
                col = _map_col(arg, "aggregate argument")
                if fn in ("sum", "min", "max", "avg") and col in ("src", "dst"):
                    raise CypherSyntaxError(
                        f"{fn}() needs a numeric argument (hops/path_weight): {item!r}"
                    )
                default = f"{fn}_{col}"
            if col == "path_weight":
                carry_weight = True
            projection.append(
                {
                    "kind": "agg",
                    "fn": fn,
                    "col": col,
                    "distinct": bool(am.group("distinct")),
                    "name": am.group("alias") or default,
                }
            )
            continue
        im = re.match(r"^(?P<expr>\S+)(?:\s+AS\s+(?P<alias>\w+))?$", item, re.I)
        if not im:
            raise CypherSyntaxError(f"unsupported RETURN item: {item!r}")
        expr = im.group("expr")
        col = _map_col(expr, "RETURN item")
        if col == "path_weight":
            carry_weight = True
        projection.append(
            {"kind": "plain", "col": col, "name": im.group("alias") or expr.replace(".", "_")}
        )

    # ORDER BY: names must resolve to RETURN output columns
    out_names = {p["name"] for p in projection}
    order_by: list[tuple[str, bool]] = []
    if m.group("order"):
        for key in m.group("order").split(","):
            km = re.match(r"^\s*(?P<name>[\w.]+)(?:\s+(?P<dir>ASC|DESC))?\s*$", key, re.I)
            if not km:
                raise CypherSyntaxError(f"unsupported ORDER BY key: {key!r}")
            name = km.group("name")
            if name not in out_names:
                # allow ordering by the underlying expr of an unaliased item
                mapped = colmap.get(name, name.lower())
                cand = [p["name"] for p in projection if p.get("col") == mapped]
                if not cand:
                    raise CypherSyntaxError(
                        f"ORDER BY key {name!r} is not a RETURN output column"
                    )
                name = cand[0]
            order_by.append((name, (km.group("dir") or "ASC").upper() == "ASC"))

    return {
        "edge_types": edge_types,
        "min_hops": lo,
        "max_hops": hi,
        "as_of": m.group("asof"),
        "src_pred": src_pred,
        "post_pred": post_pred,
        "carry_weight": carry_weight,
        "projection": projection,
        "order_by": order_by,
        "skip": int(m.group("skip")) if m.group("skip") else None,
        "limit": int(m.group("limit")) if m.group("limit") else None,
    }


def run(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Execute a Cypher MATCH string against the hierarchy graph."""
    from mimranalytics_core_spark import api

    p = parse(query)
    df = api.match_path(
        spark,
        sf_dir,
        edge_types=p["edge_types"],
        min_hops=p["min_hops"],
        max_hops=p["max_hops"],
        src_pred=p["src_pred"],
        as_of=p["as_of"],
        carry_weight=p["carry_weight"],
    )
    if p["post_pred"]:
        df = df.filter(F.expr(p["post_pred"]))

    aggs = [it for it in p["projection"] if it["kind"] == "agg"]
    if aggs:
        # Cypher's implicit grouping: non-aggregate items are the keys
        keys = [it for it in p["projection"] if it["kind"] == "plain"]
        exprs = []
        for it in aggs:
            if it["col"] is None:
                e = F.count(F.lit(1))
            elif it["fn"] == "count":
                e = F.count_distinct(it["col"]) if it["distinct"] else F.count(it["col"])
            else:
                e = getattr(F, it["fn"])(it["col"])
                if it["fn"] in ("sum", "avg"):
                    e = F.round(e, 6)  # float-hash discipline (module docstring)
            exprs.append(e.alias(it["name"]))
        if keys:
            df = df.groupBy(*[F.col(k["col"]).alias(k["name"]) for k in keys]).agg(*exprs)
        else:
            df = df.agg(*exprs)
    else:
        df = df.select(*[F.col(it["col"]).alias(it["name"]) for it in p["projection"]])

    if p["order_by"]:
        df = df.orderBy(
            *[
                F.col(n).asc_nulls_last() if asc else F.col(n).desc_nulls_last()
                for n, asc in p["order_by"]
            ]
        )
    if p["skip"] is not None:
        df = df.offset(p["skip"])
    if p["limit"] is not None:
        df = df.limit(p["limit"])
    return df
