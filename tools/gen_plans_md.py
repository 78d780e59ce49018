#!/usr/bin/env python
"""Generate PLANS.md: executed physical plans for representative queries —
the evidence behind the optimizer claims (pushdown, broadcast, partial agg,
TakeOrderedAndProject, codegen spans, bucketing). Run:
python tools/gen_plans_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHOWCASE = [
    (
        "scan_pruned",
        "Predicate pushdown + column pruning reach the parquet reader "
        "(PushedFilters / narrow ReadSchema).",
    ),
    (
        "flagship_exposure_rollup",
        "Flagship: broadcast dim chain, shuffled fact join, two-phase "
        "aggregation, ranking window, ordered output.",
    ),
    (
        "sort_limit_topk",
        "Global top-k compiles to TakeOrderedAndProject — per-partition "
        "heaps, no full sort.",
    ),
    (
        "join_interval_overlap",
        "Non-equi interval join keeps its equi prefix: hash join + residual "
        "range filter, not a nested-loop cartesian.",
    ),
    (
        "agg_groupby_hash",
        "TPC-H-Q1 shape: partial HashAggregate before the exchange, final "
        "after — shuffled bytes ∝ groups. `*(n)` marks whole-stage codegen.",
    ),
    (
        "dedup_minhash_lsh",
        "MinHash signatures computed row-local (Arrow mapInPandas band-sig "
        "stage directly on the scan — no shuffle before band bucketing). "
        "Verify-stage "
        "token join is broadcast only under the size threshold "
        "(functions/hints.broadcast_if_small); at forced-large settings it "
        "plans a shuffle join.",
    ),
    (
        "sim_lsh_ann",
        "Banded hyperplane LSH: 6×10-bit signatures row-local, per-band "
        "bucket window caps membership, intra-bucket self-join generates "
        "candidates — never all-pairs.",
    ),
    (
        "graph_ubo_asof",
        "Time-Slider UBO: validity filter + snapshot renormalization applied "
        "BEFORE the recursive closure (the as-of predicate prunes edges "
        "ahead of every join).",
    ),
    (
        "cypher_match",
        "Cypher text front-end: parsed MATCH pattern compiles to the same "
        "typed bounded-traversal join plan as the builder API.",
    ),
    (
        "cypher_multi_hop",
        "Multi-segment Cypher with node properties: per-segment traversals "
        "joined on shared variables, attribute view equi-joined for "
        "var.name, implicit grouping as partial+final agg — all equi-joins, "
        "no nested loops.",
    ),
    (
        "graph_closeness",
        "Multi-source BFS closeness: per-level join + anti-join for all 30 "
        "sources at once, then ONE partial+final aggregation of distances — "
        "only (source, count, sum) rows reach the final stage.",
    ),
    (
        "sim_pq_topk",
        "PQ/ADC approximate top-k: one Arrow encode+score pass directly on "
        "the scan emitting (vec_id, score), TakeOrderedAndProject keeps k — "
        "no cartesian, no vector shuffle.",
    ),
    (
        "cypher_trail_cycle",
        "Cypher trail semantics on the cyclic graph: each hop extension is "
        "an equi-join; the relationship-uniqueness guard is a row-local "
        "array_contains filter INSIDE the join stage — no extra shuffle, "
        "no cartesian.",
    ),
    (
        "cypher_shortest_path",
        "shortestPath() compiles to the level-synchronous BFS: per-level "
        "equi-join + left-anti dedup against settled pairs — no path "
        "enumeration anywhere in the plan.",
    ),
    (
        "cypher_with_match",
        "MATCH after WITH: partial+final hash agg (stage 1), equi-join on "
        "the piped variable, partial+final agg again (RETURN) — two "
        "aggregations and one join, no new shuffle shape.",
    ),
    (
        "graph_kcore",
        "k-core peel round: induced-subgraph restriction as two LeftSemi "
        "joins + partial-agg degree count on the shrinking alive set — "
        "node×node never materializes.",
    ),
    (
        "pipeline_decontamination",
        "Decontamination join: row-local 8-gram explode on both sides; one "
        "distinct shuffle on (doc_id, n-gram) bounds the join input, then "
        "the join itself broadcasts the benchmark side (no corpus shuffle "
        "for the join), partial+final distinct-count agg.",
    ),
    (
        "dedup_canonical_docs",
        "Near-dup canonicalization: the verified pair set is checkpointed "
        "once (leaf in the plan), star-contraction is one partial agg + "
        "two joins, and the Pregel component loop runs on the contracted "
        "remnant — the clique mass never reaches the iteration.",
    ),
    (
        "ts_mad_outlier",
        "Robust outliers: two exact-median partial aggs over a 5-key "
        "domain; both stat dims return as BroadcastHashJoin — the fact "
        "table is never sorted or shuffled.",
    ),
    (
        "sim_rrf_fusion",
        "Hybrid-search fusion: ONE corpus scan scores cosine and L1 "
        "together (broadcast query batch), two rank windows share the qid "
        "exchange, and the fusion is a full-outer join of two k-row lists "
        "per query.",
    ),
    (
        "win_retention_cohorts",
        "Cohort retention: distinct-activity partial agg, broadcast "
        "cohort dim, then one count-distinct agg on the bounded "
        "(cohort, age) key — three narrow shuffles, no fact re-scan.",
    ),
    (
        "cypher_natural_key_seek",
        "Round-12 business graph: a {custkey: 1} property-map seek "
        "reaching the parquet scan as EqualTo(c_custkey,1) with the "
        "label-pruned attribute view (one base table scanned, not six).",
    ),
    (
        "cypher_order_patterns",
        "Round-12 fact tier: typed PLACED + CUSTOMER_OF comma patterns — "
        "per-type pre-join pruning, the order-property filter pushed to "
        "the orders scan, partial+final aggregation.",
    ),
    (
        "cypher_comma_cartesian",
        "Round-12 disconnected comma pattern: the WHERE's cross-component "
        "equality re-plans the cartesian as a plain hash join (no "
        "CartesianProduct node in the executed plan).",
    ),
    (
        "join_range_bucketed",
        "PURE range join rewritten to the bucket form: explode to the 2 "
        "covering 7-day buckets, EQUI-join on bucket + residual range "
        "filter — no CartesianProduct/BNLJ anywhere in the plan (the "
        "SURVEY.md §4.3.2 mitigation as an executed plan).",
    ),
    (
        "subquery_scalar_correlated",
        "Correlated scalar subquery DECORRELATED by Catalyst: the "
        "per-row subquery becomes one grouped aggregate + equi-join "
        "(RewriteCorrelatedScalarSubquery) — no per-row execution.",
    ),
    (
        "scan_partition_pruned",
        "Hive-partitioned layout: the status predicate sits under "
        "PartitionFilters (directory pruning), not as a post-scan data "
        "filter — only one partition's files are read.",
    ),
    (
        "graph_risk_score",
        "Composite risk frame: the pagerank superstep joins, degree "
        "partial agg and cycle CTE meet in plain hash joins on node id; "
        "max-normalizers enter as a BroadcastExchange of one row — the "
        "entire score is computed in-plan.",
    ),
    (
        "cypher_expr_coalesce",
        "The round-7 aggregate-below-join reshape: the nation-level "
        "min/count aggregate (partial+final HashAggregate) finishes "
        "BEFORE customers join, and the dimension-sized aggregate side "
        "broadcasts — every stage linear in sf (1.15x/decade measured; "
        "the pre-reshape per-binding form measured 39.9x).",
    ),
    (
        "cypher_pattern_predicate",
        "Bare pattern predicate (WHERE NOT (s)-[:X]->(n)) compiles to a "
        "LeftAnti hash join on the correlation anchor — existence checks "
        "never multiply rows, probing stops on first match.",
    ),
    (
        "cypher_property_map",
        "Inline property maps desugar into the WHERE machinery: the "
        "OPTIONAL clause's supplier-name equality filters its frame "
        "BEFORE the left join (null-extension preserved), the start-"
        "variable id equality sits on the scan below the first join.",
    ),
    (
        "cypher_call_topk",
        "Per-invocation ORDER BY/SKIP/LIMIT in a correlated CALL body "
        "(round-10): row_number() windows on the import key — the SAME "
        "key the outer equi-join shuffles on — and the rank filter "
        "prunes each group to the page BEFORE the join. Neo4j's "
        "per-outer-row semantic as one top-k-per-group pass.",
    ),
    (
        "cypher_call_union",
        "Correlated CALL UNION ALL (round-10): both branch frames union "
        "FIRST, then one equi-join on the import key — per-invocation "
        "concatenation with N branch scans and a single join, no "
        "per-row re-execution, no per-branch join fan-out.",
    ),
    (
        "cypher_expr_aggregates",
        "Expression-argument aggregates (round-11): the hidden "
        "pre-aggregation columns (__pagN) evaluate INSIDE the partial "
        "hash-aggregate's child projection — one WholeStageCodegen span, "
        "no extra exchange vs the plain-argument form.",
    ),
    (
        "cypher_stage_order_by_agg",
        "Stage-level ORDER BY over an aggregate (round-11): "
        "sort+limit collapses to TakeOrderedAndProject over the grouped "
        "frame BEFORE the re-match join — the probe side is k rows, not "
        "every group (the top-k-then-rematch plan at any scale).",
    ),
    (
        "cypher_case_over_aggregates",
        "CASE over aggregates (round-11): bucket-then-reaggregate is two "
        "chained partial+final hash aggregations with the CASE as a "
        "zero-shuffle projection between them; the second agg runs over "
        "|groups| rows.",
    ),
    (
        "cypher_supply_chain",
        "Round-13 tripartite fact rollup (:PLACED × :CONTAINS × "
        ":SUPPLIES + the nation triangle): five hash joins end-to-end, "
        "no cartesian/BNLJ — the contains⋈supplies part-key join is the "
        "fan-out point and stays an equi-join; rel-type filters prune "
        "each edge scan.",
    ),
    (
        "cypher_path_projection",
        "Round-13 composable path expressions: per-path rows with the "
        "node array carried ROW-LOCALLY (no extra join), one explode for "
        "UNWIND nodes(p), then partial+final hash aggregation — count(p) "
        "is count(*) over the per-path stream.",
    ),
    (
        "cypher_shortest_path_nodes",
        "Round-13 shortestPath reconstruction: the level-synchronous "
        "BFS carries an O(depth) path array per frontier row (join + "
        "anti-join + array-min agg per level); no path-set enumeration "
        "anywhere in the plan.",
    ),
]


def main() -> None:
    from mimranalytics_core_spark.registry import all_ops
    from mimranalytics_core_spark.session import get_spark

    spark = get_spark("mimranalytics-core-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    ops = all_ops()
    out = [
        "# PLANS — executed physical plans (generated)\n",
        "Evidence for the optimizer/scale claims in SCALE.md and the",
        "assertions in tests/test_plans.py, captured from real executions at",
        "sf0.001. Regenerate: `python tools/gen_plans_md.py`.\n",
    ]
    for name, blurb in SHOWCASE:
        df = ops[name].fn(spark, "/root/testdata/sf0.001")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # keep the final (post-AQE) plan section only, truncated sanely
        final = plan.split("+- == Initial Plan ==")[0]
        if len(final) > 4000:
            final = final[:4000] + "\n... (truncated)"
        out.append(f"\n## {name}\n\n{blurb}\n\n```\n{final}\n```\n")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
