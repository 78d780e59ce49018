"""Independent (pure-Python) verification of the round-4 continuation ops:
SCC, clustering coefficient, repetition/LM text quality, MAD outliers,
SCD2 intervals, linear interpolation."""

from __future__ import annotations

import math
import statistics
from collections import Counter

from pyspark.sql import functions as F

from mimranalytics_core_spark import catalog
from mimranalytics_core_spark.operators._base import t, tables
from mimranalytics_core_spark.registry import all_ops
from tests.conftest import SF_SMALL

OPS = all_ops()


def _closure(edges):
    """Set-semantics transitive closure of an edge set (python reference)."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    reach = {}
    for v in set(adj) | {d for _, d in edges}:
        seen, stack = set(), list(adj.get(v, ()))
        while stack:
            u = stack.pop()
            if u not in seen:
                seen.add(u)
                stack.extend(adj.get(u, ()))
        reach[v] = seen
    return reach


def test_graph_scc_matches_python_closure(spark):
    tables(spark, SF_SMALL)
    edges = [
        (r.src, r.dst)
        for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    reach = _closure(edges)
    expected = {}
    for v in reach:
        mutual = {u for u in reach[v] if v in reach.get(u, ())}
        expected[v] = min(mutual | {v})
    got = {r.node: r.scc_id for r in OPS["graph_scc"].fn(spark, SF_SMALL).collect()}
    assert got == expected
    # the trade-credit fixture is cyclic: at least one non-singleton SCC
    sizes = Counter(got.values())
    assert max(sizes.values()) >= 2


def test_graph_clustering_coeff_matches_python(spark):
    res = {r.node: r for r in OPS["graph_clustering_coeff"].fn(spark, SF_SMALL).collect()}
    li = t(spark, SF_SMALL, "lineitem").filter(F.col("l_suppkey") < 50)
    su = li.select("l_suppkey", "l_partkey").distinct().collect()
    by_part = {}
    for r in su:
        by_part.setdefault(r.l_partkey, set()).add(r.l_suppkey)
    nbrs = {}
    for members in by_part.values():
        for a in members:
            for b in members:
                if a != b:
                    nbrs.setdefault(a, set()).add(b)
    for v, ns in nbrs.items():
        deg = len(ns)
        tri = sum(
            1 for x in ns for y in ns if x < y and y in nbrs.get(x, ())
        )
        coeff = (
            math.floor((2.0 * tri / (deg * (deg - 1.0))) * 1e6 + 0.5) / 1e6
            if deg >= 2
            else 0.0
        )
        row = res[v]
        assert row.degree == deg and row.triangles == tri
        assert abs(row.clustering_coeff - coeff) < 1e-9


def test_text_repetition_score_bounds_and_sample(spark):
    rows = OPS["text_repetition_score"].fn(spark, SF_SMALL).collect()
    assert rows
    docs = {r.doc_id: r.text for r in t(spark, SF_SMALL, "documents").collect()}
    n_rep = 0
    for r in rows:
        assert 0.0 <= r.dup_token_ratio <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        n_rep += bool(r.repetitive)
        toks = docs[r.doc_id].lower().split(" ")
        dup = 1.0 - len(set(toks)) / len(toks)
        bigrams = Counter(
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        )
        top = 2.0 * max(bigrams.values()) / len(toks) if bigrams else 0.0
        assert abs(r.dup_token_ratio - math.floor(dup * 1e6 + 0.5) / 1e6) < 1e-9
        assert abs(r.top_bigram_frac - math.floor(top * 1e6 + 0.5) / 1e6) < 1e-9
        assert r.repetitive == (dup > 0.6 or top > 0.2)
    # the flag must split the corpus (non-vacuous gate)
    assert 0 < n_rep < len(rows)


def test_text_lm_unigram_score_matches_python(spark):
    rows = {r.doc_id: r for r in OPS["text_lm_unigram_score"].fn(spark, SF_SMALL).collect()}
    docs = {r.doc_id: r.text for r in t(spark, SF_SMALL, "documents").collect()}
    freq = Counter()
    for text in docs.values():
        freq.update(tok for tok in text.lower().split(" ") if tok)
    total = sum(freq.values())
    for doc_id, text in docs.items():
        toks = [tok for tok in text.lower().split(" ") if tok]
        lps = [math.floor(math.log(freq[tk] / total) * 1e9 + 0.5) / 1e9 for tk in toks]
        want = math.floor((sum(lps) / len(lps)) * 1e6 + 0.5) / 1e6
        got = rows[doc_id]
        assert got.n_tokens == len(toks)
        assert abs(got.avg_logprob - want) < 2e-6  # summation-order ulps
        assert got.avg_logprob < 0.0


def test_ts_mad_outlier_matches_python(spark):
    ev = [
        (r.event_id, r.event_type, r.value)
        for r in t(spark, SF_SMALL, "events").select("event_id", "event_type", "value").collect()
    ]
    by_type = {}
    for eid, et, v in ev:
        by_type.setdefault(et, []).append(v)
    med = {et: statistics.median(vs) for et, vs in by_type.items()}
    mad = {
        et: statistics.median([abs(v - med[et]) for v in vs]) for et, vs in by_type.items()
    }
    expected = {
        eid for eid, et, v in ev if abs(v - med[et]) > 4.4478 * mad[et]
    }
    got = {r.event_id for r in OPS["ts_mad_outlier"].fn(spark, SF_SMALL).collect()}
    assert got == expected
    assert got  # non-vacuous: heavy-tailed fixture has outliers


def test_ts_scd2_intervals_invariants(spark):
    rows = OPS["ts_scd2_intervals"].fn(spark, SF_SMALL).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev_first = {
        r.user_id: r.event_type
        for r in t(spark, SF_SMALL, "events")
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.col("ts").asc(), F.col("event_id").asc())
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.is_current for r in rs) == 1
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from  # contiguous history
            assert a.valid_from < a.valid_to
            assert a.event_type != b.event_type  # change rows only
        assert rs[-1].valid_to is None and rs[-1].is_current
        assert rs[0].event_type == ev_first[user]


def test_ts_interpolate_linear_invariants(spark):
    rows = OPS["ts_interpolate_linear"].fn(spark, SF_SMALL).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    interpolated = 0
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.day_idx)
        days = [r.day_idx for r in rs]
        assert days == list(range(days[0], days[-1] + 1))  # contiguous grid
        assert rs[0].is_observed and rs[-1].is_observed  # grid spans knowns
        known = [(r.day_idx, r.value) for r in rs if r.is_observed]
        for r in rs:
            if r.is_observed:
                continue
            interpolated += 1
            prev = max((d, v) for d, v in known if d < r.day_idx)
            nxt = min((d, v) for d, v in known if d > r.day_idx)
            lo, hi = sorted((prev[1], nxt[1]))
            assert lo - 1e-6 <= r.value <= hi + 1e-6  # linear ⇒ between endpoints
            want = prev[1] + (nxt[1] - prev[1]) * (r.day_idx - prev[0]) / (nxt[0] - prev[0])
            assert abs(r.value - math.floor(want * 1e6 + 0.5) / 1e6) < 1e-9
    assert interpolated > 0  # gaps exist at this SF


def test_dedup_canonical_docs_invariants(spark):
    """Canonical = min doc_id of its cluster; membership = exactly the docs
    appearing in a verified near-dup pair; cluster sizes consistent."""
    rows = OPS["dedup_canonical_docs"].fn(spark, SF_SMALL).collect()
    pair_rows = OPS["dedup_minhash_lsh"].fn(spark, SF_SMALL).collect()
    in_pairs = {r.doc_a for r in pair_rows} | {r.doc_b for r in pair_rows}
    assert {r.doc_id for r in rows} == in_pairs
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r.canonical_id, []).append(r)
    for canon, members in by_canon.items():
        assert canon == min(m.doc_id for m in members)
        assert all(m.cluster_size == len(members) for m in members)
        assert len(members) >= 2  # singletons never enter the pair graph


def test_agg_mode_exact_deterministic_tiebreak(spark):
    from collections import Counter as C

    rows = OPS["agg_mode_exact"].fn(spark, SF_SMALL).collect()
    o = t(spark, SF_SMALL, "orders").select("o_orderstatus", "o_orderpriority").collect()
    by_status = {}
    for r in o:
        by_status.setdefault(r.o_orderstatus, C())[r.o_orderpriority] += 1
    for r in rows:
        c = by_status[r.o_orderstatus]
        best = max(c.values())
        assert r.mode_count == best
        assert r.mode_priority == min(k for k, v in c.items() if v == best)


def test_sink_orc_roundtrip_rows(spark):
    res = OPS["sink_orc_roundtrip"].fn(spark, SF_SMALL)
    n_nations = t(spark, SF_SMALL, "supplier").join(
        t(spark, SF_SMALL, "nation"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("n_name").distinct().count()
    assert res.count() == n_nations


def test_pipeline_curation_composes_component_ops(spark):
    """The flagship pipeline's per-source accounting must equal recomposing
    its three component ops' own Spark outputs."""
    rep = {r.doc_id: r for r in OPS["text_repetition_score"].fn(spark, SF_SMALL).collect()}
    canon = {
        r.doc_id: r.canonical_id
        for r in OPS["dedup_canonical_docs"].fn(spark, SF_SMALL).collect()
    }
    src = {r.doc_id: r.source for r in t(spark, SF_SMALL, "documents").collect()}
    want = {}
    for doc_id, r in rep.items():
        if r.repetitive or r.n_tokens < 20:
            continue
        if doc_id in canon and canon[doc_id] != doc_id:
            continue
        s = src[doc_id]
        n, tot = want.get(s, (0, 0))
        want[s] = (n + 1, tot + r.n_tokens)
    got = {
        r.source: (r.n_docs, r.total_tokens)
        for r in OPS["pipeline_curation_end2end"].fn(spark, SF_SMALL).collect()
    }
    assert got == want
    assert sum(n for n, _ in got.values()) < len(rep)  # gates are non-vacuous


def test_agg_percentile_exact_matches_python(spark):
    rows = {r.l_returnflag: r for r in OPS["agg_percentile_exact"].fn(spark, SF_SMALL).collect()}
    vals = {}
    for r in t(spark, SF_SMALL, "lineitem").select("l_returnflag", "l_quantity").collect():
        vals.setdefault(r.l_returnflag, []).append(r.l_quantity)
    for flag, vs in vals.items():
        vs.sort()
        for attr, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
            idx = q * (len(vs) - 1)
            lo, frac = int(idx), idx - int(idx)
            want = vs[lo] + (vs[min(lo + 1, len(vs) - 1)] - vs[lo]) * frac
            want = math.floor(want * 1e6 + 0.5) / 1e6
            assert abs(getattr(rows[flag], attr) - want) < 1e-9


def test_win_funnel_pattern_matches_python(spark):
    ev = sorted(
        (
            (r.user_id, r.ts, r.event_id, r.event_type)
            for r in t(spark, SF_SMALL, "events").collect()
        ),
    )
    by_user = {}
    for u, ts, eid, et in ev:
        by_user.setdefault(u, []).append((ts, eid, et))
    want = set()
    for u, rows in by_user.items():
        rows.sort()
        for (ts, eid, et), (nts, nid, net) in zip(rows, rows[1:]):
            us = (nts - ts).total_seconds() * 1e6
            if et == "view" and net == "purchase" and us <= 3600 * 1e6:
                want.add((u, eid, nid, int(us // 1e6)))
    got = {
        (r.user_id, r.view_id, r.purchase_id, r.gap_seconds)
        for r in OPS["win_funnel_pattern"].fn(spark, SF_SMALL).collect()
    }
    assert got == want
    assert got  # funnel pairs exist at this SF


def test_cdc_merge_upsert_key_semantics(spark):
    rows = OPS["cdc_merge_upsert"].fn(spark, SF_SMALL).collect()
    orders = {r.o_orderkey for r in t(spark, SF_SMALL, "orders").collect()}
    by_src = {}
    for r in rows:
        by_src.setdefault(r.src, set()).add(r.o_orderkey)
    upd_keys = {k for k in orders if k % 97 == 0}
    ins_base = {k for k in orders if k % 101 == 0}
    assert by_src.get("updated", set()) == upd_keys
    assert by_src.get("inserted", set()) == {k + 1000000000 for k in ins_base}
    assert by_src.get("kept", set()) == orders - upd_keys
    # merged table: every key exactly once
    keys = [r.o_orderkey for r in rows]
    assert len(keys) == len(set(keys))


def test_graph_random_walks_deterministic_and_valid(spark):
    tables(spark, SF_SMALL)
    edges = {
        (r.src, r.dst)
        for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
    }
    a = OPS["graph_random_walks"].fn(spark, SF_SMALL).collect()
    b = OPS["graph_random_walks"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_walk = {}
    for r in a:
        by_walk.setdefault(r.seed, {})[r.step] = r.node
    assert len(by_walk) > 0
    for seed, steps in by_walk.items():
        assert steps[0] == seed
        ks = sorted(steps)
        assert ks == list(range(len(ks)))  # contiguous prefix (stops at sinks)
        for i, j in zip(ks, ks[1:]):
            assert (steps[i], steps[j]) in edges  # every hop is a real edge


def test_agg_entropy_matches_python(spark):
    rows = {r.user_id: r.entropy for r in OPS["agg_entropy"].fn(spark, SF_SMALL).collect()}
    ev = t(spark, SF_SMALL, "events").select("user_id", "event_type").collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, Counter())[r.event_type] += 1
    for user, c in by_user.items():
        tot = sum(c.values())
        terms = [
            math.floor((-(n / tot) * math.log(n / tot)) * 1e9 + 0.5) / 1e9
            for n in c.values()
        ]
        want = math.floor(sum(terms) * 1e6 + 0.5) / 1e6
        assert abs(rows[user] - want) < 2e-6
        assert 0.0 <= rows[user] <= math.log(5) + 1e-9  # ≤ ln(#event types)


def test_graph_hits_matches_python_power_iteration(spark):
    tables(spark, SF_SMALL)
    edges = sorted(
        {
            (r.src, r.dst)
            for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
        }
    )
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    h = {v: 1.0 for v in nodes}
    for _ in range(10):
        a = {v: 0.0 for v in nodes}
        for s, d in edges:
            a[d] += h[s]
        asum = sum(a.values())
        a = {v: x / asum for v, x in a.items()}
        h = {v: 0.0 for v in nodes}
        for s, d in edges:
            h[s] += a[d]
        hsum = sum(h.values())
        h = {v: x / hsum for v, x in h.items()}
    got = {r.node: r for r in OPS["graph_hits"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v].hub - h[v]) < 1e-5
        assert abs(got[v].authority - a[v]) < 1e-5


def test_text_js_divergence_bounds(spark):
    rows = OPS["text_js_divergence"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        # JS divergence (nats) is bounded by ln 2 and positive for
        # distinct distributions
        assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9
    assert any(r.js_divergence > 0 for r in rows)


def test_scan_schema_evolution_null_extension(spark):
    res = OPS["scan_schema_evolution"].fn(spark, SF_SMALL).collect()
    orders = t(spark, SF_SMALL, "orders").count()
    assert len(res) == orders
    for r in res:
        if r.o_orderkey % 2 == 0:
            assert r.o_orderpriority is None  # gen-1 rows null-extend
        else:
            assert r.o_orderpriority is not None


def test_sim_rrf_fusion_invariants(spark):
    rows = OPS["sim_rrf_fusion"].fn(spark, SF_SMALL).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for q, rs in by_q.items():
        assert len(rs) == 10
        # rrf scores are sums of 1/(60+r) terms: bounded by 2/61
        for r in rs:
            assert 0 < r.rrf <= 2 / 61 + 1e-12
            assert r.vec_id >= 5  # queries excluded from the corpus


def test_ts_forecast_backtest_matches_python(spark):
    rows = {r.user_id: r for r in OPS["ts_forecast_backtest"].fn(spark, SF_SMALL).collect()}
    ev = t(spark, SF_SMALL, "events").collect()
    daily = {}
    for r in ev:
        d = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days
        daily.setdefault(r.user_id, {}).setdefault(d, []).append(r.value)
    for user, dv in daily.items():
        days = sorted(dv)
        vals = {d: math.floor((sum(v) / len(v)) * 1e6 + 0.5) / 1e6 for d, v in dv.items()}
        naive_err, ma_err = [], []
        for i, d in enumerate(days):
            if i == 0:
                continue
            prev7 = [vals[x] for x in days[max(0, i - 7):i]]
            naive = vals[days[i - 1]]
            ma = math.floor((sum(prev7) / len(prev7)) * 1e6 + 0.5) / 1e6
            naive_err.append(abs(vals[d] - naive))
            ma_err.append(abs(vals[d] - ma))
        if not naive_err:
            assert user not in rows
            continue
        got = rows[user]
        assert got.n_evals == len(naive_err)
        assert abs(got.mae_naive - math.floor(sum(naive_err) / len(naive_err) * 1e6 + 0.5) / 1e6) < 2e-6
        assert abs(got.mae_ma - math.floor(sum(ma_err) / len(ma_err) * 1e6 + 0.5) / 1e6) < 2e-6


def test_sample_hash_deterministic_reproducible(spark):
    a = OPS["sample_hash_deterministic"].fn(spark, SF_SMALL).collect()
    b = OPS["sample_hash_deterministic"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_type = {}
    for r in a:
        by_type.setdefault(r.event_type, []).append(r.event_id)
    import hashlib

    ev = t(spark, SF_SMALL, "events").select("event_type", "event_id").collect()
    pool = {}
    for r in ev:
        pool.setdefault(r.event_type, []).append(r.event_id)
    for et, ids in pool.items():
        want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:100]
        assert sorted(by_type[et]) == sorted(want)


def test_graph_butterfly_matches_python(spark):
    cs = {
        (r.o_custkey, r.l_suppkey)
        for r in t(spark, SF_SMALL, "orders")
        .join(
            t(spark, SF_SMALL, "lineitem").filter(F.col("l_suppkey") < 50),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .collect()
    }
    by_cust = {}
    for c, s in cs:
        by_cust.setdefault(c, set()).add(s)
    shared = Counter()
    for supps in by_cust.values():
        ss = sorted(supps)
        for i, s1 in enumerate(ss):
            for s2 in ss[i + 1:]:
                shared[(s1, s2)] += 1
    want = {
        pair: (n, n * (n - 1) // 2) for pair, n in shared.items() if n >= 2
    }
    got = {
        (r.s1, r.s2): (r.shared, r.butterflies)
        for r in OPS["graph_butterfly_count"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_win_retention_cohorts_invariants(spark):
    rows = OPS["win_retention_cohorts"].fn(spark, SF_SMALL).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r.cohort, {})[r.age_weeks] = r.active_users
    n_users = t(spark, SF_SMALL, "events").select("user_id").distinct().count()
    assert sum(ages[0] for ages in by_cohort.values()) == n_users  # age-0 covers all
    for ages in by_cohort.values():
        assert all(n <= ages[0] for n in ages.values())  # retention ≤ cohort size
        assert min(ages) == 0 and all(a >= 0 for a in ages)


def test_agg_histogram_covers_all_events(spark):
    rows = OPS["agg_histogram"].fn(spark, SF_SMALL).collect()
    total = sum(r.n for r in rows)
    assert total == t(spark, SF_SMALL, "events").count()
    for r in rows:
        assert r.bucket_lo == r.bucket * 50


def test_graph_assortativity_bounds(spark):
    row = OPS["graph_assortativity"].fn(spark, SF_SMALL).collect()[0]
    assert -1.0 <= row.assortativity <= 1.0
    assert row.n_edges > 0 and row.n_edges % 2 == 0  # symmetrized


def test_fn_try_arithmetic_null_semantics(spark):
    rows = OPS["fn_try_arithmetic"].fn(spark, SF_SMALL).collect()
    ev = {r.event_id: r for r in t(spark, SF_SMALL, "events").collect()}
    assert len(rows) == len(ev)
    for r in rows:
        src = ev[r.event_id]
        if src.user_id % 5 == 0:
            assert r.safe_div is None  # divide-by-zero → NULL, not a crash
        else:
            want = math.floor(src.value / (src.user_id % 5) * 1e6 + 0.5) / 1e6
            assert abs(r.safe_div - want) < 1e-9
        if r.event_id % 3 == 0:
            assert r.maybe_int is None  # non-numeric string → NULL
        else:
            assert r.maybe_int == r.event_id


def test_join_asof_nearest_matches_python(spark):
    ev = t(spark, SF_SMALL, "events").collect()
    errs = [(r.user_id, r.event_id, r.ts) for r in ev if r.event_type == "error"]
    purs = {}
    for r in ev:
        if r.event_type == "purchase":
            purs.setdefault(r.user_id, []).append((r.event_id, r.ts))
    want = {}
    for u, eid, ets in errs:
        if u not in purs:
            continue
        best = min(
            purs[u],
            key=lambda p: (abs((p[1] - ets).total_seconds()), p[0]),
        )
        gap_us = abs((best[1] - ets).total_seconds()) * 1e6
        want[eid] = (best[0], int(round(gap_us) // 1e6))
    got = {
        r.err_id: (r.pur_id, r.gap_seconds)
        for r in OPS["join_asof_nearest"].fn(spark, SF_SMALL).collect()
    }
    assert got == want


def test_text_bm25_matches_python(spark):
    docs = {r.doc_id: r.text.lower().split(" ") for r in t(spark, SF_SMALL, "documents").collect()}
    docs = {k: [x for x in v if x] for k, v in docs.items()}
    n_docs = len(docs)
    avg_len = sum(len(v) for v in docs.values()) / n_docs
    terms = ("merge", "scan", "hash")
    df = {q: sum(1 for v in docs.values() if q in v) for q in terms}
    want = {}
    for d, toks in docs.items():
        score = 0.0
        for q in terms:
            tf = toks.count(q)
            if not tf:
                continue
            idf = math.log((n_docs - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            ts = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avg_len))
            score += math.floor(ts * 1e9 + 0.5) / 1e9
        if score > 0:
            want[d] = math.floor(score * 1e6 + 0.5) / 1e6
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.doc_id, r.bm25) for r in OPS["text_bm25_search"].fn(spark, SF_SMALL).collect()]
    for (gd, gs), (wd, ws) in zip(got, top):
        assert gd == wd and abs(gs - ws) < 2e-6


def test_train_test_split_deterministic_and_complete(spark):
    import hashlib

    rows = {r.split: r for r in OPS["pipeline_train_test_split"].fn(spark, SF_SMALL).collect()}
    doc_ids = [r.doc_id for r in t(spark, SF_SMALL, "documents").collect()]
    want = Counter()
    for d in doc_ids:
        b = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 10
        want["train" if b < 8 else "val" if b == 8 else "test"] += 1
    assert {k: rows[k].n_docs for k in rows} == dict(want)
    assert sum(r.n_docs for r in rows.values()) == len(doc_ids)
    # roughly 80/10/10 at this corpus size
    assert rows["train"].n_docs > rows["val"].n_docs
    assert rows["train"].n_docs > rows["test"].n_docs


def test_ml_feature_scale_bounds(spark):
    rows = OPS["ml_feature_scale"].fn(spark, SF_SMALL).collect()
    assert len(rows) == t(spark, SF_SMALL, "events").count()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        mm = [r.minmax for r in rs]
        assert min(mm) == 0.0 and max(mm) == 1.0  # endpoints hit exactly
        zs = [r.zscore for r in rs]
        mean_z = sum(zs) / len(zs)
        assert abs(mean_z) < 1e-3  # standardized


def test_ts_changepoint_matches_python(spark):
    rows = {r.user_id: r for r in OPS["ts_changepoint_naive"].fn(spark, SF_SMALL).collect()}
    ev = t(spark, SF_SMALL, "events").collect()
    daily = {}
    for r in ev:
        d = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days
        daily.setdefault(r.user_id, {}).setdefault(d, []).append(r.value)
    for user, dv in daily.items():
        days = sorted(dv)
        vals = [math.floor(sum(v) / len(v) * 1e6 + 0.5) / 1e6 for v in (dv[d] for d in days)]
        best = None
        for i in range(len(days)):
            cn = i + 1
            if cn < 3 or len(days) - cn < 3:
                continue
            before = sum(vals[: i + 1]) / cn
            after = sum(vals[i + 1:]) / (len(days) - cn)
            shift = math.floor(abs(before - after) * 1e9 + 0.5) / 1e9
            if best is None or shift > best[1]:
                best = (days[i], shift)
        if best is None:
            assert user not in rows
            continue
        got = rows[user]
        assert got.changepoint_day == best[0]
        assert abs(got.mean_shift - math.floor(best[1] * 1e6 + 0.5) / 1e6) < 2e-6


def test_graph_ego_edges_induced(spark):
    tables(spark, SF_SMALL)
    edges = {
        (r.src, r.dst)
        for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
    }
    nbr = {}
    for s, d in edges:
        nbr.setdefault(s, set()).add(d)
        nbr.setdefault(d, set()).add(s)
    ego = {"c:1"} | nbr.get("c:1", set())
    ego = ego | {x for n in list(ego) for x in nbr.get(n, set())}
    want = {(s, d) for s, d in edges if s in ego and d in ego}
    got = {(r.src, r.dst) for r in OPS["graph_ego_edges"].fn(spark, SF_SMALL).collect()}
    assert got == want and got


def test_set_symmetric_diff_disjoint_and_complete(spark):
    rows = OPS["set_symmetric_diff"].fn(spark, SF_SMALL).collect()
    early = {r.o_custkey for r in rows if r.cohort == "early_only"}
    late = {r.o_custkey for r in rows if r.cohort == "late_only"}
    assert not (early & late)
    import datetime

    o = t(spark, SF_SMALL, "orders").collect()
    cut = datetime.datetime(1994, 1, 1)
    h1 = {r.o_custkey for r in o if r.o_orderdate < cut}
    h2 = {r.o_custkey for r in o if r.o_orderdate >= cut}
    assert early == h1 - h2 and late == h2 - h1


def test_text_kwic_window_contains_term(spark):
    rows = OPS["text_kwic"].fn(spark, SF_SMALL).collect()
    assert rows
    docs = {r.doc_id: r.text.lower().split(" ") for r in t(spark, SF_SMALL, "documents").collect()}
    for r in rows:
        ctx = r.context.split(" ")
        assert "hash" in ctx
        assert len(ctx) <= 7
        toks = docs[r.doc_id]
        assert toks[r.position - 1] == "hash"


def test_agg_funnel_conversion_matches_python(spark):
    ev = t(spark, SF_SMALL, "events").collect()
    firsts = {}
    for r in ev:
        d = firsts.setdefault(r.user_id, {})
        if r.event_type in ("view", "click", "purchase"):
            if r.event_type not in d or r.ts < d[r.event_type]:
                d[r.event_type] = r.ts
    s1 = s2 = s3 = 0
    for d in firsts.values():
        if "view" in d:
            s1 += 1
            if "click" in d and d["click"] > d["view"]:
                s2 += 1
                if "purchase" in d and d["purchase"] > d["click"]:
                    s3 += 1
    row = OPS["agg_funnel_conversion"].fn(spark, SF_SMALL).collect()[0]
    assert (row.n_view, row.n_click_after, row.n_purchase_after) == (s1, s2, s3)
    assert abs(row.conversion - math.floor(s3 / s1 * 1e6 + 0.5) / 1e6) < 1e-9
    assert 0 < s3 < s1  # ordered funnel is non-vacuous at this SF


def test_agg_gini_matches_python(spark):
    rows = {r.o_orderpriority: r for r in OPS["agg_gini"].fn(spark, SF_SMALL).collect()}
    o = t(spark, SF_SMALL, "orders").collect()
    by_p = {}
    for r in o:
        by_p.setdefault(r.o_orderpriority, []).append((r.o_totalprice, r.o_orderkey))
    for p, vals in by_p.items():
        vals.sort()
        n = len(vals)
        tot = sum(v for v, _ in vals)
        ws = sum((i + 1) * v for i, (v, _) in enumerate(vals))
        gini = 2.0 * ws / (n * tot) - (n + 1.0) / n
        assert abs(rows[p].gini - math.floor(gini * 1e6 + 0.5) / 1e6) < 2e-6
        assert 0.0 <= rows[p].gini <= 1.0
        assert rows[p].n == n


def test_graph_reciprocity_matches_python(spark):
    tables(spark, SF_SMALL)
    edges = {
        (r.src, r.dst)
        for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
    }
    recip = sum(1 for s, d in edges if (d, s) in edges)
    row = OPS["graph_reciprocity"].fn(spark, SF_SMALL).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_reciprocal == recip
    assert 0.0 < row.reciprocity <= 1.0  # cyclic fixture has mutual edges


def test_ts_autocorr_range(spark):
    rows = OPS["ts_autocorr"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.acf1 is not None:
            assert -1.0 - 1e-9 <= r.acf1 <= 1.0 + 1e-9
        if r.acf2 is not None:
            assert -1.0 - 1e-9 <= r.acf2 <= 1.0 + 1e-9
        assert r.n_days >= 7


def test_profile_events_table_matches_python(spark):
    rows = {r.col: r for r in OPS["profile_events_table"].fn(spark, SF_SMALL).collect()}
    ev = t(spark, SF_SMALL, "events").collect()
    assert rows["event_id"].n_rows == len(ev)
    assert rows["event_id"].n_distinct == len({r.event_id for r in ev})
    assert rows["user_id"].n_distinct == len({r.user_id for r in ev})
    assert rows["event_type"].n_distinct == 5
    for r in rows.values():
        assert r.n_null == 0  # fixture has no nulls
    assert rows["event_type"].min_val == min(r.event_type for r in ev)
    mx = max(r.value for r in ev)
    assert rows["value"].max_val == str(math.floor(mx * 1e6 + 0.5) / 1e6)


def test_win_sessionize_ids_gap_rule(spark):
    rows = OPS["win_sessionize_ids"].fn(spark, SF_SMALL).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    n_multi = 0
    for user, rs in by_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        assert rs[0].session_id == 1
        for a, b in zip(rs, rs[1:]):
            gap = (b.ts - a.ts).total_seconds()
            if gap > 1800:
                assert b.session_id == a.session_id + 1
            else:
                assert b.session_id == a.session_id
        n_multi += rs[-1].session_id > 1
    assert n_multi > 0  # 30-day fixture spans many sessions


def test_graph_katz_matches_python_power_series(spark):
    tables(spark, SF_SMALL)
    edges = [
        (r.src, r.dst)
        for r in catalog.hierarchy_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    x = {v: 1.0 for v in nodes}
    for _ in range(4):
        inflow = Counter()
        for s, d in edges:
            inflow[d] += x[s]
        x = {v: 1.0 + 0.1 * inflow.get(v, 0.0) for v in nodes}
    got = {r.node: r.katz for r in OPS["graph_katz"].fn(spark, SF_SMALL).collect()}
    assert set(got) == nodes
    for v in nodes:
        assert abs(got[v] - x[v]) < 1e-5, v


def test_graph_label_propagation_matches_python(spark):
    tables(spark, SF_SMALL)
    tc = [
        (r.src, r.dst)
        for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    ue = set(tc) | {(d, s) for s, d in tc}
    adj = {}
    for s, d in ue:
        adj.setdefault(s, set()).add(d)
    lab = {v: v for v in adj}
    for _ in range(4):
        new = {}
        for v in adj:
            cnt = Counter(lab[u] for u in adj[v])
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0] if cnt else lab[v]
            new[v] = best
        lab = new
    got = {
        r.node: r.community
        for r in OPS["graph_label_propagation"].fn(spark, SF_SMALL).collect()
    }
    assert got == lab
    # non-trivial: fewer communities than nodes (densely connected fixture)
    assert len(set(got.values())) < len(got)


def test_graph_topo_levels_semantics(spark):
    got = {r.node: r.level for r in OPS["graph_topo_levels"].fn(spark, SF_SMALL).collect()}
    # customers/suppliers are roots (level 0), nations level 1, region level 2
    assert all(lvl == 1 for n, lvl in got.items() if n.startswith("n:"))
    assert all(lvl == 2 for n, lvl in got.items() if n.startswith("r:"))
    assert all(lvl == 0 for n, lvl in got.items() if n[:2] in ("c:", "s:"))


def test_graph_harmonic_vs_python_bfs(spark):
    tables(spark, SF_SMALL)
    edges = [
        (r.src, r.dst)
        for r in catalog.hierarchy_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    ue = set(edges) | {(d, s) for s, d in edges}
    adj = {}
    for s, d in ue:
        adj.setdefault(s, set()).add(d)
    import collections

    def bfs(s):
        dist = {s: 0}
        q = collections.deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= 6:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    got = {r.node: r.harmonic for r in OPS["graph_harmonic"].fn(spark, SF_SMALL).collect()}
    hubs = [v for v in adj if v[:2] in ("n:", "r:")]
    assert set(got) == set(hubs)
    for s in hubs:
        dist = bfs(s)
        expected = sum(
            math.floor(1e9 / d + 0.5) / 1e9 for v, d in dist.items() if v != s
        )
        assert abs(got[s] - math.floor(expected * 1e6 + 0.5) / 1e6) < 2e-6, s


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return num / den


def test_sim_knn_classify_matches_python(spark):
    rows = t(spark, SF_SMALL, "embeddings").collect()
    vecs = {r.vec_id: ([float(x) for x in r.embedding], r.label) for r in rows}
    got = {r.q_id: r for r in OPS["sim_knn_classify"].fn(spark, SF_SMALL).collect()}
    n_right = 0
    for q in range(20):
        qv, true_label = vecs[q]
        scored = sorted(
            ((round(_cos(v, qv), 6), vid) for vid, (v, _) in vecs.items() if vid >= 50),
            key=lambda p: (-p[0], p[1]),
        )[:5]
        votes = Counter(vecs[vid][1] for _, vid in scored)
        pred = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[q].pred_label == pred, q
        assert got[q].true_label == true_label
        n_right += got[q].correct
    assert 0 <= n_right <= 20


def test_sim_mmr_rerank_matches_python_greedy(spark):
    rows = t(spark, SF_SMALL, "embeddings").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    qv = vecs[0]
    rel = sorted(
        ((round(_cos(v, qv), 6), vid) for vid, v in vecs.items() if vid != 0),
        key=lambda p: (-p[0], p[1]),
    )[:20]
    cand = {vid: r for r, vid in rel}
    sel, expected = [], []
    for step in range(1, 6):
        best = None
        for vid, r in cand.items():
            if vid in sel:
                continue
            if not sel:
                score = 0.7 * r
            else:
                ms = max(round(_cos(vecs[vid], vecs[s]), 6) for s in sel)
                score = 0.7 * r - 0.3 * ms
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, score)
        sel.append(best[1])
        expected.append((step, best[1], math.floor(best[2] * 1e6 + 0.5) / 1e6))
    got = [
        (r.rank, r.vec_id, r.score)
        for r in sorted(OPS["sim_mmr_rerank"].fn(spark, SF_SMALL).collect())
    ]
    assert got == expected
    # diversity: the MMR picks differ from plain top-5 relevance
    top5 = [vid for _, vid in rel[:5]]
    assert sel != top5 or len(set(sel)) == 5


def test_text_pmi_bigrams_matches_python(spark):
    docs = t(spark, SF_SMALL, "documents").select("text").collect()
    uni, big = Counter(), Counter()
    for (text,) in docs:
        tk = [w for w in text.lower().split(" ") if w]
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    nu, nb = sum(uni.values()), sum(big.values())
    scored = []
    for (w1, w2), c12 in big.items():
        if c12 < 5:
            continue
        pmi = math.log((c12 / nb) / ((uni[w1] / nu) * (uni[w2] / nu)))
        scored.append((math.floor(pmi * 1e6 + 0.5) / 1e6, w1, w2, c12))
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    expected = [(w1, w2, c12, p) for p, w1, w2, c12 in scored[:20]]
    got = [
        (r.w1, r.w2, r.c12, r.pmi)
        for r in OPS["text_pmi_bigrams"].fn(spark, SF_SMALL).collect()
    ]
    assert got == expected


def test_text_zipf_slope_matches_python(spark):
    docs = t(spark, SF_SMALL, "documents").select("text").collect()
    uni = Counter()
    for (text,) in docs:
        uni.update(w for w in text.lower().split(" ") if w)
    ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    pts = [
        (
            math.floor(math.log(i + 1) * 1e9 + 0.5) / 1e9,
            math.floor(math.log(c) * 1e9 + 0.5) / 1e9,
        )
        for i, (_, c) in enumerate(ranked)
    ]
    n = float(len(pts))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    row = OPS["text_zipf_slope"].fn(spark, SF_SMALL).collect()[0]
    assert row.n_terms == len(pts)
    assert abs(row.zipf_slope - math.floor(slope * 1e6 + 0.5) / 1e6) < 2e-6
    # synthetic near-uniform corpus: slope should be shallow (> -1)
    assert row.zipf_slope > -1.0


def test_ts_rolling_corr_matches_python(spark):
    li = (
        t(spark, SF_SMALL, "lineitem")
        .filter(F.col("l_suppkey") == 1)
        .select("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .collect()
    )
    rows = sorted(li, key=lambda r: (r.l_shipdate, r.l_orderkey, r.l_linenumber))
    qs = [int(r.l_quantity) for r in rows]
    ps = [int(math.floor(r.l_extendedprice * 100.0 + 0.5)) for r in rows]
    got = {
        (r.l_shipdate, r.l_orderkey, r.l_linenumber): r.rolling_r
        for r in OPS["ts_rolling_corr"].fn(spark, SF_SMALL)
        .filter(F.col("l_suppkey") == 1)
        .collect()
    }
    assert len(got) == max(0, len(rows) - 19)
    for i in range(19, len(rows)):
        q, p = qs[i - 19 : i + 1], ps[i - 19 : i + 1]
        n = 20.0
        sq, sp = float(sum(q)), float(sum(p))
        sqp = float(sum(a * b for a, b in zip(q, p)))
        sqq, spp = float(sum(a * a for a in q)), float(sum(b * b for b in p))
        vq, vp = n * sqq - sq * sq, n * spp - sp * sp
        key = (rows[i].l_shipdate, rows[i].l_orderkey, rows[i].l_linenumber)
        if vq == 0 or vp == 0:
            assert got[key] is None
        else:
            r = (n * sqp - sq * sp) / (math.sqrt(vq) * math.sqrt(vp))
            assert abs(got[key] - math.floor(r * 1e6 + 0.5) / 1e6) < 2e-6


def test_agg_skew_kurtosis_matches_python(spark):
    rows = t(spark, SF_SMALL, "lineitem").select("l_returnflag", "l_quantity").collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(int(r.l_quantity))
    got = {r.l_returnflag: r for r in OPS["agg_skew_kurtosis"].fn(spark, SF_SMALL).collect()}
    for flag, qs in by_flag.items():
        n = float(len(qs))
        mean = sum(qs) / n
        m2 = sum(q * q for q in qs) / n - mean * mean
        m3 = sum(q**3 for q in qs) / n - 3 * mean * sum(q * q for q in qs) / n + 2 * mean**3
        m4 = (
            sum(q**4 for q in qs) / n
            - 4 * mean * sum(q**3 for q in qs) / n
            + 6 * mean * mean * sum(q * q for q in qs) / n
            - 3 * mean**4
        )
        assert abs(got[flag].skewness - math.floor(m3 / m2**1.5 * 1e6 + 0.5) / 1e6) < 2e-6
        assert abs(got[flag].kurtosis - (math.floor(m4 / (m2 * m2) * 1e6 + 0.5) / 1e6 - 3.0)) < 2e-6
        # quantity is ~uniform: near-zero skew, platykurtic (kurtosis ~ -1.2)
        assert abs(got[flag].skewness) < 0.2
        assert -1.5 < got[flag].kurtosis < -0.8


def test_win_distinct_running_monotone_and_bounded(spark):
    res = OPS["win_distinct_running"].fn(spark, SF_SMALL)
    ev = t(spark, SF_SMALL, "events")
    n_types = ev.select("event_type").distinct().count()
    import pandas as pd

    pdf = res.toPandas()
    assert (pdf.n_types_seen >= 1).all() and (pdf.n_types_seen <= n_types).all()
    # running distinct counts are monotone nondecreasing per user in event order
    evp = ev.select("user_id", "event_id", "ts").toPandas()
    m = pdf.merge(evp, on=["user_id", "event_id"])
    m = m.sort_values(["user_id", "ts", "event_id"])
    assert (m.groupby("user_id").n_types_seen.diff().fillna(0) >= 0).all()


def test_reshape_unpivot_count_and_roundtrip(spark):
    li = t(spark, SF_SMALL, "lineitem")
    res = OPS["reshape_unpivot"].fn(spark, SF_SMALL)
    assert res.count() == 4 * li.count()
    back = res.groupBy("l_orderkey", "l_linenumber").pivot("measure").sum("value")
    row = back.filter((F.col("l_orderkey") == 1)).collect()
    orig = li.filter(F.col("l_orderkey") == 1).collect()
    assert len(row) == len(orig)


def test_graph_modularity_matches_python(spark):
    tables(spark, SF_SMALL)
    tc = [
        (r.src, r.dst)
        for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    ue = set(tc) | {(d, s) for s, d in tc}
    adj = {}
    for s, d in ue:
        adj.setdefault(s, set()).add(d)
    lab = {v: v for v in adj}
    for _ in range(4):
        new = {}
        for v in adj:
            cnt = Counter(lab[u] for u in adj[v])
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0] if cnt else lab[v]
        lab = new
    und = {(s, d) for s, d in ue if s < d}
    m = float(len(und))
    lin, dtot, nn = Counter(), Counter(), Counter()
    for s, d in und:
        if lab[s] == lab[d]:
            lin[lab[s]] += 1
    for v in adj:
        dtot[lab[v]] += len(adj[v])
        nn[lab[v]] += 1
    got = {r.community: r for r in OPS["graph_modularity"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(nn)
    q_total = 0.0
    for c in nn:
        q = lin.get(c, 0) / m - (dtot[c] / (2.0 * m)) ** 2
        assert got[c].n_nodes == nn[c] and got[c].intra_edges == lin.get(c, 0)
        assert got[c].degree_total == dtot[c]
        assert abs(got[c].q_contrib - math.floor(q * 1e6 + 0.5) / 1e6) < 2e-6
        q_total += q
    assert -1.0 <= q_total <= 1.0


def test_text_ngram_novelty_matches_python(spark):
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    seen_first = {}
    per_doc = {}
    for r in sorted(docs, key=lambda r: r.doc_id):
        tk = [w for w in r.text.lower().split(" ") if w]
        grams = {" ".join(tk[i : i + 8]) for i in range(len(tk) - 7)} if len(tk) >= 8 else set()
        per_doc[r.doc_id] = grams
        for g in grams:
            seen_first.setdefault(g, r.doc_id)
    got = {r.doc_id: r for r in OPS["text_ngram_novelty"].fn(spark, SF_SMALL).collect()}
    for doc_id, grams in per_doc.items():
        if not grams:
            assert doc_id not in got
            continue
        novel = sum(1 for g in grams if seen_first[g] == doc_id)
        assert got[doc_id].n_ngrams == len(grams)
        assert got[doc_id].n_novel == novel
    # the near-duplicate-heavy fixture must show real non-novelty
    assert any(r.n_novel < r.n_ngrams for r in got.values())


def test_agg_weighted_median_matches_python(spark):
    rows = t(spark, SF_SMALL, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    ).collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r)
    got = {
        r.l_returnflag: r.weighted_median
        for r in OPS["agg_weighted_median"].fn(spark, SF_SMALL).collect()
    }
    for flag, rs in by_flag.items():
        rs.sort(key=lambda r: (r.l_extendedprice, r.l_orderkey, r.l_linenumber))
        tot = sum(int(r.l_quantity) for r in rs)
        cum = 0
        for r in rs:
            cum += int(r.l_quantity)
            if cum * 2 >= tot:
                assert got[flag] == r.l_extendedprice
                break


def test_ts_holt_linear_matches_python(spark):
    ev = (
        t(spark, SF_SMALL, "events")
        .filter(F.col("user_id") == 1)
        .select("event_id", "ts", "value")
        .collect()
    )
    rows = sorted(ev, key=lambda r: (r.ts, r.event_id))[:20]
    xs = [r.value for r in rows]
    l, b = xs[0], 0.0
    exp = [(l, b)]
    for x in xs[1:]:
        l_new = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
        exp.append((l, b))
    got = {
        r.event_id: r
        for r in OPS["ts_holt_linear"].fn(spark, SF_SMALL)
        .filter(F.col("user_id") == 1)
        .collect()
    }
    assert len(got) == len(rows)
    for r, (l_e, b_e) in zip(rows, exp):
        g = got[r.event_id]
        assert g.level == math.floor(l_e * 1e4 + 0.5) / 1e4
        assert g.trend == math.floor(b_e * 1e4 + 0.5) / 1e4
        assert g.forecast_next == math.floor((l_e + b_e) * 1e4 + 0.5) / 1e4


def test_agg_string_agg_roster_sorted(spark):
    rows = OPS["agg_string_agg"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        names = r.roster.split("|")
        assert names == sorted(names)
        assert len(names) == r.n_cust


def test_subquery_scalar_correlated_matches_python(spark):
    import statistics

    rows = t(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    ).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.c_nationkey, []).append(r.c_acctbal)
    thr = {
        k: math.floor(statistics.fmean(v) * 1e6 + 0.5) / 1e6
        for k, v in by_nation.items()
    }
    expected = {r.c_custkey for r in rows if r.c_acctbal > thr[r.c_nationkey]}
    got = {r.c_custkey for r in OPS["subquery_scalar_correlated"].fn(spark, SF_SMALL).collect()}
    assert got == expected


def test_entity_resolution_matches_python_union_find(spark):
    rows = t(spark, SF_SMALL, "customer").select("c_custkey", "c_name").collect()
    names = {r.c_custkey: r.c_name for r in rows}

    def lev(a, b):
        if len(a) == len(b):
            d = sum(1 for x, y in zip(a, b) if x != y)
            if d <= 1:
                return d
        # full DP only when the cheap same-length check is inconclusive
        import functools

        @functools.lru_cache(maxsize=None)
        def rec(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                rec(i - 1, j) + 1,
                rec(i, j - 1) + 1,
                rec(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return rec(len(a), len(b))

    parent = {k: k for k in names}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    blocks = {}
    for k, n in names.items():
        blocks.setdefault(n[:-2], []).append(k)
    n_pairs = 0
    for blk in blocks.values():
        blk.sort()
        for i, a in enumerate(blk):
            for b in blk[i + 1 :]:
                if lev(names[a], names[b]) <= 1:
                    n_pairs += 1
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    assert OPS["join_fuzzy_name_blocked"].fn(spark, SF_SMALL).count() == n_pairs
    expected = {k: find(k) for k in names}
    clusters = Counter(expected.values())
    got = {r.c_custkey: r for r in OPS["pipeline_entity_resolution"].fn(spark, SF_SMALL).collect()}
    assert {k: v.canonical_key for k, v in got.items()} == expected
    for k, v in got.items():
        assert v.cluster_size == clusters[expected[k]]


def test_win_pareto_share_invariants(spark):
    import pandas as pd

    pdf = OPS["win_pareto_share"].fn(spark, SF_SMALL).toPandas()
    for _, g in pdf.groupby("c_nationkey"):
        g = g.sort_values(["rev_cents", "o_custkey"], ascending=[False, True])
        # cumulative share is monotone, ends at 1.0
        assert (g.cum_share.diff().fillna(g.cum_share.iloc[0]) > -1e-9).all()
        assert abs(g.cum_share.iloc[-1] - 1.0) < 2e-6
        # the flagged set covers at least 80% of revenue
        top = g[g.in_top80]
        assert top.rev_cents.sum() / g.rev_cents.sum() >= 0.8 - 1e-9


def test_ts_week_over_week_matches_python(spark):
    ev = t(spark, SF_SMALL, "events").select("event_type", "ts").collect()
    import datetime

    wk = Counter()
    for r in ev:
        monday = r.ts.date() - datetime.timedelta(days=r.ts.weekday())
        wk[(r.event_type, monday)] += 1
    got = {
        (r.event_type, r.week_start.date()): r
        for r in OPS["ts_week_over_week"].fn(spark, SF_SMALL).collect()
    }
    assert {(t_, d) for t_, d in got} == set(wk)
    for (t_, d), r in got.items():
        assert r.n == wk[(t_, d)]
        prev = wk.get((t_, d - datetime.timedelta(days=7)))
        if prev is None:
            assert r.prev_n is None and r.wow_change is None
        else:
            assert r.prev_n == prev
            assert abs(r.wow_change - math.floor((r.n - prev) / prev * 1e6 + 0.5) / 1e6) < 2e-6


def test_graph_risk_score_matches_python(spark):
    tables(spark, SF_SMALL)
    rows = OPS["graph_risk_score"].fn(spark, SF_SMALL).collect()
    prmax = max(r.pr for r in rows)
    degmax = max(r.degree for r in rows)
    for r in rows:
        exp = (
            0.5 * (r.pr / prmax)
            + 0.3 * (r.degree / degmax)
            + 0.2 * (1.0 if r.on_cycle else 0.0)
        )
        assert abs(r.risk_score - math.floor(exp * 1e6 + 0.5) / 1e6) < 2e-6
    # the cyclic fixture has both on-cycle and off-cycle entities
    assert any(r.on_cycle for r in rows) and any(not r.on_cycle for r in rows)
    assert max(r.risk_score for r in rows) <= 1.0


def test_win_median_rolling_matches_python(spark):
    li = (
        t(spark, SF_SMALL, "lineitem")
        .filter(F.col("l_suppkey") == 1)
        .select("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
        .collect()
    )
    rows = sorted(li, key=lambda r: (r.l_shipdate, r.l_orderkey, r.l_linenumber))
    cents = [int(math.floor(r.l_extendedprice * 100.0 + 0.5)) for r in rows]
    got = {
        (r.l_shipdate, r.l_orderkey, r.l_linenumber): r.rolling_median
        for r in OPS["win_median_rolling"].fn(spark, SF_SMALL)
        .filter(F.col("l_suppkey") == 1)
        .collect()
    }
    for i in range(19, len(rows)):
        frame = sorted(cents[i - 19 : i + 1])
        exp = (frame[9] + frame[10]) / 2.0 / 100.0
        key = (rows[i].l_shipdate, rows[i].l_orderkey, rows[i].l_linenumber)
        assert got[key] == exp


def test_pipeline_dataset_card_matches_python(spark):
    docs = t(spark, SF_SMALL, "documents").select("text", "lang", "source").collect()
    toks = [[w for w in r.text.lower().split(" ") if w] for r in docs]
    norm = Counter(r.text.lower().strip() for r in docs)
    got = {r.metric: r.value for r in OPS["pipeline_dataset_card"].fn(spark, SF_SMALL).collect()}
    assert got["n_docs"] == len(docs)
    assert got["n_tokens"] == sum(len(tk) for tk in toks)
    assert got["vocab_size"] == len({w for tk in toks for w in tk})
    assert got["n_langs"] == len({r.lang for r in docs})
    assert got["n_sources"] == len({r.source for r in docs})
    assert got["exact_dup_docs"] == sum(c for c in norm.values() if c > 1)
    rep = sum(
        1
        for tk in toks
        if tk and (1.0 - len(set(tk)) / len(tk)) > 0.6
    )
    assert got["repetitive_docs"] == rep


def test_graph_cycle_paths_all_close_and_bounded(spark):
    rows = OPS["graph_cycle_paths"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        hops = r.path.split("->")
        assert hops[0] == r.origin and hops[-1] == r.origin
        assert len(hops) - 1 == r.cycle_len <= 4
    # bipartite buys_from/co_located structure: cycles have even length
    assert {r.cycle_len for r in rows} <= {2, 4}


def test_graph_ownership_chains_share_sums_to_one_per_nation(spark):
    import pandas as pd

    pdf = OPS["graph_ownership_chains"].fn(spark, SF_SMALL).toPandas()
    assert (pdf.chain.str.split("->").str.len() == 3).all()
    cust = pdf[pdf.entity.str.startswith("c:")].copy()
    cust["nation"] = cust.chain.str.split("->").str[1]
    sums = cust.groupby("nation").effective_share.sum()
    assert ((sums - 1.0).abs() < 1e-3).all()


def test_join_null_safe_keeps_null_bucket(spark):
    rows = OPS["join_null_safe"].fn(spark, SF_SMALL).collect()
    c = t(spark, SF_SMALL, "customer")
    assert len(rows) == c.count()  # nobody dropped
    null_rows = [r for r in rows if r.seg is None]
    n_building = c.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert len(null_rows) == n_building
    assert all(r.seg_size == n_building for r in null_rows)


def test_pipeline_sample_inspection_is_deterministic_and_stratified(spark):
    a = sorted(
        (r.lang, r.source, r.rank, r.doc_id)
        for r in OPS["pipeline_sample_inspection"].fn(spark, SF_SMALL).collect()
    )
    b = sorted(
        (r.lang, r.source, r.rank, r.doc_id)
        for r in OPS["pipeline_sample_inspection"].fn(spark, SF_SMALL).collect()
    )
    assert a == b
    per_stratum = Counter((lang, src) for lang, src, _, _ in a)
    assert all(v <= 2 for v in per_stratum.values())


def test_text_langid_confusion_diag_dominates(spark):
    rows = OPS["text_langid_confusion"].fn(spark, SF_SMALL).collect()
    total = sum(r.n_docs for r in rows)
    diag = sum(r.n_docs for r in rows if r.true_lang == r.pred_lang)
    # self-trained markers: accuracy must beat the 1/5 uniform baseline
    assert diag / total > 0.2
    by_true = {}
    for r in rows:
        by_true.setdefault(r.true_lang, 0.0)
        by_true[r.true_lang] += r.frac_of_true
    for v in by_true.values():
        assert abs(v - 1.0) < 1e-4


def test_graph_betweenness_edge_matches_python_brandes(spark):
    tables(spark, SF_SMALL)
    edges = [
        (r.src, r.dst)
        for r in catalog.hierarchy_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    ue = set(edges) | {(d, s) for s, d in edges}
    adj = {}
    for s, d in ue:
        adj.setdefault(s, set()).add(d)
    sources = [v for v in adj if v[:2] in ("n:", "r:")]
    import collections

    eb = Counter()
    for s in sources:
        # Brandes single-source with edge accumulation, depth<=6
        dist, sigma, preds = {s: 0}, {s: 1.0}, {}
        order, q = [], collections.deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if dist[v] >= 6:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
                    preds.setdefault(w, []).append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds.get(w, ()):
                c = sigma[v] / sigma[w] * (1.0 + delta[w])
                delta[v] += c
                eb[(min(v, w), max(v, w))] += c
    got = {
        (r.src, r.dst): r.edge_betweenness
        for r in OPS["graph_betweenness_edge"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(eb)
    for k, v in eb.items():
        assert abs(got[k] - math.floor(v * 1e6 + 0.5) / 1e6) < 2e-6, k


def test_join_bucketed_colocated_equals_plain_join(spark):
    got = {r.o_orderstatus: r for r in OPS["join_bucketed_colocated"].fn(spark, SF_SMALL).collect()}
    li = t(spark, SF_SMALL, "lineitem")
    o = t(spark, SF_SMALL, "orders")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    exp = {
        r.o_orderstatus: r
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("rc"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k].n_items == exp[k].n and got[k].rev_cents == exp[k].rc


def test_graph_rich_club_matches_python(spark):
    tables(spark, SF_SMALL)
    tc = [
        (r.src, r.dst)
        for r in catalog.trade_credit_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    ue = set(tc) | {(d, s) for s, d in tc}
    deg = Counter(s for s, _ in ue)
    und = {(s, d) for s, d in ue if s < d}
    got = {r.k: r for r in OPS["graph_rich_club"].fn(spark, SF_SMALL).collect()}
    for k in (5, 10, 15, 20):
        club = {v for v, d in deg.items() if d > k}
        ew = sum(1 for s, d in und if s in club and d in club)
        assert got[k].n_rich == len(club)
        assert got[k].e_rich == ew
        if len(club) >= 2:
            phi = 2.0 * ew / (len(club) * (len(club) - 1))
            assert abs(got[k].phi - math.floor(phi * 1e6 + 0.5) / 1e6) < 2e-6
        else:
            assert got[k].phi is None


def test_graph_path_stats_consistent_with_eccentricity(spark):
    row = OPS["graph_path_stats"].fn(spark, SF_SMALL).collect()[0]
    ecc = OPS["graph_eccentricity"].fn(spark, SF_SMALL).collect()
    assert row.diameter_lb == max(r.eccentricity for r in ecc)
    assert 1.0 <= row.avg_path_len <= row.diameter_lb


def test_text_char_ngram_profile_matches_python(spark):
    docs = t(spark, SF_SMALL, "documents").select("lang", "text").collect()
    cnt = {}
    for r in docs:
        lt = r.text.lower()
        for i in range(len(lt) - 1):
            cnt.setdefault(r.lang, Counter())[lt[i : i + 2]] += 1
    got = {}
    for r in OPS["text_char_ngram_profile"].fn(spark, SF_SMALL).collect():
        got.setdefault(r.lang, []).append((r.rnk, r.bigram, r.cnt))
    for lang, c in cnt.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        exp = [(i + 1, g, n) for i, (g, n) in enumerate(top)]
        assert sorted(got[lang]) == exp, lang


def test_udtf_table_arg_matches_python(spark):
    rows = t(spark, SF_SMALL, "customer").select(
        "c_nationkey", "c_acctbal", "c_custkey"
    ).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.c_nationkey, []).append((r.c_acctbal, r.c_custkey))
    got = {r.c_nationkey: r for r in OPS["udtf_table_arg"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(by_nation)
    for nk, vals in by_nation.items():
        vals.sort()
        mx = max(
            (b2 - b1 for (b1, _), (b2, _) in zip(vals, vals[1:])), default=0.0
        )
        assert got[nk].n_cust == len(vals)
        assert got[nk].max_gap == math.floor(mx * 100 + 0.5) / 100


def test_sim_embedding_quantize_error_bounded(spark):
    rows = OPS["sim_embedding_quantize_int8"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # half-up rounding error is at most scale/2 per component
        assert r.max_abs_err <= r.scale / 2 + 1e-9
        assert 0.0 <= r.mse <= (r.scale / 2) ** 2 + 1e-12


def test_graph_degree_distribution_matches_python(spark):
    tables(spark, SF_SMALL)
    edges = [
        (r.src, r.dst)
        for r in catalog.hierarchy_edges(spark, SF_SMALL).select("src", "dst").collect()
    ]
    deg = Counter()
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
    hist = Counter(deg.values())
    n = float(sum(hist.values()))
    got = {r.degree: r for r in OPS["graph_degree_distribution"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(hist)
    for d_, cnt in hist.items():
        assert got[d_].n_nodes == cnt
        ge = sum(c for dd, c in hist.items() if dd >= d_)
        assert abs(got[d_].ccdf - math.floor(ge / n * 1e6 + 0.5) / 1e6) < 2e-6
    # CCDF at the min degree covers everyone
    assert got[min(hist)].ccdf == 1.0


def test_graph_component_sizes_totals(spark):
    rows = OPS["graph_component_sizes"].fn(spark, SF_SMALL).collect()
    total_nodes = sum(r.component_size * r.n_components for r in rows)
    comp = OPS["graph_connected_components"].fn(spark, SF_SMALL)
    assert total_nodes == comp.count()
    n_regions = t(spark, SF_SMALL, "region").count()
    assert sum(r.n_components for r in rows) == n_regions


def test_agg_stats_rollup_merge_matches_python(spark):
    rows = (
        t(spark, SF_SMALL, "customer")
        .join(t(spark, SF_SMALL, "nation"), F.expr("c_nationkey = n_nationkey"))
        .join(t(spark, SF_SMALL, "region"), F.expr("n_regionkey = r_regionkey"))
        .select("r_name", "c_acctbal")
        .collect()
    )
    by_region = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(
            int(math.floor(r.c_acctbal * 100.0 + 0.5))
        )
    got = {r.r_name: r for r in OPS["agg_stats_rollup_merge"].fn(spark, SF_SMALL).collect()}
    for name, cents in by_region.items():
        n = len(cents)
        mean = sum(cents) / n / 100.0
        var = (sum(c * c for c in cents) - sum(cents) ** 2 / n) / n / 10000.0
        assert got[name].n == n
        assert abs(got[name].mean_bal - math.floor(mean * 1e6 + 0.5) / 1e6) < 2e-6
        assert abs(got[name].var_bal - math.floor(var * 1e6 + 0.5) / 1e6) < 2e-6


def test_graph_pagerank_weighted_matches_python_power_iteration(spark):
    tables(spark, SF_SMALL)
    rows = catalog.hierarchy_edges(spark, SF_SMALL).select("src", "dst", "weight").collect()
    edges = [(r.src, r.dst, math.floor(r.weight * 1e6 + 0.5) / 1e6) for r in rows]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    pos = [(s, d, w) for s, d, w in edges if w > 0]
    wsum = Counter()
    for s, _, w in pos:
        wsum[s] += w
    shares = [(s, d, w / wsum[s]) for s, d, w in pos]
    dangling = {v for v in nodes if v not in wsum}
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(10):
        inflow = Counter()
        for s, d, sh in shares:
            inflow[d] += rank[s] * sh
        dm = sum(rank[v] for v in dangling)
        rank = {
            v: 0.15 / n + 0.85 * (inflow.get(v, 0.0) + dm / n) for v in nodes
        }
    got = {r.node: r.rank for r in OPS["graph_pagerank_weighted"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - math.floor(rank[v] * 1e6 + 0.5) / 1e6) < 2e-6, v
    # weighting changes the answer: weighted ranks differ from uniform
    uni = {r.node: r.rank for r in OPS["graph_pagerank"].fn(spark, SF_SMALL).collect()}
    assert any(abs(got[v] - uni[v]) > 1e-4 for v in nodes)


def test_fn_regex_extract_all_matches_python(spark):
    import re as _re

    docs = t(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    ).collect()
    got = {r.doc_id: r for r in OPS["fn_regex_extract_all"].fn(spark, SF_SMALL).collect()}
    for r in docs:
        m = _re.findall(r"[a-z]+a", r.text)
        assert got[r.doc_id].a_words == "|".join(m)
        assert got[r.doc_id].n_matches == len(m)


def test_pipeline_token_budget_shares_sum_to_one(spark):
    rows = OPS["pipeline_token_budget"].fn(spark, SF_SMALL).collect()
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-3
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert abs(r.budget_at_1b - math.floor(r.n_tokens / total * 1e9)) <= 1


def test_agg_bitmap_distinct_equals_exact(spark):
    got = {r.event_type: r.n_users for r in OPS["agg_bitmap_distinct"].fn(spark, SF_SMALL).collect()}
    exp = {
        r.event_type: r.n
        for r in t(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exp


def test_agg_skew_salted_equals_direct(spark):
    got = {r.l_returnflag: r for r in OPS["agg_skew_salted"].fn(spark, SF_SMALL).collect()}
    li = t(spark, SF_SMALL, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast("bigint")
    exp = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("rc"))
        .collect()
    }
    assert {k: (v.n, v.rev_cents) for k, v in got.items()} == {
        k: (v.n, v.rc) for k, v in exp.items()
    }


def test_ts_gap_distribution_matches_python(spark):
    ev = t(spark, SF_SMALL, "events").select("user_id", "event_id", "ts", "event_type").collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    buckets = Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rows, rows[1:]):
            gap_us = int((b.ts - a.ts).total_seconds() * 1e6 + 0.5)
            gap_s = gap_us // 1000000
            buckets[(b.event_type, int(math.floor(math.log(gap_s + 1.0) / math.log(2.0))))] += 1
    got = {
        (r.event_type, r.log2_bucket): r.n_gaps
        for r in OPS["ts_gap_distribution"].fn(spark, SF_SMALL).collect()
    }
    assert got == dict(buckets)


def test_text_hashing_features_matches_python(spark):
    import hashlib

    docs = t(spark, SF_SMALL, "documents").filter(F.col("doc_id") < 200).select(
        "doc_id", "text"
    ).collect()
    got = {r.doc_id: r for r in OPS["text_hashing_features"].fn(spark, SF_SMALL).collect()}
    for r in docs:
        toks = [w for w in r.text.lower().split(" ") if w]
        cnt = Counter(
            int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 32 for w in toks
        )
        exp = "|".join(f"{b:02d}:{c}" for b, c in sorted(cnt.items()))
        assert got[r.doc_id].features == exp
        assert got[r.doc_id].n_tokens == len(toks)
