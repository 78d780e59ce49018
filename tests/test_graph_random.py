"""Randomized equivalence tests: the distributed graph algorithms against
straightforward single-machine references (union-find, power iteration,
walk-product enumeration) on a seeded random graph — broader coverage than
the hand-built fixture."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mimranalytics_core_spark.functions.graph_algos import (
    bfs_distances,
    connected_components,
    pagerank,
    ubo_closure,
    undirect,
)

random.seed(42)
N_NODES = 60
EDGE_LIST = []
for _ in range(90):
    a, b = random.sample(range(N_NODES), 2)
    EDGE_LIST.append((f"v{a}", f"v{b}", round(random.uniform(0.1, 1.0), 3)))
EDGE_LIST = sorted(set(EDGE_LIST))


@pytest.fixture(scope="module")
def redges(spark):
    return spark.createDataFrame(EDGE_LIST, "src STRING, dst STRING, weight DOUBLE")


def test_components_match_union_find(spark, redges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for s, d, _ in EDGE_LIST:
        union(s, d)
    expected = {}
    for s, d, _ in EDGE_LIST:
        expected[s] = find(s)
        expected[d] = find(d)
    # canonicalize: min node id per component
    roots = {}
    for node, r in expected.items():
        roots.setdefault(find(r), []).append(node)
    exp_label = {}
    for members in roots.values():
        m = min(members)
        for node in members:
            exp_label[node] = m

    got = {
        r.node: r.component
        for r in connected_components(redges, max_iter=30, state_partitions=4).collect()
    }
    assert got == exp_label


def test_pagerank_matches_power_iteration(spark, redges):
    nodes = sorted({x for e in EDGE_LIST for x in e[:2]})
    out = {v: [] for v in nodes}
    for s, d, _ in EDGE_LIST:
        out[s].append(d)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    d = 0.85
    for _ in range(10):
        nxt = {v: 0.0 for v in nodes}
        dangling = 0.0
        for v in nodes:
            if out[v]:
                share = rank[v] / len(out[v])
                for w in out[v]:
                    nxt[w] += share
            else:
                dangling += rank[v]
        rank = {v: (1 - d) / n + d * (nxt[v] + dangling / n) for v in nodes}

    got = {r.node: r.rank for r in pagerank(redges, iters=10, state_partitions=4).collect()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[v]) < 1e-9, (v, got[v], rank[v])


def test_bfs_matches_reference(spark, redges):
    from collections import deque

    adj = {}
    for s, d, _ in EDGE_LIST:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    src = "v0"
    dist = {src: 0}
    q = deque([src])
    while q:
        v = q.popleft()
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)

    seeds = spark.createDataFrame([(src,)], "node STRING")
    got = {r.node: r.dist for r in bfs_distances(undirect(redges), seeds, max_depth=30).collect()}
    assert got == dist


def test_ubo_matches_walk_enumeration(spark, redges):
    adj = {}
    for s, d, w in EDGE_LIST:
        adj.setdefault(s, []).append((d, w))
    max_depth = 3
    expected = {}

    def walk(origin, node, frac, depth):
        if depth > 0:
            expected[(origin, node)] = expected.get((origin, node), 0.0) + frac
        if depth == max_depth:
            return
        for nxt, w in adj.get(node, ()):
            walk(origin, nxt, frac * w, depth + 1)

    for v in {x for e in EDGE_LIST for x in e[:2]}:
        walk(v, v, 1.0, 0)
    expected = {k: v for k, v in expected.items() if k[0] != k[1] or v}

    got = {
        (r.owner, r.entity): r.effective_ownership
        for r in ubo_closure(redges, max_depth=max_depth).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-9, (k, got[k], expected[k])


def test_fixed_round_components_equal_converged_on_bounded_diameter(spark, redges):
    """check_convergence=False with max_iter >= diameter must equal the
    converged run exactly (k rounds = min over k-hop reachability)."""
    conv = {
        (r.node, r.component)
        for r in connected_components(redges.select("src", "dst")).collect()
    }
    fixed = {
        (r.node, r.component)
        for r in connected_components(
            redges.select("src", "dst"), max_iter=20, check_convergence=False
        ).collect()
    }
    assert conv == fixed


def test_match_path_unweighted_matches_bfs_walks(spark, redges):
    """match_path-style bounded iterative expansion must agree with
    bfs_distances on reachable-node sets per hop bound (walks vs min-hop:
    a node is within k hops iff some walk of length <= k reaches it)."""
    seeds = spark.createDataFrame([("v0",), ("v1",)], "node STRING")
    bfs = {
        r.node
        for r in bfs_distances(redges.select("src", "dst"), seeds, max_depth=3).collect()
        if r.dist > 0
    }
    # iterative expansion identical in shape to api.match_path's loop
    frontier = redges.join(
        seeds, redges.src == seeds.node
    ).select(F.col("dst").alias("cur"))
    reached = frontier
    for _ in range(2):
        frontier = (
            frontier.join(redges, frontier.cur == redges.src)
            .select(F.col("dst").alias("cur"))
        )
        reached = reached.unionByName(frontier)
    walks = {r.cur for r in reached.distinct().collect()}
    # a cycle can walk BACK to a seed (hop>0) while BFS pins seeds at dist 0
    # — compare non-seed reachability, where the two definitions coincide
    seed_ids = {"v0", "v1"}
    assert walks - seed_ids == bfs - seed_ids


def test_kcore_matches_reference_peel(spark, redges):
    """Distributed k-core vs a straightforward in-memory peel on the seeded
    random graph, for several k."""
    from mimranalytics_core_spark.functions.graph_algos import kcore

    # symmetrized unique neighbor pairs
    sym = set()
    for s, d, _ in EDGE_LIST:
        sym.add((s, d))
        sym.add((d, s))

    def ref_core(k):
        alive = {a for a, _ in sym}
        while True:
            deg = {}
            for a, b in sym:
                if a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
            nxt = {n for n in alive if deg.get(n, 0) >= k}
            if nxt == alive:
                return {n: deg.get(n, 0) for n in alive}
            alive = nxt

    for k in (2, 3, 4):
        got = {r.node: r.core_deg for r in kcore(redges, k=k, max_iter=30).collect()}
        assert got == ref_core(k), f"k={k}"


def test_trail_closure_invariants_on_random_graph(spark, redges):
    """On the seeded random digraph: every trail is a walk (multiset
    containment per (src, dst, hops)), reachable-pair sets coincide, and
    per-pair min hops agree — the invariants behind using walk closure for
    segment joins and BFS for shortestPath()."""
    from collections import Counter

    from mimranalytics_core_spark.functions.graph_algos import path_rows

    walks = [(r.src, r.dst, r.hops) for r in path_rows(redges, 1, 4).collect()]
    trails = [
        (r.src, r.dst, r.hops)
        for r in path_rows(redges, 1, 4, unique_edges=True).collect()
    ]
    cw, ct = Counter(walks), Counter(trails)
    assert all(ct[k] <= cw[k] for k in ct)  # trails ⊆ walks with multiplicity
    assert {(s, d) for s, d, _ in walks} == {(s, d) for s, d, _ in trails}
    minw: dict = {}
    mint: dict = {}
    for s, d, h in walks:
        minw[(s, d)] = min(minw.get((s, d), 99), h)
    for s, d, h in trails:
        mint[(s, d)] = min(mint.get((s, d), 99), h)
    assert minw == mint  # a min-hop walk never repeats an edge


def test_star_contraction_components_match_union_find(spark):
    """The star-contraction + CC pipeline inside dedup_canonical_docs,
    exercised on seeded random pair graphs (including chain/clique mixes)
    against union-find. Guards the contraction's correctness argument
    (min-label preservation) beyond the fixture's clique-heavy shape."""
    from mimranalytics_core_spark.functions.graph_algos import connected_components

    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = set()
        # mix: random edges + an explicit chain + an explicit clique
        for _ in range(25):
            a, b = rng.sample(range(n), 2)
            edges.add((min(a, b), max(a, b)))
        chain = list(range(30, 38))
        edges |= {(a, a + 1) for a in chain[:-1]}
        clique = [2, 5, 9, 13]
        edges |= {(min(a, b), max(a, b)) for a in clique for b in clique if a < b}

        # union-find reference
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        want = {v: min(u for u in touched if find(u) == find(v)) for v in touched}

        pairs = spark.createDataFrame(
            [(a, b) for a, b in sorted(edges)], "doc_a LONG, doc_b LONG"
        )
        # replicate the dedup_canonical_docs contraction inline
        e2 = pairs.select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        ).unionByName(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        ).localCheckpoint(eager=True)
        l0 = e2.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("lab")
        ).localCheckpoint(eager=True)
        la = l0.select(F.col("a").alias("a"), F.col("lab").alias("la"))
        lb = l0.select(F.col("a").alias("b"), F.col("lab").alias("lb"))
        contracted = (
            e2.join(la, "a").join(lb, "b")
            .filter(F.col("la") != F.col("lb"))
            .select(F.col("la").alias("src"), F.col("lb").alias("dst"))
            .distinct()
        )
        comp = connected_components(contracted, max_iter=12, state_partitions=4)
        final = (
            l0.join(comp, l0.lab == comp.node, "left")
            .select(
                F.col("a").alias("node"),
                F.coalesce(F.col("component"), F.col("lab")).alias("canonical"),
            )
        )
        got = {r.node: r.canonical for r in final.collect()}
        assert got == want, f"trial {trial}"


def test_eigenvector_matches_power_iteration(spark, redges):
    from mimranalytics_core_spark.functions.graph_algos import eigenvector

    # reference: same fixed-iteration power method on the symmetrized graph
    import math

    adj = {}
    for s, d, _ in EDGE_LIST:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    nodes = sorted(adj)
    x = {v: 1.0 for v in nodes}
    for _ in range(12):
        raw = {v: sum(x[u] for u in adj[v]) for v in nodes}
        nrm = math.sqrt(sum(r * r for r in raw.values()))
        x = {v: (raw[v] / nrm if nrm > 0 else 0.0) for v in nodes}

    got = {
        r.node: r.eig
        for r in eigenvector(redges, iters=12, state_partitions=4).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - x[v]) < 1e-9, (v, got[v], x[v])
    # the dominant eigenvector is non-negative and non-trivial
    assert all(val >= 0 for val in got.values()) and max(got.values()) > 0


def test_boruvka_msf_matches_kruskal(spark):
    from mimranalytics_core_spark.functions.graph_algos import boruvka_msf

    # Disconnected graph (two islands + an isolated pair), parallel edges,
    # and deliberate weight TIES — the (w, a, b) total order must make the
    # forest unique and identical to sequential Kruskal under that order.
    rng = random.Random(777)
    raw = []
    for lo, hi in [(0, 25), (30, 50), (60, 62)]:
        ids = list(range(lo, hi))
        for _ in range(3 * len(ids)):
            a, b = rng.sample(ids, 2)
            raw.append((min(a, b), max(a, b), float(rng.randint(1, 9))))
    # parallel duplicates with a different weight (min-reduce coverage)
    raw += [(a, b, w + 5.0) for a, b, w in raw[::7]]
    df = spark.createDataFrame(raw, "a INT, b INT, w DOUBLE")

    red = {}
    for a, b, w in raw:
        red[(a, b)] = min(red.get((a, b), float("inf")), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    expected = []
    for w, a, b in sorted((w, a, b) for (a, b), w in red.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            expected.append((a, b, w))

    got = sorted(tuple(r) for r in boruvka_msf(df).collect())
    assert got == sorted(expected)
    # forest invariant: |V| - #components edges
    n_nodes = len({x for (a, b) in red for x in (a, b)})
    comps = len({find(x) for (a, b) in red for x in (a, b)})
    assert len(got) == n_nodes - comps


def test_greedy_mis_matches_sequential_and_invariants(spark):
    from mimranalytics_core_spark.functions.graph_algos import greedy_mis

    rng = random.Random(123)
    raw = set()
    for _ in range(150):
        a, b = rng.sample(range(80), 2)
        raw.add((f"v{a:02d}", f"v{b:02d}"))
    df = spark.createDataFrame(sorted(raw), "src STRING, dst STRING")

    adj: dict[str, set] = {}
    for s, d in raw:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    # lexicographically-first MIS: sequential greedy by ascending id
    exp = []
    dominated: set = set()
    for v in sorted(adj):
        if v not in dominated:
            exp.append(v)
            dominated |= adj[v] | {v}

    got = sorted(r.node for r in greedy_mis(df, rounds=12).collect())
    assert got == exp
    got_set = set(got)
    # independence: no edge inside the set
    assert not any(s in got_set and d in got_set for s, d in raw)
    # maximality: every non-member has a member neighbor
    for v in adj:
        if v not in got_set:
            assert adj[v] & got_set, v


def test_greedy_matching_matches_sequential_and_invariants(spark):
    from mimranalytics_core_spark.functions.graph_algos import greedy_matching

    rng = random.Random(321)
    raw = set()
    for _ in range(140):
        a, b = rng.sample(range(70), 2)
        raw.add((f"v{min(a,b):02d}", f"v{max(a,b):02d}"))
    df = spark.createDataFrame(sorted(raw), "src STRING, dst STRING")

    # lexicographically-first maximal matching: sequential greedy
    exp = []
    used: set = set()
    for a, b in sorted(raw):
        if a not in used and b not in used:
            exp.append((a, b))
            used |= {a, b}

    got = sorted((r.a, r.b) for r in greedy_matching(df, rounds=12).collect())
    assert got == sorted(exp)
    # matching invariant: endpoints pairwise distinct
    ends = [x for e in got for x in e]
    assert len(ends) == len(set(ends))
    # maximality: every unmatched edge touches a matched endpoint
    mset = set(ends)
    for a, b in raw:
        if (a, b) not in set(got):
            assert a in mset or b in mset


def test_greedy_coloring_matches_sequential(spark):
    from mimranalytics_core_spark.functions.graph_algos import greedy_coloring

    rng = random.Random(555)
    raw = set()
    for _ in range(160):
        a, b = rng.sample(range(60), 2)
        raw.add((f"v{min(a,b):02d}", f"v{max(a,b):02d}"))
    df = spark.createDataFrame(sorted(raw), "src STRING, dst STRING")

    adj: dict[str, set] = {}
    for s, d in raw:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    # sequential greedy coloring by ascending id (mex of colored neighbors)
    exp: dict[str, int] = {}
    for v in sorted(adj):
        used = {exp[u] for u in adj[v] if u in exp}
        c = 0
        while c in used:
            c += 1
        exp[v] = c

    got = {r.node: r.color for r in greedy_coloring(df, rounds=40).collect()}
    assert got == exp
    # proper coloring invariant
    for s, d in raw:
        assert got[s] != got[d]
