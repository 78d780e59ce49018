"""Similarity-search tests: LSH-ANN recall vs brute force, centroid math."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.operators.similarity import _as_double, cosine
from mimranalytics_core_spark.registry import all_ops
from tests.conftest import SF_SMALL

OPS = all_ops()


def _brute_pairs(spark, threshold=0.95):
    e = t(spark, SF_SMALL, "embeddings").select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    a = e.select(F.col("vec_id").alias("va"), F.col("emb").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("emb").alias("eb"))
    sim = cosine(F.col("ea"), F.col("eb"))
    return {
        (r.va, r.vb)
        for r in a.crossJoin(b).filter(F.col("va") < F.col("vb")).filter(sim >= threshold).collect()
    }


def _planted_corpus(spark, n_base=200, n_dup=60, dim=64, noise=0.06, seed=7):
    """Random base vectors + perturbed near-copies: ground-truth high-cos
    pairs exist by construction (the synthetic embeddings table is
    near-uniform — max pairwise cosine ≈ 0.48 — so recall tests on it are
    vacuous; see FIXTURES.md)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    dup = base[:n_dup] + noise * rng.standard_normal((n_dup, dim))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)] + [
        (n_base + i, [float(x) for x in v]) for i, v in enumerate(dup)
    ]
    e = spark.createDataFrame(rows, "vec_id LONG, emb ARRAY<DOUBLE>")
    vecs = {i: v for i, v in rows}
    truth = set()
    ids = sorted(vecs)
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if cos(vecs[a], vecs[b]) >= 0.95:
                truth.add((a, b))
    return e, truth


def test_lsh_ann_no_false_positives_and_recall(spark):
    """On a corpus with planted near-duplicates, banded LSH must recover most
    true pairs (6×10 OR-amplification: expected recall ≈ 1-(1-p^10)^6 ≈ 0.92
    at cos 0.95) with zero false positives (exact verify)."""
    from mimranalytics_core_spark.operators.similarity import lsh_ann_pairs

    e, truth = _planted_corpus(spark)
    assert len(truth) >= 50  # the plant worked
    got = {(r.vec_a, r.vec_b) for r in lsh_ann_pairs(spark, e).collect()}
    assert got <= truth
    recall = len(got) / len(truth)
    assert recall >= 0.7, f"recall={recall:.2f} over {len(truth)} pairs"


def test_lsh_ann_more_bands_monotone_recall(spark):
    """Recall must be non-decreasing in the number of bands (OR-amplification
    only ever adds candidates)."""
    from mimranalytics_core_spark.operators.similarity import lsh_ann_pairs

    e, truth = _planted_corpus(spark)
    recalls = []
    for bands in (1, 3, 6):
        got = {(r.vec_a, r.vec_b) for r in lsh_ann_pairs(spark, e, bands=bands).collect()}
        assert got <= truth
        recalls.append(len(got) / len(truth))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] > recalls[0]  # amplification genuinely helps


def test_lsh_ann_registered_op_runs_on_table(spark):
    """The registered op itself must still run over the embeddings table
    (0 rows expected on this near-uniform corpus — but schema and plan
    execute end-to-end)."""
    df = OPS["sim_lsh_ann"].fn(spark, SF_SMALL)
    assert df.columns == ["vec_a", "vec_b", "cos_sim"]
    assert df.count() == len(_brute_pairs(spark))


def test_lsh_ann_bucket_cap_bounds_bucket_size(spark):
    """No (band, sig) bucket may exceed the cap — the bound that keeps the
    intra-bucket self-join from going quadratic at corpus scale."""
    from mimranalytics_core_spark.operators.similarity import (
        _as_double,
        _hyperplane_buckets,
    )

    e = t(spark, SF_SMALL, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("emb")
    )
    cap = 4
    # round-15: buckets are grouped member ARRAYS now (pairs expand
    # row-locally from them) — the cap bound is the max array size
    capped = _hyperplane_buckets(e, bands=6, bits=4, bucket_cap=cap)  # 16 buckets/band → overflow
    maxsz = capped.agg(F.max(F.size("ids")).alias("m")).first().m
    assert maxsz <= cap, maxsz
    # sanity: uncapped form genuinely overflows the cap on this corpus
    full = _hyperplane_buckets(e, bands=6, bits=4, bucket_cap=10**9)
    fullmax = full.agg(F.max(F.size("ids")).alias("m")).first().m
    assert fullmax > cap, fullmax


def test_dedup_lsh_config_recovers_planted_pairs(spark):
    """The dedup path's 16-band × 12-bit config must recover the planted
    near-dup pairs at its 0.95 threshold (per-pair miss < 1e-5 at the
    planted cos ≈ 0.99) with ZERO false positives (exact verify) — the
    recall contract behind dedup_embedding_cosine, certified here because
    the fixture corpus has no ≥0.95 pairs to exercise it."""
    from mimranalytics_core_spark.operators.similarity import lsh_ann_pairs

    e, truth = _planted_corpus(spark)
    assert len(truth) >= 50  # the plant worked
    got = {
        (r.vec_a, r.vec_b)
        for r in lsh_ann_pairs(
            spark, e, bands=16, bits=12, bucket_cap=256, threshold=0.95
        ).collect()
    }
    assert got <= truth, f"false positives: {got - truth}"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"recall {recall:.3f}; missed={truth - got}"


def test_dedup_registered_op_clusters_planted_dups(spark):
    """End-to-end: LSH candidates + min-label clustering must put every
    planted near-copy in its base vector's cluster."""
    from mimranalytics_core_spark.operators.similarity import _cluster_pairs, lsh_ann_pairs

    e, _ = _planted_corpus(spark, n_base=100, n_dup=30)
    pairs = lsh_ann_pairs(
        spark, e, bands=16, bits=12, bucket_cap=256, threshold=0.95
    ).select(F.col("vec_a").alias("ia"), F.col("vec_b").alias("ib"))
    out = _cluster_pairs(pairs, e.select(F.col("vec_id").alias("node"))).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == 130
    for i in range(30):  # dup 100+i was planted from base i
        assert by_id[100 + i].canonical_id == by_id[i].canonical_id, i
        assert by_id[100 + i].is_dup
    # a base vector with no near-dup stays its own canonical
    assert not by_id[99].is_dup


def test_dedup_fixture_has_no_095_pairs_so_op_labels_all_singleton(spark):
    """The synthetic embeddings fixture is near-uniform (max pairwise cos
    ≈ 0.48 — FIXTURES.md), so at the op's 0.95 threshold the correct answer
    is all-singleton labels. This is what the driver oracle checks at gate
    scale; pair recall is certified on planted corpora above."""
    from mimranalytics_core_spark.registry import all_ops

    out = all_ops()["dedup_embedding_cosine"].fn(spark, SF_SMALL).collect()
    assert out
    assert all(r.canonical_id == r.vec_id and not r.is_dup for r in out)


def test_cosine_topk_matches_python(spark):
    rows = t(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    q = vecs[0]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    expected = sorted(
        ((round(cos(v, q), 6), -k) for k, v in vecs.items() if k != 0), reverse=True
    )[:10]
    expected_ids = [-i for _, i in expected]
    got = [r.vec_id for r in OPS["sim_cosine_topk"].fn(spark, SF_SMALL).collect()]
    assert got == expected_ids


def test_centroid_is_mean(spark):
    import numpy as np

    rows = t(spark, SF_SMALL, "embeddings").select("label", "embedding").collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    got = {
        (r.label, r.dim): r.centroid_val
        for r in OPS["sim_centroid_by_label"].fn(spark, SF_SMALL).collect()
    }
    for label, vs in by_label.items():
        mean = np.mean(vs, axis=0)
        for dim in range(1, 9):
            assert abs(got[(label, dim)] - round(float(mean[dim - 1]), 6)) < 1e-9


def test_ivf_topk_recall_vs_brute(spark):
    """IVF (probed subset) must recover most of the exact top-10 for the
    same query; with 4/16 cells probed on clustered data (10 labels),
    recall is high -- assert a conservative floor."""
    ivf = [r.vec_id for r in OPS["sim_ivf_topk"].fn(spark, SF_SMALL).collect()]
    brute = [r.vec_id for r in OPS["sim_cosine_topk"].fn(spark, SF_SMALL).collect()]
    overlap = len(set(ivf) & set(brute))
    assert overlap >= 5, f"IVF recall too low: {overlap}/10 ({ivf} vs {brute})"


def test_ivf_recall_curve_monotone_and_exact_at_full_probe(spark):
    """Recall@10 must be non-decreasing in nprobe, and probing every cell
    must equal brute force exactly (the IVF partition covers the corpus)."""
    from mimranalytics_core_spark.operators.similarity import sim_ivf_topk

    brute = [r.vec_id for r in OPS["sim_cosine_topk"].fn(spark, SF_SMALL).collect()]
    recalls = []
    for nprobe in (1, 4, 16):
        ivf = [r.vec_id for r in sim_ivf_topk(spark, SF_SMALL, nprobe=nprobe).collect()]
        recalls.append(len(set(ivf) & set(brute)) / len(brute))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls


def test_pq_topk_ranks_planted_neighbors_first(spark):
    """On a corpus with 5 planted near-copies of the query (cos ≈ 0.99),
    PQ/ADC top-10 must surface all 5 — quantization error is small relative
    to the planted separation."""
    import numpy as np

    from mimranalytics_core_spark.operators.similarity import pq_topk

    rng = np.random.default_rng(11)
    base = rng.standard_normal((300, 64))
    q = base[0]
    planted = q + 0.05 * rng.standard_normal((5, 64))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)] + [
        (300 + i, [float(x) for x in v]) for i, v in enumerate(planted)
    ]
    e = spark.createDataFrame(rows, "vec_id LONG, emb ARRAY<DOUBLE>")
    top = [r.vec_id for r in pq_topk(spark, e, query_vec_id=0).collect()]
    assert set(range(300, 305)) <= set(top), top


def test_pq_topk_deterministic_and_runs_on_table(spark):
    """The registered op must run over the embeddings table with a stable
    schema and produce the identical result on a second invocation
    (deterministic seeding + id-ordered sample)."""
    df1 = OPS["sim_pq_topk"].fn(spark, SF_SMALL)
    assert df1.columns == ["vec_id", "pq_cos"]
    r1 = [(r.vec_id, r.pq_cos) for r in df1.collect()]
    r2 = [(r.vec_id, r.pq_cos) for r in OPS["sim_pq_topk"].fn(spark, SF_SMALL).collect()]
    assert len(r1) == 10 and r1 == r2


def test_pq_topk_approximates_brute_force_on_clustered_data(spark):
    """On the (clustered, 10-label) fixture corpus PQ top-10 must overlap
    the exact top-10 — a conservative floor, as for IVF."""
    pq = [r.vec_id for r in OPS["sim_pq_topk"].fn(spark, SF_SMALL).collect()]
    brute = [r.vec_id for r in OPS["sim_cosine_topk"].fn(spark, SF_SMALL).collect()]
    overlap = len(set(pq) & set(brute))
    assert overlap >= 4, f"PQ recall too low: {overlap}/10 ({pq} vs {brute})"


def test_dedup_embedding_planted_recovers_all_clones(spark):
    """The recall-sensitive declared variant: every planted clone
    (vec_id + 1e6, first component +0.1 on a unit vector => cos >= 0.995)
    must cluster with its original, canonical = the original id — if the
    LSH stage missed a pair, its clone would stay singleton and this (and
    the driver's oracle hash) would fail."""
    out = all_ops()["dedup_embedding_planted"].fn(spark, SF_SMALL).collect()
    dups = {r.vec_id: r.canonical_id for r in out if r.is_dup}
    assert dups == {1000000 + i: i for i in range(20)}
    # originals stay canonical; everything else is singleton
    n_all = len(out)
    assert sum(1 for r in out if not r.is_dup) == n_all - 20
