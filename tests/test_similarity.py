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


def test_lsh_ann_no_false_positives_and_recall(spark):
    lsh = {(r.vec_a, r.vec_b) for r in OPS["sim_lsh_ann"].fn(spark, SF_SMALL).collect()}
    brute = _brute_pairs(spark)
    assert lsh <= brute  # exact verify ⇒ no false positives
    if brute:
        recall = len(lsh) / len(brute)
        # single 12-bit signature: cos≥0.95 pairs collide with
        # p=(1-θ/π)^12, θ=acos(0.95)≈18° → p≈0.27; assert a sane floor and
        # document that the scale path would union multiple signatures
        assert recall >= 0.15, f"recall={recall:.2f} over {len(brute)} pairs"


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
