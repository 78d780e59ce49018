"""Skew mitigation: salted join (SURVEY.md §4.3 — 100 TB posture).

AQE's skew-join handles most runtime skew; this explicit salting helper is
for the case AQE can't fix: a *broadcast-ineligible* join whose key
distribution is known-pathological (one conglomerate owner with millions of
edges, one stopword-like token). The hot side's key is split into
``n_salts`` sub-keys; the other side is replicated ``n_salts``× — shuffle
load per reducer drops by the salt factor at the cost of replicating the
smaller side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` (hot keys, salted) with ``other`` (replicated).

    Semantically identical to ``skewed.join(other, skewed[key] ==
    other[other_key], how)``; physically the shuffle key is (key, salt) so a
    hot key spreads over ``n_salts`` reducers.

    Only ``how`` variants that never null-extend the replicated side are
    allowed: for ``right``/``full`` (or right-semi/anti) every unmatched
    *replicated* right row would be emitted once per salt — ``n_salts``
    duplicate null-extended rows. Use AQE skew-join for those shapes.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched replicated-side "
            f"rows (one per salt); allowed: {sorted(allowed)}"
        )
    left = skewed.withColumn(
        "__lsalt", F.abs(F.hash(F.monotonically_increasing_id())) % n_salts
    )
    right = other.withColumn("__rsalt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    joined = left.join(
        right,
        (left[key] == right[other_key]) & (left["__lsalt"] == right["__rsalt"]),
        how,
    )
    return joined.drop("__lsalt", "__rsalt")
