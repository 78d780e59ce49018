"""Round-15 optimization guard: the catalog view-construction memo.

The derived graph views are memoized per (session, sf_dir) as lazy plan
objects (catalog._memo_view). The two hazards the memo must not introduce:

1. sf aliasing — a view built under one sf_dir must never serve another
   (the memo key carries sf_dir, and `spark.table` captures the view
   binding eagerly at construction).
2. stale-view poisoning — a builder invoked while ANOTHER sf's temp views
   are active must bind to ITS OWN sf_dir, not whatever the session last
   registered (the wrapper re-points the views before construction).
"""

from __future__ import annotations

from mimranalytics_core_spark import catalog
from mimranalytics_core_spark.operators._base import tables

from tests.conftest import SF_ORACLE, SF_SMALL


def test_memo_returns_same_plan_object(spark):
    a = catalog.hierarchy_edges(spark, SF_SMALL)
    b = catalog.hierarchy_edges(spark, SF_SMALL)
    assert a is b, "second construction should be a memo hit"


def test_memo_keys_by_sf_dir(spark):
    small = catalog.hierarchy_edges(spark, SF_SMALL)
    big = catalog.hierarchy_edges(spark, SF_ORACLE)
    assert small is not big
    n_small, n_big = small.count(), big.count()
    assert n_small < n_big, (n_small, n_big)


def test_memo_keys_by_validity_flag(spark):
    bare = catalog.placed_edges(spark, SF_SMALL)
    valid = catalog.placed_edges(spark, SF_SMALL, with_validity=True)
    assert "valid_from" not in bare.columns
    assert "valid_from" in valid.columns


def test_cached_view_survives_sf_switch(spark):
    """A cached small-sf view keeps reading small-sf data after the temp
    views are re-pointed at another sf (eager binding capture)."""
    small = catalog.hierarchy_edges(spark, SF_SMALL)
    n_before = small.count()
    tables(spark, SF_ORACLE)  # re-point the session's temp views
    try:
        assert small.count() == n_before
        # and a fresh ORACLE-keyed build under the re-pointed views differs
        assert catalog.hierarchy_edges(spark, SF_ORACLE).count() != n_before
    finally:
        tables(spark, SF_SMALL)


def test_builder_binds_own_sf_even_with_foreign_views_active(spark):
    """Stale-view poisoning guard: construct for sf A while sf B's views
    are active — the wrapper must re-point first."""
    from mimranalytics_core_spark.catalog import _VIEW_CACHE

    tables(spark, SF_ORACLE)  # foreign views active
    # evict any cached entry so construction really happens now
    stale = [k for k in _VIEW_CACHE if k[1] == SF_SMALL and k[2] == "trade_edges"]
    for k in stale:
        del _VIEW_CACHE[k]
    small = catalog.trade_edges(spark, SF_SMALL)
    big = catalog.trade_edges(spark, SF_ORACLE)
    assert small.count() < big.count()
    tables(spark, SF_SMALL)
