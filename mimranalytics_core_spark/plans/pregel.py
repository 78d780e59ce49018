"""DataFrame-Pregel: iterate-until-fixpoint harness (SURVEY.md §4.3).

The reference runs NetworkX algorithms in a single Python heap
(reference README.md:28 — "NetworkX for pathfinding and centrality"); that is
its scalability ceiling. This harness is the distributed replacement: each
superstep is a join/aggregate over the full cluster, so the graph never has
to fit on one machine — the GraphX/GraphFrames execution pattern realized on
DataFrames (GraphX exposes no Python API).

Catalyst does not optimize across iterations, so the harness handles the two
things that kill naive loops at scale:

- **Lineage truncation**: each iteration's plan references the previous one;
  after k iterations the plan tree is O(2^k). ``localCheckpoint(eager)``
  every ``checkpoint_every`` steps materializes the frontier and cuts the
  plan back to a leaf.
- **Convergence via bounded work**: the loop re-derives a delta/frontier each
  step and stops when it is empty (``isEmpty`` touches at most one partition
  early-out) or at ``max_iter``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


CHANGED_COL = "__changed"


_STEP_CKPT_EAGER = False


def iterate_fixpoint(
    state: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    changed: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    max_iter: int = 20,
    check_every: int = 2,
    state_partitions: int | None = None,
) -> DataFrame:
    """Iterate ``state = step(state)`` until no row changed.

    Two convergence protocols:

    - **Folded flag (preferred)**: ``step`` emits a boolean ``__changed``
      column alongside the new state. Convergence = no flagged row in the
      already-materialized checkpoint — a filter scan, no extra join and no
      extra shuffle. The flag is stripped from the returned state.
    - **``changed`` callback (legacy)**: returns a DataFrame whose emptiness
      signals convergence — costs one old-vs-new join per check.

    ``check_every`` batches convergence checks: a monotone step applied to an
    already-converged state is a no-op, so checking every k-th superstep
    trades ≤(k-1) wasted cheap supersteps for k× fewer driver round-trips —
    per-job overhead dominates these small-frontier loops.

    ``state_partitions``: coalesce the state to this many partitions before
    each checkpoint. For loops whose state is far smaller than the input
    (label maps, rank vectors) this collapses per-superstep task overhead —
    measured 2.2× on connected components at sf0.1. Leave None when state is
    data-sized (the cluster case): there the shuffle width must follow data.
    """
    state = state.localCheckpoint(eager=True)
    # Empty initial state: every step of a monotone superstep function maps
    # empty → empty, so the loop is max_iter checkpoint jobs for nothing —
    # one cheap isEmpty on the just-materialized state skips them all (the
    # no-duplicates corpus / empty-graph case).
    if state.isEmpty():
        return state
    for i in range(max_iter):
        new_state = step(state.drop(CHANGED_COL) if CHANGED_COL in state.columns else state)
        flagged = CHANGED_COL in new_state.columns
        if state_partitions is not None:
            new_state = new_state.coalesce(state_partitions)
        # Checkpoint every step: each step embeds a join against the previous
        # state and is evaluated at latest by the next convergence check —
        # materializing is strictly cheaper than recomputing a growing plan.
        # LAZY since round-16: the checkpoint persists on first use (the
        # convergence scan or the next superstep) with identical reuse,
        # without one driver-blocking job per superstep.
        new_state = new_state.localCheckpoint(eager=_STEP_CKPT_EAGER)
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            if flagged:
                if new_state.filter(F.col(CHANGED_COL)).isEmpty():
                    return new_state.drop(CHANGED_COL)
            elif changed is not None and changed(state, new_state).isEmpty():
                return new_state
        state = new_state
    return state.drop(CHANGED_COL) if CHANGED_COL in state.columns else state
