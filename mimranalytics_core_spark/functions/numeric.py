"""Cross-engine-deterministic numeric helpers.

``Spark round()`` converts the double to its shortest decimal string and
applies HALF_UP; DuckDB rounds on the binary value. Near a decimal boundary
the two disagree (observed: 17947.60995 → 17947.61 vs 17947.6099). For
per-row rounding of values that are bit-identical in both engines, a
floor-based round — ``floor(x * 10^n + 0.5) / 10^n`` — is pure IEEE double
arithmetic and therefore gives the identical bits in every engine.

Use ``dround`` + ``DROUND_SQL`` as a pair in declared queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column, digits: int) -> Column:
    """Deterministic cross-engine round (floor-based, half-away-from-zero-ish)."""
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)


def dround_sql(expr: str, digits: int) -> str:
    """The DuckDB-side twin of :func:`dround`."""
    scale = float(10**digits)
    return f"FLOOR(({expr}) * {scale} + 0.5) / {scale}"
