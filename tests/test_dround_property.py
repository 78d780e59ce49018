"""Property test: dround (floor-based cross-engine round) is bit-identical
between Spark-semantics (python double mirror) and DuckDB over random doubles
— the guarantee every per-row-rounded oracle relies on (FIXTURES.md).
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def reasonable_doubles(draw):
    return draw(
        st.floats(
            min_value=-1e8,
            max_value=1e8,
            allow_nan=False,
            allow_infinity=False,
        )
    )


@given(x=reasonable_doubles(), digits=st.integers(min_value=0, max_value=6))
@settings(max_examples=300, deadline=None)
def test_dround_matches_duckdb(x, digits):
    scale = float(10**digits)
    # python mirror of the Spark expression FLOOR(x*s + 0.5)/s (pure IEEE ops)
    py = math.floor(x * scale + 0.5) / scale
    # cast: a bare literal parses as DECIMAL in DuckDB; oracle inputs are
    # always DOUBLE columns, which is what this property certifies
    duck = duckdb.sql(
        f"SELECT FLOOR(CAST({x!r} AS DOUBLE) * {scale} + 0.5) / {scale}"
    ).fetchone()[0]
    assert py == duck or (math.isnan(py) and math.isnan(duck))
