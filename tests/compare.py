"""Differential-compare harness mirroring the driver's oracle check:
row count + schema + order-insensitive value comparison between a Spark
DataFrame and DuckDB running the oracle SQL on the same parquet files.
"""

from __future__ import annotations

import math
import os

import duckdb

from mimranalytics_core_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    import numpy as np

    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return tuple(_norm(x) for x in v.tolist())
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and float noise beyond declared rounding
        return round(v + 0.0, 9)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the kind the driver's hash distinguishes."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare(spark_df, con, sql: str, name: str = "query") -> list[str]:
    """Return list of mismatch descriptions (empty = match).

    Driver-strict: the driver canonicalizes via pandas and hashes value
    *representations*, so 5 (int64) vs 5.0 (float64) is a mismatch there even
    though Python ``5 == 5.0``. We therefore (a) fail on numeric-kind dtype
    mismatches per column, (b) fail on any non-scalar cell (list/ndarray/dict
    — the driver's canonicalizer crashes on unhashable cells), and (c) compare
    rows by repr of the normalized tuple, which keeps int/float distinct.
    """
    problems = []
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()

    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    if s_cols != d_cols:
        return [f"{name}: column mismatch spark={s_cols} duck={d_cols}"]

    for c in s_cols:
        sk, dk = _kind(sdf[c].dtype), _kind(ddf[c].dtype)
        if sk != dk:
            problems.append(
                f"{name}: dtype-kind mismatch on '{c}': spark={sdf[c].dtype}({sk}) "
                f"duck={ddf[c].dtype}({dk}) — driver hash would fail"
            )
        for frame, side in ((sdf, "spark"), (ddf, "duck")):
            col = frame[c]
            if _kind(col.dtype) == "object" and len(col):
                import numpy as np

                first = next((v for v in col if v is not None), None)
                if isinstance(first, (list, tuple, dict, set, np.ndarray)):
                    problems.append(
                        f"{name}: non-scalar cell in {side}.'{c}' "
                        f"({type(first).__name__}) — driver canonicalizer crashes on this"
                    )
    if len(sdf) != len(ddf):
        problems.append(f"{name}: row count spark={len(sdf)} duck={len(ddf)}")
    if problems:
        return problems

    def canon(df):
        reprs = [
            repr(tuple(_norm(v) for v in row))
            for row in df[s_cols].itertuples(index=False)
        ]
        return sorted(reprs)

    s_rows, d_rows = canon(sdf), canon(ddf)
    if s_rows != d_rows:
        diffs = [
            f"  spark={s}\n  duck ={d}"
            for s, d in zip(s_rows, d_rows)
            if s != d
        ][:5]
        problems.append(f"{name}: value mismatch ({len(diffs)}+ rows differ):\n" + "\n".join(diffs))
    return problems
