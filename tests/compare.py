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


def compare(spark_df, con, sql: str, name: str = "query") -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    problems = []
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()

    s_cols = sorted(sdf.columns)
    d_cols = sorted(ddf.columns)
    if s_cols != d_cols:
        return [f"{name}: column mismatch spark={s_cols} duck={d_cols}"]
    if len(sdf) != len(ddf):
        problems.append(f"{name}: row count spark={len(sdf)} duck={len(ddf)}")

    def canon(df):
        rows = [tuple(_norm(v) for v in row) for row in df[s_cols].itertuples(index=False)]
        return sorted(rows, key=repr)

    if problems:
        return problems
    s_rows, d_rows = canon(sdf), canon(ddf)
    if s_rows != d_rows:
        diffs = [
            f"  spark={s!r}\n  duck ={d!r}"
            for s, d in zip(s_rows, d_rows)
            if s != d
        ][:5]
        problems.append(f"{name}: value mismatch ({len(diffs)}+ rows differ):\n" + "\n".join(diffs))
    return problems
