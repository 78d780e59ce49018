#!/usr/bin/env python
"""Simulate the round driver's correctness check against __spark_entry__.py.

Mirrors the driver protocol observed in CORRECTNESS_r01.json: for each named
query, run the Spark callable and the DuckDB oracle at sf0.01, canonicalize
both results with pandas ``sort_values`` over name-sorted columns (the exact
step that crashes on list cells), and hash the stringified frame. Reports
rows/schema/hash match per query.

Usage: python tools/driver_sim.py [query ...]   (default: all with oracles)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
from pathlib import Path

import duckdb

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return df


def _hash(df):
    payload = df.astype(str).to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from mimranalytics_core_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or [n for n in sorted(qs) if n in oracles]

    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    results, n_red = {}, 0
    for name in names:
        row = {"rows_match": None, "schema_match": None, "hash_match": None, "err": None}
        try:
            sdf = _canon(qs[name](spark, SF).toPandas())
            if name in oracles:
                ddf = _canon(con.execute(oracles[name]).fetchdf())
                row["rows_match"] = len(sdf) == len(ddf)
                row["schema_match"] = list(sdf.columns) == list(ddf.columns)
                row["hash_match"] = _hash(sdf) == _hash(ddf)
                if not all((row["rows_match"], row["schema_match"], row["hash_match"])):
                    n_red += 1
            else:
                row["err"] = "no_oracle"
                row["spark_rows"] = len(sdf)
        except Exception as exc:  # noqa: BLE001 — mirror driver: record and continue
            row["err"] = f"{type(exc).__name__}: {exc}"
            n_red += 1
        results[name] = row
        status = "OK " if row["err"] in (None, "no_oracle") and row.get("hash_match") in (True, None) else "RED"
        print(f"{status} {name}: {json.dumps(row)[:200]}", file=sys.stderr)

    print(json.dumps(results, indent=1))
    spark.stop()
    return 1 if n_red else 0


if __name__ == "__main__":
    sys.exit(main())
