#!/usr/bin/env python
"""Build a k×-scaled copy of a testdata SF directory for scaling runs.

The driver ships sf0.001/0.01/0.1 only; the SCALE.md curve wants one more
decade. This replicates the sf0.1 tables k times with key offsets chosen so
every foreign-key relationship is preserved (each replica is a disjoint,
self-consistent copy of the world): orders→customer, lineitem→orders/
supplier/part, events user/event ids, documents/embeddings ids. The
nation/region dims stay fixed (they are scale-free in TPC-H), so replicas
share dims exactly like real SF growth does. Distribution shape per replica
is identical to the source — group counts, join fan-outs and dup structure
scale linearly, which is what a scaling-exponent measurement needs.

Usage: python tools/make_scaled_sf.py [src_dir] [dst_dir] [k]
Defaults: /root/testdata/sf0.1 → /tmp/mimranalytics_scaled_sf1 × 10.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mimranalytics_scaled_sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> {column: key-space it belongs to}; key spaces get per-replica
# offsets of (max_key + 1) so replicas never collide.
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_suppkey": "supp", "l_partkey": "part"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY = ["region", "nation"]

KEY_SOURCES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    spans = {
        space: con.execute(
            f"SELECT MAX({col}) + 1 FROM read_parquet('{SRC}/{tbl}.parquet')"
        ).fetchone()[0]
        for space, (tbl, col) in KEY_SOURCES.items()
    }
    for tbl in COPY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) "
            f"TO '{DST}/{tbl}.parquet' (FORMAT parquet)"
        )
    for tbl, keymap in KEYED.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
            ).fetchall()
        ]
        # entity NAMES must track the offset keys ("Customer#%09d" etc.):
        # keeping the source strings would put the SAME name in every
        # replica, making replicas non-disjoint and inflating name-blocked
        # ops (join_fuzzy_name_blocked / pipeline_entity_resolution)
        # quadratically in K — measured 197 s at K=10 vs 2.2 s at sf0.1
        # before this fix, pure fixture artifact.
        # replica EMBEDDINGS are rotated, not duplicated (round-15, r14
        # VERDICT #9): replica i > 0 applies a deterministic per-replica
        # PERMUTATION of the 64 dims. An orthogonal transform preserves
        # every WITHIN-replica cosine exactly (near-dup structure per
        # replica is byte-identical to the source), while a permuted twin
        # has near-zero cosine to its original — so the near-dup pair set
        # grows linearly in K like real SF growth, instead of every
        # vector gaining K-1 exact twins (the superlinear fixture
        # artifact that forced the dedup_embedding_cosine decade-gate
        # exemption since round 9).
        def _embedding_sql(col: str) -> str:
            import random

            cases = []
            for i in range(1, K):
                idx = list(range(1, 65))  # DuckDB list indices are 1-based
                random.Random(1000 + i).shuffle(idx)
                cases.append(f"WHEN {i} THEN list_select({col}, {idx})")
            return f"CASE r.i {' '.join(cases)} ELSE {col} END AS {col}"

        name_fixes = {
            ("customer", "c_name"): (
                "printf('Customer#%09d', c_custkey + r.i * {o}) AS c_name",
                "cust",
            ),
            ("supplier", "s_name"): (
                "printf('Supplier#%09d', s_suppkey + r.i * {o}) AS s_name",
                "supp",
            ),
        }
        sel = ", ".join(
            f"{c} + r.i * {spans[keymap[c]]} AS {c}"
            if c in keymap
            else (
                name_fixes[(tbl, c)][0].format(o=spans[name_fixes[(tbl, c)][1]])
                if (tbl, c) in name_fixes
                # events.ts is physically timestamp[ns] in the source and the
                # engine reads it via nanosAsLong as epoch-nano BIGINT; DuckDB
                # would silently rewrite it as timestamp[us] (TIMESTAMP_NTZ to
                # Spark — breaks streaming watermarks). Emit epoch-nanos so the
                # catalog's bigint→timestamp path applies identically.
                else (
                    f"epoch_ns({c}) AS {c}"
                    if tbl == "events" and c == "ts"
                    else (
                        _embedding_sql(c)
                        if tbl == "embeddings" and c == "embedding"
                        else c
                    )
                )
            )
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{tbl}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({K})) AS i) r) "
            f"TO '{DST}/{tbl}.parquet' (FORMAT parquet)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/{tbl}.parquet')").fetchone()[0]
        print(f"{tbl}: {n} rows", file=sys.stderr)


if __name__ == "__main__":
    main()
