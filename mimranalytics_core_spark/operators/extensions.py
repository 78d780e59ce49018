"""Extension-surface operators: map expansion, grouped-map UDAF, UDTF,
watermarked streaming demo (SURVEY.md §2.8 fn_map_entries, §2.12, §2.10).

Provenance: dynamic property bags (reference README.md:25), Python extension
surface (README.md:26 — FastAPI backend implies user-defined Python logic),
temporal streams (README.md:17).

Scale posture: the grouped-map UDAF ships one Arrow batch per group to
Python — group count must be bounded (here: 25 nations); per-row UDTFs and
map explosion stay proportional to input and shuffle nothing by themselves.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from mimranalytics_core_spark.functions.numeric import dround_sql
from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "fn_map_entries",
    "scalar_fns",
    oracle="""
        SELECT event_id, key,
               CAST(json_extract_string(props, '$' || '.' || key) AS INT) AS val
        FROM (SELECT event_id, props, unnest(json_keys(props)) AS key FROM events)
    """,
    notes=(
        "property-bag expansion (README.md:25 dynamic props): JSON → "
        "map<string,int> → one row per entry via explode(map)"
    ),
)
def fn_map_entries(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select("event_id", F.explode(m).alias("key", "val"))


@register(
    "udaf_grouped",
    "udfs",
    oracle=f"""
        SELECT c_nationkey,
               {dround_sql(
                   "SUM((1 + c_custkey % 3) * c_acctbal) / SUM(1 + c_custkey % 3)", 4
               )} AS weighted_bal,
               COUNT(*) AS n
        FROM customer GROUP BY c_nationkey
    """,
    notes=(
        "custom per-group reduce via applyInPandas (grouped-map Arrow batch): "
        "weighted mean with data-dependent weights — the UBO-style custom "
        "merge surface (README.md:13). Groups bounded (25 nations) so one "
        "batch per group is safe; unbounded-group UDAFs would pre-aggregate"
    ),
)
def udaf_grouped(spark, sf_dir):
    import math

    def weighted(pdf: pd.DataFrame) -> pd.DataFrame:
        w = 1 + (pdf["c_custkey"] % 3)
        wb = float((w * pdf["c_acctbal"]).sum() / w.sum())
        return pd.DataFrame(
            {
                "c_nationkey": [int(pdf["c_nationkey"].iloc[0])],
                "weighted_bal": [math.floor(wb * 1e4 + 0.5) / 1e4],
                "n": [len(pdf)],
            }
        )

    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        weighted, schema="c_nationkey INT, weighted_bal DOUBLE, n BIGINT"
    )


@register(
    "udtf_expand",
    "udfs",
    oracle="""
        SELECT o.o_orderkey, CAST(i.n AS INT) AS installment_no,
               FLOOR(o.o_totalprice / 3 * 100 + 0.5) / 100 AS amount
        FROM orders o CROSS JOIN (SELECT unnest(range(1, 4)) AS n) i
        WHERE o.o_totalprice > 250000
    """,
    notes=(
        "one-row→many expansion via a Python UDTF (Spark 4 @udtf, lateral "
        "join): installment-schedule enumeration — the path-enumeration "
        "surface (README.md:11). Arrow-batched; per-row fanout is bounded (3)"
    ),
)
def udtf_expand(spark, sf_dir):
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="installment_no INT, amount DOUBLE")
    class Installments:
        def eval(self, totalprice: float):
            for i in range(1, 4):
                yield i, math.floor(totalprice / 3 * 100 + 0.5) / 100

    t(spark, sf_dir, "orders")  # register the orders view
    spark.udtf.register("installments", Installments)
    # Filter INSIDE the FROM clause: Catalyst will not push a WHERE below a
    # BatchEvalPythonUDTF node (opaque Python boundary — guide §4), so the
    # trailing-WHERE form shipped every order row through the Python worker
    # and discarded ~96% of the expanded output afterwards. Pre-filtering
    # lands the predicate in the parquet scan (PushedFilters) and only
    # qualifying rows pay the JVM↔Python crossing. Same rows out: the
    # predicate references only the UDTF's input column.
    return spark.sql(
        """
        SELECT o.o_orderkey, i.installment_no, i.amount
        FROM (SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_totalprice > 250000) o,
             LATERAL installments(o.o_totalprice) i
        """
    )


@register(
    "stream_watermark_late",
    "event_time",
    oracle=None,  # streaming-state semantics: rows-only per SURVEY.md §2.10
    notes=(
        "watermarked tumbling aggregation executed as a real Structured "
        "Streaming query (availableNow replay of the events table, memory "
        "sink): demonstrates late-data tolerance bounds; state evicted past "
        "the 10-minute watermark. Batch-twin semantics oracle-checked via "
        "stream_tumbling"
    ),
)
def stream_watermark_late(spark, sf_dir):
    import uuid

    from mimranalytics_core_spark.streaming import jobs

    stream = jobs.events_stream(spark, sf_dir)
    name = f"wm_demo_{uuid.uuid4().hex[:8]}"
    return jobs.run_available_now(
        jobs.tumbling_counts(stream), name, spark, output_mode="complete"
    )


@register(
    "stream_session_real",
    "event_time",
    oracle=None,  # streaming-state semantics: rows-only per SURVEY.md §2.10
    notes=(
        "gap-based sessionization executed as a REAL Structured Streaming "
        "query (F.session_window, 30-minute gap, 10-minute watermark; "
        "availableNow replay of the events table into a memory sink) — the "
        "streaming form of the oracle-checked batch twin stream_session. "
        "Session-window state merges adjacent windows per key and is "
        "evicted once the watermark passes a session's close — the bounded-"
        "state shape for unbounded streams. Batch/stream agreement on the "
        "replay fixture asserted in tests/test_streaming.py (same rows as "
        "the batch F.session_window computation)"
    ),
)
def stream_session_real(spark, sf_dir):
    import uuid

    from mimranalytics_core_spark.streaming import jobs

    stream = jobs.events_stream(spark, sf_dir)
    name = f"sess_demo_{uuid.uuid4().hex[:8]}"
    return jobs.run_available_now(
        jobs.session_windows(stream), name, spark, output_mode="complete"
    )


@register(
    "stream_dedup_real",
    "event_time",
    oracle=None,  # streaming-state semantics: rows-only per SURVEY.md §2.10
    notes=(
        "stateful streaming dedup by event_id executed as a REAL Structured "
        "Streaming query (dropDuplicatesWithinWatermark, 10-minute horizon, "
        "availableNow replay) — the streaming form of the north-star dedup "
        "family: per-key state bounded by the watermark (evicted past the "
        "horizon), payload projected BEFORE the dedup so the state store "
        "holds narrow rows (the round-3 lesson — dropDuplicates state "
        "stores FULL rows per key). Batch twin stream_dedup_state is "
        "oracle-checked; cardinality/uniqueness agreement on the replay "
        "fixture asserted in tests/test_streaming.py"
    ),
)
def stream_dedup_real(spark, sf_dir):
    import uuid

    from mimranalytics_core_spark.streaming import jobs

    stream = jobs.events_stream(spark, sf_dir)
    name = f"dedup_demo_{uuid.uuid4().hex[:8]}"
    return jobs.run_available_now(jobs.dedup_within_watermark(stream), name, spark)


@register(
    "sink_report_roundtrip",
    "sinks",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS revenue
        FROM orders GROUP BY o_orderpriority
    """,
    notes=(
        "audit-report sink (README.md:19): aggregate → parquet artifact "
        "(sources/io.export_report) → re-read; declared result is the "
        "re-read file, so the oracle checks the full write/read cycle"
    ),
)
def sink_report_roundtrip(spark, sf_dir):
    import os

    from mimranalytics_core_spark.functions.numeric import dround
    from mimranalytics_core_spark.sources.io import export_report, read_any

    o = t(spark, sf_dir, "orders")
    report = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dround(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    dest = f"/tmp/mimranalytics_reports/{os.path.basename(sf_dir.rstrip('/'))}/priority_revenue"
    export_report(report, dest, fmt="parquet", order_by=["o_orderpriority"])
    return read_any(spark, dest, "parquet")


@register(
    "text_token_regex",
    "text",
    oracle="""
        SELECT doc_id, token, COUNT(*) AS n
        FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS token
              FROM documents WHERE doc_id < 50)
        GROUP BY doc_id, token
    """,
    notes=(
        "BPE-ish regex tokenizer (letter-runs | digit-runs): the token-"
        "counting north star over a non-whitespace tokenization; regex kept "
        "in the Java/RE2-common subset"
    ),
)
def text_token_regex(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+|[0-9]+"), 0)
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("n"))
    )


_SIMHASH_ORACLE = """
    WITH toks AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        )
    ),
    hashed AS (
        -- 64-bit token hash = first 16 hex chars of md5, split into 32-bit
        -- halves (hi = nibbles 1-8, lo = nibbles 9-16) — bit-identical to the
        -- Spark side's conv(substring(md5..)) split
        SELECT doc_id,
               ('0x' || substr(md5(token), 1, 8))::BIGINT AS hi,
               ('0x' || substr(md5(token), 9, 8))::BIGINT AS lo
        FROM toks
    ),
    votes AS (
        SELECT doc_id, j,
               SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo ELSE hi END) >> (j % 32)) & 1 = 1
                        THEN 1 ELSE -1 END) AS v
        FROM hashed CROSS JOIN generate_series(0, 63) AS g(j)
        GROUP BY doc_id, j
    ),
    sim AS (
        SELECT doc_id,
               (SUM(CASE WHEN v > 0 THEN
                    CASE WHEN j = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << j) END
                    ELSE 0 END))::BIGINT AS simhash
        FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register(
    "dedup_simhash",
    "text",
    oracle=_SIMHASH_ORACLE,
    notes=(
        "SimHash near-dup candidates: 64-bit fingerprint = sign of per-bit "
        "sum of token-hash bits; docs paired when hamming distance ≤ 3 via "
        "4-segment pigeonhole blocking (any pair within radius 3 shares ≥1 "
        "exact 16-bit segment) — banded equi-join, never all-pairs. Token "
        "hash is md5-derived (identical in both engines), so the oracle is "
        "the EXACT all-pairs hamming-≤3 set: the hash match certifies both "
        "the fingerprint math and that pigeonhole blocking loses no pair "
        "(the invariant also unit-tested in tests/test_text_extra.py)"
    ),
)
def dedup_simhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("toks"))
    # per-doc 64-bit simhash: bit j set iff sum over tokens of bit_j(±1) > 0.
    # Token hash = first 16 hex chars of md5 as two 32-bit halves — matches
    # the DuckDB oracle exactly (xxhash64 would be engine-private)
    hx = F.md5("token")
    h = toks.select("doc_id", F.explode("toks").alias("token")).select(
        "doc_id",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    bit_votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("lo" if j < 32 else "hi"), j % 32)
                    .bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(64)
        ]
    )
    sim = bit_votes.select(
        "doc_id",
        sum(
            (
                F.when(
                    # bit 63 is the sign bit of int64 — lit(-(2^63)) sets it
                    F.col(f"v{j}") > 0,
                    F.lit((1 << j) if j < 63 else -(1 << 63)),
                ).otherwise(F.lit(0))
                for j in range(64)
            ),
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    # pigeonhole blocking: 4 × 16-bit segments; hamming ≤ 3 ⇒ ≥1 segment equal
    seg = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seg_id"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * s)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("seg"),
                    )
                    for s in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.seg_id").alias("seg_id"), F.col("b.seg").alias("seg"))
    l = seg.alias("l")
    r = seg.alias("r")
    hamming = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(
            r,
            (F.col("l.seg_id") == F.col("r.seg_id"))
            & (F.col("l.seg") == F.col("r.seg"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )


@register(
    "fn_json_variant",
    "scalar_fns",
    oracle="""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_variant
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INT) % 2 = 0
    """,
    notes=(
        "Spark 4 VariantType path (SURVEY.md §1.2): reads the CATALOG-level "
        "variant column (events.props_v — parsed once at load, catalog.py), "
        "typed field access via variant-get; the plan contains exactly one "
        "parse_json at the scan (plan-asserted) — the schema-flexible "
        "property-bag representation (README.md:25) without per-access "
        "JSON re-parsing"
    ),
)
def fn_json_variant(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    v = F.try_variant_get(F.col("props_v"), "$.k", "int")
    return ev.select("event_id", v.alias("k_variant")).filter(F.col("k_variant") % 2 == 0)


@register(
    "sim_ngram_jaccard",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS ts
            FROM documents WHERE doc_id < 1000
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   ts[i.n] || ' ' || ts[i.n + 1] || ' ' || ts[i.n + 2] AS shingle
            FROM toks CROSS JOIN (SELECT unnest(range(1, 2000)) AS n) i
            WHERE i.n + 2 <= len(ts)
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               FLOOR(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) * 10000 + 0.5) / 10000 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
    """,
    notes=(
        "3-gram shingle Jaccard (north-star n-gram near-dup): shingles built "
        "row-local via transform over token index sequence (no per-gram "
        "shuffle), then inverted-index pair join — word-order-sensitive "
        "companion to token-set Jaccard; subset-bounded like all O(n²) "
        "verify ops"
    ),
)
def sim_ngram_jaccard(spark, sf_dir):
    # doc_id < 1000: widened from the round-1 `< 60` slice, which yielded ZERO
    # pairs at the driver's sf0.01 gate (vacuous green — round-2 verdict). At
    # 1000 the op returns rows at every SF (sf0.001: ~18, sf0.01: ~25,
    # sf0.1: 7 pairs), so the hash match actually exercises the Jaccard math.
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    ts = F.split(F.lower("text"), " ")
    # Guard short docs: with size(ts) < 3 the sequence stop goes negative and
    # descends (step -1), driving element_at to index 0 / out-of-bounds — an
    # error under ANSI mode and a divergence from the oracle's `i.n + 2 <=
    # len(ts)` guard. Such docs have no 3-gram shingles: emit an empty array.
    shingles = F.when(
        F.size(ts) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(ts) - 3),
                lambda i: F.concat_ws(
                    " ", F.element_at(ts, i + 1), F.element_at(ts, i + 2), F.element_at(ts, i + 3)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i").cast("double") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(jac * 10000 + F.lit(0.5)) / 10000).alias("jaccard"),
        )
    )


@register(
    "stream_stateful_custom",
    "event_time",
    oracle=None,  # custom streaming state: rows-only per SURVEY.md §2.10
    notes=(
        "custom per-key stateful streaming op executed for real: "
        "applyInPandasWithState keeps running Welford mean/variance per user "
        "and emits each event's z-score against state-before-it (alarm-"
        "verification pattern); availableNow replay, memory sink. Semantics "
        "asserted against batch in tests/test_streaming.py"
    ),
)
def stream_stateful_custom(spark, sf_dir):
    import uuid

    from mimranalytics_core_spark.streaming import jobs

    stream = jobs.events_stream(spark, sf_dir)
    name = f"stateful_demo_{uuid.uuid4().hex[:8]}"
    return jobs.run_available_now(
        jobs.anomaly_flags_stateful(stream), name, spark, output_mode="append"
    )


@register(
    "sink_csv_roundtrip",
    "sinks",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n,
               FLOOR(SUM(l_quantity) * 100 + 0.5) / 100 AS qty
        FROM lineitem GROUP BY l_returnflag
    """,
    notes=(
        "CSV sink/source round-trip (audit interchange format, README.md:19): "
        "aggregate → headered CSV via export_report → re-read with an "
        "explicit schema (schema-on-read; CSV carries no types). Certifies "
        "the text-format edge of the sink surface; parquet twin is "
        "sink_report_roundtrip"
    ),
)
def sink_csv_roundtrip(spark, sf_dir):
    import os

    from mimranalytics_core_spark.functions.numeric import dround
    from mimranalytics_core_spark.sources.io import export_report, read_any

    li = t(spark, sf_dir, "lineitem")
    report = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dround(F.sum("l_quantity"), 2).alias("qty"),
    )
    dest = f"/tmp/mimranalytics_reports/{os.path.basename(sf_dir.rstrip('/'))}/returnflag_qty_csv"
    export_report(report, dest, fmt="csv", order_by=["l_returnflag"])
    return read_any(
        spark, dest, "csv", schema="l_returnflag STRING, n BIGINT, qty DOUBLE"
    )


@register(
    "sink_json_partitioned_roundtrip",
    "sinks",
    oracle="""
        SELECT r_name, n_name,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               FLOOR(SUM(GREATEST(c_acctbal, 0)) * 100 + 0.5) / 100 AS bal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    notes=(
        "JSON sink with hive-style directory partitioning (r_name=... dirs) "
        "→ re-read; the declared result is the re-read files, so the oracle "
        "checks the write/read cycle including partition-column recovery "
        "from directory names. Partitioned layout is the 100 TB export "
        "shape: downstream scans prune partitions instead of reading the "
        "full artifact. Completes the sink format matrix (parquet / CSV / "
        "JSON-partitioned)"
    ),
)
def sink_json_partitioned_roundtrip(spark, sf_dir):
    import os

    from mimranalytics_core_spark.functions.numeric import dround
    from mimranalytics_core_spark.sources.io import export_report, read_any

    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    report = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            dround(F.sum(F.greatest(F.col("c_acctbal"), F.lit(0.0))), 2).alias("bal"),
        )
    )
    dest = (
        f"/tmp/mimranalytics_reports/{os.path.basename(sf_dir.rstrip('/'))}/nation_bal_json"
    )
    export_report(report, dest, fmt="json", partition_by=["r_name"])
    back = read_any(spark, dest, "json")
    # JSON carries no schema: pin types (counts arrive as long, bal as
    # double; the partition column is recovered from directory names)
    return back.select(
        F.col("r_name").cast("string"),
        F.col("n_name").cast("string"),
        F.col("n_cust").cast("bigint"),
        F.col("bal").cast("double"),
    )


@register(
    "sink_orc_roundtrip",
    "sinks",
    oracle="""
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS n_supp,
               FLOOR(SUM(s_acctbal) * 100 + 0.5) / 100 AS bal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
    notes=(
        "ORC sink/source roundtrip — the third columnar format on the "
        "source/sink surface (parquet, csv, json, orc): supplier balance "
        "report written as ORC and re-read; the declared result is the "
        "re-read file, so the oracle certifies the full write/read cycle "
        "including ORC's type mapping (DECIMAL-free doubles, BIGINT "
        "counts). ORC readers get the same pushdown/pruning treatment as "
        "parquet in Spark (format-native PPD)"
    ),
)
def sink_orc_roundtrip(spark, sf_dir):
    import os

    from mimranalytics_core_spark.functions.numeric import dround
    from mimranalytics_core_spark.sources.io import export_report, read_any

    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    report = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_supp"),
            dround(F.sum("s_acctbal"), 2).alias("bal"),
        )
    )
    dest = f"/tmp/mimranalytics_reports/{os.path.basename(sf_dir.rstrip('/'))}/nation_supp_orc"
    export_report(report, dest, fmt="orc", order_by=["n_name"])
    return read_any(spark, dest, "orc")


@register(
    "stream_stream_join",
    "event_time",
    oracle=None,  # streaming-state semantics: rows-only per SURVEY.md §2.10
    notes=(
        "REAL stream-stream interval join (views ⋈ purchases within 1h per "
        "user, both sides watermarked 30 min, availableNow replay of two "
        "independent file streams) — the funnel/attribution staple and the "
        "last headline Structured Streaming join shape not yet declared "
        "(stream_join_enrich is stream-static). The time-range predicate + "
        "double watermark is what bounds both state stores; batch/stream "
        "agreement on the replay fixture asserted in tests/test_streaming.py"
    ),
)
def stream_stream_join(spark, sf_dir):
    import uuid

    from mimranalytics_core_spark.streaming import jobs

    views = jobs.events_stream(spark, sf_dir)
    purchases = jobs.events_stream(spark, sf_dir)
    name = f"ssj_demo_{uuid.uuid4().hex[:8]}"
    # 8 state partitions (round-12, r11 VERDICT #7): the double-sided
    # state store makes partition COUNT the wall-time driver on a replay
    # (each partition is a state-store instance with per-batch
    # maintenance); results are partitioning-independent — asserted
    # against the batch twin in tests/test_streaming.py. At 100 TB the
    # same knob turns UP with state volume.
    return jobs.run_available_now(
        jobs.purchase_after_view_join(views, purchases), name, spark,
        shuffle_partitions=8,
    )


@register(
    "scan_schema_evolution",
    "sinks",
    oracle="""
        SELECT o_orderkey,
               FLOOR(o_totalprice * 100 + 0.5) / 100 AS o_totalprice,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey,
               FLOOR(o_totalprice * 100 + 0.5) / 100,
               o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1
    """,
    notes=(
        "schema evolution across file generations: generation 1 written "
        "without o_orderpriority, generation 2 with it; one mergeSchema "
        "read reconciles both (older rows null-extend) — the additive-"
        "column evolution every long-lived 100 TB table undergoes. The "
        "declared result is the merged READ, so the oracle certifies "
        "write + merge + null-extension semantics. mergeSchema costs a "
        "footer pass per file group; production tables pin the merged "
        "schema in a metastore instead — noted, but the reconciliation "
        "semantics are what this op pins"
    ),
)
def scan_schema_evolution(spark, sf_dir):
    import os

    from mimranalytics_core_spark.functions.numeric import dround

    o = t(spark, sf_dir, "orders")
    base = f"/tmp/mimranalytics_reports/{os.path.basename(sf_dir.rstrip('/'))}/schema_evo"
    g1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", dround(F.col("o_totalprice"), 2).alias("o_totalprice")
    )
    g2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        dround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        "o_orderpriority",
    )
    g1.write.mode("overwrite").parquet(f"{base}/gen=1")
    g2.write.mode("overwrite").parquet(f"{base}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=1", f"{base}/gen=2"
    )
    return merged.select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "profile_events_table",
    "profiling",
    oracle="""
        SELECT 'event_id' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
               CAST(MIN(event_id) AS VARCHAR) AS min_val,
               CAST(MAX(event_id) AS VARCHAR) AS max_val
        FROM events
        UNION ALL
        SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
               CAST(COUNT(DISTINCT user_id) AS BIGINT),
               CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
               CAST(COUNT(DISTINCT event_type) AS BIGINT),
               CAST(MIN(event_type) AS VARCHAR), CAST(MAX(event_type) AS VARCHAR)
        FROM events
        UNION ALL
        SELECT 'value', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) - COUNT(value) AS BIGINT),
               CAST(COUNT(DISTINCT value) AS BIGINT),
               CAST(FLOOR(MIN(value) * 1000000.0 + 0.5) / 1000000.0 AS VARCHAR),
               CAST(FLOOR(MAX(value) * 1000000.0 + 0.5) / 1000000.0 AS VARCHAR)
        FROM events
    """,
    notes=(
        "data-quality profile of a table (null rate, cardinality, range "
        "per column) — the ingest-gate report every pipeline runs before "
        "trusting a new drop. ONE scan computes all columns' stats "
        "(Catalyst fuses the aggregates; the oracle's UNION ALL form is "
        "four scans but value-identical); count-distinct is the only "
        "wide state and at 100 TB each column's would switch to its "
        "approx sketch (declared separately)"
    ),
)
def profile_events_table(spark, sf_dir):
    ev = t(spark, sf_dir, "events")

    def num_s(c):
        return (F.floor(c * 1e6 + F.lit(0.5)) / 1e6).cast("string")

    agg = ev.agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("event_id")).alias("null_event_id"),
        F.countDistinct("event_id").alias("d_event_id"),
        F.min("event_id").cast("string").alias("mn_event_id"),
        F.max("event_id").cast("string").alias("mx_event_id"),
        (F.count("*") - F.count("user_id")).alias("null_user_id"),
        F.countDistinct("user_id").alias("d_user_id"),
        F.min("user_id").cast("string").alias("mn_user_id"),
        F.max("user_id").cast("string").alias("mx_user_id"),
        (F.count("*") - F.count("event_type")).alias("null_event_type"),
        F.countDistinct("event_type").alias("d_event_type"),
        F.min("event_type").alias("mn_event_type"),
        F.max("event_type").alias("mx_event_type"),
        (F.count("*") - F.count("value")).alias("null_value"),
        F.countDistinct("value").alias("d_value"),
        num_s(F.min("value")).alias("mn_value"),
        num_s(F.max("value")).alias("mx_value"),
    )
    stack = F.expr(
        "stack(4, "
        "'event_id', null_event_id, d_event_id, mn_event_id, mx_event_id, "
        "'user_id', null_user_id, d_user_id, mn_user_id, mx_user_id, "
        "'event_type', null_event_type, d_event_type, mn_event_type, mx_event_type, "
        "'value', null_value, d_value, mn_value, mx_value"
        ") AS (col, n_null, n_distinct, min_val, max_val)"
    )
    return agg.select("n_rows", stack).select(
        "col", "n_rows", "n_null", "n_distinct", "min_val", "max_val"
    )


@register(
    "reshape_unpivot",
    "scalar_fns",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'extendedprice',
               CAST(l_extendedprice AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'discount',
               CAST(l_discount AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax',
               CAST(l_tax AS DOUBLE) FROM lineitem
    """,
    notes=(
        "wide-to-long unpivot/melt (the report-reshaping verb of the F5 "
        "export surface, and the long-format feed every metrics store "
        "ingests): DataFrame.unpivot — ONE scan emitting 4 rows per input "
        "row (Spark's Expand node), vs the oracle's 4-scan UNION ALL "
        "formulation. Scan-local, zero shuffle, output 4x input — the "
        "exact shape at any scale"
    ),
)
def reshape_unpivot(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
        F.col("l_tax").cast("double").alias("tax"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount", "tax"],
        "measure",
        "value",
    )


@register(
    "udtf_table_arg",
    "udfs",
    oracle="""
        SELECT c_nationkey, CAST(COUNT(*) AS INTEGER) AS n_cust,
               FLOOR(COALESCE(MAX(gap), 0.0) * 100 + 0.5) / 100 AS max_gap
        FROM (
            SELECT c_nationkey,
                   c_acctbal - LAG(c_acctbal) OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal ASC, c_custkey ASC) AS gap
            FROM customer
        )
        GROUP BY c_nationkey
    """,
    notes=(
        "Python UDTF with a TABLE argument + PARTITION BY/ORDER BY (the "
        "Spark 4 polymorphic-table-function surface, README.md:26's "
        "Python extension point in its newest form): the UDTF receives "
        "each nation's customers as an ordered partition stream (eval per "
        "row, terminate emits), computing the largest balance gap between "
        "consecutive customers — per-group sequential logic that plain "
        "UDFs/window functions would need multiple passes to express. "
        "One shuffle on the partition key; Arrow-batched rows; oracle is "
        "the LAG-window reformulation"
    ),
)
def udtf_table_arg(spark, sf_dir):
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="c_nationkey INT, n_cust INT, max_gap DOUBLE")
    class BalanceGaps:
        def __init__(self):
            self._prev = None
            self._mx = 0.0
            self._n = 0
            self._key = None

        def eval(self, row):
            self._key = row["c_nationkey"]
            self._n += 1
            if self._prev is not None:
                g = row["c_acctbal"] - self._prev
                if g > self._mx:
                    self._mx = g
            self._prev = row["c_acctbal"]

        def terminate(self):
            if self._key is not None:
                yield self._key, self._n, math.floor(self._mx * 100 + 0.5) / 100

    t(spark, sf_dir, "customer")  # register the customer view
    spark.udtf.register("balance_gaps", BalanceGaps)
    return spark.sql(
        """
        SELECT * FROM balance_gaps(
            TABLE(SELECT c_nationkey, c_acctbal, c_custkey FROM customer)
            PARTITION BY c_nationkey
            ORDER BY (c_acctbal ASC, c_custkey ASC)
        )
        """
    )
