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
    return spark.sql(
        """
        SELECT o.o_orderkey, i.installment_no, i.amount
        FROM orders o, LATERAL installments(o.o_totalprice) i
        WHERE o.o_totalprice > 250000
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
