"""Scalar function surface + UDF tier (SURVEY.md §2.8, §2.12).

Provenance: entity-name/address normalization for conflict matching
(reference README.md:15), time-slider date bucketing (README.md:17),
ownership math (README.md:13), dynamic property bags (README.md:25),
embeddings arrays (north star).

Scale posture: everything here except the two declared UDF ops is built-in
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python
boundary. The UDF ops exist to declare the extension surface (README.md:26 —
Python backend): the scalar UDF mirrors SQL CASE logic 1:1 and the pandas UDF
is Arrow-vectorized; both are kept OFF hot paths of other operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from mimranalytics_core_spark.functions.numeric import dround, dround_sql
from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register


@register(
    "fn_string",
    "scalar_fns",
    oracle="""
        SELECT c_custkey,
               LOWER(c_name) AS name_lower,
               UPPER(c_mktsegment) AS seg_upper,
               TRIM(c_name) AS name_trim,
               SUBSTRING(c_name, 1, 8) AS name_prefix,
               CONCAT(c_name, '#', c_mktsegment) AS name_tag,
               REPLACE(c_name, 'Customer', 'Cust') AS name_short,
               LENGTH(c_name) AS name_len,
               LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad
        FROM customer
    """,
    notes="name normalization suite (conflict matching, README.md:15)",
)
def fn_string(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim("c_name").alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_tag"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_pad"),
    )


@register(
    "fn_string_regex",
    "scalar_fns",
    oracle="""
        SELECT p_partkey, p_type,
               regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
               regexp_replace(p_type, '[aeiou]', '_') AS devoweled,
               (p_name LIKE '%a%') AS has_a,
               string_split(p_type, ' ')[1] AS type_head
        FROM part
    """,
    notes="regex extraction/replacement over type strings (address-normalization analog)",
)
def fn_string_regex(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
    )


@register(
    "fn_string_distance",
    "scalar_fns",
    oracle="""
        SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
               levenshtein(a.s_name, b.s_name) AS lev
        FROM (SELECT * FROM supplier WHERE s_suppkey < 500) a
        JOIN (SELECT * FROM supplier WHERE s_suppkey < 500) b
          ON a.s_suppkey < b.s_suppkey
        WHERE levenshtein(a.s_name, b.s_name) <= 3
    """,
    notes=(
        "fuzzy name matching (near-identical entity names, README.md:15); "
        "pair space key-bounded — at 100 TB the blocking key would be a "
        "name n-gram/phonetic bucket, not an id range (all-pairs lev is O(n²))"
    ),
)
def fn_string_distance(spark, sf_dir):
    s = t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 500)
    a = s.alias("a")
    b = s.alias("b")
    lev = F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
    return (
        a.join(b, F.col("a.s_suppkey") < F.col("b.s_suppkey"))
        .select(
            F.col("a.s_suppkey").alias("supp_a"),
            F.col("b.s_suppkey").alias("supp_b"),
            lev.alias("lev"),
        )
        .filter(F.col("lev") <= 3)
    )


@register(
    "fn_date",
    "scalar_fns",
    oracle="""
        SELECT o_orderkey,
               date_trunc('month', o_orderdate) AS order_month,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(dayofweek(o_orderdate) AS INT) AS dow,
               CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002,
               o_orderdate + INTERVAL 30 DAY AS due_date
        FROM orders
    """,
    notes="date bucketing/arithmetic for the Time-Slider (README.md:17); dow pinned Sunday=0",
)
def fn_date(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    # dow convention pinned to Sunday=0: DuckDB dayofweek is Sun=0..Sat=6,
    # Spark dayofweek is Sun=1..Sat=7 → subtract 1 (probed 2026-08-13).
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("order_month"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.datediff(
            F.lit("2002-01-01 00:00:00").cast("timestamp_ntz"), F.col("o_orderdate")
        ).cast("int").alias("days_to_2002"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@register(
    "fn_math",
    "scalar_fns",
    oracle=f"""
        SELECT l_orderkey, l_linenumber,
               {dround_sql('l_extendedprice', 1)} AS r1,
               ABS(l_discount - 0.05) AS abs_d,
               CAST(CEIL(l_quantity) AS BIGINT) AS ceil_q,
               CAST(FLOOR(l_quantity) AS BIGINT) AS floor_q,
               {dround_sql('LN(l_extendedprice)', 6)} AS ln_price,
               {dround_sql('SQRT(l_quantity)', 6)} AS sqrt_q,
               {dround_sql('POW(1.0 + l_tax, 2)', 6)} AS tax_sq,
               CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sgn,
               CAST(l_orderkey % 7 AS BIGINT) AS mod7,
               CAST(l_quantity AS INT) // 10 AS int_div
        FROM lineitem
    """,
    notes="math suite (ownership-percentage math analog, README.md:13)",
)
def fn_math(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.col("l_extendedprice"), 1).alias("r1"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
        F.ceil("l_quantity").alias("ceil_q"),
        F.floor("l_quantity").alias("floor_q"),
        dround(F.log("l_extendedprice"), 6).alias("ln_price"),
        dround(F.sqrt("l_quantity"), 6).alias("sqrt_q"),
        dround(F.pow(F.lit(1.0) + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("sgn"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("mod7"),
        F.floor(F.col("l_quantity").cast("int") / 10).cast("bigint").alias("int_div"),
    )


@register(
    "fn_array",
    "scalar_fns",
    oracle=f"""
        SELECT vec_id,
               len(embedding) AS dim,
               {dround_sql('CAST(embedding[1] AS DOUBLE)', 6)} AS first_val,
               {dround_sql("list_aggregate(CAST(embedding AS DOUBLE[]), 'sum')", 4)} AS vec_sum,
               {dround_sql("list_aggregate(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')", 4)} AS sq_norm
        FROM embeddings
    """,
    notes="array ops over embedding vectors: size, index, higher-order aggregate",
)
def fn_array(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        dround(F.col("embedding").getItem(0).cast("double"), 6).alias("first_val"),
        dround(F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4).alias("vec_sum"),
        dround(
            F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
    )


@register(
    "fn_json",
    "scalar_fns",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
               (json_extract_string(props, '$.k') IS NOT NULL) AS has_k
        FROM events
    """,
    notes="typed JSON extraction from the dynamic property bag (README.md:25)",
)
def fn_json(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.cast("int").alias("k_int"),
        k.isNotNull().alias("has_k"),
    )


@register(
    "fn_conditional",
    "scalar_fns",
    oracle="""
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN 'debt'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'rich' END AS bal_band,
               COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg_masked,
               LEAST(c_acctbal, 9999.0) AS bal_capped,
               GREATEST(c_acctbal, 0.0) AS bal_floor
        FROM customer
    """,
    notes="CASE/coalesce/nullif/least/greatest formatting suite (README.md:19)",
)
def fn_conditional(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.least(F.col("c_acctbal"), F.lit(9999.0)).alias("bal_capped"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
    )


# ---------------------------------------------------------------------------
# UDF tier (§2.12) — declared extension points, mirrored in SQL for the oracle
# ---------------------------------------------------------------------------


@register(
    "udf_scalar_py",
    "udfs",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 50000 THEN 'S'
                    WHEN o_totalprice < 150000 THEN 'M'
                    WHEN o_totalprice < 300000 THEN 'L'
                    ELSE 'XL' END AS size_band
        FROM orders
    """,
    notes=(
        "row-scalar Python UDF (FastAPI-Python surface analog, README.md:26); "
        "logic mirrored 1:1 in SQL CASE. Arrow-optimized via useArrow=True."
    ),
)
def udf_scalar_py(spark, sf_dir):
    @F.udf(returnType=StringType(), useArrow=True)
    def band(price: float) -> str:
        if price < 50000:
            return "S"
        if price < 150000:
            return "M"
        if price < 300000:
            return "L"
        return "XL"

    o = t(spark, sf_dir, "orders")
    return o.select("o_orderkey", band("o_totalprice").alias("size_band"))


@register(
    "udf_pandas_vec",
    "udfs",
    oracle="""
        SELECT c_custkey,
               ROUND(LN(1.0 + GREATEST(c_acctbal, 0.0)), 6) AS log_bal
        FROM customer
    """,
    notes="vectorized pandas UDF (Arrow batches, numpy math) — the 100 TB Python path",
)
def udf_pandas_vec(spark, sf_dir):
    import numpy as np

    @F.pandas_udf("double")
    def log_bal(bal: pd.Series) -> pd.Series:
        return pd.Series(np.round(np.log1p(np.maximum(bal.to_numpy(), 0.0)), 6))

    c = t(spark, sf_dir, "customer")
    return c.select("c_custkey", log_bal("c_acctbal").alias("log_bal"))


@register(
    "fn_bitwise",
    "scalar_fns",
    oracle="""
        SELECT o_orderkey,
               o_orderkey & 255 AS band,
               o_orderkey | 4096 AS flagged,
               xor(o_orderkey, 21845) AS mixed,
               o_orderkey << 2 AS shl,
               o_orderkey >> 3 AS shr,
               CAST(bit_count(o_orderkey) AS INT) AS popcount
        FROM orders WHERE o_orderkey < 4000
    """,
    notes=(
        "bitwise scalar suite (&, |, xor, shifts, popcount) — the primitive "
        "layer under the engine's own SimHash blocking and LSH band packing, "
        "declared as a first-class surface"
    ),
)
def fn_bitwise(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 4000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("flagged"),
        k.bitwiseXOR(F.lit(21845)).alias("mixed"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "fn_try_arithmetic",
    "functions",
    oracle="""
        SELECT event_id,
               CASE WHEN user_id % 5 = 0 THEN NULL
                    ELSE FLOOR(value / (user_id % 5) * 1000000.0 + 0.5) / 1000000.0
               END AS safe_div,
               TRY_CAST(CASE WHEN event_id % 3 = 0 THEN event_type
                             ELSE CAST(event_id AS VARCHAR) END AS INTEGER)
                   AS maybe_int
        FROM events
    """,
    notes=(
        "ANSI-safe error-tolerant arithmetic: try_divide returns NULL on "
        "division by zero and try_cast NULL on malformed input instead of "
        "failing the job — the semantics a 100 TB pipeline needs (one bad "
        "row must not kill a 6-hour job; collect the NULLs, don't crash). "
        "Oracle expresses the identical null-on-error contract via CASE/"
        "TRY_CAST in DuckDB"
    ),
)
def fn_try_arithmetic(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    denom = F.col("user_id") % 5
    return ev.select(
        "event_id",
        F.when(
            denom != 0,
            F.floor(F.try_divide(F.col("value"), denom) * 1e6 + F.lit(0.5)) / 1e6,
        ).alias("safe_div"),
        F.try_to_number(
            F.when(F.col("event_id") % 3 == 0, F.col("event_type")).otherwise(
                F.col("event_id").cast("string")
            ),
            F.lit("999999999"),
        )
        .cast("int")
        .alias("maybe_int"),
    )


@register(
    "fn_hash_digests",
    "scalar_fns",
    oracle="""
        SELECT c_custkey, md5(c_name) AS md5_hex,
               sha256(c_name) AS sha256_hex,
               md5(c_name || '|' || c_mktsegment) AS composite_md5
        FROM customer
    """,
    notes=(
        "cryptographic digest functions (the content-fingerprint "
        "primitives under the dedup stack — dedup_simhash already derives "
        "its bits from md5): md5/sha256 hex digests plus a composite-key "
        "digest, identical lowercase-hex semantics in both engines. "
        "Row-local, zero shuffle; at 100 TB digests are computed scan-side "
        "exactly like this"
    ),
)
def fn_hash_digests(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("md5_hex"),
        F.sha2(F.col("c_name"), 256).alias("sha256_hex"),
        F.md5(F.concat_ws("|", "c_name", "c_mktsegment")).alias("composite_md5"),
    )


@register(
    "fn_regex_extract_all",
    "scalar_fns",
    oracle="""
        SELECT doc_id,
               array_to_string(regexp_extract_all(text, '[a-z]+a'), '|')
                   AS a_words,
               len(regexp_extract_all(text, '[a-z]+a')) AS n_matches
        FROM documents WHERE doc_id < 100
    """,
    notes=(
        "regexp_extract_all (the multi-match companion of "
        "fn_string_regex's single extract — token mining pulls EVERY "
        "match per row): all lowercase runs ending in 'a', with the match "
        "count. Matches are '|'-joined for the hash comparator (the "
        "agg_collect discipline — the driver canonicalizer cannot sort "
        "list cells); identical RE2-class semantics in both engines; "
        "row-local, zero shuffle"
    ),
)
def fn_regex_extract_all(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ex = F.expr("regexp_extract_all(text, '[a-z]+a', 0)")
    return d.select(
        "doc_id",
        F.array_join(ex, "|").alias("a_words"),
        F.size(ex).alias("n_matches"),
    )
