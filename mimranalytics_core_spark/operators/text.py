"""Text-analysis + deduplication operators (SURVEY.md §2.11, north star).

Provenance: LLM-data-pipeline extension (BASELINE.json north_star: "dedup,
similarity search, multimodal columns, text analysis"); the ``documents``
table is built with heavy near-duplicate structure for exactly these ops
(FIXTURES.md).

Scale posture: everything is explode→groupBy→join over built-in functions
(JVM-side). Token explosion multiplies rows by ~doc length — at 100 TB the
explode output is the dominant shuffle, so every pipeline projects to
(doc_id, token) before exploding and aggregates partially before any join.
MinHash signatures compress each doc to k ints *before* the candidate-pair
shuffle — that reduction is the whole point of the LSH design (pairs are
generated per-band-bucket, never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mimranalytics_core_spark.functions.hints import broadcast_if_small as _broadcast_if_small
from mimranalytics_core_spark.operators._base import t
from mimranalytics_core_spark.registry import register

# How the minhash hashed-token fingerprint table is pinned for its four
# consumers (banding + both verify sides): "eager" materializes at
# construction, "lazy" on first use, "off" recomputes the tokenize+hash
# subtree per consumer, "auto" (default) picks by corpus size. Round-16
# settled the r15 verdict's open question with interleaved same-session
# A/Bs at BOTH scales: at sf0.1 the pin wins (pipeline_curation_gated_first
# 8.16 -> 6.33 s min-of-2), at the 10x replica it LOSES (31.7 -> 36.6 s) —
# the materialization cost grows with the corpus while the 4x-recompute
# saving is fixed, so "auto" pins only under a row-count threshold
# (spark.mimranalytics.fp_pin_max_rows, default 20k docs; parquet-footer
# row count, because compressed BYTES collapse the replica's duplicated
# rows and can't see scale). Unknown row count = too big = no pin, the
# scale-safe default.
_FP_PIN_MODE = "auto"
_FP_PIN_ROWS_CONF = "spark.mimranalytics.fp_pin_max_rows"
_FP_PIN_ROWS_DEFAULT = 20000

# Tokenization used across all text ops: lowercase, split on whitespace.
# documents.text is space-separated synthetic tokens (FIXTURES.md), so this
# is exact; real corpora would swap in a regexp tokenizer here.


def tokens(df):
    """(doc_id, token) exploded view — the shared text primitive."""
    return df.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")


@register(
    "text_tokenize_stats",
    "text",
    oracle="""
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tokens,
               len(list_distinct(string_split(lower(text), ' '))) AS n_unique,
               n_chars
        FROM documents
    """,
    notes="per-doc token counts — the quality-scoring base (token counting north star)",
)
def text_tokenize_stats(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        "n_chars",
    )


@register(
    "text_word_freq",
    "text",
    oracle="""
        SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
              FROM documents)
        WHERE token <> ''
        GROUP BY token
    """,
    notes="corpus word frequency: explode → two-phase hash agg (partial combine bounds shuffle)",
)
def text_word_freq(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return tokens(d).groupBy("token").agg(
        F.count("*").alias("freq"),
        F.countDistinct("doc_id").alias("df"),
    )


@register(
    "text_tfidf_topterms",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf
            FROM toks WHERE token <> '' GROUP BY doc_id, token
        ),
        df AS (
            SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.token,
                   ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
            FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
        )
        SELECT doc_id, token, tfidf FROM (
            SELECT doc_id, token, tfidf,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, token ASC) AS rn
            FROM scored
        ) WHERE rn <= 3
    """,
    notes="pure-DF tf-idf, top-3 terms per doc; df-table joined (broadcast-able: |vocab| bounded)",
)
def text_tfidf_topterms(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tf = tokens(d).groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()  # scalar dim; literal below, not a driver-side loop
    scored = tf.join(df_tbl, "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.select("doc_id", "token", "tfidf", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "text_lang_partition",
    "text",
    oracle="""
        SELECT lang, source, COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 2) AS avg_chars,
               MIN(doc_id) AS min_doc
        FROM documents
        GROUP BY lang, source
    """,
    notes="per-language/source corpus slicing (multilingual pipeline stat)",
)
def text_lang_partition(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.min("doc_id").alias("min_doc"),
    )


@register(
    "text_lang_id",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        marker AS (
            SELECT lang AS m_lang, token, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY token ORDER BY COUNT(*) DESC, lang ASC) AS rn
            FROM toks WHERE token <> ''
            GROUP BY lang, token
        ),
        votes AS (
            SELECT t.doc_id, t.lang AS true_lang, m.m_lang,
                   COUNT(*) AS votes,
                   ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                      ORDER BY COUNT(*) DESC, m.m_lang ASC) AS rn
            FROM toks t JOIN (SELECT token, m_lang FROM marker WHERE rn = 1) m
              ON t.token = m.token
            GROUP BY t.doc_id, t.lang, m.m_lang
        )
        SELECT doc_id, true_lang, m_lang AS pred_lang, votes
        FROM votes WHERE rn = 1
    """,
    notes=(
        "language-ID heuristic: each token votes for the language it is most "
        "frequent in; per-doc plurality wins. Self-trained marker table is an "
        "aggregate join (broadcast-able vocab) — the n-gram-profile langid "
        "pattern expressed relationally"
    ),
)
def text_lang_id(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    w_tok = Window.partitionBy("token").orderBy(F.col("cnt").desc(), F.col("lang").asc())
    marker = (
        toks.groupBy("lang", "token")
        .agg(F.count("*").alias("cnt"))
        .select("lang", "token", F.row_number().over(w_tok).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(F.col("token").alias("m_token"), F.col("lang").alias("m_lang"))
    )
    votes = (
        toks.join(marker, toks.token == marker.m_token)
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "m_lang")
        .agg(F.count("*").alias("votes"))
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.col("votes").desc(), F.col("m_lang").asc())
    return (
        votes.select(
            "doc_id", "true_lang", F.col("m_lang").alias("pred_lang"), "votes",
            F.row_number().over(w_doc).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "text_quality_score",
    "text",
    oracle="""
        WITH s AS (
            SELECT doc_id, n_chars,
                   len(string_split(lower(text), ' ')) AS n_tokens,
                   len(list_distinct(string_split(lower(text), ' '))) AS n_unique
            FROM documents
        )
        SELECT doc_id, n_tokens,
               ROUND(CAST(n_unique AS DOUBLE) / n_tokens, 4) AS uniq_ratio,
               ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 4) AS avg_token_len,
               (n_tokens >= 10 AND CAST(n_unique AS DOUBLE) / n_tokens >= 0.3) AS passes
        FROM s
    """,
    notes="doc quality scoring: repetition + length heuristics (pretraining-filter shape)",
)
def text_quality_score(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    base = d.select(
        "doc_id",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )
    uniq_ratio = F.col("n_unique").cast("double") / F.col("n_tokens")
    return base.select(
        "doc_id",
        "n_tokens",
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 4).alias("avg_token_len"),
        ((F.col("n_tokens") >= 10) & (uniq_ratio >= 0.3)).alias("passes"),
    )


@register(
    "text_fingerprint",
    "text",
    oracle="""
        SELECT doc_id,
               md5(list_aggregate(list_sort(list_distinct(
                   string_split(lower(text), ' '))), 'string_agg', '|')) AS fingerprint
        FROM documents
    """,
    notes=(
        "order-insensitive document fingerprint: md5 of the sorted unique "
        "token set (md5 is bit-identical across engines; the rolling-hash "
        "variant for streaming chunking lives in tests/test_text.py)"
    ),
)
def text_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    canon = F.array_join(F.array_sort(F.array_distinct(F.split(F.lower("text"), " "))), "|")
    return d.select("doc_id", F.md5(canon).alias("fingerprint"))


@register(
    "pipeline_decontamination",
    "text",
    oracle="""
        WITH tk AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                    FROM documents),
        st AS (SELECT doc_id, t,
                      unnest(generate_series(1, greatest(len(t) - 7, 0))) AS s
               FROM tk),
        ng AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(t, s, s + 7), ' ') AS ngram
               FROM st),
        bench AS (SELECT ngram, doc_id AS bench_id FROM ng
                  WHERE doc_id % 10 = 0),
        train AS (SELECT doc_id, ngram FROM ng WHERE doc_id % 10 <> 0)
        SELECT t.doc_id,
               COUNT(DISTINCT t.ngram) AS n_shared_ngrams,
               COUNT(DISTINCT b.bench_id) AS n_bench_docs
        FROM train t JOIN bench b ON t.ngram = b.ngram
        GROUP BY t.doc_id
    """,
    notes=(
        "train/eval DECONTAMINATION (LLM-pipeline staple: training "
        "corpora must not contain benchmark text — the standard check is "
        "8-gram overlap, as used by public LLM training reports): the "
        "deterministic doc_id%10==0 slice plays the benchmark set (a 10% "
        "holdout; the 1% slice was probed vacuous — zero overlaps); every "
        "training doc sharing at least one lowercase 8-gram with any "
        "benchmark doc is reported with its overlap breadth (distinct "
        "shared 8-grams, distinct benchmark docs hit). Shape: row-local "
        "n-gram explode on both sides (the chunker pattern), one "
        "equi-join on xxhash64(n-gram) — grams are equality-only here, so "
        "the join/distinct/countDistinct keys are 8-byte hashes, not "
        "~50-byte strings (round-15, guide §2.3; collision probability "
        "~|grams|²/2⁶⁴ — at 1e12 grams ≈ 2.7e-2 expected colliding pairs, "
        "orders of magnitude above any oracle-checked fixture) — "
        "partial+final agg; one distinct "
        "shuffle on (doc_id, gram-hash) bounds the join input; at 100 TB the "
        "benchmark side is tiny and broadcast, so the JOIN adds no corpus "
        "shuffle (the contamination join every training pipeline runs). "
        "Short docs (<8 tokens) emit no n-grams by construction "
        "(guarded sequence — Spark's sequence(1,0) would count DOWN)"
    ),
)
def pipeline_decontamination(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    ng = (
        d.select("doc_id", toks.alias("tk"))
        .select(
            "doc_id",
            "tk",
            F.posexplode(
                F.when(
                    F.size("tk") >= 8, F.sequence(F.lit(1), F.size("tk") - 7)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos", "s"),
        )
        .select(
            "doc_id",
            # equality-only payload → shuffle/broadcast the 64-bit hash,
            # not the ~50-byte string (round-15, guide §2.3; the minhash
            # verify tokens-as-hashes discipline — collision probability
            # ~|grams|²/2⁶⁴ ≈ 0 at fixture scales)
            F.xxhash64(
                F.array_join(F.slice(F.col("tk"), F.col("s"), 8), " ")
            ).alias("ngram"),
        )
        .distinct()
    )
    bench = ng.filter(F.col("doc_id") % 10 == 0).select(
        F.col("ngram").alias("b_ngram"), F.col("doc_id").alias("bench_id")
    )
    train = ng.filter(F.col("doc_id") % 10 != 0)
    return (
        # size-conditional hint (round-15): the bench side is 10% of the
        # CORPUS's 8-grams — broadcast-sized at test scale, an executor
        # OOM at 100 TB. broadcast_if_small estimates from the source
        # footprint and falls back to a shuffle join on the hash key.
        train.join(
            _broadcast_if_small(spark, d, bench), train.ngram == bench.b_ngram
        )
        .groupBy("doc_id")
        .agg(
            F.countDistinct("ngram").alias("n_shared_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


@register(
    "text_chunk_sliding",
    "text",
    oracle="""
        WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
                      FROM documents),
        st AS (SELECT doc_id, tk,
                      unnest(generate_series(1, len(tk), 40)) AS start
               FROM toks),
        ch AS (SELECT doc_id,
                      CAST((start - 1) // 40 AS INT) AS chunk_id,
                      list_slice(tk, start, least(start + 49, len(tk))) AS chunk
               FROM st)
        SELECT doc_id, chunk_id, len(chunk) AS n_chunk_tokens,
               array_to_string(chunk, ' ') AS chunk_text
        FROM ch
    """,
    notes=(
        "sliding-window document chunking (LLM-pipeline staple: fixed-size "
        "token windows with overlap feed embedding/training stages): 50-"
        "token windows, stride 40 (10-token overlap) per document → "
        "(doc_id, chunk_id, n_chunk_tokens, chunk_text). Entirely "
        "scan-local — tokenize, sequence of starts, posexplode, slice, "
        "rejoin are all row-local (ZERO shuffles; embarrassingly parallel "
        "at any corpus size, the chunker shape a 100 TB pipeline needs). "
        "Oracle: generate_series over token counts + list_slice in DuckDB "
        "— the same windows by construction"
    ),
)
def text_chunk_sliding(spark, sf_dir, window: int = 50, stride: int = 40):
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    starts = d.select("doc_id", toks.alias("tk")).select(
        "doc_id",
        "tk",
        F.posexplode(F.sequence(F.lit(1), F.size("tk"), F.lit(stride))).alias(
            "chunk_id", "start"
        ),
    )
    chunk = F.slice(F.col("tk"), F.col("start"), window)
    return starts.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@register(
    "dedup_exact_norm",
    "text",
    oracle="""
        SELECT doc_id, lang, source FROM (
            SELECT doc_id, lang, source,
                   ROW_NUMBER() OVER (PARTITION BY trim(lower(text))
                                      ORDER BY doc_id ASC) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    notes="normalized exact dedup keeping min doc_id per normalized text (north-star baseline)",
)
def dedup_exact_norm(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy(F.trim(F.lower("text"))).orderBy(F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "pipeline_corpus_curation",
    "text",
    oracle="""
        WITH s AS (
            SELECT doc_id, lang, source,
                   len(string_split(lower(text), ' ')) AS n_tokens,
                   len(list_distinct(string_split(lower(text), ' '))) AS n_unique,
                   md5(list_aggregate(list_sort(list_distinct(
                       string_split(lower(text), ' '))), 'string_agg', '|')) AS fp
            FROM documents
        ),
        q AS (
            SELECT *, (n_tokens >= 10 AND CAST(n_unique AS DOUBLE) / n_tokens >= 0.3)
                       AS passes
            FROM s
        ),
        ranked AS (
            SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM q WHERE passes
        ),
        labeled AS (
            SELECT q.lang, q.source, q.n_tokens,
                   CASE WHEN NOT q.passes THEN 'drop_quality'
                        WHEN r.rn = 1 THEN 'keep'
                        ELSE 'drop_dup' END AS status
            FROM q LEFT JOIN ranked r ON q.doc_id = r.doc_id
        )
        SELECT lang, source,
               CAST(SUM(CASE WHEN status = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS kept,
               CAST(SUM(CASE WHEN status = 'drop_quality' THEN 1 ELSE 0 END) AS BIGINT)
                   AS dropped_quality,
               CAST(SUM(CASE WHEN status = 'drop_dup' THEN 1 ELSE 0 END) AS BIGINT)
                   AS dropped_dup,
               CAST(SUM(CASE WHEN status = 'keep' THEN n_tokens ELSE 0 END) AS BIGINT)
                   AS kept_tokens
        FROM labeled
        GROUP BY lang, source
    """,
    notes=(
        "end-to-end training-corpus curation (north-star pipeline shape): "
        "quality gate (length + repetition) → order-insensitive exact dedup "
        "on the token-set fingerprint keeping min doc_id → per-(lang, "
        "source) curation report with kept-token budget. Every stage is "
        "scan-local except one window on the fingerprint (the dedup "
        "shuffle) and the final partial agg — the shape a 100 TB curation "
        "job would run"
    ),
)
def pipeline_corpus_curation(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), "|")).alias("fp"),
    )
    passes = (F.col("n_tokens") >= 10) & (
        F.col("n_unique").cast("double") / F.col("n_tokens") >= 0.3
    )
    q = base.withColumn("passes", passes)
    w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
    ranked = q.filter("passes").select("doc_id", F.row_number().over(w).alias("rn"))
    labeled = q.join(ranked, "doc_id", "left").select(
        "lang",
        "source",
        "n_tokens",
        F.when(~F.col("passes"), F.lit("drop_quality"))
        .when(F.col("rn") == 1, F.lit("keep"))
        .otherwise(F.lit("drop_dup"))
        .alias("status"),
    )

    def n(status, expr=None):
        inner = F.when(F.col("status") == status, expr if expr is not None else F.lit(1)).otherwise(0)
        return F.sum(inner).cast("bigint")

    return labeled.groupBy("lang", "source").agg(
        n("keep").alias("kept"),
        n("drop_quality").alias("dropped_quality"),
        n("drop_dup").alias("dropped_dup"),
        n("keep", F.col("n_tokens")).alias("kept_tokens"),
    )


# Per-language acceptance rates rebalancing the en-heavy fixture corpus
# toward uniform. Thresholds are PRE-COMPUTED 32-bit integers (rate·2³²),
# so neither engine does any float math in the accept test.
_MIX_RATES = {"en": 0.3, "de": 0.9, "es": 0.9, "fr": 1.0, "zh": 0.85}
_MIX_THRESHOLDS = {lang: int(rate * 2**32) for lang, rate in _MIX_RATES.items()}


def deterministic_mix_sample(d, thresholds=None):
    """Hash-threshold language-mix sampling: keep doc iff u32(doc_id) < thr[lang].

    u32 = first 8 hex chars of md5(doc_id) — a deterministic uniform draw
    per document, identical in any engine and on any re-run. Selection is a
    SCAN-LOCAL filter: no shuffle, no state, no sort — the only pattern
    that stays reproducible AND restart-safe when mixing a 100 TB corpus
    (rank-based quota sampling needs a per-language global sort). Rates are
    monotone by construction: lowering a threshold yields a strict subset.
    """
    thresholds = thresholds or _MIX_THRESHOLDS
    u32 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    thr = F.lit(0).cast("long")
    for lang, t_int in thresholds.items():
        thr = F.when(F.col("lang") == lang, F.lit(t_int).cast("long")).otherwise(thr)
    return (
        d.select("doc_id", "lang", u32.alias("u32"), thr.alias("thr"))
        .filter(F.col("u32") < F.col("thr"))
        .select("doc_id", "lang", "u32")
    )


_MIX_CASE = " ".join(
    f"WHEN '{lang}' THEN {t_int}" for lang, t_int in sorted(_MIX_THRESHOLDS.items())
)


@register(
    "pipeline_sampling_mix",
    "text",
    oracle=f"""
        SELECT doc_id, lang,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u32
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              < CASE lang {_MIX_CASE} ELSE 0 END
    """,
    notes=(
        "deterministic training-mix sampling (north-star pipeline op): "
        "per-language acceptance via u32(doc_id) < rate·2³² where u32 is an "
        "md5-derived uniform draw — integer thresholds, zero float math. "
        "The selection is a scan-local filter (no shuffle/sort/state): the "
        "reproducible, restart-safe way to rebalance a 100 TB corpus, vs "
        "rank-quota sampling which needs a per-language global sort. "
        "Monotone in the rate (lower rate ⇒ strict subset — unit-tested), "
        "so mixes can be tuned without resampling churn. The oracle "
        "recomputes the identical draw in DuckDB, so the exact selected "
        "set is hash-verified, not just its size"
    ),
)
def pipeline_sampling_mix(spark, sf_dir):
    return deterministic_mix_sample(t(spark, sf_dir, "documents"))


@register(
    "sim_containment",
    "text",
    oracle="""
        WITH toks AS (
            SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                FROM documents WHERE doc_id < 200
            )
        ),
        rare AS (SELECT token FROM toks GROUP BY token HAVING COUNT(*) <= 20),
        rt AS (SELECT t.doc_id, t.token FROM toks t JOIN rare r ON t.token = r.token),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM rt GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM rt a JOIN rt b ON a.token = b.token AND a.doc_id <> b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               FLOOR(CAST(i AS DOUBLE) / sa.sz * 10000 + 0.5) / 10000 AS containment
        FROM inter JOIN sizes sa ON sa.doc_id = doc_a
        WHERE CAST(i AS DOUBLE) / sa.sz >= 0.9
    """,
    notes=(
        "token-set containment |A∩B|/|A| (north-star near-dup family: the "
        "ASYMMETRIC measure — detects quotes/subsets that Jaccard misses "
        "because a small doc inside a big one has low union overlap). "
        "Head terms with document frequency > 20 are pruned before the "
        "inverted-index pair join — the standard stopword cut, and the "
        "move that keeps posting-list fanout bounded at corpus scale "
        "(common-token postings are the quadratic hazard of every "
        "inverted-index join; at 100 TB the df cap is per-partition-"
        "estimable and the pair stage runs on LSH candidates instead of a "
        "slice). Ordered pairs: (doc_a contained-in doc_b) and the reverse "
        "are distinct rows. Subset-bounded like all O(n²) verify ops"
    ),
)
def sim_containment(spark, sf_dir, max_df: int = 20, threshold: float = 0.9):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower("text"), " "))).alias("token")
    )
    rare = (
        toks.groupBy("token")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("token")
    )
    rt = toks.join(rare, "token")
    sizes = rt.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = rt.alias("a"), rt.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    c = F.col("i") / F.col("sz")
    return (
        inter.join(sizes, inter.doc_a == sizes.doc_id)
        .filter(c >= threshold)
        .select(
            "doc_a",
            "doc_b",
            (F.floor(c * 10000 + F.lit(0.5)) / 10000).alias("containment"),
        )
    )


@register(
    "sim_pairwise_jaccard",
    "text",
    oracle="""
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents WHERE doc_id < 100
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.8
    """,
    notes=(
        "exact token-set Jaccard over candidate pairs (doc_id<100 slice): "
        "token-inverted-index self-join — the verify stage of MinHash-LSH. "
        "At 100 TB the pair join runs only on LSH candidates (dedup_minhash_lsh), "
        "never all-pairs; hot tokens would be df-capped (stopword pruning)"
    ),
)
def sim_pairwise_jaccard(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = tokens(d).distinct()
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("i").cast("double") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i"))
    return (
        inter.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(sb, F.col("sb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def _band_bucket_candidates(banded, cap: int = 512, stride: int = 256):
    """Candidate pairs from (doc_id, band, band_sig) rows, with degenerate
    buckets bounded: a bucket that exceeds ``cap`` members (a mass-duplicate
    cluster — common in web crawl, absent from the fixtures, whose largest
    band bucket is ~248 at sf0.1) would otherwise go quadratic in the
    self-join. Instead of a hard top-``cap`` truncation (which would silently
    drop true pairs and break the exhaustive-Jaccard oracle), each band keeps
    a SLIDING WINDOW of the bucket's doc_id-ordered members — band b keeps
    ranks (b·stride, b·stride + cap] — so consecutive bands' windows overlap
    by ``cap − stride`` members and every kept pair chain is transitively
    connected. Guarantees, per bucket of size s:

    - s ≤ cap: all pairs emitted (the windows never bind) — exhaustive.
    - s > cap: per-band cost is ≤ cap² regardless of s, and all members up
      to rank n_bands·stride + cap (16 bands → 4,352) land in one connected
      pair-component, so the downstream dedup decision is unchanged; only
      the redundant within-cluster pair enumeration is thinned.

    Deterministic (rank = row_number over doc_id), one shuffle (the same
    band/band_sig exchange the join needs anyway).
    """
    # Round-15 shape change (same pair set, ~half the plan): the previous
    # form ran two windows (row_number + count) over the band exchange,
    # then SELF-JOINED the capped frame on (band, band_sig) — a broadcast
    # of the whole banded corpus plus a second evaluation of the window
    # chain. One groupBy materializes each bucket's doc_id-sorted member
    # array instead; the sliding member-window is a row-local slice()
    # (rank k in the window == position k in the sorted array), and the
    # within-bucket pairs expand row-locally via posexplode + slice —
    # no join, no broadcast, one exchange (the same band/band_sig
    # shuffle the window needed anyway). Arrays are bounded by the
    # bucket cap (≤512 members), so per-row memory is bounded at any
    # corpus size.
    buckets = banded.groupBy("band", "band_sig").agg(
        F.array_sort(F.collect_list("doc_id")).alias("ids")
    )
    kept = F.when(F.size("ids") <= cap, F.col("ids")).otherwise(
        F.slice("ids", F.col("band") * stride + 1, cap)
    )
    members = (
        buckets.select(kept.alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.posexplode("ids").alias("p", "doc_a"), F.col("ids"))
    )
    return (
        members.select(
            "doc_a",
            F.explode(F.expr("slice(ids, p + 2, size(ids))")).alias("doc_b"),
        )
        .distinct()
    )


@register(
    "dedup_minhash_lsh",
    "text",
    oracle="""
        WITH toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.9
    """,
    notes=(
        "MinHash+LSH near-dup pairs, exact-Jaccard-verified at θ=0.9: "
        "token→min(xxhash64(token,seed)) per 16 bands × 4 rows → band-bucket "
        "groupBy → candidate pairs → exact verify. Oracle is the exhaustive "
        "exact-Jaccard join (ground truth); the LSH path must recover every "
        "pair ≥ 0.9 (16×4 banding: P(miss|J=0.9) < 1e-6). The candidate "
        "generation — not all-pairs — is what survives 100 TB; degenerate "
        "band buckets (>512 members — mass-dup clusters) are bounded by "
        "overlapping per-band member windows that keep cost ≤ cap²/bucket "
        "while preserving transitive pair connectivity (see "
        "_band_bucket_candidates)"
    ),
)
def dedup_minhash_lsh(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return _minhash_pairs(spark, d, d)


def _minhash_pairs(spark, size_src, docs):
    """The MinHash+LSH verified-pair machinery over an arbitrary
    ``(doc_id, text)`` frame — shared by ``dedup_minhash_lsh`` (full
    corpus) and ``pipeline_curation_gated_first`` (quality-gated subset;
    the 100 TB ordering). ``size_src`` is the source table whose parquet
    footprint sizes the broadcast decision."""
    n_bands, rows_per_band = 16, 4
    d = docs

    # Per-doc distinct token array — the whole pipeline stays array-native
    # (docs here are short; explode-joins benchmarked 2-4× slower at sf0.1).
    doc_toks = d.select(
        "doc_id", F.array_distinct(F.split(F.lower("text"), " ")).alias("toks")
    ).select("doc_id", "toks", F.size("toks").alias("sz"))

    # Tokens are hashed ONCE (one HOF pass — the verify stage needs the
    # hashed arrays anyway); the 64 minhashes + band signatures are ONE
    # numpy pass per Arrow batch. The previous form ran 64 separate
    # array_min(transform(xxhash64)) expressions — interpreted per element
    # (higher-order-function lambdas get no codegen; the round-3 systemic
    # finding), ~3 s of the op at sf0.1 vs <0.5 s here. Signatures are
    # engine-internal (the oracle is exact Jaccard), so the hash family is
    # free: minhash_i(t) = a_i·xxhash64(t) + b_i over Z/2⁶⁴ (multiply-shift
    # universal hashing — same MinHash collision guarantees), band sig =
    # the band's 4 minhashes folded with distinct odd multipliers. Still
    # row-local: no shuffle before band bucketing (plan-asserted).
    import numpy as np

    rng = np.random.default_rng(1234)
    n_hashes = n_bands * rows_per_band
    A = (rng.integers(0, 2**63, n_hashes, dtype=np.int64).astype(np.uint64) << 1) | 1
    B = rng.integers(0, 2**63, n_hashes, dtype=np.int64).astype(np.uint64)
    FOLD = (rng.integers(0, 2**63, rows_per_band, dtype=np.int64).astype(np.uint64) << 1) | 1

    def band_sigs(batches):
        # Vectorized across the WHOLE batch (round-15, guide §4.2): the
        # previous form looped doc-by-doc in Python — and the documents
        # scan is one split at test scale, so 50k iterations ran on a
        # single core. Now every doc's hash array is concatenated once and
        # each of the 64 minhash rows is one multiply-add over the flat
        # array + a segmented min (np.minimum.reduceat over the doc
        # offsets). Same uint64 wraparound arithmetic element-for-element,
        # so every signature is bit-identical; tokenless docs are filtered
        # before the offsets (reduceat needs non-empty segments), matching
        # the old per-doc skip.
        import pandas as pd

        for pdf in batches:
            arrs = [
                np.asarray(h, dtype=np.int64).astype(np.uint64) for h in pdf["hs"]
            ]
            keep = [i for i, h in enumerate(arrs) if len(h)]
            if not keep:
                yield pd.DataFrame(
                    {"doc_id": [], "band": [], "band_sig": []}
                ).astype({"doc_id": "int64", "band": "int32", "band_sig": "int64"})
                continue
            ids = pdf["doc_id"].to_numpy()[keep]
            segs = [arrs[i] for i in keep]
            lens = np.fromiter((len(h) for h in segs), dtype=np.int64)
            offs = np.zeros(len(segs), dtype=np.int64)
            np.cumsum(lens[:-1], out=offs[1:])
            hcat = np.concatenate(segs)
            mins = np.empty((n_hashes, len(segs)), dtype=np.uint64)
            for j in range(n_hashes):
                mins[j] = np.minimum.reduceat(A[j] * hcat + B[j], offs)
            folded = (
                mins.reshape(n_bands, rows_per_band, len(segs))
                * FOLD[None, :, None]
            ).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(segs)),
                    "band_sig": folded.T.reshape(-1).astype(np.int64),
                }
            )

    # Materialize the hashed-token fingerprint table ONCE (round-15, guide
    # §8 "decide with small rows"): without this the tokenize+hash pass ran
    # FOUR times per invocation — the band-bucket self-join computes its
    # whole subtree twice (plan-verified: two full scan→transform→
    # MapInPandas→Exchange→Window chains), and the verify join's a/b sides
    # re-tokenized twice more. One narrow (doc_id, int64[] hashes, sz)
    # checkpoint feeds banding AND both verify sides; only 64-bit hashes are
    # held, never the text.
    hashed = doc_toks.select(
        "doc_id", F.transform("toks", lambda x: F.xxhash64(x)).alias("toks"), "sz"
    )
    pin = _FP_PIN_MODE
    if pin == "auto":
        from mimranalytics_core_spark.functions.hints import source_rows

        rows = source_rows(size_src)
        limit = int(spark.conf.get(_FP_PIN_ROWS_CONF, str(_FP_PIN_ROWS_DEFAULT)))
        pin = "eager" if rows is not None and rows <= limit else "off"
    if pin != "off":
        hashed = hashed.localCheckpoint(eager=(pin == "eager"))
    banded = hashed.select("doc_id", F.col("toks").alias("hs")).mapInPandas(
        band_sigs, schema="doc_id long, band int, band_sig long"
    )
    candidates = _band_bucket_candidates(banded)
    # Exact-Jaccard verify per candidate pair via array_intersect — scalar
    # codegen over two short arrays, no token-explode join. Tokens are
    # compared as 64-bit hashes (cheaper than string equality; collision
    # probability ~|toks|²/2⁶⁴ ≈ 0).
    #
    # Broadcast is SIZE-CONDITIONAL: the hashed-token corpus is |docs|-sized
    # and fits in one executor at test scale, but at 100 TB it cannot be
    # broadcast — an unconditional hint would OOM every executor. Estimate
    # the corpus from the source parquet footprint; over threshold, leave the
    # join unhinted so it runs as a shuffle join on doc_id (and AQE may still
    # locally broadcast genuinely-small sides at runtime).
    hint = _broadcast_if_small(spark, size_src, hashed)
    a = hint.select(
        F.col("doc_id").alias("a_id"), F.col("toks").alias("a_toks"), F.col("sz").alias("a_sz")
    )
    b = hint.select(
        F.col("doc_id").alias("b_id"), F.col("toks").alias("b_toks"), F.col("sz").alias("b_sz")
    )
    paired = candidates.join(a, F.col("doc_a") == F.col("a_id")).join(
        b, F.col("doc_b") == F.col("b_id")
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    jac = inter.cast("double") / (F.col("a_sz") + F.col("b_sz") - inter)
    return (
        paired.select("doc_a", "doc_b", jac.alias("jac"))
        .filter(F.col("jac") >= 0.9)
        .select("doc_a", "doc_b", F.round("jac", 4).alias("jaccard"))
    )


@register(
    "text_repetition_score",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, n_chars, string_split(lower(text), ' ') AS tk
            FROM documents
        ),
        base AS (
            SELECT doc_id, n_chars,
                   len(tk) AS n_tokens,
                   len(list_distinct(tk)) AS n_unique,
                   CASE WHEN len(tk) >= 2
                        THEN list_transform(generate_series(1, len(tk) - 1),
                                            i -> tk[i] || ' ' || tk[i + 1])
                        ELSE [] END AS bg
            FROM toks
        ),
        bgf AS (
            SELECT doc_id, MAX(c) AS max_bigram
            FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(bg) AS b FROM base)
                GROUP BY doc_id, b
            )
            GROUP BY doc_id
        )
        SELECT b.doc_id AS doc_id,
               b.n_tokens AS n_tokens,
               FLOOR((1.0 - b.n_unique * 1.0 / b.n_tokens) * 1000000.0 + 0.5)
                   / 1000000.0 AS dup_token_ratio,
               FLOOR((2.0 * COALESCE(f.max_bigram, 0) / b.n_tokens) * 1000000.0 + 0.5)
                   / 1000000.0 AS top_bigram_frac,
               CASE WHEN (1.0 - b.n_unique * 1.0 / b.n_tokens) > 0.6
                         OR (2.0 * COALESCE(f.max_bigram, 0) / b.n_tokens) > 0.2
                    THEN TRUE ELSE FALSE END AS repetitive
        FROM base b LEFT JOIN bgf f ON f.doc_id = b.doc_id
    """,
    notes=(
        "Gopher-style repetition quality signals (Rae et al. 2021 §A1.1, "
        "public): duplicate-token ratio and fraction of tokens covered by "
        "the most frequent bigram, per doc. Row-local array math (no "
        "explode for the dup ratio; bigram counts explode but re-aggregate "
        "on doc_id — the partial agg keeps the shuffle narrow). The "
        "`repetitive` gate is the curation filter a 100 TB pipeline "
        "applies scan-side before any dedup shuffle"
    ),
)
def text_repetition_score(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.lower("text"), " ")
    base = d.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        F.size(F.array_distinct(tk)).alias("n_unique"),
        # bigrams via zip_with(tk, tk[2:]): the arrays are evaluated once
        # per ROW. The transform(sequence(...), i -> element_at(tk_expr, i))
        # formulation re-evaluates the split() inside the lambda per
        # ELEMENT — O(tokens²) per doc, measured 9.3 s vs 0.6 s for the
        # full materialization at sf0.1. zip_with pads the shorter side
        # with nulls; concat propagates them; filter drops them.
        F.filter(
            F.zip_with(
                tk,
                F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
                lambda x, y: F.concat(x, F.lit(" "), y),
            ),
            lambda s: s.isNotNull(),
        ).alias("bg"),
    )
    bgf = (
        base.select("doc_id", F.explode("bg").alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bigram"))
    )
    dup = 1.0 - F.col("n_unique") * 1.0 / F.col("n_tokens")
    top = 2.0 * F.coalesce(F.col("max_bigram"), F.lit(0)) / F.col("n_tokens")
    return (
        base.join(bgf, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.floor(dup * 1e6 + F.lit(0.5)) / 1e6).alias("dup_token_ratio"),
            (F.floor(top * 1e6 + F.lit(0.5)) / 1e6).alias("top_bigram_frac"),
            ((dup > 0.6) | (top > 0.2)).alias("repetitive"),
        )
    )


@register(
    "text_lm_unigram_score",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tokf AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        freq AS (SELECT token, COUNT(*) AS f FROM tokf GROUP BY token),
        tot AS (SELECT SUM(f) AS total FROM freq),
        scored AS (
            SELECT t.doc_id,
                   FLOOR(LN(fr.f * 1.0 / tot.total) * 1000000000.0 + 0.5)
                       / 1000000000.0 AS lp
            FROM tokf t JOIN freq fr ON fr.token = t.token CROSS JOIN tot
        )
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               FLOOR(AVG(lp) * 1000000.0 + 0.5) / 1000000.0 AS avg_logprob
        FROM scored
        GROUP BY doc_id
    """,
    notes=(
        "corpus-fit scoring: per-doc mean log-probability under the "
        "corpus's own unigram LM — the classic cheap perplexity proxy for "
        "quality filtering (CCNet-style, public). Two passes: corpus freq "
        "table (partial-agg'd, vocab-sized -> broadcast join), then "
        "explode-join-agg per doc. Per-token log is dround'd to 9 digits "
        "BEFORE the avg so the cross-engine sum runs over identical "
        "decimals; the final 6-digit dround absorbs summation-order ulps"
    ),
)
def text_lm_unigram_score(spark, sf_dir):
    from mimranalytics_core_spark.operators.text import tokens as _tokens

    d = t(spark, sf_dir, "documents")
    tk = _tokens(d)
    freq = tk.groupBy("token").agg(F.count("*").alias("f"))
    total = freq.agg(F.sum("f")).collect()[0][0]  # scalar dim, folded as a literal
    lp = F.floor(F.log(F.col("f") * 1.0 / F.lit(float(total))) * 1e9 + F.lit(0.5)) / 1e9
    scored = tk.join(_broadcast_if_small(spark, d, freq), "token").select("doc_id", lp.alias("lp"))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        (F.floor(F.avg("lp") * 1e6 + F.lit(0.5)) / 1e6).alias("avg_logprob"),
    )


@register(
    "dedup_canonical_docs",
    "text",
    oracle="""
        WITH RECURSIVE toks AS (
            SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM toks a JOIN toks b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.9
        ),
        e2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM e2)
            UNION
            SELECT e2.a, r.lab FROM reach r JOIN e2 ON e2.b = r.node
        ),
        lbl AS (SELECT node, MIN(lab) AS canonical_id FROM reach GROUP BY node)
        SELECT node AS doc_id, canonical_id,
               COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
        FROM lbl
    """,
    notes=(
        "end-to-end near-dup CANONICALIZATION — the step a 100 TB curation "
        "pipeline actually ships: MinHash-LSH verified pairs (exactly the "
        "dedup_minhash_lsh stage) -> connected components over the pair "
        "graph (min-label Pregel; transitive closure of near-dup-ness) -> "
        "canonical doc = min doc_id per cluster. Keep doc_id==canonical_id "
        "rows, drop the rest. The pair graph holds only docs WITH a "
        "duplicate (corpus-sized graphs never materialize); the oracle is "
        "the exhaustive exact-Jaccard pair set closed by a recursive "
        "min-label CTE — certifying pairs, clustering, AND canonical "
        "choice in one hash"
    ),
)
def dedup_canonical_docs(spark, sf_dir):
    return _canonicalize(dedup_minhash_lsh(spark, sf_dir))


def _canonicalize(pairs):
    """Near-dup pair graph → connected components → canonical id (min
    doc_id per cluster) + cluster size. Shared by ``dedup_canonical_docs``
    and ``pipeline_curation_gated_first``."""
    from mimranalytics_core_spark.functions.graph_algos import connected_components

    # Star contraction before the Pregel loop: the near-dup pair graph is
    # clique-heavy (mass-dup clusters emit O(cap²) pairs per bucket — 288k
    # edges for 2.9k nodes at sf0.1), so label propagation over the RAW
    # edge set pays ~10 supersteps × a 0.5M-row join. Contracting each node
    # to min(self, neighbors) first collapses cliques to (near-)single
    # nodes in ONE agg pass; CC then runs on the tiny contracted graph
    # (chain remnants only). Correctness: l0(v) ≤ v and the component's
    # global min m has l0(m) = m, so min over contracted labels = m — the
    # same canonical choice. Measured 10.6 s → ~6 s at sf0.1.
    e2 = (
        # explode-symmetrize (round-15): the union-of-two-selects form
        # evaluated the whole MinHash pair pipeline TWICE inside this one
        # checkpoint job — one pass emits both directions per pair row
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
                    F.struct(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        # materialize ONCE: l0 and the contraction both consume e2 — without
        # this the whole MinHash pipeline upstream is recomputed per consumer
        .localCheckpoint(eager=True)
    )
    l0 = (
        e2.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("lab"))
        .localCheckpoint(eager=True)  # two downstream joins + the final map
    )
    la = l0.select(F.col("a").alias("a"), F.col("lab").alias("la"))
    lb = l0.select(F.col("a").alias("b"), F.col("lab").alias("lb"))
    contracted = (
        e2.join(la, "a")
        .join(lb, "b")
        .filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("src"), F.col("lb").alias("dst"))
        .distinct()
    )
    # (a second contraction round was A/B'd: its two extra eager
    # checkpoints cost more than the saved Pregel supersteps at this scale
    # — 9.6 s vs 8.8 s warm; one round + CC is the measured optimum)
    comp = connected_components(contracted, max_iter=12, state_partitions=8)
    final = (
        l0.join(comp, l0.lab == comp.node, "left")
        .select(
            F.col("a").alias("doc_id"),
            F.coalesce(F.col("component"), F.col("lab")).alias("canonical_id"),
        )
    )
    w = Window.partitionBy("canonical_id")
    return final.select(
        "doc_id", "canonical_id", F.count("*").over(w).alias("cluster_size")
    )


@register(
    "pipeline_curation_end2end",
    "text",
    oracle="""
        WITH RECURSIVE jtoks AS (
            SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM jtoks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM jtoks a JOIN jtoks b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.9
        ),
        e2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM e2)
            UNION
            SELECT e2.a, r.lab FROM reach r JOIN e2 ON e2.b = r.node
        ),
        lbl AS (SELECT node, MIN(lab) AS canonical_id FROM reach GROUP BY node),
        rtoks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
        ),
        rbase AS (
            SELECT doc_id, len(tk) AS n_tokens, len(list_distinct(tk)) AS n_unique,
                   CASE WHEN len(tk) >= 2
                        THEN list_transform(generate_series(1, len(tk) - 1),
                                            i -> tk[i] || ' ' || tk[i + 1])
                        ELSE [] END AS bg
            FROM rtoks
        ),
        bgf AS (
            SELECT doc_id, MAX(c) AS max_bigram
            FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(bg) AS b FROM rbase)
                GROUP BY doc_id, b
            )
            GROUP BY doc_id
        ),
        rep AS (
            SELECT b.doc_id, b.n_tokens,
                   ((1.0 - b.n_unique * 1.0 / b.n_tokens) > 0.6
                    OR (2.0 * COALESCE(f.max_bigram, 0) / b.n_tokens) > 0.2)
                       AS repetitive
            FROM rbase b LEFT JOIN bgf f ON f.doc_id = b.doc_id
        ),
        kept AS (
            SELECT r.doc_id, r.n_tokens
            FROM rep r LEFT JOIN lbl ON lbl.node = r.doc_id
            WHERE NOT r.repetitive AND r.n_tokens >= 20
              AND (lbl.canonical_id IS NULL OR lbl.canonical_id = r.doc_id)
        )
        SELECT d.source AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(k.n_tokens) AS BIGINT) AS total_tokens
        FROM kept k JOIN documents d ON d.doc_id = k.doc_id
        GROUP BY d.source
    """,
    notes=(
        "the FLAGSHIP curation pipeline composed end-to-end: repetition "
        "quality gate -> length gate -> near-dup canonicalization (LSH "
        "pairs -> components -> keep canonical) -> per-source corpus "
        "accounting. Every stage is the already-oracle-checked operator; "
        "this op certifies their COMPOSITION in one hash. Ordering note "
        "(round-4 verdict): the declared semantics here are canonical "
        "among ALL docs (the gate applies to the KEPT set, not to which "
        "docs can canonicalize a cluster), so dedup_canonical_docs runs "
        "over the full corpus by construction — see "
        "pipeline_curation_gated_first for the gate-BEFORE-dedup "
        "ordering a 100 TB job would run, certified separately"
    ),
)
def pipeline_curation_end2end(spark, sf_dir):
    # Materialize the per-doc score table (narrow: 5 cols × |docs| rows)
    # before filtering: pushing `~repetitive` into the scan duplicates the
    # bigram transform() lambda into interpreted Filter nodes (HOF lambdas
    # get no codegen — the round-3 systemic finding), re-evaluating it ~3×
    # per row. Measured 9.5 s → 0.6 s for the filtered branch at sf0.1.
    rep = text_repetition_score(spark, sf_dir).localCheckpoint(eager=True)
    canon = dedup_canonical_docs(spark, sf_dir).select("doc_id", "canonical_id")
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    kept = (
        rep.filter((~F.col("repetitive")) & (F.col("n_tokens") >= 20))
        .join(canon, "doc_id", "left")
        .filter(F.col("canonical_id").isNull() | (F.col("canonical_id") == F.col("doc_id")))
    )
    return (
        kept.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "pipeline_curation_gated_first",
    "text",
    oracle="""
        WITH RECURSIVE rtoks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
        ),
        rbase AS (
            SELECT doc_id, len(tk) AS n_tokens, len(list_distinct(tk)) AS n_unique,
                   CASE WHEN len(tk) >= 2
                        THEN list_transform(generate_series(1, len(tk) - 1),
                                            i -> tk[i] || ' ' || tk[i + 1])
                        ELSE [] END AS bg
            FROM rtoks
        ),
        bgf AS (
            SELECT doc_id, MAX(c) AS max_bigram
            FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(bg) AS b FROM rbase)
                GROUP BY doc_id, b
            )
            GROUP BY doc_id
        ),
        gated AS (
            SELECT b.doc_id, b.n_tokens
            FROM rbase b LEFT JOIN bgf f ON f.doc_id = b.doc_id
            WHERE NOT ((1.0 - b.n_unique * 1.0 / b.n_tokens) > 0.6
                       OR (2.0 * COALESCE(f.max_bigram, 0) / b.n_tokens) > 0.2)
              AND b.n_tokens >= 20
        ),
        jtoks AS (
            SELECT DISTINCT d.doc_id,
                   unnest(string_split(lower(d.text), ' ')) AS token
            FROM documents d JOIN gated g ON g.doc_id = d.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM jtoks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
            FROM jtoks a JOIN jtoks b ON a.token = b.token AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ),
        pairs AS (
            SELECT doc_a, doc_b
            FROM inter
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.9
        ),
        e2 AS (SELECT doc_a AS a, doc_b AS b FROM pairs
               UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, lab) AS (
            SELECT a, a FROM (SELECT DISTINCT a FROM e2)
            UNION
            SELECT e2.a, r.lab FROM reach r JOIN e2 ON e2.b = r.node
        ),
        lbl AS (SELECT node, MIN(lab) AS canonical_id FROM reach GROUP BY node),
        kept AS (
            SELECT g.doc_id, g.n_tokens
            FROM gated g LEFT JOIN lbl ON lbl.node = g.doc_id
            WHERE lbl.canonical_id IS NULL OR lbl.canonical_id = g.doc_id
        )
        SELECT d.source AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(k.n_tokens) AS BIGINT) AS total_tokens
        FROM kept k JOIN documents d ON d.doc_id = k.doc_id
        GROUP BY d.source
    """,
    notes=(
        "the curation pipeline in the TRUE 100 TB stage order (round-4 "
        "verdict item 8): quality + length gates cut the corpus FIRST "
        "(scan-local filters — at scale they typically drop 30-60% of "
        "raw web data before any exchange), then MinHash-LSH dedup runs "
        "over only the survivors, then per-source accounting. Semantics "
        "genuinely differ from pipeline_curation_end2end: a cluster whose "
        "full-corpus canonical was gated out re-canonicalizes to the "
        "smallest SURVIVING doc_id here, so the kept set can differ — "
        "which is why both orderings carry their own oracle. The pair "
        "machinery (_minhash_pairs) and canonicalization (_canonicalize) "
        "are the same already-certified stages, parameterized by the "
        "gated frame"
    ),
)
def pipeline_curation_gated_first(spark, sf_dir):
    # gates first: the narrow score table is materialized once (HOF-lambda
    # duplication note on pipeline_curation_end2end applies identically)
    rep = text_repetition_score(spark, sf_dir).localCheckpoint(eager=True)
    gated = rep.filter(
        (~F.col("repetitive")) & (F.col("n_tokens") >= 20)
    ).select("doc_id", "n_tokens")
    d = t(spark, sf_dir, "documents")
    gated_docs = d.join(gated.select("doc_id"), "doc_id").select("doc_id", "text")
    canon = _canonicalize(_minhash_pairs(spark, d, gated_docs)).select(
        "doc_id", "canonical_id"
    )
    kept = gated.join(canon, "doc_id", "left").filter(
        F.col("canonical_id").isNull() | (F.col("canonical_id") == F.col("doc_id"))
    )
    return (
        kept.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


@register(
    "text_js_divergence",
    "text",
    oracle="""
        WITH toks AS (
            SELECT source, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tokf AS (SELECT source, token FROM toks WHERE token <> ''),
        sc AS (SELECT source, token, COUNT(*) AS n FROM tokf GROUP BY source, token),
        st AS (SELECT source, SUM(n) AS tot FROM sc GROUP BY source),
        cc AS (SELECT token, COUNT(*) AS n FROM tokf GROUP BY token),
        ct AS (SELECT SUM(n) AS tot FROM cc),
        grid AS (
            SELECT s.source, c.token,
                   COALESCE(sc.n, 0) * 1.0 / s.tot AS p,
                   c.n * 1.0 / ct.tot AS q
            FROM st s
            CROSS JOIN cc c
            CROSS JOIN ct
            LEFT JOIN sc ON sc.source = s.source AND sc.token = c.token
        ),
        terms AS (
            SELECT source,
                   FLOOR(((CASE WHEN p > 0
                                THEN 0.5 * p * LN(p / (0.5 * (p + q)))
                                ELSE 0.0 END)
                          + 0.5 * q * LN(q / (0.5 * (p + q))))
                         * 1000000000.0 + 0.5) / 1000000000.0 AS term
            FROM grid
        )
        SELECT source,
               FLOOR(SUM(term) * 1000000.0 + 0.5) / 1000000.0 AS js_divergence
        FROM terms GROUP BY source
    """,
    notes=(
        "Jensen-Shannon divergence of each source's unigram distribution "
        "from the corpus distribution — the domain-drift / mixture-"
        "monitoring metric a curation pipeline tracks per ingest source "
        "(public: Lin 1991). The source×vocab grid is |sources|·|vocab| "
        "(both bounded — vocab is a dimension, not the corpus); counts "
        "come from two partial-agg passes over the exploded tokens, and "
        "the grid joins are broadcast-sized. Per-term dround(9) before "
        "the sum, the engine's cross-engine float discipline"
    ),
)
def text_js_divergence(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = d.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token") != "")
    sc = tk.groupBy("source", "token").agg(F.count("*").alias("n"))
    st = sc.groupBy("source").agg(F.sum("n").alias("tot"))
    cc = tk.groupBy("token").agg(F.count("*").alias("cn"))
    ct = float(cc.agg(F.sum("cn")).collect()[0][0])  # scalar dim literal
    grid = (
        st.crossJoin(F.broadcast(cc))
        .join(
            sc.select("source", "token", "n"),
            ["source", "token"],
            "left",
        )
        .select(
            "source",
            "token",
            (F.coalesce(F.col("n"), F.lit(0)) * 1.0 / F.col("tot")).alias("p"),
            (F.col("cn") * 1.0 / F.lit(ct)).alias("q"),
        )
    )
    m = 0.5 * (F.col("p") + F.col("q"))
    term_expr = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + 0.5 * F.col("q") * F.log(F.col("q") / m)
    )
    term = F.floor(term_expr * 1e9 + F.lit(0.5)) / 1e9
    return (
        grid.select("source", term.alias("term"))
        .groupBy("source")
        .agg((F.floor(F.sum("term") * 1e6 + F.lit(0.5)) / 1e6).alias("js_divergence"))
    )


@register(
    "text_bm25_search",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        tokf AS (SELECT doc_id, token FROM toks WHERE token <> ''),
        dl AS (SELECT doc_id, COUNT(*) AS len FROM tokf GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(len) AS avg_len FROM dl),
        tf AS (
            SELECT doc_id, token, COUNT(*) AS tf FROM tokf
            WHERE token IN ('merge', 'scan', 'hash')
            GROUP BY doc_id, token
        ),
        df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        scored AS (
            SELECT tf.doc_id,
                   FLOOR(LN((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                         * (tf.tf * 2.2)
                         / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / s.avg_len))
                         * 1000000000.0 + 0.5) / 1000000000.0 AS term_score
            FROM tf
            JOIN df ON df.token = tf.token
            JOIN dl ON dl.doc_id = tf.doc_id
            CROSS JOIN stats s
        )
        SELECT doc_id,
               FLOOR(SUM(term_score) * 1000000.0 + 0.5) / 1000000.0 AS bm25
        FROM scored
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id ASC
        LIMIT 20
    """,
    notes=(
        "BM25 keyword retrieval (Robertson/Sparck Jones, k1=1.2 b=0.75, "
        "Lucene +1 idf) for the query {merge, scan, hash}: the lexical "
        "side of hybrid search (sim_rrf_fusion is the fusion machinery, "
        "sim_cosine_topk the dense side). Doc-length and df stats are "
        "dimension-sized aggregates folded in as broadcast joins; per-term "
        "scores dround(9) before the sum. Scan-and-score + TakeOrdered — "
        "the inverted-index-free form; at 100 TB the tf table IS the "
        "posting list, partitioned by token"
    ),
)
def text_bm25_search(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = tokens(d)
    dl = tk.groupBy("doc_id").agg(F.count("*").alias("len"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("len").alias("avg_len")).collect()[0]
    n_docs, avg_len = float(stats.n_docs), float(stats.avg_len)
    tf = (
        tk.filter(F.col("token").isin("merge", "scan", "hash"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("len") / F.lit(avg_len))
    term_score = F.floor(idf * (F.col("tf") * 2.2) / denom * 1e9 + F.lit(0.5)) / 1e9
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(dl, "doc_id")
        .select("doc_id", term_score.alias("term_score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg((F.floor(F.sum("term_score") * 1e6 + F.lit(0.5)) / 1e6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )


@register(
    "text_kwic",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
            WHERE doc_id < 100
        ),
        pos AS (
            SELECT doc_id, tk,
                   unnest(tk) AS tok,
                   generate_subscripts(tk, 1) AS p
            FROM toks
        )
        SELECT doc_id, p AS position,
               array_to_string(
                   list_slice(tk, GREATEST(p - 3, 1), LEAST(p + 3, len(tk))),
                   ' ') AS context
        FROM pos WHERE tok = 'hash'
    """,
    notes=(
        "keyword-in-context (KWIC) concordance for the term 'hash': every "
        "occurrence with a ±3-token window — the corpus-inspection tool "
        "behind every quality-filter debugging session. posexplode keeps "
        "the token ARRAY alongside the position so the context slice is "
        "array indexing, never a re-tokenization (the HOF re-evaluation "
        "lesson); row-local, zero shuffles"
    ),
)
def text_kwic(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = d.select("doc_id", F.split(F.lower("text"), " ").alias("tk"))
    pos = toks.select(
        "doc_id", "tk", F.posexplode("tk").alias("p0", "tok")
    ).filter(F.col("tok") == "hash")
    p = F.col("p0") + 1  # 1-based to match the oracle
    start = F.greatest(p - 3, F.lit(1))
    length = F.least(p + 3, F.size("tk")) - start + 1
    return pos.select(
        "doc_id",
        p.alias("position"),
        F.array_join(F.slice("tk", start, length), " ").alias("context"),
    )


@register(
    "text_pmi_bigrams",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
            FROM documents
        ),
        uni AS (SELECT unnest(tk) AS w FROM toks),
        uc AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY w),
        nu AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM uni),
        bg AS (
            SELECT unnest(CASE WHEN len(tk) >= 2
                               THEN list_transform(generate_series(1, len(tk) - 1),
                                                   i -> [tk[i], tk[i + 1]])
                               ELSE [] END) AS p
            FROM toks
        ),
        bc AS (SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c12 FROM bg GROUP BY p[1], p[2]),
        nb AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM bg)
        SELECT w1, w2, c12,
               FLOOR(LN((c12 * 1.0 / nb.n) /
                        ((u1.c * 1.0 / nu.n) * (u2.c * 1.0 / nu.n))) * 1e6 + 0.5)
                   / 1e6 AS pmi
        FROM bc
        JOIN uc u1 ON bc.w1 = u1.w
        JOIN uc u2 ON bc.w2 = u2.w
        CROSS JOIN nu CROSS JOIN nb
        WHERE c12 >= 5
        ORDER BY FLOOR(LN((c12 * 1.0 / nb.n) /
                          ((u1.c * 1.0 / nu.n) * (u2.c * 1.0 / nu.n))) * 1e6 + 0.5)
                     / 1e6 DESC,
                 w1 ASC, w2 ASC
        LIMIT 20
    """,
    notes=(
        "PMI collocation mining (Church & Hanks 1990, public — the "
        "association score behind phrase detection in every corpus "
        "pipeline): pmi(w1,w2) = ln(p(w1 w2)/(p(w1)p(w2))) over adjacent "
        "token pairs, support >= 5, top-20. Bigrams via the zip_with "
        "row-local pairing (the O(tokens) form — NOTES_r4 lesson), counts "
        "partial-agg'd; the two scalar totals ride a broadcast cross join. "
        "PMI args are exact int-ratio doubles in both engines, ln on "
        "identical bits, dround 6 with bigram tie-break — deterministic"
    ),
)
def text_pmi_bigrams(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    toks = d.select("doc_id", tk.alias("tk"))
    uni = toks.select(F.explode("tk").alias("w"))
    uc = uni.groupBy("w").agg(F.count("*").alias("c"))
    nu = uni.agg(F.count("*").cast("double").alias("nu"))
    bg = toks.select(
        F.explode(
            F.filter(
                F.zip_with(
                    F.col("tk"),
                    F.slice(F.col("tk"), 2, F.greatest(F.size("tk") - 1, F.lit(0))),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                ),
                lambda s: s.getField("w2").isNotNull(),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    nb = bg.agg(F.count("*").cast("double").alias("nb"))
    u1 = uc.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    pmi_raw = F.log(
        (F.col("c12") * 1.0 / F.col("nb"))
        / ((F.col("c1") * 1.0 / F.col("nu")) * (F.col("c2") * 1.0 / F.col("nu")))
    )
    pmi = F.floor(pmi_raw * 1e6 + F.lit(0.5)) / 1e6
    return (
        bc.filter(F.col("c12") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


@register(
    "text_zipf_slope",
    "text",
    oracle="""
        WITH toks AS (
            SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                AS w
            FROM documents
        ),
        freq AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
        ranked AS (
            SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS r FROM freq
        ),
        pts AS (
            SELECT FLOOR(LN(r) * 1e9 + 0.5) / 1e9 AS x,
                   FLOOR(LN(c) * 1e9 + 0.5) / 1e9 AS y
            FROM ranked WHERE r <= 100
        ),
        s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x * y) AS sxy, SUM(x * x) AS sxx
              FROM pts)
        SELECT CAST(n AS BIGINT) AS n_terms,
               FLOOR((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5) / 1e6
                   AS zipf_slope,
               FLOOR((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                     * 1e6 + 0.5) / 1e6 AS intercept
        FROM s
    """,
    notes=(
        "Zipf rank-frequency fit (public corpus-linguistics diagnostic — a "
        "natural corpus shows slope near -1; synthetic or degenerate text "
        "does not, so the slope is a cheap corpus-health gate for curation "
        "pipelines): OLS of ln(freq) on ln(rank) over the top-100 tokens. "
        "One explode + count shuffle, a 100-row ranked frame, one scalar "
        "aggregate — corpus-size independent after the count. Per-point "
        "ln values dround'd to 1e-9 before the sums (the lm_unigram "
        "sum-order discipline); slope/intercept dround 6"
    ),
)
def text_zipf_slope(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    freq = (
        d.select(F.explode(tk).alias("w")).groupBy("w").agg(F.count("*").alias("c"))
    )
    ranked = freq.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w")))
    ).filter(F.col("r") <= 100)
    pts = ranked.select(
        (F.floor(F.log(F.col("r").cast("double")) * 1e9 + F.lit(0.5)) / 1e9).alias("x"),
        (F.floor(F.log(F.col("c").cast("double")) * 1e9 + F.lit(0.5)) / 1e9).alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        (F.floor(slope * 1e6 + F.lit(0.5)) / 1e6).alias("zipf_slope"),
        (
            F.floor((F.col("sy") - slope * F.col("sx")) / F.col("n") * 1e6 + F.lit(0.5))
            / 1e6
        ).alias("intercept"),
    )


@register(
    "text_ngram_novelty",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk
            FROM documents
        ),
        ng AS (
            SELECT DISTINCT doc_id, g FROM (
                SELECT doc_id,
                       unnest(CASE WHEN len(tk) >= 8
                              THEN list_transform(generate_series(1, len(tk) - 7),
                                                  i -> array_to_string(tk[i:i+7], ' '))
                              ELSE [] END) AS g
                FROM toks)
        ),
        fo AS (SELECT g, MIN(doc_id) AS first_doc FROM ng GROUP BY g)
        SELECT ng.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_ngrams,
               CAST(SUM(CASE WHEN fo.first_doc = ng.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel,
               FLOOR(SUM(CASE WHEN fo.first_doc = ng.doc_id THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*) * 1e6 + 0.5) / 1e6 AS novelty_frac
        FROM ng JOIN fo ON ng.g = fo.g
        GROUP BY ng.doc_id
    """,
    notes=(
        "8-gram novelty fraction per document (the self-repetition screen "
        "of LLM corpus curation — Lee et al. 2022's dedup family, public: "
        "a doc whose 8-grams all appeared in earlier docs adds nothing to "
        "the training mix): distinct word-8-grams per doc, first-occurrence "
        "attributed by MIN doc_id, novelty = |first-occurrences|/|8-grams|. "
        "The 8-gram build is row-local over the MATERIALIZED token array "
        "(transform over sequence + slice — the array is a column, not a "
        "re-split expression: the NOTES_r4 HOF lesson); counts partial-agg "
        "on the ngram hash then on doc_id — the two-shuffle shape that "
        "holds at corpus scale, same as pipeline_decontamination"
    ),
)
def text_ngram_novelty(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), " "), lambda x: x != "").alias("tk"),
    )
    # Round-15 shuffle-bytes fix (guide §2.3 "shuffle keys, not payloads"):
    # the 8-gram is only ever compared for EQUALITY, so it shuffles as its
    # 64-bit xxhash64 instead of a ~50-byte string — the same
    # tokens-as-hashes discipline the minhash verify stage already uses
    # (collision probability ~|grams|²/2⁶⁴ ≈ 0 at fixture scales).
    grams = F.when(
        F.size("tk") >= 8,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 7),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(F.col("tk"), i, 8))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    ng = toks.select("doc_id", F.explode(grams).alias("g")).distinct()
    # No join-back on the gram key (round-15): a gram contributes one
    # novel-count to exactly its MIN doc, so per-doc totals and per-doc
    # novel counts are two independent narrow aggregates joined on the
    # DOC key — the old ng⋈first-occurrence join re-shuffled the whole
    # gram table a third time.
    sizes = ng.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_ngrams"))
    novel = (
        ng.groupBy("g")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return sizes.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_ngrams",
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        (
            F.floor(
                F.coalesce("n_novel", F.lit(0)) * 1.0 / F.col("n_ngrams") * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("novelty_frac"),
    )


@register(
    "pipeline_dataset_card",
    "pipeline",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, source,
                   list_filter(string_split(lower(text), ' '), x -> x <> '') AS tk,
                   lower(trim(text)) AS norm
            FROM documents
        ),
        flat AS (SELECT doc_id, unnest(tk) AS w FROM toks),
        dup AS (SELECT COUNT(*) AS dup_docs FROM (
                    SELECT norm FROM toks GROUP BY norm HAVING COUNT(*) > 1
                ) g JOIN toks USING (norm)),
        rep AS (SELECT COUNT(*) AS rep_docs FROM (
                    SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS u
                    FROM toks)
                WHERE n > 0 AND (1.0 - u * 1.0 / n) > 0.6)
        SELECT 'n_docs' AS metric, CAST((SELECT COUNT(*) FROM toks) AS DOUBLE) AS value
        UNION ALL SELECT 'n_tokens', (SELECT CAST(COUNT(*) AS DOUBLE) FROM flat)
        UNION ALL SELECT 'vocab_size', (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) FROM flat)
        UNION ALL SELECT 'n_langs', (SELECT CAST(COUNT(DISTINCT lang) AS DOUBLE) FROM toks)
        UNION ALL SELECT 'n_sources', (SELECT CAST(COUNT(DISTINCT source) AS DOUBLE) FROM toks)
        UNION ALL SELECT 'exact_dup_docs', (SELECT CAST(dup_docs AS DOUBLE) FROM dup)
        UNION ALL SELECT 'repetitive_docs', (SELECT CAST(rep_docs AS DOUBLE) FROM rep)
        UNION ALL SELECT 'avg_tokens_per_doc',
            (SELECT FLOOR((SELECT COUNT(*) FROM flat) * 1.0
                          / (SELECT COUNT(*) FROM toks) * 1e6 + 0.5) / 1e6)
    """,
    notes=(
        "DATASET CARD metrics frame (the summary sheet shipped with every "
        "curated training corpus — datasheets-for-datasets, Gebru et al. "
        "2021, public): corpus size, token count, vocabulary, language/"
        "source coverage, exact-duplicate and high-repetition doc counts, "
        "mean doc length — one (metric, value) row each. Every metric is "
        "an integer count or exact ratio (dround 6), computed from two "
        "scans (doc-level + token-level) fused by Catalyst into shared "
        "partial aggregates; the card is corpus-size-independent output "
        "(8 rows) so it runs identically at 100 TB"
    ),
)
def pipeline_dataset_card(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    toks = d.select(
        "doc_id",
        "lang",
        "source",
        tk.alias("tk"),
        F.lower(F.trim("text")).alias("norm"),
    ).localCheckpoint(eager=True)  # feeds four aggregates below
    flat = toks.select("doc_id", F.explode("tk").alias("w"))
    doc_stats = toks.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.count_distinct("lang").cast("double").alias("n_langs"),
        F.count_distinct("source").cast("double").alias("n_sources"),
    )
    tok_stats = flat.agg(
        F.count("*").cast("double").alias("n_tokens"),
        F.count_distinct("w").cast("double").alias("vocab_size"),
    )
    dup = (
        toks.groupBy("norm")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("double").alias("exact_dup_docs"))
    )
    rep = (
        toks.select(
            F.size("tk").alias("n"), F.size(F.array_distinct("tk")).alias("u")
        )
        .filter((F.col("n") > 0) & ((1.0 - F.col("u") * 1.0 / F.col("n")) > 0.6))
        .agg(F.count("*").cast("double").alias("repetitive_docs"))
    )
    row = (
        doc_stats.crossJoin(tok_stats)
        .crossJoin(dup)
        .crossJoin(rep)
        .withColumn(
            "avg_tokens_per_doc",
            F.floor(F.col("n_tokens") / F.col("n_docs") * 1e6 + F.lit(0.5)) / 1e6,
        )
    )
    return row.select(
        F.expr(
            "stack(8, 'n_docs', n_docs, 'n_tokens', n_tokens, "
            "'vocab_size', vocab_size, 'n_langs', n_langs, "
            "'n_sources', n_sources, 'exact_dup_docs', exact_dup_docs, "
            "'repetitive_docs', repetitive_docs, "
            "'avg_tokens_per_doc', avg_tokens_per_doc) AS (metric, value)"
        )
    )


@register(
    "text_langid_confusion",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS token
            FROM documents
        ),
        marker AS (
            SELECT lang AS m_lang, token, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY token
                                      ORDER BY COUNT(*) DESC, lang ASC) AS rn
            FROM toks WHERE token <> ''
            GROUP BY lang, token
        ),
        votes AS (
            SELECT t.doc_id, t.lang AS true_lang, m.m_lang,
                   COUNT(*) AS votes,
                   ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                      ORDER BY COUNT(*) DESC, m.m_lang ASC) AS rn
            FROM toks t JOIN (SELECT token, m_lang FROM marker WHERE rn = 1) m
              ON t.token = m.token
            GROUP BY t.doc_id, t.lang, m.m_lang
        ),
        pred AS (SELECT doc_id, true_lang, m_lang AS pred_lang
                 FROM votes WHERE rn = 1),
        tot AS (SELECT true_lang, COUNT(*) AS n_true FROM pred GROUP BY true_lang)
        SELECT p.true_lang, p.pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               FLOOR(COUNT(*) * 1.0 / tot.n_true * 1e6 + 0.5) / 1e6 AS frac_of_true
        FROM pred p JOIN tot ON p.true_lang = tot.true_lang
        GROUP BY p.true_lang, p.pred_lang, tot.n_true
    """,
    notes=(
        "language-ID CONFUSION MATRIX (the eval artifact behind every "
        "classifier gate in a curation pipeline — text_lang_id predicts, "
        "this op grades): (true, predicted) doc counts plus each cell's "
        "share of its true-language row. Composes the lang_id frame "
        "(identical logic, its oracle extended by one aggregate) with a "
        "per-class total join — two small shuffles over the 5x5 grid"
    ),
)
def text_langid_confusion(spark, sf_dir):
    pred = text_lang_id(spark, sf_dir).select("true_lang", "pred_lang")
    tot = pred.groupBy("true_lang").agg(F.count("*").alias("n_true"))
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .join(tot, "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n_docs",
            (F.floor(F.col("n_docs") * 1.0 / F.col("n_true") * 1e6 + F.lit(0.5)) / 1e6).alias(
                "frac_of_true"
            ),
        )
    )


@register(
    "pipeline_sample_inspection",
    "pipeline",
    oracle="""
        SELECT doc_id, lang, source, rank FROM (
            SELECT doc_id, lang, source,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                   ) AS INTEGER) AS rank
            FROM documents
        ) WHERE rank <= 2
    """,
    notes=(
        "deterministic inspection sample (the human-review draw every "
        "curation run ships alongside the dataset card): 2 docs per "
        "(lang, source) stratum, ranked by a content-independent md5 of "
        "the doc id — unbiased w.r.t. document content, reproducible "
        "across runs and engines, no RNG state (the "
        "sample_hash_deterministic principle applied per stratum). One "
        "window shuffle on the stratum key; output is |strata|*2 rows at "
        "any corpus size"
    ),
)
def pipeline_sample_inspection(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.asc(F.md5(F.col("doc_id").cast("string"))), F.asc("doc_id")
    )
    return (
        d.select("doc_id", "lang", "source", F.row_number().over(w).cast("int").alias("rank"))
        .filter(F.col("rank") <= 2)
    )


@register(
    "text_char_ngram_profile",
    "text",
    oracle="""
        WITH base AS (SELECT lang, lower(text) AS lt FROM documents),
        bg AS (
            SELECT lang,
                   unnest(list_transform(generate_series(1, length(lt) - 1),
                                         i -> substr(lt, i, 2))) AS g
            FROM base WHERE length(lt) >= 2
        ),
        cnt AS (SELECT lang, g, COUNT(*) AS c FROM bg GROUP BY lang, g)
        SELECT lang, g AS bigram, CAST(c AS BIGINT) AS cnt,
               CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT lang, g, c, ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY c DESC, g ASC) AS rnk
            FROM cnt
        ) WHERE rnk <= 10
    """,
    notes=(
        "per-language character-bigram profile (Cavnar & Trenkle 1994's "
        "n-gram-profile langid, public — the CHARACTER-level counterpart "
        "of the engine's token-vote text_lang_id, and what real language "
        "identifiers actually use): top-10 char bigrams per language by "
        "frequency with deterministic ties. The bigram build is row-local "
        "over the MATERIALIZED lowercase column (transform over sequence "
        "— the NOTES_r4 HOF discipline); counts partial-agg per (lang, "
        "gram) then a top-k window over the tiny profile grid"
    ),
)
def text_char_ngram_profile(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    base = d.select("lang", F.lower("text").alias("lt")).filter(F.length("lt") >= 2)
    bg = base.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(lt) - 1), i -> substr(lt, i, 2))")
        ).alias("g"),
    )
    cnt = bg.groupBy("lang", "g").agg(F.count("*").alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    return (
        cnt.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .select(
            "lang",
            F.col("g").alias("bigram"),
            F.col("c").cast("bigint").alias("cnt"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "pipeline_token_budget",
    "pipeline",
    oracle="""
        WITH toks AS (
            SELECT lang, source,
                   len(list_filter(string_split(lower(text), ' '), x -> x <> ''))
                       AS n
            FROM documents
        ),
        per AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                       CAST(SUM(n) AS BIGINT) AS n_tokens
                FROM toks GROUP BY lang, source),
        tot AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) AS t FROM per)
        SELECT lang, source, n_docs, n_tokens,
               FLOOR(n_tokens / tot.t * 1e6 + 0.5) / 1e6 AS token_share,
               CAST(FLOOR(n_tokens / tot.t * 1000000000.0) AS BIGINT)
                   AS budget_at_1b
        FROM per CROSS JOIN tot
    """,
    notes=(
        "token-budget accounting per (lang, source) stratum — the mixing "
        "planner's worksheet (how many of a 1B-token budget each stratum "
        "would contribute at natural proportions; pipeline_sampling_mix "
        "then enforces chosen weights): row-local token counts, one "
        "partial-agg shuffle on the stratum key, the corpus total as a "
        "broadcast scalar. Output is |strata| rows at any corpus size"
    ),
)
def pipeline_token_budget(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    n = F.size(F.filter(F.split(F.lower("text"), " "), lambda x: x != ""))
    per = (
        d.select("lang", "source", n.alias("n"))
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("n_tokens"),
        )
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        (F.floor(F.col("n_tokens") / F.col("t") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "token_share"
        ),
        F.floor(F.col("n_tokens") / F.col("t") * 1e9).cast("bigint").alias("budget_at_1b"),
    )


@register(
    "text_hashing_features",
    "text",
    oracle="""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                              x -> x <> '')) AS token
            FROM documents WHERE doc_id < 200
        ),
        b AS (SELECT doc_id,
                     ('0x' || substr(md5(token), 1, 8))::BIGINT % 32 AS bucket
              FROM toks),
        c AS (SELECT doc_id, bucket, COUNT(*) AS cnt
              FROM b GROUP BY doc_id, bucket)
        SELECT doc_id,
               string_agg(printf('%02d:%d', CAST(bucket AS INTEGER), cnt), '|'
                          ORDER BY bucket ASC) AS features,
               CAST(SUM(cnt) AS BIGINT) AS n_tokens
        FROM c GROUP BY doc_id
    """,
    notes=(
        "hashing-trick feature vectors (Weinberger et al. 2009, public — "
        "HashingTF's relational form, the fixed-width featurizer feeding "
        "linear models without a vocabulary pass): each token lands in "
        "one of 32 md5-derived buckets (the dedup_simhash cross-engine "
        "hash idiom — engine-native murmur differs between engines, md5 "
        "does not), per-doc bucket counts exported as a sorted "
        "'bucket:count' string (the list-cell canonicalizer discipline). "
        "One explode + (doc, bucket) partial agg — vocabulary-free, so "
        "the width never grows with corpus size: the 100 TB property "
        "that makes the trick standard"
    ),
)
def text_hashing_features(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = d.select(
        "doc_id",
        F.explode(F.filter(F.split(F.lower("text"), " "), lambda x: x != "")).alias(
            "token"
        ),
    )
    bucket = F.pmod(F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long"), 32)
    c = toks.select("doc_id", bucket.alias("bucket")).groupBy("doc_id", "bucket").agg(
        F.count("*").alias("cnt")
    )
    feat = F.format_string("%02d:%d", F.col("bucket").cast("int"), F.col("cnt"))
    return (
        c.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("bucket", feat.alias("f")))).getField(
                    "f"
                ),
                "|",
            ).alias("features"),
            F.sum("cnt").cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "text_pii_redact",
    "text",
    oracle=r"""
        WITH enriched AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id ||
                   '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                   ' from 10.' || (doc_id % 256) || '.0.1' AS s
            FROM documents WHERE doc_id < 300
        )
        SELECT doc_id,
               len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
               len(regexp_extract_all(s, '\b555-\d{4}\b')) AS n_phone,
               len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                       '\b555-\d{4}\b', '[PHONE]', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS redacted
        FROM enriched
    """,
    notes=(
        "PII scrubbing — the compliance pass every LLM training pipeline "
        "runs before tokenization (emails / phone numbers / IPv4 "
        "addresses -> typed placeholders, plus per-doc detection counts "
        "for the audit trail). The synthetic corpus carries no natural "
        "PII, so the op deterministically embeds contact lines derived "
        "from doc_id (the multimodal-fixture pattern: the PAYLOAD is "
        "constructed, the machinery is real) and then runs the actual "
        "redaction: three regexp_replace passes + regexp_extract_all "
        "counts, all JVM-side codegen'd string ops chosen from the "
        "RE2-and-Java-compatible subset (no backrefs/lookaround) so both "
        "engines execute the identical automaton. Scale: entirely "
        "scan-local projection — zero shuffle, linear in corpus bytes; "
        "at 100 TB this is the textbook narrow transformation"
    ),
)
def text_pii_redact(spark, sf_dir):
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\b555-\d{4}\b"
    ipv4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    s = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0.1"),
    )
    e = d.select("doc_id", s.alias("s"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("s"), F.lit(email), F.lit("[EMAIL]")),
            F.lit(phone),
            F.lit("[PHONE]"),
        ),
        F.lit(ipv4),
        F.lit("[IP]"),
    )
    return e.select(
        "doc_id",
        F.size(F.regexp_extract_all("s", F.lit(email), F.lit(0))).cast("long").alias("n_email"),
        F.size(F.regexp_extract_all("s", F.lit(phone), F.lit(0))).cast("long").alias("n_phone"),
        F.size(F.regexp_extract_all("s", F.lit(ipv4), F.lit(0))).cast("long").alias("n_ip"),
        red.alias("redacted"),
    )
