"""Family K extensions: duplicate-substring span masking and
per-language quality-quantile filtering.

q_k32 is the exact-substring-dedup operator (Lee et al. 2021): corpus
token spans whose n-gram repeats >= min_count times are removed from
every document (operators/spans.py; the n-gram counting reuses the
hashed-shingle discipline — only 8-byte keys shuffle). The oracle
re-derives the same spans in pure SQL and hashes the kept text, so
the whole mask→merge→reassemble path is value-checked, not just
row-counted.

q_k33 is the CCNet/Gopher-style quality gate: keep documents at or
above the 25th quality percentile *within their language*. The
registered query runs the exact percent_rank path (deterministic,
oracle-checkable); operators/quality_filter.py carries the
percentile_approx + broadcast-threshold path used at 100 TB, and
tests/test_spans_quality.py pins the two paths to agree away from the
cutoff neighborhood. Ranking happens on the 4-decimal-rounded score —
the same grid q_k16 proves hash-identical across engines — so rank
order (and therefore the filter) cannot diverge on last-bit float
noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.quality_filter import quantile_filter
from cdc_publisher_spark.operators.spans import mask_frequent_ngrams
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load

_N = 4
_MIN_COUNT = 3


@register(
    "q_k32_ngram_span_mask",
    family="K",
    bench=True,
    doc="Exact duplicate-substring removal: mask every token covered "
    "by a corpus-wide frequent 4-gram (>= 3 occurrences), emit per-doc "
    "token/masked counts and the md5 of the surviving text. "
    "operators/spans.py; grams shuffle as xxhash64 only.",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        tok AS (
            SELECT doc_id, i AS pos, ws[i] AS w
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i <= len(ws)
        ),
        gr AS (
            SELECT doc_id, i AS pos,
                   ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + {_N - 1} <= len(ws)
        ),
        freq AS (SELECT g FROM gr GROUP BY g HAVING COUNT(*) >= {_MIN_COUNT}),
        starts AS (SELECT doc_id, pos FROM gr WHERE g IN (SELECT g FROM freq)),
        flagged AS (
            SELECT t.doc_id, t.pos, t.w,
                   CASE WHEN s.pos IS NOT NULL THEN 1 ELSE 0 END AS st
            FROM tok t
            LEFT JOIN starts s ON s.doc_id = t.doc_id AND s.pos = t.pos
        ),
        cov AS (
            SELECT doc_id, pos, w,
                   MAX(st) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN {_N - 1} PRECEDING AND CURRENT ROW) AS masked
            FROM flagged
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(masked) AS BIGINT) AS n_masked,
               md5(COALESCE(string_agg(CASE WHEN masked = 0 THEN w END, ' ' ORDER BY pos),
                            '')) AS kept_md5
        FROM cov
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def q_k32_ngram_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True (r16 sf1 audit): 0.86 at both sf0.1 and sf1 — the
    # single _gram_tokens posexplode+window otherwise starts on one
    # scan task.
    docs = load(spark, sf_dir, "documents", spread=True)
    out = mask_frequent_ngrams(docs, n=_N, min_count=_MIN_COUNT)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_masked").cast("bigint").alias("n_masked"),
        F.md5("kept_text").alias("kept_md5"),
    ).orderBy("doc_id")


# q_k16's score expression on the 1e-4 grid, plus the language column.
# Kept in exact sync with q_k16_quality_score (queries/llm.py) — same
# subexpression order so the rounded values are the proven-identical
# ones.
_DUCK_SCORED = """
        stats AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_words,
                   len(list_filter(string_split(text, ' '),
                       w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                   len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
                   length(text) AS n_c
            FROM documents
        ), scored AS (
            SELECT doc_id, lang,
                   ROUND(0.5 * (n_stop * 1.0 / n_words)
                         - 0.3 * (n_punct * 1.0 / n_c)
                         - 0.2 * abs((n_c - SUM(n_c) OVER () * 1.0 / COUNT(*) OVER ())
                             / NULLIF(sqrt(SUM(n_c * n_c) OVER () * 1.0 / COUNT(*) OVER ()
                                           - (SUM(n_c) OVER () * 1.0 / COUNT(*) OVER ())
                                             * (SUM(n_c) OVER () * 1.0 / COUNT(*) OVER ())), 0)),
                         4) AS q
            FROM stats
        )
"""


@register(
    "q_k33_quality_quantile_filter",
    family="K",
    doc="Per-language quality gate: drop the bottom quartile of "
    "composite quality within each lang; report per-lang totals, kept "
    "counts, the realized threshold, and the kept-quality mass "
    "(decimal-summed — no float drift). Exact percent_rank path here; "
    "percentile_approx broadcast-threshold path in "
    "operators/quality_filter.py for 100 TB.",
    oracle=f"""
        WITH {_DUCK_SCORED},
        r AS (
            SELECT lang, q,
                   percent_rank() OVER (PARTITION BY lang ORDER BY q) AS pr
            FROM scored
        ),
        tot AS (SELECT lang, COUNT(*) AS n_total FROM scored GROUP BY lang),
        kept AS (
            SELECT lang, COUNT(*) AS n_kept,
                   MIN(q) AS min_kept_q,
                   CAST(SUM(CAST(q AS DECIMAL(22,6))) AS DOUBLE) AS sum_kept_q
            FROM r WHERE pr >= 0.25 GROUP BY lang
        )
        SELECT lang, n_total, n_kept, min_kept_q, sum_kept_q
        FROM tot JOIN kept USING (lang)
        ORDER BY lang
    """,
)
def q_k33_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), r"\s+")
    stats = docs.select(
        "doc_id",
        "lang",
        F.size(ws).alias("n_words"),
        F.size(F.filter(ws, lambda w: w.isin("the", "a", "of", "and", "to"))).alias("n_stop"),
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).alias("n_punct"),
        F.length("text").alias("n_c"),
    )
    # Same broadcast-moments substitution as q_k16 (queries/llm.py):
    # exact long sums + identical double op order, no unpartitioned
    # corpus window.
    moments = stats.agg(
        F.sum("n_c").alias("_s_nc"),
        F.sum(F.col("n_c") * F.col("n_c")).alias("_ss_nc"),
        F.count("*").alias("_n_docs"),
    )
    stats = stats.crossJoin(F.broadcast(moments))
    mean = F.col("_s_nc") * 1.0 / F.col("_n_docs")
    var = F.col("_ss_nc") * 1.0 / F.col("_n_docs") - mean * mean
    scored = stats.select(
        "doc_id",
        "lang",
        F.round(
            0.5 * (F.col("n_stop") * 1.0 / F.col("n_words"))
            - 0.3 * (F.col("n_punct") * 1.0 / F.col("n_c"))
            - 0.2 * F.abs((F.col("n_c") - mean) / F.nullif(F.sqrt(var), F.lit(0.0))),
            4,
        ).alias("q"),
    )
    kept = quantile_filter(scored, "q", "lang", q=0.25, exact=True)
    tot = scored.groupBy("lang").agg(F.count("*").alias("n_total"))
    agg = kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        F.min("q").alias("min_kept_q"),
        F.sum(F.col("q").cast("decimal(22,6)")).cast("double").alias("sum_kept_q"),
    )
    return tot.join(agg, "lang").select(
        "lang", "n_total", "n_kept", "min_kept_q", "sum_kept_q"
    ).orderBy("lang")
