"""Family K extension: ranked keyword retrieval (BM25).

Okapi BM25 with the Lucene IDF form over the documents table — the
query side is a literal term list, so the whole computation is two
broadcast-joined aggregates over one token-explode scan:

    score(d, q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·dl/avgdl))

Float canonicalization (registry.py rules): each per-(doc, term)
partial score is ROUNDed to 8 decimals and cast DECIMAL before the
per-doc sum, so the aggregate is summation-order-independent; the
final score rounds to 4. Scale shape: corpus-side work is one explode
+ one groupBy on (doc, term-hash-sized keys); the O(|q|) term-stats
table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import words
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load

BM25_K1 = 1.2
BM25_B = 0.75
QUERY_TERMS = ("table", "spark", "window")


@register(
    "q_k28_bm25_retrieval",
    family="K",
    doc="BM25 keyword retrieval for a literal 3-term query: Lucene-form "
    "IDF, k1=1.2 b=0.75; per-(doc,term) partials rounded to 8 decimals "
    "and DECIMAL-summed for cross-engine bit-stability. One corpus "
    "scan; term stats broadcast.",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS total_tok
            FROM dl
        ),
        q(term) AS (VALUES ('{QUERY_TERMS[0]}'), ('{QUERY_TERMS[1]}'), ('{QUERY_TERMS[2]}')),
        tf AS (
            SELECT doc_id, w AS term, COUNT(*) AS tf
            FROM tok WHERE w IN (SELECT term FROM q)
            GROUP BY doc_id, w
        ),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        part AS (
            SELECT tf.doc_id,
                   CAST(ROUND(
                       ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                       * tf.tf * ({BM25_K1} + 1.0)
                       / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                          + {BM25_B} * dl.dl * stats.n_docs * 1.0 / stats.total_tok)),
                   8) AS DECIMAL(18, 8)) AS s
            FROM tf
            JOIN df USING (term)
            JOIN dl ON dl.doc_id = tf.doc_id
            CROSS JOIN stats
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
               CAST(ROUND(SUM(s), 4) AS DOUBLE) AS bm25
        FROM part GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def q_k28_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tok")
    )
    tf = (
        tok.filter(F.col("w").isin(*QUERY_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    part = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
                )
                * F.col("tf")
                * (BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + BM25_K1
                    * (
                        1.0
                        - BM25_B
                        + BM25_B * F.col("dl") * F.col("n_docs") * 1.0 / F.col("total_tok")
                    )
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("s"),
        )
    )
    return (
        part.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.round(F.sum("s"), 4).cast("double").alias("bm25"),
        )
        .orderBy("doc_id")
    )
