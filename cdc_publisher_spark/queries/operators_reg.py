"""Registry entries for the approximate/scale operators (operators/).

q_k3 (MinHash+verify) shares q_k2's oracle — LSH prunes candidates but
the verified output is exact, so it must hash-match the exhaustive
join. SimHash/ANN/fingerprint register rows-only (their guarantees are
probabilistic or non-SQL); pytest cross-checks them against exact
twins (tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.operators.ann import ann_topk
from cdc_publisher_spark.operators.fingerprint import rolling_fingerprint
from cdc_publisher_spark.operators.minhash import minhash_near_duplicates
from cdc_publisher_spark.operators.simhash import simhash_near_duplicates
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_k3_minhash_neardup",
    family="K",
    bench=True,
    doc="K-2 MinHash+LSH near-dup with exact verify on candidates — "
    "identical output to q_k2 at O(collisions) cost (operators/minhash.py).",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 4096) g(i)
            WHERE i + 2 <= len(ws)
        ),
        sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
            FROM sh a JOIN sh b USING (s)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT d1, d2, ROUND(i * 1.0 / (s1.n + s2.n - i), 4) AS jaccard
        FROM inter
        JOIN sz s1 ON s1.doc_id = d1
        JOIN sz s2 ON s2.doc_id = d2
        WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.5
        ORDER BY d1, d2
    """,
)
def q_k3_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return minhash_near_duplicates(docs, threshold=0.5).orderBy("d1", "d2")


@register(
    "q_k11_simhash_neardup",
    family="K",
    oracle=None,  # Hamming-ball membership isn't SQL-portable; exact
    # twin check lives in tests/test_operators.py.
    doc="SimHash near-dup: 64-bit fingerprints, pigeonhole-banded "
    "candidate join, exact Hamming verify (operators/simhash.py).",
)
def q_k11_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return simhash_near_duplicates(docs, max_hamming=3).orderBy("d1", "d2")


@register(
    "q_k12_ann_topk",
    family="K",
    bench=True,
    oracle=None,  # approximate by design; recall bound pytest'd
    doc="LSH-bucketed approximate top-k cosine (operators/ann.py): "
    "random-hyperplane buckets + multiprobe, exact scoring inside "
    "buckets only.",
)
def q_k12_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    corpus = e.filter(F.col("vec_id") >= 5)
    return ann_topk(corpus, queries, k=10, n_planes=6).orderBy("query_id", "rk")


@register(
    "q_k13_rolling_fingerprint",
    family="K",
    oracle=None,  # modular rolling hash not expressible in DuckDB SQL;
    # pure-Python twin equality pytest'd
    doc="Order-sensitive rolling-hash document fingerprint via a "
    "vectorized pandas UDF (operators/fingerprint.py).",
)
def q_k13_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", rolling_fingerprint(F.col("text")).alias("fp")
    ).orderBy("doc_id")


@register(
    "q_k14_media_stats",
    family="K",
    doc="Multimodal metadata profile over binary payloads (documents "
    "text re-encoded as blobs; media_type from lang) — the "
    "metadata-only path that never decodes bytes "
    "(operators/multimodal.py).",
    oracle="""
        SELECT 'text/' || lang AS media_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(octet_length(encode(text)) AS BIGINT)) AS BIGINT) AS total_bytes,
               ROUND(AVG(octet_length(encode(text))), 2) AS avg_bytes
        FROM documents
        GROUP BY 1
        ORDER BY media_type
    """,
)
def q_k14_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.multimodal import media_size_stats

    docs = load(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("text/"), F.col("lang")).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return media_size_stats(media).orderBy("media_type")


@register(
    "q_k15_dataset_split",
    family="K",
    oracle=None,  # keyed on Spark's xxhash64 (no DuckDB twin); the
    # disjoint/exhaustive/weight invariants ARE DuckDB-checked over the
    # written Spark output (tests/test_operators.py::
    # test_split_invariants_duckdb_checked) + determinism pytest'd
    doc="Deterministic train/val/test split (operators/splits.py): "
    "content-hash bucketing, stable across cluster sizes and reruns.",
)
def q_k15_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.splits import assign_split

    docs = load(spark, sf_dir, "documents")
    return (
        assign_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split")
    )
