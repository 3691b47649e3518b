"""cdc_publisher_spark — a PySpark-native analytics + CDC engine.

A from-scratch engine with the query and data-processing capabilities of
the reference CDC publisher service (Oracle AQ -> Kafka CDC fan-out;
see /root/reference, surveyed in SURVEY.md), re-expressed Spark-first:

- batch relational surface: DataFrame/SQL over Parquet (SURVEY.md §2.2 B-H)
- CDC kernel: DML envelope parse, deterministic key derivation,
  latest-state-per-key, retry backoff (SURVEY.md §2.1 T1-T3/A1/A2/R1)
- streaming: Structured Streaming pipeline with watermarks, windows,
  dedup-within-watermark, topic routing (SURVEY.md §2.2 I, §3.3)
- LLM-data operators: dedup (exact/MinHash/SimHash), similarity search,
  text analysis, multimodal column plumbing (SURVEY.md §2.2 K)

Layout:
    session.py    SparkSession factory (UTC, AQE, Arrow)
    tables.py     synthetic-table registry over /root/testdata
    registry.py   declared-query registry (Spark fn + DuckDB oracle SQL)
    oracle.py     DuckDB oracle runner + canonical comparator
    queries/      declared queries by family
    cdc/          the CDC kernel (keying, envelope, latest state, backoff)
    operators/    custom operators (as-of join, top-k cosine, MinHash, ...)
    sources/      source/sink helpers (kafka-shaped wire records, file DML)
    streaming/    structured-streaming pipeline + window helpers
    functions/    reusable column expressions (vector math, text stats)
    plans/        plan inspection utilities (pushdown/broadcast asserts)
"""

__version__ = "0.1.0"
