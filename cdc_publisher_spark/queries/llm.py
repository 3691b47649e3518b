"""Family K — LLM-data-pipeline operators (SURVEY.md §2.2 K, north star).

The oracle-checkable core: exact dedup, shingle-Jaccard near-dup,
text stats, token counting, fingerprinting, embedding norms, top-k
cosine similarity. The approximate/scale variants (MinHash+LSH,
SimHash, LSH-bucketed ANN) live in operators/ and register their own
rows-only specs — pytest cross-checks them against these exact forms.

Everything here is built-in expressions; the only shuffles are the
token join (K-2, O(shared shingles)) and the top-k window (K-3/K-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.functions import text as TX
from cdc_publisher_spark.functions import vectors as VX
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_k1_exact_dedup",
    family="K",
    doc="K-1 exact dedup: hash-groupBy on md5(text) — a fixed-width "
    "32-byte shuffle key instead of the raw document body, so at 100 TB "
    "the shuffle moves hashes, not text. Keeper = min(doc_id).",
    oracle="""
        SELECT md5(text) AS text_hash,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(text)
        ORDER BY keep_id
    """,
)
def q_k1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_id")
    )


#: q_k2's full oracle SQL, module-level so q_k75's cross-source
#: duplication matrix (queries/llm_audit.py) can wrap the IDENTICAL
#: pair-mining SQL as a subquery — one dedup definition, two audits.
K2_ORACLE = """
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
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
    """


@register(
    "q_k2_jaccard_neardup",
    family="K",
    bench=True,
    doc="K-2 exact near-dup: trigram-shingle Jaccard >= 0.5 pairs via "
    "shingle-explode + self-equi-join on shingle (no doc×doc cross "
    "product — cost is O(co-occurring shingles)). Ground truth for the "
    "MinHash operator.",
    oracle=K2_ORACLE,
)
def q_k2_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True (r16 sf1 audit): the shingle posexplode feeding the
    # content-key shuffle otherwise runs on the single scan task —
    # measured 0.75 at sf1 / 0.82 at sf0.1 (blanket on/off, 2+2
    # interleaved). The declared exact-quadratic JOIN shape is
    # unchanged; only the scan layout is.
    docs = load(spark, sf_dir, "documents", spread=True)
    # row-wise shingling (codegen path) + int64-hashed join key: the
    # shuffle moves 8-byte keys, not trigram strings
    tok = TX.shingle_rows(docs, "doc_id", "text", 3, hashed=True)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        tok.alias("a")
        .join(tok.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("i"))
    )
    # sizes is per-doc (corpus cardinality): no broadcast hint — AQE
    # broadcasts it while it fits and falls back to a shuffle join at
    # billion-doc scale, where a forced broadcast would OOM the driver.
    jac = (
        inter.join(sizes.alias("s1"), F.col("d1") == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), F.col("d2") == F.col("s2.doc_id"))
        .select(
            "d1",
            "d2",
            (F.col("i") * 1.0 / (F.col("s1.n") + F.col("s2.n") - F.col("i"))).alias("j"),
        )
    )
    return (
        jac.filter(F.col("j") >= 0.5)
        .select("d1", "d2", F.round("j", 4).alias("jaccard"))
        .orderBy("d1", "d2")
    )


@register(
    "q_k4_text_stats",
    family="K",
    doc="K-4 per-document text quality stats: word/distinct counts, "
    "type-token ratio, mean word length, stored-length consistency.",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
               ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 4) AS ttr,
               ROUND((length(text) - len(string_split(text, ' ')) + 1) * 1.0
                     / len(string_split(text, ' ')), 4) AS avg_word_len,
               CAST(length(text) AS BIGINT) = n_chars AS len_consistent
        FROM documents
        ORDER BY doc_id
    """,
)
def q_k4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    # ws/n_words materialized once; avg word length arithmetically
    # (total chars minus separators) — no interpreted HOF in the row path
    staged = docs.select(
        "doc_id", "n_chars", text, TX.words(text).alias("ws")
    ).select(
        "doc_id",
        "n_chars",
        text,
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct"),
    )
    return staged.select(
        "doc_id",
        "n_words",
        "n_distinct",
        F.round(F.col("n_distinct").cast("double") / F.col("n_words"), 4).alias("ttr"),
        F.round(
            (F.length(text) - F.col("n_words") + 1).cast("double") / F.col("n_words"), 4
        ).alias("avg_word_len"),
        (F.length(text).cast("bigint") == F.col("n_chars")).alias("len_consistent"),
    ).orderBy("doc_id")


@register(
    "q_k5_embedding_norms",
    family="K",
    doc="K-5 vector norms via higher-order functions (no UDF): "
    "L1/L2/Linf + first normalized component.",
    oracle="""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings)
        SELECT vec_id,
               ROUND(sqrt(list_sum(list_transform(e, x -> x * x))), 4) AS l2,
               ROUND(list_sum(list_transform(e, x -> abs(x))), 4) AS l1,
               ROUND(list_max(list_transform(e, x -> abs(x))), 4) AS linf,
               ROUND(e[1] / sqrt(list_sum(list_transform(e, x -> x * x))), 4) AS first_normed
        FROM v
        ORDER BY vec_id
    """,
)
def q_k5_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    return e.select(
        "vec_id",
        F.round(VX.l2_norm(vec), 4).alias("l2"),
        F.round(VX.l1_norm(vec), 4).alias("l1"),
        F.round(VX.linf_norm(vec), 4).alias("linf"),
        F.round(F.element_at(VX.normalize(vec), 1), 4).alias("first_normed"),
    ).orderBy("vec_id")


@register(
    "q_k6_cosine_topk",
    family="K",
    bench=True,
    doc="K-3 brute-force top-k cosine: 5 query vectors vs the corpus, "
    "top-10 each. Query side broadcasts; ranking is a bounded window. "
    "The LSH-bucketed scale path is operators/ann.py.",
    oracle="""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        q AS (SELECT * FROM v WHERE vec_id < 5),
        c AS (SELECT * FROM v WHERE vec_id >= 5),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   list_dot_product(q.e, c.e)
                     / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.e, c.e)
                                / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) DESC,
                                c.vec_id) AS rk
            FROM q CROSS JOIN c
        )
        SELECT query_id, cand_id, ROUND(cos, 4) AS cosine, rk
        FROM scored WHERE rk <= 10
        ORDER BY query_id, rk
    """,
)
def q_k6_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True (r16 sf1 audit): fold-expression cosine off a
    # single-task scan — 0.38 at sf1, parity at sf0.1.
    e = load(spark, sf_dir, "embeddings", spread=True)
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        VX.l2_norm(F.col("embedding")).alias("qn"),
    )
    c = e.filter(F.col("vec_id") >= 5).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        VX.l2_norm(F.col("embedding")).alias("cn"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        VX.cosine_with_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select("query_id", "cand_id", F.round("cos", 4).alias("cosine"), "rk")
        .orderBy("query_id", "rk")
    )


@register(
    "q_k7_nearest_neighbor",
    family="K",
    doc="K-3 all-pairs argmax: nearest neighbor (cosine) for the first "
    "50 vectors — embedding-cosine near-dup detection shape.",
    oracle="""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        q AS (SELECT * FROM v WHERE vec_id < 50),
        scored AS (
            SELECT q.vec_id, c.vec_id AS nn_id,
                   list_dot_product(q.e, c.e)
                     / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.e, c.e)
                                / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) DESC,
                                c.vec_id) AS rk
            FROM q JOIN v c ON c.vec_id <> q.vec_id
        )
        SELECT vec_id, nn_id, ROUND(cos, 4) AS cosine
        FROM scored WHERE rk = 1
        ORDER BY vec_id
    """,
)
def q_k7_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("qv"),
        VX.l2_norm(F.col("embedding")).alias("qn"),
    )
    c = e.select(
        F.col("vec_id").alias("nn_id"),
        F.col("embedding").alias("cv"),
        VX.l2_norm(F.col("embedding")).alias("cn"),
    )
    scored = c.crossJoin(F.broadcast(q)).filter(F.col("nn_id") != F.col("vec_id")).select(
        "vec_id",
        "nn_id",
        VX.cosine_with_norms(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")).alias("cos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("nn_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") == 1)
        .select("vec_id", "nn_id", F.round("cos", 4).alias("cosine"))
        .orderBy("vec_id")
    )


@register(
    "q_k8_corpus_stats_by_lang",
    family="K",
    doc="Per-language corpus profile (language filter + quality "
    "aggregates): doc counts, length stats, source diversity, tokens.",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               ROUND(AVG(n_chars), 4) AS avg_chars,
               CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_words,
               COUNT(DISTINCT source) AS n_sources
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
)
def q_k8_corpus_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum(TX.n_words(F.col("text")).cast("bigint")).alias("total_words"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("lang")
    )


@register(
    "q_k9_set_fingerprint",
    family="K",
    doc="K document fingerprinting (set form): md5 over the sorted "
    "distinct-word list; groups = candidate duplicate clusters. The "
    "positional rolling-hash variant is operators/fingerprint.py.",
    oracle="""
        SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
               MIN(doc_id) AS first_doc,
               COUNT(*) AS cluster_size
        FROM documents
        GROUP BY 1
        ORDER BY first_doc
    """,
)
def q_k9_set_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(TX.set_fingerprint(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("first_doc"), F.count("*").alias("cluster_size"))
        .orderBy("first_doc")
    )


@register(
    "q_k10_token_counts",
    family="K",
    doc="K token counting: whitespace tokens vs BPE-ish regex tokens "
    "(letter runs / digit runs / symbols) per document.",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INT) AS n_alpha_tokens
        FROM documents
        ORDER BY doc_id
    """,
)
def q_k10_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        TX.n_words(text).alias("n_ws_tokens"),
        TX.n_tokens_regex(text).cast("int").alias("n_bpe_tokens"),
        F.regexp_count(text, F.lit(r"[A-Za-z]+")).cast("int").alias("n_alpha_tokens"),
    ).orderBy("doc_id")


@register(
    "q_k16_quality_score",
    family="K",
    doc="K-4 composite document quality score (north star: length / "
    "punctuation / stopword ratios): per-doc ratios + corpus-relative "
    "length z-score folded into one filterable score.",
    oracle="""
        WITH stats AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_words,
                   len(list_filter(string_split(text, ' '),
                       w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop,
                   len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS n_punct,
                   length(text) AS n_c
            FROM documents
        ), scored AS (
            SELECT doc_id,
                   n_stop * 1.0 / n_words AS sr,
                   n_punct * 1.0 / n_c AS pr,
                   (n_c - SUM(n_c) OVER () * 1.0 / COUNT(*) OVER ())
                     / NULLIF(sqrt(SUM(n_c * n_c) OVER () * 1.0 / COUNT(*) OVER ()
                                   - (SUM(n_c) OVER () * 1.0 / COUNT(*) OVER ())
                                     * (SUM(n_c) OVER () * 1.0 / COUNT(*) OVER ())), 0) AS lz
            FROM stats
        )
        SELECT doc_id,
               ROUND(sr, 4) AS stopword_ratio,
               ROUND(pr, 4) AS punct_ratio,
               ROUND(lz, 4) AS len_z,
               ROUND(0.5 * sr - 0.3 * pr - 0.2 * abs(lz), 4) AS quality
        FROM scored
        ORDER BY doc_id
    """,
)
def q_k16_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), r"\s+")
    stats = docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.size(
            F.filter(ws, lambda w: w.isin("the", "a", "of", "and", "to"))
        ).alias("n_stop"),
        F.regexp_count(F.col("text"), F.lit(r"[^A-Za-z0-9\s]")).alias("n_punct"),
        F.length("text").alias("n_c"),
    )
    # Corpus length moments via a broadcast 1-row aggregate, NOT an
    # unpartitioned window (single-partition at scale). Numerically
    # identical: the sums/count are exact longs either way and the
    # double algebra below keeps the same op order.
    moments = stats.agg(
        F.sum("n_c").alias("_s_nc"),
        F.sum(F.col("n_c") * F.col("n_c")).alias("_ss_nc"),
        F.count("*").alias("_n_docs"),
    )
    stats = stats.crossJoin(F.broadcast(moments))
    mean = F.col("_s_nc") * 1.0 / F.col("_n_docs")
    var = F.col("_ss_nc") * 1.0 / F.col("_n_docs") - mean * mean
    # ratios stay UNROUNDED until output: composing rounded values puts
    # the composite score exactly on rounding boundaries (1e-4 grid)
    scored = stats.select(
        "doc_id",
        (F.col("n_stop") * 1.0 / F.col("n_words")).alias("sr"),
        (F.col("n_punct") * 1.0 / F.col("n_c")).alias("pr"),
        ((F.col("n_c") - mean) / F.nullif(F.sqrt(var), F.lit(0.0))).alias("lz"),
    )
    return scored.select(
        "doc_id",
        F.round("sr", 4).alias("stopword_ratio"),
        F.round("pr", 4).alias("punct_ratio"),
        F.round("lz", 4).alias("len_z"),
        F.round(0.5 * F.col("sr") - 0.3 * F.col("pr") - 0.2 * F.abs("lz"), 4).alias("quality"),
    ).orderBy("doc_id")


@register(
    "q_k17_sequence_packing",
    family="K",
    bench=True,  # r6 bucket-cumsum decomposition: keep its cost visible
    doc="Training-sequence packing: docs stream into fixed token-budget "
    "packs per source shard (pack boundary = running token count "
    "crossing the budget). Pure window algebra — a running sum and a "
    "floor division — so the packing plan is deterministic and "
    "shuffle-cheap, no driver loop. SCALE: the oracle's per-source "
    "running sum is reproduced WITHOUT a corpus-sized per-source "
    "window — doc_id is range-bucketed (doc_id div 4096, monotone in "
    "the ordering key), per-(source, bucket) token sums roll up to a "
    "bucket-offset table whose per-source cumulative window is 4096x "
    "smaller than the corpus, and the intra-bucket running sum "
    "partitions by the HIGH-cardinality (source, bucket) key — every "
    "task is bounded by the bucket width, never by a source's share "
    "of 100 TB (the q_k63 decomposition, VERDICT r5 ask #1).",
    oracle="""
        WITH sized AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                       OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
            FROM documents
        )
        SELECT source, doc_id, n_tokens,
               (cum_tokens - n_tokens) // 2048 AS pack_id,
               cum_tokens - n_tokens - ((cum_tokens - n_tokens) // 2048) * 2048 AS pack_offset
        FROM sized
        ORDER BY source, doc_id
    """,
)
def q_k17_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    budget = 2048
    id_bucket = 4096  # docs per ordering-range bucket; tasks bounded by this
    sized = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_tokens"),
    ).withColumn("_bkt", F.expr(f"doc_id div {id_bucket}").cast("bigint"))
    # The _bkt range bucket is monotone in doc_id, so the shared
    # bucket-offset + intra-bucket-cumsum decomposition reproduces the
    # oracle's global per-source running sum exactly (integer math),
    # with no corpus-sized per-source window anywhere.
    from cdc_publisher_spark.functions.windows import bucketed_running_sum

    sized = bucketed_running_sum(
        sized, "source", "_bkt", ["doc_id"], "n_tokens", "cum_tokens"
    ).withColumn("cum_tokens", F.col("cum_tokens").cast("bigint"))
    # Integer `div`, not float '/': '/' on bigints is double division in
    # Spark and loses exactness past 2^53 cumulative tokens — real at
    # 100 TB token budgets (DuckDB's '//' oracle is exact integer math).
    sized = sized.withColumn("_start", (F.col("cum_tokens") - F.col("n_tokens")).cast("bigint"))
    pack_id = F.expr(f"_start div {budget}").cast("bigint")
    return sized.select(
        "source",
        "doc_id",
        "n_tokens",
        pack_id.alias("pack_id"),
        (F.col("_start") - pack_id * budget).alias("pack_offset"),
    ).orderBy("source", "doc_id")


# --------------------------------------------------------------------------
# q_k113 — packing boundary-contamination audit
# --------------------------------------------------------------------------
@register(
    "q_k113_packing_boundary_audit",
    family="K",
    doc="K-113 packing boundary-contamination audit over the q_k17 "
    "greedy packing: per source, how many documents SPAN a pack "
    "boundary (their token span crosses a multiple of the 2048 "
    "budget) — each such document is split across two training "
    "sequences, truncating its left part's continuation and leaking "
    "unrelated context into the right part unless the attention mask "
    "resets (the cost axis packing papers trade against padding, "
    "Krell et al. 2022). Pure closed-form integer algebra over the "
    "packing columns (span start/end div budget), so the whole table "
    "is exact cross-engine; crossing_frac is one division of exact "
    "counts. Scale: inherits q_k17's bucketed running-sum "
    "decomposition plus ONE per-source hash aggregate.",
    oracle="""
        WITH sized AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
                       OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
            FROM documents
        ),
        spans AS (
            SELECT source, n_tokens,
                   cum_tokens - n_tokens AS s,
                   cum_tokens - 1 AS e
            FROM sized
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN s // 2048 <> e // 2048 THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_crossing,
               CAST(MAX(e) // 2048 + 1 AS BIGINT) AS n_packs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(SUM(CASE WHEN s // 2048 <> e // 2048 THEN 1 ELSE 0 END) / (1.0 * COUNT(*)), 4) AS crossing_frac
        FROM spans
        GROUP BY source
        ORDER BY source
    """,
)
def q_k113_packing_boundary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    budget = 2048
    packed = q_k17_sequence_packing(spark, sf_dir)
    spans = packed.select(
        "source",
        "n_tokens",
        (F.col("pack_id") * budget + F.col("pack_offset")).alias("_s"),
        (
            F.col("pack_id") * budget + F.col("pack_offset")
            + F.col("n_tokens") - 1
        ).alias("_e"),
    ).withColumn(
        "_crosses",
        (F.expr(f"_s div {budget}") != F.expr(f"_e div {budget}")).cast("int"),
    )
    return (
        spans.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_crosses").cast("bigint").alias("n_boundary_crossing"),
            (F.expr(f"max(_e) div {budget}") + 1).cast("bigint").alias("n_packs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.sum("_crosses") / (1.0 * F.count("*")), 4).alias(
                "crossing_frac"
            ),
        )
        .orderBy("source")
    )
