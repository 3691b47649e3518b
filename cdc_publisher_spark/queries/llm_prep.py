"""Family K extensions: corpus-preparation operators — PII redaction,
context-window chunking, incremental-ingest dedup.

q_k23 exercises regex-scrub parity on strings both engines construct
identically from doc_id/source (the synthetic corpus itself contains
no digits or '@', so redacting raw ``text`` would be a zero-match
non-test); the pattern set sticks to the Java-regex ∩ RE2 subset so
Spark and DuckDB agree byte-for-byte. q_k24 chunks documents into
64-token windows with 16-token overlap (operators/chunk.py). q_k25 is
the ingest-time shape of dedup: a new batch is checked against the
already-collected corpus (exact content hash + shared-shingle
Jaccard), never corpus-vs-corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.functions import text as TX
from cdc_publisher_spark.operators.chunk import chunk_documents
from cdc_publisher_spark.operators.redact import pii_hits, redact
from cdc_publisher_spark.queries.llm import K2_ORACLE
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load

_SPARK_CONTACT = (
    "concat('reach user', CAST(doc_id AS STRING), '@mail-', source, "
    "'.example.com or 555-', lpad(CAST(doc_id % 1000 AS STRING), 3, '0'), "
    "'-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), "
    "' ssn 123-45-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), "
    "' ip 10.', CAST(doc_id % 256 AS STRING), '.0.1', "
    "' card 4111-1111-1111-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"
)

_DUCK_CONTACT = (
    "'reach user' || CAST(doc_id AS VARCHAR) || '@mail-' || source || "
    "'.example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || "
    "'-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
    "' ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' || "
    "' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

# DuckDB twins of operators/redact.py PII_PATTERNS (same order; RE2
# string literals, 'g' flag = Spark regexp_replace's replace-all).
_DUCK_PATTERNS = (
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b", "<CARD>"),
    ("\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
)


def _duck_redact_sql() -> str:
    expr = "s"
    for pat, repl in _DUCK_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def _duck_hits_sql() -> str:
    # progressive counting, mirroring operators/redact.py pii_hits:
    # count a pattern on the text with all earlier patterns removed
    stripped = "s"
    terms = []
    for pat, _ in _DUCK_PATTERNS:
        terms.append(f"len(regexp_extract_all({stripped}, '{pat}'))")
        stripped = f"regexp_replace({stripped}, '{pat}', '', 'g')"
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "q_k23_pii_redaction",
    family="K",
    doc="K-4 PII redaction (operators/redact.py): email/card/SSN/phone/"
    "IPv4 scrub as a chained regexp_replace projection — scan-speed, "
    "codegen, no UDF. Both engines build identical contact strings "
    "from doc_id/source, so the regex semantics themselves are the "
    "thing hash-checked.",
    oracle=f"""
        WITH c AS (SELECT doc_id, {_DUCK_CONTACT} AS s FROM documents)
        SELECT doc_id, {_duck_redact_sql()} AS redacted,
               {_duck_hits_sql()} AS n_hits
        FROM c ORDER BY doc_id
    """,
)
def q_k23_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    contact = F.expr(_SPARK_CONTACT)
    return (
        docs.select(
            "doc_id",
            redact(contact).alias("redacted"),
            pii_hits(contact).alias("n_hits"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_k24_document_chunking",
    family="K",
    doc="K-4 context-window chunking (operators/chunk.py): 64-token "
    "windows, 16-token overlap, chunk identity as md5 — explode + "
    "slice only, zero shuffle, partitioning preserved.",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        st AS (
            SELECT doc_id, ws, i AS start
            FROM w CROSS JOIN generate_series(0, 100000, 48) g(i)
            WHERE i < len(ws)
        ),
        ch AS (
            SELECT doc_id, CAST(start / 48 AS BIGINT) AS chunk_idx,
                   array_to_string(list_slice(ws, start + 1, start + 64), ' ') AS chunk_text
            FROM st
        )
        SELECT doc_id, chunk_idx,
               CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tok,
               md5(chunk_text) AS chunk_md5
        FROM ch ORDER BY doc_id, chunk_idx
    """,
)
def q_k24_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=64, overlap=16).orderBy("doc_id", "chunk_idx")


@register(
    "q_k25_incremental_dedup",
    family="K",
    doc="K-1/K-2 ingest-time dedup: a new batch (doc_id >= 450) checked "
    "against the collected corpus (doc_id < 450) — exact via md5 "
    "semi-join, near via shared-shingle Jaccard >= 0.5 against "
    "history only. The history side reduces to broadcast-size hash/"
    "size tables; the batch never joins itself.",
    oracle="""
        WITH hist AS (SELECT * FROM documents WHERE doc_id < 450),
        batch AS (SELECT * FROM documents WHERE doc_id >= 450),
        hh AS (SELECT DISTINCT md5(text) h FROM hist),
        w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 2 <= len(ws)
        ),
        sz AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT b.doc_id, h.doc_id AS hist_id, COUNT(*) i
            FROM sh b JOIN sh h USING (s)
            WHERE b.doc_id >= 450 AND h.doc_id < 450
            GROUP BY 1, 2
        ),
        near AS (
            SELECT DISTINCT inter.doc_id
            FROM inter
            JOIN sz sb ON sb.doc_id = inter.doc_id
            JOIN sz sh2 ON sh2.doc_id = inter.hist_id
            WHERE i * 1.0 / (sb.n + sh2.n - i) >= 0.5
        )
        SELECT b.doc_id,
               (md5(b.text) IN (SELECT h FROM hh)) AS dup_exact,
               (b.doc_id IN (SELECT doc_id FROM near)) AS dup_near,
               NOT (md5(b.text) IN (SELECT h FROM hh)
                    OR b.doc_id IN (SELECT doc_id FROM near)) AS keep
        FROM batch b ORDER BY b.doc_id
    """,
)
def q_k25_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") < 450)
    batch = docs.filter(F.col("doc_id") >= 450)

    hist_hashes = hist.select(F.md5("text").alias("h")).distinct()
    exact = (
        batch.select("doc_id", F.md5("text").alias("h"))
        .join(F.broadcast(hist_hashes), "h", "left_semi")
        .select("doc_id")
        .withColumn("dup_exact", F.lit(True))
    )

    tok = TX.shingle_rows(docs, "doc_id", "text", 3, hashed=True)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        tok.alias("b")
        .filter(F.col("b.doc_id") >= 450)
        .join(tok.alias("h").filter(F.col("h.doc_id") < 450), "s")
        .groupBy(F.col("b.doc_id").alias("doc_id"), F.col("h.doc_id").alias("hist_id"))
        .agg(F.count("*").alias("i"))
    )
    near = (
        inter.alias("it")
        .join(sizes.alias("sb"), F.col("it.doc_id") == F.col("sb.doc_id"))
        .join(sizes.alias("sh2"), F.col("hist_id") == F.col("sh2.doc_id"))
        .filter(F.col("i") * 1.0 / (F.col("sb.n") + F.col("sh2.n") - F.col("i")) >= 0.5)
        .select(F.col("it.doc_id").alias("doc_id"))
        .distinct()
        .withColumn("dup_near", F.lit(True))
    )

    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_exact", F.lit(False)).alias("dup_exact"),
            F.coalesce("dup_near", F.lit(False)).alias("dup_near"),
            (~(F.coalesce("dup_exact", F.lit(False)) | F.coalesce("dup_near", F.lit(False)))).alias("keep"),
        )
        .orderBy("doc_id")
    )


#: q_k79 new-batch boundary — same convention as q_k25 (doc_id >= 450
#: is "this ingest", the rest is accumulated history).
INCR_NEW_FROM = 450


@register(
    "q_k79_incremental_neardup_lsh",
    family="K",
    doc="K-79 incremental LSH near-dup: the per-ingest production "
    "pattern — only the new batch's bucket rows probe the corpus LSH "
    "index (operators/minhash.py lsh_buckets, the persistable state), "
    "so candidate cost is O(batch × collisions) and history-vs-history "
    "pairs are never recomputed. Output = exact-verified Jaccard>=0.5 "
    "pairs touching the batch (vs history AND within-batch — the half "
    "q_k25's history-only check doesn't see). Same oracle-exactness "
    "contract as q_k3: the banded probe nominates, the exact shingle "
    "verify decides.",
    oracle=f"""
        SELECT d1, d2, jaccard FROM ({K2_ORACLE}) k2
        WHERE d1 >= {INCR_NEW_FROM} OR d2 >= {INCR_NEW_FROM}
        ORDER BY d1, d2
    """,
)
def q_k79_incremental_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.minhash import incremental_near_duplicates

    docs = load(spark, sf_dir, "documents")
    new_ids = docs.filter(F.col("doc_id") >= INCR_NEW_FROM).select("doc_id")
    return incremental_near_duplicates(docs, new_ids).orderBy("d1", "d2")


@register(
    "q_k29_chunk_dup_mass",
    family="K",
    doc="Substring-level dedup signal at chunk granularity (the "
    "exact-substring-dedup approximation): per document, how many of "
    "its non-overlapping 32-token chunks also appear verbatim in "
    "another document. Chunk identity is md5, so the dup-detection "
    "join shuffles fixed-width hashes; outputs are exact integers "
    "(float-free hash check).",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        st AS (
            SELECT doc_id, ws, i AS start
            FROM w CROSS JOIN generate_series(0, 100000, 32) g(i)
            WHERE i < len(ws)
        ),
        ch AS (
            SELECT doc_id,
                   md5(array_to_string(list_slice(ws, start + 1, start + 32), ' ')) AS m
            FROM st
        ),
        dup AS (SELECT m FROM ch GROUP BY m HAVING COUNT(DISTINCT doc_id) > 1)
        SELECT ch.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) FILTER (WHERE ch.m IN (SELECT m FROM dup)) AS BIGINT)
                   AS n_dup_chunks
        FROM ch GROUP BY ch.doc_id
        ORDER BY ch.doc_id
    """,
)
def q_k29_chunk_dup_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ch = chunk_documents(docs, chunk_tokens=32, overlap=0).select(
        "doc_id", F.col("chunk_md5").alias("m")
    )
    dup = (
        ch.groupBy("m")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("m")
        .withColumn("is_dup", F.lit(True))
    )
    return (
        ch.join(dup, "m", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_if(F.col("is_dup")).alias("n_dup_chunks"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_k30_corpus_curation",
    family="K",
    doc="Capstone corpus-curation manifest — the composed pipeline a "
    "pretraining run executes: near-dup drop (connected components "
    "over Jaccard pairs, keep min doc per cluster), benchmark "
    "decontamination (shared 5-gram with the eval slice), repetition "
    "filter (top unigram > 1/10 of tokens) and stopword-quality "
    "filter (stopwords < 1/20 of tokens) — every condition in exact "
    "integer arithmetic so the keep/drop decision hash-matches "
    "bit-for-bit. One boolean column per reason plus the final keep. "
    "At 100 TB the exact Jaccard pair stage swaps for the MinHash+LSH "
    "miner (operators/minhash.py) — same pair schema, same clusters.",
    oracle="""
        WITH RECURSIVE
        w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh3 AS (
            SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 2 <= len(ws)
        ),
        sz AS (SELECT doc_id, COUNT(*) n FROM sh3 GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id d1, b.doc_id d2, COUNT(*) i
            FROM sh3 a JOIN sh3 b USING (s)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        ),
        pairs AS (
            SELECT d1, d2 FROM inter
            JOIN sz s1 ON s1.doc_id = d1 JOIN sz s2 ON s2.doc_id = d2
            WHERE i * 1.0 / (s1.n + s2.n - i) >= 0.5
        ),
        edges AS (SELECT d1 a, d2 b FROM pairs UNION SELECT d2, d1 FROM pairs),
        reach(id, lab) AS (
            SELECT a, a FROM edges
            UNION
            SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.id
        ),
        cc AS (SELECT id, MIN(lab) AS root FROM reach GROUP BY id),
        sh5 AS (
            SELECT DISTINCT doc_id,
                   ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                         || ws[i+3] || ' ' || ws[i+4] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 4 <= len(ws)
        ),
        contaminated AS (
            SELECT DISTINCT sh5.doc_id FROM sh5
            JOIN (SELECT DISTINCT s FROM sh5 WHERE doc_id < 20) ev USING (s)
            WHERE sh5.doc_id >= 20
        ),
        tok AS (SELECT doc_id, unnest(ws) AS wd FROM w),
        uni AS (
            SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_tok
            FROM (SELECT doc_id, wd, COUNT(*) c FROM tok GROUP BY 1, 2)
            GROUP BY doc_id
        ),
        stop AS (
            SELECT doc_id,
                   len(list_filter(ws, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS ns,
                   len(ws) AS nw
            FROM w
        )
        SELECT d.doc_id,
               COALESCE(cc.id IS NOT NULL AND cc.root <> d.doc_id, FALSE) AS drop_neardup,
               COALESCE(d.doc_id IN (SELECT doc_id FROM contaminated), FALSE) AS drop_contaminated,
               uni.top_c * 10 > uni.n_tok AS drop_repetitive,
               stop.ns * 20 < stop.nw AS drop_lowquality,
               NOT (COALESCE(cc.id IS NOT NULL AND cc.root <> d.doc_id, FALSE)
                    OR d.doc_id IN (SELECT doc_id FROM contaminated)
                    OR uni.top_c * 10 > uni.n_tok
                    OR stop.ns * 20 < stop.nw) AS keep
        FROM documents d
        LEFT JOIN cc ON cc.id = d.doc_id
        JOIN uni ON uni.doc_id = d.doc_id
        JOIN stop ON stop.doc_id = d.doc_id
        ORDER BY d.doc_id
    """,
)
def q_k30_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.components import neardup_clusters
    from cdc_publisher_spark.operators.decontaminate import ngram_contamination

    docs = load(spark, sf_dir, "documents")

    # near-dup drop: non-min members of Jaccard-pair components
    tok3 = TX.shingle_rows(docs, "doc_id", "text", 3, hashed=True)
    sizes = tok3.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        tok3.alias("a")
        .join(tok3.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("i"))
    )
    pairs = (
        inter.join(sizes.alias("s1"), F.col("d1") == F.col("s1.doc_id"))
        .join(sizes.alias("s2"), F.col("d2") == F.col("s2.doc_id"))
        .filter(F.col("i") * 1.0 / (F.col("s1.n") + F.col("s2.n") - F.col("i")) >= 0.5)
        .select("d1", "d2")
    )
    neardup = (
        neardup_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
        .withColumn("drop_neardup", F.lit(True))
    )

    contaminated = (
        ngram_contamination(
            corpus=docs.filter(F.col("doc_id") >= 20),
            eval_docs=docs.filter(F.col("doc_id") < 20),
            k=5,
        )
        .select("doc_id")
        .withColumn("drop_contaminated", F.lit(True))
    )

    toks = docs.select("doc_id", F.explode(TX.words(F.col("text"))).alias("wd"))
    uni = (
        toks.groupBy("doc_id", "wd")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_tok"))
    )
    ws = TX.words(F.col("text"))
    stop = docs.select(
        "doc_id",
        F.size(F.filter(ws, lambda x: x.isin("the", "a", "of", "and", "to"))).alias("ns"),
        F.size(ws).alias("nw"),
    )

    flags = (
        docs.select("doc_id")
        .join(neardup, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .join(uni, "doc_id")
        .join(stop, "doc_id")
        .select(
            "doc_id",
            F.coalesce("drop_neardup", F.lit(False)).alias("drop_neardup"),
            F.coalesce("drop_contaminated", F.lit(False)).alias("drop_contaminated"),
            (F.col("top_c") * 10 > F.col("n_tok")).alias("drop_repetitive"),
            (F.col("ns") * 20 < F.col("nw")).alias("drop_lowquality"),
        )
    )
    return flags.select(
        "doc_id",
        "drop_neardup",
        "drop_contaminated",
        "drop_repetitive",
        "drop_lowquality",
        (
            ~(
                F.col("drop_neardup")
                | F.col("drop_contaminated")
                | F.col("drop_repetitive")
                | F.col("drop_lowquality")
            )
        ).alias("keep"),
    ).orderBy("doc_id")


@register(
    "q_k31_stratified_sample",
    family="K",
    doc="Deterministic stratified sampling: exactly N=10 docs per "
    "source, ordered by a content hash (md5 of doc_id) — the eval-set "
    "construction primitive. Hash order makes the draw partitioning- "
    "independent and reproducible in DuckDB; ranking is one window "
    "per group, no global sort.",
    oracle="""
        WITH ranked AS (
            SELECT source, doc_id,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 10
        ORDER BY source, rk
    """,
)
def q_k31_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).cast("bigint").alias("rk"))
        .filter(F.col("rk") <= 10)
        .orderBy("source", "rk")
    )


@register(
    "q_k36_shuffle_shard",
    family="K",
    doc="Deterministic epoch shuffle + round-robin-free sharding: the "
    "training-order step between source mixing (q_k20) and sequence "
    "packing (q_k17). Each doc gets an epoch-seeded md5 shuffle key; "
    "the shard is derived from the key's own bytes (uniform, "
    "content-addressed — re-running any subset reproduces identical "
    "placement), and the within-shard position is a PARTITIONED "
    "row_number, never a global one — at 100 TB there is no "
    "single-partition window anywhere.",
    oracle="""
        WITH keyed AS (
            SELECT doc_id,
                   md5(concat('epoch7|', CAST(doc_id AS VARCHAR))) AS shuffle_key
            FROM documents
        )
        SELECT doc_id, shuffle_key,
               CAST((ascii(substr(shuffle_key, 1, 1)) * 256 +
                     ascii(substr(shuffle_key, 2, 1))) % 8 AS BIGINT) AS shard,
               CAST(row_number() OVER (
                   PARTITION BY (ascii(substr(shuffle_key, 1, 1)) * 256 +
                                 ascii(substr(shuffle_key, 2, 1))) % 8
                   ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos_in_shard
        FROM keyed
        ORDER BY shard, pos_in_shard
    """,
)
def q_k36_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("epoch7|"), F.col("doc_id").cast("string")))
    shard = (
        (F.ascii(F.substring(F.col("shuffle_key"), 1, 1)) * 256
         + F.ascii(F.substring(F.col("shuffle_key"), 2, 1)))
        % 8
    ).cast("bigint")
    w = W.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        docs.select("doc_id", key.alias("shuffle_key"))
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", F.row_number().over(w).cast("bigint"))
        .orderBy("shard", "pos_in_shard")
    )


#: Messy-input constructor shared by the normalization query: the
#: synthetic corpus is already clean lowercase ASCII, so (exactly like
#: q_k23's PII strings) both engines deterministically build a dirty
#: string — mixed case, accents, em-dash, tabs, runs of spaces — from
#: doc fields, then the engine-under-test cleans it.
_SPARK_MESSY = (
    "concat('  ', upper(substr(text, 1, 20)), ' Héllo—Wörld ', source, "
    "'\\t', '   ', substr(text, 21, 40), '  ')"
)
_DUCK_MESSY = (
    "concat('  ', upper(substr(text, 1, 20)), ' Héllo—Wörld ', source, "
    "chr(9), '   ', substr(text, 21, 40), '  ')"
)
_ACCENTS = "ÀÁÂÄàáâäÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÖòóôöÙÚÛÜùúûü—"
_FOLDED = "AAAAaaaaEEEEeeeeIIIIiiiiOOOOooooUUUUuuuu "


@register(
    "q_k39_text_normalize",
    family="K",
    doc="C4-style text normalization entirely in built-in expressions "
    "(accent folding via translate, case folding, whitespace collapse, "
    "trim) — runs at scan speed inside whole-stage codegen, no UDF. "
    "Output is the md5 of the cleaned text so the whole pipeline is "
    "hash-checked byte-for-byte against DuckDB.",
    oracle=f"""
        WITH messy AS (
            SELECT doc_id, {_DUCK_MESSY} AS raw FROM documents
        ),
        cleaned AS (
            SELECT doc_id, raw,
                   trim(regexp_replace(
                       lower(translate(raw, '{_ACCENTS}', '{_FOLDED}')),
                       '[ \t]+', ' ', 'g')) AS clean
            FROM messy
        )
        SELECT doc_id,
               CAST(length(raw) AS BIGINT) AS raw_len,
               CAST(length(clean) AS BIGINT) AS clean_len,
               md5(clean) AS clean_md5
        FROM cleaned
        ORDER BY doc_id
    """,
)
def q_k39_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    raw = F.expr(_SPARK_MESSY)
    clean = F.trim(
        F.regexp_replace(
            F.lower(F.translate(raw, _ACCENTS, _FOLDED)), "[ \t]+", " "
        )
    )
    return (
        docs.select(
            "doc_id",
            F.length(raw).cast("bigint").alias("raw_len"),
            F.length(clean).cast("bigint").alias("clean_len"),
            F.md5(clean).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q_k97 — normalized-exact benchmark decontamination (the first-pass gate)
# --------------------------------------------------------------------------
#: Same content-keyed draw as q_k61's test set: md5(doc_id) u < 0.1.
NORM_DECON_FRAC = 0.1


@register(
    "q_k97_normalized_exact_decontam",
    family="K",
    doc="K-97 normalized-exact decontamination — the standard FIRST "
    "pass before n-gram overlap (q_k19) and embedding contamination "
    "(q_k37): a training doc is contaminated when its NORMALIZED text "
    "(q_k39's folding — accent translate, lowercase, whitespace "
    "collapse, trim) hashes equal to any benchmark doc's normalized "
    "text. Benchmark = the q_k61 md5-draw (content-keyed, "
    f"{NORM_DECON_FRAC:.0%}). Exact-match-after-normalization is what "
    "catches reformatted verbatim copies that raw-text k1 misses and "
    "n-gram thresholds overkill. Per source: train docs, contaminated "
    "count, and surviving docs — exact integers only. Plan: one "
    "normalize+hash pass, benchmark hash set DISTINCT (broadcast-"
    "bounded by the draw), LEFT SEMI probe — no row multiplication "
    "anywhere.",
    oracle=f"""
        WITH n AS (
            SELECT doc_id, source,
                   md5(trim(regexp_replace(
                       lower(translate(text, '{_ACCENTS}', '{_FOLDED}')),
                       '[ \t]+', ' ', 'g'))) AS h,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS UBIGINT) / 4294967296.0 < {NORM_DECON_FRAC}
                       AS is_bench
            FROM documents
        ),
        bh AS (SELECT DISTINCT h FROM n WHERE is_bench),
        tr AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_train,
                   CAST(SUM(CASE WHEN h IN (SELECT h FROM bh)
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_contaminated
            FROM n WHERE NOT is_bench GROUP BY source
        )
        SELECT source, n_train, n_contaminated,
               n_train - n_contaminated AS n_clean
        FROM tr ORDER BY source
    """,
)
def q_k97_normalized_exact_decontam(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cdc_publisher_spark.operators.mixing import uniform_from_id

    docs = load(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.lower(F.translate(F.col("text"), _ACCENTS, _FOLDED)), "[ \t]+", " "
        )
    )
    n = docs.select(
        "source",
        F.md5(clean).alias("h"),
        (uniform_from_id(F.col("doc_id")) < F.lit(NORM_DECON_FRAC)).alias(
            "is_bench"
        ),
    )
    bench = n.filter("is_bench").select("h").distinct()
    train = n.filter(~F.col("is_bench"))
    hit = (
        train.join(F.broadcast(bench), "h", "left_semi")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    return (
        train.groupBy("source")
        .agg(F.count("*").cast("long").alias("n_train"))
        .join(hit, "source", "left")
        .select(
            "source",
            "n_train",
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            (F.col("n_train") - F.coalesce("n_contaminated", F.lit(0)))
            .cast("long")
            .alias("n_clean"),
        )
        .orderBy("source")
    )


_CTX_BUDGETS = (512, 2048, 8192, 32768)


@register(
    "q_k99_context_length_efficiency",
    family="K",
    doc="K-99 context-length efficiency curve: for each candidate "
    "training context length B (512/2048/8192/32768), the exact token "
    "economics of the two standard batching models — truncate-to-one-"
    "sequence (docs over B lose their tail: n_trunc_docs, "
    "trunc_lost_tokens) and chunk-and-pad (each doc becomes "
    "ceil(n/B) sequences, the last one padded: n_chunks, pad_tokens). "
    "This is the audit a pipeline runs BEFORE choosing a context "
    "length; q_k17 then materializes the packing at the chosen B. "
    "All integer algebra (ceil via (n+B-1) div B — never float), so "
    "the oracle hash is tie-free. Plan: one narrow scan computing "
    "n per doc, a constant 4-way explode of the budget literals, one "
    "map-side-combined hash agg to 4 groups — no window, no join, no "
    "shuffle wider than 4 rows; trivially 100 TB-safe.",
    oracle=f"""
        WITH sized AS (
            SELECT len(string_split(text, ' ')) AS n FROM documents
        ),
        x AS (
            SELECT n, budget
            FROM sized CROSS JOIN (
                SELECT UNNEST([{", ".join(str(b) for b in _CTX_BUDGETS)}])
                    AS budget
            )
        )
        SELECT
            CAST(budget AS BIGINT)                         AS budget,
            CAST(COUNT(*) AS BIGINT)                       AS n_docs,
            CAST(SUM(n) AS BIGINT)                         AS total_tokens,
            CAST(SUM(CASE WHEN n > budget THEN 1 ELSE 0 END) AS BIGINT)
                AS n_trunc_docs,
            CAST(SUM(CASE WHEN n > budget THEN n - budget ELSE 0 END)
                AS BIGINT)                                 AS trunc_lost_tokens,
            CAST(SUM((n + budget - 1) // budget) AS BIGINT) AS n_chunks,
            CAST(SUM(((n + budget - 1) // budget) * budget - n) AS BIGINT)
                AS pad_tokens
        FROM x
        GROUP BY budget
        ORDER BY budget
    """,
)
def q_k99_context_length_efficiency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(TX.n_words(F.col("text")).cast("long").alias("n"))
    budgets = F.array(*[F.lit(b).cast("long") for b in _CTX_BUDGETS])
    x = sized.select("n", F.explode(budgets).alias("budget"))
    n, b = F.col("n"), F.col("budget")
    chunks = F.expr("(n + budget - 1) div budget")
    return (
        x.groupBy("budget")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(n).cast("long").alias("total_tokens"),
            F.sum(F.when(n > b, 1).otherwise(0)).cast("long").alias("n_trunc_docs"),
            F.sum(F.when(n > b, n - b).otherwise(0))
            .cast("long")
            .alias("trunc_lost_tokens"),
            F.sum(chunks).cast("long").alias("n_chunks"),
            F.sum(chunks * b - n).cast("long").alias("pad_tokens"),
        )
        .orderBy("budget")
    )


#: q_k118 shard fan: 16 output shards — small enough that the manifest
#: is human-readable at any scale, large enough that the md5 balance
#: audit is non-trivial on the fixture corpus.
SHARD_FAN = 16


@register(
    "q_k118_shard_manifest",
    family="K",
    doc="K-118 deterministic shard-export manifest: every document is "
    "assigned a shard by md5 content-free id draw (shard = "
    "md5-uniform(doc_id) mod 16 — the q_k31/q_k36/q_k61 determinism "
    "convention, so the assignment is reproducible on ANY engine and "
    "stable under re-runs), and the manifest reports per shard the "
    "doc count, whitespace-token mass, byte mass, id range, and the "
    "load factor vs the ideal uniform share — the table a distributed "
    "export job writes next to its output so downstream loaders can "
    "size readers and verify completeness without scanning the data. "
    "ONE hash aggregate over the corpus; at 100 TB the same plan "
    "writes the actual shards via partitionBy(shard).",
    oracle=f"""
        WITH assign AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5('shard' || CAST(doc_id AS VARCHAR)),
                                        1, 8)) AS UBIGINT) % {SHARD_FAN} AS shard,
                   len(string_split(text, ' ')) AS nw,
                   length(text) AS nb
            FROM documents
        ),
        tot AS (SELECT COUNT(*) AS total FROM assign)
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nw) AS BIGINT) AS n_tokens,
               CAST(SUM(nb) AS BIGINT) AS n_bytes,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc_id,
               ROUND(COUNT(*) * {SHARD_FAN}.0 / MIN(tot.total), 4) AS load_factor
        FROM assign, tot
        GROUP BY shard
        ORDER BY shard
    """,
)
def q_k118_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    assign = docs.select(
        "doc_id",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % SHARD_FAN
        ).alias("shard"),
        TX.n_words(F.col("text")).alias("nw"),
        F.length("text").alias("nb"),
    )
    per_shard = assign.groupBy("shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_tokens"),
        F.sum("nb").cast("bigint").alias("n_bytes"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )
    # corpus total re-derived from the 16-row aggregate (one corpus
    # scan total); the scalar rides the adjudicated broadcast BNLJ
    tot = per_shard.agg(F.sum("n_docs").alias("total"))
    return (
        per_shard.crossJoin(F.broadcast(tot))
        .select(
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs",
            "n_tokens",
            "n_bytes",
            "min_doc_id",
            "max_doc_id",
            F.round(
                F.col("n_docs") * float(SHARD_FAN) / F.col("total"), 4
            ).alias("load_factor"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# q_k123 — contamination-severity histogram (how MUCH leaks, not just if)
# --------------------------------------------------------------------------

K123_ORACLE = f"""
    WITH marked AS (
        SELECT doc_id, text,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT) / 4294967296.0 < {NORM_DECON_FRAC}
                   AS is_bench
        FROM documents
    ),
    w AS (SELECT doc_id, is_bench, string_split(text, ' ') ws FROM marked),
    grams AS (
        SELECT DISTINCT doc_id, is_bench,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                     || ws[i+3] || ' ' || ws[i+4] AS s
        FROM w CROSS JOIN generate_series(1, 100000) g(i)
        WHERE i + 4 <= len(ws)
    ),
    train_set AS (SELECT DISTINCT s FROM grams WHERE NOT is_bench),
    per_doc AS (
        SELECT grams.doc_id,
               COUNT(*) AS g,
               SUM(CASE WHEN train_set.s IS NOT NULL THEN 1 ELSE 0 END) AS h
        FROM grams LEFT JOIN train_set USING (s)
        WHERE grams.is_bench
        GROUP BY grams.doc_id
    ),
    bucketed AS (
        SELECT m.doc_id,
               CASE WHEN per_doc.g IS NULL THEN -1
                    ELSE LEAST(9, per_doc.h * 10 // per_doc.g) END AS decile,
               CASE WHEN per_doc.g IS NULL THEN NULL
                    ELSE CAST(ROUND(per_doc.h * 1.0 / per_doc.g, 8)
                              AS DECIMAL(12, 8)) END AS cov8
        FROM marked m LEFT JOIN per_doc USING (doc_id)
        WHERE m.is_bench
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(cov8) AS DOUBLE) / COUNT(cov8), 4) AS mean_cov
    FROM bucketed
    GROUP BY decile
    ORDER BY decile
"""


@register(
    "q_k123_contamination_severity",
    family="K",
    doc="K-123 contamination-severity histogram: q_k19/q_k97 DECIDE "
    "(drop a doc on any overlap / exact normalized match); the audit a "
    "benchmark owner publishes is HOW MUCH of each held-out doc the "
    "training corpus covers (the GPT-3 appendix-C construction: "
    "n-gram overlap fraction per eval doc). Benchmark = the SAME "
    "content-keyed md5 draw as q_k61/q_k97, so the three decontam "
    "views audit one consistent split. Per benchmark doc: distinct "
    "5-grams g, grams also present in ANY train doc h, coverage h/g; "
    "histogram cell = integer decile least(9, h*10 div g), gram-less "
    "docs (<5 tokens) excluded-and-counted at decile -1. Counts are "
    "exact integers; mean coverage per cell is an 8dp-DECIMAL sum "
    "divided once (4dp). Plan: one shingle pass, DISTINCT train gram "
    "set, one gram-keyed LEFT equi-join bounded by the benchmark gram "
    "mass — never row multiplication (both sides per-doc-distinct); "
    "at 100 TB flip shingle_rows(hashed=True) so only 8-byte keys "
    "shuffle (64-bit collisions are noise at the 4dp output "
    "precision).",
    oracle=K123_ORACLE,
)
def q_k123_contamination_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions.text import shingle_rows
    from cdc_publisher_spark.operators.mixing import uniform_from_id

    docs = load(spark, sf_dir, "documents")
    marked = docs.select(
        "doc_id",
        "text",
        (uniform_from_id(F.col("doc_id")) < F.lit(NORM_DECON_FRAC)).alias(
            "is_bench"
        ),
    )
    grams = shingle_rows(marked.select("doc_id", "text"), k=5).join(
        marked.select("doc_id", "is_bench"), "doc_id"
    )
    train_set = (
        grams.filter(~F.col("is_bench")).select("s").distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        grams.filter("is_bench")
        .join(train_set, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("g"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("h"),
        )
    )
    bucketed = (
        marked.filter("is_bench")
        .select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            F.when(F.col("g").isNull(), F.lit(-1))
            .otherwise(F.least(F.lit(9), F.expr("h * 10 div g")))
            .alias("decile"),
            F.when(
                F.col("g").isNotNull(),
                F.round(F.col("h") * F.lit(1.0) / F.col("g"), 8).cast(
                    "decimal(12,8)"
                ),
            ).alias("cov8"),
        )
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("cov8").cast("double") / F.count("cov8"), 4
            ).alias("mean_cov"),
        )
        .select(F.col("decile").cast("bigint").alias("decile"), "n_docs", "mean_cov")
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# q_k126 — dedup keeper policy audit (which copy survives?)
# --------------------------------------------------------------------------

K126_ORACLE = """
    WITH d AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS fp,
               len(string_split(text, ' ')) AS nt
        FROM documents
    ),
    src AS (SELECT source, SUM(nt) AS src_tok FROM d GROUP BY source),
    dd AS (SELECT d.*, src.src_tok FROM d JOIN src USING (source)),
    cl AS (
        SELECT fp, COUNT(*) AS csize, MIN(doc_id) AS keep_base,
               MIN(src_tok) AS min_tok
        FROM dd GROUP BY fp
    ),
    rar AS (
        SELECT dd.fp, MIN(dd.doc_id) AS keep_rar
        FROM dd JOIN cl ON cl.fp = dd.fp AND dd.src_tok = cl.min_tok
        GROUP BY dd.fp
    ),
    flagged AS (
        SELECT dd.source, dd.nt, cl.csize,
               dd.doc_id = cl.keep_base AS is_base,
               dd.doc_id = rar.keep_rar AS is_rar
        FROM dd
        JOIN cl ON cl.fp = dd.fp
        JOIN rar ON rar.fp = dd.fp
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS n_tok,
           CAST(SUM(CASE WHEN csize > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS dup_docs,
           CAST(SUM(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_base,
           CAST(SUM(CASE WHEN is_rar THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_rarity,
           CAST(SUM(CASE WHEN is_base THEN nt ELSE 0 END) AS BIGINT)
               AS tok_kept_base,
           CAST(SUM(CASE WHEN is_rar THEN nt ELSE 0 END) AS BIGINT)
               AS tok_kept_rarity,
           CAST(SUM(CASE WHEN is_rar THEN nt ELSE 0 END)
                - SUM(CASE WHEN is_base THEN nt ELSE 0 END) AS BIGINT)
               AS tok_delta
    FROM flagged
    GROUP BY source
    ORDER BY source
"""


@register(
    "q_k126_dedup_keeper_policy",
    family="K",
    doc="K-126 dedup keeper-policy audit: every dedup pass must pick "
    "WHICH copy of a duplicate cluster survives, and the common "
    "default (keep the earliest-ingested doc, q_k92's min-doc_id "
    "keeper) systematically drains token mass from under-represented "
    "sources — the data-mixing side effect Muennighoff/Gopher-style "
    "budgets then have to correct. This query scores the alternative "
    "against the default on the q_k9 set-fingerprint clusters (the "
    "q_k112 cluster definition): policy A keeps min doc_id; policy B "
    "keeps the copy from the source with the SMALLEST corpus token "
    "mass (rarest source first, min doc_id tie-break inside it). Per "
    "source: docs/tokens, docs in >1-size clusters, docs and token "
    "mass kept under each policy, and the signed token delta B-A — "
    "the mass the rarity-aware keeper repatriates. Pure integer "
    "algebra end-to-end, bit-identical cross-engine. Plan: one token "
    "pass for masses, one fingerprint hash aggregate, two fp-keyed "
    "joins (cluster frame is cluster-sized); the source table is "
    "broadcast-sized. Scales to 100 TB: everything keys on fp or "
    "source, no windows, no quadratic terms.",
    oracle=K126_ORACLE,
)
def q_k126_dedup_keeper_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        TX.set_fingerprint(F.col("text")).alias("fp"),
        F.size(TX.words(F.col("text"))).alias("nt"),
    )
    src = d.groupBy("source").agg(F.sum("nt").alias("src_tok"))
    dd = d.join(src, "source")
    cl = dd.groupBy("fp").agg(
        F.count("*").alias("csize"),
        F.min("doc_id").alias("keep_base"),
        F.min("src_tok").alias("min_tok"),
    )
    rar = (
        dd.join(cl.select("fp", "min_tok"), "fp")
        .filter(F.col("src_tok") == F.col("min_tok"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_rar"))
    )
    flagged = (
        dd.join(cl.select("fp", "csize", "keep_base"), "fp")
        .join(rar, "fp")
        .select(
            "source",
            "nt",
            "csize",
            (F.col("doc_id") == F.col("keep_base")).alias("is_base"),
            (F.col("doc_id") == F.col("keep_rar")).alias("is_rar"),
        )
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tok"),
            F.sum((F.col("csize") > 1).cast("int"))
            .cast("bigint")
            .alias("dup_docs"),
            F.sum(F.col("is_base").cast("int")).cast("bigint").alias("kept_base"),
            F.sum(F.col("is_rar").cast("int")).cast("bigint").alias("kept_rarity"),
            F.sum(F.when(F.col("is_base"), F.col("nt")).otherwise(0))
            .cast("bigint")
            .alias("tok_kept_base"),
            F.sum(F.when(F.col("is_rar"), F.col("nt")).otherwise(0))
            .cast("bigint")
            .alias("tok_kept_rarity"),
            (
                F.sum(F.when(F.col("is_rar"), F.col("nt")).otherwise(0))
                - F.sum(F.when(F.col("is_base"), F.col("nt")).otherwise(0))
            )
            .cast("bigint")
            .alias("tok_delta"),
        )
        .orderBy("source")
    )
