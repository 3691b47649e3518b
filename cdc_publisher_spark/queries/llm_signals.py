"""Family K round-5 extension: corpus-signal operators — asymmetric
containment near-dup, the feature-hashing trick, n-gram novelty, IDF
rarity scoring, the Gopher rule battery, and within-document token
entropy.

- q_k67 containment near-dup: |S(A) ∩ S(B)| / |S(A)| — the asymmetric
  twin of q_k2's Jaccard. Jaccard misses quote/subset duplication (a
  short doc embedded in a long one scores low symmetric overlap but
  ~1.0 containment); real dedup pipelines (Lee et al. 2021 §4 discuss
  the asymmetry) gate on both.
- q_k68 feature-hashed bag-of-words vectors (Weinberger et al. 2009
  "hashing trick"): every token md5-hashed into a fixed bucket space,
  per-doc tf weights L2-normalized — the fixed-width doc vector
  classifiers and ANN pipelines consume when no learned embedding is
  available. Long-form output (doc_id, bucket, weight) so the whole
  vector is value-hashed cross-engine.
- q_k69 n-gram novelty: fraction of each doc's distinct trigrams FIRST
  seen in that doc (first = min doc_id over the corpus) — the marginal-
  novelty curve dedup planners use to decide how hard to dedup.
- q_k70 IDF rarity: mean smoothed IDF over a doc's token instances —
  the informativeness/rarity scalar (boilerplate scores low, rare-term
  docs high). Broadcast vocab-sized IDF table, decimal-summed terms.
- q_k71 Gopher rule battery (Rae et al. 2021 Table A1 shape): the
  word-count / mean-word-length / stopword / type-token / top-word-
  repetition screens as per-doc booleans plus the conjunctive keep.
- q_k72 token entropy: within-doc Shannon entropy of the unigram
  distribution — the repetition/diversity scalar (low entropy = loops
  and boilerplate). Decimal-summed 8dp log terms, hash-exact.

Scale shape, all queries: tokens/grams shuffle as xxhash64 ints or
md5-derived bucket ids wherever a join key is needed; per-doc stats
are single groupBys with map-side combine; the only broadcast tables
are vocabulary-bounded (IDF) — nothing corpus-sized crosses the
driver and no window is unpartitioned (tests/test_plans.py gate).

Reference parity: none of this exists in the reference (a CDC
microservice, /root/reference/src/cdc_publisher/core.clj:1-22); all
are declared LLM-data extension surface (SURVEY.md §2.2 K-67..K-72).

Everything deterministic per registry.py hash-stability rules: md5
buckets reproduce in DuckDB via ('0x' || substr(md5(g),1,8))::UBIGINT,
ln() terms are 8dp-rounded and DECIMAL-summed, doubles round at 4dp on
output, and every output carries a unique ORDER BY key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.functions import text as TX
from cdc_publisher_spark.functions.text import words
from cdc_publisher_spark.queries.llm_select import _md5_bucket
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load

#: q_k67 containment threshold — catches every q_k2 Jaccard>=0.5 pair
#: plus genuinely asymmetric subset pairs.
CONTAIN_THRESHOLD = 0.5
#: q_k68 hashing-trick bucket count (fixed output dimensionality).
FHASH_BUCKETS = 64
#: q_k71 Gopher-style screen constants.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 10.0
GOPHER_MIN_STOPWORDS = 2
GOPHER_MIN_TTR = 0.2
GOPHER_MAX_TOPWORD_FRAC = 0.3
_STOPWORDS = ("the", "a", "of", "and", "to")


# --------------------------------------------------------------------------
# q_k67 — asymmetric shingle containment near-dup
# --------------------------------------------------------------------------
@register(
    "q_k67_containment_neardup",
    family="K",
    doc="K-67 asymmetric containment near-dup: directed (src, dst) "
    "pairs where containment = |S(src) ∩ S(dst)| / |S(src)| >= 0.5 "
    "over distinct trigram shingles — the subset-duplication detector "
    "Jaccard misses. One shingle equi-join computes each unordered "
    "intersection once (d1 < d2); both directions derive from it by "
    "dividing by the respective shingle-set size, so the directed "
    "output costs no second join. Shingles shuffle as xxhash64 ints.",
    oracle=f"""
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
        ),
        directed AS (
            SELECT d1 AS src_doc, d2 AS dst_doc, i * 1.0 / s1.n AS c
            FROM inter JOIN sz s1 ON s1.doc_id = d1
            UNION ALL
            SELECT d2 AS src_doc, d1 AS dst_doc, i * 1.0 / s2.n AS c
            FROM inter JOIN sz s2 ON s2.doc_id = d2
        )
        SELECT src_doc, dst_doc, ROUND(c, 4) AS containment
        FROM directed
        WHERE c >= {CONTAIN_THRESHOLD}
        ORDER BY src_doc, dst_doc
    """,
)
def q_k67_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = TX.shingle_rows(docs, "doc_id", "text", 3, hashed=True)
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        tok.alias("a")
        .join(tok.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("i"))
    )
    fwd = inter.join(
        sizes.alias("s1"), F.col("d1") == F.col("s1.doc_id")
    ).select(
        F.col("d1").alias("src_doc"),
        F.col("d2").alias("dst_doc"),
        (F.col("i") * 1.0 / F.col("s1.n")).alias("c"),
    )
    rev = inter.join(
        sizes.alias("s2"), F.col("d2") == F.col("s2.doc_id")
    ).select(
        F.col("d2").alias("src_doc"),
        F.col("d1").alias("dst_doc"),
        (F.col("i") * 1.0 / F.col("s2.n")).alias("c"),
    )
    return (
        fwd.unionByName(rev)
        .filter(F.col("c") >= CONTAIN_THRESHOLD)
        .select("src_doc", "dst_doc", F.round("c", 4).alias("containment"))
        .orderBy("src_doc", "dst_doc")
    )


# --------------------------------------------------------------------------
# q_k68 — feature-hashed bag-of-words document vectors
# --------------------------------------------------------------------------
@register(
    "q_k68_feature_hash_vectors",
    family="K",
    doc="K-68 hashing-trick doc vectors (Weinberger 2009): md5-bucket "
    "every token into 64 dims, L2-normalize the per-doc tf vector. "
    "Long-form (doc_id, bucket, weight) output value-hashes the whole "
    "vector cross-engine. Two groupBys over (doc, bucket) — map-side "
    "combined, no broadcast, no window; the norm is an exact integer "
    "sum-of-squares per doc.",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5('fh' || unnest(string_split(text, ' '))), 1, 8))
                        AS UBIGINT) % {FHASH_BUCKETS} AS b
            FROM documents
        ),
        tf AS (SELECT doc_id, b, COUNT(*) AS c FROM tok GROUP BY doc_id, b),
        nrm AS (SELECT doc_id, sqrt(SUM(c * c)) AS l2 FROM tf GROUP BY doc_id)
        SELECT tf.doc_id, CAST(tf.b AS BIGINT) AS bucket,
               ROUND(tf.c / nrm.l2, 4) AS weight
        FROM tf JOIN nrm ON nrm.doc_id = tf.doc_id
        ORDER BY tf.doc_id, bucket
    """,
)
def q_k68_feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("w")
    ).select("doc_id", _md5_bucket(F.col("w"), "fh", FHASH_BUCKETS).alias("b"))
    tf = tok.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    nrm = tf.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("l2")
    )
    return (
        tf.join(nrm, "doc_id")
        .select(
            "doc_id",
            F.col("b").cast("bigint").alias("bucket"),
            F.round(F.col("c") / F.col("l2"), 4).alias("weight"),
        )
        .orderBy("doc_id", "bucket")
    )


# --------------------------------------------------------------------------
# q_k69 — n-gram novelty (marginal-novelty curve)
# --------------------------------------------------------------------------
@register(
    "q_k69_ngram_novelty",
    family="K",
    doc="K-69 marginal n-gram novelty: per doc, the fraction of its "
    "distinct trigrams whose corpus-wide first appearance (min doc_id) "
    "is this doc — the curve that tells a dedup planner how much new "
    "content each successive document contributes. One shingle frame "
    "feeds both the first-seen table (gram-keyed groupBy, xxhash64 "
    "keys) and the per-doc counts; the join back is gram-keyed, "
    "never doc×doc.",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 2 <= len(ws)
        ),
        first_seen AS (SELECT s, MIN(doc_id) AS fd FROM sh GROUP BY s)
        SELECT sh.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN fs.fd = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel,
               ROUND(SUM(CASE WHEN fs.fd = sh.doc_id THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 4) AS novelty
        FROM sh JOIN first_seen fs ON fs.s = sh.s
        GROUP BY sh.doc_id
        ORDER BY sh.doc_id
    """,
)
def q_k69_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sh = TX.shingle_rows(docs, "doc_id", "text", 3, hashed=True)
    first_seen = sh.groupBy("s").agg(F.min("doc_id").alias("fd"))
    flagged = sh.join(first_seen, "s").select(
        "doc_id", (F.col("fd") == F.col("doc_id")).cast("int").alias("nv")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum("nv").cast("bigint").alias("n_novel"),
            F.round(F.sum("nv") * 1.0 / F.count("*"), 4).alias("novelty"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q_k70 — IDF rarity score
# --------------------------------------------------------------------------
@register(
    "q_k70_idf_rarity",
    family="K",
    doc="K-70 document rarity: mean smoothed IDF ln((N+1)/(df+1)) over "
    "a doc's token INSTANCES — boilerplate-heavy docs score low, "
    "rare-term docs high; the scalar twin of q_k48's per-term TF-IDF. "
    "The IDF table is vocabulary-bounded and broadcast; per-doc sums "
    "multiply each 8dp-rounded decimal term by the in-doc count "
    "(exact), so the score hash-checks bit-for-bit.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        dtc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
        df AS (SELECT t, COUNT(*) AS d FROM dtc GROUP BY t),
        n AS (SELECT COUNT(*) AS nd FROM documents),
        idf AS (
            SELECT t, CAST(ROUND(ln((n.nd + 1.0) / (df.d + 1.0)), 8)
                           AS DECIMAL(18, 8)) AS w
            FROM df CROSS JOIN n
        )
        SELECT dtc.doc_id,
               CAST(SUM(dtc.c) AS BIGINT) AS n_tokens,
               ROUND(CAST(SUM(CAST(dtc.c AS DECIMAL(12, 0)) * idf.w) AS DOUBLE)
                     / SUM(dtc.c), 4) AS mean_idf
        FROM dtc JOIN idf ON idf.t = dtc.t
        GROUP BY dtc.doc_id
        ORDER BY dtc.doc_id
    """,
)
def q_k70_idf_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("t"))
    dtc = tok.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    df_t = dtc.groupBy("t").agg(F.count("*").alias("d"))
    n = docs.agg(F.count("*").alias("nd"))
    idf = df_t.crossJoin(F.broadcast(n)).select(
        "t",
        F.round(F.log((F.col("nd") + 1.0) / (F.col("d") + 1.0)), 8)
        .cast("decimal(18,8)")
        .alias("w"),
    )
    return (
        dtc.join(F.broadcast(idf), "t")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.col("c").cast("decimal(12,0)") * F.col("w")).cast("double")
                / F.sum("c"),
                4,
            ).alias("mean_idf"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q_k71 — Gopher quality rule battery
# --------------------------------------------------------------------------
#: q_k71's full oracle SQL, module-level so q_k76's cleaning-yield
#: report (queries/llm_audit.py) can wrap the IDENTICAL rule-battery
#: SQL as a subquery — one screen definition, two audits.
K71_ORACLE = f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS nw,
                   len(list_distinct(string_split(text, ' '))) AS nd,
                   len(list_filter(list_distinct(string_split(text, ' ')),
                       w -> w IN ('the', 'a', 'of', 'and', 'to'))) AS nstop,
                   (length(text) - len(string_split(text, ' ')) + 1) * 1.0
                       / len(string_split(text, ' ')) AS mwl
            FROM documents
        ),
        topw AS (
            SELECT doc_id, MAX(c) AS topc FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                      FROM documents)
                GROUP BY doc_id, t
            ) GROUP BY doc_id
        ),
        flags AS (
            SELECT base.doc_id,
                   nw BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS wc_ok,
                   mwl BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI} AS mwl_ok,
                   nstop >= {GOPHER_MIN_STOPWORDS} AS stop_ok,
                   nd * 1.0 / nw >= {GOPHER_MIN_TTR} AS ttr_ok,
                   topw.topc * 1.0 / nw <= {GOPHER_MAX_TOPWORD_FRAC} AS rep_ok
            FROM base JOIN topw ON topw.doc_id = base.doc_id
        )
        SELECT doc_id, wc_ok, mwl_ok, stop_ok, ttr_ok, rep_ok,
               wc_ok AND mwl_ok AND stop_ok AND ttr_ok AND rep_ok AS keep
        FROM flags
        ORDER BY doc_id
    """


@register(
    "q_k71_gopher_rules",
    family="K",
    doc="K-71 Gopher rule battery (Rae 2021 Table A1 shape): word-count "
    "bounds, mean-word-length window, minimum distinct stopwords, "
    "type-token floor, top-word repetition cap — per-doc booleans plus "
    "the conjunctive keep. Pure per-row expressions except the "
    "top-word count (one (doc, word) groupBy, map-side combined); "
    "every comparison runs on identical integer-derived doubles in "
    "both engines so the booleans cannot straddle a boundary "
    "differently.",
    oracle=K71_ORACLE,
)
def q_k71_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(ws).alias("nw"),
        F.size(F.array_distinct(ws)).alias("nd"),
        F.size(
            F.filter(F.array_distinct(ws), lambda w: w.isin(*_STOPWORDS))
        ).alias("nstop"),
        (
            (F.length("text") - F.size(ws) + 1) * 1.0 / F.size(ws)
        ).alias("mwl"),
    )
    topw = (
        docs.select("doc_id", F.explode(ws).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("topc"))
    )
    flags = base.join(topw, "doc_id").select(
        "doc_id",
        F.col("nw").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS).alias("wc_ok"),
        F.col("mwl").between(GOPHER_MWL_LO, GOPHER_MWL_HI).alias("mwl_ok"),
        (F.col("nstop") >= GOPHER_MIN_STOPWORDS).alias("stop_ok"),
        (F.col("nd") * 1.0 / F.col("nw") >= GOPHER_MIN_TTR).alias("ttr_ok"),
        (F.col("topc") * 1.0 / F.col("nw") <= GOPHER_MAX_TOPWORD_FRAC).alias("rep_ok"),
    )
    return flags.select(
        "doc_id",
        "wc_ok",
        "mwl_ok",
        "stop_ok",
        "ttr_ok",
        "rep_ok",
        (
            F.col("wc_ok")
            & F.col("mwl_ok")
            & F.col("stop_ok")
            & F.col("ttr_ok")
            & F.col("rep_ok")
        ).alias("keep"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# q_k72 — within-document token entropy
# --------------------------------------------------------------------------
@register(
    "q_k72_token_entropy",
    family="K",
    doc="K-72 within-doc Shannon entropy of the unigram distribution: "
    "H = -(1/n) Σ c_t · ln(c_t/n) — the repetition/diversity scalar "
    "(loops and boilerplate score low). One (doc, token) groupBy; "
    "each ln term is 8dp-rounded and DECIMAL-summed, the final "
    "division happens on identical doubles in both engines.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
        ),
        dtc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
        sz AS (SELECT doc_id, SUM(c) AS n FROM dtc GROUP BY doc_id),
        terms AS (
            SELECT dtc.doc_id, sz.n,
                   CAST(dtc.c AS DECIMAL(12, 0))
                     * CAST(ROUND(ln(dtc.c * 1.0 / sz.n), 8)
                            AS DECIMAL(18, 8)) AS lt
            FROM dtc JOIN sz ON sz.doc_id = dtc.doc_id
        )
        SELECT doc_id,
               CAST(MIN(n) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               ROUND(-CAST(SUM(lt) AS DOUBLE) / MIN(n), 4) AS entropy
        FROM terms
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def q_k72_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("t"))
    dtc = tok.groupBy("doc_id", "t").agg(F.count("*").alias("c"))
    sz = dtc.groupBy("doc_id").agg(F.sum("c").alias("n"))
    terms = dtc.join(sz, "doc_id").select(
        "doc_id",
        "n",
        (
            F.col("c").cast("decimal(12,0)")
            * F.round(F.log(F.col("c") * 1.0 / F.col("n")), 8).cast("decimal(18,8)")
        ).alias("lt"),
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.min("n").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_distinct"),
            F.round(-F.sum("lt").cast("double") / F.min("n"), 4).alias("entropy"),
        )
        .orderBy("doc_id")
    )


#: q_k115 candidate grids (percent thresholds), spanning the fixture
#: distributions (TTR 0.28-1.0 median 0.46; top-word frac 0.05-0.30
#: median 0.09) so every curve has both passing and failing mass.
TTR_GRID = (30, 40, 50, 60, 70)
REP_GRID = (5, 10, 15, 20, 25)


# --------------------------------------------------------------------------
# q_k115 — quality-threshold sensitivity sweep
# --------------------------------------------------------------------------
@register(
    "q_k115_threshold_sensitivity",
    family="K",
    doc="K-115 quality-threshold sensitivity sweep: for the two "
    "continuous Gopher screens (type-token floor, top-word repetition "
    "cap — q_k71's ttr_ok/rep_ok), how many documents pass at each "
    "candidate percent threshold. The tuning table read before "
    "committing to a cut: a steep step between adjacent thresholds "
    "means the screen is load-bearing there; a flat one means the "
    "knob is free. Every comparison is EXACT integer algebra "
    "(nd·100 ≥ t·nw, topc·100 ≤ t·nw — no float ratio ever computed), "
    "so the whole count table is bit-identical cross-engine; "
    "pass_frac is one 4dp division of exact counts. Scale: the q_k71 "
    "per-doc stats pass (one (doc, word) top-word aggregate) + a "
    "constant 10-way threshold explode + one hash aggregate.",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS nw,
                   len(list_distinct(string_split(text, ' '))) AS nd
            FROM documents
        ),
        topw AS (
            SELECT doc_id, MAX(c) AS topc FROM (
                SELECT doc_id, COUNT(*) AS c
                FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                      FROM documents)
                GROUP BY doc_id, t
            ) GROUP BY doc_id
        ),
        stats AS (
            SELECT base.doc_id, nw, nd, topc
            FROM base JOIN topw ON topw.doc_id = base.doc_id
        ),
        grid AS (
            SELECT 'ttr_floor' AS rule, t
            FROM (VALUES {", ".join(f"({t})" for t in TTR_GRID)}) g(t)
            UNION ALL
            SELECT 'rep_cap' AS rule, t
            FROM (VALUES {", ".join(f"({t})" for t in REP_GRID)}) g(t)
        )
        SELECT grid.rule,
               CAST(grid.t AS BIGINT) AS threshold_pct,
               CAST(SUM(CASE WHEN (grid.rule = 'ttr_floor' AND nd * 100 >= grid.t * nw)
                               OR (grid.rule = 'rep_cap' AND topc * 100 <= grid.t * nw)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               ROUND(SUM(CASE WHEN (grid.rule = 'ttr_floor' AND nd * 100 >= grid.t * nw)
                                OR (grid.rule = 'rep_cap' AND topc * 100 <= grid.t * nw)
                              THEN 1 ELSE 0 END) / (1.0 * COUNT(*)), 4) AS pass_frac
        FROM stats CROSS JOIN grid
        GROUP BY grid.rule, grid.t
        ORDER BY rule, threshold_pct
    """,
)
def q_k115_threshold_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    ws = words(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(ws).alias("nw"),
        F.size(F.array_distinct(ws)).alias("nd"),
    )
    topw = (
        docs.select("doc_id", F.explode(ws).alias("t"))
        .groupBy("doc_id", "t")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("topc"))
    )
    stats = base.join(topw, "doc_id")
    grid = spark.createDataFrame(
        [("ttr_floor", t) for t in TTR_GRID] + [("rep_cap", t) for t in REP_GRID],
        "rule string, t int",
    )
    passes = F.when(
        (
            (F.col("rule") == "ttr_floor")
            & (F.col("nd") * 100 >= F.col("t") * F.col("nw"))
        )
        | (
            (F.col("rule") == "rep_cap")
            & (F.col("topc") * 100 <= F.col("t") * F.col("nw"))
        ),
        1,
    ).otherwise(0)
    return (
        stats.crossJoin(F.broadcast(grid))
        .groupBy("rule", "t")
        .agg(
            F.sum(passes).cast("bigint").alias("n_pass"),
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum(passes) / (1.0 * F.count("*")), 4).alias("pass_frac"),
        )
        .select(
            "rule",
            F.col("t").cast("bigint").alias("threshold_pct"),
            "n_pass",
            "n_docs",
            "pass_frac",
        )
        .orderBy("rule", "threshold_pct")
    )


# --------------------------------------------------------------------------
# q_k117 — per-source bigram conditional-entropy rate
# --------------------------------------------------------------------------
@register(
    "q_k117_bigram_entropy_rate",
    family="K",
    doc="K-117 per-source conditional entropy rate H(w2|w1) = "
    "H(bigram) - H(context): the sequence-level templatedness screen "
    "that q_k72's WITHIN-DOC unigram entropy and q_k100's distinct-n "
    "ratios both miss — a source can have diverse vocabulary yet "
    "near-deterministic transitions (boilerplate with slot-filling "
    "scores low here and normal on both of those). Shannon (1948) "
    "entropy-rate estimate from bigram/context multiset counts; one "
    "posexplode + lead() window builds the bigram multiset "
    "(functions/text.py shingle_rows k=2, distinct=False — linear, "
    "codegen, no interpreted HOF), everything after is two hash "
    "aggregates over (source, gram) plus vocabulary-bounded frames. "
    "Each ln term is 8dp-rounded and DECIMAL-summed (the q_k72 "
    "convention) so the per-source sums are order-independent and "
    "bit-identical cross-engine; divisions and the final subtraction "
    "run on identical doubles.",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        bg AS (
            SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 1 <= len(ws)
        ),
        joint AS (
            SELECT d.source, bg.s, MIN(bg.w1) AS w1, COUNT(*) AS c
            FROM bg JOIN documents d USING (doc_id)
            GROUP BY d.source, bg.s
        ),
        ntot AS (
            SELECT source, SUM(c) AS n, COUNT(*) AS nd
            FROM joint GROUP BY source
        ),
        ctx AS (
            SELECT source, w1, SUM(c) AS cc FROM joint GROUP BY source, w1
        ),
        sb AS (
            SELECT joint.source,
                   SUM(CAST(joint.c AS DECIMAL(12, 0))
                       * CAST(ROUND(ln(joint.c * 1.0 / ntot.n), 8)
                              AS DECIMAL(18, 8))) AS lb
            FROM joint JOIN ntot USING (source)
            GROUP BY joint.source
        ),
        sc AS (
            SELECT ctx.source,
                   SUM(CAST(ctx.cc AS DECIMAL(12, 0))
                       * CAST(ROUND(ln(ctx.cc * 1.0 / ntot.n), 8)
                              AS DECIMAL(18, 8))) AS lc
            FROM ctx JOIN ntot USING (source)
            GROUP BY ctx.source
        )
        SELECT ntot.source,
               CAST(ntot.n AS BIGINT) AS n_bigrams,
               CAST(ntot.nd AS BIGINT) AS n_distinct_bigrams,
               ROUND(-CAST(sb.lb AS DOUBLE) / ntot.n, 4) AS h_bigram,
               ROUND(-CAST(sc.lc AS DOUBLE) / ntot.n, 4) AS h_context,
               ROUND((-CAST(sb.lb AS DOUBLE) / ntot.n)
                     - (-CAST(sc.lc AS DOUBLE) / ntot.n), 4) AS entropy_rate
        FROM ntot
        JOIN sb USING (source)
        JOIN sc USING (source)
        ORDER BY source
    """,
)
def q_k117_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions.text import shingle_rows

    docs = load(spark, sf_dir, "documents")
    bg = shingle_rows(
        docs.select("doc_id", "text"), k=2, distinct=False
    )
    joint = (
        bg.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source", "s")
        .agg(F.count("*").alias("c"))
        .withColumn("w1", F.substring_index("s", " ", 1))
    )
    ntot = joint.groupBy("source").agg(
        F.sum("c").alias("n"), F.count("*").alias("nd")
    )
    ctx = joint.groupBy("source", "w1").agg(F.sum("c").alias("cc"))

    def lterm(cnt):
        return (
            cnt.cast("decimal(12,0)")
            * F.round(F.log(cnt * 1.0 / F.col("n")), 8).cast("decimal(18,8)")
        )

    sb = (
        joint.join(ntot, "source")
        .select("source", lterm(F.col("c")).alias("lt"))
        .groupBy("source")
        .agg(F.sum("lt").alias("lb"))
    )
    sc = (
        ctx.join(ntot, "source")
        .select("source", lterm(F.col("cc")).alias("lt"))
        .groupBy("source")
        .agg(F.sum("lt").alias("lc"))
    )
    hb = -F.col("lb").cast("double") / F.col("n")
    hc = -F.col("lc").cast("double") / F.col("n")
    return (
        ntot.join(sb, "source")
        .join(sc, "source")
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_bigrams"),
            F.col("nd").cast("bigint").alias("n_distinct_bigrams"),
            F.round(hb, 4).alias("h_bigram"),
            F.round(hc, 4).alias("h_context"),
            F.round(hb - hc, 4).alias("entropy_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q_k124 — per-document context-gain screen (doc-local templatedness)
# --------------------------------------------------------------------------

#: Histogram cell width for the context-gain value (nats) and cap:
#: cells 0..15 of 0.25 nats, so the table is fixed-width at any scale.
CTX_GAIN_BUCKET_W = 4  # buckets per nat (width = 1/4)
CTX_GAIN_BUCKET_MAX = 15

K124_ORACLE = f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
    tok AS (
        SELECT doc_id, ws[i] AS t
        FROM w CROSS JOIN generate_series(1, 100000) g(i)
        WHERE i <= len(ws)
    ),
    uni AS (SELECT doc_id, t, COUNT(*) AS u FROM tok GROUP BY doc_id, t),
    m AS (SELECT doc_id, SUM(u) AS m FROM uni GROUP BY doc_id),
    hu AS (
        SELECT uni.doc_id,
               SUM(CAST(uni.u AS DECIMAL(12, 0))
                   * CAST(ROUND(ln(uni.u * 1.0 / m.m), 8)
                          AS DECIMAL(18, 8))) AS lu
        FROM uni JOIN m USING (doc_id) GROUP BY uni.doc_id
    ),
    bg AS (
        SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS s
        FROM w CROSS JOIN generate_series(1, 100000) g(i)
        WHERE i + 1 <= len(ws)
    ),
    joint AS (
        SELECT doc_id, s, MIN(w1) AS w1, COUNT(*) AS c
        FROM bg GROUP BY doc_id, s
    ),
    n AS (SELECT doc_id, SUM(c) AS n FROM joint GROUP BY doc_id),
    lb AS (
        SELECT joint.doc_id,
               SUM(CAST(joint.c AS DECIMAL(12, 0))
                   * CAST(ROUND(ln(joint.c * 1.0 / n.n), 8)
                          AS DECIMAL(18, 8))) AS lb
        FROM joint JOIN n USING (doc_id) GROUP BY joint.doc_id
    ),
    ctx AS (
        SELECT doc_id, w1, SUM(c) AS cc FROM joint GROUP BY doc_id, w1
    ),
    lc AS (
        SELECT ctx.doc_id,
               SUM(CAST(ctx.cc AS DECIMAL(12, 0))
                   * CAST(ROUND(ln(ctx.cc * 1.0 / n.n), 8)
                          AS DECIMAL(18, 8))) AS lc
        FROM ctx JOIN n USING (doc_id) GROUP BY ctx.doc_id
    ),
    gap AS (
        SELECT d.doc_id, d.source, m.m,
               CASE WHEN n.n IS NULL THEN NULL
                    ELSE ROUND((-CAST(hu.lu AS DOUBLE) / m.m)
                               - ((-CAST(lb.lb AS DOUBLE) / n.n)
                                  - (-CAST(lc.lc AS DOUBLE) / n.n)), 4)
               END AS gap4
        FROM documents d
        JOIN m USING (doc_id)
        JOIN hu USING (doc_id)
        LEFT JOIN n USING (doc_id)
        LEFT JOIN lb USING (doc_id)
        LEFT JOIN lc USING (doc_id)
    )
    SELECT source,
           CAST(CASE WHEN gap4 IS NULL THEN -1
                ELSE LEAST({CTX_GAIN_BUCKET_MAX},
                           GREATEST(0, CAST(FLOOR(gap4 * {CTX_GAIN_BUCKET_W})
                                            AS BIGINT))) END AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(m) AS BIGINT) AS tokens
    FROM gap
    GROUP BY source, bucket
    ORDER BY source, bucket
"""


@register(
    "q_k124_context_gain_screen",
    family="K",
    doc="K-124 per-document context gain: I ~ H_doc(unigram) - "
    "H_doc(w2|w1), each computed from the DOC'S OWN token/bigram "
    "multisets — how much knowing the previous word compresses the "
    "next. Templated/slot-filled documents score HIGH (transitions "
    "near-deterministic relative to their vocabulary); q_k72 (doc "
    "unigram entropy) and q_k117 (SOURCE-level conditional rate) both "
    "miss this doc-granular axis. Histogram per source: cells of "
    f"1/{CTX_GAIN_BUCKET_W} nat clamped to [0, {CTX_GAIN_BUCKET_MAX}] "
    "(fixed-width output at any scale), docs without a bigram at "
    "bucket -1. Every ln term 8dp-rounded and DECIMAL-summed (the "
    "q_k72/q_k117 convention); the gap is one double expression of "
    "those exact sums, 4dp-rounded BEFORE bucketing so both engines "
    "floor the same double. Plan: doc-keyed hash aggregates only — "
    "no corpus-wide window, no join wider than (doc, gram).",
    oracle=K124_ORACLE,
)
def q_k124_context_gain_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions.text import shingle_rows, words

    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("t"))
    uni = tok.groupBy("doc_id", "t").agg(F.count("*").alias("u"))
    m = uni.groupBy("doc_id").agg(F.sum("u").alias("m"))

    def lterm(cnt, tot):
        return cnt.cast("decimal(12,0)") * F.round(
            F.log(cnt * 1.0 / tot), 8
        ).cast("decimal(18,8)")

    hu = (
        uni.join(m, "doc_id")
        .select("doc_id", lterm(F.col("u"), F.col("m")).alias("lt"))
        .groupBy("doc_id")
        .agg(F.sum("lt").alias("lu"))
    )
    joint = (
        shingle_rows(docs.select("doc_id", "text"), k=2, distinct=False)
        .groupBy("doc_id", "s")
        .agg(F.count("*").alias("c"))
        .withColumn("w1", F.substring_index("s", " ", 1))
    )
    n = joint.groupBy("doc_id").agg(F.sum("c").alias("n"))
    lb = (
        joint.join(n, "doc_id")
        .select("doc_id", lterm(F.col("c"), F.col("n")).alias("lt"))
        .groupBy("doc_id")
        .agg(F.sum("lt").alias("lb"))
    )
    ctx = joint.groupBy("doc_id", "w1").agg(F.sum("c").alias("cc"))
    lc = (
        ctx.join(n, "doc_id")
        .select("doc_id", lterm(F.col("cc"), F.col("n")).alias("lt"))
        .groupBy("doc_id")
        .agg(F.sum("lt").alias("lc"))
    )
    gap = (
        docs.select("doc_id", "source")
        .join(m, "doc_id")
        .join(hu, "doc_id")
        .join(n, "doc_id", "left")
        .join(lb, "doc_id", "left")
        .join(lc, "doc_id", "left")
        .select(
            "source",
            "m",
            F.when(
                F.col("n").isNotNull(),
                F.round(
                    (-F.col("lu").cast("double") / F.col("m"))
                    - (
                        (-F.col("lb").cast("double") / F.col("n"))
                        - (-F.col("lc").cast("double") / F.col("n"))
                    ),
                    4,
                ),
            ).alias("gap4"),
        )
    )
    bucket = (
        F.when(F.col("gap4").isNull(), F.lit(-1))
        .otherwise(
            F.least(
                F.lit(CTX_GAIN_BUCKET_MAX),
                F.greatest(
                    F.lit(0),
                    F.floor(F.col("gap4") * CTX_GAIN_BUCKET_W).cast("int"),
                ),
            )
        )
        .cast("bigint")
    )
    return (
        gap.select("source", bucket.alias("bucket"), "m")
        .groupBy("source", "bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("m").cast("bigint").alias("tokens"),
        )
        .orderBy("source", "bucket")
    )
