"""Family K extensions: corpus-quality and mix-construction operators a
pretraining data pipeline runs at 100 TB (north star; public method
references: the Gopher/MassiveText repetition filters, GPT-3/Llama
n-gram decontamination, mix rebalancing by token budget).

All three are fully DuckDB-oracle-checked. q_k18 deliberately emits
exact integer counts (numerator/denominator pairs) rather than rounded
ratios: small-integer quotients land exactly on ROUND's .00005
boundaries where the engines break ties differently (HALF_UP vs
HALF_EVEN) — see the canonicalization notes in registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import n_words, shingle_rows, words
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load


@register(
    "q_k18_repetition_quality",
    family="K",
    doc="Gopher-style repetition signals per document: most-frequent "
    "unigram/bigram multiplicity vs totals, and distinct-vs-total "
    "trigram counts (duplicate-trigram mass). Consumers threshold the "
    "ratios; the query ships exact integers so the oracle hash is "
    "float-free. One shingling pass per n-gram order, counts on "
    "xxhash64'd grams — no strings in any shuffle.",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        tok AS (SELECT doc_id, unnest(ws) AS wd FROM w),
        uni AS (
            SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_uni_c,
                   CAST(SUM(c) AS BIGINT) AS n_tok
            FROM (SELECT doc_id, wd, COUNT(*) c FROM tok GROUP BY 1, 2)
            GROUP BY doc_id
        ),
        bi0 AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 1 <= len(ws)
        ),
        bi AS (
            SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bi_c,
                   CAST(SUM(c) AS BIGINT) AS n_bi
            FROM (SELECT doc_id, s, COUNT(*) c FROM bi0 GROUP BY 1, 2)
            GROUP BY doc_id
        ),
        tri0 AS (
            SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 2 <= len(ws)
        ),
        tri AS (
            SELECT doc_id, COUNT(*) AS n_tri,
                   COUNT(DISTINCT s) AS n_tri_distinct
            FROM tri0 GROUP BY doc_id
        )
        SELECT doc_id, n_tok, top_uni_c, n_bi, top_bi_c, n_tri, n_tri_distinct
        FROM uni JOIN bi USING (doc_id) JOIN tri USING (doc_id)
        ORDER BY doc_id
    """,
)
def q_k18_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("wd"))
    uni = (
        tok.groupBy("doc_id", "wd")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_uni_c"), F.sum("c").alias("n_tok"))
    )
    bi = (
        shingle_rows(docs, "doc_id", "text", 2, hashed=True, distinct=False)
        .groupBy("doc_id", "s")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bi_c"), F.sum("c").alias("n_bi"))
    )
    tri = shingle_rows(docs, "doc_id", "text", 3, hashed=True, distinct=False).groupBy(
        "doc_id"
    ).agg(F.count("*").alias("n_tri"), F.count_distinct("s").alias("n_tri_distinct"))
    return (
        uni.join(bi, "doc_id")
        .join(tri, "doc_id")
        .select("doc_id", "n_tok", "top_uni_c", "n_bi", "top_bi_c", "n_tri", "n_tri_distinct")
        .orderBy("doc_id")
    )


@register(
    "q_k19_decontamination",
    family="K",
    doc="Benchmark decontamination (operators/decontaminate.py): corpus "
    "docs (doc_id >= 20) sharing any 5-gram with the eval slice "
    "(doc_id < 20), with the distinct shared-gram count as severity. "
    "Eval grams broadcast; the corpus side never shuffles beyond its "
    "own shingling.",
    oracle="""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT doc_id,
                   ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                         || ws[i+3] || ' ' || ws[i+4] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 4 <= len(ws)
        ),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id < 20)
        SELECT sh.doc_id, COUNT(*) AS n_shared
        FROM sh JOIN ev USING (s)
        WHERE sh.doc_id >= 20
        GROUP BY sh.doc_id
        ORDER BY sh.doc_id
    """,
)
def q_k19_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.decontaminate import ngram_contamination

    docs = load(spark, sf_dir, "documents")
    hits = ngram_contamination(
        corpus=docs.filter(F.col("doc_id") >= 20),
        eval_docs=docs.filter(F.col("doc_id") < 20),
        k=5,
    )
    return hits.orderBy("doc_id")


@register(
    "q_k20_source_mixing",
    family="K",
    doc="Deterministic source-mix rebalancing (operators/mixing.py): "
    "every source downsampled to the smallest source's token count via "
    "a content-keyed md5 draw — the EXACT sampled set reproduces in "
    "DuckDB from the same md5 hex, so the mix decision itself is "
    "oracle-checked, not just its row counts.",
    oracle="""
        WITH sized AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                       / 4294967296.0 AS u
            FROM documents
        ),
        tot AS (
            SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
                   COUNT(*) AS total_docs
            FROM sized GROUP BY source
        ),
        rates AS (
            SELECT t.*, LEAST(1.0, (SELECT MIN(total_tokens) FROM tot) * 1.0
                                   / t.total_tokens) AS rate
            FROM tot t
        )
        SELECT r.source, r.total_docs, r.total_tokens,
               COUNT(*) FILTER (WHERE s.u < r.rate) AS n_sampled,
               CAST(COALESCE(SUM(s.n_tok) FILTER (WHERE s.u < r.rate), 0) AS BIGINT)
                   AS tokens_sampled
        FROM rates r JOIN sized s USING (source)
        GROUP BY r.source, r.total_docs, r.total_tokens
        ORDER BY r.source
    """,
)
def q_k20_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.mixing import sample_to_token_budget

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", n_words(F.col("text")).cast("bigint").alias("n_tok")
    )
    flagged = sample_to_token_budget(sized, "source", "n_tok", "doc_id")
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("total_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.count_if("sampled").alias("n_sampled"),
            F.coalesce(
                F.sum(F.when(F.col("sampled"), F.col("n_tok"))), F.lit(0)
            ).cast("bigint").alias("tokens_sampled"),
        )
        .orderBy("source")
    )


@register(
    "q_k26_vocabulary",
    family="K",
    doc="Corpus vocabulary: term frequency + document frequency per "
    "word, top-100 by tf. Map-side partial aggregation collapses each "
    "partition to its distinct words before the shuffle; the final "
    "top-k is a TakeOrdered, not a global sort.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        v AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS tf,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM tok GROUP BY w
        )
        SELECT w, tf, df FROM v
        ORDER BY tf DESC, w LIMIT 100
    """,
)
def q_k26_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    return (
        tok.groupBy("w")
        .agg(F.count("*").alias("tf"), F.count_distinct("doc_id").alias("df"))
        .orderBy(F.col("tf").desc(), "w")
        .limit(100)
    )


@register(
    "q_k27_unigram_lm_score",
    family="K",
    doc="Unigram-LM cross-entropy per document (the KenLM-proxy quality "
    "filter): fit p(w) = tf/T on the corpus, score each doc as "
    "-(1/n)*sum(ln p(w)). Per-word logs are rounded to 8 decimals and "
    "summed as DECIMAL so the sum is order-independent and bit-equal "
    "across engines; the O(vocab) probability table broadcasts.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        v AS (SELECT w, COUNT(*) AS tf FROM tok GROUP BY w),
        t AS (SELECT SUM(tf) AS total FROM v),
        lp AS (
            SELECT w, CAST(ROUND(ln(tf * 1.0 / total), 8) AS DECIMAL(18, 8)) AS lw
            FROM v CROSS JOIN t
        )
        SELECT tok.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               ROUND(-SUM(lw) / COUNT(*), 4) AS cross_entropy
        FROM tok JOIN lp USING (w)
        GROUP BY tok.doc_id
        ORDER BY tok.doc_id
    """,
)
def q_k27_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    v = tok.groupBy("w").agg(F.count("*").alias("tf"))
    total = v.agg(F.sum("tf").alias("total"))
    lp = v.crossJoin(F.broadcast(total)).select(
        "w",
        F.round(F.log(F.col("tf") * 1.0 / F.col("total")), 8)
        .cast("decimal(18,8)")
        .alias("lw"),
    )
    return (
        tok.join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(-F.sum("lw") / F.count("*"), 4).cast("double").alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_k38_corpus_drift_psi",
    family="K",
    doc="Corpus drift monitoring: population-stability index between "
    "two source cohorts over doc-length buckets — the report a data-ops "
    "team schedules to catch a crawler/source distribution shift before "
    "it poisons a training mix. Bucket counts are one partial+final "
    "agg; the PSI total is a window over <=10 bucket rows (bounded by "
    "construction, not by data). Laplace-smoothed ratios; per-bucket "
    "contributions rounded then DECIMAL-summed (the q_k27 pattern) so "
    "the total is bit-stable cross-engine.",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN CAST(substr(source, 4) AS INT) < 10
                        THEN 'ref' ELSE 'new' END AS cohort,
                   LEAST(CAST(FLOOR(n_chars / 64.0) AS INT), 9) AS bucket
            FROM documents
        ),
        cnt AS (
            SELECT bucket,
                   COUNT(*) FILTER (WHERE cohort = 'ref') AS n_ref,
                   COUNT(*) FILTER (WHERE cohort = 'new') AS n_new
            FROM b GROUP BY bucket
        ),
        tot AS (SELECT SUM(n_ref) AS t_ref, SUM(n_new) AS t_new FROM cnt),
        ratio AS (
            SELECT bucket,
                   (n_ref + 1.0) / (t_ref + 10.0) AS p,
                   (n_new + 1.0) / (t_new + 10.0) AS q
            FROM cnt, tot
        )
        SELECT bucket,
               ROUND(p, 6) AS p_ref,
               ROUND(q, 6) AS p_new,
               ROUND((p - q) * ln(p / q), 8) AS contrib,
               CAST(SUM(CAST(ROUND((p - q) * ln(p / q), 8) AS DECIMAL(18,8)))
                    OVER () AS DOUBLE) AS psi_total
        FROM ratio
        ORDER BY bucket
    """,
)
def q_k38_corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    b = docs.select(
        F.when(F.substring("source", 4, 10).cast("int") < 10, "ref")
        .otherwise("new")
        .alias("cohort"),
        F.least(F.floor(F.col("n_chars") / 64.0).cast("int"), F.lit(9)).alias("bucket"),
    )
    cnt = b.groupBy("bucket").agg(
        F.count(F.when(F.col("cohort") == "ref", 1)).alias("n_ref"),
        F.count(F.when(F.col("cohort") == "new", 1)).alias("n_new"),
    )
    tot = cnt.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_new").alias("t_new")
    )
    ratio = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        ((F.col("n_ref") + 1.0) / (F.col("t_ref") + 10.0)).alias("p"),
        ((F.col("n_new") + 1.0) / (F.col("t_new") + 10.0)).alias("q"),
    )
    contrib = F.round((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")), 8)
    return ratio.select(
        "bucket",
        F.round("p", 6).alias("p_ref"),
        F.round("q", 6).alias("p_new"),
        contrib.alias("contrib"),
        F.sum(contrib.cast("decimal(18,8)"))
        .over(W.partitionBy())
        .cast("double")
        .alias("psi_total"),
    ).orderBy("bucket")


@register(
    "q_k43_zipf_slope",
    family="K",
    doc="Zipf heavy-tail diagnostic: fit ln(tf) ~ ln(rank) over the "
    "top-1000 vocabulary head. Natural corpora sit near slope -1; a "
    "flat slope flags synthetic/templated text. The regression moments "
    "(sums of x, y, xy, x^2) are DECIMAL(18,8)-cast per term before "
    "summing — the q_k27/q_k38 bit-stability convention — so the "
    "slope/intercept are independent of cross-engine summation order "
    "(regr_slope over 1000 raw doubles can flip a borderline 4dp "
    "rounding). Tokenization assumes single-space-joined text (repo-"
    "wide words()/string_split(' ') convention). Scale shape: the "
    "vocab agg is partial+final, the head is a TakeOrdered (never a "
    "global sort), and the rank window runs over 1000 rows only.",
    oracle="""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        v AS (SELECT w, COUNT(*) AS tf FROM tok GROUP BY w),
        top AS (SELECT w, tf FROM v ORDER BY tf DESC, w LIMIT 1000),
        r AS (
            SELECT tf, row_number() OVER (ORDER BY tf DESC, w) AS rnk FROM top
        ),
        d AS (
            SELECT CAST(ln(rnk) AS DECIMAL(18,8)) AS x,
                   CAST(ln(tf) AS DECIMAL(18,8)) AS y
            FROM r
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_ranks,
                   CAST(SUM(x) AS DOUBLE) AS sx,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(x * y) AS DOUBLE) AS sxy,
                   CAST(SUM(x * x) AS DOUBLE) AS sxx
            FROM d
        )
        SELECT n_ranks,
               ROUND((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx), 4)
                   AS zipf_slope,
               ROUND((sy - ((n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx)) * sx)
                     / n_ranks, 4) AS zipf_intercept
        FROM s
    """,
)
def q_k43_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(words(F.col("text"))).alias("w"))
    v = tok.groupBy("w").agg(F.count("*").alias("tf"))
    top = v.orderBy(F.col("tf").desc(), "w").limit(1000)
    r = top.select(
        "tf",
        F.row_number().over(W.orderBy(F.col("tf").desc(), "w")).alias("rnk"),
    )
    d = r.select(
        F.log("rnk").cast("decimal(18,8)").alias("x"),
        F.log("tf").cast("decimal(18,8)").alias("y"),
    )
    s = d.agg(
        F.count("*").alias("n_ranks"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    n = F.col("n_ranks").cast("double")
    sx, sy, sxy, sxx = F.col("sx"), F.col("sy"), F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        "n_ranks",
        F.round(slope, 4).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 4).alias("zipf_intercept"),
    )


@register(
    "q_k44_source_vocab_overlap",
    family="K",
    doc="Pairwise vocabulary Jaccard between sources — the redundancy/ "
    "contamination map a mix designer reads before weighting sources. "
    "Per-source vocab is a map-side partial distinct; the pair "
    "intersection is one equi-join on the word (hash the word to 8 "
    "bytes first at 100 TB); per-source sizes broadcast. Output is "
    "O(sources^2) rows. Tokenization parity note: Spark words() splits "
    "on \\s+ while the oracle splits on a literal space — identical "
    "only because the generated documents are single-space joined (the "
    "repo-wide convention; multi-space/tab text would diverge).",
    oracle="""
        WITH v AS (
            SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source),
        inter AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS common_words
            FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
            GROUP BY a.source, b.source
        )
        SELECT source_a, source_b, common_words,
               ROUND(common_words * 1.0 / (sa.n + sb.n - common_words), 4)
                   AS vocab_jaccard
        FROM inter
        JOIN sz sa ON sa.source = source_a
        JOIN sz sb ON sb.source = source_b
        ORDER BY source_a, source_b
    """,
)
def q_k44_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    v = docs.select("source", F.explode(words(F.col("text"))).alias("w")).distinct()
    sz = v.groupBy("source").agg(F.count("*").alias("n"))
    a = v.alias("a")
    b = v.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count("*").alias("common_words"))
    )
    sa = F.broadcast(sz.select(F.col("source").alias("source_a"), F.col("n").alias("na")))
    sb = F.broadcast(sz.select(F.col("source").alias("source_b"), F.col("n").alias("nb")))
    return (
        inter.join(sa, "source_a")
        .join(sb, "source_b")
        .select(
            "source_a",
            "source_b",
            "common_words",
            F.round(
                F.col("common_words") * 1.0
                / (F.col("na") + F.col("nb") - F.col("common_words")),
                4,
            ).alias("vocab_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


# --------------------------------------------------------------------------
# q_k93 — token-mass Gini concentration per source
# --------------------------------------------------------------------------
@register(
    "q_k93_token_gini",
    family="K",
    doc="K-93 token-mass concentration: per source, the exact Gini "
    "coefficient of per-document token counts — is the source's token "
    "mass spread across documents (G~0) or locked in a few giants "
    "(G~1)? The sampling/sharding diagnostic run before per-doc "
    "quotas (a high-Gini source defeats doc-count-based budgets, "
    "q_k78/q_k80). Computed via the q_k85 distinct-value "
    "decomposition so the sorted-rank formula needs NO per-doc "
    "window: group docs by (source, token-count), one window over "
    "the DISTINCT-VALUE table (value-keyed, bounded by max doc "
    "length), and each value-run's rank-weighted contribution "
    "t*(c*r + c(c+1)/2) is a closed-form integer — the whole "
    "numerator is DECIMAL-exact, floats enter only in the final "
    "division (6dp). SCALE: one metadata-light scan + a "
    "(source, value)-keyed agg; the window touches distinct values, "
    "never documents.",
    oracle="""
        WITH dt AS (
            SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS t
            FROM documents
        ),
        nv AS (
            SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
            FROM dt GROUP BY 1, 2
        ),
        cum AS (
            SELECT source, t, c,
                   CAST(SUM(c) OVER (PARTITION BY source ORDER BY t) - c
                        AS BIGINT) AS r
            FROM nv
        ),
        a AS (
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_docs,
                   CAST(SUM(t * c) AS BIGINT) AS total_tokens,
                   SUM(CAST(t * (c * r + (c * (c + 1)) // 2)
                            AS DECIMAL(38, 0))) AS wsum
            FROM cum GROUP BY source
        )
        SELECT source, n_docs, total_tokens,
               ROUND(2e0 * CAST(wsum AS DOUBLE)
                     / (CAST(n_docs AS DOUBLE) * CAST(total_tokens AS DOUBLE))
                     - (CAST(n_docs AS DOUBLE) + 1e0) / CAST(n_docs AS DOUBLE),
                     6) AS gini_tokens
        FROM a ORDER BY source
    """,
)
def q_k93_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    dt = docs.select(
        "source", F.size(words(F.col("text"))).cast("long").alias("t")
    )
    nv = dt.groupBy("source", "t").agg(F.count("*").cast("long").alias("c"))
    # exclusive rank offset per VALUE run — window over the
    # distinct-value table (k85 decomposition), never per-doc rows
    win = W.partitionBy("source").orderBy("t")
    cum = nv.select(
        "source", "t", "c", (F.sum("c").over(win) - F.col("c")).alias("r")
    )
    contrib = F.col("t") * (
        F.col("c") * F.col("r") + F.expr("(c * (c + 1)) div 2")
    )
    a = cum.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.col("t") * F.col("c")).cast("long").alias("total_tokens"),
        F.sum(contrib.cast("decimal(38,0)")).alias("wsum"),
    )
    n_d = F.col("n_docs").cast("double")
    gini = (
        F.lit(2.0) * F.col("wsum").cast("double")
        / (n_d * F.col("total_tokens").cast("double"))
        - (n_d + F.lit(1.0)) / n_d
    )
    return a.select(
        "source", "n_docs", "total_tokens", F.round(gini, 6).alias("gini_tokens")
    ).orderBy("source")


# --------------------------------------------------------------------------
# q_k94 — pairwise source token-distribution divergence (Jensen-Shannon)
# --------------------------------------------------------------------------
#: Unigram distributions are md5-bucketed to this width before the
#: divergence — the q_k54 DSIR trick: the per-source distribution table
#: is bounded at sources x 128 rows however large the vocabulary, and
#: the pair stage never touches corpus-sized data.
JSD_BUCKETS = 128


@register(
    "q_k94_source_token_jsd",
    family="K",
    doc="K-94 pairwise source divergence matrix: Jensen-Shannon "
    "divergence (nats; symmetric, bounded by ln 2) between every two "
    "sources' unigram token distributions, md5-bucketed to "
    f"{JSD_BUCKETS} cells (q_k54's hashing — the distribution table "
    "is sources x 128 regardless of vocabulary). Complements q_k38 "
    "(PSI over length buckets, two fixed cohorts) and q_k44 (vocab "
    "SET overlap): JSD sees distribution SHAPE over content for every "
    "pair — the mix-design input for which sources are near-"
    "interchangeable. One corpus token pass; everything after is "
    "dimension-sized. Per-cell contributions rounded to 8dp then "
    "DECIMAL-summed (q_k27/q_k38 bit-stability convention).",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        bg AS (
            SELECT source,
                   CAST(('0x' || substr(md5('jsd' || w), 1, 8)) AS UBIGINT)
                       % {JSD_BUCKETS} AS b
            FROM tok
        ),
        cnt AS (
            SELECT source, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM bg GROUP BY 1, 2
        ),
        tot AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1
        ),
        pr AS (
            SELECT cnt.source, b, c * 1.0 / n AS p
            FROM cnt JOIN tot ON cnt.source = tot.source
        ),
        pairs AS (
            SELECT a.source AS s1, a.n AS n_tok_1, b.source AS s2,
                   b.n AS n_tok_2
            FROM tot a JOIN tot b ON a.source < b.source
        ),
        grid AS (
            SELECT pairs.s1, pairs.s2, pairs.n_tok_1, pairs.n_tok_2,
                   COALESCE(pa.p, 0) AS p, COALESCE(pb.p, 0) AS q
            FROM pairs
            CROSS JOIN (SELECT DISTINCT b FROM cnt) bb
            LEFT JOIN pr pa ON pa.source = pairs.s1 AND pa.b = bb.b
            LEFT JOIN pr pb ON pb.source = pairs.s2 AND pb.b = bb.b
            WHERE COALESCE(pa.p, 0) > 0 OR COALESCE(pb.p, 0) > 0
        )
        SELECT s1, s2, n_tok_1, n_tok_2,
               CAST(SUM(CAST(ROUND(0.5 * (
                   CASE WHEN p > 0 THEN p * ln(2 * p / (p + q)) ELSE 0 END
                 + CASE WHEN q > 0 THEN q * ln(2 * q / (p + q)) ELSE 0 END
               ), 8) AS DECIMAL(18,8))) AS DOUBLE) AS jsd
        FROM grid
        GROUP BY s1, s2, n_tok_1, n_tok_2
        ORDER BY s1, s2
    """,
)
def q_k94_source_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.cm import md5_bucket

    docs = load(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(words(F.col("text"))).alias("w"))
    cnt = tok.select(
        "source", md5_bucket(F.col("w"), "jsd", JSD_BUCKETS).alias("b")
    ).groupBy("source", "b").agg(F.count("*").cast("long").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    pr = cnt.join(tot, "source").select(
        "source", "b", (F.col("c") * 1.0 / F.col("n")).alias("p")
    )
    pairs = (
        tot.alias("a")
        .join(tot.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("s1"),
            F.col("a.n").alias("n_tok_1"),
            F.col("b.source").alias("s2"),
            F.col("b.n").alias("n_tok_2"),
        )
    )
    # pairs x buckets grid: <= C(sources,2) x 128 rows — both
    # distribution tables broadcast; the corpus never re-enters
    bb = cnt.select("b").distinct()
    pra = pr.select(
        F.col("source").alias("sa"), F.col("b").alias("ba"), F.col("p").alias("pa")
    )
    prb = pr.select(
        F.col("source").alias("sb"), F.col("b").alias("bb"), F.col("p").alias("pb")
    )
    grid = (
        pairs.crossJoin(F.broadcast(bb))
        .join(
            F.broadcast(pra),
            (F.col("sa") == F.col("s1")) & (F.col("ba") == F.col("b")),
            "left",
        )
        .join(
            F.broadcast(prb),
            (F.col("sb") == F.col("s2")) & (F.col("bb") == F.col("b")),
            "left",
        )
        .select(
            "s1", "s2", "n_tok_1", "n_tok_2",
            F.coalesce("pa", F.lit(0.0)).alias("p"),
            F.coalesce("pb", F.lit(0.0)).alias("q"),
        )
        .filter((F.col("p") > 0) | (F.col("q") > 0))
    )
    term = lambda x, y: F.when(  # noqa: E731 — two symmetric KL terms
        x > 0, x * F.log(2 * x / (x + y))
    ).otherwise(0.0)
    contrib = F.round(
        0.5 * (term(F.col("p"), F.col("q")) + term(F.col("q"), F.col("p"))), 8
    )
    return (
        grid.groupBy("s1", "s2", "n_tok_1", "n_tok_2")
        .agg(F.sum(contrib.cast("decimal(18,8)")).cast("double").alias("jsd"))
        .select("s1", "s2", "n_tok_1", "n_tok_2", "jsd")
        .orderBy("s1", "s2")
    )


# --------------------------------------------------------------------------
# q_k95 — duplicate-paragraph fraction (the Gopher screen k18/k71 lack)
# --------------------------------------------------------------------------
#: Paragraph granularity: non-overlapping 8-token blocks (q_k51's
#: convention for the fixture's newline-free text); the trailing
#: partial block is dropped so both engines slice identically.
PARA_TOKENS = 8


@register(
    "q_k95_duplicate_paragraph_fraction",
    family="K",
    doc="K-95 within-document duplicate-paragraph screen (the Gopher/"
    "MassiveText 'fraction of text in duplicated paragraphs' rule — "
    "the one screen q_k18 (n-gram multiplicity) and q_k71 (word-level "
    f"battery) do not cover): per doc, non-overlapping {PARA_TOKENS}-"
    "token blocks, the count belonging to a block value occurring "
    ">= 2x IN THAT DOC, and the integer-algebra keep decision "
    "(dup blocks <= 30% of blocks — n_dup*10 <= n_paras*3, no float "
    "ever computed, the q_k18 exact-integer convention). Plan: one "
    "bounded explode (len/8 rows per doc), blocks built by array "
    "SLICE not per-token explode, counts per (doc, block-hash) — "
    "always partitioned by doc content, never a global window. "
    "Collision contract (the k88/k90 convention): blocks group by "
    "xxhash64(para) while the oracle groups by paragraph TEXT, so an "
    "IN-DOCUMENT 64-bit collision would undercount n_distinct by one "
    "and surface as an oracle mismatch, never silently — expected "
    "collision mass per doc is C(n_paras,2)/2^64, ~1e-14 even for a "
    "100M-token document, and cross-doc collisions are irrelevant "
    "because the hash never leaves the (doc_id, source) group.",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, string_split(text, ' ') AS ws
            FROM documents
        ),
        blk AS (
            SELECT doc_id, source,
                   array_to_string(
                       ws[(g * {PARA_TOKENS} + 1):((g + 1) * {PARA_TOKENS})],
                       ' ') AS para
            FROM w CROSS JOIN generate_series(0, 100000) s(g)
            WHERE (g + 1) * {PARA_TOKENS} <= len(ws)
        ),
        pc AS (
            SELECT doc_id, source, para, CAST(COUNT(*) AS BIGINT) AS m
            FROM blk GROUP BY 1, 2, 3
        )
        SELECT doc_id, source,
               CAST(SUM(m) AS BIGINT) AS n_paras,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(CASE WHEN m >= 2 THEN m ELSE 0 END) AS BIGINT)
                   AS n_dup,
               (SUM(CASE WHEN m >= 2 THEN m ELSE 0 END) * 10
                    <= SUM(m) * 3) AS keep
        FROM pc
        GROUP BY doc_id, source
        ORDER BY doc_id
    """,
)
def q_k95_duplicate_paragraph_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", "source", words(F.col("text")).alias("ws"))
    nblk = (F.size("ws") / PARA_TOKENS).cast("int")
    blk = (
        w.filter(F.size("ws") >= PARA_TOKENS)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(0), nblk - 1)).alias("g"),
            "ws",
        )
        .select(
            "doc_id",
            "source",
            F.concat_ws(
                " ", F.slice("ws", F.col("g") * PARA_TOKENS + 1, PARA_TOKENS)
            ).alias("para"),
        )
    )
    pc = blk.groupBy("doc_id", "source", F.xxhash64("para").alias("ph")).agg(
        F.count("*").cast("long").alias("m")
    )
    dup = F.sum(F.when(F.col("m") >= 2, F.col("m")).otherwise(0))
    return (
        pc.groupBy("doc_id", "source")
        .agg(
            F.sum("m").cast("long").alias("n_paras"),
            F.count("*").cast("long").alias("n_distinct"),
            dup.cast("long").alias("n_dup"),
            (dup * 10 <= F.sum("m") * 3).alias("keep"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_k100_distinct_ngram_diversity",
    family="K",
    doc="K-100 corpus diversity via distinct-n (the Distinct-1/2/3 "
    "metric of Li et al. 2016, 'A Diversity-Promoting Objective "
    "Function for Neural Conversation Models' — standard for spotting "
    "low-diversity / templated sources before they dilute a mix): per "
    "source, total vs distinct unigram/bigram/trigram counts as exact "
    "BIGINTs (consumers form the distinct-n ratios; shipping integers "
    "keeps the oracle hash float-free, the q_k18 convention). Unlike "
    "q_k26 (global vocabulary) and q_k44 (pairwise source overlap) "
    "this measures WITHIN-source n-gram repetition breadth. Plan: "
    "n-grams built by array transform over the split-once token array "
    "(no per-token window, no posexplode), one hash agg per order with "
    "map-side partial distinct, three tiny per-source frames joined at "
    "the end. Oracle-side cap (r10 ADVICE, guarded not silent): the "
    "DuckDB oracle builds n-gram positions via generate_series(1, "
    "100000) — positions past 100k tokens/doc would silently drop "
    "while the Spark transform is unbounded, so the suite pins "
    "max(len(ws)) << 100000 on every fixture the oracle runs against "
    "(tests/test_oracle_series_cap.py); a fixture that outgrows the "
    "cap fails THAT test loudly instead of hash-diverging here. The distinct shuffle carries (source, gram) pairs — "
    "gram strings stay because the oracle needs exact distinct "
    "semantics (k26 convention); the declared 100 TB variant swaps in "
    "xxhash64(gram) keys (8-byte shuffle, collision mass V^2/2^65 — "
    "negligible at 1e9 types, the k90 contract).",
    oracle="""
        WITH w AS (
            SELECT source, string_split(text, ' ') AS ws FROM documents
        ),
        uni AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_uni,
                   CAST(COUNT(DISTINCT wd) AS BIGINT) AS v_uni
            FROM (SELECT source, unnest(ws) AS wd FROM w)
            GROUP BY source
        ),
        bi0 AS (
            SELECT source, ws[i] || ' ' || ws[i+1] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 1 <= len(ws)
        ),
        bi AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bi,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS v_bi
            FROM bi0 GROUP BY source
        ),
        tri0 AS (
            SELECT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 2 <= len(ws)
        ),
        tri AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tri,
                   CAST(COUNT(DISTINCT s) AS BIGINT) AS v_tri
            FROM tri0 GROUP BY source
        )
        SELECT u.source, n_uni, v_uni,
               COALESCE(n_bi, 0) AS n_bi, COALESCE(v_bi, 0) AS v_bi,
               COALESCE(n_tri, 0) AS n_tri, COALESCE(v_tri, 0) AS v_tri
        FROM uni u
        LEFT JOIN bi USING (source)
        LEFT JOIN tri USING (source)
        ORDER BY u.source
    """,
)
def q_k100_distinct_ngram_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("source", words(F.col("text")).alias("ws"))

    def order_agg(n: int, tot: str, dis: str) -> DataFrame:
        if n == 1:
            g = w.select("source", F.explode("ws").alias("g"))
        else:
            grams = F.expr(
                f"transform(sequence(0, size(ws) - {n}), "
                f"i -> concat_ws(' ', {', '.join(f'ws[i+{j}]' for j in range(n))}))"
            )
            g = (
                w.filter(F.size("ws") >= n)
                .select("source", F.explode(grams).alias("g"))
            )
        return g.groupBy("source").agg(
            F.count("*").cast("long").alias(tot),
            F.count_distinct("g").cast("long").alias(dis),
        )

    uni = order_agg(1, "n_uni", "v_uni")
    bi = order_agg(2, "n_bi", "v_bi")
    tri = order_agg(3, "n_tri", "v_tri")
    out = uni.join(bi, "source", "left").join(tri, "source", "left")
    fill = {c: 0 for c in ("n_bi", "v_bi", "n_tri", "v_tri")}
    return out.fillna(fill).orderBy("source")


PREFIX_TOKENS = 8
BOILERPLATE_MIN_DOCS = 2


@register(
    "q_k102_boilerplate_prefix",
    family="K",
    doc="K-102 boilerplate-prefix screen: crawled corpora carry "
    f"template headers — docs in one source opening with the same "
    f"{PREFIX_TOKENS}-token prefix (nav bars, license blurbs, scraper "
    "banners). Per source: documents long enough to have a prefix, "
    "distinct prefixes, docs whose prefix is shared by >= "
    f"{BOILERPLATE_MIN_DOCS} docs of that source, and the token mass "
    "those docs carry — the signal that a source needs k24-style "
    "header stripping before it dilutes a mix. Exact BIGINTs only "
    "(consumers form the fractions). Plan: prefix by array SLICE of "
    "the split-once token array (k95's convention), counts per "
    "(source, md5(prefix)) — one hash agg on 16-byte keys, the group "
    "sizes joined back on the same bounded key (multiplicity = the "
    "group's own size, the k101 first-seen shape — linear, never a "
    "pair join), one final per-source rollup.",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, string_split(text, ' ') AS ws
            FROM documents
        ),
        p AS (
            SELECT doc_id, source, len(ws) AS n,
                   md5(array_to_string(ws[1:{PREFIX_TOKENS}], ' ')) AS ph
            FROM w
            WHERE len(ws) >= {PREFIX_TOKENS}
        ),
        g AS (
            SELECT source, ph, CAST(COUNT(*) AS BIGINT) AS grp
            FROM p GROUP BY source, ph
        )
        SELECT p.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT p.ph) AS BIGINT) AS n_prefixes,
               CAST(SUM(CASE WHEN g.grp >= {BOILERPLATE_MIN_DOCS}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boilerplate_docs,
               CAST(SUM(CASE WHEN g.grp >= {BOILERPLATE_MIN_DOCS}
                             THEN p.n ELSE 0 END) AS BIGINT)
                   AS boilerplate_tokens,
               CAST(SUM(p.n) AS BIGINT) AS total_tokens
        FROM p JOIN g ON p.source = g.source AND p.ph = g.ph
        GROUP BY p.source
        ORDER BY p.source
    """,
)
def q_k102_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = docs.select("doc_id", "source", words(F.col("text")).alias("ws"))
    p = w.filter(F.size("ws") >= PREFIX_TOKENS).select(
        "doc_id",
        "source",
        F.size("ws").cast("long").alias("n"),
        F.md5(F.concat_ws(" ", F.slice("ws", 1, PREFIX_TOKENS))).alias("ph"),
    )
    g = p.groupBy("source", "ph").agg(F.count("*").cast("long").alias("grp"))
    boiler = F.col("grp") >= BOILERPLATE_MIN_DOCS
    return (
        p.join(g, ["source", "ph"])
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("ph").cast("long").alias("n_prefixes"),
            F.sum(boiler.cast("int")).cast("long").alias("n_boilerplate_docs"),
            F.sum(F.when(boiler, F.col("n")).otherwise(0))
            .cast("long")
            .alias("boilerplate_tokens"),
            F.sum("n").cast("long").alias("total_tokens"),
        )
        .orderBy("source")
    )


_MIX_ALPHAS = ("0.3", "0.5", "0.7", "1.0")


@register(
    "q_k103_temperature_mixing_weights",
    family="K",
    doc="K-103 temperature-scaled source sampling weights (the "
    "multilingual-LM mixing knob of Lample & Conneau 2019 / XLM-R: "
    "sample source s with probability proportional to p_s^alpha, "
    "alpha < 1 up-weighting low-resource sources): per alpha in "
    "{0.3, 0.5, 0.7, 1.0}, each source's natural token share p_s, "
    "its temperature-scaled weight w_s = p_s^alpha / sum p^alpha, and "
    "the boost factor w_s/p_s — the table a mix designer reads before "
    "committing a k78/k80 budget allocation. alpha=1.0 is the "
    "natural-proportion control row (w == p, boost == 1). Exact "
    "BIGINT token counts; the float weights are 8dp-rounded doubles from "
    "identically-derived doubles both engines compute from the same "
    "exact integer ratios (the k94 convention). Plan: one corpus "
    "token aggregate to a sources-sized table, a constant 4-way "
    "alpha explode, normalization via a per-alpha aggregate joined "
    "back (never a window) — everything after the first agg is "
    "dimension-sized.",
    oracle=f"""
        WITH t AS (
            SELECT source,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source
        ),
        tot AS (SELECT SUM(n_tokens) AS total FROM t),
        x AS (
            SELECT t.source, t.n_tokens,
                   alpha,
                   POW(t.n_tokens * 1.0 / tot.total, alpha) AS pa
            FROM t
            CROSS JOIN tot
            CROSS JOIN (
                SELECT UNNEST([{", ".join(_MIX_ALPHAS)}]) AS alpha
            )
        ),
        z AS (
            SELECT alpha AS za, SUM(pa) AS zsum FROM x GROUP BY alpha
        )
        SELECT
            CAST(ROUND(x.alpha, 1) AS DOUBLE) AS alpha,
            x.source,
            x.n_tokens,
            CAST(ROUND(x.n_tokens * 1.0 / tot.total, 8) AS DOUBLE)
                AS p_natural,
            CAST(ROUND(x.pa / z.zsum, 8) AS DOUBLE) AS weight,
            CAST(ROUND((x.pa / z.zsum) /
                       (x.n_tokens * 1.0 / tot.total), 6) AS DOUBLE)
                AS boost
        FROM x JOIN z ON x.alpha = z.za
        CROSS JOIN tot
        ORDER BY alpha, x.source
    """,
)
def q_k103_temperature_mixing_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.sum(n_words(F.col("text"))).cast("long").alias("n_tokens")
    )
    tot = t.agg(F.sum("n_tokens").alias("total"))
    alphas = F.array(*[F.lit(float(a)) for a in _MIX_ALPHAS])
    x = (
        t.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.explode(alphas).alias("alpha"),
            F.pow(F.col("n_tokens") / F.col("total"), F.col("alpha")).alias("pa"),
            (F.col("n_tokens") / F.col("total")).alias("p_raw"),
        )
    )
    z = x.groupBy(F.col("alpha").alias("za")).agg(F.sum("pa").alias("zsum"))
    return (
        x.join(F.broadcast(z), x.alpha == z.za)
        .select(
            F.round("alpha", 1).cast("double").alias("alpha"),
            "source",
            "n_tokens",
            F.round("p_raw", 8).cast("double").alias("p_natural"),
            F.round(F.col("pa") / F.col("zsum"), 8)
            .cast("double")
            .alias("weight"),
            F.round((F.col("pa") / F.col("zsum")) / F.col("p_raw"), 6)
            .cast("double")
            .alias("boost"),
        )
        .orderBy("alpha", "source")
    )


PSI_T_BUCKETS = 128


@register(
    "q_k104_temporal_drift_psi",
    family="K",
    doc="K-104 within-source temporal drift: population-stability "
    "index of each source's unigram distribution between the FIRST "
    "and SECOND ingestion half (doc_id order; the k101 time axis) — "
    "q_k38 compares source cohorts at one moment, this catches a "
    "single source whose own content shifted mid-crawl (site "
    "redesign, spam injection, template change) before it poisons a "
    f"mix. Distributions md5-bucketed to {PSI_T_BUCKETS} cells "
    "(q_k54/q_k94 hashing — table stays sources x 128 whatever the "
    "vocabulary), Laplace-smoothed, per-cell contributions 8dp-"
    "rounded then DECIMAL-summed per source (q_k27/q_k38 bit-"
    "stability convention). Plan: one corpus token pass to the "
    "(source, half, bucket) table, scalar max broadcast for the "
    "halfway point, everything after dimension-sized. Smoothing "
    "semantics (r10 ADVICE, documented not changed to keep the oracle "
    "text stable): contributions sum over the (source, bucket) cells "
    "OCCUPIED in at least one half — buckets empty in BOTH halves are "
    "dropped rather than contributing their (nonzero when t1 != t2) "
    "Laplace-only term; both engines drop the same cells, so parity "
    "is exact, and the metric is 'PSI over occupied cells' rather "
    "than a dense 128-cell PSI when halves are unbalanced.",
    oracle=f"""
        WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        tok AS (
            SELECT d.source,
                   CASE WHEN d.doc_id * 2 <= mx.mx THEN 0 ELSE 1 END AS half,
                   CAST(('0x' || substr(md5('tpsi' || w.wd), 1, 8)) AS UBIGINT)
                       % {PSI_T_BUCKETS} AS b
            FROM documents d
            CROSS JOIN mx,
            UNNEST(string_split(d.text, ' ')) AS w(wd)
        ),
        cnt AS (
            SELECT source, b,
                   COUNT(*) FILTER (WHERE half = 0) AS n1,
                   COUNT(*) FILTER (WHERE half = 1) AS n2
            FROM tok GROUP BY source, b
        ),
        tot AS (
            SELECT source,
                   CAST(SUM(n1) AS BIGINT) AS t1,
                   CAST(SUM(n2) AS BIGINT) AS t2
            FROM cnt GROUP BY source
        ),
        contrib AS (
            SELECT c.source, t.t1, t.t2,
                   ROUND(((c.n1 + 1.0) / (t.t1 + {PSI_T_BUCKETS})
                          - (c.n2 + 1.0) / (t.t2 + {PSI_T_BUCKETS}))
                         * ln(((c.n1 + 1.0) / (t.t1 + {PSI_T_BUCKETS}))
                              / ((c.n2 + 1.0) / (t.t2 + {PSI_T_BUCKETS}))),
                         8) AS v
            FROM cnt c JOIN tot t USING (source)
        )
        SELECT source,
               t1 AS tokens_h1,
               t2 AS tokens_h2,
               CAST(SUM(CAST(v AS DECIMAL(18,8))) AS DOUBLE) AS psi
        FROM contrib
        GROUP BY source, t1, t2
        ORDER BY source
    """,
)
def q_k104_temporal_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.operators.cm import md5_bucket

    docs = load(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("mx"))
    tok = (
        docs.crossJoin(F.broadcast(mx))
        .select(
            "source",
            F.when(F.col("doc_id") * 2 <= F.col("mx"), 0).otherwise(1).alias("half"),
            F.explode(words(F.col("text"))).alias("wd"),
        )
        .select(
            "source",
            "half",
            md5_bucket(F.col("wd"), "tpsi", PSI_T_BUCKETS).alias("b"),
        )
    )
    cnt = tok.groupBy("source", "b").agg(
        F.count(F.when(F.col("half") == 0, 1)).alias("n1"),
        F.count(F.when(F.col("half") == 1, 1)).alias("n2"),
    )
    tot = cnt.groupBy("source").agg(
        F.sum("n1").cast("long").alias("t1"),
        F.sum("n2").cast("long").alias("t2"),
    )
    B = float(PSI_T_BUCKETS)
    p = (F.col("n1") + 1.0) / (F.col("t1") + B)
    q = (F.col("n2") + 1.0) / (F.col("t2") + B)
    v = F.round((p - q) * F.log(p / q), 8)
    return (
        cnt.join(F.broadcast(tot), "source")
        .groupBy("source", F.col("t1").alias("tokens_h1"), F.col("t2").alias("tokens_h2"))
        .agg(F.sum(v.cast("decimal(18,8)")).cast("double").alias("psi"))
        .orderBy("source")
    )


_VOCAB_BUDGETS = (1000, 10000, 100000)


@register(
    "q_k105_vocab_coverage_curve",
    family="K",
    bench=True,  # the round-10 precedent of k90: the TakeOrdered
    # bounded-head + constant-frame-window shape is this round's
    # newest nontrivial plan and deserves a cross-round bench trace,
    tags=(),
    doc="K-105 vocabulary coverage curve: for each candidate "
    "vocabulary budget V (1k/10k/100k), the exact token mass covered "
    "by the top-V words by frequency (ties broken by word, both "
    "engines) — the table read before fixing a tokenizer vocab size "
    "or an OOV strategy; the complement of each row is the UNK "
    "rate a word-level model would eat. Exact BIGINTs (consumers "
    "form coverage ratios). Plan: the k26 word-frequency aggregate "
    "(vocab-sized, map-side partial), a TakeOrderedAndProject top-"
    "max(V) head — the ONLY single-task step, bounded by the "
    "constant 100k however large the vocabulary — then a rank + "
    "running-sum window over that bounded head and a 3-way cutoff "
    "join. Never a global window over the full vocab table.",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS w FROM documents
        ),
        tf AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY w
        ),
        tot AS (
            SELECT CAST(SUM(tf) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types
            FROM tf
        ),
        ranked AS (
            SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, w) AS r
            FROM tf
        ),
        cuts AS (
            SELECT UNNEST([{", ".join(str(v) for v in _VOCAB_BUDGETS)}])
                AS v_budget
        )
        SELECT CAST(c.v_budget AS BIGINT) AS v_budget,
               tot.n_types,
               tot.total_tokens,
               CAST(SUM(CASE WHEN ranked.r <= c.v_budget
                             THEN ranked.tf ELSE 0 END) AS BIGINT)
                   AS covered_tokens
        FROM ranked CROSS JOIN cuts c CROSS JOIN tot
        GROUP BY c.v_budget, tot.n_types, tot.total_tokens
        ORDER BY v_budget
    """,
)
def q_k105_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(words(F.col("text"))).alias("w"))
    tf = tok.groupBy("w").agg(F.count("*").cast("long").alias("tf"))
    tot = tf.agg(
        F.sum("tf").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("n_types"),
    )
    head = tf.orderBy(F.col("tf").desc(), "w").limit(max(_VOCAB_BUDGETS))
    wspec = (
        W.orderBy(F.col("tf").desc(), "w")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = head.select(
        F.row_number().over(wspec).alias("r"),
        F.sum("tf").over(wspec).cast("long").alias("cum"),
    )
    cuts = ranked.sparkSession.range(1).select(
        F.explode(
            F.array(*[F.lit(v).cast("long") for v in _VOCAB_BUDGETS])
        ).alias("v_budget")
    )
    covered = (
        ranked.crossJoin(F.broadcast(cuts))
        .filter(F.col("r") <= F.col("v_budget"))
        .groupBy("v_budget")
        .agg(F.max("cum").cast("long").alias("covered_tokens"))
    )
    return (
        cuts.join(covered, "v_budget", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "v_budget",
            "n_types",
            "total_tokens",
            F.coalesce("covered_tokens", F.lit(0)).cast("long").alias(
                "covered_tokens"
            ),
        )
        .orderBy("v_budget")
    )
