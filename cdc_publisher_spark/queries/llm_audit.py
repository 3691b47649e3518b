"""Family K round-5 extension: training-data audit operators.

- q_k73 kNN label purity (label-noise audit): for a deterministic
  bounded sample of query vectors, the fraction of each vector's
  5 exact nearest cosine neighbors sharing its label, aggregated per
  label. Low purity for a label = mislabeled or heterogeneous slice —
  the standard embedding-space QA screen run before a labeled corpus
  is trusted for training (the kNN agreement statistic behind
  Confident Learning-style audits, Northcutt et al. 2021).
- q_k74 language confusion matrix: declared ``lang`` vs the q_k47
  closed-form Naive Bayes prediction, as (true, pred, count, frac)
  cells. The confusion structure (which languages absorb which) is
  what sets langid keep/drop thresholds in a cleaning pipeline;
  q_k47 emits the per-doc verdicts, this is the corpus-level audit.
- q_k75 cross-source duplication matrix: q_k2's exact near-dup pairs
  rolled up to unordered (source, source) cells with exact
  possible-pair denominators — the provenance audit that decides
  which feeds to dedup against which.
- q_k76 cleaning-yield funnel: per-source doc/token survival through
  exact dedup (q_k1 keeper rule) × the Gopher screens (q_k71) — the
  "what did cleaning cost" report a curation pipeline publishes
  before training.
- q_k77 rule-drop attribution: per Gopher screen, how many documents
  fail it and for how many it is the SOLE blocker — the report that
  says which threshold to revisit when the funnel drops too much.
- q_k78 token-budget allocation: exact integer water-filling of a
  40%-of-corpus token budget across sources (small sources fully
  served, large ones levelled), the allocator behind "sample B tokens
  without letting one feed dominate". All decisions happen on the
  per-source aggregate (dimension-sized), never on the corpus.
- q_k80 budget-enforced sample: materialize q_k78's allocation as an
  actual document selection — per source, an md5-ordered greedy
  prefix of documents whose running token total stays within the
  source's allocation. The end-to-end "give me a B-token corpus
  respecting the caps" operator.

Scale shape:

- q_k73's query block is hard-bounded: ORDER BY md5 LIMIT 100 is a
  TakeOrderedAndProject (no global sort materialization), and only
  those 100 rows broadcast. The corpus side is one scan; per-query
  ranking windows partition on query_id (100 partitions of corpus
  cardinality each — at 1000 executors this is the standard bounded
  probe-set brute-force audit, O(|Q|·n·d) spread across the cluster,
  |Q| fixed at any corpus size). The k-NN *graph* over ALL vectors is
  deliberately not computed here — that is q_k21/q_k35 territory.
- q_k74 adds two fixed-width aggregations over q_k47's output
  (cells are at most |langs|² rows; totals broadcast back).

Float canonicalization per registry.py rules: purity/frac are single
divisions of exact integer aggregates (no float accumulation), so
ROUND(x, 4) is bit-stable cross-engine; neighbor ranking orders by
the sequential-fold cosine both engines compute identically from the
same float32 payloads (q_k6 precedent).

Reference parity: none of this exists in the reference (a CDC
microservice, /root/reference/src/cdc_publisher/core.clj:1-22); all
are declared LLM-data extension surface (SURVEY.md §2.2 K-73..K-80).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.functions import text as TX
from cdc_publisher_spark.functions import vectors as VX
from cdc_publisher_spark.queries.llm import K2_ORACLE, q_k2_jaccard_neardup
from cdc_publisher_spark.queries.llm_ml import K47_ORACLE, q_k47_naive_bayes_langid
from cdc_publisher_spark.queries.llm_signals import K71_ORACLE, q_k71_gopher_rules
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load

#: q_k73 probe-set size — FIXED at any corpus scale (the whole point:
#: the audit cost is O(KNN_PROBES · n), never O(n²)).
KNN_PROBES = 100
#: q_k73 neighbors inspected per probe.
KNN_K = 5


# --------------------------------------------------------------------------
# q_k73 — kNN label purity (label-noise audit)
# --------------------------------------------------------------------------
@register(
    "q_k73_knn_label_purity",
    family="K",
    doc="K-73 kNN label purity: md5-drawn 100-vector probe set, exact "
    "top-5 cosine neighbors from the full corpus (self excluded), "
    "per-label share of neighbors agreeing with the probe's label. "
    "Probe block is ORDER BY md5 LIMIT n (TakeOrdered, bounded at any "
    "scale) and broadcasts; ranking windows partition per probe. "
    "purity = same_sum/(5·n_probes) — one division of exact integer "
    "sums, bit-stable at 4dp.",
    oracle=f"""
        WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] e FROM embeddings),
        q AS (
            SELECT * FROM v
            ORDER BY md5('knnq' || vec_id), vec_id
            LIMIT {KNN_PROBES}
        ),
        scored AS (
            SELECT q.vec_id AS qid, q.label AS qlbl, c.label AS clbl,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.e, c.e)
                                / (sqrt(list_dot_product(q.e, q.e))
                                   * sqrt(list_dot_product(c.e, c.e))) DESC,
                                c.vec_id) AS rk
            FROM q JOIN v c ON c.vec_id <> q.vec_id
        ),
        perq AS (
            SELECT qid, qlbl,
                   SUM(CASE WHEN clbl = qlbl THEN 1 ELSE 0 END) AS same
            FROM scored WHERE rk <= {KNN_K}
            GROUP BY qid, qlbl
        )
        SELECT CAST(qlbl AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_probes,
               CAST(SUM(same) AS BIGINT) AS same_sum,
               ROUND(SUM(same) / ({KNN_K}.0 * COUNT(*)), 4) AS purity
        FROM perq
        GROUP BY qlbl
        ORDER BY label
    """,
)
def q_k73_knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    probes = (
        e.select("vec_id", "label", "embedding")
        .orderBy(
            F.md5(F.concat(F.lit("knnq"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(KNN_PROBES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlbl"),
            F.col("embedding").alias("qv"),
            VX.l2_norm(F.col("embedding")).alias("qn"),
        )
    )
    cand = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("clbl"),
        F.col("embedding").alias("cv"),
        VX.l2_norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        cand.crossJoin(F.broadcast(probes))
        .filter(F.col("cand_id") != F.col("qid"))
        .select(
            "qid",
            "qlbl",
            "clbl",
            "cand_id",
            VX.cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cos"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cand_id"))
    perq = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .groupBy("qid", "qlbl")
        .agg(F.sum((F.col("clbl") == F.col("qlbl")).cast("int")).alias("same"))
    )
    return (
        perq.groupBy("qlbl")
        .agg(
            F.count("*").cast("bigint").alias("n_probes"),
            F.sum("same").cast("bigint").alias("same_sum"),
            F.round(
                F.sum("same") / (F.lit(float(KNN_K)) * F.count("*")), 4
            ).alias("purity"),
        )
        .select(
            F.col("qlbl").cast("bigint").alias("label"),
            "n_probes",
            "same_sum",
            "purity",
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# q_k74 — language confusion matrix over the q_k47 classifier
# --------------------------------------------------------------------------
@register(
    "q_k74_lang_confusion",
    family="K",
    doc="K-74 language confusion matrix: q_k47's per-doc Naive Bayes "
    "verdicts aggregated to (true_lang, pred_lang) cells with row-"
    "normalized fractions (per-true-lang recall on the diagonal). "
    "Reuses the registered q_k47 callable verbatim — one classifier "
    "definition, two audits; the only additions are two fixed-width "
    "aggregations (≤ |langs|² cells) and a broadcast totals join. "
    "frac = n/total is one division of exact integers, 4dp-stable.",
    oracle=f"""
        WITH preds AS (
            SELECT doc_id, true_lang, pred_lang
            FROM ({K47_ORACLE}) k47
        ),
        cells AS (
            SELECT true_lang, pred_lang, COUNT(*) AS n
            FROM preds GROUP BY true_lang, pred_lang
        ),
        tot AS (
            SELECT true_lang, COUNT(*) AS t FROM preds GROUP BY true_lang
        )
        SELECT c.true_lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
               ROUND(c.n * 1.0 / tot.t, 4) AS frac
        FROM cells c JOIN tot ON tot.true_lang = c.true_lang
        ORDER BY c.true_lang, c.pred_lang
    """,
)
def q_k74_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    preds = q_k47_naive_bayes_langid(spark, sf_dir).select(
        "doc_id", "true_lang", "pred_lang"
    )
    cells = preds.groupBy("true_lang", "pred_lang").agg(F.count("*").alias("_n"))
    tot = preds.groupBy("true_lang").agg(F.count("*").alias("_t"))
    return (
        cells.join(F.broadcast(tot), "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            F.col("_n").cast("bigint").alias("n"),
            F.round(F.col("_n") * F.lit(1.0) / F.col("_t"), 4).alias("frac"),
        )
        .orderBy("true_lang", "pred_lang")
    )


# --------------------------------------------------------------------------
# q_k75 — cross-source duplication matrix over the q_k2 pair miner
# --------------------------------------------------------------------------
@register(
    "q_k75_source_dup_matrix",
    family="K",
    doc="K-75 cross-source duplication matrix: q_k2's exact Jaccard>=0.5 "
    "pairs mapped to unordered (source, source) cells with the pair "
    "rate against the exact number of possible cross-source pairs — "
    "the provenance audit (which feeds copy from which) that decides "
    "source-level dedup order. Adds two broadcast-sized joins (doc -> "
    "source is a projection of the scan; per-source counts broadcast) "
    "to the registered pair miner; possible-pair algebra is integer "
    "(div 2 on an even product), so the rate is one exact division.",
    oracle=f"""
        WITH pairs AS (SELECT d1, d2 FROM ({K2_ORACLE}) k2),
        src AS (SELECT doc_id, source FROM documents),
        cells AS (
            SELECT LEAST(a.source, b.source) AS src_a,
                   GREATEST(a.source, b.source) AS src_b,
                   COUNT(*) AS n_pairs
            FROM pairs
            JOIN src a ON a.doc_id = pairs.d1
            JOIN src b ON b.doc_id = pairs.d2
            GROUP BY 1, 2
        ),
        counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source)
        SELECT c.src_a, c.src_b,
               CAST(c.n_pairs AS BIGINT) AS n_pairs,
               CAST(CASE WHEN c.src_a = c.src_b
                         THEN (ca.n * (ca.n - 1)) // 2
                         ELSE ca.n * cb.n END AS BIGINT) AS possible_pairs,
               ROUND(c.n_pairs * 1.0
                     / (CASE WHEN c.src_a = c.src_b
                             THEN (ca.n * (ca.n - 1)) // 2
                             ELSE ca.n * cb.n END), 8) AS pair_rate
        FROM cells c
        JOIN counts ca ON ca.source = c.src_a
        JOIN counts cb ON cb.source = c.src_b
        ORDER BY c.src_a, c.src_b
    """,
)
def q_k75_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pairs = q_k2_jaccard_neardup(spark, sf_dir).select("d1", "d2")
    src = docs.select("doc_id", "source")
    tagged = (
        pairs.join(src.withColumnRenamed("source", "sa"), F.col("d1") == F.col("doc_id"))
        .drop("doc_id")
        .join(src.withColumnRenamed("source", "sb"), F.col("d2") == F.col("doc_id"))
        .drop("doc_id")
    )
    cells = (
        tagged.select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_pairs"))
    )
    counts = docs.groupBy("source").agg(F.count("*").alias("n"))
    ca = counts.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    possible = F.when(
        F.col("src_a") == F.col("src_b"),
        F.expr("na * (na - 1) div 2"),
    ).otherwise(F.col("na") * F.col("nb"))
    return (
        cells.join(F.broadcast(ca), "src_a")
        .join(F.broadcast(cb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            possible.cast("bigint").alias("possible_pairs"),
            F.round(F.col("n_pairs") * F.lit(1.0) / possible, 8).alias("pair_rate"),
        )
        .orderBy("src_a", "src_b")
    )


# --------------------------------------------------------------------------
# q_k76 — cleaning-yield funnel report (exact dedup × Gopher screens)
# --------------------------------------------------------------------------
@register(
    "q_k76_cleaning_yield",
    family="K",
    bench=True,  # realistic composed workload: dedup agg + rule battery
    doc="K-76 cleaning-yield funnel: per source, documents and tokens "
    "surviving (a) q_k1's exact keep-first dedup (keeper = min doc_id "
    "per md5(text) group), (b) q_k71's conjunctive Gopher keep, and "
    "(c) both — the 'what did cleaning cost' report every curation "
    "pipeline publishes before training. All counters are exact "
    "integer sums; the dedup keeper comes from the same hash-grouped "
    "aggregate as q_k1 (fixed-width 32-byte shuffle key, no corpus "
    "window), and the Gopher flags reuse the registered q_k71 "
    "callable verbatim.",
    oracle=f"""
        WITH gp AS (SELECT doc_id, keep FROM ({K71_ORACLE}) k71),
        keepers AS (
            SELECT md5(text) AS h, MIN(doc_id) AS keep_id
            FROM documents GROUP BY md5(text)
        ),
        base AS (
            SELECT d.source, d.doc_id,
                   len(string_split(d.text, ' ')) AS nt,
                   (k.keep_id = d.doc_id) AS first_copy,
                   gp.keep AS quality_keep
            FROM documents d
            JOIN keepers k ON k.h = md5(d.text)
            JOIN gp ON gp.doc_id = d.doc_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN first_copy THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exact_unique,
               CAST(SUM(CASE WHEN quality_keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quality_keep,
               CAST(SUM(CASE WHEN first_copy AND quality_keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_surviving,
               CAST(SUM(nt) AS BIGINT) AS tok_total,
               CAST(SUM(CASE WHEN first_copy AND quality_keep THEN nt ELSE 0 END)
                    AS BIGINT) AS tok_surviving
        FROM base
        GROUP BY source
        ORDER BY source
    """,
)
def q_k76_cleaning_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions.text import words

    # spread examined r16 and NOT adopted: the blanket sf1 audit read
    # 0.42, but that run also spread the nested q_k71 pass — spreading
    # only THIS load measured 0.83 at sf1 and 1.42 at sf0.1 (5-repeat
    # committed-set A/B, control 0.93), failing the
    # parity-at-driver-scale gate. Left alone.
    docs = load(spark, sf_dir, "documents")
    gp = q_k71_gopher_rules(spark, sf_dir).select("doc_id", "keep")
    keepers = (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    base = (
        docs.select(
            "source",
            "doc_id",
            F.size(words(F.col("text"))).alias("nt"),
            F.md5("text").alias("h"),
        )
        .join(keepers, "h")
        .join(gp, "doc_id")
        .select(
            "source",
            "nt",
            (F.col("keep_id") == F.col("doc_id")).alias("first_copy"),
            F.col("keep").alias("quality_keep"),
        )
    )
    fc = F.col("first_copy")
    qk = F.col("quality_keep")
    return (
        base.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(fc.cast("int")).cast("bigint").alias("n_exact_unique"),
            F.sum(qk.cast("int")).cast("bigint").alias("n_quality_keep"),
            F.sum((fc & qk).cast("int")).cast("bigint").alias("n_surviving"),
            F.sum("nt").cast("bigint").alias("tok_total"),
            F.sum(F.when(fc & qk, F.col("nt")).otherwise(0))
            .cast("bigint")
            .alias("tok_surviving"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q_k77 — per-rule drop attribution over the Gopher screens
# --------------------------------------------------------------------------
_GOPHER_RULES = ("wc_ok", "mwl_ok", "stop_ok", "ttr_ok", "rep_ok")


@register(
    "q_k77_rule_attribution",
    family="K",
    doc="K-77 rule-drop attribution: for each Gopher screen, the number "
    "of documents failing it and the number for which it is the SOLE "
    "blocker (every other screen passes) — sole-blocker counts are "
    "what say which single threshold to revisit when the funnel drops "
    "too much. One aggregate over q_k71's per-doc flags (reused "
    "verbatim), unpivoted to a 5-row report; fractions are single "
    "divisions of exact integers.",
    oracle=f"""
        WITH flags AS (SELECT * FROM ({K71_ORACLE}) k71),
        n AS (SELECT COUNT(*) AS n_docs FROM flags),
        agg AS (
            SELECT
              SUM(CASE WHEN NOT wc_ok THEN 1 ELSE 0 END) AS f_wc,
              SUM(CASE WHEN NOT wc_ok AND mwl_ok AND stop_ok AND ttr_ok AND rep_ok THEN 1 ELSE 0 END) AS s_wc,
              SUM(CASE WHEN NOT mwl_ok THEN 1 ELSE 0 END) AS f_mwl,
              SUM(CASE WHEN NOT mwl_ok AND wc_ok AND stop_ok AND ttr_ok AND rep_ok THEN 1 ELSE 0 END) AS s_mwl,
              SUM(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END) AS f_stop,
              SUM(CASE WHEN NOT stop_ok AND wc_ok AND mwl_ok AND ttr_ok AND rep_ok THEN 1 ELSE 0 END) AS s_stop,
              SUM(CASE WHEN NOT ttr_ok THEN 1 ELSE 0 END) AS f_ttr,
              SUM(CASE WHEN NOT ttr_ok AND wc_ok AND mwl_ok AND stop_ok AND rep_ok THEN 1 ELSE 0 END) AS s_ttr,
              SUM(CASE WHEN NOT rep_ok THEN 1 ELSE 0 END) AS f_rep,
              SUM(CASE WHEN NOT rep_ok AND wc_ok AND mwl_ok AND stop_ok AND ttr_ok THEN 1 ELSE 0 END) AS s_rep
            FROM flags
        ),
        long AS (
            SELECT 'wc_ok' AS rule, f_wc AS n_fail, s_wc AS n_sole FROM agg
            UNION ALL SELECT 'mwl_ok', f_mwl, s_mwl FROM agg
            UNION ALL SELECT 'stop_ok', f_stop, s_stop FROM agg
            UNION ALL SELECT 'ttr_ok', f_ttr, s_ttr FROM agg
            UNION ALL SELECT 'rep_ok', f_rep, s_rep FROM agg
        )
        SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
               CAST(n_sole AS BIGINT) AS n_sole_blocker,
               ROUND(n_fail * 1.0 / n.n_docs, 4) AS fail_frac
        FROM long CROSS JOIN n
        ORDER BY rule
    """,
)
def q_k77_rule_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = q_k71_gopher_rules(spark, sf_dir)
    aggs = [F.count("*").cast("bigint").alias("n_docs")]
    for r in _GOPHER_RULES:
        others = [F.col(o) for o in _GOPHER_RULES if o != r]
        sole = ~F.col(r)
        for o in others:
            sole = sole & o
        aggs.append(F.sum((~F.col(r)).cast("int")).cast("bigint").alias(f"f_{r}"))
        aggs.append(F.sum(sole.cast("int")).cast("bigint").alias(f"s_{r}"))
    one = flags.agg(*aggs)
    stack_args = ", ".join(f"'{r}', f_{r}, s_{r}" for r in _GOPHER_RULES)
    return (
        one.select(
            "n_docs",
            F.expr(
                f"stack({len(_GOPHER_RULES)}, {stack_args}) "
                "AS (rule, n_fail, n_sole_blocker)"
            ),
        )
        .select(
            "rule",
            F.col("n_fail").cast("bigint").alias("n_fail"),
            F.col("n_sole_blocker").cast("bigint").alias("n_sole_blocker"),
            F.round(F.col("n_fail") * F.lit(1.0) / F.col("n_docs"), 4).alias(
                "fail_frac"
            ),
        )
        .orderBy("rule")
    )


# --------------------------------------------------------------------------
# q_k78 — token-budget allocation across sources (exact water-filling)
# --------------------------------------------------------------------------
#: Budget as an exact fraction of total corpus tokens: num/den = 40%.
BUDGET_NUM = 2
BUDGET_DEN = 5


#: q_k78's full oracle SQL, module-level so q_k80's budget-enforced
#: sample can wrap the IDENTICAL allocation as a subquery.
K78_ORACLE = f"""
        WITH avail AS (
            SELECT source,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail_tok
            FROM documents GROUP BY source
        ),
        ranked AS (
            SELECT source, avail_tok,
                   ROW_NUMBER() OVER (ORDER BY avail_tok, source) AS i,
                   SUM(avail_tok) OVER (ORDER BY avail_tok, source
                                        ROWS UNBOUNDED PRECEDING) AS p,
                   COUNT(*) OVER () AS n,
                   SUM(avail_tok) OVER () AS tot
            FROM avail
        ),
        budgeted AS (
            SELECT *, (tot * {BUDGET_NUM}) // {BUDGET_DEN} AS b,
                   avail_tok * (n - i + 1) <= (tot * {BUDGET_NUM}) // {BUDGET_DEN}
                       - (p - avail_tok) AS capped
            FROM ranked
        ),
        sized AS (
            SELECT *,
                   SUM(CASE WHEN capped THEN avail_tok ELSE 0 END) OVER () AS c_tok,
                   SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS n_capped,
                   CASE WHEN capped THEN NULL ELSE
                       ROW_NUMBER() OVER (PARTITION BY capped ORDER BY source)
                   END AS uncapped_rank
            FROM budgeted
        )
        SELECT source, avail_tok,
               CAST(CASE WHEN capped THEN avail_tok
                    ELSE (b - c_tok) // (n - n_capped)
                         + CASE WHEN uncapped_rank <= (b - c_tok) % (n - n_capped)
                                THEN 1 ELSE 0 END
                    END AS BIGINT) AS alloc_tok,
               capped
        FROM sized
        ORDER BY source
    """


@register(
    "q_k78_token_budget_allocation",
    family="K",
    doc="K-78 deterministic token-budget allocator: water-fill a "
    "40%-of-corpus budget across sources — every source smaller than "
    "the water level is fully served (capped prefix of the "
    "availability-ascending order; per-row test avail_i*(n-i+1) <= "
    "B - p_(i-1) is monotone, so it marks exactly the maximal "
    "prefix), the rest split the remainder as base = R div m plus +1 "
    "for the first R mod m uncapped sources in name order. Pure "
    "integer algebra end-to-end (no float water level), so the "
    "allocation is bit-identical cross-engine. The only corpus pass "
    "is the per-source token count; every window runs on that "
    "dimension-sized aggregate.",
    oracle=K78_ORACLE,
)
def q_k78_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions.text import words

    docs = load(spark, sf_dir, "documents")
    avail = (
        docs.select("source", F.size(words(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("avail_tok"))
    )
    # everything below operates on the per-source aggregate (bounded by
    # the number of feeds, not the corpus) — unpartitioned windows here
    # are dimension-sized by construction
    w_asc = W.orderBy("avail_tok", "source")
    w_all = W.partitionBy()
    ranked = avail.select(
        "source",
        "avail_tok",
        F.row_number().over(w_asc).alias("i"),
        F.sum("avail_tok").over(w_asc.rowsBetween(W.unboundedPreceding, 0)).alias("p"),
        F.count("*").over(w_all).alias("n"),
        F.sum("avail_tok").over(w_all).alias("tot"),
    )
    b = F.expr(f"tot * {BUDGET_NUM} div {BUDGET_DEN}")
    budgeted = ranked.select(
        "*",
        b.alias("b"),
        (
            F.col("avail_tok") * (F.col("n") - F.col("i") + 1)
            <= b - (F.col("p") - F.col("avail_tok"))
        ).alias("capped"),
    )
    sized = budgeted.select(
        "*",
        F.sum(F.when(F.col("capped"), F.col("avail_tok")).otherwise(0))
        .over(w_all)
        .alias("c_tok"),
        F.sum(F.col("capped").cast("int")).over(w_all).alias("n_capped"),
        F.when(
            ~F.col("capped"),
            F.row_number().over(W.partitionBy("capped").orderBy("source")),
        ).alias("uncapped_rank"),
    )
    base = F.expr("(b - c_tok) div (n - n_capped)")
    extra = F.when(
        F.col("uncapped_rank") <= F.expr("(b - c_tok) % (n - n_capped)"), 1
    ).otherwise(0)
    return (
        sized.select(
            "source",
            "avail_tok",
            F.when(F.col("capped"), F.col("avail_tok"))
            .otherwise(base + extra)
            .cast("bigint")
            .alias("alloc_tok"),
            "capped",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q_k80 — budget-enforced corpus sample (q_k78's allocation materialized)
# --------------------------------------------------------------------------
@register(
    "q_k80_budget_enforced_sample",
    family="K",
    bench=True,  # r6 bucket-cumsum decomposition: keep its cost visible
    doc="K-80 budget-enforced sample: per source, documents are drawn "
    "in md5('budget'||doc_id) order and kept while the source's "
    "running token total stays within its q_k78 allocation — the "
    "end-to-end 'hand me a B-token corpus respecting the caps' "
    "selection. The allocation table joining "
    "in is one row per source (broadcast). SCALE: the oracle's "
    "per-source running sum is computed WITHOUT a corpus-sized "
    "per-source window — the md5 draw's first two hex chars form 256 "
    "uniform range buckets (a PREFIX of the ordering key, so bucket "
    "order == draw order), per-(source, bucket) token sums roll up "
    "to a 256-row-per-source offset table, and the intra-bucket "
    "cumsum partitions by the high-cardinality (source, bucket) key; "
    "every task holds ~1/256th of a source, never its 100 TB share "
    "(the q_k63 decomposition, VERDICT r5 ask #1). Greedy-prefix semantics: "
    "kept = running total <= alloc, so the sample undershoots by at "
    "most one document per source and is deterministic cross-engine "
    "(integer cumsum over an md5 total order).",
    oracle=f"""
        WITH alloc AS (
            SELECT source, alloc_tok FROM ({K78_ORACLE}) k78
        ),
        drawn AS (
            SELECT d.doc_id, d.source,
                   len(string_split(d.text, ' ')) AS n_tok,
                   SUM(len(string_split(d.text, ' '))) OVER (
                       PARTITION BY d.source
                       ORDER BY md5('budget' || d.doc_id), d.doc_id
                       ROWS UNBOUNDED PRECEDING) AS cum_tok
            FROM documents d
        )
        SELECT drawn.doc_id, drawn.source,
               CAST(n_tok AS BIGINT) AS n_tok,
               CAST(cum_tok AS BIGINT) AS cum_tok
        FROM drawn JOIN alloc ON alloc.source = drawn.source
        WHERE cum_tok <= alloc.alloc_tok
        ORDER BY drawn.doc_id
    """,
)
def q_k80_budget_enforced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions.text import words

    docs = load(spark, sf_dir, "documents")
    alloc = q_k78_token_budget_allocation(spark, sf_dir).select("source", "alloc_tok")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(words(F.col("text"))).alias("n_tok"),
        F.md5(F.concat(F.lit("budget"), F.col("doc_id").cast("string"))).alias(
            "_draw"
        ),
    ).withColumn("_bkt", F.substring("_draw", 1, 2))
    # The 2-hex-prefix bucket preserves the (md5, doc_id) total order,
    # so the shared bucket-offset + intra-bucket-cumsum decomposition
    # (<=256 bucket rows per source) equals the global running sum.
    from cdc_publisher_spark.functions.windows import bucketed_running_sum

    drawn = bucketed_running_sum(
        sized, "source", "_bkt", ["_draw", "doc_id"], "n_tok", "cum_tok"
    ).select("doc_id", "source", "n_tok", "cum_tok")
    return (
        drawn.join(F.broadcast(alloc), "source")
        .filter(F.col("cum_tok") <= F.col("alloc_tok"))
        .select(
            "doc_id",
            "source",
            F.col("n_tok").cast("bigint").alias("n_tok"),
            F.col("cum_tok").cast("bigint").alias("cum_tok"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q_k111 — kNN hubness audit (k-occurrence distribution)
# --------------------------------------------------------------------------
@register(
    "q_k111_knn_hubness",
    family="K",
    doc="K-111 kNN hubness audit (Radovanovic et al. 2010, 'Hubs in "
    "Space'): the k-occurrence N_k(x) — how many probes list x among "
    "their top-5 exact cosine neighbors — whose right-skewed "
    "distribution is the classic high-dimensional retrieval pathology "
    "(a few hub vectors dominate every neighbor list and poison "
    "ANN-based dedup/retrieval). Output is the exact integer "
    "k-occurrence histogram over ALL vectors, 0-bucket included, so "
    "both engines agree bit-for-bit. Probe set is the q_k73 bounded "
    "md5 draw (seed 'hubq'): cost O(probes * n) with the probe block "
    "broadcast, ranking windows per probe, and a final tiny histogram "
    "aggregate — never O(n^2), scale-safe at any corpus size.",
    oracle=f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        q AS (
            SELECT * FROM v
            ORDER BY md5('hubq' || vec_id), vec_id
            LIMIT {KNN_PROBES}
        ),
        scored AS (
            SELECT c.vec_id AS cid,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.e, c.e)
                                / (sqrt(list_dot_product(q.e, q.e))
                                   * sqrt(list_dot_product(c.e, c.e))) DESC,
                                c.vec_id) AS rk
            FROM q JOIN v c ON c.vec_id <> q.vec_id
        ),
        occ AS (
            SELECT cid, COUNT(*) AS k_occ FROM scored WHERE rk <= {KNN_K}
            GROUP BY cid
        )
        SELECT CAST(COALESCE(occ.k_occ, 0) AS BIGINT) AS k_occ,
               CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM v LEFT JOIN occ ON occ.cid = v.vec_id
        GROUP BY 1
        ORDER BY 1
    """,
)
def q_k111_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    probes = (
        e.select("vec_id", "embedding")
        .orderBy(
            F.md5(F.concat(F.lit("hubq"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(KNN_PROBES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
            VX.l2_norm(F.col("embedding")).alias("qn"),
        )
    )
    cand = e.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        VX.l2_norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        cand.crossJoin(F.broadcast(probes))
        .filter(F.col("cand_id") != F.col("qid"))
        .select(
            "qid",
            "cand_id",
            VX.cosine_with_norms(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("cos"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cand_id"))
    occ = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .groupBy("cand_id")
        .agg(F.count("*").alias("k_occ"))
    )
    return (
        e.select(F.col("vec_id").alias("cand_id"))
        .join(occ, "cand_id", "left")
        .select(F.coalesce(F.col("k_occ"), F.lit(0)).cast("bigint").alias("k_occ"))
        .groupBy("k_occ")
        .agg(F.count("*").cast("bigint").alias("n_vectors"))
        .orderBy("k_occ")
    )


# --------------------------------------------------------------------------
# q_k112 — duplicate-cluster metadata-conflict audit
# --------------------------------------------------------------------------
@register(
    "q_k112_dup_metadata_conflicts",
    family="K",
    doc="K-112 duplicate-cluster metadata-conflict audit: clusters of "
    "documents with identical bag-of-words content (the q_k9 "
    "order-insensitive set fingerprint) whose members DISAGREE on lang "
    "or source — the labeling-noise shape dedup pipelines must "
    "adjudicate before keeping one canonical doc per cluster (a wrong "
    "language tag survives dedup verbatim; a cross-source mirror "
    "inflates per-source statistics). Emits one row per conflicted "
    "cluster with the exact member/lang/source counts and the sorted "
    "lang list. Scale: ONE hash aggregate keyed by the 32-hex "
    "fingerprint (map-side combine, no self-join, no window); "
    "collect_set is bounded by language-tag cardinality.",
    oracle="""
        SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               MIN(doc_id) AS first_doc,
               array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs
        FROM documents
        GROUP BY 1
        HAVING COUNT(*) > 1
           AND (COUNT(DISTINCT lang) > 1 OR COUNT(DISTINCT source) > 1)
        ORDER BY first_doc
    """,
)
def q_k112_dup_metadata_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            TX.set_fingerprint(F.col("text")).alias("fp"),
            "doc_id",
            "lang",
            "source",
        )
        .groupBy("fp")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.min("doc_id").alias("first_doc"),
            F.concat_ws(",", F.array_sort(F.collect_set("lang"))).alias("langs"),
        )
        .filter(
            (F.col("n_docs") > 1)
            & ((F.col("n_langs") > 1) | (F.col("n_sources") > 1))
        )
        .orderBy("first_doc")
    )


# --------------------------------------------------------------------------
# q_k120 — TwoNN intrinsic-dimension estimate per label
# --------------------------------------------------------------------------
@register(
    "q_k120_intrinsic_dimension",
    family="K",
    doc="K-120 TwoNN intrinsic-dimension estimate (Facco et al. 2017, "
    "'Estimating the intrinsic dimension of datasets by a minimal "
    "neighborhood information'): per label, ID = n / sum(ln(d2/d1)) "
    "over probe points, where d1/d2 are each probe's first/second "
    "exact cosine-distance neighbors — the data-manifold audit run "
    "before trusting dimension-sensitive downstream choices (ANN "
    "banding width, PCA rank, Matryoshka truncation: a corpus whose "
    "effective dimension is 9 does not need 64-dim indexes). Probe "
    "set is the bounded md5 draw (seed 'twonn', the q_k73/q_k111 "
    "convention) so cost is O(probes * n) with the probe block "
    "broadcast — never O(n^2). Probes with d1 = 0 (exact duplicate "
    "vectors) are excluded and counted. Each ln ratio is 8dp-rounded "
    "and DECIMAL-summed (q_k72 convention); neighbor ties break on "
    "vec_id in both engines.",
    oracle=f"""
        WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] e FROM embeddings),
        q AS (
            SELECT * FROM v
            ORDER BY md5('twonn' || vec_id), vec_id
            LIMIT {KNN_PROBES}
        ),
        scored0 AS (
            SELECT q.vec_id AS qid, q.label AS label, c.vec_id AS cid,
                   1.0 - list_dot_product(q.e, c.e)
                         / (sqrt(list_dot_product(q.e, q.e))
                            * sqrt(list_dot_product(c.e, c.e))) AS dist
            FROM q JOIN v c ON c.vec_id <> q.vec_id
        ),
        scored AS (
            SELECT qid, label, dist,
                   row_number() OVER (
                       PARTITION BY qid ORDER BY dist ASC, cid) AS rk
            FROM scored0
        ),
        nn AS (
            SELECT qid, label,
                   MAX(CASE WHEN rk = 1 THEN dist END) AS d1,
                   MAX(CASE WHEN rk = 2 THEN dist END) AS d2
            FROM scored WHERE rk <= 2 GROUP BY qid, label
        ),
        terms AS (
            SELECT label,
                   CASE WHEN d1 > 0 THEN 1 ELSE 0 END AS ok,
                   CASE WHEN d1 > 0
                        THEN CAST(ROUND(ln(d2 / d1), 8) AS DECIMAL(18, 8))
                        ELSE CAST(0 AS DECIMAL(18, 8)) END AS lt
            FROM nn
        )
        SELECT CAST(label AS BIGINT) AS label,
               CAST(COUNT(*) AS BIGINT) AS n_probes,
               CAST(SUM(ok) AS BIGINT) AS n_used,
               CASE WHEN SUM(ok) = 0 OR SUM(lt) = 0 THEN NULL
                    ELSE ROUND(SUM(ok) / CAST(SUM(lt) AS DOUBLE), 4)
               END AS id_estimate
        FROM terms
        GROUP BY label
        ORDER BY label
    """,
)
def q_k120_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    probes = (
        e.orderBy(
            F.md5(F.concat(F.lit("twonn"), F.col("vec_id").cast("string"))),
            "vec_id",
        )
        .limit(KNN_PROBES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("label"),
            F.col("embedding").alias("qv"),
            VX.l2_norm(F.col("embedding")).alias("qn"),
        )
    )
    cand = e.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv"),
        VX.l2_norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        cand.crossJoin(F.broadcast(probes))
        .filter(F.col("cid") != F.col("qid"))
        .select(
            "qid",
            "label",
            "cid",
            (
                F.lit(1.0)
                - VX.cosine_with_norms(
                    F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
                )
            ).alias("dist"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("cid"))
    nn = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .groupBy("qid", "label")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("dist"))).alias("d1"),
            F.max(F.when(F.col("rk") == 2, F.col("dist"))).alias("d2"),
        )
    )
    terms = nn.select(
        "label",
        F.when(F.col("d1") > 0, 1).otherwise(0).alias("ok"),
        F.when(
            F.col("d1") > 0,
            F.round(F.log(F.col("d2") / F.col("d1")), 8).cast("decimal(18,8)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,8)"))
        .alias("lt"),
    )
    return (
        terms.groupBy("label")
        .agg(
            F.count("*").cast("bigint").alias("n_probes"),
            F.sum("ok").cast("bigint").alias("n_used"),
            # Degenerate-corpus guard (r13 ADVICE): a label whose
            # sampled probes are ALL exact-duplicate vectors has
            # SUM(ok)=0 and SUM(lt)=0 — Spark's 0/0 yields NULL while
            # DuckDB's IEEE double division yields NaN, so both
            # engines pin the ratio to NULL explicitly (and likewise
            # for the SUM(lt)=0 tie-degenerate case, where Spark's
            # x/0 is NULL but DuckDB's is +inf).
            F.when(
                (F.sum("ok") > 0) & (F.sum("lt") != 0),
                F.round(F.sum("ok") / F.sum("lt").cast("double"), 4),
            ).alias("id_estimate"),
        )
        .select(
            F.col("label").cast("bigint").alias("label"),
            "n_probes",
            "n_used",
            "id_estimate",
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# q_k121 — data-constrained epoch allocation (the REPEAT axis k78 lacks)
# --------------------------------------------------------------------------

#: Total training budget as a multiple of the corpus's unique token
#: mass (3x: the regime where repetition decisions start to matter —
#: Muennighoff et al. 2023, "Scaling Data-Constrained Language
#: Models", find ~4 epochs of repeated data nearly as good as fresh).
EPOCH_BUDGET_MULT = 3
#: Per-source epoch ceiling: tokens served from one source never
#: exceed EPOCH_CAP x its unique mass (beyond ~4 epochs repeated data
#: stops paying — same paper).
EPOCH_CAP = 4

K121_ORACLE = f"""
    WITH avail AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS unique_tok
        FROM documents GROUP BY source
    ),
    sized AS (
        SELECT source, unique_tok,
               ROW_NUMBER() OVER (ORDER BY source) AS nr,
               COUNT(*) OVER () AS n,
               SUM(unique_tok) OVER () * {EPOCH_BUDGET_MULT} AS b
        FROM avail
    ),
    alloc AS (
        SELECT source, unique_tok,
               b // n + CASE WHEN nr <= b % n THEN 1 ELSE 0 END AS req_tok,
               unique_tok * {EPOCH_CAP} AS cap_tok
        FROM sized
    )
    SELECT source,
           unique_tok,
           CAST(req_tok AS BIGINT) AS req_tok,
           CAST(LEAST(req_tok, cap_tok) AS BIGINT) AS served_tok,
           req_tok > cap_tok AS epoch_capped,
           ROUND(LEAST(req_tok, cap_tok) * 1.0 / unique_tok, 4) AS epochs,
           CAST(GREATEST(LEAST(req_tok, cap_tok) - unique_tok, 0) AS BIGINT)
               AS repeated_tok
    FROM alloc
    ORDER BY source
"""


@register(
    "q_k121_epoch_allocation",
    family="K",
    doc="K-121 data-constrained epoch allocation (Muennighoff 2023): "
    "q_k78 water-fills a sub-corpus budget over UNIQUE tokens; this is "
    "the other regime — the budget EXCEEDS the corpus "
    f"({EPOCH_BUDGET_MULT}x its unique mass), so sources must repeat. "
    "Uniform per-source share (base = B div n, +1 token for the first "
    f"B mod n sources in name order), capped at {EPOCH_CAP} epochs of "
    "each source's unique mass (the repeated-data value decay the "
    "paper measures); per source: unique/requested/served token mass, "
    "whether the epoch cap bound, the implied epoch count (one 4dp "
    "division of exact integers), and the repeated-token mass the "
    "budget forces. Pure integer algebra end-to-end otherwise — "
    "bit-identical cross-engine. Plan: ONE corpus pass (per-source "
    "token sum); every window runs on the source-dimension aggregate.",
    oracle=K121_ORACLE,
)
def q_k121_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions.text import words

    docs = load(spark, sf_dir, "documents")
    avail = (
        docs.select("source", F.size(words(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("unique_tok"))
    )
    # dimension-sized frames from here on (the k78 convention):
    # unpartitioned windows run over the per-source aggregate only
    w_name = W.orderBy("source")
    w_all = W.partitionBy()
    sized = avail.select(
        "source",
        "unique_tok",
        F.row_number().over(w_name).alias("nr"),
        F.count("*").over(w_all).alias("n"),
        (F.sum("unique_tok").over(w_all) * EPOCH_BUDGET_MULT).alias("b"),
    )
    alloc = sized.select(
        "source",
        "unique_tok",
        (
            F.expr("b div n")
            + F.when(F.col("nr") <= F.expr("b % n"), 1).otherwise(0)
        ).alias("req_tok"),
        (F.col("unique_tok") * EPOCH_CAP).alias("cap_tok"),
    )
    served = F.least(F.col("req_tok"), F.col("cap_tok"))
    return alloc.select(
        "source",
        "unique_tok",
        F.col("req_tok").cast("bigint").alias("req_tok"),
        served.cast("bigint").alias("served_tok"),
        (F.col("req_tok") > F.col("cap_tok")).alias("epoch_capped"),
        F.round(served * F.lit(1.0) / F.col("unique_tok"), 4).alias("epochs"),
        F.greatest(served - F.col("unique_tok"), F.lit(0))
        .cast("bigint")
        .alias("repeated_tok"),
    ).orderBy("source")
