"""Family K round-8 extension: training-data risk audits.

- q_k88 rare-gram exposure: per source, how much of its distinct
  5-gram content is uniquely attributable — grams whose corpus-wide
  document frequency is 1 (one single document anywhere contains
  them) or ≤ RARE_DF. Verbatim extraction attacks recover exactly
  this long-tail content (Carlini et al. 2021, "Extracting Training
  Data from Large Language Models"), and duplication-vs-memorization
  studies (Kandpal et al. 2022; Lee et al. 2021) make gram-level
  document frequency the standard exposure axis. A source with a
  high unique fraction is where PII/secret leakage risk concentrates
  and where dedup cannot help (nothing to deduplicate against).
- q_k89 label centroid drift: per embedding label (the fixture's
  cohort column), cosine of the label's centroid against the global
  corpus centroid, plus the centroid's own L2 norm. The
  cluster-vs-corpus drift screen run before cohort-balanced sampling
  (a label whose centroid sits far off the corpus axis — low cosine
  — or near zero norm — internal cancellation — is a heterogeneous
  or corrupted slice; complements q_k73's kNN purity audit which
  probes the same risk pointwise).

Scale shape:

- q_k88 is one shingle explode (linear, codegen — functions/text.py
  shingle_rows), one equi-join to the (doc_id, source) projection,
  ONE corpus-cardinality hash aggregate keyed by the gram (per-gram
  df + the ≤|sources| distinct-source set via collect_set), then a
  dimension-sized explode/re-aggregate. No window, no persisted
  frame, no pair join — the gram-keyed shuffle is the same shape as
  q_k2's shingle join and distributes by gram hash at any corpus
  size.
- q_k89's only corpus-scale step is the posexplode to (label, pos)
  partials — 64 rows per vector, aggregated with map-side combine
  into ≤ labels×64 sums. Everything after (global re-aggregate, dot
  products, cosines) runs on that dimension-sized frame. Cosine is
  scale-invariant, so it is computed between the SUM vectors —
  no centroid division enters the comparison path.

Float canonicalization per registry.py rules: q_k88 emits exact
integers plus one 4dp-rounded division (k73 precedent). q_k89 rounds
each per-element partial to 8dp and DECIMAL-sums (order-independent,
the llm_ml.py pattern), then forms dot-product terms as 6dp-rounded
DECIMALs of products of identical cross-engine doubles; the final
cosine/norm are single double expressions over exact DECIMAL inputs,
ROUNDed at 6dp.

Reference parity: none of this exists in the reference (a CDC
microservice, /root/reference/src/cdc_publisher/core.clj:1-22); both
are declared LLM-data extension surface beyond SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.functions import text as TX
from cdc_publisher_spark.registry import register
from cdc_publisher_spark.tables import load

#: q_k88 gram order — 5-grams, the span length the extraction
#: literature treats as attributable content (long enough to be
#: specific, short enough to survive paraphrase).
EXPOSURE_K = 5
#: corpus-wide document frequency at or under which a gram counts as
#: "rare" (df == 1 is the stricter "unique" tier, reported separately).
RARE_DF = 2


# --------------------------------------------------------------------------
# q_k88 — rare-gram exposure (memorization / attribution risk)
# --------------------------------------------------------------------------
@register(
    "q_k88_rare_gram_exposure",
    family="K",
    doc="K-88 rare-gram exposure audit: per source, distinct 5-grams "
    "split by corpus-wide document frequency — n_unique (df=1: "
    "uniquely attributable, the verbatim-extraction risk tier) and "
    f"n_rare (df<={RARE_DF}) — with unique_frac = n_unique/n_grams. "
    "One gram-keyed hash aggregate (df + distinct-source set), "
    "dimension-sized output; exact integers + one 4dp division.",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT doc_id,
                   ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                   ws[i+3] || ' ' || ws[i+4] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + {EXPOSURE_K - 1} <= len(ws)
        ),
        j AS (
            SELECT sh.s, sh.doc_id, d.source
            FROM sh JOIN documents d USING (doc_id)
        ),
        g AS (
            SELECT s, COUNT(*) AS df, LIST(DISTINCT source) AS srcs
            FROM j GROUP BY s
        ),
        e AS (SELECT UNNEST(srcs) AS source, df FROM g)
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unique,
               CAST(SUM(CASE WHEN df <= {RARE_DF} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_rare,
               ROUND(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 4) AS unique_frac
        FROM e
        GROUP BY source
        ORDER BY source
    """,
)
def q_k88_rare_gram_exposure(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # per-doc distinct grams as rows (codegen path); string keys, not
    # hashed — the oracle joins on the same literal gram
    sh = TX.shingle_rows(docs, "doc_id", "text", EXPOSURE_K)
    j = sh.join(docs.select("doc_id", "source"), "doc_id")
    # ONE corpus-cardinality aggregate keyed by the gram: (doc_id, s)
    # is distinct by construction, so count(*) IS the document
    # frequency; the source set is bounded by |sources|
    g = j.groupBy("s").agg(
        F.count("*").alias("df"),
        F.collect_set("source").alias("srcs"),
    )
    return (
        g.select(F.explode("srcs").alias("source"), "df")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
            F.sum(F.when(F.col("df") <= RARE_DF, 1).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
        .withColumn(
            "unique_frac",
            F.round(F.col("n_unique") * F.lit(1.0) / F.col("n_grams"), 4),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# q_k89 — label centroid drift (embedding cohort audit)
# --------------------------------------------------------------------------
@register(
    "q_k89_label_centroid_drift",
    family="K",
    doc="K-89 label centroid drift: per label, cosine of the label's "
    "centroid to the global corpus centroid (computed between the "
    "DECIMAL-exact SUM vectors — cosine is scale-invariant) and the "
    "centroid L2 norm. Corpus work is one posexplode + map-side-"
    "combined (label, pos) sum; all trig runs on the ≤ labels×64 "
    "frame. 8dp-rounded DECIMAL partials, 6dp-rounded outputs.",
    oracle="""
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        el AS (
            SELECT label, i, v[i] AS x
            FROM e CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i <= len(v)
        ),
        ls AS (
            SELECT label, i,
                   SUM(CAST(ROUND(x, 8) AS DECIMAL(20, 8))) AS s
            FROM el GROUP BY label, i
        ),
        gs AS (SELECT i, SUM(s) AS gt FROM ls GROUP BY i),
        n AS (SELECT label, COUNT(*) AS n_vecs FROM e GROUP BY label),
        d AS (
            SELECT ls.label,
                   SUM(CAST(ROUND(CAST(ls.s AS DOUBLE) * CAST(gs.gt AS DOUBLE), 6)
                            AS DECIMAL(28, 6))) AS dot,
                   SUM(CAST(ROUND(CAST(ls.s AS DOUBLE) * CAST(ls.s AS DOUBLE), 6)
                            AS DECIMAL(28, 6))) AS ssl,
                   SUM(CAST(ROUND(CAST(gs.gt AS DOUBLE) * CAST(gs.gt AS DOUBLE), 6)
                            AS DECIMAL(28, 6))) AS ssg
            FROM ls JOIN gs USING (i)
            GROUP BY ls.label
        )
        SELECT CAST(d.label AS BIGINT) AS label,
               CAST(n.n_vecs AS BIGINT) AS n_vecs,
               ROUND(CAST(d.dot AS DOUBLE)
                     / SQRT(CAST(d.ssl AS DOUBLE) * CAST(d.ssg AS DOUBLE)),
                     6) AS drift_cos,
               ROUND(SQRT(CAST(d.ssl AS DOUBLE)) / n.n_vecs, 6) AS centroid_l2
        FROM d JOIN n USING (label)
        ORDER BY label
    """,
)
def q_k89_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    el = e.select("label", F.posexplode("embedding").alias("p", "x"))
    # 8dp-rounded DECIMAL partials: exact, order-independent sums
    # (llm_ml.py pattern) — the ONLY corpus-scale aggregate
    ls = el.groupBy("label", "p").agg(
        F.sum(
            F.round(F.col("x").cast("double"), 8).cast("decimal(20,8)")
        ).alias("s")
    )
    gs = ls.groupBy("p").agg(F.sum("s").alias("gt"))
    n = e.groupBy("label").agg(F.count("*").cast("long").alias("n_vecs"))

    def _term(a, b):
        return F.sum(
            F.round(a.cast("double") * b.cast("double"), 6).cast("decimal(28,6)")
        )

    d = (
        ls.join(gs, "p")
        .groupBy("label")
        .agg(
            _term(F.col("s"), F.col("gt")).alias("dot"),
            _term(F.col("s"), F.col("s")).alias("ssl"),
            _term(F.col("gt"), F.col("gt")).alias("ssg"),
        )
    )
    return (
        d.join(n, "label")
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            F.round(
                F.col("dot").cast("double")
                / F.sqrt(F.col("ssl").cast("double") * F.col("ssg").cast("double")),
                6,
            ).alias("drift_cos"),
            F.round(
                F.sqrt(F.col("ssl").cast("double")) / F.col("n_vecs"), 6
            ).alias("centroid_l2"),
        )
        .orderBy("label")
    )
