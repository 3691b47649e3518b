"""Family K round-4 extension: data-selection, sketch, and
curation-pipeline operators.

- q_k54 DSIR importance resampling (Xie 2023): hashed-ngram bucket
  distributions (vocab-BOUNDED, broadcast log-ratio table), top-N
  selection via TakeOrderedAndProject — never a global sort.
- q_k56 fuzzy dedup: trigram-shingle candidate nomination + exact
  levenshtein verify, both stages mirrored in the DuckDB oracle.
- q_k57 count-min sketch heavy hitters: the d x w counter table is
  ONE partial+final aggregate (map-side combine IS the sketch merge);
  one-sided-error invariant checked cross-engine, streaming
  mergeability pinned in tests.
- q_k58 Matryoshka truncated-dimension retrieval recall: prefix-dim
  cosine ranking audited against the full-dim ranking, exact oracle.
- q_k60 SSL-prototype pruning (Sorscher 2022): per-cluster drop of
  the most prototypical 10% via cosine-to-own-centroid ranking.
- q_k61 leakage-safe split: md5-draw test set + 5-gram
  decontamination of train, exact per-doc role oracle end-to-end.
- q_k62 CCNet perplexity buckets (Wenzek 2020): per-language
  head/middle/tail thirds on unigram-LM cross-entropy.
- q_k63 curriculum ordering: difficulty bands with round-robin source
  interleaving, all window-rank integer algebra.
- q_k64 interpolated bigram-LM cross-entropy: conditional-probability
  fluency scoring, vocab-bounded broadcast tables.
- q_k65 winnowing fingerprints (Schleimer 2003): window-min selection
  with rightmost tie-break, shared-print near-dup pairs.
- q_k66 maximal duplicated runs (Lee 2021 semantics): diagonal seed
  chaining, variable-length exact spans.

Everything deterministic: buckets/draws come from md5 (reproducible
in DuckDB via ('0x' || substr(md5(g),1,8))::UBIGINT, same trick as
operators/mixing.py), every ln() is 8dp-rounded and DECIMAL-summed,
and every ranking key is rounded + tie-broken into a total order per
registry.py hash-stability rules.

Reference parity: none of this exists in the reference (a CDC
microservice, /root/reference/src/cdc_publisher/core.clj:1-22); all
are declared LLM-data extension surface (SURVEY.md §2.2 K).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import words

# CM sketch primitives are shared with the streaming monitor
# (streaming/cm_monitor.py) so stream cells == batch cells; the
# md5_bucket hash also serves the DSIR bucketing below.
from cdc_publisher_spark.operators.cm import (
    CM_DEPTH,
    CM_WIDTH,
    cm_cells,
    cm_point_estimates,
    md5_bucket as _md5_bucket,
)
from cdc_publisher_spark.registry import register, track_persist
from cdc_publisher_spark.tables import load

DSIR_BUCKETS = 256
DSIR_TARGET = "src0"
DSIR_KEEP = 100
CM_TOP = 20


def _doc_grams(docs: DataFrame) -> DataFrame:
    """Unigrams + space-joined bigrams, one row per gram instance.

    One Generate per corpus pass (r15 optimization): the unigram and
    bigram arrays are concatenated per document and exploded once,
    instead of two scan+explode branches union'd (which cost two full
    corpus passes per consumer — q_k54 reads this frame twice, so the
    old shape ran FOUR corpus explodes per execution, measured via the
    runtime profiler). Row multiset is identical — union order never
    mattered, every consumer aggregates."""
    toks = docs.select("doc_id", "source", words(F.col("text")).alias("w"))
    grams = F.expr(
        "concat(w, transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i+1])))"
    )
    return toks.select(
        "doc_id",
        "source",
        F.explode(F.when(F.size("w") >= 2, grams).otherwise(F.col("w"))).alias("g"),
    )


# --------------------------------------------------------------------------
# q_k54 — DSIR hashed-ngram importance resampling
# --------------------------------------------------------------------------
@register(
    "q_k54_dsir_importance",
    family="K",
    bench=True,  # corpus explode + two bounded distributions + TakeOrdered
    doc="DSIR data selection (Xie et al. 2023): hash every unigram/"
    "bigram into 256 md5 buckets; fit add-1-smoothed bucket "
    "distributions p (target = src0 docs) and q (raw = the rest); "
    "score each raw doc as sum_b c_b * (ln p_b - ln q_b) with 8dp-"
    "rounded DECIMAL terms, summed per-GRAM against the broadcast "
    "ratio table (summing c copies of an equal decimal == exactly "
    "c * term, so the oracle's per-doc-count form matches); keep the "
    "100 highest-scoring raw docs (score desc, doc_id asc tie-break "
    "-> TakeOrderedAndProject). Scale shape: both distributions are "
    "256-row broadcast aggs over the persisted (source, bucket) count "
    "table; the scorer streams gram rows through a broadcast join + "
    "one map-side-combined (doc, source) aggregate — no corpus-"
    "cardinality frame is ever persisted (r7 tripwire). Selection is "
    "top-N not a global sort. No driver-side data traffic.",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
        ),
        uni AS (SELECT doc_id, source, unnest(w) AS g FROM t),
        bi AS (
            SELECT doc_id, source, w[i] || ' ' || w[i + 1] AS g
            FROM t CROSS JOIN generate_series(1, 100000) s(i)
            WHERE i <= len(w) - 1
        ),
        grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        bg AS (
            SELECT doc_id, source,
                   CAST(('0x' || substr(md5('dsir' || g), 1, 8)) AS UBIGINT)
                       % {DSIR_BUCKETS} AS b
            FROM grams
        ),
        docc AS (
            SELECT doc_id, source, b, COUNT(*) AS c
            FROM bg GROUP BY doc_id, source, b
        ),
        tgt AS (
            SELECT b, COUNT(*) AS n FROM bg WHERE source = '{DSIR_TARGET}' GROUP BY b
        ),
        tgt_tot AS (
            SELECT COUNT(*) AS nt FROM bg WHERE source = '{DSIR_TARGET}'
        ),
        raw AS (
            SELECT b, COUNT(*) AS n FROM bg WHERE source <> '{DSIR_TARGET}' GROUP BY b
        ),
        raw_tot AS (
            SELECT COUNT(*) AS nr FROM bg WHERE source <> '{DSIR_TARGET}'
        ),
        buckets AS (
            SELECT CAST(x AS UBIGINT) AS b
            FROM generate_series(0, {DSIR_BUCKETS - 1}) gs(x)
        ),
        ratio AS (
            SELECT buckets.b,
                   CAST(ROUND(ln((COALESCE(tgt.n, 0) + 1.0)
                                 / (tgt_tot.nt + {DSIR_BUCKETS})), 8)
                        AS DECIMAL(20, 8))
                   - CAST(ROUND(ln((COALESCE(raw.n, 0) + 1.0)
                                   / (raw_tot.nr + {DSIR_BUCKETS})), 8)
                        AS DECIMAL(20, 8)) AS w_b
            FROM buckets
            LEFT JOIN tgt ON tgt.b = buckets.b
            LEFT JOIN raw ON raw.b = buckets.b
            CROSS JOIN tgt_tot CROSS JOIN raw_tot
        ),
        scored AS (
            SELECT docc.doc_id, docc.source,
                   SUM(CAST(docc.c AS DECIMAL(12, 0)) * ratio.w_b) AS s
            FROM docc JOIN ratio ON ratio.b = docc.b
            WHERE docc.source <> '{DSIR_TARGET}'
            GROUP BY docc.doc_id, docc.source
        )
        SELECT doc_id, source, CAST(ROUND(s, 4) AS DOUBLE) AS dsir_score
        FROM scored
        ORDER BY s DESC, doc_id ASC
        LIMIT {DSIR_KEEP}
    """,
)
def q_k54_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: both corpus passes start at a heavy gram explode
    # feeding a partial aggregate / broadcast join map-side — the r15
    # A/B measured 0.64x with the spread + single-Generate _doc_grams
    docs = load(spark, sf_dir, "documents", spread=True)
    bg = _doc_grams(docs).select(
        "doc_id", "source", _md5_bucket(F.col("g"), "dsir", DSIR_BUCKETS).alias("b")
    )
    # r7 tripwire triage: the old shape persisted the per-(doc, source,
    # bucket) count frame — O(docs x 256) rows pinned in the block
    # manager. Now the ONLY persisted frame is the (source, bucket)
    # count table (<= sources x 256 rows, broadcast-sized); the bucket
    # distributions and totals read it, and the per-doc scorer re-runs
    # the gram explode once more, streaming per-gram rows through a
    # broadcast ratio join + one map-side-combined (doc, source)
    # aggregate. Two sequential corpus scans beat one scan + a
    # corpus-cardinality persist at 100 TB.
    srcb = track_persist(
        bg.groupBy("source", "b").agg(F.count("*").cast("long").alias("cnt"))
    )
    tgt_n = (
        srcb.filter(F.col("source") == DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("cnt").alias("tn"))
    )
    raw_n = (
        srcb.filter(F.col("source") != DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("cnt").alias("rn"))
    )
    tgt_tot = tgt_n.agg(F.coalesce(F.sum("tn"), F.lit(0)).alias("nt"))
    raw_tot = raw_n.agg(F.coalesce(F.sum("rn"), F.lit(0)).alias("nr"))
    buckets = spark.range(DSIR_BUCKETS).select(F.col("id").alias("b"))

    def _lterm(n: Column, tot: Column) -> Column:
        return F.round(
            F.log((F.coalesce(n, F.lit(0)) + F.lit(1.0)) / (tot + F.lit(DSIR_BUCKETS))), 8
        ).cast("decimal(20,8)")

    ratio = (
        buckets.join(F.broadcast(tgt_n), "b", "left")
        .join(F.broadcast(raw_n), "b", "left")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select(
            "b",
            (_lterm(F.col("tn"), F.col("nt")) - _lterm(F.col("rn"), F.col("nr"))).alias(
                "w_b"
            ),
        )
    )
    # per-gram scoring: every gram row contributes its bucket's w_b
    # once, so SUM(w_b) over gram rows == SUM(c * w_b) over per-doc
    # bucket counts EXACTLY (decimal addition is associative/exact) —
    # no per-doc count intermediate needed
    scored = (
        bg.filter(F.col("source") != DSIR_TARGET)
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum(F.col("w_b")).alias("s"))
    )
    return (
        scored.orderBy(F.col("s").desc(), F.col("doc_id").asc())
        .limit(DSIR_KEEP)
        .select(
            "doc_id",
            "source",
            F.round(F.col("s"), 4).cast("double").alias("dsir_score"),
        )
    )


# --------------------------------------------------------------------------
# q_k57 — count-min sketch heavy hitters
# --------------------------------------------------------------------------
@register(
    "q_k57_countmin_heavy_hitters",
    family="K",
    doc="Count-min sketch frequency estimation: a 4x256 counter table "
    "built by ONE partial+final aggregate over (row, md5-salted "
    "bucket) pairs - the sketch is d*w counters independent of corpus "
    "size, Spark's map-side combine IS the sketch merge, so the "
    "shuffle is bounded by d*w per partition regardless of token "
    "count. Point estimates (min over the d row counters) for the 20 "
    "most frequent true tokens, with the one-sided count-min "
    "guarantee emitted as a checked column: est >= true always. "
    "True top-20 comes from an exact vocab agg + TakeOrdered (the "
    "diagnostic side, vocab-bounded).",
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS g FROM documents
        ),
        cells AS (
            SELECT r.x AS r,
                   CAST(('0x' || substr(md5('cm' || CAST(r.x AS VARCHAR) || g), 1, 8))
                        AS UBIGINT) % {CM_WIDTH} AS b,
                   COUNT(*) AS cnt
            FROM tok CROSS JOIN generate_series(0, {CM_DEPTH - 1}) r(x)
            GROUP BY 1, 2
        ),
        top AS (
            SELECT g, COUNT(*) AS true_c
            FROM tok GROUP BY g
            ORDER BY true_c DESC, g ASC
            LIMIT {CM_TOP}
        ),
        probes AS (
            SELECT top.g, top.true_c, r.x AS r,
                   CAST(('0x' || substr(md5('cm' || CAST(r.x AS VARCHAR) || top.g), 1, 8))
                        AS UBIGINT) % {CM_WIDTH} AS b
            FROM top CROSS JOIN generate_series(0, {CM_DEPTH - 1}) r(x)
        )
        SELECT probes.g AS token,
               CAST(probes.true_c AS BIGINT) AS true_c,
               CAST(MIN(cells.cnt) AS BIGINT) AS cm_est,
               (MIN(cells.cnt) >= probes.true_c) AS overestimate_ok
        FROM probes
        JOIN cells ON cells.r = probes.r AND cells.b = probes.b
        GROUP BY probes.g, probes.true_c
        ORDER BY true_c DESC, token ASC
    """,
)
def q_k57_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(words(F.col("text"))).alias("g"))
    # Sketch build (operators/cm.py, shared with the streaming
    # monitor): every token lands in one bucket per sketch row; the
    # groupBy is the partial+final merge of per-partition sketches.
    cells = cm_cells(tok)
    top = (
        tok.groupBy("g")
        .agg(F.count("*").alias("true_c"))
        .orderBy(F.col("true_c").desc(), F.col("g").asc())
        .limit(CM_TOP)
    )
    return (
        cm_point_estimates(cells, top)
        .select(
            F.col("g").alias("token"),
            F.col("true_c").cast("long").alias("true_c"),
            F.col("cm_est").cast("long").alias("cm_est"),
            (F.col("cm_est") >= F.col("true_c")).alias("overestimate_ok"),
        )
        .orderBy(F.col("true_c").desc(), F.col("token").asc())
    )


# --------------------------------------------------------------------------
# q_k56 — fuzzy dedup: shingle-nominate, edit-distance-verify
# --------------------------------------------------------------------------
FUZZY_MIN_SHARED = 3
FUZZY_SIM = 0.8


@register(
    "q_k56_fuzzy_editdist_dedup",
    family="K",
    doc="Fuzzy near-dup pairs by normalized edit similarity: nominate "
    "candidate pairs sharing >= 3 distinct trigram shingles (the "
    "same int64-hashed shingle equi-join as q_k2 — no doc x doc "
    "product; candidate volume is O(co-occurring shingles)), then "
    "verify with levenshtein on the pair's raw texts and keep "
    "1 - dist/max_len >= 0.8. Edit distance is the verifier CHARACTER-"
    "level fuzzy dedup needs (token-set Jaccard is blind to within-"
    "word edits); running it only on nominated pairs keeps the "
    "O(len^2) DP off the corpus-scale path. Both stages are mirrored "
    "exactly in the DuckDB oracle, so the output hash-checks "
    "end-to-end.",
    oracle=f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 2 <= len(ws)
        ),
        cand AS (
            SELECT a.doc_id d1, b.doc_id d2
            FROM sh a JOIN sh b USING (s)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= {FUZZY_MIN_SHARED}
        ),
        verified AS (
            SELECT cand.d1, cand.d2,
                   levenshtein(ta.text, tb.text) AS dist,
                   GREATEST(length(ta.text), length(tb.text)) AS max_len
            FROM cand
            JOIN documents ta ON ta.doc_id = cand.d1
            JOIN documents tb ON tb.doc_id = cand.d2
        )
        SELECT d1, d2, CAST(dist AS BIGINT) AS edit_dist,
               ROUND(1.0 - dist * 1.0 / max_len, 4) AS edit_sim
        FROM verified
        WHERE 1.0 - dist * 1.0 / max_len >= {FUZZY_SIM}
        ORDER BY d1, d2
    """,
)
def q_k56_fuzzy_editdist_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions import text as TX

    docs = load(spark, sf_dir, "documents")
    tok = TX.shingle_rows(docs, "doc_id", "text", 3, hashed=True)
    cand = (
        tok.alias("a")
        .join(tok.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= FUZZY_MIN_SHARED)
    )
    ta = docs.select(F.col("doc_id").alias("d1"), F.col("text").alias("t1"))
    tb = docs.select(F.col("doc_id").alias("d2"), F.col("text").alias("t2"))
    verified = (
        cand.join(ta, "d1")
        .join(tb, "d2")
        .select(
            "d1",
            "d2",
            F.levenshtein("t1", "t2").alias("dist"),
            F.greatest(F.length("t1"), F.length("t2")).alias("max_len"),
        )
    )
    sim = F.lit(1.0) - F.col("dist") * F.lit(1.0) / F.col("max_len")
    return (
        verified.filter(sim >= FUZZY_SIM)
        .select(
            "d1",
            "d2",
            F.col("dist").cast("long").alias("edit_dist"),
            F.round(sim, 4).alias("edit_sim"),
        )
        .orderBy("d1", "d2")
    )


# --------------------------------------------------------------------------
# q_k58 — Matryoshka truncated-dimension retrieval recall
# --------------------------------------------------------------------------
MRL_DIM = 16
MRL_QUERIES = 20
MRL_K = 10


@register(
    "q_k58_matryoshka_recall",
    family="K",
    doc="Matryoshka-style dimension-truncation audit: rank the corpus "
    "by exact cosine twice - full 64-dim vs the first-16-dim prefix "
    "(the cheap representation a 100 TB first-pass retriever would "
    "scan; 4x less shuffle and compute) - and emit per-query "
    "recall@10 of the truncated ranking against the full one. Both "
    "rankings use the same sequential-fold dot product as DuckDB's "
    "list_dot_product, so ordering (cos desc, cand_id) is bit-"
    "deterministic cross-engine and the whole audit hash-checks "
    "exactly. Query block bounded by design (20 vectors broadcast); "
    "corpus side is one scan, no driver traffic.",
    oracle=f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings),
        q AS (SELECT * FROM v WHERE vec_id < {MRL_QUERIES}),
        c AS (SELECT * FROM v WHERE vec_id >= {MRL_QUERIES}),
        full_rk AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.e, c.e)
                                / (sqrt(list_dot_product(q.e, q.e))
                                   * sqrt(list_dot_product(c.e, c.e))) DESC,
                                c.vec_id) AS rk
            FROM q CROSS JOIN c
        ),
        trunc_rk AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.e[1:{MRL_DIM}], c.e[1:{MRL_DIM}])
                                / (sqrt(list_dot_product(q.e[1:{MRL_DIM}], q.e[1:{MRL_DIM}]))
                                   * sqrt(list_dot_product(c.e[1:{MRL_DIM}], c.e[1:{MRL_DIM}]))) DESC,
                                c.vec_id) AS rk
            FROM q CROSS JOIN c
        )
        SELECT f.query_id,
               CAST(COUNT(t.cand_id) AS BIGINT) AS n_common,
               ROUND(COUNT(t.cand_id) * 1.0 / {MRL_K}, 4) AS recall_at_10
        FROM full_rk f
        LEFT JOIN trunc_rk t
          ON t.query_id = f.query_id AND t.cand_id = f.cand_id AND t.rk <= {MRL_K}
        WHERE f.rk <= {MRL_K}
        GROUP BY f.query_id
        ORDER BY f.query_id
    """,
)
def q_k58_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cdc_publisher_spark.functions import vectors as VX

    e = load(spark, sf_dir, "embeddings")
    # pre-stage each side's norms once per ROW: cosine_with_norms is
    # bit-identical to cosine (same op order) but folds one array per
    # pair instead of three
    q = e.filter(F.col("vec_id") < MRL_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.slice(F.col("embedding"), 1, MRL_DIM).alias("qt"),
        VX.l2_norm(F.col("embedding")).alias("qn"),
        VX.l2_norm(F.slice(F.col("embedding"), 1, MRL_DIM)).alias("qtn"),
    )
    c = e.filter(F.col("vec_id") >= MRL_QUERIES).select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.slice(F.col("embedding"), 1, MRL_DIM).alias("ct"),
        VX.l2_norm(F.col("embedding")).alias("cn"),
        VX.l2_norm(F.slice(F.col("embedding"), 1, MRL_DIM)).alias("ctn"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        VX.cosine_with_norms(
            F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
        ).alias("cos_full"),
        VX.cosine_with_norms(
            F.col("qt"), F.col("ct"), F.col("qtn"), F.col("ctn")
        ).alias("cos_trunc"),
    )
    w_full = W.partitionBy("query_id").orderBy(F.col("cos_full").desc(), F.col("cand_id"))
    w_trunc = W.partitionBy("query_id").orderBy(F.col("cos_trunc").desc(), F.col("cand_id"))
    ranked = scored.select(
        "query_id",
        "cand_id",
        F.row_number().over(w_full).alias("rk_full"),
        F.row_number().over(w_trunc).alias("rk_trunc"),
    ).filter(F.col("rk_full") <= MRL_K)
    return (
        ranked.groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("rk_trunc") <= MRL_K, 1).otherwise(0))
            .cast("long")
            .alias("n_common"),
            F.round(
                F.sum(F.when(F.col("rk_trunc") <= MRL_K, 1).otherwise(0)) * F.lit(1.0) / MRL_K,
                4,
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# q_k60 — SSL-prototype pruning (drop the most prototypical examples)
# --------------------------------------------------------------------------
PROTO_LISTS = 8
PROTO_DROP = 0.10


@register(
    "q_k60_prototype_pruning",
    family="K",
    doc="SSL-prototype data pruning (Sorscher 2022, 'Beyond neural "
    "scaling laws'): cluster embeddings with the IVF coarse "
    "quantizer (operators/ivf.py — sample-trained k-means++, "
    "expression-only assignment), score each vector's "
    "prototypicality as cosine to its own centroid, and drop the "
    "top 10% most prototypical PER CLUSTER (the 'easy' examples; "
    "keeping hard examples is the data-efficient regime at scale). "
    "Per-cluster ranking is one window partitioned on list_id — "
    "cluster-sized partitions, no global sort. Centroids are seeded "
    "but not SQL-reproducible, so the registered form emits count-"
    "anchored invariants: the oracle recomputes n_total; the "
    "booleans pin the exact per-cluster drop quota "
    "(dropped == floor(0.1 * cluster size)), full coverage "
    "(kept + dropped == total), and score sanity (-1 <= proto <= 1).",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               TRUE AS quota_exact,
               TRUE AS coverage_ok,
               TRUE AS scores_in_range
        FROM embeddings
    """,
)
def q_k60_prototype_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cdc_publisher_spark.functions.vectors import dot, l2_norm
    from cdc_publisher_spark.operators.ivf import build_ivf

    e = load(spark, sf_dir, "embeddings")
    if e.limit(1).count() == 0:  # k-means cannot fit on zero rows
        return spark.createDataFrame(
            [(0, True, True, True)],
            "n_total long, quota_exact boolean, coverage_ok boolean, "
            "scores_in_range boolean",
        )
    idx = build_ivf(e, n_lists=PROTO_LISTS)
    cent = {i: c for i, c in enumerate(idx.centroids)}
    # cosine(vec, own centroid): literal centroid arrays, one CASE over
    # list_id — expression-only, no join needed for k centroids
    cent_arr = {
        i: F.array(*[F.lit(float(x)) for x in c]) for i, c in cent.items()
    }
    cnorm = {
        i: float(sum(x * x for x in c) ** 0.5) or 1.0 for i, c in cent.items()
    }
    proto = F.lit(None).cast("double")
    for i in cent:
        proto = (
            F.when(
                F.col("list_id") == i,
                dot(F.col(idx.vec_col), cent_arr[i])
                / (F.col("norm") * F.lit(cnorm[i])),
            ).otherwise(proto)
        )
    # the assignment + centroid-cosine lineage feeds the ranking, the
    # independent size re-aggregation, and the range audit. NOT
    # persisted (r7 tripwire triage): the centroids are plan literals
    # (build_ivf fits eagerly on its bounded sample), so each consumer
    # re-evaluates the same deterministic scan — audit independence is
    # about separate AGGREGATION paths, and re-scanning beats pinning a
    # per-vector frame in the block manager at corpus scale
    scored = idx.corpus.select(
        F.col(idx.id_col), F.col("list_id"), proto.alias("proto")
    )
    w = W.partitionBy("list_id").orderBy(F.col("proto").desc(), F.col(idx.id_col))
    ranked = scored.select(
        idx.id_col,
        "list_id",
        "proto",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(W.partitionBy("list_id")).alias("csize"),
    ).withColumn(
        "dropped", F.col("rk") <= F.floor(F.col("csize") * F.lit(PROTO_DROP))
    )
    # Audit against INDEPENDENTLY computed quantities (not the window
    # columns that defined the drops): cluster sizes re-aggregated from
    # the raw assignment, corpus total from the source table, and the
    # semantic boundary property (every dropped vector at least as
    # prototypical as every kept one in its cluster).
    ind_sizes = scored.groupBy("list_id").agg(F.count("*").alias("ind_size"))
    per_cluster = (
        ranked.groupBy("list_id")
        .agg(
            F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("n_dropped"),
            F.count("*").alias("n_rows"),
            F.min(F.when(F.col("dropped"), F.col("proto"))).alias("min_dropped"),
            F.max(F.when(~F.col("dropped"), F.col("proto"))).alias("max_kept"),
        )
        .join(F.broadcast(ind_sizes), "list_id")
    )
    n_src = e.agg(F.count("*").alias("n_src"))
    return (
        per_cluster.agg(
            F.sum("n_rows").cast("long").alias("_n_ranked"),
            F.bool_and(
                F.col("n_dropped") == F.floor(F.col("ind_size") * F.lit(PROTO_DROP))
            ).alias("quota_exact"),
            F.bool_and(F.col("n_rows") == F.col("ind_size")).alias("_sizes_agree"),
            F.bool_and(
                F.col("min_dropped").isNull()
                | (F.col("min_dropped") >= F.col("max_kept") - F.lit(1e-12))
            ).alias("_boundary_ok"),
        )
        .crossJoin(F.broadcast(n_src))
        .crossJoin(
            F.broadcast(
                ranked.agg(
                    F.bool_and(
                        (F.col("proto") >= -1.0 - 1e-9) & (F.col("proto") <= 1.0 + 1e-9)
                    ).alias("_in_range")
                )
            )
        )
        .select(
            F.col("n_src").cast("long").alias("n_total"),
            (F.col("quota_exact") & F.col("_boundary_ok")).alias("quota_exact"),
            ((F.col("_n_ranked") == F.col("n_src")) & F.col("_sizes_agree")).alias(
                "coverage_ok"
            ),
            F.col("_in_range").alias("scores_in_range"),
        )
    )


# --------------------------------------------------------------------------
# q_k61 — leakage-safe train/test split (split + decontaminate composed)
# --------------------------------------------------------------------------
LEAK_TEST_FRAC = 0.1
LEAK_GRAM = 5


@register(
    "q_k61_leakage_safe_split",
    family="K",
    doc="Leakage-safe dataset split: md5-draw 10% of docs as the test "
    "set (content-keyed, partitioning-independent — same draw as "
    "q_k20), then DROP every train doc sharing any 5-token shingle "
    "with any test doc (the k19 decontamination semantics turned "
    "inward, so the split itself cannot leak evaluation n-grams into "
    "training). Every stage is md5/shingle algebra both engines "
    "reproduce, so the final per-doc role assignment hash-checks "
    "EXACTLY — no invariant indirection (the Spark side shuffles "
    "xxhash64'd 8-byte shingle keys, q_k2/q_k3-style, so parity "
    "additionally rests on 64-bit collision-freeness — negligible at "
    "any realistic shingle cardinality). Scale shape: the test-side "
    "distinct-gram set is ~10% of corpus grams (broadcastable), one "
    "draw expression, one semi join, no driver traffic.",
    oracle=f"""
        WITH drawn AS (
            SELECT doc_id, text,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                       / 4294967296.0 < {LEAK_TEST_FRAC} AS is_test
            FROM documents
        ),
        grams AS (
            SELECT doc_id, is_test,
                   ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
                         || ' ' || ws[i+4] AS g
            FROM (SELECT doc_id, is_test, string_split(text, ' ') ws FROM drawn)
            CROSS JOIN generate_series(1, 100000) s(i)
            WHERE i + {LEAK_GRAM - 1} <= len(ws)
        ),
        test_grams AS (SELECT DISTINCT g FROM grams WHERE is_test),
        leaky AS (
            SELECT DISTINCT grams.doc_id
            FROM grams JOIN test_grams USING (g)
            WHERE NOT grams.is_test
        )
        SELECT d.doc_id,
               CASE WHEN d.is_test THEN 'test'
                    WHEN leaky.doc_id IS NOT NULL THEN 'dropped'
                    ELSE 'train' END AS role
        FROM drawn d LEFT JOIN leaky ON leaky.doc_id = d.doc_id
        ORDER BY d.doc_id
    """,
)
def q_k61_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_publisher_spark.functions import text as TX
    from cdc_publisher_spark.operators.mixing import uniform_from_id

    docs = load(spark, sf_dir, "documents")
    drawn = docs.select(
        "doc_id",
        "text",
        (uniform_from_id(F.col("doc_id")) < F.lit(LEAK_TEST_FRAC)).alias("is_test"),
    )
    grams = TX.shingle_rows(drawn, "doc_id", "text", LEAK_GRAM, hashed=True).join(
        drawn.select("doc_id", "is_test"), "doc_id"
    )
    test_grams = grams.filter("is_test").select("s").distinct()
    leaky = (
        grams.filter(~F.col("is_test"))
        .join(test_grams, "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_leak", F.lit(True))
    )
    return (
        drawn.join(leaky, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_test"), F.lit("test"))
            .when(F.col("_leak"), F.lit("dropped"))
            .otherwise(F.lit("train"))
            .alias("role"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q_k62 — CCNet-style perplexity-bucket partition
# --------------------------------------------------------------------------
@register(
    "q_k62_ccnet_perplexity_buckets",
    family="K",
    doc="CCNet's head/middle/tail partition (Wenzek 2020): score every "
    "doc with the unigram-LM cross-entropy (the q_k27 formulation - "
    "8dp-rounded DECIMAL-summed logs, vocab-bounded broadcast prob "
    "table), then split each LANGUAGE into equal thirds by ntile(3) "
    "ordered on (rounded CE asc, doc_id) - the rounding makes the "
    "sort key bit-identical cross-engine and the doc_id tie-break "
    "makes the order total, so bucket membership hash-checks "
    "exactly. head = most-fluent third (lowest CE), the slice CCNet "
    "keeps. SCALE: the oracle's per-language ntile(3) is reproduced "
    "WITHOUT a corpus-sized per-language window — rank(ce, doc_id) "
    "decomposes into a cumulative count over the distinct (lang, ce) "
    "value table (ce is 4dp-rounded, so that table is value-sized; "
    "its per-lang window runs over the value table only) plus a "
    "row_number partitioned by the high-cardinality (lang, ce) tie "
    "group, and ntile's bucket boundaries are pure integer algebra "
    "on (rank, per-lang count): sizes n div 3 (+1 for the first "
    "n%3 buckets) — bit-identical to the window ntile on both "
    "engines (the q_k63 decomposition, VERDICT r5 ask #1).",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        ),
        v AS (SELECT w, COUNT(*) AS tf FROM tok GROUP BY w),
        t AS (SELECT SUM(tf) AS total FROM v),
        lp AS (
            SELECT w, CAST(ROUND(ln(tf * 1.0 / total), 8) AS DECIMAL(18, 8)) AS lw
            FROM v CROSS JOIN t
        ),
        ce AS (
            SELECT tok.doc_id, ROUND(-SUM(lw) / COUNT(*), 4) AS ce
            FROM tok JOIN lp USING (w)
            GROUP BY tok.doc_id
        ),
        bucketed AS (
            SELECT d.doc_id, d.lang, ce.ce,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY ce.ce ASC, d.doc_id) AS third
            FROM documents d JOIN ce ON ce.doc_id = d.doc_id
        )
        SELECT doc_id, lang, CAST(ce AS DOUBLE) AS cross_entropy,
               CASE third WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                          ELSE 'tail' END AS bucket
        FROM bucketed
        ORDER BY doc_id
    """,
)
def q_k62_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

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
    ce = (
        tok.join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(F.round(-F.sum("lw") / F.count("*"), 4).alias("ce"))
    )
    scored = docs.select("doc_id", "lang").join(ce, "doc_id")
    # Per-lang rank(ce asc, doc_id) without a corpus-sized window:
    # (count of same-lang rows with strictly smaller ce) — a running
    # sum over the distinct (lang, ce) VALUE table — plus a row_number
    # inside the (lang, ce) tie group.
    vt = scored.groupBy("lang", "ce").agg(F.count("*").alias("_vc"))
    w_vt = (
        W.partitionBy("lang")
        .orderBy(F.col("ce").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    vt = vt.select(
        "lang", "ce", F.coalesce(F.sum("_vc").over(w_vt), F.lit(0)).alias("_cum_lt")
    )
    n_lang = scored.groupBy("lang").agg(F.count("*").alias("_n"))
    w_tie = W.partitionBy("lang", "ce").orderBy("doc_id")
    ranked = (
        scored.join(F.broadcast(vt), ["lang", "ce"])
        .withColumn("_rk", F.col("_cum_lt") + F.row_number().over(w_tie))
        .join(F.broadcast(n_lang), "lang")
    )
    # ntile(3): first (n % 3) buckets hold (n div 3)+1 rows, the rest
    # n div 3 — the exact window-ntile fill order, as integer algebra.
    base = F.expr("_n div 3")
    rem = F.col("_n") % 3
    b1 = base + F.when(rem >= 1, 1).otherwise(0)
    b2 = base + F.when(rem >= 2, 1).otherwise(0)
    return (
        ranked.withColumn(
            "third",
            F.when(F.col("_rk") <= b1, 1)
            .when(F.col("_rk") <= b1 + b2, 2)
            .otherwise(3),
        )
        .select(
            "doc_id",
            "lang",
            F.col("ce").cast("double").alias("cross_entropy"),
            F.when(F.col("third") == 1, "head")
            .when(F.col("third") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q_k63 — curriculum ordering with deterministic source interleaving
# --------------------------------------------------------------------------
@register(
    "q_k63_curriculum_order",
    family="K",
    doc="Curriculum data ordering (Bengio 2009 shape): schedule the "
    "corpus easy -> hard by the composite quality proxy (longer, "
    "lower-entropy docs first: rank on (quality desc, doc_id)), but "
    "INTERLEAVE sources round-robin within difficulty bands so no "
    "source monopolizes a training phase - curriculum_pos = "
    "band * (per-band size) + round-robin slot from the per-(band, "
    "source) rank. Every key is integer algebra over ranks with "
    "doc_id tie-breaks (total order), so the whole schedule "
    "hash-checks exactly cross-engine. SCALE: the oracle's global "
    "percent_rank is reproduced WITHOUT any corpus-sized window - "
    "rank(n_tok desc, doc_id) decomposes into a cumulative count "
    "over the DISTINCT n_tok value table (dimension-sized, the only "
    "unpartitioned window) plus a row_number partitioned by the tie "
    "group (n_tok); the per-(band, source) round-robin rank "
    "decomposes the same way over (band, source, n_tok), and the "
    "source ids / counts come from a broadcast distinct (band, "
    "source) table. percent_rank's (rank-1)/(n-1)*4 float algebra "
    "is replayed with the same IEEE op order as both engines' "
    "window form, so band boundaries match bit-exactly. The "
    "coarser broadcast-percentile_approx banding lives in q_k33 "
    "(operators/quality_filter.py).",
    oracle="""
        WITH scored AS (
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ),
        banded AS (
            SELECT doc_id, source, n_tok,
                   CAST(least(3, floor(percent_rank() OVER (
                       ORDER BY n_tok DESC, doc_id) * 4)) AS BIGINT) AS band
            FROM scored
        ),
        slotted AS (
            SELECT doc_id, source, n_tok, band,
                   row_number() OVER (PARTITION BY band, source
                                      ORDER BY n_tok DESC, doc_id) AS src_rk,
                   dense_rank() OVER (PARTITION BY band ORDER BY source) AS src_id,
                   COUNT(DISTINCT source) OVER (PARTITION BY band) AS n_src
            FROM banded
        )
        SELECT doc_id, source, band,
               CAST((src_rk - 1) * n_src + src_id - 1 AS BIGINT) AS slot_in_band
        FROM slotted
        ORDER BY band, slot_in_band, doc_id
    """,
)
def q_k63_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", F.size(words(F.col("text"))).cast("long").alias("n_tok")
    )
    # Global rank(n_tok desc, doc_id) with no corpus-sized window:
    # docs ranked above a row = (count of docs with a strictly larger
    # n_tok) + (position among its own tie group, by doc_id). The
    # first term is a running sum over the DISTINCT n_tok table —
    # dimension-sized, the only unpartitioned window in the plan; the
    # second partitions by the tie value.
    vt = scored.groupBy("n_tok").agg(F.count("*").alias("_vc"))
    w_vt = (
        W.orderBy(F.col("n_tok").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    vt = vt.select(
        "n_tok", F.coalesce(F.sum("_vc").over(w_vt), F.lit(0)).alias("_cum_gt")
    )
    n_all = scored.agg(F.count("*").alias("_n"))
    w_tie = W.partitionBy("n_tok").orderBy("doc_id")
    ranked = (
        scored.join(F.broadcast(vt), "n_tok")
        .withColumn("_rk", F.col("_cum_gt") + F.row_number().over(w_tie))
        .crossJoin(F.broadcast(n_all))
    )
    # percent_rank = (rank-1)/(n-1) as a double, then *4 and floor —
    # the identical IEEE op order both engines' window form uses, so
    # band boundaries match bit-exactly. n == 1 => percent_rank 0.
    pr = F.when(
        F.col("_n") == 1, F.lit(0.0)
    ).otherwise((F.col("_rk") - 1).cast("double") / (F.col("_n") - 1).cast("double"))
    banded = ranked.select(
        "doc_id",
        "source",
        "n_tok",
        F.least(F.lit(3), F.floor(pr * 4)).cast("long").alias("band"),
    )
    # Per-(band, source) round-robin rank: same decomposition, keyed by
    # (band, source, n_tok). The cumulative table is dimension-sized
    # and its window is (band, source)-partitioned.
    bst = banded.groupBy("band", "source", "n_tok").agg(F.count("*").alias("_bc"))
    w_bst = (
        W.partitionBy("band", "source")
        .orderBy(F.col("n_tok").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    bst = bst.select(
        "band",
        "source",
        "n_tok",
        F.coalesce(F.sum("_bc").over(w_bst), F.lit(0)).alias("_cum_gt_src"),
    )
    w_src_tie = W.partitionBy("band", "source", "n_tok").orderBy("doc_id")
    slotted = banded.join(F.broadcast(bst), ["band", "source", "n_tok"]).withColumn(
        "src_rk", F.col("_cum_gt_src") + F.row_number().over(w_src_tie)
    )
    # Source ids and counts per band: a broadcast distinct (band,
    # source) table — dense_rank over it is a few-row window.
    srcs = banded.select("band", "source").distinct()
    src_dim = srcs.select(
        "band",
        "source",
        F.dense_rank().over(W.partitionBy("band").orderBy("source")).alias("src_id"),
    )
    n_src = srcs.groupBy("band").agg(F.count("*").alias("n_src"))
    slotted = slotted.join(F.broadcast(src_dim), ["band", "source"]).join(
        F.broadcast(n_src), "band"
    )
    return slotted.select(
        "doc_id",
        "source",
        "band",
        ((F.col("src_rk") - 1) * F.col("n_src") + F.col("src_id") - 1)
        .cast("long")
        .alias("slot_in_band"),
    ).orderBy("band", "slot_in_band", "doc_id")


# --------------------------------------------------------------------------
# q_k64 — interpolated bigram-LM cross-entropy
# --------------------------------------------------------------------------
BILM_LAMBDA = 0.7


@register(
    "q_k64_bigram_lm_score",
    family="K",
    doc="Interpolated bigram-LM cross-entropy per document (the "
    "conditional-probability upgrade over q_k27's unigram scorer - "
    "closer to the KenLM-style fluency filters real pipelines run): "
    "p(w2|w1) = 0.7 * c(w1 w2)/c(w1) + 0.3 * c(w2)/T, scored over "
    "every bigram transition, ce = -mean ln p. Both probability "
    "tables are vocab-bounded aggregates broadcast back; each ln "
    "term is 8dp-rounded and DECIMAL-summed, and the pre-round "
    "double is the same IEEE expression in the same order on the "
    "same integers in both engines, so the score hash-checks "
    "exactly. Docs with fewer than two tokens have no transitions "
    "and are excluded in both engines.",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        bi AS (
            SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
            FROM t CROSS JOIN generate_series(1, 100000) s(i)
            WHERE i <= len(w) - 1
        ),
        uni AS (SELECT unnest(w) AS g FROM t),
        c1 AS (SELECT g, COUNT(*) AS c FROM uni GROUP BY g),
        tot AS (SELECT COUNT(*) AS n FROM uni),
        c2 AS (SELECT w1, w2, COUNT(*) AS c FROM bi GROUP BY w1, w2),
        terms AS (
            SELECT bi.doc_id,
                   CAST(ROUND(ln({BILM_LAMBDA} * (c2.c * 1.0 / cw1.c)
                                 + {1 - BILM_LAMBDA} * (cw2.c * 1.0 / tot.n)), 8)
                        AS DECIMAL(18, 8)) AS lw
            FROM bi
            JOIN c2 ON c2.w1 = bi.w1 AND c2.w2 = bi.w2
            JOIN c1 cw1 ON cw1.g = bi.w1
            JOIN c1 cw2 ON cw2.g = bi.w2
            CROSS JOIN tot
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(-SUM(lw) / COUNT(*), 4) AS cross_entropy
        FROM terms
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def q_k64_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words(F.col("text")).alias("w"))
    bi = toks.filter(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> struct(w[i] AS w1, w[i+1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = toks.select(F.explode("w").alias("g"))
    c1 = uni.groupBy("g").agg(F.count("*").alias("c"))
    # total tokens from the |V|-row vocab table, not a second pass over
    # the corpus-sized explode (same trick as q_k62)
    tot = c1.agg(F.sum("c").alias("n"))
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    terms = (
        bi.join(F.broadcast(c2), ["w1", "w2"])
        .join(
            F.broadcast(c1.select(F.col("g").alias("w1"), F.col("c").alias("cw1"))),
            "w1",
        )
        .join(
            F.broadcast(c1.select(F.col("g").alias("w2"), F.col("c").alias("cw2"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(BILM_LAMBDA) * (F.col("c") * F.lit(1.0) / F.col("cw1"))
                    + F.lit(1 - BILM_LAMBDA) * (F.col("cw2") * F.lit(1.0) / F.col("n"))
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("lw"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(-F.sum("lw") / F.count("*"), 4).cast("double").alias("cross_entropy"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q_k65 — winnowing fingerprints (Schleimer 2003) + shared-print pairs
# --------------------------------------------------------------------------
WIN_K = 3  # k-gram size (tokens)
WIN_W = 4  # winnowing window (k-gram hashes per window)


@register(
    "q_k65_winnowing_pairs",
    family="K",
    bench=True,  # window-select + print co-occurrence join
    doc="Winnowing fingerprints (Schleimer 2003, the MOSS local "
    "fingerprinting algorithm): hash every 3-token k-gram (md5 hex, "
    "cross-engine), slide a window of 4 consecutive hashes, and "
    "select each window's minimum with the paper's RIGHTMOST tie-"
    "break — encoded as min over the sortable key h||'-'||zero-"
    "padded(inverted pos), so the whole selection is ONE per-doc "
    "window pass in both engines. Guarantee: any shared run of >= "
    "w+k-1 = 6 tokens between two docs shares a selected "
    "fingerprint; storage density ~2/(w+1). Output: doc pairs "
    "sharing >= 2 selected prints with the shared count — the "
    "plagiarism/near-dup detector shape. Scale: selection never "
    "shuffles (per-doc window); the pair join rides the 8-hex print "
    "as an equi key, candidate volume O(co-occurring prints).",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        kg AS (
            SELECT doc_id, i AS pos,
                   substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 8) AS h
            FROM t CROSS JOIN generate_series(1, 100000) s(i)
            WHERE i + {WIN_K - 1} <= len(ws)
        ),
        win AS (
            SELECT doc_id, pos,
                   MIN(h || '-' || lpad(CAST(99999999 - pos AS VARCHAR), 8, '0'))
                       OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN {WIN_W - 1} PRECEDING AND CURRENT ROW)
                       AS sel_key
            FROM kg
        ),
        prints AS (
            SELECT DISTINCT doc_id, substr(sel_key, 1, 8) AS h
            FROM win WHERE pos >= {WIN_W}
        )
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM prints a JOIN prints b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= 2
        ORDER BY d1, d2
    """,
)
def q_k65_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cdc_publisher_spark.functions.text import kgram_hashes

    # spread=True: the k-gram posexplode+md5 feeding the first
    # exchange is the dominant stage and otherwise runs on the
    # single scan task (r15 A/B: 0.80x / 0.44x with the spread)
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select("doc_id", words(F.col("text")).alias("ws"))
    kg = kgram_hashes(toks, WIN_K, hex_len=8)
    w = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WIN_W - 1), W.currentRow)
    )
    sel_key = F.min(
        F.concat(
            F.col("h"),
            F.lit("-"),
            F.lpad((F.lit(99999999) - F.col("pos")).cast("string"), 8, "0"),
        )
    ).over(w)
    prints = (
        kg.withColumn("sel_key", sel_key)
        .filter(F.col("pos") >= WIN_W)
        .select("doc_id", F.substring("sel_key", 1, 8).alias("h"))
        .distinct()
    )
    return (
        prints.alias("a")
        .join(prints.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .orderBy("d1", "d2")
    )


# --------------------------------------------------------------------------
# q_k66 — maximal cross-doc duplicated runs (seed-and-chain)
# --------------------------------------------------------------------------
RUN_K = 5  # seed shingle size (tokens)
RUN_MIN = 10  # minimum duplicated run length (tokens)


@register(
    "q_k66_duplicate_runs",
    family="K",
    bench=True,  # seed join + diagonal chaining windows
    doc="Exact substring-duplication extraction (the Lee 2021 "
    "'Deduplicating Training Data' semantics, relationally): seed "
    "with 5-token shingle matches across doc pairs, then chain "
    "seeds lying on the same DIAGONAL (posA - posB constant) into "
    "maximal runs with gaps-and-islands (pos - row_number is "
    "constant within a consecutive island), and keep runs of >= 10 "
    "duplicated tokens, emitting (d1, d2, start positions, length). "
    "Unlike the fixed-window approximations (q_k29/q_k32/q_k51) "
    "this recovers variable-length MAXIMAL duplicated spans "
    "exactly. Cost: seed volume = co-occurring shingles (the q_k2 "
    "bound); chaining is one window per (pair, diagonal). Fully "
    "SQL-reproducible - md5 seeds, integer algebra.",
    oracle=f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        kg AS (
            SELECT doc_id, i AS pos,
                   substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                              || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 12) AS h
            FROM t CROSS JOIN generate_series(1, 100000) s(i)
            WHERE i + {RUN_K - 1} <= len(ws)
        ),
        seeds AS (
            SELECT a.doc_id d1, b.doc_id d2, a.pos pa, b.pos pb,
                   a.pos - b.pos AS diag
            FROM kg a JOIN kg b ON a.h = b.h AND a.doc_id < b.doc_id
        ),
        islands AS (
            SELECT d1, d2, diag, pa, pb,
                   pa - row_number() OVER (PARTITION BY d1, d2, diag
                                           ORDER BY pa) AS grp
            FROM seeds
        ),
        runs AS (
            SELECT d1, d2,
                   MIN(pa) AS start1, MIN(pb) AS start2,
                   CAST(COUNT(*) + {RUN_K} - 1 AS BIGINT) AS run_tokens
            FROM islands
            GROUP BY d1, d2, diag, grp
        )
        SELECT d1, d2, start1, start2, run_tokens
        FROM runs
        WHERE run_tokens >= {RUN_MIN}
        ORDER BY d1, d2, start1, start2
    """,
)
def q_k66_duplicate_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from cdc_publisher_spark.functions.text import kgram_hashes

    # spread=True: the k-gram posexplode+md5 feeding the first
    # exchange is the dominant stage and otherwise runs on the
    # single scan task (r15 A/B: 0.80x / 0.44x with the spread)
    docs = load(spark, sf_dir, "documents", spread=True)
    toks = docs.select("doc_id", words(F.col("text")).alias("ws"))
    kg = kgram_hashes(toks, RUN_K, hex_len=12)
    seeds = (
        kg.alias("a")
        .join(kg.alias("b"), "h")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
    )
    w = W.partitionBy("d1", "d2", "diag").orderBy("pa")
    islands = seeds.withColumn("grp", F.col("pa") - F.row_number().over(w))
    return (
        islands.groupBy("d1", "d2", "diag", "grp")
        .agg(
            F.min("pa").alias("start1"),
            F.min("pb").alias("start2"),
            (F.count("*") + F.lit(RUN_K - 1)).cast("long").alias("run_tokens"),
        )
        .filter(F.col("run_tokens") >= RUN_MIN)
        .select("d1", "d2", "start1", "start2", "run_tokens")
        .orderBy("d1", "d2", "start1", "start2")
    )
