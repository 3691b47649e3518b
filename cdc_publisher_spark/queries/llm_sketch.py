"""Family K round-6 extension: sketch-backed corpus operators.

Dedup and overlap at 100 TB are sketch problems before they are join
problems: the first question ("is this batch mostly new?") should be
answerable from a structure that fits in one broadcast, not from a
corpus-wide shuffle. Three canonical sketches, each built as a plain
aggregation (so Spark's partial+final combine IS the sketch merge)
and each audited against the exact answer inside the same query:

- q_k81 Bloom-filter membership probe (Bloom 1970): an m-bit filter
  over the history split's exact-dup keys, packed into <= m/64 bigint
  words by a bit_or aggregate, broadcast to the probe split. The
  one-sided guarantee (no false negatives) is emitted as a checked
  column; the false-positive rate is measured against the exact
  semi-join.
- q_k82 weighted reservoir sample (A-ES, Efraimidis & Spirakis 2006):
  top-K documents by ln(u)/w key with per-doc deterministic md5 u and
  token-count weight — THE way to draw a weighted sample without a
  global sort (TakeOrderedAndProject, no Window at all).
- q_k83 KMV source-overlap sketches (Beyer et al. 2007 / Broder's
  minhash bottom-k): per source keep the K smallest md5 shingle
  hashes (a WindowGroupLimit-compiled rank, the q_k31 shape), then
  estimate every source-pair Jaccard from the merged bottom-K alone —
  sketch bytes per source are O(K) regardless of corpus size. The
  exact pairwise Jaccard comes from ONE bitmap aggregation (bit_or of
  per-source bits per shingle, then counts per bitmap value), not 190
  pairwise joins.

Determinism: all randomness is md5-derived (DuckDB reproduces the
exact bytes); q_k82's single ln() per row is rounded to 8 dp before
ranking per registry.py float canonicalization, with doc_id
tiebreaks.

Reference parity: none of this exists in the reference (a CDC
microservice, /root/reference/src/cdc_publisher/core.clj:1-22); all
are declared LLM-data extension surface (SURVEY.md §2.2 K family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cdc_publisher_spark.functions import text as TX
from cdc_publisher_spark.registry import register, track_persist
from cdc_publisher_spark.tables import load

BLOOM_BITS = 65536  # m: 1024 bigint words, one broadcast row group
BLOOM_HASHES = 4  # k: optimal-ish for ~5% fill at sf0.1 history sizes
RESERVOIR_K = 20
KMV_K = 64


# --------------------------------------------------------------------------
# q_k81 — Bloom-filter dedup probe
# --------------------------------------------------------------------------
@register(
    "q_k81_bloom_dedup_probe",
    family="K",
    bench=True,  # broadcast-filter build + probe: the sketch scale path
    doc="Bloom-filter membership screen for incremental dedup: the "
    "even-doc_id history split's exact-dup keys (md5(text), the q_k1 "
    "identity) populate a 65536-bit filter — 4 md5-derived bit "
    "positions per key, packed into bigint words by ONE bit_or "
    "aggregate (partial+final combine = sketch merge; <= 1024 rows "
    "total), broadcast to the odd-doc_id probe split. Every probe doc "
    "is classified maybe-dup (all 4 bits set) vs definitely-new; the "
    "exact semi-join on the same key measures truth. Emits the "
    "one-sided guarantee (no_false_negatives — a Bloom filter may "
    "only over-report) and the observed false-positive rate. SCALE: "
    "the filter is O(m) bytes at any corpus size and the probe side "
    "never shuffles — at 100 TB this is the pre-screen that turns a "
    "petabyte anti-join into a broadcast map-side filter plus an "
    "exact join on the tiny maybe-dup remainder. The oracle "
    "reproduces the identical positions as a distinct-position set "
    "(same semantics, layout-free).",
    oracle=f"""
        WITH hist AS (
            SELECT DISTINCT md5(text) AS k FROM documents WHERE doc_id % 2 = 0
        ),
        probe AS (
            SELECT doc_id, md5(text) AS k FROM documents WHERE doc_id % 2 = 1
        ),
        hpos AS (
            SELECT DISTINCT
                   CAST(('0x' || substr(md5('bl' || CAST(h.x AS VARCHAR) || hist.k), 1, 8))
                        AS UBIGINT) % {BLOOM_BITS} AS pos
            FROM hist CROSS JOIN generate_series(0, {BLOOM_HASHES - 1}) h(x)
        ),
        ppos AS (
            SELECT probe.doc_id, probe.k,
                   CAST(('0x' || substr(md5('bl' || CAST(h.x AS VARCHAR) || probe.k), 1, 8))
                        AS UBIGINT) % {BLOOM_BITS} AS pos
            FROM probe CROSS JOIN generate_series(0, {BLOOM_HASHES - 1}) h(x)
        ),
        flags AS (
            SELECT p.doc_id, p.k, BOOL_AND(hp.pos IS NOT NULL) AS maybe
            FROM ppos p LEFT JOIN hpos hp ON hp.pos = p.pos
            GROUP BY 1, 2
        ),
        verdict AS (
            SELECT f.doc_id, f.maybe,
                   EXISTS (SELECT 1 FROM hist WHERE hist.k = f.k) AS is_dup
            FROM flags f
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST(COUNT(*) FILTER (WHERE maybe) AS BIGINT) AS n_maybe_dup,
               CAST(COUNT(*) FILTER (WHERE is_dup) AS BIGINT) AS n_true_dup,
               CAST(COUNT(*) FILTER (WHERE maybe AND NOT is_dup) AS BIGINT)
                   AS n_false_pos,
               COALESCE(BOOL_AND(maybe OR NOT is_dup), TRUE)
                   AS no_false_negatives,
               ROUND(COUNT(*) FILTER (WHERE maybe AND NOT is_dup) * 1.0
                     / GREATEST(COUNT(*) FILTER (WHERE NOT is_dup), 1), 4)
                   AS fp_rate
        FROM verdict
    """,
)
def q_k81_bloom_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    key = F.md5("text")
    hashes = spark.range(BLOOM_HASHES).select(F.col("id").alias("h"))

    def positions(df: DataFrame) -> DataFrame:
        return df.crossJoin(F.broadcast(hashes)).select(
            df["*"],
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("bl"), F.col("h").cast("string"), F.col("k"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % BLOOM_BITS
            ).alias("pos"),
        )

    # reused by the bloom build AND the exact-verdict join: cache the
    # even-split distinct so the scan + md5 + distinct shuffle runs once
    hist = track_persist(
        docs.filter(F.col("doc_id") % 2 == 0).select(key.alias("k")).distinct()
    )
    # the filter itself: bit positions packed into bigint words — the
    # groupBy's map-side combine merges per-partition partial filters
    bloom = (
        positions(hist)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # shiftleft's bit-count arg must be a literal in the Python
            # API; the SQL form accepts a column
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("mask"))
    )
    probe = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", key.alias("k"))
    tested = (
        positions(probe)
        .withColumn("word", (F.col("pos") / 64).cast("int"))
        .withColumn("m", F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))"))
        .join(F.broadcast(bloom), "word", "left")
        .groupBy("doc_id", "k")
        .agg(
            F.bool_and(
                F.col("mask").isNotNull() & (F.col("mask").bitwiseAND(F.col("m")) != 0)
            ).alias("maybe")
        )
    )
    verdict = tested.join(
        hist.select("k", F.lit(True).alias("_hit")), "k", "left"
    ).select("doc_id", "maybe", F.coalesce(F.col("_hit"), F.lit(False)).alias("is_dup"))
    return verdict.agg(
        F.count("*").cast("long").alias("n_probe"),
        F.count_if(F.col("maybe")).cast("long").alias("n_maybe_dup"),
        F.count_if(F.col("is_dup")).cast("long").alias("n_true_dup"),
        F.count_if(F.col("maybe") & ~F.col("is_dup")).cast("long").alias("n_false_pos"),
        F.coalesce(
            F.bool_and(F.col("maybe") | ~F.col("is_dup")), F.lit(True)
        ).alias("no_false_negatives"),
        F.round(
            F.count_if(F.col("maybe") & ~F.col("is_dup"))
            / F.greatest(F.count_if(~F.col("is_dup")), F.lit(1)),
            4,
        ).alias("fp_rate"),
    )


# --------------------------------------------------------------------------
# q_k82 — weighted reservoir sample (A-ES exponential keys)
# --------------------------------------------------------------------------
@register(
    "q_k82_weighted_reservoir",
    family="K",
    doc="Token-weighted corpus sample without a global sort: each doc "
    "draws a deterministic md5 uniform u and ranks by the A-ES key "
    "ln(u)/w (w = token count) — the top-K such keys ARE a sample "
    "where inclusion probability is proportional to weight "
    "(Efraimidis-Spirakis 2006). The plan is a TakeOrderedAndProject: "
    "per-partition top-K then one K-row merge on the driver — no "
    "Window, no corpus shuffle, the canonical scale shape for 'give "
    "me N docs weighted by tokens' at any corpus size. Keys are "
    "rounded to 8 dp with doc_id tiebreaks per registry float "
    "canonicalization.",
    oracle=f"""
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               ROUND(
                   ln((CAST(('0x' || substr(md5('res' || CAST(doc_id AS VARCHAR)), 1, 8))
                            AS UBIGINT) + 1) / 4294967297.0)
                   / len(string_split(text, ' ')), 8) AS key
        FROM documents
        ORDER BY key DESC, doc_id ASC
        LIMIT {RESERVOIR_K}
    """,
)
def q_k82_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = TX.n_words(F.col("text"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("res"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("double")
        + 1
    ) / F.lit(4294967297.0)
    return (
        docs.select(
            "doc_id",
            "source",
            w.cast("long").alias("n_tokens"),
            F.round(F.log(u) / w, 8).alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(RESERVOIR_K)
    )


# --------------------------------------------------------------------------
# q_k83 — KMV bottom-k sketches: source-pair Jaccard overlap
# --------------------------------------------------------------------------
@register(
    "q_k83_kmv_source_overlap",
    family="K",
    bench=True,  # WindowGroupLimit sketch build + bitmap exact side
    doc="Source-overlap audit from KMV bottom-k sketches: per source, "
    "the 64 smallest md5 hashes of its distinct trigram shingles "
    "(rank <= K over a per-source window — compiles to "
    "WindowGroupLimit Partial+Final, the q_k31 shape, so each "
    "partition pre-limits to K before the shuffle). Every source pair "
    "then estimates Jaccard from the merged bottom-K alone: of the K "
    "smallest hashes of the UNION, the fraction present in both "
    "sketches (membership via the sketches is exact for union-bottom-K "
    "elements). The exact Jaccard comes from ONE bitmap aggregation — "
    "bit_or of per-source bits per shingle, then counts per bitmap "
    "value (a table bounded by distinct bitmap patterns, not corpus "
    "size) — NOT 190 pairwise shingle joins. err_ok checks "
    "|est - exact| <= 0.25 (K=64 => ~2.5 sigma at worst-case J). "
    "SCALE: sketch bytes per source are O(K); the pair stage touches "
    "only n_sources x K rows however large the corpus.",
    oracle=f"""
        WITH w AS (SELECT source, string_split(text, ' ') ws FROM documents),
        sh AS (
            SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
            FROM w CROSS JOIN generate_series(1, 100000) g(i)
            WHERE i + 2 <= len(ws)
        ),
        hs AS (
            SELECT source, s,
                   CAST(('0x' || substr(md5('kmv' || s), 1, 8)) AS UBIGINT) AS h
            FROM sh
        ),
        sk AS (
            SELECT source, s, h
            FROM (SELECT source, s, h,
                         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, s) AS rk
                  FROM hs)
            WHERE rk <= {KMV_K}
        ),
        srcs AS (SELECT DISTINCT source FROM documents),
        pairs AS (
            SELECT a.source s1, b.source s2 FROM srcs a JOIN srcs b
            ON a.source < b.source
        ),
        merged AS (
            SELECT p.s1, p.s2, sk.s, sk.h,
                   MAX(CASE WHEN sk.source = p.s1 THEN 1 ELSE 0 END) AS in1,
                   MAX(CASE WHEN sk.source = p.s2 THEN 1 ELSE 0 END) AS in2
            FROM pairs p JOIN sk ON sk.source IN (p.s1, p.s2)
            GROUP BY 1, 2, 3, 4
        ),
        ubk AS (
            SELECT s1, s2, in1, in2
            FROM (SELECT s1, s2, in1, in2,
                         ROW_NUMBER() OVER (PARTITION BY s1, s2 ORDER BY h, s) AS rk
                  FROM merged)
            WHERE rk <= {KMV_K}
        ),
        est AS (
            SELECT s1, s2, SUM(in1 * in2) AS n_both, COUNT(*) AS n_k
            FROM ubk GROUP BY 1, 2
        ),
        bm AS (
            SELECT s, BIT_OR(CAST(1 AS BIGINT) <<
                             CAST(substr(source, 4) AS INT)) AS b
            FROM sh GROUP BY s
        ),
        bmc AS (SELECT b, COUNT(*) AS cnt FROM bm GROUP BY b),
        exact AS (
            SELECT p.s1, p.s2,
                   SUM(CASE WHEN (bmc.b >> CAST(substr(p.s1, 4) AS INT)) % 2 = 1
                             AND (bmc.b >> CAST(substr(p.s2, 4) AS INT)) % 2 = 1
                            THEN bmc.cnt ELSE 0 END) AS i,
                   SUM(CASE WHEN (bmc.b >> CAST(substr(p.s1, 4) AS INT)) % 2 = 1
                             OR (bmc.b >> CAST(substr(p.s2, 4) AS INT)) % 2 = 1
                            THEN bmc.cnt ELSE 0 END) AS u
            FROM pairs p CROSS JOIN bmc
            GROUP BY 1, 2
        )
        SELECT est.s1, est.s2,
               CAST(est.n_both AS BIGINT) AS kmv_both,
               ROUND(est.n_both * 1.0 / est.n_k, 4) AS kmv_jaccard,
               ROUND(exact.i * 1.0 / exact.u, 4) AS exact_jaccard,
               (ABS(est.n_both * 1.0 / est.n_k - exact.i * 1.0 / exact.u)
                <= 0.25) AS err_ok
        FROM est JOIN exact ON est.s1 = exact.s1 AND est.s2 = exact.s2
        ORDER BY est.s1, est.s2
    """,
)
def q_k83_kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    sh = (
        TX.shingle_rows(docs, "doc_id", "text", 3)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "s")
        .distinct()
    )
    hs = sh.select(
        "source",
        "s",
        F.conv(F.substring(F.md5(F.concat(F.lit("kmv"), F.col("s"))), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    # per-source bottom-K: rank <= K over the source window compiles to
    # WindowGroupLimit (partial per-partition limit BEFORE the shuffle)
    rk = F.row_number().over(W.partitionBy("source").orderBy("h", "s"))
    sk = track_persist(hs.withColumn("rk", rk).filter(F.col("rk") <= KMV_K).drop("rk"))

    srcs = docs.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
    )
    merged = (
        F.broadcast(pairs)
        .join(sk, (sk["source"] == F.col("s1")) | (sk["source"] == F.col("s2")))
        .groupBy("s1", "s2", "s", "h")
        .agg(
            F.max(F.when(F.col("source") == F.col("s1"), 1).otherwise(0)).alias("in1"),
            F.max(F.when(F.col("source") == F.col("s2"), 1).otherwise(0)).alias("in2"),
        )
    )
    # union bottom-K per pair: input is pairs x <=2K sketch rows, never
    # corpus-sized — the window is over sketch data only
    urk = F.row_number().over(W.partitionBy("s1", "s2").orderBy("h", "s"))
    est = (
        merged.withColumn("rk", urk)
        .filter(F.col("rk") <= KMV_K)
        .groupBy("s1", "s2")
        .agg(
            F.sum(F.col("in1") * F.col("in2")).alias("n_both"),
            F.count("*").alias("n_k"),
        )
    )
    # exact Jaccard via one bitmap aggregation over ALL shingles
    bm = sh.select(
        "s",
        F.expr(
            "shiftleft(cast(1 as bigint), cast(substring(source, 4, 8) as int))"
        ).alias("m"),
    ).groupBy("s").agg(F.bit_or("m").alias("b"))
    bmc = bm.groupBy("b").agg(F.count("*").alias("cnt"))
    b1 = F.expr("shiftright(b, cast(substring(s1, 4, 8) as int)) % 2 = 1")
    b2 = F.expr("shiftright(b, cast(substring(s2, 4, 8) as int)) % 2 = 1")
    exact = (
        F.broadcast(pairs)
        .crossJoin(bmc)
        .groupBy("s1", "s2")
        .agg(
            F.sum(F.when(b1 & b2, F.col("cnt")).otherwise(0)).alias("i"),
            F.sum(F.when(b1 | b2, F.col("cnt")).otherwise(0)).alias("u"),
        )
    )
    kmv_j = F.col("n_both") / F.col("n_k")
    ex_j = F.col("i") / F.col("u")
    return (
        est.join(exact, ["s1", "s2"])
        .select(
            "s1",
            "s2",
            F.col("n_both").cast("long").alias("kmv_both"),
            F.round(kmv_j, 4).alias("kmv_jaccard"),
            F.round(ex_j, 4).alias("exact_jaccard"),
            (F.abs(kmv_j - ex_j) <= 0.25).alias("err_ok"),
        )
        .orderBy("s1", "s2")
    )
