#!/usr/bin/env python
"""Counted gram-collision masses for q_k65 / q_k66 / q_k32 (r16).

SCALING.md argues those queries' super-linear sf0.1→sf1 ratios are a
FIXTURE artifact (the 31-word synthetic vocabulary densifies gram
collisions as the corpus grows) — VERDICT r15 ask #5 requires the claim
to be COUNTED from the actual join inputs, the way q_k109's candidate
mass was read off its bucket histogram. This emits, per scale factor:

- q_k66: seed-join mass  Σ_h [ (Σ_d occ)² − Σ_d occ² ] / 2  over the
  5-gram hash histogram — exactly the cross-doc seed row count of the
  kg ⋈ kg join (modulo the d1<d2 halving already applied);
- q_k65: fingerprint-join mass Σ_h c·(c−1)/2 over the per-hash count
  of distinct (doc, fingerprint) rows — the prints self-join output;
- q_k32: gram rows, distinct grams, frequent-gram set size and masked
  share — its left join is 1:1 by construction (frequent is one row
  per g), so the quantity that can grow super-linearly is the
  aggregate's input mass and the per-gram count skew, both printed.

Measurement-only tooling (never imported by the engine/bench).
Usage: python tools/count_gram_mass.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def masses(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from cdc_publisher_spark.functions.text import kgram_hashes, words
    from cdc_publisher_spark.operators.spans import _gram_tokens
    from cdc_publisher_spark.queries.llm_select import RUN_K, WIN_K, WIN_W
    from cdc_publisher_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words(F.col("text")).alias("ws"))
    out: dict = {"sf_dir": sf_dir, "n_docs": docs.count()}

    # --- q_k66: 5-gram seed histogram -> exact seed-join mass --------
    kg = kgram_hashes(toks, RUN_K, hex_len=12)
    hist = (
        kg.groupBy("h", "doc_id").agg(F.count("*").alias("occ"))
        .groupBy("h")
        .agg(
            F.sum("occ").alias("tot"),
            F.sum(F.col("occ") * F.col("occ")).alias("sq"),
        )
    )
    row = hist.agg(
        F.count("*").alias("n_grams"),
        F.sum("tot").alias("gram_rows"),
        F.sum((F.col("tot") * F.col("tot") - F.col("sq")) / 2).alias("seed_mass"),
        F.max("tot").alias("hottest_gram_rows"),
    ).collect()[0]
    out["k66"] = {
        "gram_rows": int(row["gram_rows"]),
        "distinct_grams": int(row["n_grams"]),
        "seed_join_mass": int(row["seed_mass"]),
        "hottest_gram_rows": int(row["hottest_gram_rows"]),
    }

    # --- q_k65: winnowing fingerprints -> prints-join mass -----------
    from pyspark.sql import Window as W

    kgw = kgram_hashes(toks, WIN_K, hex_len=8)
    w = W.partitionBy("doc_id").orderBy("pos").rowsBetween(-(WIN_W - 1), W.currentRow)
    sel_key = F.min(
        F.concat(
            F.col("h"),
            F.lit("-"),
            F.lpad((F.lit(99999999) - F.col("pos")).cast("string"), 8, "0"),
        )
    ).over(w)
    prints = (
        kgw.withColumn("sel_key", sel_key)
        .filter(F.col("pos") >= WIN_W)
        .select("doc_id", F.substring("sel_key", 1, 8).alias("h"))
        .distinct()
    )
    ph = prints.groupBy("h").agg(F.count("*").alias("c"))
    row = ph.agg(
        F.count("*").alias("n_prints"),
        F.sum("c").alias("print_rows"),
        F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pair_mass"),
        F.max("c").alias("hottest_print_docs"),
    ).collect()[0]
    out["k65"] = {
        "print_rows": int(row["print_rows"]),
        "distinct_prints": int(row["n_prints"]),
        "pair_join_mass": int(row["pair_mass"]),
        "hottest_print_docs": int(row["hottest_print_docs"]),
    }

    # --- q_k32: frequent-gram aggregate + 1:1 left join ---------------
    gt = _gram_tokens(docs, 4, "doc_id", "text").filter("_full")
    gh = gt.groupBy("g").agg(F.count("*").alias("cnt"))
    row = gh.agg(
        F.count("*").alias("n_grams"),
        F.sum("cnt").alias("gram_rows"),
        F.sum(F.when(F.col("cnt") >= 3, 1).otherwise(0)).alias("frequent"),
        F.sum(F.when(F.col("cnt") >= 3, F.col("cnt"))).alias("masked_starts"),
        F.max("cnt").alias("hottest_gram_rows"),
    ).collect()[0]
    out["k32"] = {
        "gram_rows": int(row["gram_rows"]),
        "distinct_grams": int(row["n_grams"]),
        "frequent_grams": int(row["frequent"]),
        "masked_start_rows": int(row["masked_starts"] or 0),
        "hottest_gram_rows": int(row["hottest_gram_rows"]),
    }
    return out


def main() -> int:
    from cdc_publisher_spark.session import get_session

    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".localdata", "sf1"),
    ]
    spark = get_session(app_name="count_gram_mass")
    spark.sparkContext.setLogLevel("ERROR")
    results = [masses(spark, d) for d in sf_dirs if os.path.isdir(d)]
    print(json.dumps(results, indent=2))
    if len(results) == 2:
        a, b = results
        for q in ("k66", "k65", "k32"):
            key = {
                "k66": "seed_join_mass",
                "k65": "pair_join_mass",
                "k32": "masked_start_rows",
            }[q]
            ra, rb = a[q][key], b[q][key]
            print(
                f"# {q} {key}: {ra:,} -> {rb:,}  "
                f"(x{rb / max(ra, 1):.1f} per decade)",
                file=sys.stderr,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
