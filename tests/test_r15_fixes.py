"""Pins for the round-14 ADVICE fixes:

1. q_k122 degenerate-division guard — a label whose vectors are ALL
   zero has COUNT(cos8)=0; frac_degraded must be NULL in BOTH engines
   (DuckDB's IEEE 0/0 was NaN, Spark's NULL-sum/0 was already NULL —
   the same 0/0 class the q_k120 guard fixed).
2. registry_diff's ADJUDICATED_ORACLE_EDITS allowlist is pinned to
   the post-edit oracle md5 — a future unrelated edit to an
   adjudicated query's oracle is an UNADJUDICATED edit again, not a
   permanent exemption.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

import duckdb

from cdc_publisher_spark.queries.llm_ml import q_k122_quantization_fidelity
from cdc_publisher_spark.registry import all_specs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _write_vecs(spark, d, rows):
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = os.path.join(str(d), "embeddings.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return str(d), path


def _degenerate_corpus():
    """Label 0 = three all-zero vectors (amax=0 → sv2=0 → cos8 NULL
    for every row → COUNT(cos8)=0). Label 1 = genuine vectors so the
    query still emits finite stats somewhere."""
    zero = [0.0, 0.0, 0.0, 0.0]
    rows = [(i, zero, 0) for i in range(1, 4)]
    rows += [
        (10, [1.0, 0.25, -0.5, 0.0], 1),
        (11, [0.0, 1.0, 0.125, -0.75], 1),
    ]
    return rows


def test_k122_all_degenerate_label_is_null_spark(spark, tmp_path):
    d, _ = _write_vecs(spark, tmp_path, _degenerate_corpus())
    out = {r.label: r for r in q_k122_quantization_fidelity(spark, d).collect()}
    assert out[0].n_vecs == 3
    assert out[0].n_degenerate == 3
    assert out[0].mean_cos is None
    assert out[0].frac_degraded is None        # 0/0 pinned to NULL
    assert out[1].n_degenerate == 0
    assert out[1].frac_degraded is not None
    assert 0.0 <= out[1].frac_degraded <= 1.0


def test_k122_all_degenerate_label_is_null_duckdb(spark, tmp_path):
    """The oracle side of the same guard: before the CASE, DuckDB's
    IEEE double division returned NaN for 0*1.0/0 and the engines
    disagreed on this corpus."""
    _, path = _write_vecs(spark, tmp_path, _degenerate_corpus())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    sql = all_specs()["q_k122_quantization_fidelity"].oracle
    cols = [d[0] for d in con.execute(sql).description]
    got = {r[cols.index("label")]: dict(zip(cols, r))
           for r in con.execute(sql).fetchall()}
    assert got[0]["n_degenerate"] == 3
    assert got[0]["frac_degraded"] is None, got[0]     # NULL, not NaN
    fd1 = got[1]["frac_degraded"]
    assert fd1 is not None and not math.isnan(fd1)
    assert 0.0 <= fd1 <= 1.0


def test_adjudicated_oracle_edits_are_hash_pinned():
    """r14 ADVICE #2: every allowlist entry pins the expected oracle
    md5, and HEAD's registry actually hashes to it — so the allowlist
    can never silently bless a future different edit."""
    import registry_diff

    specs = all_specs()
    for name, entry in registry_diff.ADJUDICATED_ORACLE_EDITS.items():
        assert set(entry) >= {"oracle_md5", "reason"}, name
        assert name in specs, name
        head_md5 = hashlib.md5((specs[name].oracle or "").encode()).hexdigest()
        assert head_md5 == entry["oracle_md5"], (
            f"{name}: HEAD oracle md5 {head_md5} != pinned "
            f"{entry['oracle_md5']} — this edit is unadjudicated"
        )
