"""Streaming rare-gram exposure monitor (streaming/exposure_monitor.py):
the report off accumulated state must equal q_k88 on the union of all
delivered documents column-for-column (stream == batch), a replayed
batch must NOT double document frequencies (sum-merge is not
idempotent — the state layer's overwrite discipline is load-bearing),
and compaction — external or in-stream — must pre-sum losslessly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_publisher_spark.queries.llm_risk import q_k88_rare_gram_exposure
from cdc_publisher_spark.streaming.exposure_monitor import (
    compact_exposure_state,
    exposure_micro_batch,
    read_exposure_report,
    read_gram_counts,
    stream_rare_gram_exposure,
)
from cdc_publisher_spark.tables import load


@pytest.fixture()
def docs(spark, sf_smoke):
    return load(spark, sf_smoke, "documents").select("doc_id", "text", "source")


def _report_rows(df):
    return sorted(
        (r.source, r.n_grams, r.n_unique, r.n_rare, r.unique_frac)
        for r in df.collect()
    )


def test_stream_report_equals_batch_k88(spark, docs, sf_smoke, tmp_path):
    state = str(tmp_path / "exp")
    for b in range(3):
        exposure_micro_batch(docs.filter(F.col("doc_id") % 3 == b), b, state)
    got = read_exposure_report(spark, state)
    want = q_k88_rare_gram_exposure(spark, sf_smoke)
    assert _report_rows(got) == _report_rows(want)


def test_replay_does_not_inflate_document_frequency(spark, docs, tmp_path):
    """A redelivered batch overwrites its own delta; an append would
    push unique (df=1) grams into the rare tier and double n-counts."""
    state = str(tmp_path / "exp")
    for b in range(2):
        exposure_micro_batch(docs.filter(F.col("doc_id") % 2 == b), b, state)
    before = _report_rows(read_exposure_report(spark, state))
    exposure_micro_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, state)  # replay
    assert _report_rows(read_exposure_report(spark, state)) == before


def test_compaction_presums_losslessly(spark, docs, tmp_path):
    from cdc_publisher_spark.streaming.state import batch_dirs, compacted_upto

    state = str(tmp_path / "exp")
    for b in range(4):
        exposure_micro_batch(docs.filter(F.col("doc_id") % 4 == b), b, state)
    before_counts = sorted(
        (r.sh, r.source, r.cnt) for r in read_gram_counts(spark, state).collect()
    )
    before_report = _report_rows(read_exposure_report(spark, state))
    compact_exposure_state(spark, state, upto_batch=2, vacuum=True)
    assert compacted_upto(spark, state) == 2
    # superseded per-batch dirs reclaimed; batch 3 still live
    assert [k for k, _ in batch_dirs(spark, state)] == [3]
    after_counts = sorted(
        (r.sh, r.source, r.cnt) for r in read_gram_counts(spark, state).collect()
    )
    assert after_counts == before_counts
    assert _report_rows(read_exposure_report(spark, state)) == before_report


def test_stream_wiring_end_to_end_with_in_stream_compaction(
    spark, docs, sf_smoke, tmp_path
):
    from cdc_publisher_spark.streaming.state import compacted_upto

    src_dir = str(tmp_path / "in")
    docs.repartition(4).write.parquet(src_dir)
    state = str(tmp_path / "exp")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = stream_rare_gram_exposure(
        stream, state, ckpt, compact_every=2, vacuum_grace=1
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert compacted_upto(spark, state) is not None
    got = read_exposure_report(spark, state)
    want = q_k88_rare_gram_exposure(spark, sf_smoke)
    assert _report_rows(got) == _report_rows(want)
