"""The CDC publish pipeline (SURVEY.md §3.3 mapping).

Reference path: AQ listener -> CLOB -> ``dml->msg`` (parse, sorted-id
key, verbatim value) -> keyed sync send to topic=queue name
(jms_publisher.clj:138-167, core.clj:13-22, kafka_queue_writer.clj:
82-98). Here the same transform is one declarative DataFrame lineage,
identical for batch and micro-batch:

    raw -> envelope (from_json; NULL = malformed) -> T3 key UDF
        -> wire record (key, value=raw verbatim, topic=route(table))

Malformed rows split to a dead-letter branch instead of blocking the
queue head (the reference redelivers poison messages forever by
design; the engine makes the E1/E2 hooks a side output, SURVEY.md §4.1
"Ordering").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.cdc.envelope import with_envelope
from cdc_publisher_spark.cdc.keying import key_from_raw_json_vectorized
from cdc_publisher_spark.sources.wire import validate_wire


def default_topic(table_col: Column) -> Column:
    """topic = table name (the reference publishes to topic=queue name;
    queue<->table is 1:1 in its CCDs)."""
    return table_col


def to_wire(raw_df: DataFrame, raw_col: str = "raw", topic: Column | None = None) -> DataFrame:
    """Good-path transform: raw DML JSON -> (key, value, topic).

    ``value`` is the input string byte-for-byte (property
    dml->msg-takes-value-as-is, core_test.clj:26-31). Malformed rows are
    dropped here — use :func:`split_wire` to keep them.
    """
    enveloped = with_envelope(raw_df, raw_col)
    good = enveloped.filter(~F.col("is_malformed"))
    topic_col = topic if topic is not None else default_topic(F.col("envelope.table"))
    wired = good.select(
        key_from_raw_json_vectorized(F.col(raw_col)).alias("key"),
        F.col(raw_col).alias("value"),
        topic_col.alias("topic"),
    )
    return validate_wire(wired)


def split_wire(
    raw_df: DataFrame, raw_col: str = "raw", dead_topic: str = "cdc-dead-letter"
) -> tuple[DataFrame, DataFrame]:
    """(wire records, dead-letter wire records).

    Dead letters keep the raw payload as value with a NULL key and the
    dead-letter topic — the engine's E1 hook / E2 write-back channel
    (README.md:19-22 describes status write-back; the code version
    never implemented it, SURVEY.md §2.1 E2 — the engine does, as a
    topic route).
    """
    enveloped = with_envelope(raw_df, raw_col)
    good = to_wire(raw_df, raw_col)
    dead = enveloped.filter(F.col("is_malformed")).select(
        F.lit(None).cast("string").alias("key"),
        F.col(raw_col).alias("value"),
        F.lit(dead_topic).alias("topic"),
    )
    return good, dead


def error_writeback(
    dead_wire: DataFrame,
    control_topic: str = "change-data-capture",
    error_detail: str = "malformed DML payload",
) -> DataFrame:
    """E2 — status write-back (SURVEY.md §2.1 E2).

    The README spec (README.md:19-22) says unpublishable CCDs are
    posted back to the control topic with status='error' + details;
    the reference's code version never implemented it. The engine
    does: dead-letter wire records become control-topic records whose
    value is a CCD-shaped JSON with the error detail and the offending
    payload, keyed by the (possibly NULL) derived key.
    """
    ccd_error = F.to_json(
        F.struct(
            F.lit("error").alias("status"),
            F.lit(error_detail).alias("error"),
            F.col("value").alias("payload"),
            F.col("topic").alias("source_topic"),
        )
    )
    return dead_wire.select(
        F.col("key"),
        ccd_error.alias("value"),
        F.lit(control_topic).alias("topic"),
    )


def run_file_to_parquet(
    raw_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    dead_topic: str = "cdc-dead-letter",
):
    """End-to-end micro-batch pipeline with a parquet sink standing in
    for Kafka (same wire schema, partitioned by topic). Offsets commit
    to the checkpoint after each batch — the reference's
    commit-on-success dequeue contract (protocols/queue.clj:16-29) at
    micro-batch granularity."""
    from cdc_publisher_spark.streaming.metrics import with_wire_metrics

    good, dead = split_wire(raw_stream, dead_topic=dead_topic)
    # dead letters carry key=NULL on the wire, so the observed
    # dequeue/enqueue/malformed counters (M1) ride this union for free
    wire = with_wire_metrics(good.unionByName(dead))
    return (
        wire.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("topic")
        .outputMode("append")
        .start()
    )
