"""Kafka source/sink (SURVEY.md §2.1 S1/S2/K1, §2.2 A-2/A-3/A-4).

Maps the reference's three Kafka touchpoints onto Spark's Kafka
connector:

- S1 control-topic snapshot  -> batch ``spark.read.format("kafka")``
  from earliest, reduced to latest-per-key + max-offset resume token
  (replaces kafka_ccd_store.clj:129-133 + 28-42).
- S2 control-topic tail      -> ``readStream`` with checkpointed
  offsets (replaces the poll loop + offset atom,
  kafka_ccd_store.clj:75-94; the checkpoint's offset log IS the
  at-least-once resume token).
- K1 keyed producer sink     -> ``writeStream.format("kafka")`` with a
  ``topic`` column for per-row routing (replaces
  kafka_queue_writer.clj:82-98 + the D1 per-queue fan-out); Spark's
  producer pool + task retry replace K2's reset/reconnect.

The test container ships no Kafka broker or spark-sql-kafka jar, so
every entry point degrades to a clear error; the same pipeline is
exercised end-to-end through sources/files.py instead
(tests/test_streaming_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_publisher_spark.cdc.latest_state import latest_per_key
from cdc_publisher_spark.sources.wire import validate_wire

#: Default control topic name mirrors cdc-util.kafka/default-control-topic
#: (README.md:103-104).
DEFAULT_CONTROL_TOPIC = "change-data-capture"


class KafkaUnavailable(RuntimeError):
    def __init__(self, cause: Exception):
        super().__init__(
            "Kafka connector unavailable: the spark-sql-kafka package is "
            "not on the classpath (add --packages org.apache.spark:"
            f"spark-sql-kafka-0-10_2.13:<spark version>). Cause: {cause}"
        )


def reader_options(
    servers: str, topic: str, starting_offsets: str = "earliest"
) -> dict[str, str]:
    """The source option set, as data (contract-testable without a
    broker). Mirrors the reference's consumer wiring: bootstrap servers
    + deserializers (kafka_ccd_store.clj:44-56), assign-all-partitions
    from a chosen position (:58-73)."""
    return {
        "kafka.bootstrap.servers": servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def resume_offsets_json(topic: str, partition_offsets: dict[int, int]) -> str:
    """``startingOffsets`` JSON resuming AFTER a consumed position —
    the reference's ``(inc offset)`` resume (jms_publisher.clj:136,
    kafka_ccd_store.clj:75-94): pass the per-partition offsets already
    consumed; Kafka's startingOffsets is inclusive, so each advances
    by one."""
    import json

    return json.dumps({topic: {str(p): o + 1 for p, o in partition_offsets.items()}})


def writer_options(
    servers: str, checkpoint: str, compression: str = "lz4"
) -> dict[str, str]:
    """The sink option set, as data. lz4 mirrors the reference's
    producer compression (kafka_queue_writer.clj:45-51); the checkpoint
    location carries the commit-on-success contract."""
    return {
        "kafka.bootstrap.servers": servers,
        "kafka.compression.type": compression,
        "checkpointLocation": checkpoint,
    }


def _kafka_reader(spark: SparkSession, servers: str, topic: str, streaming: bool):
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    return reader.options(**reader_options(servers, topic))


def _decode(df: DataFrame) -> DataFrame:
    """Kafka binary key/value -> the string wire shape the reference
    uses (StringDeserializer on both, main.clj:50-52)."""
    return df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def read_control_snapshot(
    spark: SparkSession, servers: str, topic: str = DEFAULT_CONTROL_TOPIC
) -> tuple[DataFrame, DataFrame]:
    """S1: bounded scan -> (latest record per key, 1-row resume token).

    The reduction is the same latest_per_key aggregate the batch CCD
    queries use — O(keys) shuffle, compaction semantics in user space.
    """
    try:
        records = _decode(_kafka_reader(spark, servers, topic, streaming=False).load())
    except Exception as e:  # pragma: no cover - no broker in test env
        raise KafkaUnavailable(e) from e
    latest = latest_per_key(records, "key", "offset")
    token = records.agg(F.coalesce(F.max("offset"), F.lit(0).cast("bigint")).alias("resume_offset"))
    return latest, token


def read_control_tail(
    spark: SparkSession,
    servers: str,
    topic: str = DEFAULT_CONTROL_TOPIC,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S2: unbounded tail. With a checkpointed sink this replays from
    the offset log on restart — the reference's ``as-of`` resume
    (protocols/ccd_store.clj:9-18) for free."""
    try:
        reader = (
            spark.readStream.format("kafka")
            .options(**reader_options(servers, topic, starting_offsets))
        )
        return _decode(reader.load())
    except Exception as e:  # pragma: no cover
        raise KafkaUnavailable(e) from e


def write_routed(
    wire_df: DataFrame, servers: str, checkpoint: str, compression: str = "lz4"
):
    """K1: keyed, topic-routed streaming publish. lz4 mirrors the
    reference's producer compression (kafka_queue_writer.clj:49);
    offsets commit to the checkpoint only after the batch lands —
    the reference's send-then-ack contract, amortized per batch."""
    wire = validate_wire(wire_df)
    try:
        return (
            wire.writeStream.format("kafka")
            .options(**writer_options(servers, checkpoint, compression))
            .start()
        )
    except Exception as e:  # pragma: no cover
        raise KafkaUnavailable(e) from e
