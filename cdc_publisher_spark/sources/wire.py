"""Kafka wire-record shape (SURVEY.md §1.3).

The reference's wire record is ``{:key string :value string}`` with
String serializers on both ends (main.clj:50-52, kafka_queue_writer.clj:
50-51); the engine adds ``topic`` as a routing column (replacing the
reference's one-producer-many-queues D1 fan-out with per-row routing,
SURVEY.md §2.1 K1/D1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType(), nullable=False),
        T.StructField("topic", T.StringType(), nullable=False),
    ]
)

WIRE_COLUMNS = tuple(f.name for f in WIRE_SCHEMA.fields)


def validate_wire(df: DataFrame) -> DataFrame:
    """Project/validate a DataFrame down to the wire columns."""
    missing = [c for c in WIRE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"wire record missing columns {missing}; has {df.columns}")
    return df.select(*WIRE_COLUMNS)
