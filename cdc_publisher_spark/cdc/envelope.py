"""T1/T2 — DML JSON -> DmlEnvelope parse with dead-letter split.

The reference parses each Oracle AQ payload with string keys
(core.clj:17) and routes JsonParseException to a malformed-message hook
(jms_publisher.clj:160-164) — parse failures must never kill the
stream. Spark's ``from_json`` returns NULL on malformed input instead
of throwing, which gives the same contract: a nullable envelope column
plus a dead-letter filter (SURVEY.md §2.1 T1/E1).

Envelope schema per SURVEY.md §1.1: fixed envelope, dynamic payload —
``id``/``data`` are MapType(string,string) because the per-table column
sets and value types are dynamic; ``raw`` preserves the input verbatim
(the publish value must be byte-identical, core_test.clj:26-31).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DML_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("id", T.MapType(T.StringType(), T.StringType())),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "info",
            T.StructType(
                [
                    T.StructField("user", T.StringType()),
                    T.StructField("timestamp", T.StringType()),
                ]
            ),
        ),
    ]
)


def parse_envelope(raw: Column) -> Column:
    """Parse a raw DML JSON string column to the envelope struct;
    NULL for malformed JSON (never raises)."""
    return F.from_json(raw, DML_ENVELOPE_SCHEMA)


def with_envelope(df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """Attach ``envelope`` (nullable struct) and ``is_malformed``.

    A row is malformed when the JSON doesn't parse or has no non-empty
    ``id`` map — the same rows the reference routes to its
    *malformed-message-error* hook.
    """
    parsed = parse_envelope(F.col(raw_col))
    return df.withColumn("envelope", parsed).withColumn(
        "is_malformed",
        parsed.isNull() | F.coalesce(F.map_keys(parsed["id"]), F.array()).isNull()
        | (F.size(F.coalesce(F.map_keys(parsed["id"]), F.array())) == 0),
    )


def split_dead_letter(df: DataFrame, raw_col: str = "raw") -> tuple[DataFrame, DataFrame]:
    """(good, dead_letter) split — the engine's E1 error branch."""
    enveloped = with_envelope(df, raw_col)
    good = enveloped.filter(~F.col("is_malformed")).drop("is_malformed")
    dead = enveloped.filter(F.col("is_malformed")).drop("is_malformed", "envelope")
    return good, dead
