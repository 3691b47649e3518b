"""Context-window document chunking (training-data prep).

Splits each document into fixed-token windows with overlap — the
standard pre-tokenization step before packing sequences into a model's
context length (q_k17 packs the resulting chunks). Chunk starts are
``0, stride, 2·stride, …`` for ``stride = chunk_tokens - overlap``;
every start < n_tokens emits a chunk, the last one possibly short, so
the rule is a pure function of the token count and reproduces exactly
in the DuckDB oracle (generate_series + list_slice).

Scale: explode(sequence(...)) + slice is all built-in expressions —
per-document work, no shuffle at all; the output inherits the input's
partitioning. Chunk text can be emitted as md5 only (``with_text=
False``) so wide scans don't carry duplicated bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_publisher_spark.functions.text import words


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_text: bool = False,
) -> DataFrame:
    """(id, chunk_idx, n_tok, chunk_md5[, chunk_text]) per window."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    ws = words(F.col(text_col))
    chunked = (
        docs.select(F.col(id_col), ws.alias("ws"), F.size(ws).alias("n"))
        .select(
            id_col,
            "ws",
            F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))).alias("start"),
        )
        .select(
            id_col,
            (F.col("start") / stride).cast("bigint").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("ws"), F.col("start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size(F.split("chunk_text", " ")).cast("bigint").alias("n_tok"),
            F.md5("chunk_text").alias("chunk_md5"),
            "chunk_text",
        )
    )
    return chunked if with_text else chunked.drop("chunk_text")
