"""Multimodal column plumbing (SURVEY.md north star: image/audio/video
as opaque binary columns with typed metadata).

The engine treats media as ``binary`` payloads + a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` operators — the
right shape for 100 TB media processing because:

- binary columns stream through Arrow in large batches (no per-row
  serialization);
- decode/resize/feature-extract are embarrassingly parallel per
  partition; repartitioning by size class balances skew from mixed
  media sizes;
- metadata lives columnar next to the blob, so pruning/filtering
  (e.g. ``media_type = 'image/png'``) never touches bytes.

The container has no image/audio codecs, so ``decode`` is STUBBED
(SURVEY.md north-star instructions): :func:`register_decoder` installs
a real codec; the default raises ``NotImplementedError`` and the
deterministic fake decoder used in tests derives pixel stats from a
blake2b of the payload. Everything around the stub — schema, batch
iteration, UDF signatures, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # MIME
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("captured_at", T.StringType()),
                    T.StructField("declared_width", T.IntegerType()),
                    T.StructField("declared_height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

#: decode(payload bytes, media_type) -> dict(width, height, n_channels, mean_luma)
Decoder = Callable[[bytes, str], dict[str, Any]]

_DECODER: Decoder | None = None


def register_decoder(decoder: Decoder) -> None:
    """Install a real codec (e.g. PIL/ffmpeg-based) for decode paths."""
    global _DECODER
    _DECODER = decoder


def fake_decoder(payload: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic stand-in decoder: stats derived from a blake2b of
    the payload. Keeps every byte of the plumbing testable without
    codecs; DO NOT ship as a real decoder."""
    import hashlib

    digest = hashlib.blake2b(payload, digest_size=16).digest()
    return {
        "width": 16 + digest[0],
        "height": 16 + digest[1],
        "n_channels": 1 + digest[2] % 4,
        "mean_luma": digest[3] / 255.0,
    }


def _decoder() -> Decoder:
    if _DECODER is None:
        raise NotImplementedError(
            "no media decoder registered in this environment; call "
            "register_decoder() with a codec-backed implementation "
            "(image/audio libraries are not installed in the test container)"
        )
    return _DECODER


DECODED_FIELDS = "media_id long, media_type string, n_bytes long, sha256 string, width int, height int, n_channels int, mean_luma double"


def decode_media(df: DataFrame, batch_wise: bool = True) -> DataFrame:
    """mapInPandas decode: binary in, per-media features out.

    The closure captures the registered decoder by value; Arrow moves
    payload batches, Python touches each blob once.
    """
    decoder = _decoder()

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            feats = [decoder(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "mean_luma": [f["mean_luma"] for f in feats],
                }
            )

    return df.mapInPandas(batches, schema=DECODED_FIELDS)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: expands (media_id, frame_idx) rows
    for frames 0, n, 2n, ... based on declared metadata — pure
    expressions; the actual frame decode goes through decode_media once
    a codec is registered."""
    n_frames = F.coalesce(F.col("meta.declared_width"), F.lit(0))  # stand-in frame count
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def media_size_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile: never reads payload bytes beyond length —
    check the plan: the binary column is pruned when stats are computed
    from meta columns only."""
    return (
        df.groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload").cast("bigint")).alias("total_bytes"),
            F.round(F.avg(F.length("payload")), 2).alias("avg_bytes"),
        )
    )


RESIZED_FIELDS = "media_id long, media_type string, target_w int, target_h int, payload binary, n_bytes long"

_RESIZER: Callable[[bytes, str, int, int], bytes] | None = None


def register_resizer(resizer: Callable[[bytes, str, int, int], bytes]) -> None:
    """Install a real resize codec: (payload, media_type, w, h) -> bytes."""
    global _RESIZER
    _RESIZER = resizer


def fake_resizer(payload: bytes, media_type: str, w: int, h: int) -> bytes:
    """Deterministic stand-in: truncate/extend the payload to a
    size proportional to the target area. Plumbing-only — replace via
    register_resizer for real media."""
    import hashlib

    target = max(16, (w * h) // 8)
    seed = hashlib.blake2b(payload, digest_size=32).digest()
    return (seed * (target // 32 + 1))[:target]


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas resize: emits re-encoded payloads at (width, height).

    Same Arrow-batched shape as decode_media; raises
    NotImplementedError until a codec is registered (the test container
    has none — SURVEY north-star stub requirement).
    """
    resizer = _RESIZER
    if resizer is None:
        raise NotImplementedError(
            "no media resizer registered; call register_resizer() with a "
            "codec-backed implementation (PIL/ffmpeg not installed here)"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = [resizer(p, t, width, height) for p, t in zip(pdf["payload"], pdf["media_type"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "target_w": width,
                    "target_h": height,
                    "payload": out,
                    "n_bytes": [len(b) for b in out],
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_FIELDS)
