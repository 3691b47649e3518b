"""Positional document fingerprinting (SURVEY.md §2.2 K).

Rolling polynomial hash over the token sequence:
``fp = sum(h(w_i) * B^(n-1-i)) mod M`` — order-sensitive (unlike the
set fingerprint in functions/text.py), so reordered documents get
different fingerprints while byte-identical token streams collide.

Modular exponentiation isn't expressible in Catalyst expressions, so
this is the engine's canonical *vectorized pandas UDF* example: Arrow
batches in, one Python pass per batch, no per-row py4j. The closure is
self-contained (pickles by value; executors need no engine install).

Pure twin: :func:`rolling_fingerprint_py` (tests assert equality).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE = 1_000_003
MOD = (1 << 61) - 1  # Mersenne prime


def rolling_fingerprint_py(text: str, base: int = BASE, mod: int = MOD) -> int:
    fp = 0
    for w in text.split(" "):
        h = hash_word_py(w, mod)
        fp = (fp * base + h) % mod
    return fp


def hash_word_py(w: str, mod: int = MOD) -> int:
    import hashlib

    return int.from_bytes(hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big") % mod


def rolling_fingerprint(text: Column) -> Column:
    """Column form (pandas UDF)."""
    import pandas as pd  # noqa: F401

    base, mod = BASE, MOD

    @F.pandas_udf("long")
    def _fp(s):  # type: ignore[no-untyped-def]
        import hashlib

        import pandas as pd

        def one(t: str | None) -> int | None:
            if t is None:
                return None
            fp = 0
            for w in t.split(" "):
                h = int.from_bytes(
                    hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "big"
                ) % mod
                fp = (fp * base + h) % mod
            # keep within signed-64 for Spark LongType
            return fp & 0x7FFFFFFFFFFFFFFF

        return pd.Series([one(t) for t in s])

    return _fp(text)
