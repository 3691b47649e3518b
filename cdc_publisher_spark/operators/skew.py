"""Skew-aware join (SURVEY.md 100-TB checklist: "skewed keys -> salting
or AQE skew-join").

AQE's skew-join splitting (on by default in the engine session) handles
sort-merge skew at runtime. Salting is the complement for the case AQE
can't fix: a *broadcast-infeasible* dimension joined on a key whose hot
values overwhelm single tasks. ``salted_join`` replicates the small
side R ways and scatters the big side's hot keys across R subkeys, so
one hot key becomes R tasks.

Correctness: inner/left equi-joins only (salting preserves exactly the
matching pairs; each big-side row joins its one salted copy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with an R-way salt.

    big rows get a random-but-deterministic subkey (hash of the whole
    row modulo R — no RNG, so retries/replays stay identical); small
    rows are exploded into all R subkeys. Shuffle keys become
    (key, subkey), splitting each hot key across R reducers.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = big_salted.join(small_salted, [on, "_salt"], how)
    return joined.drop("_salt")
