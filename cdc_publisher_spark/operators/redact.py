"""PII redaction — regex scrubbing for training-data pipelines.

Pattern set covers the classic structured identifiers (email, SSN,
phone, IPv4, credit-card-ish digit runs). Patterns are deliberately
kept to the regex subset with identical semantics in Java regex
(Spark) and RE2 (DuckDB): character classes, bounded repetition and
``\\b`` word boundaries — no lookaround, no backreferences — so the
redaction is DuckDB-oracle-checkable.

Scale: a chain of ``regexp_replace`` calls is a single projection
inside whole-stage codegen — scan-speed, no shuffle, no UDF.
Order matters: SSN (3-2-4) is matched before phone (3-3-4) so a
phone number is never half-eaten by the SSN rule; the card rule runs
first since its digit runs subsume the others' fragments.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) — applied in order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact(col: Column) -> Column:
    """Scrub every PII pattern from a string column."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_hits(col: Column) -> Column:
    """Total PII matches in a string column (sum over patterns).

    Counted on the progressively-redacted text exactly like
    :func:`redact` applies it, so overlapping patterns are attributed
    to the first rule that would consume them.
    """
    out = col
    total = F.lit(0)
    for _, pat, _repl in PII_PATTERNS:
        total = total + F.regexp_count(out, F.lit(pat))
        out = F.regexp_replace(out, pat, "")
    return total.cast("bigint")
