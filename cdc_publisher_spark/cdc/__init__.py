"""The CDC kernel — the reference's actual semantics, re-expressed.

keying.py        T3 deterministic Kafka key derivation (core.clj:13-22)
envelope.py      T1/T2 DML JSON -> DmlEnvelope parse + dead-letter split
latest_state.py  A1 latest-value-per-key, batch + streaming
backoff.py       R1 cubic retry backoff (retry.clj:11-17)
"""
