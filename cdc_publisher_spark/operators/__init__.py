"""Custom operators the built-in DataFrame surface lacks.

Each is a composition of built-in ops where semantics allow (SURVEY.md
§4.3): as-of join via union+carry-forward window, MinHash/LSH via
hash-agg pipelines, top-k cosine via per-partition pre-ranking. Pandas
UDFs appear only where expressions genuinely cannot (multimodal decode,
language-ID model).
"""
