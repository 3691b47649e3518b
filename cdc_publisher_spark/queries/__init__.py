"""Declared queries, grouped by SURVEY.md §2.2 family.

Importing this package registers every spec into
:mod:`cdc_publisher_spark.registry`.
"""

from cdc_publisher_spark.queries import (  # noqa: F401
    aggregation,
    cdc_queries,
    filters,
    joins,
    llm,
    llm_audit,
    llm_cluster,
    llm_ml,
    llm_prep,
    llm_quality,
    llm_risk,
    llm_select,
    llm_signals,
    llm_sketch,
    llm_spans,
    operators_reg,
    retrieval,
    scalars,
    setops,
    sort_limit,
    streaming_batch,
    subqueries,
    udfs,
    windows,
)
