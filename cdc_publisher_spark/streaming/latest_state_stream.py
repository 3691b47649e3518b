"""A1 streaming latest-value-per-key (SURVEY.md §4.3 item 3).

The reference keeps "latest CCD per key" as in-memory state fed by a
poll loop (kafka_ccd_store.clj:75-94). The Spark form is a keyed
stateful operator: ``applyInPandasWithState`` with one state row per
key holding (order, payload). Emits in update mode — one row per key
per batch in which that key changed — so downstream sees the same
stream of state transitions the reference's channel carried.

``dropDuplicates`` cannot express this (it keeps the FIRST arrival and
its state never shrinks); a stateful max is the correct primitive, and
its state size is O(live keys), independent of stream length.

The worker closure is self-contained (no engine imports) so it pickles
by value and runs on executors without the package installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def stream_latest_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Stateful latest-per-key over a streaming DataFrame.

    ``order_col`` must be a monotonic-comparable numeric column (Kafka
    offset, epoch micros). Output: key_cols + order_col + value_cols,
    emitted on change.
    """
    in_types = dict(df.dtypes)
    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [df.schema[order_col]]
        + [df.schema[c] for c in value_cols]
    )
    state_schema = T.StructType([df.schema[order_col]] + [df.schema[c] for c in value_cols])

    k_cols = list(key_cols)
    o_col = order_col
    v_cols = list(value_cols)

    def update_fn(key, pdf_iter, state):
        import pandas as pd

        best_order = None
        best_vals = None
        if state.exists:
            stored = state.get
            best_order, best_vals = stored[0], list(stored[1:])
        changed = False
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            idx = pdf[o_col].idxmax()
            row = pdf.loc[idx]
            if best_order is None or row[o_col] > best_order:
                best_order = row[o_col]
                best_vals = [row[c] for c in v_cols]
                changed = True
        if changed:
            state.update((best_order, *best_vals))
            yield pd.DataFrame(
                [[*key, best_order, *best_vals]], columns=[*k_cols, o_col, *v_cols]
            )

    del in_types
    return df.groupBy(*key_cols).applyInPandasWithState(
        update_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
