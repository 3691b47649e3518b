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


def stream_latest_per_key_tws(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
    ttl_ms: int | None = None,
) -> DataFrame:
    """Same operator on Spark 4's ``transformWithStateInPandas`` (the
    successor API SURVEY.md §4.3 item 3 names): a ``StatefulProcessor``
    with one ValueState per key. Semantics are identical to
    :func:`stream_latest_per_key` (equivalence is pinned by
    ``tests/test_streaming.py``, which SKIPS where protobuf is absent —
    the TWS Python state-server channel needs it and this container
    has none, so the operator is guarded exactly like
    ``sources/kafka``); what the new API adds is first-class
    state TTL — ``ttl_ms`` expires idle keys server-side, which is how
    the state store stays O(live keys) when the key space churns
    (session ids, request ids) instead of growing forever.

    The processor class is defined inside the function so the closure
    pickles by value (executors never import the engine package).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [df.schema[c] for c in key_cols]
        + [df.schema[order_col]]
        + [df.schema[c] for c in value_cols]
    )
    state_schema = T.StructType(
        [df.schema[order_col]] + [df.schema[c] for c in value_cols]
    )
    k_cols = list(key_cols)
    o_col = order_col
    v_cols = list(value_cols)

    class LatestPerKey(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("latest", state_schema, ttl_ms)

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            best_order = None
            best_vals = None
            if self._state.exists():
                stored = self._state.get()
                best_order, best_vals = stored[0], list(stored[1:])
            changed = False
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                idx = pdf[o_col].idxmax()
                row = pdf.loc[idx]
                if best_order is None or row[o_col] > best_order:
                    best_order = row[o_col]
                    best_vals = [row[c] for c in v_cols]
                    changed = True
            if changed:
                self._state.update((best_order, *best_vals))
                yield pd.DataFrame(
                    [[*key, best_order, *best_vals]],
                    columns=[*k_cols, o_col, *v_cols],
                )

        def close(self) -> None:
            pass

    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=LatestPerKey(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
