"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2 Part C streaming — the "custom stateful operator"
escape hatch for semantics the built-in windows can't express).

Example operator: per-user running totals that survive across
micro-batches. State is a single (count, total) pair per user —
bounded, explicitly managed, and (optionally) evicted on a
processing-time TTL.

Scale notes: state lives in the state store partitioned by the group
key (one shuffle); the pandas function sees one key's rows per call,
Arrow-batched. Keep per-key state O(1) — anything growing with the
stream belongs in a windowed aggregation with a watermark instead.

TTL semantics: with ``state_ttl_ms`` set, Spark runs continuous
no-data micro-batches to fire timers ("no new data but cleaning up
state"), which keeps the store bounded by the ACTIVE-user set on a
long-lived stream — but also means ``processAllAvailable()`` never
becomes idle, so finite-replay harnesses must bound their wait
themselves. Default is no TTL (NoTimeout): state bounded by the
all-time user set, the right trade for bounded key domains.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_total", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(
    events: DataFrame, state_ttl_ms: Optional[int] = None
) -> DataFrame:
    """Per-user cumulative (count, value) maintained in the state store.

    With ``state_ttl_ms`` set, state for a user idle longer than that
    much processing time is evicted (the timeout re-arms on every
    update) — see module docstring for the harness implications.
    """

    def _update(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events_total": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same operator on Spark 4's ``transformWithStateInPandas`` —
    the replacement API for ``applyInPandasWithState`` (typed state
    handles, timers, multiple state variables per key; backed by the
    new operator with state-schema evolution support).

    Semantics match ``running_user_totals`` with no TTL: one
    (count, total) ValueState per user, an update-mode emission per
    key per micro-batch. Both APIs stay implemented: the old one until
    its removal, this one as the forward path.

    Runtime requirements (checked here, fail fast with a clear
    message): the RocksDB state store provider (the only one TWS
    supports) and the ``protobuf`` package (TWS's Python worker talks
    to the state server over protobuf — not installed in every
    environment; the operator is import-gated rather than stubbed).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its Python worker speaks protobuf to the state server); "
            "use running_user_totals (applyInPandasWithState) instead"
        ) from exc
    spark = events.sparkSession
    provider = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    if "RocksDB" not in (provider or ""):
        raise RuntimeError(
            "transformWithStateInPandas supports only the RocksDB state "
            "store: set spark.sql.streaming.stateStore.providerClass to "
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider before starting the query"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events_total": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
