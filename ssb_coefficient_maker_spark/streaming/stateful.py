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
