"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no event-time state machine (ClickHouse handles
lateness with versioned upserts — SURVEY.md T5); this is the
idiomatic-Spark superset (T6): arbitrary per-key state with timeouts,
the building block for streaming sessionization, running dedup, and
incremental counters that a training-data ingest pipeline needs.

State is per grouping key and lives in the state store (RocksDB/HDFS-
backed on a cluster), so the operator scales with keys × state size,
not stream length. The pandas batches arrive Arrow-encoded.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _running_counter(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-key running event count + value sum across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "sum_value": [total]})


def running_counts(stream: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Streaming running aggregate with explicit keyed state.

    Output mode must be ``update``. Equivalent batch shape:
    ``groupBy(key).agg(count, sum)`` — but incremental across
    micro-batches with O(keys) state.
    """
    from pyspark.sql import functions as F

    src = stream.select(F.col(key_col).alias("key"), F.col(value_col).alias("value"))
    return src.groupBy("key").applyInPandasWithState(
        _running_counter,
        outputStructType="key long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _session_agg(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Gap-based session: emit a row when the processing-time timeout
    fires (no events for the key within the gap)."""
    if state.hasTimedOut:
        n, total = state.get
        state.remove()
        yield pd.DataFrame({"key": [key[0]], "n_events": [n], "sum_value": [total]})
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    state.setTimeoutDuration(30_000)
    yield from ()


def session_totals(stream: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Streaming sessionization with processing-time gap timeout — the
    applyInPandasWithState analogue of ``session_window`` when the
    session close action (emit once, clear state) must be custom."""
    from pyspark.sql import functions as F

    src = stream.select(F.col(key_col).alias("key"), F.col(value_col).alias("value"))
    return src.groupBy("key").applyInPandasWithState(
        _session_agg,
        outputStructType="key long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
