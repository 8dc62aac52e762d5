"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only cross-chunk state is the BufferedKey LRU
(chunking.py:543-677); Spark's state store generalizes it.  This module
provides the canonical example — per-key running aggregates that survive
across micro-batches — as the template for user-defined stateful
operators (SURVEY §2.8 extension).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from ..session import ship_package


def running_counts(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running (count, sum) maintained in the state store.

    Works on a streaming DataFrame (update semantics: one output row per
    key per batch with the cumulative totals).  The state is a single
    (count, total) tuple per key — O(keys) state, watermark-free.
    """

    key_type = dict(zip(df.schema.names, df.schema))[key_col].dataType.simpleString()

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((count, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "running_count": [count], "running_sum": [total]}
        )

    ship_package(df)
    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, running_count long, running_sum double",
        stateStructType="count long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming gap-based sessionization with cross-batch state — the
    stateful twin of ``operators.events.sessionize``.

    State per key: the OPEN session (start, last-seen, count) as epoch
    seconds.  Each batch's events are processed in timestamp order; an
    event more than ``gap_seconds`` after the last closes the open
    session (one output row) and starts a new one.  Only CLOSED sessions
    are emitted — the final open session per key stays in the state
    store until a later event (or a caller-fed sentinel) closes it,
    which is what makes re-delivered batches append-safe.

    State is O(keys) regardless of stream length; events inside one
    batch are Arrow-batched through a single Python call per key.
    """

    key_type = dict(zip(df.schema.names, df.schema))[key_col].dataType.simpleString()

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        start, last, count = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int]] = []
        ts_all: list[int] = []
        for pdf in pdfs:
            ts_all.extend(
                int(t)
                for t in (pdf[ts_col].astype("int64") // 1_000_000_000)
            )
        for t in sorted(ts_all):
            if start is None:
                start, last, count = t, t, 1
            elif t - last > gap_seconds:
                closed.append((start, last, count))
                start, last, count = t, t, 1
            else:
                # cross-batch late event: t can be < last (within-batch
                # events are sorted) — never rewind the session frontier,
                # or a subsequent on-time event would spuriously close
                # it.  The late event may still extend the session START
                # backwards (batch-sessionizer parity).
                start = min(start, t)
                last, count = max(last, t), count + 1
        state.update((start, last, count))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )

    ship_package(df)
    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, session_start long, session_end long, "
            "n_events long"
        ),
        stateStructType="start long, last long, count long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
