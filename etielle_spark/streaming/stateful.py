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

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, running_count long, running_sum double",
        stateStructType="count long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
