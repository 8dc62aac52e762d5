"""Stream-stream joins with watermarked state cleanup.

Spark's only sound unbounded stream-stream join is the watermarked
interval join: both sides declare event-time watermarks and the join
condition bounds how far the two times may drift apart, so the state
store can evict rows once the watermark passes their interval.  Without
the time bound, join state grows forever — the helper refuses to build
that plan.

Works identically on batch frames (watermarks are a no-op there), which
is how the tests verify streaming output against a batch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` plus the event-time band
    ``right_ts ∈ [left_ts - lower, left_ts + upper]``.

    ``lower``/``upper`` are SQL interval strings ("10 minutes").  For
    streaming inputs BOTH watermarks must be set; outer variants
    additionally require them so unmatched rows can be emitted once the
    watermark passes (Structured Streaming's outer-join rule).

    State size is bounded by (watermark + band width) x arrival rate per
    key — the 100 TB property: eviction is continuous, not end-of-job.
    Column names must be disjoint apart from the join keys.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    streaming = left.isStreaming or right.isStreaming
    if streaming and not (left_watermark and right_watermark):
        raise ValueError(
            "stream-stream interval_join requires watermarks on both sides "
            "(unbounded join state otherwise)"
        )
    if left_watermark:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark:
        right = right.withWatermark(right_ts, right_watermark)
    band = (
        (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    cond = band
    for k in on:
        cond = (left[k] == right[k]) & cond
    joined = left.join(right, cond, how)
    # collapse the duplicated key columns to one copy
    keep = []
    seen = set(on)
    for k in on:
        keep.append(F.coalesce(left[k], right[k]).alias(k))
    for side in (left, right):
        for c in side.columns:
            if c not in seen:
                keep.append(side[c])
    return joined.select(*keep)
