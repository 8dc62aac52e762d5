"""Skew-aware aggregation: two-stage salted groupBy.

A single hot key (one customer with 10% of all rows, one near-empty
document shingle) serializes a plain ``groupBy(key)`` onto one reducer.
Salting splits each key across ``salt`` sub-groups for a partial
aggregate, then combines partials — both stages shuffle, but no single
task sees more than ~1/salt of the hot key.

Only algebraic aggregates compose this way; supported: sum, count, min,
max, collect_list-free. (Spark's own partial aggregation already does
map-side combine; salting additionally bounds the REDUCE side, which
partial aggregation cannot.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def with_salt(df: DataFrame, salt: int = 16) -> DataFrame:
    """Add a uniform __salt column from a per-ROW source (monotonic id), so
    byte-identical duplicate rows — the usual hot-key shape — still spread
    across sub-groups.  Salt assignment need not be stable across retries:
    the merge stage combines partials regardless of which sub-group a row
    landed in, so correctness is unaffected."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}::

        salted_agg(li, ["l_orderkey"],
                   {"qty": ("l_quantity", "sum"), "n": ("*", "count")})
    """
    for name, (col, fn) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(f"salted_agg: non-algebraic aggregate {fn!r} for {name}")

    salted = with_salt(df, salt)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[fn](F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](F.col(f"__p_{name}")).alias(name)
            for name, (col, fn) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> Column | DataFrame:
    """Skew-proof equi join for a hot-keyed LEFT side against a right side
    too big to broadcast: left rows take a per-row salt, the right side is
    replicated ``salt`` times, and the join runs on ``(keys..., salt)``.

    A plain shuffle join puts every left row of a hot key into ONE reduce
    task; salting fans the hot key across ``salt`` tasks at the cost of
    ``salt x`` right-side shuffle volume — the classic trade when the
    right side is mid-sized (too big for broadcast, small next to the
    skewed fact table).  AQE's skew-join split handles sort-merge skew
    after the fact; explicit salting also covers hash joins and bounds
    the task *input* up front.

    Results are exactly the plain join's (salt assignment is invisible:
    every right row exists at every salt value).  ``how`` in
    {inner, left}; right/outer would need the anti-side de-salted.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsalted = with_salt(left, salt)
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = lsalted.join(rsalted, [*on, "__salt"], how)
    return out.drop("__salt")


def smart_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    how: str = "inner",
    broadcast_threshold_rows: int = 1_000_000,
    salt: int | None = None,
    right_rows: int | None = None,
) -> DataFrame:
    """Join-strategy chooser: broadcast the right side when it is small,
    otherwise a plain shuffle join, optionally salted when the caller
    knows the left side is hot-keyed.

    ``right_rows`` (if the caller already knows it) avoids the count;
    otherwise one count job runs on the right side — cheap next to a
    mis-planned 100 TB join, and the number feeds the same decision AQE
    would only discover after materializing the first shuffle.  Explicit
    hints beat estimator guesswork at the top of a pipeline where
    statistics don't exist yet.
    """
    n = right_rows if right_rows is not None else right.count()
    if n <= broadcast_threshold_rows:
        return left.join(F.broadcast(right), on, how)
    if salt:
        return salted_join(left, right, on, salt=salt, how=how)
    return left.join(right, on, how)
