"""Event-sequence analytics: ordered funnels and cohort retention.

Both are single-groupBy plans over the events table — the per-user state
(step timestamps, cohort anchor) is carried as array/struct columns, so
the only shuffle is the groupBy on the user key (well-spread at any
scale) plus a tiny final rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from ..session import ship_package


def funnel_counts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel user counts: how many users completed step i after
    completing steps 1..i-1, in order (each step strictly later than the
    previous one's earliest completion).

    Classic funnel semantics: ``t_1 = min ts of step 1``, then
    ``t_i = min ts of step i with ts > t_{i-1}``.  Comparisons use epoch
    seconds so the boundary is engine-independent (the events table
    stores nanosecond timestamps that engines truncate differently).

    One shuffle: groupBy(user) collecting per-step timestamp arrays;
    the step chain is then pure array expressions (array_min over a
    filtered array), and the final per-step rollup aggregates
    ``len(steps)`` booleans per user — a map-side-combinable sum.

    Returns ``(step_idx, step, n_users)``, one row per step.
    """
    sec = F.unix_timestamp(F.col(ts_col))
    per_user = events.groupBy(user_col).agg(
        *[
            F.collect_list(F.when(F.col(type_col) == s, sec)).alias(f"__ts{i}")
            for i, s in enumerate(steps)
        ]
    )

    t_prev = None
    reached = []
    for i in range(len(steps)):
        arr = F.col(f"__ts{i}")
        if t_prev is None:
            t_i = F.array_min(arr)
        else:
            prev = t_prev
            t_i = F.array_min(F.filter(arr, lambda x: x > prev))
        reached.append(t_i.alias(f"__t{i}"))
        t_prev = t_i
    scored = per_user.select(F.col(user_col), *reached)

    counts = scored.agg(
        *[
            F.count(F.col(f"__t{i}")).cast("bigint").alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    step_rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("int").alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(step_rows).alias("r")).select(
        "r.step_idx", "r.step", "r.n_users"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention: users bucketed by the week of their first
    event; for each (cohort_week, week_offset) the number of cohort users
    active in that later week.

    Two aggregations, both on spread keys: (user, week) distinct
    activity, then a min-over-user window-free join back to the per-user
    first week.  Returns ``(cohort_week, week_offset, n_users)``.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    activity = events.select(F.col(user_col), wk.alias("week")).distinct()
    first = activity.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(first, user_col)
        .select(
            F.col("cohort_week"),
            F.datediff(F.col("week"), F.col("cohort_week")).cast("int").alias(
                "__days"
            ),
        )
        .select(
            "cohort_week", (F.col("__days") / 7).cast("int").alias("week_offset")
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_seconds: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: split each user's event stream into
    sessions wherever the gap between consecutive events exceeds
    ``gap_seconds``; summarize one row per session.

    The classic two-window idiom: lag the epoch-second timestamp over
    (user, ts) to flag session starts, running-sum the flags to number
    sessions, then a single groupBy rolls each session up.  Both windows
    and the groupBy share the user-key partitioning, so the whole plan is
    ONE shuffle on the (well-spread) user key — no self-joins, all
    codegen.  Ties on the timestamp are broken by ``tiebreak_col`` (pass
    a unique column such as the event id) for a deterministic result.

    Returns ``(user, session_id, session_start, session_end, n_events,
    duration_s)`` with ``session_id`` numbered 1..n per user in time
    order.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    sec = F.unix_timestamp(F.col(ts_col))
    flagged = (
        events.select(F.col(user_col), F.col(ts_col), *([F.col(tiebreak_col)] if tiebreak_col else []))
        .withColumn("__sec", sec)
        .withColumn("__prev", F.lag("__sec").over(w))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | ((F.col("__sec") - F.col("__prev")) > F.lit(int(gap_seconds)))
            ).cast("int"),
        )
        .withColumn("__sid", F.sum("__new").over(w))
    )
    return (
        flagged.groupBy(user_col, "__sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (F.max("__sec") - F.min("__sec")).cast("bigint").alias("duration_s"),
        )
        .select(
            F.col(user_col),
            F.col("__sid").cast("bigint").alias("session_id"),
            "session_start",
            "session_end",
            "n_events",
            "duration_s",
        )
    )


def rolling_window_agg(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    window_seconds: int = 3600,
    round_to: int = 4,
) -> DataFrame:
    """Trailing time-RANGE rolling aggregate: for every event, the count
    and sum of ``value_col`` over that key's events in the preceding
    ``window_seconds`` (inclusive of the current row and its timestamp
    peers).

    A true RANGE window on epoch seconds — Spark evaluates it as one
    keyed window (single shuffle on the key), never a self-join; frame
    semantics (peers of the current timestamp are always included)
    match ANSI RANGE so any SQL engine reproduces it.

    Returns the input keys plus ``(trailing_n, trailing_sum)``.
    """
    from pyspark.sql import Window

    sec = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(sec)
        .rangeBetween(-int(window_seconds), 0)
    )
    return events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        F.count(F.lit(1)).over(w).cast("bigint").alias("trailing_n"),
        F.round(F.sum(value_col).over(w), round_to).alias("trailing_sum"),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: collapse an event stream
    into validity intervals — one row per (key, value run) with
    ``valid_from`` / ``valid_to`` (NULL = current) and a version number.

    Consecutive events with the SAME value extend the run; a change
    closes the open interval at the change's timestamp.  Ties on the
    timestamp within a key are broken by value ascending so the result
    is deterministic.

    Single window over (key, ts) — one shuffle on the key, no self-join;
    the run-collapse is the lag-compare idiom, all codegen.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(value_col).asc()
    )
    runs = (
        events.select(F.col(key_col), F.col(ts_col), F.col(value_col))
        .withColumn("__prev", F.lag(value_col).over(w))
        .withColumn(
            "__chg",
            (F.col("__prev").isNull() | (F.col(value_col) != F.col("__prev")))
            .cast("int"),
        )
        .withColumn("__ver", F.sum("__chg").over(w))
    )
    return (
        runs.groupBy(key_col, "__ver", value_col)
        .agg(F.min(ts_col).alias("valid_from"))
        .withColumn(
            "valid_to",
            F.lead("valid_from").over(
                Window.partitionBy(key_col).orderBy("valid_from", value_col)
            ),
        )
        .select(
            F.col(key_col),
            F.col("__ver").cast("bigint").alias("version"),
            F.col(value_col).alias("value"),
            "valid_from",
            "valid_to",
        )
    )


def ema(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    alpha: float = 0.2,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Exponential moving average per key over the time-ordered value
    stream: ``ema_1 = v_1``, ``ema_i = (1-alpha)*ema_{i-1} + alpha*v_i``.

    A sequential recurrence is the one shape Spark's built-in operators
    genuinely cannot express (window functions have no running state
    that feeds back), so this is the honest ``applyInPandas`` case: one
    shuffle groups each key's events, and the recurrence runs inside an
    Arrow batch.  The per-key loop keeps the EXACT IEEE evaluation
    order ``(1-alpha)*prev + alpha*v`` so any engine replaying the same
    recurrence (e.g. a SQL recursive CTE) reproduces it bit-for-bit
    before rounding.  Per-key history must fit an Arrow batch — the
    same bound every keyed stateful operator carries.

    Returns ``(key, ts, value, ema)`` with ema rounded to ``round_to``.
    """
    import pandas as pd

    cols = [key_col, ts_col, value_col] + (
        [tiebreak_col] if tiebreak_col else []
    )
    src = events.select(*[F.col(c) for c in cols])
    sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    out_fields = src.schema[key_col].dataType.simpleString()
    ts_t = src.schema[ts_col].dataType.simpleString()
    v_t = src.schema[value_col].dataType.simpleString()
    schema = (
        f"{key_col} {out_fields}, {ts_col} {ts_t}, "
        f"{value_col} {v_t}, ema double"
    )
    a = float(alpha)
    b = 1.0 - a
    nd = int(round_to)

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        vals = pdf[value_col].to_list()
        out = []
        acc = None
        for v in vals:
            acc = float(v) if acc is None else b * acc + a * float(v)
            out.append(round(acc, nd))
        pdf = pdf.assign(ema=out)
        return pdf[[key_col, ts_col, value_col, "ema"]]

    ship_package(src)
    return src.groupBy(key_col).applyInPandas(fold, schema)


def throttle_events(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    bucket_seconds: int = 60,
    keep: int = 1,
    order_col: str | None = None,
) -> DataFrame:
    """Rate-limit an event stream: keep at most ``keep`` events per
    (key, time bucket), earliest first — the dedup/throttle gate that
    bounds per-entity volume before expensive downstream work (the
    event-stream analog of ``cap_per_domain``).

    One shuffle on (key, bucket); ordering is (ts, order_col) so ties
    are deterministic.  Returns surviving rows plus ``bucket_start``
    (epoch seconds) and ``bucket_rank``.
    """
    from pyspark.sql import Window

    sec = F.unix_timestamp(F.col(ts_col))
    bucket = (F.floor(sec / bucket_seconds) * bucket_seconds).cast("bigint")
    order = [F.col(ts_col)] + (
        [F.col(order_col)] if order_col is not None else []
    )
    return (
        events.withColumn("bucket_start", bucket)
        .withColumn("bucket_rank", F.row_number().over(
            Window.partitionBy(F.col(key_col), F.col("bucket_start")).orderBy(*order)
        ).cast("bigint"))
        .filter(F.col("bucket_rank") <= keep)
    )


def gapfill_resample(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    step_seconds: int = 60,
    agg: str = "sum",
    round_to: int = 6,
) -> DataFrame:
    """Regularize an irregular event stream: per key, one row for every
    ``step_seconds`` grid slot between that key's first and last event,
    with the slot's aggregated value where events exist and the last
    known value carried forward across empty slots (``n_events`` says
    which rows are real vs filled).

    Plan shape: one keyed aggregation to the grid slots, a per-key
    ``sequence()`` explode to manufacture the grid (no driver loop, no
    cross join — fan-out is bounded by each key's own time span), a
    left join back on (key, slot), and one ``last(ignorenulls)`` window
    for the forward fill.  Two shuffles total on the same key.

    Returns ``(key, slot_ts, n_events, value, filled_value)``.
    """
    from pyspark.sql import Window

    if agg not in ("sum", "avg", "min", "max"):
        raise ValueError(f"unsupported agg: {agg}")
    sec = F.unix_timestamp(F.col(ts_col))
    slot = (F.floor(sec / step_seconds) * step_seconds).cast("bigint")
    agg_fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[agg]
    slots = (
        events.select(F.col(key_col).alias("key"), slot.alias("slot"),
                      F.col(value_col).alias("v"))
        .groupBy("key", "slot")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.round(agg_fn("v"), round_to).alias("value"))
    )
    grid = (
        slots.groupBy("key")
        .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(int(step_seconds)))
            ).alias("slot"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(slots, ["key", "slot"], "left")
        .select(
            F.col("key"),
            F.col("slot").alias("slot_start"),
            F.coalesce(F.col("n_events"), F.lit(0)).cast("bigint").alias("n_events"),
            F.col("value"),
            F.last("value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


def rolling_anomaly(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    lookback: int = 20,
    k: float = 3.0,
    round_to: int = 6,
    order_col: str | None = None,
) -> DataFrame:
    """Streaming-style anomaly flags: z-score of each event's value
    against the mean/stddev of that key's previous ``lookback`` events
    (strictly before the current row, so an anomaly can't mask itself),
    flagged where ``|z| > k`` and at least 3 prior points exist.  Pass
    a unique ``order_col`` so the ROWS frame is deterministic under
    timestamp ties.

    One keyed ROWS window — single shuffle on the key, ANSI frame
    semantics (``ROWS BETWEEN lookback PRECEDING AND 1 PRECEDING``)
    reproducible in any SQL engine.

    Returns ``(key, ts, value, roll_mean, roll_std, zscore, is_anomaly)``.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + (
        [F.col(order_col)] if order_col is not None else [F.col(value_col)]
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-int(lookback), -1)
    )
    mean = F.avg(value_col).over(w)
    std = F.stddev_samp(value_col).over(w)
    n_prior = F.count(value_col).over(w)
    z = F.when(
        (n_prior >= 3) & (std > 0), (F.col(value_col) - mean) / std
    )
    return events.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        F.round(mean, round_to).alias("roll_mean"),
        F.round(std, round_to).alias("roll_std"),
        F.round(z, round_to).alias("zscore"),
        F.coalesce(F.abs(z) > k, F.lit(False)).alias("is_anomaly"),
    )


def event_transitions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    *,
    order_col: str | None = None,
) -> DataFrame:
    """First-order transition counts between event types: for each user,
    lag the type over time order and count (prev_type -> type) pairs
    across all users — the Markov-chain / next-action model builder.

    One keyed window (lag) sharing its shuffle with nothing else, then a
    map-side-combinable groupBy on the (from, to) pair.  Probabilities
    are per-source-state (rows of the transition matrix sum to 1).

    Returns ``(from_type, to_type, n, p)``.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        events.withColumn("__prev", F.lag(type_col).over(w))
        .filter(F.col("__prev").isNotNull())
        .groupBy(F.col("__prev").alias("from_type"), F.col(type_col).alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wtot = Window.partitionBy("from_type")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(wtot), 6)
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    id_col: str,
    *,
    bucket: str = "1 hour",
    round_to: int = 4,
) -> DataFrame:
    """OHLC (open/high/low/close) bars per key per time bucket: first and
    last value by event order, min/max, and the event count — the
    canonical downsampling for metric/price series.

    One groupBy shuffle; open/close are ``min_by``/``max_by`` over the
    deterministic order struct ``(ts, id)`` (id tie-break, so concurrent
    events can't flip open/close between runs or engines), high/low are
    plain min/max — all algebraic, all partial-aggregated map-side.
    """
    order = F.struct(F.col(ts_col), F.col(id_col))
    b = F.window(F.col(ts_col), bucket)["start"]
    return (
        df.groupBy(*key_cols, b.alias("bucket_start"))
        .agg(
            F.round(F.min_by(F.col(value_col), order), round_to).alias("open"),
            F.round(F.max(value_col), round_to).alias("high"),
            F.round(F.min(value_col), round_to).alias("low"),
            F.round(F.max_by(F.col(value_col), order), round_to).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def attribute_conversions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    id_col: str,
    *,
    conversion_type: str,
    touch_types: list[str],
    mode: str = "last",
    round_to: int = 4,
) -> DataFrame:
    """Marketing-style conversion attribution: credit each conversion
    event's value to the user's first or last preceding touch channel
    (``mode='first'`` / ``'last'``); conversions with no preceding touch
    land in the ``'direct'`` channel.

    One window over (user, time, event-id) — the id breaks equal-second
    ties deterministically in any engine — computes the running
    first/last non-null touch type; conversions then roll up by that
    channel.  Single shuffle on the user key, no self-join: the window
    carries the channel forward, so a 100 TB event log is read once and
    partial-aggregated map-side after the window pass.

    Returns ``(channel, n_conversions, attributed_value)``.
    """
    if mode not in ("first", "last"):
        raise ValueError(f"mode must be 'first' or 'last', got {mode!r}")
    sec = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(user_col)
        .orderBy(sec.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col(type_col).isin(touch_types), F.col(type_col))
    carried = (
        F.first(touch, ignorenulls=True).over(w)
        if mode == "first"
        else F.last(touch, ignorenulls=True).over(w)
    )
    tagged = events.select(
        F.col(type_col).alias("__t"),
        F.col(value_col).alias("__v"),
        carried.alias("__channel"),
    ).filter(F.col("__t") == conversion_type)
    return (
        tagged.groupBy(F.coalesce(F.col("__channel"), F.lit("direct")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("__v"), round_to).alias("attributed_value"),
        )
    )
