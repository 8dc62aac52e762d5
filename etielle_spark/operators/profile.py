"""Table profiling: per-column statistics in one aggregation pass.

The schema-drift / data-quality step a pipeline runs on every new
snapshot before processing it.  All columns are profiled in a SINGLE
aggregate (Spark plans the multi-distinct via one expand — one pass
over the data, one shuffle), then unpivoted driver-free with
explode(array(struct...)).  Numeric and timestamp ranges are reported
as doubles, string ranges as strings, so nothing round-trips through
engine-specific number formatting.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    round_to: int = 4,
) -> DataFrame:
    """Profile ``columns`` (default: all numeric/string/timestamp/date
    columns): row count, null count, exact distinct count, and min/max
    (numeric-ish columns as doubles — timestamps as epoch seconds,
    dates as epoch days; strings as strings).

    Exact ``count_distinct`` keeps the result oracle-comparable; swap
    ``approx_count_distinct`` in at 100 TB if a ±2% estimate is
    acceptable — same plan shape without the expand.

    Returns ``(column, dtype, n_rows, n_null, n_distinct, min_num,
    max_num, min_str, max_str)``, one row per profiled column.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n
            for n, t in fields.items()
            if isinstance(
                t, (NumericType, StringType, TimestampType, TimestampNTZType, DateType)
            )
        ]
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    structs = []
    for c in columns:
        t = fields[c]
        if isinstance(t, NumericType):
            num = F.col(c).cast("double")
        elif isinstance(t, (TimestampType, TimestampNTZType)):
            # NTZ casts through the (UTC-pinned) session timestamp type
            num = F.unix_timestamp(F.col(c).cast("timestamp")).cast("double")
        elif isinstance(t, DateType):
            num = F.datediff(F.col(c), F.lit("1970-01-01").cast("date")).cast("double")
        else:
            num = None
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if num is not None:
            aggs.append(F.round(F.min(num), round_to).alias(f"__min_{c}"))
            aggs.append(F.round(F.max(num), round_to).alias(f"__max_{c}"))
        else:
            aggs.append(F.min(F.col(c)).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__max_{c}"))
        is_num = num is not None
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(t.simpleString()).alias("dtype"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_null"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"__min_{c}") if not is_num else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"__max_{c}") if not is_num else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return df.agg(*aggs).select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier detection: flag rows where
    ``|value - median| > k * MAD`` (MAD = median absolute deviation).
    Median/MAD instead of mean/stddev so a few extreme rows can't mask
    themselves by inflating the threshold.

    Two grouped exact-percentile aggregations (Spark's ``percentile`` is
    a single-pass partial aggregate per group — groups shuffle once,
    values never collect to the driver) and two broadcast-sized joins
    back: group cardinality is small by construction (these are
    categorical strata), so the stats frames broadcast.

    Returns the input rows plus ``med``, ``mad``, ``is_outlier``.
    Groups where MAD = 0 (constant values) flag nothing.
    """
    def join_stats(left: DataFrame, stats: DataFrame) -> DataFrame:
        # empty group_cols = one global group (winsorize convention):
        # a key-less join is a single-row broadcast cross join
        if group_cols:
            return left.join(F.broadcast(stats), group_cols)
        return left.crossJoin(F.broadcast(stats))

    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = join_stats(df, med)
    mad = (
        with_med.groupBy(*group_cols)
        .agg(F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad"))
    )
    return (
        join_stats(with_med, mad)
        .withColumn("med", F.round(F.col("med"), 6))
        .withColumn("mad", F.round(F.col("mad"), 6))
        .withColumn(
            "is_outlier",
            (F.col("mad") > 0)
            & (F.abs(F.col(value_col) - F.col("med")) > k * F.col("mad")),
        )
    )


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE aggregation pass
    (all pairs as expressions of a single agg — one scan, one reduce; at
    100 TB this is the only sane shape, never one job per pair).

    Returns ``(col_a, col_b, corr)`` for the upper triangle (col_a <
    col_b in list order), correlations rounded to 6.
    """
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.round(F.corr(a, b), 6).alias(f"__c_{a}__{b}"))
            names.append((a, b))
    wide = df.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"__c_{a}__{b}").alias("corr"),
            )
            for a, b in names
        ]
    )
    return wide.select(F.explode(pairs).alias("p")).select("p.*")


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    quantiles: list[float] = (0.25, 0.5, 0.75, 0.95),
    round_to: int = 6,
) -> DataFrame:
    """Exact multi-quantile summary per group in ONE grouped
    aggregation: Spark's ``percentile(col, array(...))`` computes every
    requested quantile from a single sorted pass per group — never one
    job per quantile.

    Returns the group columns plus ``q<pct>`` columns (e.g. ``q25``,
    ``q50``); interpolation is the ANSI ``percentile_cont`` rule, so any
    SQL engine reproduces it.
    """
    arr = ", ".join(f"{q!r}D" for q in quantiles)
    agg = F.expr(f"percentile({value_col}, array({arr}))").alias("__qs")
    out = df.groupBy(*group_cols).agg(agg)
    cols = [F.col(c) for c in group_cols]
    for i, qv in enumerate(quantiles):
        name = f"q{int(round(qv * 100))}"
        cols.append(F.round(F.col("__qs")[i], round_to).alias(name))
    return out.select(*cols)


def sampled_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    probs: list[float],
    *,
    rate: float = 0.1,
    seed: int = 0,
    round_to: int = 4,
) -> DataFrame:
    """Approximate grouped quantiles from a deterministic uniform sample:
    keep rows whose ``md5(seed|id)`` uniform falls under ``rate``, then
    take EXACT discrete percentiles of the sample.

    Exact quantiles of 100 TB pay a full shuffle of every value; a p%
    sample bounds the per-group sort buffer at ``rate`` of the data with
    quantile error ~O(1/sqrt(rate * n)) — the classic sample-then-exact
    sketch, and unlike t-digest/KLL the sample is mergeable trivially
    (union of samples IS the sample of the union) and reproducible in any
    engine with md5 (no RNG state; hashing the stable id, not the float
    value, keeps the selection independent of value formatting).
    ``percentile_disc`` picks actual data values, so no cross-engine
    interpolation ties.

    Returns ``(*group_cols, p_<prob>, ..., n_sampled)``.
    """
    if not 0 < rate <= 1:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(seed)), F.col(id_col).cast("string")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**13))
    )
    sample = df.filter(u < rate).select(*group_cols, value_col)
    sample.createOrReplaceTempView("__sampled_quantiles_in")
    qcols = ", ".join(
        f"round(percentile_disc({p}) WITHIN GROUP (ORDER BY {value_col}), "
        f"{round_to}) AS p_{str(p).replace('.', '_')}"
        for p in probs
    )
    keys = ", ".join(group_cols)
    return df.sparkSession.sql(
        f"SELECT {keys}{', ' if keys else ''}{qcols}, count(*) AS n_sampled "
        f"FROM __sampled_quantiles_in "
        + (f"GROUP BY {keys}" if keys else "")
    )


def quantile_bins(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_bins: int,
    *,
    id_col: str | None = None,
) -> DataFrame:
    """Equal-frequency discretization: assign every row its quantile
    bucket (0..n_bins-1) within its group — ``ntile`` over the value
    order, the standard feature-engineering binning that a fixed-width
    histogram can't give on skewed data.

    Ties broken by ``id_col`` (required for cross-engine determinism when
    values repeat).  One window shuffle per group; ntile streams the
    sorted partition, so the reduce buffer is the sort spill, not the
    bucket map.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    order = [F.col(value_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.select(
        *group_cols,
        *([id_col] if id_col else []),
        F.col(value_col),
        (F.ntile(n_bins).over(w) - 1).alias("bin"),
    )


def winsorize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    lo: float = 0.01,
    hi: float = 0.99,
    round_to: int = 4,
) -> DataFrame:
    """Winsorized (percentile-clamped) values: clip each row's value to
    its group's [lo, hi] discrete percentiles — the robust-statistics
    standard for taming heavy tails before averaging/regression.

    Two-pass but one data shuffle: the per-group clip bounds are an
    exact ``percentile_disc`` aggregate (tiny frame), broadcast back onto
    the rows; the row pass is then map-only.  ``percentile_disc`` picks
    actual data values, so bounds are engine-exact.
    """
    df.select(*group_cols, value_col).createOrReplaceTempView("__winsorize_in")
    keys = ", ".join(group_cols)
    bounds = df.sparkSession.sql(
        f"SELECT {keys}{', ' if keys else ''}"
        f"percentile_disc({lo}) WITHIN GROUP (ORDER BY {value_col}) AS __lo, "
        f"percentile_disc({hi}) WITHIN GROUP (ORDER BY {value_col}) AS __hi "
        f"FROM __winsorize_in"
        + (f" GROUP BY {keys}" if keys else "")
    )
    joined = (
        df.join(F.broadcast(bounds), group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    clipped = F.round(
        F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
        round_to,
    )
    return joined.select(
        *df.columns, clipped.alias(f"{value_col}_winsorized")
    ).drop()


def agreement_kappa(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Cohen's kappa between two categorical columns — chance-corrected
    agreement (Cohen 1960), the standard audit for "does the metadata
    label agree with the model's prediction" and for inter-annotator
    checks on labeling pipelines.

    ``kappa = (po - pe) / (1 - pe)`` with observed agreement ``po`` and
    chance agreement ``pe`` from the marginal label distributions.  One
    pass: a single aggregation computes N and the observed matches, two
    tiny label-marginal aggregates join to form ``pe`` — nothing larger
    than the label vocabulary shuffles.  Returns one row
    ``(n, po, pe, kappa)``.
    """
    base = df.select(
        F.col(col_a).cast("string").alias("a"),
        F.col(col_b).cast("string").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    totals = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("long")).alias("agree"),
    )
    ma = base.groupBy("a").agg(F.count(F.lit(1)).alias("ca"))
    mb = base.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    pe_sum = (
        ma.join(mb, ma["a"] == mb["b"])
        .agg(F.sum(F.col("ca").cast("double") * F.col("cb")).alias("pe_num"))
    )
    return (
        totals.crossJoin(F.broadcast(pe_sum))
        .select(
            "n",
            F.round(F.col("agree").cast("double") / F.col("n"), 6).alias("po"),
            F.round(
                F.coalesce(F.col("pe_num"), F.lit(0.0))
                / (F.col("n").cast("double") * F.col("n")),
                6,
            ).alias("pe"),
            F.round(
                (
                    F.col("agree").cast("double") / F.col("n")
                    - F.coalesce(F.col("pe_num"), F.lit(0.0))
                    / (F.col("n").cast("double") * F.col("n"))
                )
                / (
                    F.lit(1.0)
                    - F.coalesce(F.col("pe_num"), F.lit(0.0))
                    / (F.col("n").cast("double") * F.col("n"))
                ),
                6,
            ).alias("kappa"),
        )
    )


def binary_metrics(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    threshold: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Binary-classifier evaluation in two bounded aggregations: rank-sum
    AUC (Mann-Whitney with tie correction) plus thresholded accuracy /
    precision / recall / F1 — the eval gate after ``logreg_train`` or
    any quality-classifier scoring pass.

    AUC never sorts the corpus: scores reduce to a (score -> pos, neg)
    distribution first (one groupBy shuffle; the frame is bounded by
    score RESOLUTION — at most ``10^round_to + 1`` rows for sigmoid
    outputs — not corpus size), then one window over that reduced frame
    accumulates negatives-below, and ``AUC = (sum_s pos_s * cumneg_s +
    0.5 * pos_s * neg_s) / (P * N)``.  The confusion-matrix metrics are
    plain global aggregates of the same scan.  Returns ONE row:
    ``(n, n_pos, auc, accuracy, precision, recall, f1)``; AUC is NULL
    when either class is absent, precision/F1 NULL when nothing is
    predicted positive.
    """
    s = F.round(F.col(score_col).cast("double"), round_to)
    y = F.col(label_col).cast("double")
    base = df.select(s.alias("__s"), y.alias("__y")).filter(
        F.col("__s").isNotNull() & F.col("__y").isNotNull()
    )
    dist = base.groupBy("__s").agg(
        F.sum("__y").alias("__pos"),
        F.sum(F.lit(1.0) - F.col("__y")).alias("__neg"),
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    auc_parts = dist.select(
        "__pos",
        "__neg",
        F.coalesce(F.sum("__neg").over(w), F.lit(0.0)).alias("__cumneg"),
    ).agg(
        F.sum(F.col("__pos") * F.col("__cumneg")).alias("__won"),
        F.sum(F.col("__pos") * F.col("__neg") * 0.5).alias("__tie"),
        F.sum("__pos").alias("__P"),
        F.sum("__neg").alias("__N"),
    )
    pred = (F.col("__s") >= F.lit(float(threshold))).cast("double")
    conf = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
        F.sum(pred * F.col("__y")).alias("__tp"),
        F.sum(pred * (F.lit(1.0) - F.col("__y"))).alias("__fp"),
        F.sum((F.lit(1.0) - pred) * F.col("__y")).alias("__fn"),
        F.sum((F.lit(1.0) - pred) * (F.lit(1.0) - F.col("__y"))).alias("__tn"),
    )
    joined = conf.crossJoin(auc_parts)
    precision = F.when(
        F.col("__tp") + F.col("__fp") > 0,
        F.col("__tp") / (F.col("__tp") + F.col("__fp")),
    )
    recall = F.when(
        F.col("__tp") + F.col("__fn") > 0,
        F.col("__tp") / (F.col("__tp") + F.col("__fn")),
    )
    f1 = F.when(
        precision.isNotNull() & recall.isNotNull() & (precision + recall > 0),
        2.0 * precision * recall / (precision + recall),
    )
    return joined.select(
        "n",
        "n_pos",
        F.round(
            F.when(
                (F.col("__P") > 0) & (F.col("__N") > 0),
                (F.col("__won") + F.col("__tie")) / (F.col("__P") * F.col("__N")),
            ),
            round_to,
        ).alias("auc"),
        F.round(
            (F.col("__tp") + F.col("__tn")) / F.col("n"), round_to
        ).alias("accuracy"),
        F.round(precision, round_to).alias("precision"),
        F.round(recall, round_to).alias("recall"),
        F.round(f1, round_to).alias("f1"),
    )


# Poisson(1) CDF thresholds for the md5-uniform inverse draw, shared
# verbatim with the SQL oracle (both engines compare against the SAME
# literals, so the draw is engine-exact).  Capped at 6 copies
# (P(X > 6) < 1e-4 — the truncation bias is far below reporting
# precision).
_POIS1_CDF = (
    0.367879441,  # P(X <= 0)
    0.735758882,
    0.919698603,
    0.981011843,
    0.996340153,
    0.999405815,
    0.999916758,
)


def bootstrap_mean_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    *,
    n_boot: int = 50,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    round_to: int = 6,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean of
    ``value_col`` — THE resampling scheme that works on distributed
    data (Chamandy et al., "Estimating Uncertainty for Massive Data
    Streams"): instead of drawing N rows with replacement (which needs
    global coordination), each row enters replicate ``r`` a
    Poisson(1)-distributed number of times, drawn deterministically from
    ``md5(id|r)`` via the inverse CDF.

    Scale shape: the replicate fan-out is a ``sequence`` explode (no
    shuffle) and each replicate's (sum, count) partials combine map-side,
    so the single shuffle carries ``n_boot`` rows total regardless of
    corpus size.  The replicate means are then a tiny frame; the
    percentile bracket is computed over exactly ``n_boot`` values.

    Returns ONE row ``(n, n_boot, mean, ci_lo, ci_hi)`` where mean is
    the plain (unresampled) mean and the CI brackets the ``lo_q``/
    ``hi_q`` replicate-mean quantiles (nearest-rank, deterministic).
    """
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    src = df.select(
        F.col(id_col).cast("string").alias("__id"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(F.col("__v").isNotNull())
    rep = src.select(
        "__id", "__v",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_boot) - 1))).alias("rep"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("__id"), F.col("rep"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    copies = F.lit(len(_POIS1_CDF))
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        copies = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(copies)
    per_rep = (
        rep.withColumn("__w", copies.cast("double"))
        .groupBy("rep")
        .agg(
            (F.sum(F.col("__w") * F.col("__v")) / F.sum("__w")).alias("__m")
        )
    )
    # nearest-rank bracket over exactly n_boot replicate means
    from pyspark.sql import Window as _W

    ranked = per_rep.withColumn(
        "__rk", F.row_number().over(_W.orderBy(F.col("__m").asc(), F.col("rep")))
    )
    lo_rk = max(1, int(math.ceil(lo_q * n_boot)))
    hi_rk = max(1, int(math.ceil(hi_q * n_boot)))
    bracket = ranked.agg(
        F.max(F.when(F.col("__rk") == lo_rk, F.col("__m"))).alias("__lo"),
        F.max(F.when(F.col("__rk") == hi_rk, F.col("__m"))).alias("__hi"),
    )
    base = src.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("__v").alias("__mean"),
    )
    return base.crossJoin(bracket).select(
        "n",
        F.lit(int(n_boot)).cast("bigint").alias("n_boot"),
        F.round("__mean", round_to).alias("mean"),
        F.round("__lo", round_to).alias("ci_lo"),
        F.round("__hi", round_to).alias("ci_hi"),
    )


def skew_report(
    df: DataFrame, key_col: str, *, top_n: int = 10
) -> DataFrame:
    """Key-distribution skew diagnostic — run it BEFORE a big join or
    aggregation to decide whether `plans.skew.salted_join`/`salted_agg`
    (or an LSH stop-list) is needed.

    Per top-``top_n`` hot key: row count, share of all rows, cumulative
    share; every row also carries the global Gini coefficient of the
    key-count distribution (0 = perfectly even, ->1 = one key owns
    everything) and the total distinct-key count.  Shuffle budget: one
    groupBy on the key, then windows over the (much smaller) key-count
    table.  Returns ``(key, cnt, share, cum_share, gini, n_keys)``.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_asc = Window.orderBy(F.col("cnt").asc(), F.col("key").asc())
    ranked = counts.withColumn("__i", F.row_number().over(w_asc))
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"),
        F.sum(F.col("__i").cast("double") * F.col("cnt")).alias("__iw"),
    ).select(
        "n_keys",
        "total",
        F.round(
            (2.0 * F.col("__iw"))
            / (F.col("n_keys").cast("double") * F.col("total"))
            - (F.col("n_keys") + 1.0) / F.col("n_keys"),
            6,
        ).alias("gini"),
    )
    w_desc = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
    top = (
        counts.withColumn("__r", F.row_number().over(w_desc))
        .filter(F.col("__r") <= top_n)
    )
    w_cum = Window.orderBy("__r").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias("share"),
            F.round(
                F.sum(F.col("cnt").cast("double")).over(w_cum) / F.col("total"),
                6,
            ).alias("cum_share"),
            "gini",
            "n_keys",
        )
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    round_to: int = 6,
    cdf_buckets: int = 64,
    max_groups: int = 1000,
    quantize: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic for every unordered
    group pair — the numeric-feature drift monitor (document lengths,
    quality scores, timestamps) beside ``text.vocab_drift``'s vocabulary
    one: D = max over values of |F_a(v) - F_b(v)| with the empirical
    CDFs evaluated after ties (the standard two-sample convention).

    Fully relational: per-(group, value) counts (ONE aggregation), a
    groups^2-bounded pair table (the group list is dimension-sized by
    definition — these are sources/languages/snapshots), counts joined
    to each pair's sides — so the widest shuffle carries
    (pairs x distinct values) count rows, never raw rows.

    The cumulative sums use a TWO-LEVEL distributed CDF so continuous
    features (distinct values ~ row count) never serialize a pair into
    one task: the value domain is split on ``cdf_buckets`` approximate
    quantile boundaries (a KB driver probe, re-entered as literals),
    each (pair, bucket) slice cumsums independently, and the per-bucket
    totals — a pairs x buckets table — prefix-sum in a second tiny
    window.  The result is exact for ANY boundary choice (bucket
    assignment is monotone in the value), so the statistic is engine-
    and order-independent; ``cdf_buckets=1`` degenerates to the single
    window.  Exact integer arithmetic until the final division.

    Memory bound of the pinned intermediate: the eagerly materialized
    ``(group, value, count)`` frame is bounded by the DISTINCT value
    domain per group, not the row count — tiny for the intended inputs
    (lengths, scores, bucketed timestamps).  On a NEAR-CONTINUOUS value
    column (e.g. raw float measurements, every value distinct) it
    approaches corpus scale; it stays executor-distributed (never
    collected), so the operator degrades to shuffling row-scale counts
    rather than failing — but for such inputs set ``quantize``.

    ``quantize`` (opt-in escape hatch) rounds values to that many
    decimal places BEFORE counting, collapsing a near-continuous domain
    to at most ``(max-min) * 10^quantize`` distinct values.  The result
    is then the exact KS statistic OF THE QUANTIZED distributions — a
    documented approximation whose CDF evaluation points move by at
    most half a quantum; the default (``None``) stays exact.

    Returns ``(group_a, group_b, n_a, n_b, ks_stat)``, lexically
    ordered pairs; NULL groups/values are dropped.
    """
    val = F.col(value_col).cast("double")
    if quantize is not None:
        val = F.round(val, int(quantize))
    counts = (
        df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("__g"),
            val.alias("__v"),
        )
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # counts feeds SIX consumers (two driver probes, both CDF join
    # sides, and the per-pair value union twice); without materialization
    # every consumer re-scans and re-aggregates the RAW frame — eight
    # full input scans in one plan.  One eager localCheckpoint pins the
    # distinct (group, value) table — bounded by the value domain, tiny
    # next to the raw corpus — so the input is scanned exactly once;
    # blocks are GC-reaped once the returned frame dies (same contract
    # as the CC loop, operators/graph.py)
    counts = counts.localCheckpoint(eager=True)
    # group list is dimension-sized by definition: build the pair table
    # driver-side (KB probe) so the plan is equi-joins only — no
    # nested-loop cross join for pair enumeration
    # limit() bounds the driver BEFORE the guard fires — an entity column
    # mistakenly used as the group collects max_groups + 1 rows, not all
    size_rows = (
        counts.groupBy("__g")
        .agg(F.sum("__c").alias("__n"))
        .limit(max_groups + 1)
        .collect()
    )
    if len(size_rows) > max_groups:
        raise ValueError(
            f"ks_drift: more than max_groups={max_groups} distinct groups "
            "— the pairwise matrix is quadratic in the group count; groups "
            "are sources/snapshots, not entities. Pre-bucket the group "
            "column or raise max_groups deliberately."
        )
    sizes = {r["__g"]: int(r["__n"]) for r in size_rows}
    gs = sorted(sizes)
    pairs = df.sparkSession.createDataFrame(
        [
            (ga, gb, sizes[ga], sizes[gb])
            for i, ga in enumerate(gs)
            for gb in gs[i + 1 :]
        ],
        "group_a string, group_b string, n_a bigint, n_b bigint",
    )
    ca = counts.select(
        F.col("__g").alias("group_a"), F.col("__v").alias("__va"), F.col("__c").alias("__ca")
    )
    cb = counts.select(
        F.col("__g").alias("group_b"), F.col("__v").alias("__vb"), F.col("__c").alias("__cb")
    )
    # distinct values per pair from the union of both sides, then
    # left-join each side's count back (a full outer can't rebuild pair
    # identity for one-side-only values)
    vals_a = pairs.join(ca, "group_a").select("group_a", "group_b", F.col("__va").alias("__v"))
    vals_b = pairs.join(cb, "group_b").select("group_a", "group_b", F.col("__vb").alias("__v"))
    vals = vals_a.unionByName(vals_b).distinct()
    grid = (
        vals.join(ca, (vals["group_a"] == ca["group_a"]) & (vals["__v"] == ca["__va"]), "left")
        .select(vals["group_a"], vals["group_b"], vals["__v"], F.coalesce("__ca", F.lit(0)).alias("ca"))
        .join(cb, (vals["group_b"] == cb["group_b"]) & (F.col("__v") == cb["__vb"]), "left")
        .select(vals["group_a"], vals["group_b"], "__v", "ca", F.coalesce("__cb", F.lit(0)).alias("cb"))
    )
    # two-level distributed CDF: bucket the value domain on approximate
    # quantile boundaries of the DISTINCT values (balance only affects
    # parallelism, never the result — assignment is monotone in __v),
    # cumsum within each (pair, bucket) slice, then add the exclusive
    # prefix sum of bucket totals (a pairs x buckets table) per pair.
    edges: list[float] = []
    if cdf_buckets > 1:
        qs_b = ", ".join(f"{i / cdf_buckets!r}D" for i in range(1, cdf_buckets))
        edge_row = (
            counts.select("__v")
            .distinct()
            .agg(F.expr(f"approx_percentile(__v, array({qs_b}), 1000)").alias("__e"))
            .first()
        )
        if edge_row is not None and edge_row["__e"] is not None:
            edges = sorted({float(e) for e in edge_row["__e"]})
    if edges:
        edge_arr = F.array(*[F.lit(e) for e in edges])
        bk = F.aggregate(
            edge_arr,
            F.lit(0),
            lambda acc, e: acc
            + F.when(F.col("__v") > e, F.lit(1)).otherwise(F.lit(0)),
        )
    else:
        bk = F.lit(0)
    bucketed = grid.withColumn("__bk", bk)
    w_in = Window.partitionBy("group_a", "group_b", "__bk").orderBy("__v")
    within = bucketed.select(
        "group_a",
        "group_b",
        "__bk",
        F.sum("ca").over(w_in).alias("__cia"),
        F.sum("cb").over(w_in).alias("__cib"),
    )
    totals = bucketed.groupBy("group_a", "group_b", "__bk").agg(
        F.sum("ca").alias("__ta"), F.sum("cb").alias("__tb")
    )
    w_off = (
        Window.partitionBy("group_a", "group_b")
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "group_a",
        "group_b",
        "__bk",
        F.coalesce(F.sum("__ta").over(w_off), F.lit(0)).alias("__oa"),
        F.coalesce(F.sum("__tb").over(w_off), F.lit(0)).alias("__ob"),
    )
    # no broadcast hint: offsets is pairs x buckets rows — KBs for the
    # typical handful of groups, but ~32M rows at the max_groups=1000
    # cap; let AQE pick (it broadcasts the small case on its own)
    cdf = within.join(
        offsets, ["group_a", "group_b", "__bk"]
    ).select(
        "group_a",
        "group_b",
        (F.col("__cia") + F.col("__oa")).alias("cum_a"),
        (F.col("__cib") + F.col("__ob")).alias("cum_b"),
    )
    stats = (
        cdf.join(pairs, ["group_a", "group_b"])
        .groupBy("group_a", "group_b", "n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
                )
            ).alias("__d")
        )
    )
    return stats.select(
        "group_a",
        "group_b",
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round("__d", round_to).alias("ks_stat"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ref_group: str,
    *,
    bins: int = 10,
    k: float = 0.5,
    round_to: int = 6,
    max_groups: int = 10_000,
) -> DataFrame:
    """Population Stability Index of every group against ``ref_group``
    — the binned drift score model-monitoring runs on features and
    model outputs (rule of thumb: < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted).  Complements ``ks_drift`` (max CDF gap, tail-
    blind) with a mass-weighted, binned view.

    Bin edges are the reference group's ``bins``-quantiles (exact ANSI
    ``percentile_cont``, so any engine re-derives them); they collect to
    the driver (``bins - 1`` doubles, a KB probe) and re-enter the plan
    as a literal CASE ladder, so the scoring pass is ONE scan + one
    (group, bin)-keyed count whose output is ``groups x bins`` rows.
    The add-``k``-smoothed PSI terms use the same exact integer
    micro-unit trick as DSIR — engine- and order-independent scores.

    Returns ``(group, n_ref, n, psi)`` for every non-reference group,
    lexically ordered.  NULL groups/values are dropped.
    """
    if bins < 2:
        raise ValueError(f"psi_drift: bins must be >= 2, got {bins}")
    src = df.filter(
        F.col(group_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        F.col(group_col).cast("string").alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    edges = psi_edges(src.filter(F.col("__g") == ref_group), "__v", bins=bins)
    if edges is None:
        raise ValueError(f"psi_drift: reference group {ref_group!r} has no rows")
    counts = psi_bin_counts(src, "__v", "__g", edges, bins=bins)
    # bound the DRIVER before the collect: each group contributes <= bins
    # rows, so more than max_groups x bins rows proves the guard fires —
    # fetched with limit() so an entity-column mistake can't OOM the
    # driver on the way to the error message
    cap = max_groups * bins
    rows = counts.limit(cap + 1).collect()
    by_group: dict[str, dict[int, int]] = {}
    for r in rows:  # groups x bins rows — KB probe
        by_group.setdefault(r["group"], {})[int(r["bin"])] = int(r["cnt"])
    if len(rows) > cap or len(by_group) > max_groups:
        raise ValueError(
            f"psi_drift: more than max_groups={max_groups} distinct groups "
            "— the groups x bins table collects to the driver; groups are "
            "sources/snapshots, not entities. Pre-bucket the group column "
            "or raise max_groups deliberately."
        )
    return psi_from_counts(
        df.sparkSession, by_group, ref_group, bins=bins, k=k, round_to=round_to
    )


def psi_edges(ref_df: DataFrame, value_col: str, *, bins: int) -> list[float] | None:
    """The reference group's ``bins``-quantile edges (exact ANSI
    ``percentile_cont``); None when the reference frame is empty.
    Split out of :func:`psi_drift` so the streaming twin can pin edges
    once and reuse them across micro-batches."""
    qs = [i / bins for i in range(1, bins)]
    arr = ", ".join(f"{q!r}D" for q in qs)
    edges_row = ref_df.agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("__e")
    ).first()
    if edges_row is None or edges_row["__e"] is None:
        return None
    return [float(e) for e in edges_row["__e"]]


def psi_bin_counts(
    src: DataFrame,
    value_col: str,
    group_col: str,
    edges: list[float],
    *,
    bins: int,
) -> DataFrame:
    """(group, bin, cnt) over the literal-edge CASE ladder: bin b = first
    edge the value is <= (ties go LEFT, matching the SQL twin's
    ``v <= edge`` ladder).  Counts are ADDITIVE across row slices, which
    is what makes the streaming twin's append-and-sum state exact."""
    bin_col = F.lit(bins - 1)
    for i in reversed(range(len(edges))):
        bin_col = F.when(F.col(value_col) <= F.lit(edges[i]), F.lit(i)).otherwise(
            bin_col
        )
    return (
        src.select(F.col(group_col).alias("group"), bin_col.alias("bin"))
        .groupBy("group", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def psi_from_counts(
    spark,
    by_group: dict[str, dict[int, int]],
    ref_group: str,
    *,
    bins: int,
    k: float,
    round_to: int,
) -> DataFrame:
    """The exact-integer-micro-unit PSI over collected (group, bin)
    counts — shared verbatim by the batch and streaming paths so the
    differential contract is equality, not closeness."""
    import math

    if ref_group not in by_group:
        raise ValueError(f"psi_drift: reference group {ref_group!r} has no rows")
    ref = by_group[ref_group]
    n_ref = sum(ref.values())

    scale = 10**round_to

    def to_units(x: float) -> int:
        r = math.copysign(math.floor(abs(x) * scale + 0.5) / scale, x)
        return int(math.floor(r * scale + 0.5))

    out = []
    for g in sorted(by_group):
        if g == ref_group:
            continue
        cg = by_group[g]
        n = sum(cg.values())
        u = 0
        for b in range(bins):
            pa = (ref.get(b, 0) + k) / (n_ref + k * bins)
            pb = (cg.get(b, 0) + k) / (n + k * bins)
            u += to_units((pb - pa) * math.log(pb / pa))
        out.append((g, n_ref, n, u / float(scale)))
    return spark.createDataFrame(
        out, "group string, n_ref bigint, n bigint, psi double"
    )
