"""Dedup cluster assignment and exact sampling — the steps after
candidate-pair generation in a production dedup pipeline.

``dedup_clusters`` turns near-duplicate PAIRS (from LSH/Jaccard/cosine)
into per-document cluster ids via distributed min-label propagation —
the connected-components step that picks one canonical document per
duplicate group.  O(component diameter) rounds of join+groupBy; dedup
components are shallow (near-duplicates of a common ancestor), so this
converges in a handful of rounds at any scale.  Complements
``etielle_spark.utils.connected_components`` (driver-side, used for
write grouping) with a fully distributed variant.

``stratified_sample_exact`` draws exactly n rows per stratum with a
deterministic md5 ordering — reproducible across engines and runs,
unlike ``DataFrame.sampleBy`` (approximate, seed-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dedup_clusters(
    pairs: DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, cluster_id) for every id in ``pairs``; cluster_id is the
    minimum id reachable through the pair graph (connected components by
    min-label propagation).

    Delegates to :func:`operators.graph.connected_components_df` — ONE
    checkpointed propagate + pointer-jump loop in the repo (round 7:
    this module used to carry a persist-only duplicate whose
    self-referencing plan doubled per round — analyzer OOM by round 7
    on a 10-round chain graph; ``persist()`` does not truncate logical
    plans, checkpoints do).  Raises rather than returning a
    half-converged labeling when ``max_iterations`` is exceeded.
    """
    from .graph import connected_components_df

    labels = connected_components_df(
        pairs, id_a, id_b, max_iter=max_iterations
    )
    return labels.select(F.col("id"), F.col("component").alias("cluster_id"))


def canonicalize_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Quality-aware near-dup retention: group ids into connected
    components over the ``pairs`` graph (:func:`dedup_clusters`), then
    keep the HIGHEST-``score_col`` member of each component (ties broken
    by ascending id) and mark the rest dropped with ``dup_of`` pointing
    at the keeper — the "best document wins" pass most pretraining
    pipelines run over LSH/SemDedup candidate pairs instead of the
    min-id retention ``semdedup``/``exact_dedup`` default.

    Returns ``(id, score, cluster_id, keep, dup_of)`` for EVERY row of
    ``df``: ids in no pair are singleton keepers of their own cluster;
    NULL scores sort below every non-NULL score (a scored duplicate
    always beats an unscored one); rows with a NULL id cannot be graph
    members (nothing can point at them) and pass through as singleton
    keepers with a NULL cluster_id.  Ids need only be orderable —
    string/UUID keys work (the tie-break never negates or casts the
    id).

    Plan shape at scale: the component labels come from the checkpointed
    min-label propagation (join+groupBy rounds on (id, label) pairs —
    hub skew is AQE's problem, adjacency never materializes); the keeper
    choice is ONE ``max_by`` aggregation per cluster (map-side partial,
    skew-immune) broadcast-joined back — no windows over data-keyed
    partitions.
    """
    labels = dedup_clusters(
        pairs, id_a=id_a, id_b=id_b, max_iterations=max_iterations
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(score_col).cast("double").alias("score"),
    )
    # NULL ids would vanish through the keeper equi-join (NULL keys
    # never match); route them around the graph as singleton keepers
    null_ids = base.filter(F.col("id").isNull()).select(
        "id",
        "score",
        F.lit(None).cast(base.schema["id"].dataType).alias("cluster_id"),
        F.lit(True).alias("keep"),
        F.lit(None).cast(base.schema["id"].dataType).alias("dup_of"),
    )
    labeled = (
        base.filter(F.col("id").isNotNull())
        .join(labels, "id", "left")
        .select(
            "id",
            "score",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"),
        )
    )
    # keeper per cluster: max score, ties -> min id.  min_by over an
    # ASCENDING preference key keeps the id un-negated and un-cast, so
    # string/UUID/snowflake ids stay exact: (NULL-score flag asc puts
    # scored rows first, -score asc puts high scores first, id asc
    # breaks ties to the smallest)
    pref = F.struct(
        F.col("score").isNull().cast("int").alias("s0"),
        (-F.coalesce(F.col("score"), F.lit(0.0))).alias("s1"),
        F.col("id").alias("s2"),
    )
    keepers = labeled.groupBy("cluster_id").agg(
        F.min_by(F.col("id"), pref).alias("__keep_id")
    )
    out = labeled.join(keepers, "cluster_id").select(
        "id",
        "score",
        "cluster_id",
        (F.col("id") == F.col("__keep_id")).alias("keep"),
        F.when(F.col("id") != F.col("__keep_id"), F.col("__keep_id")).alias(
            "dup_of"
        ),
    )
    return out.unionByName(null_ids)


def stratified_sample_exact(
    df: DataFrame,
    strata: list[str],
    n_per_stratum: int,
    *,
    order_key: str,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per strata combination, picked by
    md5(order_key) — deterministic, engine-reproducible, and rank-stable
    (ties impossible for distinct keys).  One shuffle on the strata
    columns; each stratum ranks independently (no global sort)."""
    w = Window.partitionBy(*strata).orderBy(
        F.md5(F.col(order_key).cast("string")), F.col(order_key)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    buckets: int = 100,
    thresholds: dict[str, int] | None = None,
    keep_all: bool = False,
) -> DataFrame:
    """Deterministic train/val/test assignment: hash the stable id into
    ``buckets`` and map bucket ranges to split names.

    ``thresholds`` maps split name -> exclusive upper bucket bound, in
    order (default ``{"train": 80, "val": 90, "test": 100}`` = 80/10/10).
    Hashing ``md5(id)`` rather than sampling makes the split stable
    under reruns, engine-independent, and consistent across tables that
    share the id (a document and its chunks land in the same split).
    Pure column expressions — no shuffle, no seed state.

    Returns the input id plus ``(bucket, split)``.
    """
    if thresholds is None:
        thresholds = {"train": 80, "val": 90, "test": 100}
    bounds = list(thresholds.items())
    if not bounds or bounds[-1][1] != buckets:
        raise ValueError("last threshold must equal buckets")
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )
    expr = None
    for name, hi in reversed(bounds):
        expr = F.lit(name) if expr is None else F.when(bucket < hi, F.lit(name)).otherwise(expr)
    if keep_all:
        # ``keep_all`` carries every input column through (pipeline
        # composition) — still a pure projection, no shuffle
        return df.select("*", bucket.alias("bucket"), expr.alias("split"))
    return df.select(
        F.col(id_col), bucket.alias("bucket"), expr.alias("split")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    *,
    n: int,
    stratify_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: draw ``n``
    rows (per stratum if ``stratify_col`` is given) with inclusion
    probability proportional to ``weight_col``.

    Efraimidis–Spirakis A-ES: each row gets the key ``ln(u)/w`` with
    ``u`` uniform from ``md5(id)`` — the top-n keys ARE a weighted
    sample without replacement.  Using the md5-derived uniform makes
    the draw reproducible across engines and reruns (no seed state on
    executors).  One row_number window per stratum — the same shape as
    ``stratified_sample_exact``, so it scales identically (spread
    strata keys; no global sort).

    Rows with non-positive or NULL weight are excluded.  Returns the
    input row ids with their stratum and rank.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    strat = [stratify_col] if stratify_col else []
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(float(16**13))
    )
    scored = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            *strat,
            F.col(id_col),
            (F.log(u) / F.col(weight_col).cast("double")).alias("__k"),
        )
    )
    w = Window.partitionBy(*strat).orderBy(F.col("__k").desc(), F.col(id_col).asc())
    return (
        scored.select(
            *strat, F.col(id_col), F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= n)
        .select(*strat, id_col, F.col("rank").cast("bigint").alias("rank"))
    )


def mixture_resample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights: dict[str, float],
    *,
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic mixture re-sampling: repeat each row according to
    its group's weight — ``floor(w)`` full copies plus one extra copy
    where the row's md5 uniform falls below ``frac(w)``.  Weights < 1
    down-sample, > 1 up-sample (epoch repetition); expected output size
    is ``sum_g w_g * |g|`` exactly, and the selection is reproducible
    across engines and runs (md5 of the id, not a seeded RNG).

    This is the source-mixing step of a pretraining data pipeline
    ("2.3 epochs of wiki, 0.4 of web").  The weight table is a literal
    map (mixtures are tiny); the fan-out is a ``sequence`` explode — no
    shuffle at all, output inherits the input partitioning.

    Returns the input columns plus ``copy_idx`` (0-based).
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be >= 0")
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    w = F.coalesce(wmap[F.col(group_col)], F.lit(float(default_weight)))
    # md5 uniform in [0, 1): first 8 hex nibbles / 16^8
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(16**8))
    )
    n_copies = (F.floor(w) + (u < (w - F.floor(w))).cast("int")).cast("int")
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
        .withColumn("copy_idx", F.col("copy_idx").cast("bigint"))
    )


def temperature_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    *,
    tau: float = 0.7,
    budget: int | None = None,
) -> DataFrame:
    """Temperature-based mixture re-sampling: target share of group ``g``
    is ``c_g^tau / sum_h c_h^tau`` (the multilingual-LM sampling rule —
    ``tau < 1`` boosts low-resource groups, ``tau = 1`` is natural
    frequency).  ``budget`` is the total output row budget (default: the
    input size), so group ``g`` receives weight ``w_g = share_g * budget
    / c_g`` epochs — up-sampled (repeated) when ``w_g > 1``.

    Scale shape: the group-count aggregate shuffles one row per group;
    the weight table is tiny and broadcasts into the copy-expansion,
    which is the same shuffle-free ``sequence`` explode as
    ``mixture_resample`` with the same md5-uniform fractional copy, so
    the draw is reproducible across engines.  Returns the input columns
    plus ``copy_idx`` (0-based) and the group's ``weight`` (rounded to 9
    decimals for engine-stable comparisons).
    """
    if tau < 0:
        raise ValueError("tau must be >= 0")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    tot = counts.groupBy().agg(
        F.sum(F.pow(F.col("__c").cast("double"), F.lit(float(tau)))).alias("__z"),
        F.sum("__c").alias("__n"),
    )
    weights = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        (
            F.pow(F.col("__c").cast("double"), F.lit(float(tau)))
            / F.col("__z")
            * (F.lit(float(budget)) if budget is not None else F.col("__n").cast("double"))
            / F.col("__c").cast("double")
        ).alias("__w"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(16**8))
    )
    # round the weight BEFORE the floor/frac split so Spark and a SQL
    # replay agree on boundary rows (pow() can differ in the last ulp)
    w = F.round(F.col("__w"), 9)
    n_copies = (F.floor(w) + (u < (w - F.floor(w))).cast("int")).cast("int")
    return (
        df.join(F.broadcast(weights), group_col)
        .withColumn("weight", w)
        .withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            "copy_idx", F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1))
        )
        .drop("__n_copies", "__w")
        .withColumn("copy_idx", F.col("copy_idx").cast("bigint"))
    )


def unimax_mixture(
    df: DataFrame,
    group_col: str,
    *,
    budget: float,
    max_epochs: float,
    size_col: str | None = None,
    max_groups: int = 100_000,
) -> DataFrame:
    """UniMax epoch-capped budget allocation (Chung et al., "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining", ICLR 2023): distribute a total training
    ``budget`` across groups as uniformly as possible subject to a
    per-group repetition cap — no group contributes more than
    ``max_epochs`` passes over its own data.  The waterfill visits
    groups in ascending size; each receives
    ``min(size * max_epochs, remaining_budget / remaining_groups)``,
    so small groups are capped by repetition and large groups split the
    leftover evenly — the fairness property temperature sampling
    (:func:`temperature_mixture`) only approximates.

    Scale shape: ONE map-side-combined aggregation (one row per group);
    the waterfill itself is O(G log G) on the driver over the
    ``max_groups``-guarded group list (the guard binds BEFORE the
    collect, the ks_drift idiom).  The result is the tiny per-group
    allocation table — feed ``weight = alloc_budget / group_size``
    epochs into :func:`mixture_resample` for the actual row fan-out.

    NULL groups are unaddressable mixture identities and are excluded
    (the ``pack_counts`` contract); a group whose sizes are ALL NULL has
    no measurable mass and is likewise dropped rather than given a NULL
    allocation.  Ties in group size break on the group name so the
    allocation is engine-reproducible.  Returns one row per group:
    ``(group, group_size, alloc_budget, weight)``, the floats rounded
    to 6 decimals for engine-stable comparison.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    size = (
        F.sum(F.col(size_col)).alias("__sz")
        if size_col is not None
        else F.count(F.lit(1)).alias("__sz")
    )
    rows = (
        df.filter(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("group"))
        .agg(size)
        .limit(max_groups + 1)
        .collect()
    )
    if len(rows) > max_groups:
        raise ValueError(
            f"unimax_mixture: more than max_groups={max_groups} distinct "
            "groups — the allocation table is driver-side by design; "
            "aggregate groups first or raise max_groups"
        )
    # all-double arithmetic in waterfill order, so a SQL replay of the
    # same recurrence (recursive CTE) reproduces the values bit-for-bit
    sized = sorted(
        ((float(r["__sz"]), str(r["group"])) for r in rows if r["__sz"] is not None)
    )
    remaining = float(budget)
    alloc: list[tuple[str, float, float]] = []
    for i, (sz, grp) in enumerate(sized):
        a = min(sz * float(max_epochs), remaining / (len(sized) - i))
        remaining -= a
        alloc.append((grp, sz, a))
    spark = df.sparkSession
    out = spark.createDataFrame(
        alloc or [], "group string, group_size double, alloc_budget double"
    )
    return out.select(
        "group",
        F.col("group_size").cast("bigint").alias("group_size"),
        F.round("alloc_budget", 6).alias("alloc_budget"),
        F.round(F.col("alloc_budget") / F.lit(float(budget)), 6).alias("weight"),
    )


def shard_assign(
    df: DataFrame,
    id_col: str,
    num_shards: int,
    *,
    seed: int = 0,
    with_position: bool = False,
) -> DataFrame:
    """Deterministic globally-shuffled shard assignment for training
    output: shard = ``md5(seed|id) % num_shards``, and (optionally) the
    row's position within its shard ordered by the same hash.

    Training ingestion wants the corpus in a reproducible random order,
    decorrelated from ingestion order (which clusters by source/time), and
    cut into equal-ish shards.  Hashing a stable id gives exactly that
    with zero seed state: re-running with the same seed reproduces the
    layout bit-for-bit; bumping the seed is a fresh epoch-level shuffle.

    Assignment itself is map-only.  ``with_position`` adds a per-shard
    ``row_number`` window — one shuffle partitioned by shard (the same
    shuffle a subsequent ``repartition(shard)`` write needs anyway, so
    the position is effectively free before ``write_shards``).
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    out = df.select(
        "*",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % num_shards).alias(
            "shard"
        ),
        h.alias("__h"),
    )
    if with_position:
        w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
        out = out.withColumn("position", F.row_number().over(w) - 1)
    return out.drop("__h")


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    *,
    seed: int = 0,
    max_records_per_file: int | None = None,
    format: str = "parquet",
) -> None:
    """Materialize ``shard_assign``'s layout: one output directory
    partitioned by ``shard``, rows within each shard in hash order.

    ``repartition(num_shards, shard)`` lines physical partitions up with
    shards (one shuffle), ``sortWithinPartitions`` fixes the intra-shard
    order without a global sort, and ``maxRecordsPerFile`` caps file size
    so a 100 TB corpus lands as uniformly-sized reader-friendly files.
    """
    out = shard_assign(df, id_col, num_shards, seed=seed)
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    writer = (
        out.repartition(num_shards, F.col("shard"))
        .sortWithinPartitions(h, F.col(id_col))
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.format(format).save(path)


def per_key_sample(
    df: DataFrame,
    key_cols: list[str],
    id_col: str,
    k: int,
    *,
    seed: int = 0,
) -> DataFrame:
    """Deterministic k-per-key sample: within each key, keep the ``k``
    rows with the smallest ``md5(seed|id)`` — a reproducible stand-in for
    per-group reservoir sampling (same marginal: each row equally likely
    under the hash's uniformity, but stable across reruns/engines).

    One window shuffle partitioned by the keys; the row_number top-k
    partial-aggregates per group, so the reduce-side buffer is O(k), not
    O(group size).  Inspection samples, eval subsets, per-source preview
    sets — anywhere you want 'k random docs per source' that doesn't
    change under a rerun.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_col).cast("string")))
    w = Window.partitionBy(*key_cols).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def rendezvous_assign(
    df: DataFrame,
    id_col: str,
    nodes: list[str],
) -> DataFrame:
    """Rendezvous (highest-random-weight) assignment: each row goes to the
    node with the greatest ``md5(node|id)`` (Thaler & Ravishankar 1996).

    Unlike modulo sharding, adding or removing a node reassigns ONLY the
    rows that hash highest for that node (~1/n of keys) — the property
    that keeps caches, stateful-stream partitions, and incremental-index
    shards warm through topology changes.  Map-only, no coordinator, no
    stored ring state; any engine with md5 computes the same owner.

    Returns the input plus ``node``.
    """
    if not nodes:
        raise ValueError("rendezvous_assign: need at least one node")
    if len(set(nodes)) != len(nodes):
        raise ValueError("rendezvous_assign: duplicate node names")
    scored = [
        F.struct(
            F.md5(
                F.concat_ws("|", F.lit(node), F.col(id_col).cast("string"))
            ).alias("w"),
            F.lit(node).alias("node"),
        )
        for node in nodes
    ]
    winner = scored[0] if len(scored) == 1 else F.greatest(*scored)
    return df.select("*", winner["node"].alias("node"))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    *,
    buckets: int = 100,
    thresholds: dict[str, int] | None = None,
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: connected components over the near-dup ``pairs`` graph first,
    then the deterministic hash split keyed on the CLUSTER id — every
    member of a duplicate cluster lands in the same split by
    construction (a per-document split scatters eval twins of training
    documents into the test set, silently inflating eval numbers).

    Singleton documents (no near-dup edge) are their own cluster.  Costs
    one label-propagation fixpoint over the pair graph plus a broadcast-
    sized join of the cluster labels back onto the corpus; the split
    itself is map-only.

    Returns ``(id, cluster_id, bucket, split)``.
    """
    clusters = dedup_clusters(pairs)
    labeled = (
        df.select(F.col(id_col))
        .join(clusters.withColumnRenamed("id", id_col), [id_col], "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
    split = hash_split(
        labeled.withColumnRenamed("cluster_id", "__ck"),
        "__ck",
        buckets=buckets,
        thresholds=thresholds,
        keep_all=True,
    )
    return split.select(
        F.col(id_col),
        F.col("__ck").alias("cluster_id"),
        "bucket",
        "split",
    )


def distribution_match_resample(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str,
    reference_group: str,
    *,
    buckets: int = 4,
    salt: str = "dmr",
    max_groups: int = 100_000,
) -> DataFrame:
    """Match every group's ``value_col`` distribution to the reference
    group's by bucket-wise downsampling — the "make synthetic data's
    length profile look like the real corpus" curation step.

    Bucket boundaries are the reference group's exact quantiles; within
    each non-reference group, a bucket's keep probability is
    (reference bucket share / group bucket share), normalized per group
    so the largest ratio keeps everything — the group's SHAPE converges
    to the reference's while retaining maximal data.  Selection uses the
    salted-md5 uniform (reproducible across engines and runs); the
    reference group passes through untouched.

    Scale shape: two corpus scans and ONE tiny shuffle (the
    (group, bucket) count aggregate); boundaries and the keep-probability
    table are driver-collected aggregates — (groups x buckets) rows,
    size-guarded by ``max_groups`` — compiled back as literals, so the
    final pass is a pure scan-project-filter with no join at all (the
    same literal-probe idiom as the blocklist and classifier operators).
    Returns ``(id, group, value, bucket, keep_p)`` for kept rows.
    """
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    qs = [k / buckets for k in range(1, buckets)]
    brow = (
        df.filter(F.col(group_col) == reference_group)
        .agg(
            *[
                F.expr(f"percentile({value_col}, {q})").alias(f"b{k}")
                for k, q in enumerate(qs, start=1)
            ]
        )
        .collect()[0]
    )
    bounds = [brow[f"b{k}"] for k in range(1, buckets)]
    if any(b is None for b in bounds):
        raise ValueError(
            f"reference group {reference_group!r} has no rows (or NULL "
            f"{value_col}); cannot derive boundaries"
        )

    bucket = F.lit(1)
    for b in bounds:
        bucket = bucket + (F.col(value_col) > F.lit(float(b))).cast("int")
    bucket = bucket.cast("bigint")

    counts = (
        df.groupBy(F.col(group_col).alias("group"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    if len(counts) > max_groups * buckets:
        raise ValueError(
            f"distribution_match_resample: {len(counts)} (group, bucket) "
            f"cells exceeds the literal-probe cap; reduce group "
            "cardinality or aggregate groups first"
        )
    totals: dict[str, int] = {}
    for r in counts:
        totals[r["group"]] = totals.get(r["group"], 0) + r["n"]
    ref_frac = {
        r["bucket"]: r["n"] / totals[reference_group]
        for r in counts
        if r["group"] == reference_group
    }
    ratios: dict[tuple[str, int], float] = {
        (r["group"], r["bucket"]): ref_frac.get(r["bucket"], 0.0)
        / (r["n"] / totals[r["group"]])
        for r in counts
    }
    max_ratio: dict[str, float] = {}
    for (g, _), ratio in ratios.items():
        max_ratio[g] = max(max_ratio.get(g, 0.0), ratio)
    # max_ratio[g] == 0 means every bucket the group occupies has zero
    # reference mass (collapsed reference quantiles can leave reference
    # buckets empty) — keep nothing from that group instead of dividing
    keep_p = {
        f"{g}|{b}": (
            1.0
            if g == reference_group
            else (ratio / max_ratio[g] if max_ratio[g] > 0.0 else 0.0)
        )
        for (g, b), ratio in ratios.items()
    }

    pmap = F.create_map(
        *[F.lit(x) for kv in keep_p.items() for x in (kv[0], float(kv[1]))]
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(16**8))
    )
    cell = F.concat(F.col(group_col).cast("string"), F.lit("|"), bucket)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("group"),
            F.col(value_col).alias("value"),
            bucket.alias("bucket"),
            F.coalesce(pmap[cell], F.lit(0.0)).alias("__p"),
        )
        .filter(u < F.col("__p"))
        .select("id", "group", "value", "bucket", F.round("__p", 6).alias("keep_p"))
    )
