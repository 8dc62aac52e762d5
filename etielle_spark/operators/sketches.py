"""Deterministic distinct-count sketches: K Minimum Values (KMV) and
HyperLogLog with engine-reproducible (md5) hashing.

Spark's ``approx_count_distinct`` is HyperLogLog++ — fast but its
register state is engine-internal, so an external oracle can't reproduce
the estimate.  KMV (Bar-Yossef et al. 2002) with an md5 hash is exactly
reproducible anywhere md5 exists: keep the k smallest normalized hash
values of the distinct items; the k-th smallest ``h_k`` estimates the
distinct count as ``(k - 1) / h_k``.  ``hll_distinct`` below is classic
HyperLogLog (Flajolet et al. 2007) over the same md5 hash — its register
state (bucket -> max leading-zero run) is a plain DataFrame, so sketches
for different days/partitions can be unioned and re-maxed before a single
final estimate (the mergeability KMV's per-group top-k lacks).

Scale shape: one distinct on (group, item) — a shuffle on spread keys
with map-side partial dedup — then a per-group TOP-K on the hash.  The
top-k uses a window row_number, which partial-aggregates poorly only for
pathological single-group inputs; group cardinality is the parallelism
unit, same as any per-group rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F, types as T
from ..session import ship_package

# 13 hex chars = 52 bits — exact in a double for both Spark and DuckDB.
_HEX_CHARS = 13
_DENOM = float(16**_HEX_CHARS)


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    *,
    k: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Per-group approximate distinct count of ``item_col`` via a
    k-minimum-values sketch over ``md5(item)``.

    Groups with fewer than ``k`` distinct items return the exact count
    (the sketch degenerates to the full hash set).  Returns
    ``(*group_cols, est_distinct)`` with the estimate rounded to
    ``round_to`` places.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    hashed = (
        df.select(*[F.col(c) for c in group_cols], F.col(item_col).alias("__item"))
        .filter(F.col("__item").isNotNull())
        .distinct()
        .select(
            *group_cols,
            (
                F.conv(
                    F.substring(F.md5(F.col("__item").cast("string")), 1, _HEX_CHARS),
                    16,
                    10,
                ).cast("double")
                / F.lit(_DENOM)
            ).alias("__h"),
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h").asc())
    topk = hashed.select(
        *group_cols, "__h", F.row_number().over(w).alias("__rk")
    ).filter(F.col("__rk") <= k)
    return topk.groupBy(*group_cols).agg(
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(float(k - 1))) / F.max("__h")),
            round_to,
        ).alias("est_distinct")
    )


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    *,
    group_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 256,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` items by Count-Min-Sketch estimated frequency
    (Cormode & Muthukrishnan 2005), md5-hashed so the sketch state is
    engine-reproducible.

    Two passes, both sketch-sized after the first shuffle:

    1. Build the sketch: each occurrence increments ``depth`` counters at
       ``md5(row || '|' || item) % width`` — a groupBy on (row, bucket)
       whose output is at most ``depth * width`` rows regardless of input
       size (THE point of a sketch: fixed-size summary of an unbounded
       stream).
    2. Estimate: distinct items recompute their buckets, broadcast-join
       the tiny sketch, and take the min counter across rows; the final
       top-k is an ``orderBy(...).limit(k)`` — Spark's distributed
       TakeOrdered, no single-task window.

    CMS overestimates under collisions (never underestimates), so the
    returned ``est_count >= true count``; ties broken by item ascending.
    Returns ``(item, est_count)`` — with ``group_cols``, per-group top-k
    ``(*group_cols, item, est_count)``: one sketch PER GROUP, so the
    state is |groups| x depth x width no matter how many occurrences a
    group has (the per-source hot-terms / hot-domains report at 100 TB).
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    groups = group_cols or []

    occurrences = df.select(
        *groups, F.col(item_col).cast("string").alias("__item")
    ).filter(F.col("__item").isNotNull())
    for g in groups:
        # NULL group keys would write register weight the estimate
        # equi-join can never surface (NULL never equals NULL there) —
        # drop them at the source like the drift family does
        occurrences = occurrences.filter(F.col(g).isNotNull())
    sketch = cms_cells(occurrences, groups, depth=depth, width=width)
    return cms_estimate_topk(
        sketch, occurrences.distinct(), groups, depth=depth, width=width, k=k
    )


def cms_bucket(j: int, col, width: int):
    """The CMS row-``j`` bucket of a string column — md5-based so sketch
    state is engine- and session-reproducible (the batch op and the
    streaming monitor MUST hash identically for their differential)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}|"), col)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def _cms_cells_of(frame: DataFrame, groups: list[str], depth: int, width: int):
    # keeps every input column (callers pass (*groups, __item) plus an
    # optional pre-aggregated count) and appends the depth exploded
    # (j, b) bucket structs
    return frame.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(j, F.col("__item"), width).alias("b"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("c"),
    )


def cms_cells(
    occurrences: DataFrame, groups: list[str], *, depth: int, width: int
) -> DataFrame:
    """The Count-Min sketch of an ``(*groups, __item)`` occurrence frame:
    ``(*groups, j, b, cnt)`` — at most ``|groups| * depth * width`` rows
    regardless of input size.  Counts are ADDITIVE, so sum-merging the
    sketches of disjoint slices equals the sketch of their union (what
    the streaming monitor's register merge relies on).

    Occurrences are pre-aggregated to ``(*groups, __item, count)`` BEFORE
    the depth-way bucket explode: the md5 bucket hash and the exploded
    rows then cost ``depth × distinct items`` instead of ``depth ×
    occurrences`` (token streams repeat items heavily), and the per-item
    partial aggregation combines map-side.  ``sum`` of per-item counts
    per cell equals the per-occurrence ``count`` exactly — same sketch,
    bit for bit.

    Trade-off, stated honestly: the pre-aggregation is one
    wordcount-shaped shuffle of the distinct ``(groups, item)`` set.  On
    repeat-heavy streams (tokens, domains — what a heavy-hitters sketch
    exists for) that set is vocabulary-sized and the md5 savings
    dominate; on a near-unique item stream it shuffles ~every row where
    the old per-occurrence form shuffled only bounded partial cells.
    CMS callers are the former by construction."""
    counts = occurrences.groupBy(*groups, "__item").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return (
        _cms_cells_of(counts, groups, depth, width)
        .select(*groups, "c.j", "c.b", "__c")
        .groupBy(*groups, "j", "b")
        .agg(F.sum("__c").alias("cnt"))
    )


def cms_estimate_topk(
    sketch: DataFrame,
    candidates: DataFrame,
    groups: list[str],
    *,
    depth: int,
    width: int,
    k: int,
) -> DataFrame:
    """Top-``k`` of a candidate ``(*groups, __item)`` frame by CMS
    estimate (min counter across the ``depth`` rows) against a
    ``(*groups, j, b, cnt)`` sketch; ties broken by item ascending.

    Candidate schema contract: extra candidate columns pass through the
    sketch join, so the names ``cnt``, ``__j``, ``__b`` and ``__g_<g>``
    for each group column are RESERVED — a candidates frame carrying one
    collides at the join or the min aggregation and raises."""
    reserved = {"cnt", "__j", "__b"} | {f"__g_{g}" for g in groups}
    clash = reserved.intersection(candidates.columns)
    if clash:
        raise ValueError(
            f"cms_estimate_topk: candidate column(s) {sorted(clash)} collide "
            "with reserved sketch-join names; rename them before the call"
        )
    skt = sketch.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("j").alias("__j"),
        F.col("b").alias("__b"),
        "cnt",
    )
    cond = (F.col("c.j") == F.col("__j")) & (F.col("c.b") == F.col("__b"))
    for g in groups:
        cond = cond & (F.col(g) == F.col(f"__g_{g}"))
    distinct_cells = _cms_cells_of(candidates, groups, depth, width)
    est = (
        distinct_cells.join(F.broadcast(skt), cond)
        .groupBy(*groups, "__item")
        .agg(F.min("cnt").alias("est_count"))
    )
    if not groups:
        return (
            est.orderBy(F.col("est_count").desc(), F.col("__item").asc())
            .limit(k)
            .select(F.col("__item").alias("item"), "est_count")
        )
    w = Window.partitionBy(*groups).orderBy(
        F.col("est_count").desc(), F.col("__item").asc()
    )
    return (
        est.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .select(*groups, F.col("__item").alias("item"), "est_count")
    )


def _rho_col(hexcol) -> "F.Column":
    """Leading-zero-run length (+1) of the 52-bit value encoded by 13 hex
    chars, computed on the hex STRING so no float log2 boundary can
    disagree between engines: count leading '0' chars, then split the
    first non-zero nibble by value."""
    lz_nibbles = F.length(F.regexp_extract(hexcol, "^(0*)", 1))
    nib = F.conv(F.substring(hexcol, (lz_nibbles + 1).cast("int"), 1), 16, 10).cast(
        "int"
    )
    extra = (
        F.when(nib >= 8, 0)
        .when(nib >= 4, 1)
        .when(nib >= 2, 2)
        .otherwise(3)
    )
    return F.when(lz_nibbles == _HEX_CHARS, F.lit(4 * _HEX_CHARS + 1)).otherwise(
        lz_nibbles * 4 + extra + 1
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    *,
    bucket_hex: int = 3,
) -> DataFrame:
    """HyperLogLog register state per group: ``(*group_cols, bucket, rho)``
    with ``rho`` = max leading-zero run (+1) among items hashing to the
    bucket.  ``m = 16**bucket_hex`` buckets from the first ``bucket_hex``
    hex chars of md5(item); the run length comes from the NEXT 13 chars.

    This is the mergeable form: union register frames from multiple
    partitions/days and ``groupBy(bucket).agg(max(rho))`` before
    ``hll_estimate``.  Scale shape: one groupBy whose output is at most
    ``m`` rows per group no matter the input size.
    """
    h = F.md5(F.col(item_col).cast("string"))
    return (
        df.filter(F.col(item_col).isNotNull())
        .select(
            *group_cols,
            F.conv(F.substring(h, 1, bucket_hex), 16, 10).cast("long").alias("bucket"),
            _rho_col(F.substring(h, bucket_hex + 1, _HEX_CHARS)).alias("__rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    *,
    bucket_hex: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Collapse HLL register state to ``(*group_cols, est_distinct)``.

    Standard HLL: ``E = alpha_m * m^2 / Z`` with empty registers
    contributing ``2^0 = 1`` to ``Z``; small-range correction switches to
    linear counting ``m * ln(m / V)`` when ``E <= 2.5 m`` and some
    register is empty.  Pure arithmetic on the tiny register frame.
    """
    m = 16**bucket_hex
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__z_used"),
        F.count(F.lit(1)).alias("__nreg"),
    )
    z = F.col("__z_used") + (F.lit(float(m)) - F.col("__nreg"))
    raw = F.lit(alpha * m * m) / z
    v = F.lit(float(m)) - F.col("__nreg")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, round_to).alias("est_distinct")
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    *,
    bucket_hex: int = 3,
    round_to: int = 4,
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate: ``hll_registers`` then
    ``hll_estimate`` as one plan (register state never leaves the DAG)."""
    return hll_estimate(
        hll_registers(df, group_cols, item_col, bucket_hex=bucket_hex),
        group_cols,
        bucket_hex=bucket_hex,
        round_to=round_to,
    )


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    item_col: str,
    *,
    k: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Pairwise audience overlap between every two groups from KMV
    sketches — union size, Jaccard, and intersection estimates without
    ever joining the raw item sets.

    The KMV set-operation identity (Beyer et al. 2007): the union sketch
    of A and B is the k smallest hashes of ``topk(A) ∪ topk(B)``; with
    ``x`` = how many of those appear in BOTH top-k sets,
    ``jaccard = x / k'`` and ``intersection = jaccard * union_est``
    (``k'`` = union sketch size, < k for small groups where estimates
    degenerate to exact).

    Scale shape: the raw data is touched ONCE (distinct + per-group
    top-k, exactly ``kmv_distinct``'s plan); everything pairwise
    operates on |groups| x k sketch rows — at 100 TB that is the whole
    point, audience-overlap matrices come from sketch algebra, not
    |A| x |B| joins.  The pair frame is |groups|^2 and broadcasts.

    Returns ``(group_a, group_b, union_est, jaccard, intersect_est)``
    for every unordered pair, ``group_a < group_b``.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    hashed = (
        df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("__item"))
        .filter(F.col("__item").isNotNull())
        .distinct()
        .select(
            "__g",
            (
                F.conv(
                    F.substring(F.md5(F.col("__item").cast("string")), 1, _HEX_CHARS),
                    16,
                    10,
                ).cast("double")
                / F.lit(_DENOM)
            ).alias("__h"),
        )
    )
    w = Window.partitionBy("__g").orderBy(F.col("__h").asc())
    topk = (
        hashed.select("__g", "__h", F.row_number().over(w).alias("__rk"))
        .filter(F.col("__rk") <= k)
        .select("__g", "__h")
    )

    groups = topk.select("__g").distinct()
    pairs = (
        groups.select(F.col("__g").alias("group_a"))
        .crossJoin(groups.select(F.col("__g").alias("group_b")))
        .filter(F.col("group_a") < F.col("group_b"))
    )
    side_a = pairs.join(
        topk.select(F.col("__g").alias("group_a"), "__h"), "group_a"
    ).select("group_a", "group_b", "__h", F.lit(1).alias("__in_a"), F.lit(0).alias("__in_b"))
    side_b = pairs.join(
        topk.select(F.col("__g").alias("group_b"), "__h"), "group_b"
    ).select("group_a", "group_b", "__h", F.lit(0).alias("__in_a"), F.lit(1).alias("__in_b"))
    merged = (
        side_a.unionByName(side_b)
        .groupBy("group_a", "group_b", "__h")
        .agg(F.max("__in_a").alias("__a"), F.max("__in_b").alias("__b"))
    )
    wp = Window.partitionBy("group_a", "group_b").orderBy(F.col("__h").asc())
    union_topk = merged.select(
        "group_a", "group_b", "__h", "__a", "__b", F.row_number().over(wp).alias("__rk")
    ).filter(F.col("__rk") <= k)

    kp = F.count(F.lit(1)).cast("double")
    union_est = F.when(kp < k, kp).otherwise(F.lit(float(k - 1)) / F.max("__h"))
    x = F.sum(F.col("__a") * F.col("__b")).cast("double")
    return union_topk.groupBy("group_a", "group_b").agg(
        F.round(union_est, round_to).alias("union_est"),
        F.round(x / kp, round_to).alias("jaccard"),
        F.round((x / kp) * union_est, round_to).alias("intersect_est"),
    )


# ---------------------------------------------------------------------------
# Distributed Bloom filter as a plain DataFrame of bitmap words.
#
# Spark's own BloomFilterAggregate is JVM-internal (not in the SQL
# function registry), and a driver-side sketch object can't be unioned,
# inspected, or persisted as data.  Here the filter IS a DataFrame of
# (word_idx, word) pairs — at most num_bits/64 rows — so it broadcasts
# through a normal join, merges across corpus increments with
# union + bit_or, and round-trips through parquet like any other table.
#
# Bit layout: position p_i(key) = pmod(xxhash64(key, i), num_bits) for
# i in 0..num_hashes-1; word_idx = p / 64, mask = 1L << (p % 64).
# Build is a map + one bit_or aggregation on word_idx (<= num_bits/64
# groups).  Probe joins the (tiny) words table and AND-folds the k bit
# tests per key.  A 2^30-bit filter (~1e8 keys at 1% FP) is 16M words
# = 128 MB — broadcastable; beyond that the word_idx equi-join simply
# shuffles, still never materializing pairs.
#
# Sibling: plans/bloom.py embeds a SMALL (<= 2^24 bits) bitmap as a plan
# LITERAL to prune a fact scan before a dimension join — ephemeral,
# per-query.  This one is the corpus-lifetime variant: bigger, stored
# and merged as data, reused across ingest batches
# (streaming/incremental_dedup.py).
# ---------------------------------------------------------------------------


def _bloom_positions(key: "F.Column", num_bits: int, num_hashes: int):
    """The k bit positions of a key: pmod(xxhash64(key, i), num_bits)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
) -> DataFrame:
    """Build a Bloom filter over ``df[key_col]`` as a DataFrame of
    ``(word_idx: long, word: long)`` bitmap words (NULL keys are skipped
    — NULL is never "in" the filter, matching SQL membership semantics).

    One narrow map (k positions per key) + one aggregation keyed on
    word_idx.  The output has at most ``num_bits / 64`` rows regardless
    of corpus size, so a filter built over billions of keys stays a
    broadcast-sized table; incremental corpora union their word tables
    and re-``bit_or`` to merge.
    """
    if num_bits % 64 != 0 or num_bits <= 0:
        raise ValueError("bloom_build: num_bits must be a positive multiple of 64")
    if num_hashes < 1:
        raise ValueError("bloom_build: num_hashes must be >= 1")
    pos = F.explode(
        F.array(*_bloom_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("__pos")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("__pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def bloom_probe(
    probe: DataFrame,
    words: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
    flag: str = "might_contain",
    engine: str = "auto",
) -> DataFrame:
    """Append ``flag`` to ``probe``: True iff all ``num_hashes`` bits of
    ``probe[key_col]`` are set in the ``words`` filter (so False is a
    guarantee of absence; True may be a false positive at the filter's
    designed rate).  NULL keys probe False.  num_bits/num_hashes must
    match the build call.

    Three engines, all exact on the same layout:

    - ``"broadcast"`` (the ``auto`` pick up to 2^30 bits / 128 MB):
      num_hashes chained BroadcastHashJoins on word_idx — whole-stage
      codegen end to end, zero Python, zero shuffle on the probe side,
      which is the entire point of a Bloom prefilter on a wide 100 TB
      scan.
    - ``"bitmap"``: map-only pandas path — the word table collapses
      into a numpy bitmap closed over by a mapInPandas op (positions
      stay JVM-computed, the k bit tests are one vectorized gather per
      batch).  Same shuffle-free shape, pays one Arrow roundtrip; kept
      as the differential twin and for pandas-resident pipelines.
    - ``"join"``: distinct keys -> posexplode -> words equi-join ->
      AND-fold.  The only engine that never materializes the filter on
      one machine — use it when num_bits is too big to broadcast.
    """
    if engine not in ("auto", "broadcast", "bitmap", "join"):
        raise ValueError(f"bloom_probe: unknown engine {engine!r}")
    if engine == "auto":
        # broadcast ships the words table once PER JOIN (the k aliased
        # build sides don't canonicalize equal, so no exchange reuse) —
        # keep it for filters where k copies are still cheap; bitmap
        # ships one numpy array per worker, so it carries the mid range;
        # beyond driver-collectable, stay fully distributed.
        if num_bits <= (1 << 26):  # <= 8 MB words, k copies ~tens of MB
            engine = "broadcast"
        elif num_bits <= (1 << 30):  # <= 128 MB bitmap, shipped once
            engine = "bitmap"
        else:
            engine = "join"

    if engine == "broadcast":
        out = probe
        hit = F.lit(True)
        for i, p in enumerate(
            _bloom_positions(F.col(key_col), num_bits, num_hashes)
        ):
            w = words.select(
                F.col("word_idx").alias(f"__wi{i}"),
                F.col("word").alias(f"__w{i}"),
            )
            pos = F.when(F.col(key_col).isNotNull(), p)
            out = out.withColumn(f"__pos{i}", pos).join(
                F.broadcast(w),
                (F.col(f"__pos{i}") / 64).cast("long") == F.col(f"__wi{i}"),
                "left",
            )
            mask = F.expr(f"shiftleft(1L, cast(__pos{i} % 64 as int))")
            hit = hit & (F.col(f"__w{i}").bitwiseAND(mask) == mask)
        return out.withColumn(flag, F.coalesce(hit, F.lit(False))).drop(
            *[c for i in range(num_hashes) for c in (f"__pos{i}", f"__wi{i}", f"__w{i}")]
        )

    if engine == "bitmap":
        import numpy as np
        import pandas as pd
        from typing import Iterator

        wp = words.toPandas()
        bitmap = np.zeros(num_bits // 64, dtype=np.uint64)
        bitmap[wp["word_idx"].to_numpy(dtype=np.int64)] = (
            wp["word"].to_numpy(dtype=np.int64).view(np.uint64)
        )

        # k separate long columns (NOT one array column): the pandas
        # batch then holds plain int64 columns and the whole bit test is
        # numpy column ops — zero per-row Python.  xxhash64 skips NULL
        # inputs (it would hash as seed-only), so NULL keys null their
        # position columns and probe False.
        pos_cols = [
            F.when(F.col(key_col).isNotNull(), p).alias(f"__pos{i}")
            for i, p in enumerate(
                _bloom_positions(F.col(key_col), num_bits, num_hashes)
            )
        ]
        with_pos = probe.select("*", *pos_cols)
        out_schema = T.StructType(
            list(probe.schema.fields) + [T.StructField(flag, T.BooleanType())]
        )
        pos_names = [f"__pos{i}" for i in range(num_hashes)]

        def op(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
            for pdf in batches:
                valid = pdf[pos_names[0]].notna().to_numpy()
                ok = np.zeros(len(pdf), dtype=bool)
                if valid.any():
                    mat = np.column_stack(
                        [
                            pdf[c].to_numpy(dtype="float64")[valid].astype(
                                np.int64
                            )
                            for c in pos_names
                        ]
                    )
                    idx = mat >> 6
                    msk = np.uint64(1) << (mat & 63).astype(np.uint64)
                    hit = (bitmap[idx] & msk) != 0
                    ok[valid] = hit.all(axis=1)
                res = pdf.drop(columns=pos_names)
                res[flag] = ok
                yield res

        ship_package(with_pos)
        return with_pos.mapInPandas(op, out_schema)

    tested = (
        probe.select(F.col(key_col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
        .select(
            "__k",
            F.posexplode(
                F.array(*_bloom_positions(F.col("__k"), num_bits, num_hashes))
            ).alias("__i", "__pos"),
        )
        .select(
            "__k",
            (F.col("__pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(__pos % 64 as int))").alias("__mask"),
        )
        # NO broadcast hint: this engine exists for filters too big to
        # materialize on one machine (auto picks it past 2^30 bits =
        # 128 MB of words), so let the optimizer choose — AQE will
        # downgrade the word_idx shuffle join to a broadcast when the
        # filter measures small, and only then.
        .join(words, "word_idx", "left")
        .groupBy("__k")
        .agg(
            F.min(
                F.coalesce(
                    F.col("word").bitwiseAND(F.col("__mask")) == F.col("__mask"),
                    F.lit(False),
                )
            ).alias("__might")
        )
    )
    return (
        probe.join(tested, probe[key_col] == tested["__k"], "left")
        .drop("__k")
        .withColumn(flag, F.coalesce("__might", F.lit(False)))
        .drop("__might")
    )


def bloom_anti_join(
    new: DataFrame,
    reference: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 22,
    num_hashes: int = 5,
    words: DataFrame | None = None,
    engine: str = "auto",
) -> DataFrame:
    """EXACT anti join (rows of ``new`` whose key is absent from
    ``reference``) with a Bloom prefilter: the "is this crawl record
    already in the 100 TB corpus?" fast path.

    Rows whose key misses the filter are *definitely* new and skip the
    wide join entirely (the map-only bitmap probe — see bloom_probe —
    never shuffles them); only the filter-positive sliver (true matches
    + the designed false-positive fraction) pays the exact left-anti
    shuffle against the reference keys.  Output is exact — the filter
    only prunes, never decides — so the oracle is a plain ANTI JOIN.
    NULL-keyed rows are kept, matching left_anti's NULL semantics
    (NULL = no match).

    The win over a plain anti join is proportional to the novel
    fraction: novel rows skip the key shuffle entirely.  When the
    reference is small enough to broadcast outright a plain anti join
    is already shuffle-free — use that; this operator targets the
    regime where neither side broadcasts.  Pass a prebuilt ``words``
    table (from :func:`bloom_build`, e.g. maintained across ingest
    batches) to skip rebuilding the filter per call — the amortized
    shape IncrementalExactDedup uses.
    """
    if words is None:
        words = bloom_build(
            reference, key_col, num_bits=num_bits, num_hashes=num_hashes
        )
    flagged = bloom_probe(
        new,
        words,
        key_col,
        num_bits=num_bits,
        num_hashes=num_hashes,
        flag="__bf",
        engine=engine,
    )
    definite_new = flagged.filter(~F.col("__bf")).drop("__bf")
    candidates = flagged.filter(F.col("__bf")).drop("__bf")
    ref_keys = reference.select(F.col(key_col)).filter(
        F.col(key_col).isNotNull()
    ).distinct()
    confirmed_new = candidates.join(ref_keys, [key_col], "left_anti")
    return definite_new.unionByName(confirmed_new)
