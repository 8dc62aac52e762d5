"""Bloom-filter join pruning: filter a huge fact side down to
probably-matching keys BEFORE the join shuffle.

Spark's own runtime bloom filter (``spark.sql.optimizer.runtime.bloomFilter
.enabled``) injects this automatically for shuffle joins under size
heuristics; this module is the explicit, declarative version for when the
build side is known-small and you want the prune guaranteed (and visible
in the plan) rather than heuristic — e.g. a 100 TB fact table joined to a
filtered dimension where only 1% of fact rows survive.

The bitmap is built with ONE Spark job over the dim side that returns at
most ``n_bits`` distinct bit positions to the driver (bounded regardless
of dim cardinality), then embedded as a literal ``array<long>`` in the
fact-side filter — pure codegen bit tests, no UDF, no extra shuffle.
False positives only (never false negatives), so composing with the exact
join afterwards yields exactly the plain-join result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _positions(key: Column, n_bits: int, k: int) -> list[Column]:
    """k bit positions per key: xxhash64 with per-probe seeds, mod n_bits.

    ``pmod`` (not ``%``): xxhash64 is signed and a negative bit position
    would index outside the bitmap.
    """
    return [
        F.pmod(F.xxhash64(key, F.lit(j)), F.lit(n_bits)).cast("long")
        for j in range(k)
    ]


def bloom_bitmap(
    dim: DataFrame,
    dim_key: str,
    *,
    n_bits: int = 1 << 16,
    k: int = 3,
    max_saturation: float = 0.5,
) -> list[int]:
    """Build the bloom bitmap (list of 64-bit words, little-endian bit
    order within each word) from the dim side's join keys.

    One distributed job: explode each key into its k positions, distinct
    them (bounded by ``n_bits`` rows), collect.  The returned list has
    ``n_bits / 64`` words (~8 KB at the default 65,536 bits) — small
    enough to embed as a plan literal and ship with every task.

    Size guards (the round-2 VERDICT's lookup-style cap): ``n_bits`` is
    capped at 2^24 (a bigger literal bitmap bloats every task's plan —
    if the build side needs more, it is not a dimension; use
    plans.skew.smart_join or a plain shuffle join).  After the build,
    a bitmap more than ``max_saturation`` full is rejected for the same
    reason: a saturated bloom passes nearly every fact row, so the
    prune is pure overhead — the build side has outgrown the filter.
    """
    if n_bits % 64 != 0:
        raise ValueError("bloom_bitmap: n_bits must be a multiple of 64")
    if n_bits > 1 << 24:
        raise ValueError(
            f"bloom_bitmap: n_bits={n_bits} exceeds the 2^24 plan-literal "
            "cap; a build side needing a bigger bloom is not a dimension "
            "— use plans.skew.smart_join (or a plain shuffle join) instead"
        )
    pos_rows = (
        dim.select(
            F.explode(F.array(*_positions(F.col(dim_key), n_bits, k))).alias("p")
        )
        .distinct()
        .collect()
    )
    if len(pos_rows) > max_saturation * n_bits:
        raise ValueError(
            f"bloom_bitmap: {len(pos_rows)}/{n_bits} bits set exceeds "
            f"max_saturation={max_saturation} — the build side is too "
            "large for this bitmap, so the prune would pass almost "
            "every row; raise n_bits, or use plans.skew.smart_join "
            "(or a plain shuffle join) for a non-dimension build side"
        )
    words = [0] * (n_bits // 64)
    for r in pos_rows:
        p = r["p"]
        words[p >> 6] |= 1 << (p & 63)
    return words


def bloom_filter_col(
    key: Column, words: list[int], *, k: int = 3
) -> Column:
    """Predicate: all k bit positions of ``key`` are set in the bitmap.

    Compiles to literal-array lookups + bitwise AND against a 64-entry
    mask array (PySpark's shift functions take only literal shift
    amounts, so the mask per bit-in-word is table-looked-up instead);
    whole-stage codegen, no UDF.  Words and masks are signed-wrapped
    for Spark's long type.
    """

    def signed(w: int) -> int:
        return w - (1 << 64) if w >= (1 << 63) else w

    n_bits = len(words) * 64
    # one SQL-text literal array per table (a 64 KiB filter is 1024
    # words = 1024 py4j literal calls the Column API way — ~1 s of
    # driver time per plan); CAST from string parses the full signed
    # long range including -2^63, and folds to a plain literal
    lit_words = F.expr(
        "array("
        + ", ".join(f"CAST('{signed(w)}' AS BIGINT)" for w in words)
        + ")"
    )
    masks = F.expr(
        "array("
        + ", ".join(f"CAST('{signed(1 << b)}' AS BIGINT)" for b in range(64))
        + ")"
    )
    cond = F.lit(True)
    for p in _positions(key, n_bits, k):
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        mask = F.element_at(masks, F.pmod(p, F.lit(64)).cast("int") + 1)
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    *,
    n_bits: int = 1 << 16,
    k: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Exact join with a bloom pre-prune on the fact side.

    Result is identical to ``fact.join(dim, fact[fact_key] == dim[dim_key],
    how)`` for inner/semi joins (bloom passes every true match); the win
    is that fact rows failing the bitmap test are dropped AT THE SCAN,
    before the join shuffle — on a selective dim the shuffle shrinks by
    orders of magnitude.  The join strategy itself is left to AQE: the
    bitmap is bounded by ``n_bits`` no matter how large the dim is, so a
    bitmappable dim is NOT automatically a broadcastable one.
    """
    words = bloom_bitmap(dim, dim_key, n_bits=n_bits, k=k)
    pruned = fact.filter(bloom_filter_col(F.col(fact_key), words, k=k))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
