"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of every query against the
  corpus.  The dot product is a JVM-side ``zip_with``/``aggregate`` fold —
  no Python in the loop; the per-query top-k is a window over a
  (query × corpus) join that Spark executes as a broadcast of the (small)
  query side against the (huge) corpus side, so the corpus is streamed
  once.  This is the correctness baseline.
- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH buckets
  (deterministic md5-derived hyperplanes) shrink the candidate set from
  |corpus| to the query's bucket (plus multi-probe neighbors), trading
  recall for a shuffle-free bucketed join.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql import types as T
from ..session import ship_package


# "Small by contract" broadcast sides get ENFORCED bounds (the
# lookup()-10k idiom, transforms.py:413): an oversized query frame must
# fail with an actionable error at plan-build time, not an executor OOM
# mid-broadcast.  Row caps, not bytes: ~100k raw query vectors (64-dim
# doubles ~= 50 MB) / ~2M LUT rows (~80 MB) — comfortably under default
# executor memory with headroom for the rest of the stage.
MAX_BROADCAST_QUERY_ROWS = 100_000
MAX_BROADCAST_LUT_ROWS = 2_000_000


def _guard_small_side(df: DataFrame, max_rows: int, what: str) -> None:
    """Bounded existence check — ``limit(max+1).count()`` never scans
    meaningfully past the cap — raising the shard hint on violation."""
    if df.limit(max_rows + 1).count() > max_rows:
        raise ValueError(
            f"{what}: the query side exceeds {max_rows} rows but is "
            "broadcast by contract — shard your query set (loop over "
            "slices and union the per-slice top-k) instead of handing "
            "the whole frame to one broadcast"
        )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


# -- SQL-text expression builders --------------------------------------------
#
# Codebook-literal expressions (one cosine per centroid, each with its own
# literal array) built through the Column API cost thousands of py4j round
# trips PER PLAN — measured 6.4 s of pure driver-side plan construction for
# one nlist=16 x dim=64 cell assignment, re-paid on EVERY add()/query()
# micro-batch.  Rendering the identical expression as one SQL string and
# parsing it JVM-side (`F.expr`) is a single round trip.  `_dlit` renders a
# bit-exact double literal: Python `repr` of a float round-trips, and so
# does Spark's string->double cast, so the parsed literal is the same IEEE
# value `F.lit` would have produced (the cast folds to a plain literal at
# analysis time).


_DLIT_RE = re.compile(r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")


def _dlit(x: float) -> str:
    r = repr(float(x))
    if _DLIT_RE.match(r):
        # direct double literal ('1.5D', '1e-05D'): one parse node; the
        # lexed value is the same IEEE double repr() round-trips to
        return r + "D"
    return f"CAST('{r}' AS DOUBLE)"  # inf/nan and any odd rendering


def _darr(vals: list[float]) -> str:
    return "array(" + ", ".join(_dlit(v) for v in vals) + ")"


def _sql_dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"{_dlit(0.0)}, (acc, v) -> acc + v)"
    )


def _sql_norm(a: str) -> str:
    return f"sqrt(aggregate({a}, {_dlit(0.0)}, (acc, v) -> acc + v * v))"


def _sql_sq_l2(a: str, b: str, round_to: int = 6) -> str:
    return (
        f"round(aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
        f"{_dlit(0.0)}, (acc, x) -> acc + x), {int(round_to)})"
    )


def _sql_pq_lut(
    codebooks: list[list[tuple[int, list[float]]]], vec: str, round_to: int = 6
) -> str:
    """Flat ``array<struct<subspace:bigint, code:bigint, d>>``: rounded
    squared-L2 of ``vec``'s j-th slice to every centroid of subspace j —
    the ADC lookup table rendered as one SQL-text expression (m lambdas
    total instead of m x n_centroids literal subtrees)."""
    parts = []
    off = 0
    for j, cb in enumerate(codebooks):
        w = len(cb[0][1])
        cbarr = (
            "array("
            + ", ".join(
                f"named_struct('code', {int(ci)}L, 'cv', {_darr(cvec)})"
                for ci, cvec in cb
            )
            + ")"
        )
        d = _sql_sq_l2(f"slice(`{vec}`, {off + 1}, {w})", "e.cv", round_to)
        parts.append(
            f"transform({cbarr}, e -> named_struct("
            f"'subspace', {j}L, 'code', e.code, 'd', {d}))"
        )
        off += w
    return "flatten(array(" + ", ".join(parts) + "))"


def _sql_pq_best(
    codebooks: list[list[tuple[int, list[float]]]], vec: str, round_to: int = 6
) -> str:
    """``array<struct<j:bigint, b:struct<d, code:int>>>`` (length m): the
    per-subspace nearest centroid of ``vec``'s slices — argmin by
    ``(d, code)``, the :func:`pq_codes` tie-break."""
    parts = []
    off = 0
    for j, cb in enumerate(codebooks):
        w = len(cb[0][1])
        cbarr = (
            "array("
            + ", ".join(
                f"named_struct('code', {int(ci)}, 'cv', {_darr(cvec)})"
                for ci, cvec in cb
            )
            + ")"
        )
        d = _sql_sq_l2(f"slice(`{vec}`, {off + 1}, {w})", "e.cv", round_to)
        best = (
            f"array_min(transform({cbarr}, "
            f"e -> named_struct('d', {d}, 'code', e.code)))"
        )
        parts.append(f"named_struct('j', {j}L, 'b', {best})")
        off += w
    return "array(" + ", ".join(parts) + ")"


def _hyperplane_vals(plane: int, dim: int) -> list[float]:
    """The md5-parity ±1 components :func:`_hyperplane` embeds as
    literals, as a Python list (for SQL-text rendering)."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{plane}|{d}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1.0
        for d in range(dim)
    ]


def _sql_hyperplanes(planes: int, dim: int) -> str:
    """Literal array of the first ``planes`` hyperplane vectors."""
    return (
        "array("
        + ", ".join(_darr(_hyperplane_vals(p, dim)) for p in range(planes))
        + ")"
    )


def _bucket_bits(vec: str, planes: int, dim: int) -> Column:
    """Sign-random-projection bucket string ('1'/'0' per plane) as one
    SQL-text expression — same bits as the per-plane
    ``concat(when(dot >= 0, ...))`` construction, built in one py4j
    round trip instead of ``planes * dim`` literal calls."""
    hp = _sql_hyperplanes(planes, dim)
    bit = f"CASE WHEN {_sql_dot(f'`{vec}`', 'h')} >= 0 THEN '1' ELSE '0' END"
    return F.expr(f"array_join(transform({hp}, h -> {bit}), '')")


def _seed_vectors(
    df: DataFrame, id_col: str, vec_col: str, n: int, salt: str | None = None
) -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random seed sample: the ``n`` vectors with the
    smallest ``md5(cast(id as string))`` (ties -> smaller id), numbered
    0..n-1 in that hash order.

    Hash-ordered (not smallest-id) because real corpora cluster by id
    adjacency — near-duplicate runs, per-source id ranges — and seeding
    centroids from one id neighborhood collapses every vector into a
    couple of cells, turning the within-cell work quadratic.  md5 ordering
    decorrelates the sample from ingestion order, is engine-independent
    (DuckDB: ``ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id``), and the
    ``orderBy().limit()`` compiles to a parallel partial top-k, not a
    global sort.
    """
    vec = F.col(vec_col).cast("array<double>")
    rows = (
        df.select(F.col(id_col), vec.alias("__sv"))
        # unscorable vectors (NULL / empty / NULL element) can never be
        # centroids — skip them instead of crashing the driver-side
        # list() below (clean corpora are unaffected: same sample)
        .filter(
            F.col("__sv").isNotNull()
            & (F.size("__sv") > 0)
            & ~F.exists("__sv", lambda x: x.isNull())
        )
        # `salt` decorrelates TWO samples drawn from related frames — the
        # IVF-PQ index must not seed its residual codebook from the same
        # ids as its cell codebook (a cell seed's residual vs its own
        # cell is exactly zero, which once collapsed every PQ centroid
        # to the zero vector and every code to 0)
        .orderBy(
            F.md5(
                F.concat(F.col(id_col).cast("string"), F.lit(salt))
                if salt
                else F.col(id_col).cast("string")
            ),
            F.col(id_col),
        )
        .limit(n)
        .collect()
    )
    return [(i, list(r[1])) for i, r in enumerate(rows)]


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_pairs(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
) -> DataFrame:
    """All pairs with cosine similarity >= threshold (embedding near-dup).

    All-pairs is quadratic by definition; at scale use
    ``lsh_bucket_topk``-style bucketing first.  Kept exact here as the
    dedup-by-embedding correctness baseline.
    """
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    round_cosine: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus is
    scanned once.  Ties break on neighbor id for determinism;
    ``round_cosine`` rounds BEFORE ranking (the ivf_topk idiom) so ties
    resolve identically across engines/shardings.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    _guard_small_side(q, MAX_BROADCAST_QUERY_ROWS, "brute_force_topk")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    cos = cosine(F.col("qv"), F.col("cv"))
    if round_cosine is not None:
        cos = F.round(cos, round_cosine)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _shard_loop(
    queries: DataFrame,
    id_col: str,
    shard_rows: int,
    max_shards: int,
    run_shard,
    *,
    what: str,
    too_many_hint: str,
):
    """Shared driver-paced shard harness (topk_sharded and
    PersistentIVFIndex.query_sharded): hash-split ``queries`` into
    shards whose EXPECTED size is ``shard_rows``, run ``run_shard`` per
    shard, union.  Hash shards are balanced only in expectation, so
    callers must pass ``shard_rows`` with slack below the hard
    broadcast cap (the public defaults use cap/2 — a shard would need
    2x the mean to trip the guard, vanishingly unlikely for distinct
    ids at these sizes).  The sharded frame is persisted so the
    n_shards filters (and the per-shard guard probes inside the ops)
    scan the query lineage once, not n_shards times."""
    if shard_rows < 1:
        raise ValueError(f"shard_rows must be >= 1, got {shard_rows}")
    nq = queries.count()
    n_shards = max(1, -(-nq // shard_rows))
    if n_shards > max_shards:
        raise ValueError(
            f"{what}: {nq} queries need {n_shards} shards of "
            f"{shard_rows} (max_shards={max_shards}) — {too_many_hint}"
        )
    if n_shards == 1:
        return run_shard(queries)
    sharded = queries.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    ).persist()
    parts = [
        run_shard(sharded.filter(F.col("__shard") == s).drop("__shard"))
        for s in range(n_shards)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def topk_sharded(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    op=None,
    shard_rows: int | None = None,
    max_shards: int = 64,
    **op_kwargs,
) -> DataFrame:
    """Driver-paced sharding for a large QUERY set over any broadcast-
    contract top-k operator — the API form of the guard's "shard your
    query set" hint.

    The broadcast operators (:func:`brute_force_topk`, :func:`ivf_topk`,
    :func:`lsh_bucket_topk`) cap their query side at
    ``MAX_BROADCAST_QUERY_ROWS`` because the query frame rides a
    broadcast.  When the query set is genuinely large, the scalable
    shape is a loop of bounded broadcasts: split queries into hash
    shards of at most ``shard_rows`` (default: the cap), run ``op``
    per shard, union the per-shard results.  Per-query results are
    IDENTICAL to the unsharded call (each query's top-k depends only on
    its own vector), so this is a pure cost/packaging transform — the
    union'd plan scans the corpus once per shard, which is the honest
    price of a query set that cannot ride one broadcast.

    ``max_shards`` bounds the driver loop (and the plan size): past it,
    the query set is no longer "a query set" but a second corpus — use
    the symmetric pair operators (:func:`cosine_pairs` at test scale,
    LSH/semdedup at real scale) instead.  Deterministic: shard
    assignment is ``xxhash64(id)``-based (ids are assumed distinct —
    they name the output rows), and results carry no shard artifacts.

    The default ``shard_rows`` is HALF the operator's hard cap: hash
    shards are balanced only in expectation, and the slack keeps the
    inner guard from tripping at the boundary.  When ``op_kwargs``
    carries ``codebooks`` (the :func:`pq_topk` shape), the default
    derives from the LUT cap instead — that is the binding constraint
    for ADC search.
    """
    if op is None:
        op = brute_force_topk
    if shard_rows is None:
        cap = MAX_BROADCAST_QUERY_ROWS
        if "codebooks" in op_kwargs:
            lut_per_query = sum(len(cb) for cb in op_kwargs["codebooks"])
            cap = min(cap, max(1, MAX_BROADCAST_LUT_ROWS // max(1, lut_per_query)))
        shard_rows = max(1, cap // 2)
    return _shard_loop(
        queries,
        id_col,
        shard_rows,
        max_shards,
        lambda q: op(corpus, q, id_col, vec_col, **op_kwargs),
        what="topk_sharded",
        too_many_hint=(
            "a query set this large is a second corpus; use the pair "
            "operators (lsh_bucket_topk both-sides, semdedup) instead"
        ),
    )


def ann_recall(
    exact: DataFrame,
    approx: DataFrame,
    *,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall of an approximate top-k result against the
    exact one — the acceptance gate for every ANN shortcut in this
    module (:func:`ivf_topk`, :func:`lsh_bucket_topk`, quantized or
    dimension-truncated probes): run both on a query SAMPLE, and ship
    the approximate plan only if recall clears the bar.

    ``recall = |approx ∩ exact| / |exact|`` per query (both sides
    deduplicated on (query, neighbor) first, so a bucketed probe that
    reaches the same neighbor twice is not double-counted).  Queries
    the approximate side missed entirely score 0, not absent.

    Scale shape: one equi-join on (query, neighbor) + one per-query
    aggregation — both shuffles are keyed on the query sample, which is
    small by construction (recall evaluation is sampled; the corpus
    never appears here, only two top-k result sets).  Returns
    ``(query, n_exact, n_hit, recall)`` with recall rounded to 6
    decimals for engine-stable comparison.
    """
    ex = exact.select(
        F.col(query_col).alias("query"), F.col(neighbor_col).alias("__nb")
    ).dropDuplicates()
    ap = (
        approx.select(
            F.col(query_col).alias("query"), F.col(neighbor_col).alias("__nb")
        )
        .dropDuplicates()
        .withColumn("__hit", F.lit(1))
    )
    return (
        ex.join(ap, ["query", "__nb"], "left")
        .groupBy("query")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        )
        .select(
            "query",
            "n_exact",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_exact"), 6).alias("recall"),
        )
    )


def _cell_scores(
    vec: Column | str,
    centroids: list[tuple[int, list[float]]],
    round_cosine: int | None,
) -> Column:
    """array<struct<c: cosine, nid: -cell_id>> against a literal
    codebook — struct ordering makes ``array_max`` pick highest cosine,
    then smallest cell id.  Shared by :func:`ivf_topk` and the
    persistent IVF index so both assign cells identically.

    Pass the vector column NAME (fast path: the whole codebook renders
    as one SQL string, one py4j round trip); a ``Column`` falls back to
    the per-literal Column-API construction with identical semantics.
    """
    if not isinstance(vec, str):
        entries = []
        for cid, cvec in centroids:
            cos = cosine(vec, F.array(*[F.lit(float(x)) for x in cvec]))
            if round_cosine is not None:
                cos = F.round(cos, round_cosine)
            entries.append(F.struct(cos.alias("c"), F.lit(-cid).alias("nid")))
        return F.array(*entries)
    v = f"`{vec}`"
    # one literal array<struct<cv,nid>> + one transform lambda: the
    # expression tree holds a single cosine subtree instead of one per
    # centroid (16x smaller analysis; values and order are unchanged —
    # same ops on the same floats per element)
    book = "array(" + ", ".join(
        f"named_struct('cv', {_darr(cvec)}, 'nid', {-int(cid)})"
        for cid, cvec in centroids
    ) + ")"
    cos = f"{_sql_dot(v, 'e.cv')} / ({_sql_norm(v)} * {_sql_norm('e.cv')})"
    if round_cosine is not None:
        cos = f"round({cos}, {int(round_cosine)})"
    return F.expr(
        f"transform({book}, e -> named_struct('c', {cos}, 'nid', e.nid))"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 3,
    centroids: list[tuple[int, list[float]]] | None = None,
    round_cosine: int | None = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``nlist`` cells around centroid vectors, then search only each query's
    ``nprobe`` closest cells.

    Centroids default to a deterministic hash-ordered sample of ``nlist``
    corpus vectors (oracle-reproducible; see ``_seed_vectors``); a
    production index would
    instead pass k-means-trained ``centroids`` (list of (cell_id, vector)).
    Either way they are driver-resident (an IVF codebook is small by
    construction) and are embedded as literal arrays, so cell assignment
    is a pure projection over one corpus scan — no shuffle, no UDF, fully
    codegen.  The only shuffle in the plan is the per-query top-k window;
    the candidate join broadcasts the (small) probed-query side, exactly
    like ``lsh_bucket_topk``.

    Assignment ranks cells by ROUNDED cosine (ties -> smaller cell id) so
    an external oracle reproduces the same cells bit-for-bit.
    """
    if centroids is None:
        centroids = _seed_vectors(corpus, id_col, vec_col, nlist)
    if not centroids:
        raise ValueError("ivf_topk: no centroids (empty corpus?)")

    def cell_scores(vec: Column | str) -> Column:
        return _cell_scores(vec, centroids, round_cosine)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    c = c.withColumn("cell", -F.array_max(cell_scores("cv")).getField("nid"))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    _guard_small_side(q, MAX_BROADCAST_QUERY_ROWS, "ivf_topk")
    # nprobe closest cells per query: sort desc by (cosine, -cell_id), slice
    probed = F.slice(
        F.reverse(F.array_sort(cell_scores("qv"))), 1, nprobe
    )
    q = q.withColumn("cell", F.explode(probed.getField("nid"))).withColumn(
        "cell", -F.col("cell")
    )

    cos = cosine(F.col("qv"), F.col("cv"))
    if round_cosine is not None:
        cos = F.round(cos, round_cosine)
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random ±1 hyperplane from md5 parity.

    Component d of plane p is +1 iff the first hex nibble of
    md5("p|d") is even — engine-independent and needs no stored model.
    """
    comps = []
    import hashlib

    for d in range(dim):
        h = hashlib.md5(f"{plane}|{d}".encode()).hexdigest()
        comps.append(F.lit(1.0 if int(h[0], 16) % 2 == 0 else -1.0))
    return F.array(*comps)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 10,
    planes: int = 8,
    dim: int | None = None,
    probes: int = 1,
    round_cosine: int | None = None,
) -> DataFrame:
    """Approximate top-k: sign-random-projection buckets, then exact cosine
    within the query's probed buckets.

    At 100 TB the bucket join replaces the full corpus scan per query with
    a hash-partitioned equi-join on the bucket signature.  Recall is tuned
    by ``planes`` (fewer planes -> bigger buckets) and ``probes``:
    ``probes=1`` searches only the query's own bucket; ``probes>1``
    additionally searches every bucket at Hamming distance 1 (flip each
    single bit), trading |probed buckets| x bucket-size work for recall —
    the standard multi-probe LSH recipe.
    """
    if dim is None:
        first = corpus.select(vec_col).head(1)
        if not first:
            raise ValueError(
                "lsh_bucket_topk: empty corpus and no explicit dim= given"
            )
        dim = len(first[0][0])

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", _bucket_bits("cv", planes, dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", _bucket_bits("qv", planes, dim))
    _guard_small_side(q, MAX_BROADCAST_QUERY_ROWS, "lsh_bucket_topk")

    if probes > 1:
        # expand each query to its bucket + all Hamming-1 neighbors
        def flip(b: Column, i: int) -> Column:
            flipped = F.when(F.substring(b, i + 1, 1) == "1", F.lit("0")).otherwise(
                F.lit("1")
            )
            return F.concat(F.substring(b, 1, i), flipped, F.substring(b, i + 2, planes - i - 1))

        probe_buckets = F.array(F.col("bucket"), *[flip(F.col("bucket"), i) for i in range(planes)])
        q = q.withColumn("bucket", F.explode(probe_buckets))

    cos = cosine(F.col("qv"), F.col("cv"))
    if round_cosine is not None:
        # deterministic cross-engine ranking: ties on the rounded value
        # break on neighbor_id in every engine
        cos = F.round(cos, round_cosine)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_iteration(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    nlist: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
    round_cosine: int | None = 6,
    round_to: int = 6,
) -> DataFrame:
    """One Lloyd iteration of cosine k-means — how an IVF codebook
    (``ivf_topk``) gets trained: assign every vector to its closest
    current centroid, then recompute each cell's centroid as the
    element-wise mean of its members.

    Same deterministic seeding and rounded-cosine/tie-break assignment
    as ``ivf_topk``, so the oracle reproduces cell membership exactly.
    Assignment is a literal-centroid projection over one corpus scan (no
    shuffle, no UDF); the update is a posexplode -> groupBy(cell, dim)
    average — the shuffle carries (cell, dim) partial sums, ``nlist * D``
    rows regardless of corpus size.  Iterate by passing the returned
    centroids back in; each iteration is one corpus pass.

    Returns ``(cell, n_members, centroid)`` for non-empty cells, the
    centroid components rounded to ``round_to``.
    """
    if centroids is None:
        centroids = _seed_vectors(corpus, id_col, vec_col, nlist)
    if not centroids:
        raise ValueError("kmeans_iteration: no centroids (empty corpus?)")

    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__cv"),
    ).withColumn(
        "cell",
        -F.array_max(
            _cell_scores("__cv", centroids, round_cosine)
        ).getField("nid"),
    )

    dims = assigned.select(
        "cell", F.posexplode("__cv").alias("pos", "val")
    )
    means = dims.groupBy("cell", "pos").agg(F.avg("val").alias("m"))
    new_centroids = (
        means.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__a"))
        .select(
            "cell",
            F.transform(
                "__a", lambda s: F.round(s.getField("m"), round_to)
            ).alias("centroid"),
        )
    )
    members = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return members.join(new_centroids, "cell").select(
        "cell", "n_members", "centroid"
    )


def kmeans_fit(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    nlist: int = 16,
    n_iter: int = 2,
    round_cosine: int | None = 6,
    round_to: int = 6,
) -> DataFrame:
    """Full Lloyd loop of cosine k-means: ``n_iter`` passes of
    ``kmeans_iteration``, feeding each round's centroids into the next.

    Scale shape: each round is ONE corpus pass (assignment is a
    literal-centroid projection, no shuffle; the update shuffle carries
    only ``nlist * D`` partial sums).  Between rounds the centroid table
    — ``nlist`` rows of ``D`` doubles, a few KB — collects to the driver,
    the same driver-coordinated iteration MLlib's KMeans uses.  Cost is
    therefore ``n_iter`` sequential scans of the PERSISTED two-column
    projection (MEMORY_AND_DISK for the duration of the loop), so an
    expensive upstream pipeline is computed once, not ``n_iter + 1``
    times.

    Cells that go empty in a round simply drop out (their centroid is
    not carried forward), matching the per-round semantics of
    ``kmeans_iteration`` so a SQL replay of the unrolled rounds
    reproduces membership exactly.  Returns the final round's
    ``(cell, n_members, centroid)``.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    from pyspark import StorageLevel

    # Every Lloyd round re-reads the corpus (and so does the seed
    # sample); persist the two needed columns once so an expensive
    # upstream pipeline runs a single time instead of n_iter + 1 times.
    cached = corpus.select(F.col(id_col), F.col(vec_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        centroids = _seed_vectors(cached, id_col, vec_col, nlist)
        result = None
        for _ in range(n_iter):
            result = kmeans_iteration(
                cached,
                id_col,
                vec_col,
                nlist=nlist,
                centroids=centroids,
                round_cosine=round_cosine,
                round_to=round_to,
            )
            rows = result.collect()
            centroids = sorted(
                ((int(r["cell"]), [float(x) for x in r["centroid"]]) for r in rows),
                key=lambda t: t[0],
            )
    finally:
        cached.unpersist()
    return result


def silhouette_centroid(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    *,
    round_cosine: int | None = 6,
    round_to: int = 6,
) -> DataFrame:
    """Simplified (centroid-based) silhouette for a k-means clustering:
    per vector, ``a`` = cosine distance to its own (nearest) centroid,
    ``b`` = distance to the second-nearest, ``s = (b - a) / max(a, b)``
    — the cluster-quality gauge that decides k without the O(n²)
    pairwise silhouette.

    Map-only: centroids are plan literals (same contract as
    ``kmeans_iteration`` / ``ivf_topk``), so scoring any corpus size is
    one scan with no shuffle.  Distances use the same rounded-cosine +
    smaller-cell tie-break as assignment, so ``cell`` here equals the
    assignment those operators produce.  Returns
    ``(id, cell, silhouette)``; degenerate ``a = b = 0`` scores 0.
    """
    if len(centroids) < 2:
        raise ValueError("silhouette needs >= 2 centroids")

    book = (
        "array("
        + ", ".join(
            f"named_struct('cv', {_darr(cvec)}, 'cell', {int(cid)})"
            for cid, cvec in centroids
        )
        + ")"
    )
    v = "`__sil_v`"
    cos = f"{_sql_dot(v, 'e.cv')} / ({_sql_norm(v)} * {_sql_norm('e.cv')})"
    if round_cosine is not None:
        cos = f"round({cos}, {int(round_cosine)})"
    dists = F.expr(
        f"array_sort(transform({book}, e -> named_struct("
        f"'d', {_dlit(1.0)} - {cos}, 'cell', e.cell)))"
    )
    top2 = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__sil_v"),
    ).select(F.col(id_col), F.slice(dists, 1, 2).alias("__t"))
    d1 = F.element_at("__t", 1).getField("d")
    d2 = F.element_at("__t", 2).getField("d")
    return top2.select(
        id_col,
        F.element_at("__t", 1).getField("cell").cast("long").alias("cell"),
        F.round(
            F.when(
                F.greatest(d1, d2) > 0, (d2 - d1) / F.greatest(d1, d2)
            ).otherwise(F.lit(0.0)),
            round_to,
        ).alias("silhouette"),
    )


def mmr_select(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    score_col: str,
    *,
    k: int,
    lam: float = 0.5,
    bucket_col: str | None = None,
    max_bucket: int = 20000,
    round_to: int = 6,
) -> DataFrame:
    """Maximal-marginal-relevance selection: greedily pick ``k`` items
    per bucket maximizing ``lam * relevance - (1 - lam) * max cosine
    similarity to the already-selected set`` — the diversity-aware
    exemplar sampling used to curate instruction/eval sets without
    near-duplicate picks.

    Scale shape: the greedy recurrence is inherently sequential, so it
    runs per bucket inside ``applyInPandas`` with numpy GEMM similarity
    (one shuffle on the bucket key; in-cell cost ``O(bucket² · D)`` like
    ``semdedup``'s in-cell compare).  Bucket width is guarded by
    ``max_bucket`` — bucket first (cluster / LSH / label) so cells are
    bounded; with ``bucket_col=None`` everything is one cell and the
    guard is the only thing between you and a driver-sized sort, so keep
    that for small inputs.

    Determinism: relevance and running MMR scores are rounded to
    ``round_to`` before comparison; ties break to the smaller id.
    Returns ``(bucket?, id, rank, mmr_score)`` with rank 0-based in pick
    order; ``mmr_score`` of the first pick is its relevance.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    import pandas as pd  # noqa: F401

    bucket_expr = (
        F.col(bucket_col).cast("string")
        if bucket_col
        else F.lit("__all__")
    )
    # Numeric ids normalize to long (stable output schema across int
    # widths); any other id type — string doc ids included — passes
    # through natively instead of silently casting to NULL and blowing
    # up as NaN inside the pandas worker.
    id_dtype = corpus.select(F.col(id_col)).schema[0].dataType
    id_is_numeric = isinstance(id_dtype, T.NumericType)
    id_expr = F.col(id_col).cast("long") if id_is_numeric else F.col(id_col)
    out_id_type = T.LongType() if id_is_numeric else id_dtype
    # Unscorable vectors (NULL / empty / NULL element — the semdedup
    # arrow-engine rule) have no similarity to anything and can never be
    # picked; drop them here rather than crash the numpy batch.
    src = corpus.select(
        bucket_expr.alias("__b"),
        id_expr.alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.round(F.col(score_col).cast("double"), round_to).alias("__score"),
    ).filter(
        F.col("__v").isNotNull()
        & (F.size("__v") > 0)
        & ~F.exists("__v", lambda x: x.isNull())
        & F.col("__score").isNotNull()
    )
    kk, ll, cap, rt = int(k), float(lam), int(max_bucket), int(round_to)

    def pick(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) > cap:
            raise ValueError(
                f"mmr_select: bucket {pdf['__b'].iloc[0]!r} has {len(pdf)} "
                f"rows > max_bucket={cap}; pre-bucket with a cluster/LSH key"
            )

        def rnd(a):
            # half-away-from-zero on the scaled double, matching SQL
            # round() (np.round is banker's — and MMR scores with
            # lam=0.5 land on the half boundary systematically)
            f = 10.0 ** rt
            return np.sign(a) * np.floor(np.abs(a) * f + 0.5) / f + 0.0

        pdf = pdf.sort_values("__id").reset_index(drop=True)
        mat = np.array(pdf["__v"].tolist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        rel = pdf["__score"].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        best_sim = np.full(n, -np.inf)
        out_rows = []
        for rank in range(min(kk, n)):
            if rank == 0:
                cand = rel.copy()
            else:
                cand = rnd(ll * rel - (1.0 - ll) * best_sim)
            cand[selected] = -np.inf
            # first max in id order == smallest-id tie-break (sorted above)
            j = int(np.argmax(cand))
            picked = pdf["__id"].iloc[j]
            out_rows.append(
                (
                    pdf["__b"].iloc[0],
                    int(picked) if id_is_numeric else picked,
                    rank,
                    float(cand[j]),
                )
            )
            sims = rnd(unit @ unit[j])
            best_sim = np.maximum(best_sim, sims)
            selected.append(j)
        return pd.DataFrame(
            out_rows, columns=["bucket", "id", "rank", "mmr_score"]
        )

    pick_schema = T.StructType(
        [
            T.StructField("bucket", T.StringType()),
            T.StructField("id", out_id_type),
            T.StructField("rank", T.IntegerType()),
            T.StructField("mmr_score", T.DoubleType()),
        ]
    )
    ship_package(src)
    out = src.groupBy("__b").applyInPandas(pick, pick_schema).select(
        "bucket", "id", F.col("rank").cast("long").alias("rank"), "mmr_score"
    )
    if not bucket_col:
        out = out.drop("bucket")
    return out


def gram_matrix(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    center: bool = True,
    round_to: int = 6,
    engine: str = "sql",
) -> DataFrame:
    """Covariance (``center=True``) or raw second-moment (``center=False``)
    matrix of an embedding column, as ``(i, j, cov)`` rows with
    ``i <= j`` — the input PCA / whitening / Mahalanobis need.

    One pass, no self-join: per row, emit the upper-triangular products
    via a nested ``transform`` explode and hash-aggregate them.  The
    explode is pipelined into the partial aggregation inside one stage,
    so the shuffle carries only ``D * (D + 1) / 2`` partial sums no
    matter the corpus size.  Means come from the same pass (grouping on
    the dim pair), and ``cov = E[xy] - E[x] * E[y]``.

    ``engine="arrow"``: per Arrow batch, compute ``X^T X`` with one
    numpy GEMM (``mapInPandas``) and emit partial sums — at ``D`` in the
    hundreds this replaces ``N * D^2 / 2`` Catalyst row emissions with a
    BLAS call per batch; the final aggregation input is
    ``n_batches * D^2`` rows.  Identical results (same rounding).

    Unscorable vectors (NULL / empty / NULL element) are EXCLUDED on
    both engines — a second-moment over a partial vector has no
    well-defined row weight, and the ragged batch would crash the numpy
    conversion (same policy as ``semdedup``'s pass-through split).
    """
    src = emb.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).filter(
        F.col("__v").isNotNull()
        & (F.size("__v") > 0)
        & ~F.exists("__v", lambda x: x.isNull())
    )
    if engine == "arrow":
        import pandas as pd  # noqa: F401

        def part(batches):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                mat = np.array(pdf["__v"].tolist(), dtype=np.float64)
                if mat.size == 0:
                    continue
                g = mat.T @ mat
                s = mat.sum(axis=0)
                d = g.shape[0]
                iu, ju = np.triu_indices(d)
                yield pd.DataFrame(
                    {
                        "i": iu.astype("int64"),
                        "j": ju.astype("int64"),
                        "sxy": g[iu, ju],
                        # per-pair row count and the two dim sums ride
                        # along so the reducer never needs a second input
                        "n": np.full(len(iu), float(mat.shape[0])),
                        "sx": s[iu],
                        "sy": s[ju],
                    }
                )

        ship_package(src)
        parts = src.mapInPandas(
            part, "i long, j long, sxy double, n double, sx double, sy double"
        )
        agg = parts.groupBy("i", "j").agg(
            F.sum("sxy").alias("sxy"),
            F.sum("n").alias("n"),
            F.sum("sx").alias("sx"),
            F.sum("sy").alias("sy"),
        )
    else:
        ex = src.select(
            F.posexplode("__v").alias("i", "x"),
            F.col("__v").alias("__v"),
        ).select(
            F.col("i").cast("long").alias("i"),
            "x",
            F.posexplode(F.slice("__v", F.col("i") + 1, F.size("__v"))).alias(
                "__joff", "y"
            ),
        )
        agg = ex.select(
            "i", (F.col("i") + F.col("__joff")).cast("long").alias("j"),
            "x", "y",
        ).groupBy("i", "j").agg(
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
        )
    cov = F.col("sxy") / F.col("n")
    if center:
        cov = cov - (F.col("sx") / F.col("n")) * (F.col("sy") / F.col("n"))
    # + 0.0 folds IEEE -0.0 to 0.0 (engine-stable value compare)
    return agg.select(
        "i", "j", (F.round(cov, round_to) + F.lit(0.0)).alias("cov")
    )


def pca_fit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 2,
    engine: str = "sql",
    return_means: bool = False,
):
    """Top-``k`` principal components of the embedding column.

    The distributed part is ``gram_matrix`` (one corpus pass, ``D^2``
    shuffle rows); the eigendecomposition runs driver-side with numpy on
    the collected ``D x D`` covariance — a few KB even at ``D = 4096``,
    the standard split for PCA on Spark (MLlib's RowMatrix does the
    same).  Sign is fixed so each component's largest-|magnitude| entry
    is positive, making the result deterministic across BLAS builds.

    Returns ``[(comp_id, unit_vector), ...]`` ordered by descending
    eigenvalue — feed directly into ``pca_project``.
    """
    import numpy as np

    rows = gram_matrix(
        emb, id_col, vec_col, center=True, round_to=12, engine=engine
    ).collect()
    d = max(int(r["j"]) for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[int(r["i"]), int(r["j"])] = float(r["cov"])
        cov[int(r["j"]), int(r["i"])] = float(r["cov"])
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: min(k, d)]
    out = []
    for rank, idx in enumerate(order):
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        out.append((rank, [float(x) for x in v]))
    if not return_means:
        return out
    # per-dim means from one tiny aggregation (same pass shape as the
    # covariance) — feed into pca_project(center_means=) for true
    # principal scores without a caller-side recomputation
    mrows = (
        emb.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v")
        )
        .groupBy("dim")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    means = [0.0] * d
    for r in mrows:
        means[int(r["dim"])] = float(r["m"])
    return out, means


def pca_project(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    components: list[tuple[int, list[float]]],
    *,
    center_means: list[float] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Project vectors onto fixed ``components`` (from ``pca_fit`` or any
    literal basis): map-only, one dot product per component compiled as a
    Catalyst ``aggregate`` fold — no shuffle, no UDF, output
    ``(id, comp, score)``.

    ``center_means`` (per-dim means, also literal) subtracts the corpus
    mean first — pass the means from the same pass that fit the PCA to
    get true principal scores.
    """
    v = "`__pca_v`"
    if center_means is not None:
        v = f"zip_with({v}, {_darr(center_means)}, (a, b) -> a - b)"
    book = (
        "array("
        + ", ".join(
            f"named_struct('comp', {int(cid)}, 'cv', {_darr(cvec)})"
            for cid, cvec in components
        )
        + ")"
    )
    outs = F.expr(
        f"transform({book}, e -> named_struct('comp', e.comp, "
        f"'score', round({_sql_dot(v, 'e.cv')}, {int(round_to)})))"
    )
    return emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__pca_v"),
    ).select(
        F.col(id_col), F.explode(outs).alias("__s")
    ).select(
        id_col,
        F.col("__s.comp").cast("long").alias("comp"),
        F.col("__s.score").alias("score"),
    )


def ridge_fit(
    df: DataFrame,
    feat_col: str,
    label_col: str,
    *,
    l2: float = 0.0,
    fit_intercept: bool = True,
    round_to: int = 9,
) -> tuple[list[float], float]:
    """Closed-form ridge regression over dense feature vectors:
    ``w = (X'X + l2*n*I)^-1 X'y`` — the linear-probe / value-model fit,
    exactly (no iterations), from ONE corpus pass.

    Scale shape: the pass aggregates ``X'X`` (upper triangle, D(D+1)/2
    sums), ``X'y`` (D sums), feature/label means and the row count in a
    single hash aggregate whose shuffle is D²-bounded; the D x D solve
    runs driver-side with numpy (same split as ``pca_fit`` — a few KB
    even at D = 4096).  With ``fit_intercept`` the system is solved on
    mean-centered moments and ``b = mean(y) - w . mean(x)``.

    Returns ``(weights, intercept)`` rounded to ``round_to``
    (half-away-from-zero, engine-stable).
    """
    import math as _math

    import numpy as np

    src = df.select(
        F.col(feat_col).cast("array<double>").alias("__x"),
        F.col(label_col).cast("double").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    ex = src.select(
        "__y",
        F.posexplode("__x").alias("i", "xi"),
        F.col("__x").alias("__xv"),
    ).select(
        "__y",
        F.col("i").cast("long").alias("i"),
        "xi",
        F.posexplode(F.slice("__xv", F.col("i") + 1, F.size("__xv"))).alias(
            "__joff", "xj"
        ),
    )
    pair_sums = ex.select(
        "i",
        (F.col("i") + F.col("__joff")).cast("long").alias("j"),
        "xi",
        "xj",
        "__y",
    ).groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("xj")).alias("sxx"),
    )
    # X'y, means and n come from the non-pair explode (D rows + 1)
    lin = src.select(
        "__y", F.posexplode("__x").alias("i", "xi")
    ).groupBy(F.col("i").cast("long").alias("i")).agg(
        F.sum(F.col("xi") * F.col("__y")).alias("sxy"),
        F.sum("xi").alias("sx"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    ysum = src.agg(F.sum("__y").alias("sy")).collect()[0]["sy"]
    prows = pair_sums.collect()
    lrows = lin.collect()
    d = max(int(r["i"]) for r in lrows) + 1
    n = float(lrows[0]["n"])
    xtx = np.zeros((d, d))
    for r in prows:
        xtx[int(r["i"]), int(r["j"])] = float(r["sxx"])
        xtx[int(r["j"]), int(r["i"])] = float(r["sxx"])
    xty = np.zeros(d)
    mx = np.zeros(d)
    for r in lrows:
        xty[int(r["i"])] = float(r["sxy"])
        mx[int(r["i"])] = float(r["sx"]) / n
    my = float(ysum) / n
    if fit_intercept:
        a = xtx / n - np.outer(mx, mx)
        b_vec = xty / n - mx * my
    else:
        a = xtx / n
        b_vec = xty / n
    w = np.linalg.solve(a + float(l2) * np.eye(d), b_vec)
    bias = my - float(mx @ w) if fit_intercept else 0.0

    def rnd(x: float) -> float:
        return _math.copysign(
            _math.floor(abs(x) * 10**round_to + 0.5) / 10**round_to, x
        )

    return [rnd(float(v)) for v in w], rnd(float(bias))


def quantize_int8(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    round_to: int = 6,
    reconstruct: bool = False,
) -> DataFrame:
    """Per-dimension scalar int8 quantization of an embedding column —
    the 4x storage cut applied before shipping vectors to an ANN index.

    Pass 1 computes per-dim min/max (posexplode -> groupBy(dim): shuffle
    rows = D, not corpus size); the tiny stats frame broadcasts into the
    encode pass, which is map-only: ``code = floor((v - mn) / (mx - mn)
    * 255 + 0.5) - 128`` (constant dims encode to -128).  Emits
    ``(id, codes array<int>, mse)`` where mse is the per-vector mean
    squared reconstruction error — the quality gauge for choosing
    int8 vs PQ vs float16.
    """
    src = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).filter(F.col("__v").isNotNull() & (F.size("__v") > 0))
    stats = (
        src.select(F.posexplode("__v").alias("dim", "x"))
        .groupBy("dim")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("__st")
        )
        .select(
            F.transform("__st", lambda s: s["mn"]).alias("mns"),
            F.transform("__st", lambda s: s["mx"]).alias("mxs"),
        )
    )
    with_stats = src.crossJoin(F.broadcast(stats))
    scale = lambda v, mn, mx: F.when(  # noqa: E731
        mx > mn, F.floor((v - mn) / (mx - mn) * 255.0 + 0.5)
    ).otherwise(F.lit(0))
    idx = F.sequence(F.lit(1), F.size("__v"))
    codes = F.transform(
        idx,
        lambda i: (
            scale(
                F.element_at("__v", i),
                F.element_at("mns", i),
                F.element_at("mxs", i),
            )
            - 128
        ).cast("int"),
    )
    recon = lambda c, mn, mx: F.when(  # noqa: E731
        mx > mn, (c + 128.0) / 255.0 * (mx - mn) + mn
    ).otherwise(mn)
    return (
        with_stats.withColumn("codes", codes)
        .withColumn(
            "mse",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("__v"),
                        F.transform(
                            idx,
                            lambda i: recon(
                                F.element_at("codes", i).cast("double"),
                                F.element_at("mns", i),
                                F.element_at("mxs", i),
                            ),
                        ),
                        lambda v, r: (v - r) * (v - r),
                    ),
                    F.lit(0.0),
                    lambda acc, e: acc + e,
                )
                / F.size("__v"),
                round_to,
            ),
        )
        .withColumn(
            "recon",
            F.transform(
                idx,
                lambda i: F.round(
                    recon(
                        F.element_at("codes", i).cast("double"),
                        F.element_at("mns", i),
                        F.element_at("mxs", i),
                    ),
                    round_to,
                ),
            ),
        )
        .select(
            id_col, "codes", "mse", *(["recon"] if reconstruct else [])
        )
    )


def zscore_normalize(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-dimension z-score normalization of an embedding column — the
    feature-scaling pass before clustering / ANN indexing.

    One posexplode + one TINY aggregation (rows = embedding dims, not
    corpus size) computes population mean/std per dimension; the stats
    frame broadcasts into the normalize join, so the corpus is read
    once and never reshuffled.  Constant dimensions (std = 0) normalize
    to 0.  Emits long format ``(id, dim, value, zscore)`` — the shape
    downstream per-dimension ops consume; ``groupBy(id).agg(
    array_sort(collect_list(struct(dim, zscore))))`` rebuilds vectors.
    """
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    ).select(F.col(id_col), F.col("dim"), F.col("__v").cast("double").alias("__v"))
    stats = ex.groupBy("dim").agg(
        F.avg("__v").alias("__mean"),
        F.avg(F.col("__v") * F.col("__v")).alias("__sq"),
    )
    std = F.sqrt(
        F.greatest(F.col("__sq") - F.col("__mean") * F.col("__mean"), F.lit(0.0))
    )
    return (
        ex.join(F.broadcast(stats), "dim")
        .select(
            F.col(id_col),
            F.col("dim").cast("bigint").alias("dim"),
            F.round("__v", round_to).alias("value"),
            F.round(
                F.when(std > 0, (F.col("__v") - F.col("__mean")) / std).otherwise(
                    F.lit(0.0)
                ),
                round_to,
            ).alias("zscore"),
        )
    )


def semdedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
    nlist: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
    round_cosine: int | None = 6,
    engine: str = "arrow",
) -> DataFrame:
    """SemDedup-style semantic deduplication: cluster the corpus around
    ``nlist`` centroids, then compare vectors pairwise ONLY within their
    cluster and drop every vector that has a same-cluster neighbor with
    cosine >= ``threshold`` and a smaller id (one survivor per epsilon-
    ball, deterministic).

    This is the scale path for embedding near-dup — the all-pairs
    ``cosine_pairs`` is O(n^2) over the corpus, while here the quadratic
    term is bounded by the largest cluster: with k-means-sized clusters
    (|cell| ~ n/nlist) the comparison volume drops by ~nlist x.
    Centroids default to a deterministic hash-ordered sample
    (``_seed_vectors`` — oracle-reproducible, and decorrelated from id
    adjacency so near-duplicate id runs don't collapse into one cell);
    production passes k-means-trained centroids from
    ``kmeans_iteration``.

    ``engine="arrow"`` (default) runs the in-cell comparison as ONE
    Arrow-batched ``applyInPandas`` per cell: the cell's unit vectors
    become a numpy matrix and the pairwise cosines one (column-chunked)
    GEMM — no pair-row explosion in the plan, one shuffle total, and
    the per-pair cost is SIMD instead of per-element Catalyst
    higher-order-function evaluation (the round-2 stress profile's
    dominant term; ~20x on the 600k-doc stress).  ``engine="sql"``
    keeps the pure column-expression self-join — same results, zero
    Python — for environments where the JVM-only path matters more
    than speed.  Rounding matches exactly (half-up, like Spark's
    ``round``).

    Returns ``(id, cell, dropped, dup_of)``: ``dup_of`` is the smallest
    same-cluster id within ``threshold`` (NULL when kept).
    """
    if engine not in ("arrow", "sql"):
        raise ValueError(f"semdedup: unknown engine {engine!r}")
    if centroids is None:
        centroids = _seed_vectors(emb, id_col, vec_col, nlist)
    if not centroids:
        raise ValueError("semdedup: no centroids (empty corpus?)")

    # Normalize every vector ONCE (and the centroids driver-side), so
    # each downstream cosine is a single zip_with/aggregate dot product
    # instead of dot + two norms — higher-order-function evaluation is
    # the per-pair cost at scale, and this cuts it 3x.
    import math

    def _unit(vec: list[float]) -> list[float]:
        nrm = math.sqrt(sum(x * x for x in vec))
        return [x / nrm for x in vec] if nrm > 0 else list(vec)

    def cell_scores(vec: str) -> Column:
        # unit-centroid codebook as ONE SQL-text transform (same dots,
        # same order; see _cell_scores for the py4j-cost rationale)
        book = (
            "array("
            + ", ".join(
                f"named_struct('cv', {_darr(_unit(cvec))}, 'nid', {-int(cid)})"
                for cid, cvec in centroids
            )
            + ")"
        )
        cos = _sql_dot(f"`{vec}`", "e.cv")
        if round_cosine is not None:
            cos = f"round({cos}, {int(round_cosine)})"
        return F.expr(
            f"transform({book}, e -> named_struct('c', {cos}, 'nid', e.nid))"
        )

    if engine == "arrow":
        import numpy as np
        import pandas as pd

        src = emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("__raw"),
        )
        # Unscorable vectors (NULL / empty / NULL element) would crash the
        # numpy batch conversion; the sql engine keeps them (every cosine
        # against a bad vector is NULL, so they land in the min-id cell via
        # the struct-max tie-break and are never dropped).  Split them out
        # here and re-attach with the identical (cell=min id, dropped=false)
        # result so the two engines agree row-for-row.
        bad_cond = (
            F.col("__raw").isNull()
            | (F.size("__raw") <= 0)
            | F.exists("__raw", lambda x: x.isNull())
        )
        bad = src.filter(bad_cond)
        src = src.filter(~bad_cond)
        id_field = src.schema["id"]
        mid_schema = T.StructType(
            [
                id_field,
                T.StructField("v", T.ArrayType(T.DoubleType())),
                T.StructField("cell", T.LongType()),
            ]
        )
        out_schema = T.StructType(
            [
                id_field,
                T.StructField("cell", T.LongType()),
                T.StructField("dropped", T.BooleanType()),
                T.StructField("dup_of", id_field.dataType),
            ]
        )
        th = float(threshold)
        rc = round_cosine
        # ascending cell id => np.argmax's first-max IS the SQL
        # tie-break (highest cosine, then smallest cell id)
        cents = sorted(centroids)
        cent_ids = np.asarray([cid for cid, _ in cents], dtype=np.int64)
        cent_mat = np.asarray([_unit(cvec) for _, cvec in cents], dtype=np.float64)

        def _round_half_up(a: "np.ndarray", d: int) -> "np.ndarray":
            # Spark round() is HALF_UP (away from zero)
            return np.sign(a) * np.floor(np.abs(a) * 10.0**d + 0.5) / 10.0**d

        def assign(batches):
            for pdf in batches:
                m = len(pdf)
                if m == 0:
                    continue
                V = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf["__raw"]]
                )
                nrm = np.sqrt((V * V).sum(axis=1))
                unit = np.where(nrm[:, None] > 0, V / np.maximum(nrm, 1e-300)[:, None], V)
                scores = unit @ cent_mat.T
                if rc is not None:
                    scores = _round_half_up(scores, rc)
                cells = cent_ids[np.argmax(scores, axis=1)]
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "v": list(unit),
                        "cell": cells,
                    }
                )

        ship_package(src)
        assigned = src.mapInPandas(assign, mid_schema)

        def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
            vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            m = len(pdf)
            dup_idx = np.full(m, -1, dtype=np.int64)
            # column-chunked GEMM: memory is m x chunk, never m x m
            chunk = 2048
            for j0 in range(1, m, chunk):
                j1 = min(j0 + chunk, m)
                cos = vecs @ vecs[j0:j1].T  # (m, j1-j0)
                if rc is not None:
                    # Spark round() is HALF_UP (away from zero)
                    cos = np.sign(cos) * np.floor(
                        np.abs(cos) * 10.0**rc + 0.5
                    ) / 10.0**rc
                hit = cos >= th
                for jj in range(j1 - j0):
                    j = j0 + jj
                    rows = np.nonzero(hit[:j, jj])[0]
                    if rows.size:
                        dup_idx[j] = rows[0]
            ids = pdf["id"]
            return pd.DataFrame(
                {
                    "id": ids,
                    "cell": pdf["cell"].astype("int64"),
                    "dropped": dup_idx >= 0,
                    "dup_of": [
                        ids.iloc[k] if k >= 0 else None for k in dup_idx
                    ],
                }
            )

        result = assigned.groupBy("cell").applyInPandas(per_cell, out_schema)
        bad_rows = bad.select(
            F.col("id"),
            F.lit(int(cent_ids.min())).cast("long").alias("cell"),
            F.lit(False).alias("dropped"),
            F.lit(None).cast(id_field.dataType).alias("dup_of"),
        )
        return result.unionByName(bad_rows)

    # --- engine == "sql": pure column-expression path ---
    nrm = F.sqrt(_dot(F.col("__raw"), F.col("__raw")))
    assigned = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("__raw"),
        )
        .withColumn(
            "v",
            F.when(
                nrm > 0, F.transform("__raw", lambda x: x / nrm)
            ).otherwise(F.col("__raw")),
        )
        .drop("__raw")
        .withColumn("cell", -F.array_max(cell_scores("v")).getField("nid"))
    )
    # assigned feeds both self-join sides AND the final keep/drop join;
    # persist so the nlist-dot cell assignment runs once per row, not 3x
    # (recoverable storage, not localCheckpoint — lineage survives
    # executor loss on a real cluster).
    from pyspark import StorageLevel

    from ..caches import track_cache

    assigned = track_cache(assigned.persist(StorageLevel.MEMORY_AND_DISK))

    a = assigned.select(F.col("cell"), F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = assigned.select(F.col("cell"), F.col("id").alias("id_b"), F.col("v").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb"))
    if round_cosine is not None:
        cos = F.round(cos, round_cosine)
    dup_of = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_b", F.col("id_a"), cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
    )
    return (
        assigned.join(dup_of, assigned["id"] == dup_of["id_b"], "left")
        .select(
            F.col("id"),
            F.col("cell").cast("bigint").alias("cell"),
            F.col("dup_of").isNotNull().alias("dropped"),
            F.col("dup_of"),
        )
    )


def _sq_l2(a: Column, centroid: list[float], round_to: int = 6) -> Column:
    """Rounded squared-L2 of an array column against a literal centroid —
    the shared distance kernel of the PQ family (encode, query LUT, the
    persistent IVF-PQ index), so every consumer quantizes identically."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.round(
        F.aggregate(
            F.zip_with(a, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_to,
    )


def pq_codebooks(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 8,
    n_centroids: int = 16,
    dim: int | None = None,
    salt: str | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """The deterministic seed codebooks :func:`pq_codes` defaults to —
    the hash-ordered corpus sample's subvectors, one ``[(code,
    subvector)]`` list per subspace.  Factored out so encode
    (:func:`pq_codes`) and search (:func:`pq_topk`) can share ONE
    codebook object — codes joined against a different codebook's LUT
    are silently wrong distances, the geometry hazard class the
    persistent indexes pin with manifests; for these stateless
    operators codebook identity is the caller's contract.  Production
    trains per-subspace k-means instead; any equal-dim
    ``[(code, subvector)]`` lists work."""
    seeds = _seed_vectors(emb, id_col, vec_col, n_centroids, salt=salt)
    if not seeds:
        raise ValueError("pq_codebooks: empty corpus")
    if dim is None:
        dim = len(seeds[0][1])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m {m}")
    sub = dim // m
    return [
        [(ci, vec[j * sub : (j + 1) * sub]) for ci, vec in seeds]
        for j in range(m)
    ]


def pq_fit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 8,
    n_centroids: int = 16,
    n_iter: int = 2,
    dim: int | None = None,
    round_to: int = 6,
    salt: str | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Train PQ codebooks with per-subspace squared-L2 Lloyd iterations
    — the production counterpart of the :func:`pq_codebooks` seed
    sample.  (Deliberately NOT :func:`kmeans_fit`: that is COSINE
    k-means for cell assignment; PQ quantizes subvectors under the same
    L2 metric ADC sums, so the trainer must match.)

    Scale shape: every iteration is ONE corpus scan — all ``m``
    subspaces assign in a single literal-codebook projection (the
    :func:`pq_codes` expression), the update shuffles only
    ``(subspace, code, dim_pos)`` partial means (``m x n_centroids x
    sub_dim`` cells — KBs), and the new centroids collect to the driver
    between rounds, the kmeans_fit driver-coordination idiom.  A code
    that goes empty in a round is RE-SEEDED from that round's farthest
    assigned subvector in its subspace (standard Lloyd practice;
    deterministic: max assigned distance, md5-of-subvector tie-break) —
    the round-9 dropout semantics shrank exactly the codebooks a
    skewed corpus needs full resolution from, monotonically.  The
    re-seed pass is a rank-limited window (WindowGroupLimit-pruned)
    run only on rounds that actually lost a code.  Centroid components
    round to ``round_to`` so a refit on identical data is
    bit-identical.

    ``salt`` perturbs the deterministic seed-sample order
    (:func:`pq_codebooks`) — pass it when training on RESIDUAL frames
    (``PersistentIVFIndex.residual_training_frame``), where the
    unsalted sample can hand back the cell codebook's own seeds whose
    residuals are exactly zero.

    Returns codebooks in the :func:`pq_codes`/:func:`pq_topk` shape —
    train once, pass the SAME object to encode and search."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    cbs = pq_codebooks(
        emb, id_col, vec_col, m=m, n_centroids=n_centroids, dim=dim, salt=salt
    )
    vec = F.col(vec_col).cast("array<double>")
    v = (
        emb.select(vec.alias("v"))
        .filter(
            F.col("v").isNotNull()
            & (F.size("v") > 0)
            & ~F.exists("v", lambda x: x.isNull())
        )
    )
    from pyspark import StorageLevel

    cached = v.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(n_iter):
            cols = []
            off = 0
            for j, cb in enumerate(cbs):
                subj = len(cb[0][1])
                subv = F.slice(F.col("v"), off + 1, subj)
                best = F.array_min(
                    F.array(
                        *[
                            F.struct(
                                _sq_l2(subv, cvec).alias("d"),
                                F.lit(int(ci)).alias("code"),
                            )
                            for ci, cvec in cb
                        ]
                    )
                )
                cols.append(
                    F.struct(
                        F.lit(j).cast("long").alias("subspace"),
                        best.getField("code").cast("long").alias("code"),
                        best.getField("d").alias("d"),
                        subv.alias("sv"),
                    )
                )
                off += subj
            stats = (
                cached.select(F.explode(F.array(*cols)).alias("r"))
                .select(
                    "r.subspace", "r.code", F.posexplode("r.sv").alias("pos", "val")
                )
                .groupBy("subspace", "code", "pos")
                .agg(F.avg("val").alias("c"))
            )
            means: dict[tuple[int, int], dict[int, float]] = {}
            for r in stats.collect():  # m x n_centroids x sub rows — KBs
                means.setdefault((int(r["subspace"]), int(r["code"])), {})[
                    int(r["pos"])
                ] = float(r["c"])
            empties: dict[int, list[int]] = {}
            for j, cb in enumerate(cbs):
                lost = [ci for ci, _old in cb if means.get((j, ci)) is None]
                if lost:
                    empties[j] = lost
            reseeds: dict[int, list[list[float]]] = {}
            if empties:
                # farthest-assigned subvectors per affected subspace —
                # the standard Lloyd empty-cluster re-seed.  Rank-limit
                # window (rk <= need) so the sort prunes map-side; runs
                # only on rounds that actually lost a code.
                need = max(len(v_) for v_ in empties.values())
                far = (
                    cached.select(F.explode(F.array(*cols)).alias("r"))
                    .select("r.subspace", "r.d", "r.sv")
                    .filter(
                        F.col("subspace").isin([int(j) for j in empties])
                    )
                    .withColumn("tb", F.md5(F.to_json("sv")))
                    .withColumn(
                        "rk",
                        F.row_number().over(
                            Window.partitionBy("subspace").orderBy(
                                F.col("d").desc(), F.col("tb").asc()
                            )
                        ),
                    )
                    .filter(F.col("rk") <= need)
                    .collect()
                )
                for r in sorted(far, key=lambda r: (r["subspace"], r["rk"])):
                    reseeds.setdefault(int(r["subspace"]), []).append(
                        [float(x) for x in r["sv"]]
                    )
            nxt = []
            for j, cb in enumerate(cbs):
                subj = len(cb[0][1])
                pool = reseeds.get(j, [])
                taken = 0
                kept = []
                for ci, old in cb:
                    got = means.get((j, ci))
                    if got is not None:
                        kept.append(
                            (ci, [round(got[p], round_to) for p in range(subj)])
                        )
                    elif taken < len(pool):
                        kept.append(
                            (ci, [round(x, round_to) for x in pool[taken]])
                        )
                        taken += 1
                    else:
                        # fewer distinct subvectors than codes (tiny or
                        # constant corpus): nothing to re-seed from
                        continue
                nxt.append(kept)
            cbs = nxt
    finally:
        cached.unpersist()
    return cbs


def pq_codes(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    m: int = 8,
    n_centroids: int = 16,
    dim: int | None = None,
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """Product-quantization encoding: split each vector into ``m``
    subvectors and store, per subspace, the id of the nearest codebook
    centroid (squared-L2) — the 100 TB memory lever for ANN: a 64-dim
    float vector (256 bytes) compresses to ``m`` small codes (``m``
    bytes at 256 centroids), so a billion-vector index fits in RAM and
    distance evaluation becomes table lookups (ADC).

    Codebooks default to the subvectors of a deterministic hash-ordered
    sample of ``n_centroids`` corpus vectors (``_seed_vectors``);
    production passes k-means-trained codebooks per subspace.  Either
    way they are literal-embedded (a PQ codebook is tiny by
    construction), so encoding is ONE corpus scan with pure codegen
    expressions — no shuffle, no UDF, and the output inherits the input
    partitioning.  Production trains with :func:`pq_fit` (per-subspace
    L2 Lloyd) and passes the SAME codebooks here and to
    :func:`pq_topk`.

    Ties (equal rounded distance) pick the smaller code.  Returns long
    format ``(id, subspace, code, dist)`` with ``dist`` the rounded
    squared-L2 to the chosen centroid.
    """
    if codebooks is None:
        codebooks = pq_codebooks(
            emb, id_col, vec_col, m=m, n_centroids=n_centroids, dim=dim
        )
    # Explicit codebooks are the source of truth for the geometry: m is
    # their count and each subspace's width/offset comes from its own
    # centroid length (the pq_topk idiom).  Deriving from the m PARAMETER
    # would silently slice wrong-width subvectors whenever the caller
    # passes pq_fit(..., m=4) codebooks without repeating m=4 — the exact
    # silently-wrong-distances hazard this module warns about.
    widths = [len(cb[0][1]) for cb in codebooks]
    if dim is not None and dim != sum(widths):
        raise ValueError(
            f"pq_codes: dim={dim} does not match the codebooks' total "
            f"width {sum(widths)} (per-subspace widths {widths}) — pass "
            "the codebooks that encoded this geometry, or drop dim"
        )

    v = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )

    best = _sql_pq_best(codebooks, "v")
    per_space = F.expr(
        f"transform({best}, s -> named_struct("
        "'subspace', s.j, 'code', CAST(s.b.code AS BIGINT), 'dist', s.b.d))"
    )
    return (
        v.select("id", F.explode(per_space).alias("r"))
        .select("id", "r.subspace", "r.code", "r.dist")
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    codebooks: list[list[tuple[int, list[float]]]],
    k: int = 10,
    exclude_self: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus — the
    search half of the :func:`pq_codes` compression lever: the corpus is
    touched only as its ``(id, subspace, code)`` table (``m`` bytes per
    vector at <=256 centroids), never as raw floats, so a billion-vector
    index scans from RAM-sized parquet and every distance evaluation is
    a table lookup.

    For each query, the squared-L2 from its j-th subvector to EVERY
    centroid of subspace j is precomputed into a lookup table —
    ``|queries| x m x n_centroids`` rows, built as pure column
    expressions on the (small-by-contract) query frame and broadcast.
    The corpus codes equi-join the LUT on ``(subspace, code)`` and the
    per-pair ADC distance is the map-side-combined ``sum`` of the m
    looked-up entries; ranking is ascending distance, ties -> smaller
    neighbor id (the brute_force_topk determinism idiom).  One corpus
    scan, one broadcast join, one keyed aggregation, one per-query
    window — no raw-vector shuffle anywhere.

    ``codebooks`` must be the object that encoded ``codes`` (share one
    :func:`pq_codebooks` result): codes looked up in a different
    codebook's LUT are silently wrong distances — the stateless twin of
    the geometry hazard the persistent indexes pin with manifests.
    Accuracy is gated like every ANN shortcut here: run
    :func:`ann_recall` against :func:`brute_force_topk` on a query
    sample and ship only if recall clears the bar.

    Returns ``(query_id, neighbor_id, adc_dist, rank)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not codebooks or not codebooks[0]:
        raise ValueError("pq_topk: empty codebooks")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    # the broadcast LUT is |queries| x m x n_centroids rows — enforce
    # the small-by-contract bound in LUT rows, not query rows, so a
    # fat codebook tightens the cap proportionally
    lut_per_query = sum(len(cb) for cb in codebooks)
    _guard_small_side(
        q, max(1, MAX_BROADCAST_LUT_ROWS // lut_per_query), "pq_topk"
    )

    lut = q.select(
        "query_id",
        F.explode(F.expr(_sql_pq_lut(codebooks, "qv", round_to))).alias("r"),
    ).select("query_id", "r.subspace", "r.code", "r.d")

    scored = (
        codes.select(F.col("id").alias("neighbor_id"), "subspace", "code")
        .join(F.broadcast(lut), ["subspace", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("d"), round_to).alias("adc_dist"))
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def hard_negatives(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    *,
    query_ids: DataFrame | None = None,
    top_k: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the ``top_k`` most-similar corpus vectors with a DIFFERENT
    label — maximally confusing negatives, the standard batch-mining
    step for embedding-model training.

    Same plan shape as brute-force cosine top-k (query side broadcast,
    corpus streamed once, per-query window top-k); the label-mismatch
    predicate rides the same pass, so mining costs nothing beyond the
    similarity scan.  At 100 TB swap the scored pass for the LSH/IVF
    candidate generators (lsh_bucket_topk / ivf_topk) and keep the
    label filter — it composes with any candidate source.

    Rounds cosine to 6 digits (ties -> smaller neighbor id) so ranks
    are engine-reproducible.  Returns (query_id, neighbor_id, cosine,
    rank).
    """
    qs = emb.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col(label_col).alias("qlabel"),
    )
    if query_ids is not None:
        qs = qs.join(
            F.broadcast(query_ids.selectExpr(f"{query_ids.columns[0]} AS query_id")),
            "query_id",
        )
    cs = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.col(label_col).alias("clabel"),
    )
    _guard_small_side(qs, MAX_BROADCAST_QUERY_ROWS, "hard_negatives")
    scored = (
        cs.crossJoin(F.broadcast(qs))
        .filter(
            (F.col("neighbor_id") != F.col("query_id"))
            & ~F.col("clabel").eqNullSafe(F.col("qlabel"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
    )


def label_centroids(
    emb: DataFrame, vec_col: str, label_col: str
) -> DataFrame:
    """Per-label mean vector (class prototypes): the centroid-classifier /
    prototypical-network step, and the statistic behind per-class drift
    monitoring.

    One shuffle on (label, dimension-index) after a posexplode — the
    aggregation state is |labels| x dim scalars regardless of corpus
    size, and the partial (map-side) averages collapse each partition's
    contribution before the exchange.  Returns (label, centroid, n)
    with the centroid rebuilt in dimension order, elements fixed to 6
    decimal digits (decimal-cast, not float formatting) so the joined
    string is engine-independent.
    """
    e = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "v"),
    )
    per_dim = e.groupBy("label", "i").agg(
        F.avg("v").alias("m"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", F.round(F.col("m"), 6).alias("m")))
                    ),
                    lambda s: s.getField("m").cast("decimal(18,6)").cast("string"),
                ),
                ",",
            ).alias("centroid"),
            F.max("n").cast("bigint").alias("n"),
        )
    )


def random_projection(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    out_dim: int,
    *,
    dim: int | None = None,
    scale: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction by deterministic
    ±1 sign projection (Achlioptas 2003): component ``p`` of the output is
    ``dot(vec, hyperplane_p) / sqrt(out_dim)`` with the same md5-parity
    hyperplanes the LSH bucketing uses — no stored model, reproducible in
    any engine with md5.

    Pairwise distances are preserved within ~(1 ± eps) for
    ``out_dim = O(log n / eps^2)``; projecting 64-dim embeddings to 8-16
    dims before an all-pairs or k-means stage cuts that stage's compute
    and shuffle width by the same factor.  Map-only: no shuffle, no UDF —
    one codegen'd expression per output component.

    Returns ``(id, proj)`` with ``proj`` an ``array<double>`` of length
    ``out_dim`` (components rounded to ``round_to``).
    """
    if dim is None:
        first = emb.select(vec_col).head(1)
        if not first:
            raise ValueError("random_projection: empty input and no explicit dim=")
        dim = len(first[0][0])
    denom = math.sqrt(out_dim) if scale else 1.0
    hp = _sql_hyperplanes(out_dim, dim)
    comp = (
        f"round({_sql_dot('`__rp_v`', 'h')} / {_dlit(denom)}, {int(round_to)})"
    )
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("__rp_v"),
    ).select(
        "id", F.expr(f"transform({hp}, h -> {comp})").alias("proj")
    )


def pool_embeddings(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    *,
    normalize: bool = True,
) -> DataFrame:
    """Element-wise mean of embeddings per group, optionally L2-normalized
    — the pooling step that turns chunk/passage embeddings into one
    document (or label-centroid) vector before indexing or clustering.

    Distributed shape for 100 TB: ``posexplode`` the vectors into
    (group, dim_index, component) rows, aggregate ``avg`` keyed on
    (group, dim_index) — partial map-side aggregation applies, the
    shuffle key is 2 small ints and a double — then reassemble the array
    with a second groupBy on the group alone (``array_sort`` over
    collect_list of (index, mean) structs; the collected list is bounded
    by the embedding dim, not the group size).  No Python, no driver
    collection, no per-group vector buffering.

    Returns ``(group_col, n_vectors, pooled: array<double>)``.
    """
    exploded = df.select(
        F.col(group_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).select(
        group_col,
        F.posexplode("__v").alias("__i", "__x"),
    )
    # n_vectors = rows at any one dim index; count only index 0 so the
    # count rides the same aggregation as the means
    dim_means = exploded.groupBy(group_col, "__i").agg(
        F.avg("__x").alias("__m"),
        F.count("__x").alias("__n"),
    )
    pooled = dim_means.groupBy(group_col).agg(
        F.max("__n").alias("n_vectors"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("__i", "__m"))),
            lambda s: s["__m"],
        ).alias("pooled"),
    )
    if normalize:
        nrm = F.sqrt(
            F.aggregate(F.col("pooled"), F.lit(0.0), lambda acc, v: acc + v * v)
        )
        pooled = pooled.select(
            group_col,
            "n_vectors",
            F.transform(F.col("pooled"), lambda v: v / nrm).alias("pooled"),
        )
    return pooled


def mutual_nn(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    candidates: DataFrame | None = None,
    min_cosine: float = -1.0,
) -> DataFrame:
    """Mutual nearest neighbors between two embedding sets — the bitext /
    parallel-pair mining rule: (a, b) is kept iff b is a's top-1 AND a is
    b's top-1 by cosine.  Mutuality is the standard precision filter for
    mined translation or caption pairs (margin-based mining keeps the
    same shape).

    ``candidates`` (left_id, right_id) restricts scoring to a candidate
    set — at scale, generate it with lsh_bucket_topk / ivf_topk buckets
    and this becomes two windowed argmaxes over an equi-joined frame.
    Without it, the fallback scores all pairs with the right side
    broadcast — the correctness baseline, quadratic by construction
    (same contract as cosine_pairs vs the LSH paths).

    Ties break on the partner id ascending; pairs below ``min_cosine``
    drop.  Returns ``(left_id, right_id, cosine)``.
    """
    l = left.select(
        F.col(id_col).alias("left_id"),
        F.col(vec_col).cast("array<double>").alias("lv"),
    )
    r = right.select(
        F.col(id_col).alias("right_id"),
        F.col(vec_col).cast("array<double>").alias("rv"),
    )
    if candidates is not None:
        pairs = candidates.select("left_id", "right_id").join(l, "left_id").join(r, "right_id")
    else:
        pairs = l.crossJoin(F.broadcast(r))
    scored = pairs.select(
        "left_id",
        "right_id",
        cosine(F.col("lv"), F.col("rv")).alias("cosine"),
    ).filter(F.col("cosine") >= min_cosine)
    wl = Window.partitionBy("left_id").orderBy(
        F.col("cosine").desc(), F.col("right_id").asc()
    )
    wr = Window.partitionBy("right_id").orderBy(
        F.col("cosine").desc(), F.col("left_id").asc()
    )
    return (
        scored.withColumn("__rl", F.row_number().over(wl))
        .withColumn("__rr", F.row_number().over(wr))
        .filter((F.col("__rl") == 1) & (F.col("__rr") == 1))
        .select("left_id", "right_id", "cosine")
    )
