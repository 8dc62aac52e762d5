"""Persistent IVF index: disk-backed approximate nearest-neighbor
search over an embedding corpus that grows batch by batch.

The batch operator (``operators/similarity.py: ivf_topk``) re-assigns
the whole corpus to cells on every call; at 100 TB the corpus must be
assigned ONCE, laid out so a query touches only its probed cells, and
extended incrementally as new documents arrive.  This index is that
layout:

- ``build`` trains/loads a codebook (driver-resident by construction —
  an IVF codebook is KBs), assigns every vector to its closest cell
  with the same literal-centroid projection as ``ivf_topk`` (one scan,
  no shuffle except the ``partitionBy`` write clustering), and writes
  the vectors PARTITIONED BY CELL, so the physical layout IS the
  inverted file.
- ``add`` assigns new vectors under the frozen codebook and appends —
  map-only per batch.
- ``query`` probes each query's ``nprobe`` closest cells: the probed
  cell set is collected driver-side (|queries| x nprobe ids — the
  query side is small by contract, same as ``brute_force_topk``) and
  applied as a STATIC partition filter, so the parquet scan reads
  ``nprobe/nlist`` of the data regardless of corpus size; candidates
  then broadcast-join on the cell and rank on rounded cosine (ties ->
  neighbor id), the ``ivf_topk``/q31 determinism idiom.
- ``compact`` bounds per-cell file counts after many ``add`` batches
  (the duplicate-window is exact: the read path dedups candidates on
  (query, neighbor) before ranking).
- ``pq_m`` turns on IVF-PQ: build/add additionally product-quantize
  every vector (codebooks frozen at build beside the cell codebook),
  and ``query_adc`` scans the probed cells as their ``pq_m``-byte code
  columns only — asymmetric distance against a broadcast per-query
  LUT, optionally re-ranked exactly over the raw vectors
  (``refine=R``).  This is the layout that stays RAM-sized when the
  raw vectors are terabytes.

The codebook manifest freezes (dim, nlist, rounding) — vectors
assigned under one codebook and probed under another are silent recall
loss, the same hazard class the LSH/CMS/drift geometry manifests close,
so a mismatched reopen RAISES.

Reference scope note: the reference (etielle) has no ANN surface; this
is part of the engine's training-data extension family (SemDedup, IVF,
LSH top-k) and composes with ``operators/similarity.py: ann_recall``
as its acceptance gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from .incremental_drift import _check_geometry


class PersistentIVFIndex:
    """Disk-backed IVF index at ``index_dir``: a ``_meta`` geometry
    manifest, a ``_centroids`` codebook, and ``vectors/cell=N/``
    parquet partitions."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        *,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        nlist: int = 16,
        round_cosine: int = 6,
        pq_m: int | None = None,
        pq_centroids: int = 16,
        pq_residual: bool = True,
    ) -> None:
        """``pq_m`` turns on IVF-PQ: vectors are additionally
        product-quantized into ``pq_m`` codes per vector at build/add
        time (codebooks frozen at build, persisted beside the cell
        codebook), and :meth:`query_adc` searches the probed cells by
        asymmetric distance over the CODE columns only — the scan that
        stays RAM-sized when raw vectors are terabytes.  PQ geometry is
        part of the index geometry: a mismatched reopen raises."""
        if nlist < 1:
            raise ValueError(f"nlist must be >= 1, got {nlist}")
        if pq_m is not None and pq_m < 1:
            raise ValueError(f"pq_m must be >= 1 or None, got {pq_m}")
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col
        self.nlist = nlist
        self.round_cosine = round_cosine
        self.pq_m = pq_m
        self.pq_centroids = int(pq_centroids)
        self.pq_residual = bool(pq_residual)
        self._centroids_cache: list[tuple[int, list[float]]] | None = None
        self._pq_cache: list[list[tuple[int, list[float]]]] | None = None
        self._meta_checked = False

    # -- codebook ----------------------------------------------------

    def _centroids_dir(self) -> str:
        return self.index_dir + "/_centroids"

    def _load_centroids(self) -> list[tuple[int, list[float]]]:
        """The frozen codebook (cached per instance — it never changes
        after build; a new codebook is a new index).  Driver-side read
        (streaming/manifest.py): the codebook is KBs by construction,
        and a fresh instance must not pay a Spark job to open it."""
        if self._centroids_cache is not None:
            return self._centroids_cache
        from .manifest import read_json_rows

        rows = read_json_rows(self.spark, self._centroids_dir())
        if not rows:
            raise ValueError(
                f"PersistentIVFIndex: no codebook at {self.index_dir} — "
                "call build() first"
            )
        cents = sorted(
            (int(r["cell"]), [float(x) for x in r["vec"]]) for r in rows
        )
        self._centroids_cache = cents
        return cents

    def _geometry_fields(self, dim: int) -> dict:
        # pq fields are 0 when PQ is off — also what a pre-PQ manifest
        # reads as, so old indexes reopen cleanly with pq_m=None and
        # mismatch loudly against a PQ-on instance
        return {
            "dim": dim,
            "nlist": self.nlist,
            "round_cosine": self.round_cosine,
            "pq_m": self.pq_m or 0,
            "pq_centroids": self.pq_centroids if self.pq_m else 0,
            "pq_residual": 1 if (self.pq_m and self.pq_residual) else 0,
        }

    # -- PQ codebooks (IVF-PQ mode) -----------------------------------

    def _pq_dir(self) -> str:
        return self.index_dir + "/_pq"

    def _load_pq(self) -> list[list[tuple[int, list[float]]]]:
        """The frozen per-subspace PQ codebooks (cached per instance)."""
        if self._pq_cache is not None:
            return self._pq_cache
        from .manifest import read_json_rows

        rows = read_json_rows(self.spark, self._pq_dir())
        if not rows:
            raise ValueError(
                f"PersistentIVFIndex: no PQ codebooks at {self.index_dir} — "
                "the index was built without pq_m"
            )
        by_space: dict[int, list[tuple[int, list[float]]]] = {}
        for r in rows:
            by_space.setdefault(int(r["subspace"]), []).append(
                (int(r["code"]), [float(x) for x in r["vec"]])
            )
        cbs = [sorted(by_space[j]) for j in sorted(by_space)]
        self._pq_cache = cbs
        return cbs

    def _code_source(self, col, cents=None):
        """What the PQ codes store: the residual vs the assigned cell's
        centroid (``pq_residual=True``, the IVFADC layout — right for
        real clustered corpora, where within-cell structure is the
        signal) or the raw vector (``pq_residual=False`` — measurably
        better on structure-free/isotropic corpora, where subtracting
        an arbitrary seed centroid only doubles the variance the
        codebook must cover; receipts in SCALING.md)."""
        if self.pq_residual:
            return F.zip_with(
                col, self._centroid_of_cell(cents), lambda a, b: a - b
            )
        return col

    def residual_training_frame(
        self,
        corpus: DataFrame,
        centroids: list[tuple[int, list[float]]],
    ) -> DataFrame:
        """The frame ``pq_books`` must be TRAINED on in residual mode:
        ``(__id, __resid)`` with ``__resid = vec - centroid[cell]``
        under ``centroids`` (the cell codebook you will pass to
        :meth:`build`).  In the default ``pq_residual=True`` layout the
        stored codes quantize residuals, so a codebook trained on raw
        vectors silently degrades ADC recall — train on this frame:

            cents = kmeans_fit(corpus, ...)
            frame = idx.residual_training_frame(corpus, cents)
            books = pq_fit(frame, "__id", "__resid", m=..., salt="ivfpq-residual")
            idx.build(corpus, centroids=cents, pq_books=books)

        Pass a ``salt`` to ``pq_fit`` (as above): the unsalted seed
        order can hand back the cell codebook's own sample, whose
        residuals are exactly zero.  Callable before :meth:`build`
        (takes the centroids explicitly; nothing is read from or
        written to the index dir).  In raw mode (``pq_residual=False``)
        ``__resid`` IS the raw vector, so training on this frame is
        correct in both modes."""
        cents = sorted(
            (int(c), [float(x) for x in vec]) for c, vec in centroids
        )
        return self._assign(corpus, cents=cents).select(
            F.col("__id"),
            self._code_source(F.col("__vec"), cents=cents).alias("__resid"),
        )

    def _centroid_of_cell(self, cents=None):
        """Literal cell->centroid map, indexed by the ``cell`` column —
        the codebook is KBs, so this is a constant expression."""
        from ..operators.similarity import _darr

        if cents is None:
            cents = self._load_centroids()
        keys = ", ".join(str(int(c)) for c, _ in cents)
        vals = ", ".join(_darr(vec) for _, vec in cents)
        return F.expr(
            f"map_from_arrays(array({keys}), array({vals}))[`cell`]"
        )

    def _with_codes(self, assigned: DataFrame) -> DataFrame:
        """Append the ``__codes`` column: PQ codes of the RESIDUAL
        ``vec - centroid[cell]`` (the IVFADC layout, Jegou et al. 2011).
        Quantizing residuals, not raw vectors, is what lets ``m`` bytes
        resolve WITHIN-cell structure: on a clustered corpus the raw
        vectors of one cell collapse to near-identical codes (measured:
        ADC recall 0.05 on 550k vectors in 256 tight clusters) while
        their residuals spread across the codebook.  Same map-only
        literal-codebook projection as ``pq_codes``."""
        from ..operators.similarity import _sql_pq_best

        cbs = self._load_pq()
        tagged = assigned.withColumn(
            "__resid", self._code_source(F.col("__vec"))
        )
        best = _sql_pq_best(cbs, "__resid")
        return tagged.withColumn(
            "__codes",
            F.expr(f"transform({best}, s -> CAST(s.b.code AS BIGINT))"),
        ).drop("__resid")

    def _check_meta(self, dim: int) -> None:
        # checked once per instance (the IncrementalLSHDedup idiom):
        # geometry never changes after build, so a steady-state ingest
        # loop must not pay a JSON manifest read per batch.  The manifest
        # doubles as build()'s commit marker (written LAST), so a MISSING
        # manifest raises — a codebook without it is a crashed build whose
        # vector set may be partial, the silent-recall-loss hazard this
        # module exists to close.
        if self._meta_checked:
            return
        _check_geometry(
            self.spark,
            self.index_dir + "/_meta",
            "PersistentIVFIndex",
            self.index_dir,
            self._geometry_fields(dim),
            on_missing="raise",
        )
        self._meta_checked = True

    # -- assignment (shared with ivf_topk) ---------------------------

    def _assign(self, docs: DataFrame, cents=None) -> DataFrame:
        from ..operators.similarity import _cell_scores

        if cents is None:
            cents = self._load_centroids()
        v = F.col(self.vec_col).cast("array<double>")
        return docs.select(
            F.col(self.id_col).alias("__id"), v.alias("__vec")
        ).withColumn(
            "cell",
            -F.array_max(
                _cell_scores("__vec", cents, self.round_cosine)
            ).getField("nid"),
        )

    # -- lifecycle ---------------------------------------------------

    def build(
        self,
        corpus: DataFrame,
        *,
        centroids: list[tuple[int, list[float]]] | None = None,
        pq_books: list[list[tuple[int, list[float]]]] | None = None,
    ) -> None:
        """Create the index from ``corpus``.  ``centroids`` defaults to
        the deterministic hash-ordered sample ``ivf_topk`` uses (pass a
        ``kmeans_fit`` codebook for production recall).  In PQ mode,
        ``pq_books`` defaults to the seed-sample codebooks — pass an
        ``operators.similarity.pq_fit`` result for trained quantizers,
        and in the default ``pq_residual=True`` layout train it on the
        RESIDUAL distribution via :meth:`residual_training_frame` (the
        stored codes quantize ``vec - centroid[cell]``; a codebook
        trained on raw vectors silently degrades ADC recall — raw
        vectors are unit-scale, residuals are not).
        Refuses to overwrite a built index — a new codebook invalidates
        every stored assignment, so that is a new index dir.

        Crash-atomic (the streaming/compaction.py crash-window
        discipline): the geometry manifest is written LAST, as the
        build-complete marker.  A crash anywhere before it leaves an
        index that ``add()``/``query()`` REFUSE (no marker) instead of
        silently searching a partial corpus, and a re-run of ``build()``
        clears the crashed attempt's codebook/vectors before starting
        clean."""
        from ..operators.similarity import _seed_vectors
        from .compaction import _hadoop_delete
        from .manifest import read_json_rows, write_json_rows

        if read_json_rows(self.spark, self.index_dir + "/_meta"):
            raise ValueError(
                f"PersistentIVFIndex: {self.index_dir} already has a "
                "codebook; build() on a fresh dir (assignments are "
                "frozen to their codebook)"
            )
        if centroids is None:
            centroids = _seed_vectors(
                corpus, self.id_col, self.vec_col, self.nlist
            )
        if not centroids:
            raise ValueError("PersistentIVFIndex.build: empty corpus")
        # no marker: any codebook/vectors here are a crashed build's
        # partial state (possibly assigned under different centroids) —
        # garbage by contract, cleared before the clean rebuild
        _hadoop_delete(self.spark, self._centroids_dir(), True)
        _hadoop_delete(self.spark, self._pq_dir(), True)
        _hadoop_delete(self.spark, self.index_dir + "/vectors", True)
        cents = sorted(
            (int(c), [float(x) for x in vec]) for c, vec in centroids
        )
        dim = len(cents[0][1])
        write_json_rows(
            self.spark,
            self._centroids_dir(),
            [{"cell": c, "vec": v} for c, v in cents],
        )
        self._centroids_cache = cents
        if self.pq_m:
            from ..operators.similarity import pq_codebooks

            if pq_books is None:
                # sample the codebooks from RESIDUALS, the quantity the
                # codes store (raw-vector samples are unit-scale and
                # quantize the small residuals badly).  SALTED sample:
                # the unsalted hash order is the cell codebook's own
                # sample, and a cell seed's residual vs its own cell is
                # exactly zero — unsalted, every PQ centroid collapsed
                # to the zero vector (all codes 0, ADC constant per
                # cell).  The zero-residual filter closes the same hole
                # for any seed that still collides.
                resid = (
                    self._assign(corpus)
                    .select(
                        F.col("__id"),
                        self._code_source(F.col("__vec")).alias("__resid"),
                    )
                    .filter(F.exists("__resid", lambda x: x != 0))
                )
                pq_books = pq_codebooks(
                    resid,
                    "__id",
                    "__resid",
                    m=self.pq_m,
                    n_centroids=self.pq_centroids,
                    dim=dim,
                    salt="ivfpq-residual",
                )
            cbs = pq_books
            write_json_rows(
                self.spark,
                self._pq_dir(),
                [
                    {"subspace": j, "code": int(ci), "vec": list(v)}
                    for j, cb in enumerate(cbs)
                    for ci, v in cb
                ],
            )
            self._pq_cache = cbs
        self._ingest(corpus)
        # the commit point: geometry manifest == build-complete marker
        write_json_rows(
            self.spark, self.index_dir + "/_meta", [self._geometry_fields(dim)]
        )
        self._meta_checked = True

    def _ingest(self, docs: DataFrame) -> None:
        assigned = self._assign(docs)
        if self.pq_m:
            assigned = self._with_codes(assigned)
        assigned.write.mode("append").partitionBy("cell").parquet(
            self.index_dir + "/vectors"
        )

    def add(self, docs: DataFrame) -> None:
        """Assign ``docs`` under the frozen codebook and append — the
        per-batch ingest path (map-only: one literal-codebook projection
        plus the partitioned write's clustering)."""
        cents = self._load_centroids()
        self._check_meta(len(cents[0][1]))
        self._ingest(docs)

    def _probed_queries(self, queries: DataFrame, nprobe: int):
        """(query frame exploded to its probed cells, sorted probed cell
        ids, distinct query count).  The cell id set is |queries| x
        nprobe, driver-bounded because the query side is small by
        contract (the brute_force_topk broadcast contract) — and the
        contract is ENFORCED: the same single job that collects the
        probed cells counts the queries, and an oversized frame raises
        the shard hint instead of OOMing the broadcast.  Applying the
        cell set as a static partition filter is what keeps the scan at
        nprobe/nlist of the corpus regardless of size."""
        from ..operators.similarity import (
            MAX_BROADCAST_QUERY_ROWS,
            _cell_scores,
        )

        cents = self._load_centroids()
        self._check_meta(len(cents[0][1]))
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).cast("array<double>").alias("qv"),
        )
        probed = F.slice(
            F.reverse(
                F.array_sort(
                    _cell_scores("qv", cents, self.round_cosine)
                )
            ),
            1,
            min(nprobe, len(cents)),
        )
        q = q.withColumn("cell", F.explode(probed.getField("nid"))).withColumn(
            "cell", -F.col("cell")
        )
        row = q.agg(
            F.collect_set("cell").alias("cells"),
            F.count_distinct("query_id").alias("nq"),
        ).head()
        nq = int(row["nq"])
        if nq > MAX_BROADCAST_QUERY_ROWS:
            raise ValueError(
                f"PersistentIVFIndex: {nq} query vectors exceed the "
                f"{MAX_BROADCAST_QUERY_ROWS}-row broadcast contract — "
                "shard your query set (loop over slices and union the "
                "per-slice top-k)"
            )
        cells = sorted(int(c) for c in row["cells"])
        return q, cells, nq

    def query(
        self,
        queries: DataFrame,
        *,
        k: int = 10,
        nprobe: int = 3,
        exclude_self: bool = True,
    ) -> DataFrame:
        """Top-``k`` neighbors from the ``nprobe`` closest cells per
        query.  Returns ``(query_id, neighbor_id, cosine, rank)`` —
        the ``ivf_topk`` schema, so :func:`ann_recall` gates it
        directly.  With ``nprobe >= nlist`` this is exhaustive."""
        from ..operators.similarity import cosine

        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if nprobe < 1:
            raise ValueError(f"nprobe must be >= 1, got {nprobe}")
        q, cells, nq = self._probed_queries(queries, nprobe)
        vecs = (
            self.spark.read.parquet(self.index_dir + "/vectors")
            .filter(F.col("cell").isin(cells))
            .select(
                F.col("__id").alias("neighbor_id"),
                F.col("__vec").alias("cv"),
                "cell",
            )
        )
        cos = F.round(cosine(F.col("qv"), F.col("cv")), self.round_cosine)
        scored = vecs.join(F.broadcast(q), "cell")
        if exclude_self:
            scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
        scored = scored.select(
            "query_id", "neighbor_id", cos.alias("cosine")
        ).dropDuplicates(["query_id", "neighbor_id"])
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )

    def query_adc(
        self,
        queries: DataFrame,
        *,
        k: int = 10,
        nprobe: int = 3,
        refine: int | None = None,
        exclude_self: bool = True,
    ) -> DataFrame:
        """IVF-PQ search (requires ``pq_m`` at build): the probed cells
        are scanned as their CODE columns only — ``pq_m`` longs per
        vector instead of the raw floats, the column pruning that keeps
        a billion-vector probe RAM-sized — and scored by asymmetric
        distance against broadcast residual LUTs (one per query x
        probed cell, because the codes store ``vec - centroid[cell]``:
        the IVFADC layout; see ``_with_codes``).

        ``refine=R`` re-ranks the ADC top ``R*k`` shortlist per query
        with EXACT cosine over the raw vectors — one additional
        shortlist-pruned scan of the same probed cells — and returns
        the :meth:`query` schema ``(query_id, neighbor_id, cosine,
        rank)``; ``refine=None`` returns ``(query_id, neighbor_id,
        adc_dist, rank)`` ranked by ascending ADC distance.  Gate
        either mode with ``ann_recall`` like every ANN shortcut.

        Replay-exact like :meth:`query`: duplicate appended rows are
        deduplicated per (query, neighbor, subspace) before the ADC sum
        and per (query, neighbor) before the refine rank."""
        from ..operators.similarity import cosine

        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if nprobe < 1:
            raise ValueError(f"nprobe must be >= 1, got {nprobe}")
        if refine is not None and refine < 1:
            raise ValueError(f"refine must be >= 1 or None, got {refine}")
        if not self.pq_m:
            raise ValueError(
                "PersistentIVFIndex.query_adc: index opened without pq_m — "
                "ADC search needs the PQ codes written at build/add time"
            )
        cbs = self._load_pq()
        q, cells, nq = self._probed_queries(queries, nprobe)
        quniq = q.select("query_id", "qv").dropDuplicates(["query_id"])

        # IVFADC residual LUTs: codes store vec - centroid[cell], so the
        # lookup table is per (query, PROBED CELL) — the query's residual
        # vs that cell's centroid, against every codebook entry.
        # |queries| x nprobe x m x n_centroids rows — the
        # small-query contract, ENFORCED in LUT rows (the nq count comes
        # free with the probed-cells job) so a fat codebook or deep
        # nprobe tightens the query cap proportionally.
        from ..operators.similarity import MAX_BROADCAST_LUT_ROWS

        lut_rows = nq * min(nprobe, self.nlist) * sum(len(cb) for cb in cbs)
        if lut_rows > MAX_BROADCAST_LUT_ROWS:
            raise ValueError(
                f"PersistentIVFIndex.query_adc: the residual LUT would be "
                f"{lut_rows} rows ({nq} queries x {min(nprobe, self.nlist)} "
                f"probed cells x {sum(len(cb) for cb in cbs)} codebook "
                f"entries), past the {MAX_BROADCAST_LUT_ROWS}-row broadcast "
                "bound — shard your query set or lower nprobe"
            )
        from ..operators.similarity import _sql_pq_lut

        qr = q.withColumn("__qr", self._code_source(F.col("qv")))
        lut = qr.select(
            "query_id",
            "cell",
            F.explode(F.expr(_sql_pq_lut(cbs, "__qr"))).alias("r"),
        ).select("query_id", "cell", "r.subspace", "r.code", "r.d")

        codes = (
            self.spark.read.parquet(self.index_dir + "/vectors")
            .filter(F.col("cell").isin(cells))
            .select(
                F.col("__id").alias("neighbor_id"),
                "cell",
                F.posexplode("__codes").alias("subspace", "code"),
            )
            .withColumn("subspace", F.col("subspace").cast("long"))
        )
        scored = (
            codes.join(F.broadcast(lut), ["cell", "subspace", "code"])
            .dropDuplicates(["query_id", "neighbor_id", "subspace"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.round(F.sum("d"), 6).alias("adc_dist"))
        )
        if exclude_self:
            scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
        w_adc = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("neighbor_id").asc()
        )
        if refine is None:
            return (
                scored.withColumn("rank", F.row_number().over(w_adc))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "adc_dist", "rank")
            )
        shortlist = (
            scored.withColumn("rank", F.row_number().over(w_adc))
            .filter(F.col("rank") <= refine * k)
            .select("query_id", "neighbor_id")
        )
        raw = (
            self.spark.read.parquet(self.index_dir + "/vectors")
            .filter(F.col("cell").isin(cells))
            .select(F.col("__id").alias("neighbor_id"), F.col("__vec").alias("cv"))
        )
        sl = shortlist.join(quniq, "query_id")  # |q| x refine*k rows
        cos = F.round(cosine(F.col("qv"), F.col("cv")), self.round_cosine)
        exact = (
            raw.join(F.broadcast(sl), "neighbor_id")
            .select("query_id", "neighbor_id", cos.alias("cosine"))
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id").asc()
        )
        return (
            exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank")
        )

    def query_sharded(
        self,
        queries: DataFrame,
        *,
        shard_rows: int | None = None,
        max_shards: int = 64,
        adc: bool = False,
        **query_kwargs,
    ) -> DataFrame:
        """Driver-paced sharding of a large query set over
        :meth:`query` (or :meth:`query_adc` with ``adc=True``) — the
        index-side twin of ``operators.similarity.topk_sharded``, and
        the API form of the broadcast guard's "shard your query set"
        hint.  Queries split into hash shards of at most ``shard_rows``
        (default: the broadcast cap), each shard runs the normal probed
        query, and the union is identical to the unsharded call (each
        query's top-k depends only on its own vector).  Each shard pays
        its own probed-cells scan — the honest price of a query set
        that cannot ride one broadcast.  ``max_shards`` bounds the
        driver loop; a query set past it is a second corpus (join it
        cell-to-cell instead).

        The default ``shard_rows`` is half the binding cap (hash
        shards balance only in expectation — the slack keeps the inner
        guard from tripping at the boundary): the broadcast row cap
        for raw queries, the much tighter LUT-row cap in ADC mode
        (``nprobe x pq_m x pq_centroids`` LUT rows per query)."""
        from ..operators.similarity import (
            MAX_BROADCAST_LUT_ROWS,
            MAX_BROADCAST_QUERY_ROWS,
            _shard_loop,
        )

        if shard_rows is None:
            cap = MAX_BROADCAST_QUERY_ROWS
            if adc:
                lut_per_query = min(
                    int(query_kwargs.get("nprobe", 3)), self.nlist
                ) * sum(len(cb) for cb in self._load_pq())
                cap = min(
                    cap, max(1, MAX_BROADCAST_LUT_ROWS // max(1, lut_per_query))
                )
            shard_rows = max(1, cap // 2)
        op = self.query_adc if adc else self.query
        return _shard_loop(
            queries,
            self.id_col,
            shard_rows,
            max_shards,
            lambda q: op(q, **query_kwargs),
            what="query_sharded",
            too_many_hint=(
                "join the query frame against the cell layout directly "
                "instead"
            ),
        )

    def attach(self, *, compact_every: int | None = 8) -> "callable":
        """``foreachBatch`` adapter: returns a ``(df, batch_id)``
        callable that ingests each micro-batch under the frozen
        codebook (``build()`` must have run).  A replayed batch
        re-appends the same vectors, which is EXACT for the read path:
        ``query`` dedups candidates on (query, neighbor) before
        ranking, so duplicate rows cannot change any result — the same
        contract that makes the LSH index replay-safe.

        ``compact_every=N`` folds per-cell files every N batches —
        every ``add()`` appends at least one file per touched cell, so
        an UNcompacted 1-doc-per-trigger stream grows
        O(batches x cells) files; the default cadence bounds steady
        state at ~``compact_every`` files/cell.  Pass ``None`` to
        manage compaction yourself (``files_per_cell()`` is the
        cadence probe)."""

        def _fn(df: DataFrame, batch_id: int) -> None:
            self.add(df)
            if compact_every and batch_id % compact_every == compact_every - 1:
                self.compact(min_files=2)

        return _fn

    def files_per_cell(self) -> dict[int, int]:
        """Driver-side FS probe: data-file count per cell partition —
        the compaction-cadence signal (many ``add()`` batches push the
        per-cell file count up; ``compact()`` folds it back down).
        Empty dict when no vectors have been written."""
        jvm = self.spark.sparkContext._jvm
        root = jvm.org.apache.hadoop.fs.Path(self.index_dir + "/vectors")
        fs = root.getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration()
        )
        if not fs.exists(root):
            return {}
        out: dict[int, int] = {}
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("cell=")):
                continue
            n = sum(
                1
                for f in fs.listStatus(st.getPath())
                if not f.isDirectory()
                and not f.getPath().getName().startswith((".", "_"))
            )
            out[int(name[len("cell="):])] = n
        return out

    def compact(self, *, min_files: int = 8, target_files: int = 1) -> int:
        """Rewrite cells whose partition holds >= ``min_files`` files as
        ``target_files`` files each; returns the number of cells
        compacted.  Safe under the flat idempotent contract: the query
        path dedups candidates on (query, neighbor) before ranking, so
        the crash window where old and new files coexist cannot change
        any result."""
        from .compaction import compact_flat_parquet

        jvm = self.spark.sparkContext._jvm
        root = jvm.org.apache.hadoop.fs.Path(self.index_dir + "/vectors")
        fs = root.getFileSystem(
            self.spark.sparkContext._jsc.hadoopConfiguration()
        )
        if not fs.exists(root):
            return 0
        done = 0
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("cell=")):
                continue
            if compact_flat_parquet(
                self.spark,
                f"{self.index_dir}/vectors/{name}",
                min_files=min_files,
                target_files=target_files,
            ):
                done += 1
        return done
