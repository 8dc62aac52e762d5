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
    ) -> None:
        if nlist < 1:
            raise ValueError(f"nlist must be >= 1, got {nlist}")
        self.spark = spark
        self.index_dir = index_dir.rstrip("/")
        self.id_col = id_col
        self.vec_col = vec_col
        self.nlist = nlist
        self.round_cosine = round_cosine
        self._centroids_cache: list[tuple[int, list[float]]] | None = None
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
        return {
            "dim": dim,
            "nlist": self.nlist,
            "round_cosine": self.round_cosine,
        }

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

    def _assign(self, docs: DataFrame) -> DataFrame:
        from ..operators.similarity import _cell_scores

        cents = self._load_centroids()
        v = F.col(self.vec_col).cast("array<double>")
        return docs.select(
            F.col(self.id_col).alias("__id"), v.alias("__vec")
        ).withColumn(
            "cell",
            -F.array_max(
                _cell_scores(F.col("__vec"), cents, self.round_cosine)
            ).getField("nid"),
        )

    # -- lifecycle ---------------------------------------------------

    def build(
        self,
        corpus: DataFrame,
        *,
        centroids: list[tuple[int, list[float]]] | None = None,
    ) -> None:
        """Create the index from ``corpus``.  ``centroids`` defaults to
        the deterministic hash-ordered sample ``ivf_topk`` uses (pass a
        ``kmeans_fit`` codebook for production recall).  Refuses to
        overwrite a built index — a new codebook invalidates every
        stored assignment, so that is a new index dir.

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
        self._ingest(corpus)
        # the commit point: geometry manifest == build-complete marker
        write_json_rows(
            self.spark, self.index_dir + "/_meta", [self._geometry_fields(dim)]
        )
        self._meta_checked = True

    def _ingest(self, docs: DataFrame) -> None:
        self._assign(docs).write.mode("append").partitionBy("cell").parquet(
            self.index_dir + "/vectors"
        )

    def add(self, docs: DataFrame) -> None:
        """Assign ``docs`` under the frozen codebook and append — the
        per-batch ingest path (map-only: one literal-codebook projection
        plus the partitioned write's clustering)."""
        cents = self._load_centroids()
        self._check_meta(len(cents[0][1]))
        self._ingest(docs)

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
        from ..operators.similarity import _cell_scores, cosine

        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if nprobe < 1:
            raise ValueError(f"nprobe must be >= 1, got {nprobe}")
        cents = self._load_centroids()
        self._check_meta(len(cents[0][1]))
        q = queries.select(
            F.col(self.id_col).alias("query_id"),
            F.col(self.vec_col).cast("array<double>").alias("qv"),
        )
        probed = F.slice(
            F.reverse(
                F.array_sort(
                    _cell_scores(F.col("qv"), cents, self.round_cosine)
                )
            ),
            1,
            min(nprobe, len(cents)),
        )
        q = q.withColumn("cell", F.explode(probed.getField("nid"))).withColumn(
            "cell", -F.col("cell")
        )
        # static partition pruning: the probed cell set is |queries| x
        # nprobe ids, driver-bounded because the query side is small by
        # contract (the brute_force_topk broadcast contract)
        cells = sorted({r["cell"] for r in q.select("cell").distinct().collect()})
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
