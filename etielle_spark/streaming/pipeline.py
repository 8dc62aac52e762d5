"""Chunked streaming execution with flush strategies.

Reference lifecycle (etielle/fluent.py:1987-2026): per chunk — map, validate
relationship-completeness, bind, flush via strategy, evict.  Here a chunk's
roots become rows of one DataFrame (so the chunk's keyed merges are one
groupBy with a correct cross-root arrival order), the compiled plan is
reused, and "evict" is just micro-batch scope.

Flush strategies (reference: etielle/chunking.py:281-677):
- KeyCompleteFlushStrategy: plain append.
- UpsertFlushStrategy("update"): key conflict -> replace whole row.
- UpsertFlushStrategy("skip"):   key conflict -> keep existing row.
- BufferedKeyFlushStrategy: the reference's bounded-LRU re-merge; with a
  real table store the LRU bound is unnecessary (state lives in the store,
  not the driver), so it behaves as "update".  At cluster scale the same
  semantics come from Delta MERGE or dropDuplicatesWithinWatermark.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..fluent import (
    PipelineBuilder,
    PipelineResult,
    _prepare_obj,
    _read_prepared_json,
    _variant_paths,
)
from .chunks import Chunk, ChunkSource, RelationshipIncompleteError


class TableStore:
    """Accumulated output tables across chunk flushes.

    In-memory DataFrame store for tests/drivers; a production sink swaps
    this for Delta/JDBC while keeping the same strategy semantics.  Every
    ``checkpoint_every`` puts, the accumulated plan is truncated with
    ``localCheckpoint`` — otherwise hundreds of chunk flushes build a
    union/anti-join lineage that overwhelms the optimizer.
    """

    def __init__(self, checkpoint_every: int = 16) -> None:
        self._tables: dict[str, DataFrame] = {}
        self._puts: dict[str, int] = {}
        self._checkpoint_every = checkpoint_every

    def get(self, name: str) -> Optional[DataFrame]:
        return self._tables.get(name)

    def put(self, name: str, df: DataFrame) -> None:
        n = self._puts.get(name, 0) + 1
        self._puts[name] = n
        if self._checkpoint_every and n % self._checkpoint_every == 0:
            df = df.localCheckpoint(eager=True)
        self._tables[name] = df

    @property
    def tables(self) -> dict[str, DataFrame]:
        return dict(self._tables)


class FlushStrategy:
    def flush(
        self,
        store: TableStore,
        name: str,
        df: DataFrame,
        keys: Optional[list[str]],
    ) -> None:  # pragma: no cover - interface
        raise NotImplementedError


class KeyCompleteFlushStrategy(FlushStrategy):
    """Append-only (chunking.py:281-315); the default."""

    def flush(self, store, name, df, keys):
        old = store.get(name)
        store.put(name, df if old is None else old.unionByName(df, allowMissingColumns=True))


class UpsertFlushStrategy(FlushStrategy):
    """'update': PK conflict -> overwrite whole row (chunking.py:361-501);
    'skip': PK conflict -> keep existing row (chunking.py:503-540)."""

    def __init__(self, mode: str = "update"):
        if mode not in ("update", "skip"):
            raise ValueError(f"UpsertFlushStrategy: unknown mode {mode!r}")
        self.mode = mode

    def flush(self, store, name, df, keys):
        old = store.get(name)
        if old is None or not keys:
            KeyCompleteFlushStrategy().flush(store, name, df, keys)
            return
        if self.mode == "update":
            kept_old = old.join(df.select(*keys).dropDuplicates(), keys, "left_anti")
            store.put(name, kept_old.unionByName(df, allowMissingColumns=True))
        else:
            fresh = df.join(old.select(*keys).dropDuplicates(), keys, "left_anti")
            store.put(name, old.unionByName(fresh, allowMissingColumns=True))


class BufferedKeyFlushStrategy(FlushStrategy):
    """Bounded LRU of recently-flushed keys (chunking.py:543-677).

    A key still in the LRU merges onto its existing row
    (last-non-None-write-wins per column); a key EVICTED from the LRU
    re-inserts as a new row — the reference's documented heuristic, where
    correctness is bounded by ``max_keys`` and the worst-case key
    reappearance gap.  Divergence from the reference (rows have no
    Python identity here): a cached key with earlier eviction-duplicates
    updates ALL rows of that key, not just the cached instance.
    Chunk key sets are collected driver-side — bounded by chunk size,
    exactly like the reference's per-chunk instance dict."""

    def __init__(self, max_keys: int = 10_000):
        if max_keys < 1:
            raise ValueError(f"max_keys must be >= 1, got {max_keys}")
        self.max_keys = max_keys
        from collections import OrderedDict

        self._lru: "OrderedDict[tuple, None]" = OrderedDict()

    def _record(self, name: str, keys: list[tuple]) -> None:
        for k in keys:
            ck = (name, k)
            if ck in self._lru:
                self._lru.move_to_end(ck)
            else:
                self._lru[ck] = None
        while len(self._lru) > self.max_keys:
            self._lru.popitem(last=False)

    def flush(self, store, name, df, keys):
        old = store.get(name)
        if not keys:
            KeyCompleteFlushStrategy().flush(store, name, df, keys)
            return
        incoming = [tuple(r) for r in df.select(*keys).dropDuplicates().collect()]
        if old is None:
            KeyCompleteFlushStrategy().flush(store, name, df, keys)
            self._record(name, incoming)
            return
        cached = [k for k in incoming if (name, k) in self._lru]
        if cached:
            spark = df.sparkSession
            cached_df = spark.createDataFrame(cached, df.select(*keys).schema)
            upd_new = df.join(F.broadcast(cached_df), list(keys), "left_semi")
            ins_new = df.join(F.broadcast(cached_df), list(keys), "left_anti")
            # Single left join over the store: cached-key rows merge
            # column-wise, every other row passes through (the probe misses,
            # coalesce keeps the old value).  `old` must appear exactly ONCE
            # in the new plan — a touched/rest split references it twice and
            # triples the plan per flush, exploding analysis time long
            # before the TableStore's every-16-puts checkpoint can truncate.
            ocols = [c for c in old.columns if c not in keys]
            ncols = set(upd_new.columns)
            merged = (
                old.alias("o")
                .join(F.broadcast(upd_new).alias("n"), list(keys), "left")
                .select(
                    *[F.col(k) for k in keys],
                    *[
                        (
                            F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}"))
                            if c in ncols
                            else F.col(f"o.{c}")
                        ).alias(c)
                        for c in ocols
                    ],
                )
            )
            store.put(name, merged.unionByName(ins_new, allowMissingColumns=True))
        else:
            store.put(name, old.unionByName(df, allowMissingColumns=True))
        self._record(name, incoming)


class StreamResult:
    def __init__(
        self,
        tables: dict[str, DataFrame],
        n_chunks: int,
        errors: Optional[dict[str, DataFrame]] = None,
    ):
        self.tables = tables
        self.n_chunks = n_chunks
        self.errors = errors or {}

    def __getitem__(self, name: str) -> DataFrame:
        return self.tables[name]


class StreamPipeline(PipelineBuilder):
    """``stream(source).goto(...).each().map_to(...).run()``
    (reference: etielle/fluent.py:2155-2195)."""

    def __init__(
        self,
        source: ChunkSource,
        *,
        spark: Optional[SparkSession] = None,
        eager_roots: Sequence[Any] = (),
        flush_strategy: Optional[FlushStrategy] = None,
        errors: str = "collect",
    ):
        super().__init__(object(), spark=spark, errors=errors)
        self._source = source
        self._eager_roots = list(eager_roots)
        self._strategy = flush_strategy or KeyCompleteFlushStrategy()
        self._eager_internal: dict[str, DataFrame] = {}

    def goto_root(self, index: int = 0) -> "StreamPipeline":
        """Root count is a per-chunk property for streams; grow the
        placeholder list so the batch builder's bounds check passes
        (actual arity is validated when each chunk runs)."""
        while len(self._roots) <= index:
            self._roots.append(object())
        return super().goto_root(index)

    # -- helpers ------------------------------------------------------------

    def _clone_with_roots(self, roots: list, order_col: Optional[str]) -> PipelineBuilder:
        b = PipelineBuilder(*roots, spark=self._spark, errors=self._errors_mode, order_col=order_col)
        b._emissions = self._emissions
        b._links = self._links
        b._backlinks = self._backlinks
        b._index_specs = self._index_specs
        b._eager_tables = self._eager_tables
        b._model_classes = self._model_classes
        return b

    def _combined_root_df(self, spark: SparkSession, roots: tuple) -> DataFrame:
        """Sequential chunk: roots become rows of one DataFrame with an
        arrival-order column, so cross-root keyed merges see reference
        ordering (fluent.py:1406-1433)."""
        objs = [_as_obj(r) for r in roots]
        for o in objs:
            if "__roword" in o:
                raise ValueError(
                    "sequential chunk roots must not contain a '__roword' key "
                    "(reserved for the synthetic arrival order)"
                )
        # _prepare_obj injects the __keys__/__empty__ presence markers, so
        # dict iteration over schema-unioned chunk rows stays per-row exact
        vp = _variant_paths(objs)
        prepared = [_prepare_obj(o, vp) for o in objs]
        payloads = [
            json.dumps({"__roword": i, **p}) for i, p in enumerate(prepared)
        ]
        # null-only-leaf schema fix (fluent._read_prepared_json): leaves
        # None everywhere in THIS chunk read as VOID, not string, so the
        # emission unions keep the other emissions' real types
        return _read_prepared_json(spark, payloads, prepared)

    def _run_chunk(self, spark: SparkSession, chunk: Chunk) -> PipelineResult:
        if chunk.sequential:
            if any(em.root_index != 0 for em in self._emissions):
                raise ValueError(
                    "sequential chunks require a single-root pipeline "
                    "(reference fluent.py:1797-1829)"
                )
            root_df = self._combined_root_df(spark, chunk.roots)
            b = self._clone_with_roots([root_df], order_col="__roword")
        else:
            b = self._clone_with_roots(list(chunk.roots), order_col=None)
        return b.run(extra_parents=self._eager_internal or None)

    def _validate_completeness(
        self,
        result: PipelineResult,
        eager_store: dict[str, DataFrame],
    ) -> None:
        """Every child's parent must be in the chunk or eager
        (reference relationships.py:545-616)."""
        for spec in self._links:
            if spec.child not in result._tables_dict:
                continue
            # internal frames: TempField by-fields are valid match keys
            child = result._internal[spec.child]
            (cf, pf), *_ = spec.by.items()
            parents = []
            if spec.parent in result._internal:
                parents.append(result._internal[spec.parent].select(F.col(pf).alias("__p")))
            if spec.parent in self._eager_internal:
                parents.append(
                    self._eager_internal[spec.parent].select(F.col(pf).alias("__p"))
                )
            if not parents:
                missing = child.filter(F.col(cf).isNotNull()).limit(1).collect()
                if missing:
                    raise RelationshipIncompleteError(
                        f"chunk has {spec.child}.{cf} but no '{spec.parent}' rows "
                        f"(and '{spec.parent}' is not eager)"
                    )
                continue
            pool = parents[0]
            for p in parents[1:]:
                pool = pool.unionByName(p)
            orphan = (
                child.filter(F.col(cf).isNotNull())
                .join(F.broadcast(pool.dropDuplicates()), child[cf] == pool["__p"], "left_anti")
                .limit(3)
                .collect()
            )
            if orphan:
                hints = [r[cf] for r in orphan]
                raise RelationshipIncompleteError(
                    f"chunk-incomplete relationship {spec.child}.{cf} -> "
                    f"{spec.parent}.{pf}: missing parent keys {hints}"
                )

    # -- execution ----------------------------------------------------------

    def run(self) -> StreamResult:
        spark = self._get_spark()
        if any(spec.from_dict is None for spec in self._index_specs):
            raise ValueError(
                "streaming pipelines cannot use traversal-built build_index "
                "(reference restriction, fluent.py:1797-1829); seed the "
                "index with from_dict or use link_to"
            )
        store = TableStore()
        eager_store: dict[str, DataFrame] = {}
        eager_internal: dict[str, DataFrame] = {}
        errors_store: dict[str, DataFrame] = {}

        if self._eager_tables:
            if not self._eager_roots:
                raise ValueError("load_eager() requires stream(eager_roots=...)")
            # all eager roots map against pipeline root 0, like a
            # sequential chunk (multi-doc eager dimensions merge correctly)
            eager_df = self._combined_root_df(spark, tuple(self._eager_roots))
            eager_b = self._clone_with_roots([eager_df], order_col="__roword")
            eager_res = eager_b.run(table_filter=set(self._eager_tables))
            for t in self._eager_tables:
                if t in eager_res._tables_dict:
                    df = eager_res._tables_dict[t].cache()
                    df.count()  # materialize the dimension once
                    eager_store[t] = df
                    internal_df = eager_res._internal[t].cache()
                    eager_internal[t] = internal_df
                    store.put(t, df)

        self._eager_internal = eager_internal
        table_keys = self._table_key_map()
        n = 0
        for chunk in self._source.chunks():
            n += 1
            result = self._run_chunk(spark, chunk)
            self._validate_completeness(result, eager_store)
            for name, df in result._tables_dict.items():
                if name in self._eager_tables:
                    continue
                self._strategy.flush(store, name, df, table_keys.get(name))
            for name, err in result.errors.items():
                old = errors_store.get(name)
                errors_store[name] = (
                    err if old is None else old.unionByName(err, allowMissingColumns=True)
                )
        if self._sink is not None:
            # the sink receives the strategy-resolved final tables (incl.
            # eager dimensions); per-micro-batch exactly-once writes belong
            # to the foreachBatch adapter (streaming/windows.py)
            for name, df in store.tables.items():
                self._sink.write(name, df)
        return StreamResult(store.tables, n, errors_store)

    def _table_key_map(self) -> dict[str, list[str]]:
        keys: dict[str, list[str]] = {}
        for em in self._emissions:
            if em.join_on:
                keys.setdefault(em.table, em.join_on)
        return keys


def _as_obj(root: Any) -> dict:
    if isinstance(root, dict):
        return root
    raise TypeError(
        "sequential chunk roots must be JSON objects (dicts); got "
        f"{type(root).__name__}"
    )


def stream(
    source: ChunkSource,
    *,
    spark: Optional[SparkSession] = None,
    eager_roots: Sequence[Any] = (),
    flush_strategy: Optional[FlushStrategy] = None,
    errors: str = "collect",
) -> StreamPipeline:
    """Streaming entry point (reference: etielle/fluent.py:2155-2195)."""
    return StreamPipeline(
        source,
        spark=spark,
        eager_roots=eager_roots,
        flush_strategy=flush_strategy,
        errors=errors,
    )
