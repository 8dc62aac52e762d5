"""Supabase-shape HTTP adapter: batched insert/upsert over an
injectable client object.

Reference parity: ``insert_batches`` mirrors
etielle/adapters/supabase_adapter.py:14-71 (batch slicing, upsert with
``on_conflict``, per-batch progress callback with swallowed callback
errors, accumulated ``response.data`` return) and the two-phase
returned-row-count check mirrors etielle/fluent.py:985-1000.  The real
``supabase-py`` package isn't available in this sandbox, so everything
here is written against the client PROTOCOL the reference itself unit-
tests with a mock (reference tests/test_supabase_adapter.py:40-50):

    client.table(name).insert(batch).execute().data
    client.table(name).upsert(batch, on_conflict=...).execute().data

Any object with that surface works — the real client, a recording fake
(:func:`fake_client` ships one), or a thin wrapper over another HTTP
store.

Scale note: an HTTP row API is a DIMENSION/result sink, not a fact
sink — :class:`SupabaseSink` streams the DataFrame driver-side one
partition at a time (``toLocalIterator``, bounded memory) because that
is what pushing through a single REST client means.  Fact-scale output
belongs in ``ParquetSink``/``JdbcSink`` (executor-parallel writes).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame

from .sinks import Sink

# (batch_num, batch_total, rows_inserted) — reference adapter's callback
BatchCallback = Callable[[int, int, int], None]


def is_supabase_client(obj: Any) -> bool:
    """Duck-detection by defining module, the way the reference's
    ``load()`` decides between SQLAlchemy and Supabase sessions (its
    tests fake exactly this: ``__class__.__module__ = "supabase..."``)."""
    mod = getattr(type(obj), "__module__", "") or ""
    return mod.split(".", 1)[0] == "supabase"


def _execute_batch(
    client: Any,
    table_name: str,
    batch: list[dict],
    *,
    upsert: bool,
    on_conflict: Optional[str],
) -> list[dict]:
    """One insert/upsert round trip; returns the rows the server echoed
    back (``response.data``), empty when the server returned nothing."""
    table = client.table(table_name)
    if upsert:
        response = table.upsert(batch, on_conflict=on_conflict).execute()
    else:
        response = table.insert(batch).execute()
    data = getattr(response, "data", None)
    return list(data) if data else []


def insert_batches(
    client: Any,
    table_name: str,
    rows: Sequence[dict],
    *,
    upsert: bool = False,
    on_conflict: Optional[str] = None,
    batch_size: int = 1000,
    on_batch: Optional[BatchCallback] = None,
) -> list[dict]:
    """Insert ``rows`` into ``table_name`` in ``batch_size`` pages.

    Reference-identical contract (adapters/supabase_adapter.py:14-71):
    empty input returns ``[]`` without touching the client; ``upsert``
    switches every page to ``table.upsert(batch, on_conflict=...)``;
    ``on_batch(batch_num, batch_total, rows_inserted)`` fires after each
    page and its own exceptions are swallowed (progress must never break
    the insert); the return value is the concatenated server-echoed rows
    — the caller uses them to pick up DB-generated ids (two-phase FK).
    """
    if batch_size < 1:
        raise ValueError(f"insert_batches: batch_size must be >= 1, got {batch_size}")
    if not rows:
        return []
    results: list[dict] = []
    total_batches = (len(rows) + batch_size - 1) // batch_size
    for batch_num in range(1, total_batches + 1):
        lo = (batch_num - 1) * batch_size
        batch = list(rows[lo : lo + batch_size])
        returned = _execute_batch(
            client, table_name, batch, upsert=upsert, on_conflict=on_conflict
        )
        results.extend(returned)
        if on_batch is not None:
            try:
                on_batch(batch_num, total_batches, len(returned))
            except Exception:
                pass
    return results


def insert_returning(
    client: Any,
    table_name: str,
    rows: Sequence[dict],
    *,
    upsert: bool = False,
    on_conflict: Optional[str] = None,
    batch_size: int = 1000,
    on_batch: Optional[BatchCallback] = None,
) -> list[dict]:
    """Phase-1 helper of the two-phase FK insert: like
    :func:`insert_batches` but the server MUST echo exactly one row per
    sent row (reference fluent.py:985-1000) — anything else makes
    generated-ID capture positionally unsafe, so it raises instead of
    silently mis-wiring child FKs."""
    returned = insert_batches(
        client,
        table_name,
        rows,
        upsert=upsert,
        on_conflict=on_conflict,
        batch_size=batch_size,
        on_batch=on_batch,
    )
    if len(returned) != len(rows):
        raise ValueError(
            f"Row count mismatch for table '{table_name}': "
            f"sent {len(rows)}, received {len(returned)}"
        )
    return returned


class SupabaseSink(Sink):
    """``load()`` sink over a Supabase-shaped client.

    Streams each table one partition at a time (``toLocalIterator`` —
    never a full ``collect``), pages rows into ``batch_size`` HTTP
    round trips, and keeps the reference's callback contract: the batch
    total is computed up front from ``df.count()`` so
    ``on_batch(batch_num, batch_total, rows_inserted)`` means the same
    thing it does in the reference adapter.  Per-table conflict columns
    come from ``upsert_on`` (single column or list — lists join to the
    comma form the REST API takes).  Server-echoed rows accumulate in
    ``self.returned[table]`` for two-phase FK pickup.
    """

    def __init__(
        self,
        client: Any,
        *,
        upsert: bool = False,
        upsert_on: Optional[dict] = None,
        batch_size: int = 1000,
        on_batch: Optional[Callable[[str, int, int, int], None]] = None,
    ) -> None:
        if batch_size < 1:
            raise ValueError(
                f"SupabaseSink: batch_size must be >= 1, got {batch_size}"
            )
        self.client = client
        self.upsert = upsert
        self.upsert_on = upsert_on or {}
        self.batch_size = int(batch_size)
        self.on_batch = on_batch
        self.returned: dict[str, list[dict]] = {}

    def _conflict_for(self, table: str) -> Optional[str]:
        spec = self.upsert_on.get(table) if self.upsert else None
        if spec is None:
            return None
        return ",".join(spec) if isinstance(spec, (list, tuple)) else str(spec)

    def write(self, table: str, df: DataFrame) -> None:
        from pyspark import StorageLevel

        # one materialization serves both the batch_total count and the
        # row stream: without the persist, count() and toLocalIterator()
        # execute the plan twice, and a non-deterministic plan could
        # stream rows that disagree with the precomputed total.  An
        # already-persisted frame belongs to the CALLER — don't evict
        # their cache on the way out.
        own = df.storageLevel == StorageLevel.NONE
        if own:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            self._write_persisted(table, df)
        finally:
            if own:
                df.unpersist()

    def _write_persisted(self, table: str, df: DataFrame) -> None:
        total = df.count()
        if total == 0:
            return
        total_batches = (total + self.batch_size - 1) // self.batch_size
        on_conflict = self._conflict_for(table)
        got = self.returned.setdefault(table, [])
        page: list[dict] = []
        batch_num = 0

        def flush_page() -> None:
            nonlocal batch_num
            batch_num += 1
            returned = _execute_batch(
                self.client,
                table,
                page,
                upsert=self.upsert,
                on_conflict=on_conflict,
            )
            got.extend(returned)
            if self.on_batch is not None:
                try:
                    self.on_batch(table, batch_num, total_batches, len(returned))
                except Exception:
                    pass
            page.clear()

        for row in df.toLocalIterator():
            page.append(row.asDict(recursive=True))
            if len(page) >= self.batch_size:
                flush_page()
        if page:
            flush_page()


def fake_client(
    *,
    generate_id: Optional[str] = None,
    echo: bool = True,
):
    """A recording in-memory client with the Supabase protocol surface —
    what the reference mocks with MagicMock, shipped as a real object so
    sandboxed pipelines (and this repo's tests) can exercise the full
    adapter path without the ``supabase`` package.

    ``generate_id="id"`` makes the fake act like a table with a
    DB-generated column: echoed rows gain a dense integer ``id`` (the
    two-phase FK scenario).  ``echo=False`` returns no data (a minimal
    REST response), which :func:`insert_returning` must reject.

    The returned object records every call in ``client.calls`` as
    ``(table, op, batch, on_conflict)`` tuples and keeps per-table rows
    in ``client.rows``.
    """

    class _Response:
        def __init__(self, data):
            self.data = data

    class _Table:
        def __init__(self, client, name):
            self._client = client
            self._name = name
            self._pending = None

        def insert(self, batch):
            self._pending = ("insert", list(batch), None)
            return self

        def upsert(self, batch, on_conflict=None):
            self._pending = ("upsert", list(batch), on_conflict)
            return self

        def execute(self):
            op, batch, conflict = self._pending
            c = self._client
            c.calls.append((self._name, op, batch, conflict))
            stored = []
            for row in batch:
                row = dict(row)
                if generate_id is not None and generate_id not in row:
                    c._next_id += 1
                    row[generate_id] = c._next_id
                stored.append(row)
            c.rows.setdefault(self._name, []).extend(stored)
            return _Response(stored if echo else None)

    class FakeSupabaseClient:
        def __init__(self):
            self.calls = []
            self.rows = {}
            self._next_id = 0

        def table(self, name):
            return _Table(self, name)

    # the reference's load() detects Supabase clients by module name; the
    # fake advertises the same surface its own test fixture fakes
    FakeSupabaseClient.__module__ = "supabase._testing.fake"
    return FakeSupabaseClient()
