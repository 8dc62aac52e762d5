"""Chunk sources (reference: etielle/chunking.py:20-232).

A Chunk is the unit of completeness: all emissions for a composite key and
every child's parent must arrive in one chunk (or be eager) — reference
chunking.py:20-33.  Sources yield key-complete chunks; the disk-backed
two-pass partitioner of the reference is replaced by grouping semantics
that Spark's shuffle provides natively (see ``partitioned_chunks``).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import groupby
from typing import Any, Callable, Iterable, Iterator, Sequence


class RelationshipIncompleteError(RuntimeError):
    """A chunk's child row references a parent absent from the chunk and
    not eager (reference: etielle/relationships.py:545-616)."""


@dataclass
class Chunk:
    """Tuple of roots processed as one unit (chunking.py:20-33).

    ``sequential=True``: all roots map against pipeline root 0, sharing
    arrival order (merges work across the chunk's roots);
    ``sequential=False``: root *i* feeds ``goto_root(i)``.
    """

    roots: tuple
    sequential: bool = True


class ChunkSource:
    def chunks(self) -> Iterator[Chunk]:  # pragma: no cover - interface
        raise NotImplementedError


class OneRecordPerChunkSource(ChunkSource):
    """Each record = one chunk (chunking.py:45-61)."""

    def __init__(self, records: Iterable[Any]):
        self._records = records

    def chunks(self) -> Iterator[Chunk]:
        for r in self._records:
            yield Chunk(roots=(r,), sequential=True)


class CallableChunkSource(ChunkSource):
    """Chunks from a factory callable (chunking.py:64-71)."""

    def __init__(self, factory: Callable[[], Iterable[Chunk]]):
        self._factory = factory

    def chunks(self) -> Iterator[Chunk]:
        yield from self._factory()


class PreSegmentedChunkSource(ChunkSource):
    """Pass-through of caller-segmented chunks (chunking.py:127-146)."""

    def __init__(self, chunks: Iterable[Chunk | Sequence[Any]]):
        self._chunks = chunks

    def chunks(self) -> Iterator[Chunk]:
        for c in self._chunks:
            if isinstance(c, Chunk):
                yield c
            else:
                yield Chunk(roots=tuple(c), sequential=True)


class GroupByChunkSource(ChunkSource):
    """Group *consecutive* records sharing a key into one chunk; requires
    pre-grouped input (chunking.py:74-124)."""

    def __init__(self, records: Iterable[Any], key: Callable[[Any], Any]):
        self._records = records
        self._key = key

    def chunks(self) -> Iterator[Chunk]:
        for _k, group in groupby(self._records, key=self._key):
            yield Chunk(roots=tuple(group), sequential=True)


def partitioned_chunks(records: Iterable[Any], key: Callable[[Any], Any]) -> Iterator[Chunk]:
    """Replacement for the reference's ExternalPartitionChunkSource
    (chunking.py:149-232): one chunk per distinct key, first-appearance
    order, regardless of input order.

    The reference spills records to a temp file with a key->offset index —
    a hand-rolled hash shuffle.  Driver-side iterables are bounded, so a
    dict suffices here; for DataFrame-shaped input this whole concept is
    ``df.repartition(key)`` and needs no chunking at all.
    """
    buckets: dict[Any, list] = {}
    for r in records:
        buckets.setdefault(key(r), []).append(r)
    for _k, rs in buckets.items():  # dicts preserve first-appearance order
        yield Chunk(roots=tuple(rs), sequential=True)


class ExternalPartitionChunkSource(ChunkSource):
    """API-parity wrapper over :func:`partitioned_chunks` (reference
    chunking.py:149-232): one chunk per distinct key in first-appearance
    order.  The reference's disk-spill two-pass partitioner is a
    hand-rolled hash shuffle; for DataFrame-shaped input use
    ``df.repartition(key)`` instead — this class exists so reference
    call-sites port verbatim for driver-side iterables."""

    def __init__(self, records: Iterable[Any], key: Callable[[Any], Any]):
        self._records = records
        self._key = key

    def chunks(self) -> Iterator[Chunk]:
        yield from partitioned_chunks(self._records, self._key)
