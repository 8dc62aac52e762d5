"""Streaming execution: chunked pipelines + native Structured Streaming.

Two layers, mirroring SURVEY.md §2.8:

1. **Chunk parity layer** — ``stream(source)`` runs the same compiled
   pipeline per chunk with flush strategies and relationship-completeness
   validation (reference: etielle/chunking.py + fluent.py:1987-2026).
   A chunk's roots become rows of one DataFrame, so keyed merges within a
   chunk are a single groupBy, and the reference's
   ``ExternalPartitionChunkSource`` (a hand-rolled disk hash shuffle,
   chunking.py:149-232) degenerates to ``repartition(key)``.
2. **Structured Streaming layer** — ``for_each_batch`` adapts a pipeline
   to ``writeStream.foreachBatch``; watermark/window helpers cover the
   event-time surface the reference lacks (tumbling/sliding/session).
"""

from .chunks import (
    CallableChunkSource,
    Chunk,
    ChunkSource,
    ExternalPartitionChunkSource,
    GroupByChunkSource,
    OneRecordPerChunkSource,
    PreSegmentedChunkSource,
    RelationshipIncompleteError,
    partitioned_chunks,
)
from .pipeline import (
    BufferedKeyFlushStrategy,
    KeyCompleteFlushStrategy,
    StreamPipeline,
    UpsertFlushStrategy,
    stream,
)
from .windows import for_each_batch, session_agg, sliding_agg, tumbling_agg

__all__ = [
    "Chunk",
    "ChunkSource",
    "OneRecordPerChunkSource",
    "CallableChunkSource",
    "GroupByChunkSource",
    "PreSegmentedChunkSource",
    "ExternalPartitionChunkSource",
    "partitioned_chunks",
    "RelationshipIncompleteError",
    "stream",
    "StreamPipeline",
    "KeyCompleteFlushStrategy",
    "UpsertFlushStrategy",
    "BufferedKeyFlushStrategy",
    "for_each_batch",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
]

from .incremental_ann import PersistentIVFIndex
from .incremental_cms import IncrementalCMS
from .incremental_drift import (
    IncrementalBinnedKS,
    IncrementalPSI,
    IncrementalVocabDrift,
)
from .incremental_sketch import IncrementalHLL

__all__ += [
    "IncrementalHLL",
    "IncrementalVocabDrift",
    "IncrementalPSI",
    "IncrementalBinnedKS",
    "IncrementalCMS",
    "PersistentIVFIndex",
]
