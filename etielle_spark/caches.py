"""Registry for operator-internal persisted frames, with an explicit
release path.

Several batch operators persist a corpus-scale intermediate that feeds
two or more consumers inside one returned plan (the LSH band table, the
minhash signature table, the n-gram postings, the IVF cell assignment).
The persist is load-bearing — without it the expensive map stage runs
once per consumer — but the returned frame is lazy, so the operator
cannot unpersist before the caller has computed it.  Left alone, each
call in a long-lived session retains one corpus-sized cache until LRU
eviction or session end (the leak class PipelineResult.release() closes
for backlink parents).

Operators register such frames with :func:`track_cache`;
:func:`release_operator_caches` unpersists everything registered and
clears the registry.  Releasing is always CORRECTNESS-safe: an
unpersisted frame recomputes from lineage if touched again — the only
cost is recompute time.  Call it between pipeline stages in a
long-lived driver (a notebook, a scheduled ingest) the way you would
call ``PipelineResult.release()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track_cache(df: DataFrame) -> DataFrame:
    """Register an operator-internal persisted frame for later release.
    Returns the frame unchanged (call-through style)."""
    _TRACKED.append(df)
    return df


def tracked_cache_count() -> int:
    """Number of currently-registered (not yet released) frames."""
    return len(_TRACKED)


def release_operator_caches() -> int:
    """Unpersist every registered operator cache and clear the registry.
    Returns the number of frames released.  Safe at any time: released
    frames recompute from lineage on next touch."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            n += 1
        except Exception:
            # a frame whose session is already stopped has nothing to
            # release; never let cleanup mask the caller's work
            pass
    _TRACKED.clear()
    return n
