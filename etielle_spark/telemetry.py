"""Telemetry events (reference: etielle/telemetry.py:27-124).

``etl(..., on_event=fn)`` receives event dataclasses around mapping and
flush; callback exceptions are swallowed, as in the reference.  Row counts
are Spark actions, so they are only computed when the sink write already
materialized the table (flush events) — use ``PipelineResult.stats()``
for on-demand per-table counts (the reference's TableStats).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional, Union


@dataclass(frozen=True)
class MapStarted:
    table: str


@dataclass(frozen=True)
class MapCompleted:
    table: str
    count: Optional[int] = None
    error_count: Optional[int] = None


@dataclass(frozen=True)
class FlushStarted:
    table: str


@dataclass(frozen=True)
class FlushCompleted:
    table: str
    inserted: int


@dataclass(frozen=True)
class FlushFailed:
    table: str
    error: str


def emit(callback: Optional[Callable[[Any], None]], event: Any) -> None:
    if callback is None:
        return
    try:
        callback(event)
    except Exception:
        # reference swallows callback errors (telemetry.py:118-124)
        pass


# API-parity aliases (reference telemetry.py): the event union, the
# isinstance-check tuple, and the callback signature.
TelemetryEvent = Union[
    MapStarted, MapCompleted, FlushStarted, FlushCompleted, FlushFailed
]
TelemetryEventTypes = (
    MapStarted,
    MapCompleted,
    FlushStarted,
    FlushCompleted,
    FlushFailed,
)
TelemetryCallback = Callable[[Any], None]
