"""Plan-level helpers for scale: skew-aware aggregation, partitioning.

AQE (enabled in session.py) already handles skewed sort-merge joins and
post-shuffle coalescing; these helpers cover the remaining hot spot —
heavily skewed groupBy keys — and expose explicit partitioning control
for co-located pipelines.
"""

from .layout import bucket_layout, zorder_key, zorder_layout
from .skew import salted_agg, salted_join, with_salt

__all__ = [
    "bucket_layout",
    "salted_agg",
    "salted_join",
    "with_salt",
    "zorder_key",
    "zorder_layout",
]
