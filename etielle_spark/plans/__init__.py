"""Plan-level helpers for scale: skew-aware aggregation, partitioning.

AQE (enabled in session.py) already handles skewed sort-merge joins and
post-shuffle coalescing; these helpers cover the remaining hot spot —
heavily skewed groupBy keys — and expose explicit partitioning control
for co-located pipelines.
"""

from .skew import salted_agg, salted_join, with_salt

__all__ = ["salted_agg", "salted_join", "with_salt"]
