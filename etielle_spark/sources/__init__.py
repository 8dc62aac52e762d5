"""Sources & sinks.

Reads: thin wrappers over spark.read (parquet/json/csv/jdbc) — Catalyst
already gives pushdown/pruning.  Writes: the topological-flush seam the
fluent builder's ``load()`` uses (reference: SQLAlchemy/Supabase sinks,
etielle/fluent.py:716-1059).  JDBC/Delta need drivers not present in this
environment; they are parameterized but untested here.
"""

from .sinks import CollectSink, JdbcSink, ParquetSink, Sink
from .supabase import (
    SupabaseSink,
    fake_client,
    insert_batches,
    insert_returning,
    is_supabase_client,
)

__all__ = [
    "Sink",
    "ParquetSink",
    "CollectSink",
    "JdbcSink",
    "SupabaseSink",
    "insert_batches",
    "insert_returning",
    "is_supabase_client",
    "fake_client",
]
