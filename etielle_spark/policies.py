"""Merge policies as Spark aggregate-expression factories.

Reference semantics (etielle/instances.py:31-85, applied incrementally from
``old=None`` at etielle/executor.py:335-348):

- AddPolicy:          fold of ``(old or 0) + (new or 0)``  -> sum(coalesce(v, 0))
- AppendPolicy:       fold appending non-None values        -> ordered collect_list
- ExtendPolicy:       fold extending with lists/scalars     -> flatten(ordered collect)
- MinPolicy/MaxPolicy: None-tolerant running min/max        -> min/max
- FirstNonNullPolicy: keep first non-None                   -> min_by over non-null
- default (no policy): last-write-wins, explicit None overwrites
                       (executor.py:278-281)                -> max_by over arrival order

Each policy builds its aggregate from ``(value_col, ord_col)`` where
``ord_col`` is the synthesized traversal-arrival ordering (non-null exactly
when this emission supplied the field) — this is how the reference's
single-threaded arrival order is made deterministic under distributed
execution (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T


class MergePolicy:
    """Interface: build an aggregate Column from (value, supplied-order)."""

    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        raise NotImplementedError


class LastWriteWinsPolicy(MergePolicy):
    """Default merge: the latest supplied value wins, even if it is NULL."""

    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        # max_by ignores rows whose ordering is NULL (unsupplied rows), and
        # faithfully returns a NULL value written by the winning row.
        return F.max_by(value, ord_col)


class AddPolicy(MergePolicy):
    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        zero = F.lit(0)
        return F.sum(F.when(ord_col.isNotNull(), F.coalesce(value, zero)))


class AppendPolicy(MergePolicy):
    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        pairs = F.collect_list(
            F.when(ord_col.isNotNull() & value.isNotNull(), F.struct(ord_col.alias("o"), value.alias("v")))
        )
        ordered = F.array_sort(pairs)
        vals = F.transform(ordered, lambda p: p.getField("v"))
        # zero *supplied* rows -> field absent (NULL); all-None supplied -> []
        return F.when(F.count(ord_col) > 0, vals)


class ExtendPolicy(MergePolicy):
    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        pairs = F.collect_list(
            F.when(
                ord_col.isNotNull() & value.isNotNull(),
                F.struct(ord_col.alias("o"), value.alias("v")),
            )
        )
        vals = F.transform(F.array_sort(pairs), lambda p: p.getField("v"))
        if isinstance(dtype, T.ArrayType):
            vals = F.flatten(vals)
        # scalar columns degenerate to append (instances.py:53-55)
        return F.when(F.count(ord_col) > 0, vals)


class MinPolicy(MergePolicy):
    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        return F.min(F.when(ord_col.isNotNull(), value))


class MaxPolicy(MergePolicy):
    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        return F.max(F.when(ord_col.isNotNull(), value))


class FirstNonNullPolicy(MergePolicy):
    def agg(self, value: Column, ord_col: Column, dtype: T.DataType | None) -> Column:
        return F.min_by(value, F.when(value.isNotNull(), ord_col))
