"""Sequence packing: group documents into fixed-token-capacity training
packs (the "example packing" step of an LLM data pipeline).

Greedy first-fit in document-id order within hash buckets:

- Each document is reduced JVM-side to ``(id, token_count)`` — the text
  never reaches Python, so the Arrow transfer per document is ~16 bytes.
- Documents are bucketed by ``id % num_buckets`` (engine-independent, so
  an external oracle can reproduce the assignment) and each bucket is
  packed independently by one task: sort by id, accumulate until the
  next document would exceed ``capacity``, then start a new pack.  A
  document larger than ``capacity`` gets a pack of its own.
- Buckets are the unit of parallelism AND determinism: the output is a
  pure function of (ids, token counts, num_buckets, capacity),
  independent of Spark partitioning, task order, or cluster size.  At
  100 TB, set ``num_buckets`` to a few × the cluster's task slots; the
  per-bucket state is one running counter, so memory per task is O(1)
  beyond the bucket's (id, count) pairs held by the sort.

The per-bucket loop is genuinely sequential (greedy packing is an
inherently ordered scan), so this is the one operator family where
``applyInPandas`` is the *right* tool rather than a fallback.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from ..session import ship_package

PACK_SCHEMA = (
    "pack_id bigint, bucket bigint, n_docs bigint, n_tokens bigint, "
    "doc_ids array<bigint>"
)

_PACKS_PER_BUCKET = 1_000_000_000


def pack_counts(
    df: DataFrame,
    id_col: str,
    count_col: str,
    *,
    capacity: int,
    num_buckets: int = 32,
) -> DataFrame:
    """Pack pre-counted items into ≤``capacity``-token groups, greedy
    first-fit in ``id_col`` order within ``id % num_buckets`` buckets —
    the counts-level core of :func:`pack_sequences`, composable with any
    upstream tokenizer (e.g. ``bpe_encode``'s ``n_bpe``).

    Returns ``(pack_id, bucket, n_docs, n_tokens, doc_ids)`` with
    ``pack_id = bucket * 1e9 + seq`` and ``doc_ids`` sorted ascending.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")

    # NULL counts pack as 0 (the doc still occupies a slot, like the
    # zero-token case in pack_sequences); NULL ids are unaddressable and
    # are dropped rather than crashing the pandas worker on NaN.
    sized = (
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.coalesce(F.col(count_col).cast("bigint"), F.lit(0)).alias("n"),
            F.pmod(F.col(id_col).cast("bigint"), F.lit(num_buckets)).alias(
                "bucket"
            ),
        )
    )

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        bucket = int(pdf["bucket"].iloc[0])
        packs: list[tuple[int, int, list[int]]] = []  # (seq, cum, ids)
        seq, cum, ids = 0, 0, []
        for doc_id, n in zip(pdf["doc_id"], pdf["n"]):
            if ids and cum + n > capacity:
                packs.append((seq, cum, ids))
                seq, cum, ids = seq + 1, 0, []
            cum += int(n)
            ids.append(int(doc_id))
        if ids:
            packs.append((seq, cum, ids))
        return pd.DataFrame(
            {
                "pack_id": [bucket * _PACKS_PER_BUCKET + s for s, _, _ in packs],
                "bucket": bucket,
                "n_docs": [len(i) for _, _, i in packs],
                "n_tokens": [c for _, c, _ in packs],
                "doc_ids": [i for _, _, i in packs],
            }
        )

    ship_package(sized)
    return sized.groupBy("bucket").applyInPandas(pack_bucket, PACK_SCHEMA)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    capacity: int,
    num_buckets: int = 32,
) -> DataFrame:
    """Pack documents into ≤``capacity``-token groups, greedy first-fit
    in ``id_col`` order within ``id % num_buckets`` buckets; token counts
    are whitespace tokens computed JVM-side (the text never reaches
    Python — the Arrow transfer per document is ~16 bytes).

    Documents with zero tokens still occupy a pack slot (they carry
    document boundaries/metadata in a real pipeline).  See
    :func:`pack_counts` for the counts-level core.
    """
    from .dedup import tokens_col

    sized = df.select(
        F.col(id_col).alias("__id"),
        F.size(tokens_col(F.col(text_col))).cast("bigint").alias("__n"),
    )
    return pack_counts(
        sized, "__id", "__n", capacity=capacity, num_buckets=num_buckets
    )
