"""Graph operators over edge DataFrames: PageRank power iteration.

A 100 TB link graph lives as an edge table; each PageRank iteration is
one join (edges x current ranks, co-partitioned on the source key) and
one destination-keyed aggregation — the canonical distributed PR step.
The rank frame stays tiny relative to edges (one row per node), and
iteration count is a driver-side loop over DataFrame plans (no
collect); persist the rank frame between iterations on a real cluster
to cut lineage depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    *,
    iterations: int = 2,
    damping: float = 0.85,
    round_to: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Every node must appear as a source at least once (feed an
    undirected graph as both edge directions) so there are no dangling
    nodes; nodes receiving no links still get the teleport term via a
    left join.  Ranks are normalized so the mean is 1 (``rank = N *
    pr``), which keeps the rounded output informative at any graph
    size.

    Returns ``(node, rank)`` — one row per node.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).distinct()
    nodes = e.select(F.col("__src").alias("__node")).distinct()
    outdeg = e.groupBy("__src").agg(
        F.count(F.lit(1)).cast("double").alias("__deg")
    )
    # normalized rank: init 1.0 per node; teleport term is (1-d) so the
    # mean stays 1 every iteration (sum of contribs preserves total mass)
    pr = nodes.select("__node", F.lit(1.0).alias("__pr"))
    for _ in range(iterations):
        contribs = (
            e.join(pr, e["__src"] == pr["__node"])
            .join(outdeg, "__src")
            .select(
                F.col("__dst").alias("__node"),
                (F.col("__pr") / F.col("__deg")).alias("__share"),
            )
            .groupBy("__node")
            .agg(F.sum("__share").alias("__in"))
        )
        pr = nodes.join(contribs, "__node", "left").select(
            "__node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
            ).alias("__pr"),
        )
    return pr.select(
        F.col("__node").alias("node"), F.round("__pr", round_to).alias("rank")
    )
