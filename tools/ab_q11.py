"""Interleaved A/B: q11 (backlink engine pipeline) vs the hand-written
same-semantics DataFrame floor, same session, alternating runs.

The round-9 receipt (SCALING.md) put the engine at 2.053 s vs a 1.521 s
floor, the premium being the lines_t keyed LWW merge Catalyst cannot
prove away on raw lineitem.  Round 10 adjudicated that the merge is
REQUIRED on this data (the synthetic lineitem has duplicate
(orderkey, linenumber) pairs, so ``assume_distinct`` would be a false
assertion — it is deliberately NOT used in q11); this harness measures
the engine against a floor that performs the same per-key merge.

    SPARK_GRAFT_CPUS=32 python tools/ab_q11.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def floor_program(spark, sf_dir):
    """Hand-written same-semantics plan: doc groupBy + posexplode +
    merge join + ordered collect + rejoin.  SAME SEMANTICS includes the
    per-key merge: this repo's synthetic lineitem has duplicate
    (orderkey, linenumber) pairs, so the child table must collapse to
    one row per ln_key exactly as the engine's keyed LWW merge does —
    a floor without it is faster but WRONG (doubled backlink rows)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
        "ln_key", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    docs = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sort_array(F.collect_list("ln_key")).alias("line_ids")
    )
    lines = (
        li.select(F.col("ln_key"), F.col("l_linenumber").alias("ln"))
        .groupBy("ln_key")
        .agg(F.max("ln").alias("ln"))
    )
    exploded = docs.select(
        "okey", F.posexplode("line_ids").alias("pos", "ln_key")
    )
    joined = exploded.join(lines, "ln_key")
    collected = joined.groupBy("okey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("ln")))
            ),
            lambda s: s.getField("ln"),
        ).alias("lns")
    )
    return collected.select(
        "okey",
        F.array_join(
            F.transform("lns", lambda x: x.cast("string")), ","
        ).alias("lines_csv"),
        F.size("lns").cast("bigint").alias("n_lines"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from etielle_spark.benchqueries import q11
    from etielle_spark.session import get_spark

    spark = get_spark("ab-q11", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm both paths once (scan cache, codegen)
    q11(spark, sf_dir).count()
    floor_program(spark, sf_dir).count()

    eng, flo = [], []
    for _ in range(rounds):
        t0 = time.perf_counter()
        q11(spark, sf_dir).count()
        eng.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        floor_program(spark, sf_dir).count()
        flo.append(time.perf_counter() - t0)

    import json

    print(
        json.dumps(
            {
                "metric": "ab_q11",
                "cpus": cpus,
                "sf_dir": sf_dir,
                "rounds": rounds,
                "engine_median_s": round(statistics.median(eng), 3),
                "engine_range_s": [round(min(eng), 3), round(max(eng), 3)],
                "floor_median_s": round(statistics.median(flo), 3),
                "floor_range_s": [round(min(flo), 3), round(max(flo), 3)],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
