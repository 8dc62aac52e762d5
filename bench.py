"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

The headline set covers the scan/agg/join core (q01/q03/q05), the engine
compile path (q04 keyed merge + policies, q11 backlink), windows (q19),
and the training-data operators (q27 minhash, q31 ANN topk, q22 tokens).
Each query is executed to completion (count) after a warm-up pass of the
parquet footer reads; wall time includes planning.
"""

from __future__ import annotations

import json
import os
import time

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_supplier_volume",
    "q04_merge_policies",
    "q11_backlink_collect",
    "q12_junction_distinct",
    "q16_window_topk_per_group",
    "q19_tumbling_window",
    "q20_session_windows",
    "q22_token_stats",
    "q26_exact_dedup_docs",
    "q27_minhash_signatures",
    "q28_lsh_candidate_pairs",
    "q30_simhash",
    "q31_cosine_topk",
    "q41_nation_volume_share",
    "q43_returned_customers",
]


def reference_workload(spark) -> float:
    """The reference's own benchmark shape (BASELINE.md: 8,000 users +
    8,000 posts with one link_to, 2.4 s resident single-process): the same
    pipeline through this engine's compiled plans.  Returned seconds are
    directly comparable to the published resident wall time."""
    import time as _t

    from pyspark.sql import functions as F

    from etielle_spark import Field, TempField, etl, get, get_from_parent

    n = 8000
    users = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("uid"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
        F.array(
            F.struct(
                F.concat(F.lit("p"), F.col("id"), F.lit("_0")).alias("pid"),
                F.repeat(F.lit("x"), 2048).alias("body"),
            )
        ).alias("posts"),
    )
    t0 = _t.perf_counter()
    result = (
        etl(users, spark=spark)
        .map_to(
            "users",
            fields=[Field("id", get("uid")), Field("name", get("name"))],
            join_on=["id"],
        )
        .goto_root(0)
        .goto("posts")
        .each()
        .map_to(
            "posts",
            fields=[
                Field("id", get("pid")),
                Field("user_id", get_from_parent("uid")),
                Field("body", get("body")),
            ],
            join_on=["id"],
        )
        .link_to("users", by={"user_id": "id"})
        .run()
    )
    rows = result["users"].count() + result["posts"].count()
    dt = _t.perf_counter() - t0
    assert rows == 2 * n, rows
    return dt


def main() -> None:
    from etielle_spark.benchqueries import QUERIES
    from etielle_spark.session import get_spark

    spark = get_spark("etielle-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + file index so per-query numbers measure the queries
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn, _sql = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        total += dt

    ref_dt = reference_workload(spark)
    times["ref_workload_users_posts_8k"] = round(ref_dt, 3)
    total += ref_dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
