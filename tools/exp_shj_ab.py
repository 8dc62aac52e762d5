"""Round-10 experiment: A/B the AQE SMJ->SHJ rewrite + preferSortMergeJoin
on the SortMergeJoin-bearing headline queries (q04, q11, q12) at sf0.1.

Usage: python tools/exp_shj_ab.py [on|off] [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "off"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

from etielle_spark.session import get_spark  # noqa: E402

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(f"exp-shj-{mode}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

if mode == "on":
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "400m"
    )

from etielle_spark.benchqueries import QUERIES  # noqa: E402

NAMES = [
    "q04_merge_policies",
    "q11_backlink_collect",
    "q12_junction_distinct",
    "q03_shipping_priority",
]

for name in NAMES:
    fn, _sql = QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
samples = {n: [] for n in NAMES}
for _ in range(runs):
    for name in NAMES:
        fn, _sql = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples[name].append(time.perf_counter() - t0)

for name in NAMES:
    v = samples[name]
    print(
        f"RESULT mode={mode} {name} med={statistics.median(v):.3f} "
        f"min={min(v):.3f} max={max(v):.3f}"
    )
spark.stop()
