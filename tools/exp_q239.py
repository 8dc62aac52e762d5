"""Round-10 experiment: decompose q239_cluster_canonicalize at the 100x
curve scale into (pairs build + CC loop) vs (final assembly write), and
A/B candidate optimizations:

  variant=base      current code
  variant=shj       + spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
                      (AQE SMJ->SHJ rewrite) and preferSortMergeJoin=false
  variant=both      shj + labeled-materialization (code change, if present)

Usage: python tools/exp_q239.py [variant] [runs]
Requires the synthesized curve corpus (.benchdata/sf1synth) to exist —
run bench.py once first.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

variant = sys.argv[1] if len(sys.argv) > 1 else "base"
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

from etielle_spark.session import get_spark  # noqa: E402

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(f"exp-q239-{variant}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

if variant in ("shj", "both"):
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "400m"
    )

from etielle_spark.benchqueries import QUERIES  # noqa: E402

big_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchdata",
    "sf1synth",
)
assert os.path.exists(os.path.join(big_dir, "_DONE")), "run bench.py first"

fn, _sql = QUERIES["q239_cluster_canonicalize"]

# warm (untimed): plan compile + page cache
fn(spark, big_dir).write.format("noop").mode("overwrite").save()

build_ts, write_ts, total_ts = [], [], []
for _ in range(runs):
    t0 = time.perf_counter()
    df = fn(spark, big_dir)  # runs the CC loop eagerly (checkpoint rounds)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    build_ts.append(t1 - t0)
    write_ts.append(t2 - t1)
    total_ts.append(t2 - t0)
    from etielle_spark import release_operator_caches

    release_operator_caches()
    spark.catalog.clearCache()

print(
    f"RESULT variant={variant} "
    f"build_med={statistics.median(build_ts):.3f} "
    f"write_med={statistics.median(write_ts):.3f} "
    f"total_med={statistics.median(total_ts):.3f} "
    f"build={[round(x,3) for x in build_ts]} "
    f"write={[round(x,3) for x in write_ts]}"
)
spark.stop()
