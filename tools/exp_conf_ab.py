"""Round-11 experiment (VERDICT r10 item 6): tame the 32-core scheduler
overhead at the bench SF with scale-adaptive AQE coalescing knobs.

Replicates bench.py's headline phase EXACTLY (same warm-up, same per-query
untimed warm pass, 3 timed noop-sink runs, medians) in a fresh JVM, with a
named conf variant applied at session build.  Run variants in alternating
fresh subprocesses and compare totals.

Variants:
  base      session.py defaults (AQE on, parallelismFirst default=true)
  coalesce  + spark.sql.adaptive.coalescePartitions.parallelismFirst=false
            + spark.sql.adaptive.advisoryPartitionSizeInBytes=<adv, def 8m>
            (partition count derives from DATA SIZE, not core count — the
            guide §2.2 recipe; at 100 TB the same setting yields many
            partitions, so it is scale-adaptive, not local[32]-tuned)

Usage:
  SPARK_GRAFT_CPUS=32 python tools/exp_conf_ab.py <variant> [adv]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

variant = sys.argv[1]
adv = sys.argv[2] if len(sys.argv) > 2 else "8m"

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

if variant == "coalesce":
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
        "spark.sql.adaptive.coalescePartitions.parallelismFirst=false;"
        f"spark.sql.adaptive.advisoryPartitionSizeInBytes={adv}"
    )
elif variant != "base":
    raise SystemExit(f"unknown variant {variant}")

from pyspark.sql import functions as F  # noqa: E402

from etielle_spark.benchqueries import QUERIES  # noqa: E402
from etielle_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

spark = get_spark(f"exp-conf-{variant}", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

# same warm-up block as bench.main()
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
od = spark.read.parquet(f"{sf_dir}/orders.parquet")
li.join(od, li.l_orderkey == od.o_orderkey).groupBy("l_returnflag").count().count()
from pyspark.sql import Window as _W  # noqa: E402

od.select(
    F.row_number().over(_W.partitionBy("o_custkey").orderBy("o_orderkey")).alias("rn")
).filter(F.col("rn") <= 1).count()
from etielle_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signatures,
    simhash,
)

tiny = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20).cache()
minhash_signatures(tiny, "doc_id", "text", num_hashes=8).count()
lsh_candidate_pairs(tiny, "doc_id", "text", num_hashes=8, bands=4).count()
simhash(tiny, "doc_id", "text").count()
tiny.unpersist()

runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
samples: dict[str, list[float]] = {name: [] for name in bench.HEADLINE}
for name in bench.HEADLINE:
    fn, _sql = QUERIES[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
for _ in range(runs):
    for name in bench.HEADLINE:
        fn, _sql = QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples[name].append(time.perf_counter() - t0)

total = 0.0
out = {}
for name, vals in samples.items():
    med = statistics.median(vals)
    out[name] = round(med, 3)
    total += med
print(f"RESULT variant={variant} adv={adv} total={total:.3f} per_query={out}")
spark.stop()
