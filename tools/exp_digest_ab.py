"""Round-10 experiment: A/B the internal gram-digest width in
gram_duplication_stats — hex md5 string (32 bytes, current) vs
unhex(md5) binary (16 bytes) — interleaved in one session at the
100x curve corpus (guide §2.3: shuffle fewer/narrower bytes).

Usage: python tools/exp_digest_ab.py [rounds]
Requires .benchdata/sf1synth (run bench.py once first).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3

from pyspark import StorageLevel  # noqa: E402
from pyspark.sql import DataFrame, functions as F  # noqa: E402

from etielle_spark.session import get_spark  # noqa: E402
from etielle_spark.operators.dedup import grams_of, tokens_col  # noqa: E402
from etielle_spark.benchqueries import _docs_plus_clones  # noqa: E402

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark("exp-digest-ab", cpus=cpus)
spark.sparkContext.setLogLevel("ERROR")

big_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchdata",
    "sf1synth",
)
assert os.path.exists(os.path.join(big_dir, "_DONE")), "run bench.py first"


def gram_dup(df: DataFrame, binary: bool) -> DataFrame:
    toks = df.select(F.col("doc_id").alias("id"), tokens_col(F.col("text")).alias("t"))
    dg = F.md5(F.col("gram"))
    if binary:
        dg = F.unhex(dg)
    grams = toks.select(
        "id", F.explode(grams_of(F.col("t"), 8)).alias("gram")
    ).select("id", dg.alias("g"))
    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = counts.filter(F.col("n_docs") > 1).select("g")
    counted = grams.join(dup.withColumn("__dup", F.lit(1)), "g", "left")
    per_doc = counted.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("__dup"), F.lit(0)).cast("bigint")).alias(
            "n_shared_grams"
        ),
    )
    base = df.select(F.col("doc_id").alias("id"))
    out = base.join(per_doc, "id", "left").select(
        F.col("id"),
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce(F.col("n_shared_grams"), F.lit(0)).cast("bigint").alias(
            "n_shared_grams"
        ),
        F.when(
            F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
            F.round(
                F.col("n_shared_grams").cast("double") / F.col("n_grams"), 6
            ),
        ).alias("shared_frac"),
    )
    out = out.withColumn(
        "drop",
        F.coalesce(F.col("shared_frac") >= 0.8, F.lit(False)),
    )
    return grams, out


def run_once(binary: bool) -> float:
    df = _docs_plus_clones(spark, big_dir)
    t0 = time.perf_counter()
    cached, out = gram_dup(df, binary)
    out.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    cached.unpersist(blocking=True)
    return dt


# warm page cache + plans once per variant (untimed)
run_once(False)
run_once(True)

samples = {"hex": [], "bin": []}
for _ in range(rounds):
    samples["hex"].append(run_once(False))
    samples["bin"].append(run_once(True))

for k, v in samples.items():
    print(
        f"RESULT variant={k} med={statistics.median(v):.3f} "
        f"min={min(v):.3f} max={max(v):.3f} all={[round(x, 3) for x in v]}"
    )
spark.stop()
