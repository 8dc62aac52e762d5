"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` with a modest shuffle-partition count;
on a real cluster the same settings (AQE on, adaptive coalescing, skew-join
handling) are the ones that matter at 100 TB. ANSI mode is disabled because
the engine's reference semantics (etielle, see SURVEY.md) are
permissive: missing paths, out-of-bounds list indices and failed casts
yield NULL rather than raising (reference: etielle/transforms.py:83-114).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "etielle_spark", *, cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        # reliable-checkpoint files (the CC loop's converged round —
        # operators/graph.py deletes superseded rounds itself) are
        # reaped once their frames are GC'd instead of outliving the
        # driver
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # per-op call-site capture costs 3 extra py4j round trips + a
        # Python traceback walk on EVERY DataFrame method — measured
        # ~40% of the fluent compile latency (q11 build 0.68 s -> 0.40 s).
        # The trade is losing the PySpark line number in JVM analysis
        # error messages; the engine raises its own contextual errors.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # input split size, env-overridable.  Measured A/B at sf0.1
        # (two full headline benches, medians of 3): 32m LOST to the
        # 128m default across the board (total 20.0 vs 18.7 s) — the
        # tables are small enough that extra tiny tasks cost more than
        # the added scan parallelism buys.  On a CPU-bound cluster scan
        # (tokenize/minhash per row over few huge files) lower this via
        # SPARK_GRAFT_MAX_PARTITION_BYTES instead of editing code.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
