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
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
