"""Fluent-compile scaling receipt: driver-side build latency vs emission
count.

The q11 bench pins ONE pipeline's compile latency; this generalizes it —
a 50-emission pipeline (50 output tables x 4 fields off one root) is the
"wide ETL" shape (one ingest document fanned out to many normalized
tables), and its build time is pure driver latency: py4j round trips +
JVM plan analysis, no data touched until run.

Prints per-size build/run wall and the marginal per-emission cost; a
superlinear marginal (analysis re-running over an ever-growing plan)
is the failure mode this receipt watches for.

    python tools/compile_scaling.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def build_pipeline(spark, docs, n_emissions: int):
    from etielle_spark import Field, etl, get

    p = etl(docs, spark=spark)
    for i in range(n_emissions):
        p = p.map_to(
            f"t{i:02d}",
            fields=[
                Field("id", get("doc_id")),
                Field(f"v{i}_a", get("a")),
                Field(f"v{i}_b", get("b")),
                Field(f"v{i}_c", get("c")),
            ],
            join_on=["id"],
        )
    return p


def main() -> None:
    from pyspark.sql import functions as F

    from etielle_spark.session import get_spark

    spark = get_spark("compile-scaling", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.col("id").cast("string").alias("a"),
        (F.col("id") * 2).alias("b"),
        (F.col("id") % 7).cast("string").alias("c"),
    )

    # warm: first build pays Py4J/analyzer first-use costs
    build_pipeline(spark, docs, 5).run()["t00"].write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict[str, float]] = {}
    prev_build = None
    for n in (10, 25, 50):
        t0 = time.perf_counter()
        result = build_pipeline(spark, docs, n).run()
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(n):
            result[f"t{i:02d}"].write.format("noop").mode("overwrite").save()
        t_run = time.perf_counter() - t0
        row = {
            "build_s": round(t_build, 3),
            "run_all_tables_s": round(t_run, 3),
            "build_per_emission_ms": round(1000 * t_build / n, 1),
        }
        if prev_build is not None:
            row["marginal_ms_per_emission"] = round(
                1000 * (t_build - prev_build[1]) / (n - prev_build[0]), 1
            )
        prev_build = (n, t_build)
        out[f"emissions_{n}"] = row
        print(json.dumps({f"emissions_{n}": row}))

    print(json.dumps({"compile_scaling": out}))


if __name__ == "__main__":
    main()
