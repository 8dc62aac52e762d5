"""ANN scale stress: the persistent IVF / IVF-PQ index on a 550k-vector
corpus (1100x the testdata embeddings table).

Synthesizes 500k deterministic 64-dim unit vectors with REAL cluster
structure (256 hash-derived centers + per-id noise, all column
expressions — no driver data, no RNG state), builds the cell-partitioned
index, appends a 50k batch, and measures the three query paths against
brute force:

- ``query``      — raw vectors from the probed cells (nprobe/nlist scan)
- ``query_adc``  — PQ code columns only from the probed cells
- ``query_adc(refine=4)`` — ADC shortlist re-ranked with exact cosine

This is the shape check for the billion-vector story: build/add are one
scan + a cell-clustered write, probes read nprobe/nlist of the corpus
(and only m longs per vector on the ADC path), and recall is a measured
number vs brute force, not an assumption.

    python tools/stress_ann.py [n_vectors] [pq_m] [pq_centroids] [pq_residual]

Parallelism follows ``SPARK_GRAFT_CPUS`` (default 8) so the receipts can
be taken at the driver config (32) for like-for-like comparison with the
bench record.  ``pq_residual`` (1/0, default 1) selects the encoding so
the residual-vs-raw recommendation is a measured row, not an assumption.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_CLUSTERS = 256
DIM = 64


def synth(spark, n: int, id_offset: int = 0):
    """Deterministic clustered unit vectors: id -> cluster via modulo,
    component = 0.85 * hash(cluster, d) + 0.45 * hash(id, d), normalized.
    Pure column expressions, reproducible across runs and engines."""
    from pyspark.sql import functions as F

    def h01(*cols):
        # xxhash64 -> [-1, 1], deterministic
        return (F.pmod(F.xxhash64(*cols), F.lit(2000001)) - 1000000) / 1000000.0

    ids = spark.range(id_offset, id_offset + n).select(
        F.col("id").alias("vec_id"), (F.col("id") % N_CLUSTERS).alias("c")
    )
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))
    raw = F.transform(
        dims,
        lambda d: h01(F.col("c"), d, F.lit("center")) * 0.85
        + h01(F.col("vec_id"), d, F.lit("noise")) * 0.45,
    )
    norm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return ids.select(
        "vec_id",
        F.transform(raw, lambda x: x / norm).alias("embedding"),
    )


def main() -> None:
    import os

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    pq_m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    pq_nc = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    pq_res = bool(int(sys.argv[4])) if len(sys.argv) > 4 else True
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from pyspark.sql import functions as F

    from etielle_spark.operators.similarity import ann_recall, brute_force_topk
    from etielle_spark.session import get_spark
    from etielle_spark.streaming.incremental_ann import PersistentIVFIndex

    spark = get_spark("stress-ann", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synth(spark, n).repartition(cpus).cache()
    corpus.count()
    extra = synth(spark, n // 10, id_offset=n)
    queries = corpus.filter(F.col("vec_id") < 16).cache()
    queries.count()

    timings: dict[str, float] = {}
    recalls: dict[str, float] = {}

    def step(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]} s", file=sys.stderr)
        return out

    def mean_recall(exact, approx):
        rec = [r["recall"] for r in ann_recall(exact, approx).collect()]
        return round(sum(rec) / len(rec), 4)

    work = tempfile.mkdtemp(prefix="stress_ann_")
    try:
        idx = PersistentIVFIndex(
            spark, work + "/ivf", nlist=64, pq_m=pq_m, pq_centroids=pq_nc,
            pq_residual=pq_res,
        )
        step("build_500k", lambda: idx.build(corpus))
        step("add_50k", lambda: idx.add(extra))

        exact = step(
            "brute_force_16q",
            lambda: brute_force_topk(
                corpus.unionByName(extra), queries, "vec_id", "embedding", k=10
            ).cache(),
        )
        exact.count()

        raw = step(
            "query_raw_nprobe8",
            lambda: idx.query(queries, k=10, nprobe=8).cache(),
        )
        raw.count()
        adc = step(
            "query_adc_nprobe8",
            lambda: idx.query_adc(queries, k=10, nprobe=8).cache(),
        )
        adc.count()
        ref = step(
            "query_adc_refine4",
            lambda: idx.query_adc(queries, k=10, nprobe=8, refine=4).cache(),
        )
        ref.count()

        recalls["raw_nprobe8"] = mean_recall(exact, raw)
        recalls["adc_nprobe8"] = mean_recall(exact, adc)
        recalls["adc_refine4"] = mean_recall(exact, ref)

        fpc = idx.files_per_cell()
        print(
            json.dumps(
                {
                    "metric": "stress_ann",
                    "n_vectors": n + n // 10,
                    "nlist": 64,
                    "cpus": cpus,
                    "pq": f"m={pq_m} x {pq_nc} "
                    + ("residual" if pq_res else "raw"),
                    "timings": timings,
                    "recall_at_10_vs_brute": recalls,
                    "cells": len(fpc),
                    "max_files_per_cell": max(fpc.values()) if fpc else 0,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
