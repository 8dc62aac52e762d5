"""pq_fit receipt on the clustered stress corpus: recall vs Lloyd
iterations, with codebook sizes — pins that empty-code re-seeding keeps
full codebook resolution on a skewed/clustered corpus (round-9 dropout
shrank codebooks exactly where the data clusters) and that training
recall is monotone-ish over the seed sample.

    SPARK_GRAFT_CPUS=32 python tools/stress_pqfit.py [n_vectors] [m] [nc]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from stress_ann import synth  # noqa: E402  (tools/ sibling)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    nc = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

    from pyspark.sql import functions as F

    from etielle_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        pq_codebooks,
        pq_codes,
        pq_fit,
        pq_topk,
    )
    from etielle_spark.session import get_spark

    spark = get_spark("stress-pqfit", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = synth(spark, n).repartition(cpus).cache()
    corpus.count()
    queries = corpus.filter(F.col("vec_id") < 16).cache()
    queries.count()
    exact = brute_force_topk(corpus, queries, "vec_id", "embedding", k=10).cache()
    exact.count()

    def mean_recall(cbs):
        codes = pq_codes(corpus, "vec_id", "embedding", codebooks=cbs)
        out = pq_topk(codes, queries, "vec_id", "embedding", codebooks=cbs, k=10)
        rec = [r["recall"] for r in ann_recall(exact, out).collect()]
        return round(sum(rec) / len(rec), 4)

    report = {"metric": "stress_pqfit", "n_vectors": n, "m": m, "nc": nc, "cpus": cpus}
    seeds = pq_codebooks(corpus, "vec_id", "embedding", m=m, n_centroids=nc)
    report["seed_recall"] = mean_recall(seeds)
    rows = []
    for it in (1, 2, 4):
        t0 = time.perf_counter()
        cbs = pq_fit(corpus, "vec_id", "embedding", m=m, n_centroids=nc, n_iter=it)
        rows.append(
            {
                "n_iter": it,
                "fit_s": round(time.perf_counter() - t0, 2),
                "codebook_sizes": sorted({len(cb) for cb in cbs}),
                "recall": mean_recall(cbs),
            }
        )
        print(f"  n_iter={it}: {rows[-1]}", file=sys.stderr)
    report["fit"] = rows
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
