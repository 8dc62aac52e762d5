"""Capture .explain("formatted") for headline queries into plans/<round>/
(round from $SPARK_GRAFT_PLANS_ROUND, default r11).

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

Writes plans/r10/<query>_<tag>.txt for each headline query (or the given
subset).  The plan is the judge's evidence for plan-shape claims in
OPTIMIZATION_r10.md, so capture is done at the same sf dir and core count
as the bench ($SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

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
    "q100_gram_duplication",
    "q126_curation_pipeline",
    "q211_covariance_matrix",
    "q215_logreg_train_2step",
    "q232_line_dedup",
    "q237_ks_drift",
    "q239_cluster_canonicalize",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    names = only if only else HEADLINE

    from etielle_spark.benchqueries import QUERIES
    from etielle_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-capture", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        fn, _sql = QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in place
            plan = f"ERROR capturing plan: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
