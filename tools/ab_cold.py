"""Round-11 cold-JVM interleaved A/B runner (VERDICT r10 item 1).

Each SAMPLE is one fresh python+JVM subprocess that runs a named
measurement under a variant env setting with the driver's bench
methodology (one untimed warm pass, then 3 timed runs, median) and
prints ``MED=<sec>``.  Variant order alternates A,B,B,A,A,B,... so
monotone box drift cancels instead of biasing one side.

Targets (variant env var -> values):
  simhash      ETIELLE_SIMHASH_FORM   sqltext | columnapi   (q30, sf0.1)
  sink_overlap ETIELLE_SINK_OVERLAP   1 | 0                 (streaming_ref)
  events_parts ETIELLE_STREAM_PARTS   derived | session     (streaming_events)
  q100_digest  ETIELLE_GRAM_DIGEST    bin | hex             (q100, curve corpus)
  q239_cc      ETIELLE_CC_LOOP        fast | base           (q239, curve corpus)
  q27_curve    (no variant -- repeated cold-JVM samples of the curve row)

Usage:
  SPARK_GRAFT_CPUS=32 python tools/ab_cold.py <target> [pairs=3]
  python tools/ab_cold.py --child <target> <variant>     (internal)
"""

from __future__ import annotations

import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BIG_DIR = os.path.join(REPO, ".benchdata", "sf1synth")

TARGETS: dict[str, tuple[str, list[str]]] = {
    "simhash": ("ETIELLE_SIMHASH_FORM", ["sqltext", "columnapi"]),
    "sink_overlap": ("ETIELLE_SINK_OVERLAP", ["1", "0"]),
    "events_parts": ("ETIELLE_STREAM_PARTS", ["derived", "session"]),
    "q100_digest": ("ETIELLE_GRAM_DIGEST", ["bin", "hex"]),
    "q239_cc": ("ETIELLE_CC_LOOP", ["fast", "base"]),
    "q239_parts": ("ETIELLE_CC_LOOP", ["parts", "base"]),
    "q239_jump": ("ETIELLE_CC_LOOP", ["jump2", "base"]),
    "q27_curve": ("", ["base"]),
}


def _timed(fn, runs: int = 3, between=None) -> float:
    fn()  # untimed warm pass (plan compile + codegen + page cache)
    if between is not None:
        between()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
        if between is not None:
            between()
    return statistics.median(out)


def child(target: str, variant: str) -> None:
    from etielle_spark.session import get_spark

    spark = get_spark(f"ab-{target}-{variant}", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if target == "simhash":
        from etielle_spark.benchqueries import QUERIES

        fn, _ = QUERIES["q30_simhash"]
        med = _timed(
            lambda: fn(spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
    elif target == "sink_overlap":
        import bench

        med = _timed(lambda: bench.streaming_reference_workload(spark))
    elif target == "events_parts":
        import bench

        med = _timed(lambda: bench.streaming_events_windows(spark))
    elif target in ("q100_digest", "q27_curve", "q239_cc", "q239_parts", "q239_jump"):
        from etielle_spark import release_operator_caches
        from etielle_spark.benchqueries import QUERIES

        assert os.path.exists(os.path.join(BIG_DIR, "_DONE")), "run bench.py first"
        qname = {
            "q100_digest": "q100_gram_duplication",
            "q27_curve": "q27_minhash_signatures",
            "q239_cc": "q239_cluster_canonicalize",
            "q239_parts": "q239_cluster_canonicalize",
            "q239_jump": "q239_cluster_canonicalize",
        }[target]
        fn, _ = QUERIES[qname]

        def between():
            release_operator_caches()
            spark.catalog.clearCache()

        med = _timed(
            lambda: fn(spark, BIG_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            between=between,
        )
    else:
        raise SystemExit(f"unknown target {target}")
    print(f"MED={med:.3f}")
    spark.stop()


def main() -> None:
    target = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    env_var, variants = TARGETS[target]
    # alternate A,B then B,A per pair: ABBA ABBA ...
    order: list[str] = []
    for i in range(pairs):
        order.extend(variants if i % 2 == 0 else list(reversed(variants)))
    results: dict[str, list[float]] = {v: [] for v in variants}
    for v in order:
        env = dict(os.environ)
        if env_var:
            env[env_var] = v
        env.setdefault("SPARK_GRAFT_SF_DIR", SF_DIR)
        env.setdefault("SPARK_GRAFT_CPUS", str(CPUS))
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", target, v],
            capture_output=True,
            text=True,
            env=env,
            timeout=1800,
            cwd=REPO,
        )
        med = None
        for line in proc.stdout.splitlines():
            if line.startswith("MED="):
                med = float(line.split("=", 1)[1])
        if med is None:
            print(f"child FAILED variant={v} rc={proc.returncode}")
            print(proc.stderr[-2000:])
            sys.exit(1)
        results[v].append(med)
        print(
            f"sample variant={v} med={med:.3f} "
            f"(subprocess wall {time.perf_counter() - t0:.1f}s)",
            flush=True,
        )
    for v, xs in results.items():
        print(
            f"RESULT target={target} variant={v} "
            f"med_of_meds={statistics.median(xs):.3f} "
            f"all={[round(x, 3) for x in xs]}"
        )


if __name__ == "__main__":
    if sys.argv[1] == "--child":
        child(sys.argv[2], sys.argv[3])
    else:
        main()
