"""Scale lint: sweep every declared query's physical plan for patterns
that break at 100 TB, regardless of whether the small-SF run is fast.

Flags per query:

- ``single_partition``: an ``Exchange SinglePartition`` that is NOT the
  final global rollup of an already-aggregated frame (global sorts and
  windows over everything serialize one task).
- ``python_row_udf``: ``BatchEvalPython`` — row-at-a-time Python in the
  plan (Arrow/pandas variants are fine and are NOT flagged).
- ``nested_loop``: ``CartesianProduct`` / ``BroadcastNestedLoopJoin``
  with a non-trivial build side — the O(n*m) plans.
- ``digest_window``: a ``Window`` partitioned on a content-digest
  column (md5/xxhash64/sha/crc32 of data) — one boilerplate digest =
  one unsplittable corpus-fraction-sized task (AQE skew-splits joins,
  never window partitions).  Rank-limit windows that Spark guards with
  a map-side ``WindowGroupLimit ... Partial`` on the same spec are
  exempt (each upstream task forwards at most ``limit`` rows per key).
  The skew-safe shapes: ``groupBy(digest).count()`` + join-back
  (``gram_duplication_stats``) or a left-semi bucket stop-list
  (``lsh_candidate_pairs``).
- ``sort_merge_joins`` / ``broadcast_joins`` / ``exchanges``: counts,
  for eyeballing shuffle pressure.

A small allowlist covers queries whose flagged pattern is the documented
correctness baseline for a first-class scale path elsewhere (e.g. q32
all-pairs cosine vs the q54/q61 ANN paths).

NOT a rule here — broadcast-over-explode: round 8 found (and fixed, via
merge hints in the fluent backlink) a static BroadcastHashJoin build of
a cached-then-exploded corpus side, where Catalyst's size estimate
misses the Generate blowup.  A lint for it was prototyped and rejected:
at lint SF, 23 queries legitimately broadcast small exploded sides
(band tables, ANN query sides) under AQE's RUNTIME size decision, which
re-decides correctly at scale — the hazard is only the STATIC
mis-estimate, which tiny-SF plans cannot distinguish from the adaptive
choice.  The engine paths whose semantics guarantee corpus-scale sides
(backlink) carry explicit merge hints instead.

    python tools/plan_lint.py [sf_dir]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

# pattern -> queries where it is documented-and-accepted, with the reason
ALLOW = {
    "nested_loop": {
        "q32_embedding_neardup": "all-pairs correctness baseline; scale paths are q54 (LSH) / q61 (IVF)",
        "q163_kmv_overlap": "pair enumeration over the |groups| dimension (a crossJoin of two tiny DISTINCT group lists); all per-item work is sketch-bounded equi-joins",
        "q31_cosine_topk": "broadcast of a 5-row query side against the corpus — the intended plan",
        "q49_range_join": "broadcast interval join — small interval side by contract",
        "q123_rrf_fusion": "broadcast of a 5-row query side for both input rankings — the intended plan; rankings at scale come from LSH/IVF candidate generators",
        "q124_hard_negatives": "broadcast of a 5-row query side against the corpus — the intended plan; scale path composes the label filter with lsh_bucket_topk/ivf_topk",
        "q169_psi_drift": "every nested-loop build side is a 1-row aggregate (quantile boundaries / histogram totals) broadcast onto a scan — the intended plan; both histograms reduce to 5 rows before the final join",
        "q178_mutual_nn": "brute-force mutual-NN correctness baseline (same contract as q32); the candidates= parameter takes LSH/IVF candidate pairs at scale and the plan becomes two windowed argmaxes over an equi-join",
        "q228_quantization_recall": "two broadcasts of the 5-row query side (exact + int8-reconstructed brute_force_topk) — the q31 contract twice; the eval measures quantization recall, the production search path is IVF/LSH (q54/q61/q224)",
        "q195_vocab_growth": "both nested-loop build sides are the 6-row checkpoint-marks frame broadcast onto ALREADY-AGGREGATED inputs (per-word first-occurrence docs, per-doc token counts) — 6 range comparisons per aggregated row, the intended plan",
        "q198_stylometric_deviation": "both nested-loop build sides are the 1-row corpus mean/std aggregate broadcast onto the per-doc frequency scan (appears twice because the z frame feeds both the centroid aggregate and the final join) — the intended plan, same class as q169",
        "q241_ann_recall_truncated": "two broadcasts of the 5-row query side (full-dim + truncated brute_force_topk feeding ann_recall) — the q228 contract; recall evaluation is sampled by construction, the production search path stays IVF/LSH",
        "q244_sharded_brute_force": "the q31 broadcast contract repeated once per bounded hash shard (3 shards here) — topk_sharded's whole point is that each nested-loop build side stays under MAX_BROADCAST_QUERY_ROWS; the scale path for query sets past max_shards is LSH/IVF both-sides",
    },
    "single_partition": {
        "q16_window_topk_per_group": "final presentation sort of an already-reduced frame",
        "q18_global_topk": "global top-k take — reduced before the single partition",
    },
    "python_row_udf": {
        "q35_apply_udf": "reference-parity apply() surface (documented slow path; map_column is the JVM escape hatch)",
    },
}


_DIGEST_CALL = re.compile(r"\b(?:md5|sha1?|sha2|xxhash64|crc32|hash)\(")


def _digest_cols(plan: str) -> set[str]:
    """Column refs whose defining expression IS a bare digest call
    (``md5(...) AS g#14``) — NOT digests folded into a bounded key
    (``pmod(xxhash64(...), 64) AS shard#3L`` starts with pmod, so the
    digest's closing paren is not followed by ``AS`` and it is skipped).
    """
    cols: set[str] = set()
    for m in _DIGEST_CALL.finditer(plan):
        i, depth = m.end() - 1, 0
        while i < len(plan):
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        am = re.match(r" AS (\w+#\d+L?)\b", plan[i + 1 : i + 80])
        if am:
            cols.add(am.group(1))
    return cols


def _digest_windows(plan: str) -> int:
    """Count Window operators partitioned on a digest-derived column and
    not guarded by a map-side WindowGroupLimit on the same spec."""
    digest_cols = _digest_cols(plan)
    if not digest_cols:
        return 0
    # each Partial WindowGroupLimit guards exactly ONE rank window on its
    # spec — count them per spec, so an unguarded count-over-digest
    # window SHARING a spec with a guarded rank window is still flagged
    from collections import Counter

    partial_limited = Counter(
        re.findall(r"WindowGroupLimit \[([^\]]*)\],.*, Partial\b", plan)
    )
    windows: Counter = Counter()
    for line in plan.splitlines():
        s = line.strip()
        if "WindowGroupLimit" in s or "Window [" not in s:
            continue
        pm = re.search(r"\],\s*\[([^\]]*)\]", s)
        if not pm:
            continue
        part_cols = re.findall(r"\w+#\d+L?", pm.group(1))
        if any(c in digest_cols for c in part_cols):
            windows[pm.group(1)] += 1
    return sum(
        max(0, cnt - partial_limited.get(spec, 0))
        for spec, cnt in windows.items()
    )


def lint(name: str, plan: str) -> dict:
    flags = {}
    dw = _digest_windows(plan)
    if dw:
        flags["digest_window"] = dw
    if "BatchEvalPython" in plan:
        flags["python_row_udf"] = plan.count("BatchEvalPython")
    # A global aggregate legitimately funnels its (already partially
    # aggregated, partition-count-sized) rows through one task; each such
    # rollup contributes a partial+final "HashAggregate(keys=[]" pair and
    # exactly one SinglePartition exchange.  Flag only the excess.
    global_aggs = (
        plan.count("HashAggregate(keys=[]")
        + plan.count("ObjectHashAggregate(keys=[]")
        + plan.count("SortAggregate(key=[]")
    ) // 2
    sp = plan.count("Exchange SinglePartition")
    if sp > global_aggs:
        flags["single_partition"] = sp
    # Nested-loop joins whose build side is a scalar aggregate (count(*),
    # sum-total broadcast into every row) are 1-row builds — fine.
    nl = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")
    if nl > (1 if global_aggs else 0):
        flags["nested_loop"] = nl
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from etielle_spark.benchqueries import QUERIES
    from etielle_spark.session import get_spark

    spark = get_spark("plan-lint", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    report, bad = {}, 0
    for name, (fn, _sql) in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - lint robustness
            report[name] = {"error": str(e)[:120]}
            bad += 1
            continue
        flags = lint(name, plan)
        entry = {
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "exchanges": plan.count("Exchange"),
        }
        for flag, count in flags.items():
            allowed = ALLOW.get(flag, {}).get(name)
            entry[flag] = count
            if allowed:
                entry[f"{flag}_allowed"] = allowed
            else:
                entry[f"{flag}_VIOLATION"] = True
                bad += 1
        report[name] = entry

    violations = {
        n: e for n, e in report.items()
        if any(k.endswith("_VIOLATION") or k == "error" for k in e)
    }
    print(json.dumps({"queries": len(report), "violations": violations}, indent=2))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
