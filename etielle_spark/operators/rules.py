"""Declarative data-quality rules: evaluate a named set of row
predicates in ONE aggregation pass and report violations per rule.

The contract gate a pipeline runs on every ingest batch ("price
positive, status in domain, fk not null") before letting the batch
through.  Every rule is a Column predicate describing VALID rows; a
NULL predicate result (SQL three-valued logic) counts as a violation —
an unknown is not a pass.

One scan, one reduce: all rules aggregate as expressions of a single
``agg`` (map-side combinable), then unpivot driver-free via
explode(array(struct...)).  At 100 TB this costs exactly one pass over
the data regardless of rule count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_rules(df: DataFrame, rules: dict[str, Column | str]) -> DataFrame:
    """Returns one row per rule: ``(rule, n_rows, n_violations,
    violation_frac)`` (frac rounded to 6; NULL predicate = violation).
    String rules are parsed as SQL boolean expressions.
    """
    if not rules:
        raise ValueError("check_rules: no rules given")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, pred in rules.items():
        p = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.sum((~F.coalesce(p, F.lit(False))).cast("bigint")).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.coalesce(F.col(f"__v_{name}"), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
            )
            for name in rules
        ]
    )
    return (
        wide.select(F.explode(entries).alias("r"))
        .select("r.rule", "r.n_rows", "r.n_violations")
        .withColumn(
            "violation_frac",
            F.round(
                F.when(
                    F.col("n_rows") > 0,
                    F.col("n_violations").cast("double") / F.col("n_rows"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: "list[str]",
    k: int,
    *,
    sensitive_col: "str | None" = None,
    l: int | None = None,
) -> DataFrame:
    """Privacy audit before publishing a dataset: find quasi-identifier
    groups that violate k-anonymity (fewer than ``k`` rows share the
    combination) and, when ``sensitive_col`` is given, l-diversity
    (fewer than ``l`` distinct sensitive values inside the group).

    One groupBy over the quasi-identifier columns — partial aggregation
    applies, nothing is collected; the violating-groups result is
    typically tiny relative to the input.  Returns the quasi columns plus
    ``group_size`` (and ``distinct_sensitive``), one row per violating
    group, with ``violation`` naming which rule failed ('k', 'l', or
    'k+l').
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if sensitive_col is not None and (l is None or l < 2):
        raise ValueError("l must be >= 2 when sensitive_col is given")
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("distinct_sensitive")
        )
    grouped = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    k_viol = F.col("group_size") < k
    if sensitive_col is None:
        return grouped.filter(k_viol).withColumn("violation", F.lit("k"))
    l_viol = F.col("distinct_sensitive") < l
    return grouped.filter(k_viol | l_viol).withColumn(
        "violation",
        F.when(k_viol & l_viol, F.lit("k+l"))
        .when(k_viol, F.lit("k"))
        .otherwise(F.lit("l")),
    )
