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
