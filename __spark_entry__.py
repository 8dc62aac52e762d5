"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the declared operator inventory (SURVEY.md §2 plus
the training-data extensions) as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives the DuckDB twin for each.  Implementations live in
etielle_spark.benchqueries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etielle_spark.benchqueries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    fn, _ = QUERIES["q01_pricing_summary"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
