"""Table profiling: per-column statistics in one aggregation pass.

The schema-drift / data-quality step a pipeline runs on every new
snapshot before processing it.  All columns are profiled in a SINGLE
aggregate (Spark plans the multi-distinct via one expand — one pass
over the data, one shuffle), then unpivoted driver-free with
explode(array(struct...)).  Numeric and timestamp ranges are reported
as doubles, string ranges as strings, so nothing round-trips through
engine-specific number formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DateType,
    NumericType,
    StringType,
    TimestampNTZType,
    TimestampType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    round_to: int = 4,
) -> DataFrame:
    """Profile ``columns`` (default: all numeric/string/timestamp/date
    columns): row count, null count, exact distinct count, and min/max
    (numeric-ish columns as doubles — timestamps as epoch seconds,
    dates as epoch days; strings as strings).

    Exact ``count_distinct`` keeps the result oracle-comparable; swap
    ``approx_count_distinct`` in at 100 TB if a ±2% estimate is
    acceptable — same plan shape without the expand.

    Returns ``(column, dtype, n_rows, n_null, n_distinct, min_num,
    max_num, min_str, max_str)``, one row per profiled column.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n
            for n, t in fields.items()
            if isinstance(
                t, (NumericType, StringType, TimestampType, TimestampNTZType, DateType)
            )
        ]
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    structs = []
    for c in columns:
        t = fields[c]
        if isinstance(t, NumericType):
            num = F.col(c).cast("double")
        elif isinstance(t, (TimestampType, TimestampNTZType)):
            # NTZ casts through the (UTC-pinned) session timestamp type
            num = F.unix_timestamp(F.col(c).cast("timestamp")).cast("double")
        elif isinstance(t, DateType):
            num = F.datediff(F.col(c), F.lit("1970-01-01").cast("date")).cast("double")
        else:
            num = None
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if num is not None:
            aggs.append(F.round(F.min(num), round_to).alias(f"__min_{c}"))
            aggs.append(F.round(F.max(num), round_to).alias(f"__max_{c}"))
        else:
            aggs.append(F.min(F.col(c)).alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"__max_{c}"))
        is_num = num is not None
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(t.simpleString()).alias("dtype"),
                F.col("__n").cast("bigint").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("bigint").alias("n_null"),
                F.col(f"__nd_{c}").cast("bigint").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.col(f"__min_{c}") if not is_num else F.lit(None).cast("string")).alias("min_str"),
                (F.col(f"__max_{c}") if not is_num else F.lit(None).cast("string")).alias("max_str"),
            )
        )
    return df.agg(*aggs).select(F.explode(F.array(*structs)).alias("p")).select("p.*")
