"""The declared query inventory for the driver's correctness gate.

Every entry pairs a Spark implementation (via the etielle_spark engine /
operators where the capability is engine-level, plain DataFrame ops where
it is Spark-native surface declared in SURVEY.md §2) with an ANSI-SQL
oracle that DuckDB runs on the same parquet tables.  Column names and
value rounding match on both sides because the driver hash-compares
values with columns sorted by name.

Conventions:
- ints -> bigint, floats -> round(double, fixed digits) on BOTH sides;
- timestamps -> 'yyyy-MM-dd HH:mm:ss' strings (session TZ pinned UTC);
- arrays -> joined strings (cross-engine list hashing is not stable).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .core import Field, TempField
from .fluent import etl
from .policies import AddPolicy, AppendPolicy, MaxPolicy, MinPolicy
from .transforms import get, get_from_parent, index, literal, lookup

# registry: name -> (spark_fn, oracle_sql | None)
QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], Optional[str]]] = {}


def q(name: str, sql: Optional[str]):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


def _prep(spark: SparkSession) -> None:
    """Pin semantics the queries rely on, independent of the caller's
    session defaults (the driver owns the session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    except Exception:
        pass


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prep(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ts(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; read nanos as long and rebuild a (microsecond)
    timestamp.  DuckDB reads the same column natively — second-granularity
    comparisons agree."""
    _prep(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))


# ===========================================================================
# Relational core (TPC-H-style) — scan/filter/project/agg/join surface
# ===========================================================================


@q(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "q02_filter_project",
    """
    SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_discount > 0.05
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            "l_returnflag",
        )
    )


@q(
    "q03_shipping_priority",
    """
    SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey LIMIT 10
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("o_orderkey", "revenue", _ts("o_orderdate").alias("orderdate"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@q(
    "q05_supplier_volume",
    """
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey).join(
            region, nation.n_regionkey == region.r_regionkey
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(dims, li.l_suppkey == supp.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
    )


@q(
    "q06_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ===========================================================================
# Engine surface on real data: nested extraction, keyed merge, policies,
# links, lookup — each via the fluent compiler (SURVEY §2.2-2.5)
# ===========================================================================


@q(
    "q07_each_explode",
    """
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           (row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1)::BIGINT AS pos
    FROM orders
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """goto/each/index/get_from_parent over nested docs built from orders.

    Round-trips the relational table through a nested document shape and
    back via the engine's explode compilation (FIXTURES.md F1/F5).
    """
    orders = _t(spark, sf_dir, "orders")
    docs = orders.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list(F.struct("o_orderkey", "o_totalprice"))).alias("orders")
    )
    result = (
        etl(docs, spark=spark)
        .goto("orders")
        .each()
        .map_to(
            "t",
            fields=[
                Field("custkey", get_from_parent("o_custkey")),
                Field("orderkey", get("o_orderkey")),
                Field("pos", index()),
            ],
        )
        .run()
    )
    return result["t"].select(
        "custkey", "orderkey", F.col("pos").cast("bigint").alias("pos")
    )


@q(
    "q08_keyed_merge",
    """
    SELECT c_custkey AS custkey, c_name AS name, round(c_acctbal, 4) AS acctbal
    FROM customer
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two map_to emissions merging field-wise on a composite key
    (FIXTURES.md F2; reference executor.py:272-281)."""
    cust = _t(spark, sf_dir, "customer")
    result = (
        etl(cust, spark=spark)
        .map_to(
            "c",
            fields=[Field("custkey", get("c_custkey")), Field("name", get("c_name"))],
            join_on=["custkey"],
        )
        .map_to(
            "c",
            fields=[
                TempField("custkey", get("c_custkey")),
                Field("acctbal", get("c_acctbal")),
            ],
            join_on=["custkey"],
        )
        .run()
    )
    return result["c"].select("custkey", "name", F.round("acctbal", 4).alias("acctbal"))


@q(
    "q09_nullkey_id_injection",
    """
    SELECT key AS id, key, c_name AS name FROM (
      SELECT CASE WHEN c_custkey % 7 = 0 THEN ''
                  WHEN c_custkey % 7 = 1 THEN NULL
                  ELSE c_custkey::VARCHAR END AS key,
             c_name
      FROM customer
    ) WHERE key IS NOT NULL AND key <> ''
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/empty-key skip + single-key id injection
    (reference executor.py:189-196,363-370)."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "keyish",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(""))
        .when(F.col("c_custkey") % 7 == 1, F.lit(None))
        .otherwise(F.col("c_custkey").cast("string")),
    )
    result = (
        etl(cust, spark=spark)
        .map_to(
            "t",
            fields=[Field("key", get("keyish")), Field("name", get("c_name"))],
            join_on=["key"],
        )
        .run()
    )
    return result["t"]


@q(
    "q04_merge_policies",
    """
    SELECT l_orderkey AS okey,
           round(sum(coalesce(l_quantity, 0)), 4) AS total_qty,
           strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_ship,
           round(max(l_extendedprice), 4) AS max_price,
           string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS lines_csv
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The six merge policies as distributed aggregation (FIXTURES.md F3;
    reference instances.py:36-85) — Add/Min/Max/Append over lineitem."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "__arrival", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    result = (
        etl(li, spark=spark, order_col="__arrival")
        .map_to(
            "agg",
            fields=[
                Field("okey", get("l_orderkey")),
                Field("total_qty", get("l_quantity"), merge=AddPolicy()),
                Field("min_ship", get("l_shipdate"), merge=MinPolicy()),
                Field("max_price", get("l_extendedprice"), merge=MaxPolicy()),
                Field("lines", get("l_linenumber"), merge=AppendPolicy()),
            ],
            join_on=["okey"],
        )
        .run()
    )
    return result["agg"].select(
        "okey",
        F.round("total_qty", 4).alias("total_qty"),
        _ts("min_ship").alias("min_ship"),
        F.round("max_price", 4).alias("max_price"),
        F.array_join(F.transform("lines", lambda x: x.cast("string")), ",").alias(
            "lines_csv"
        ),
    )


@q(
    "q10_link_to_fk",
    """
    SELECT l.l_orderkey AS okey, l.l_linenumber::BIGINT AS ln,
           o.o_orderkey AS big_order_fk
    FROM lineitem l
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 200000) o
           ON l.l_orderkey = o.o_orderkey
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """link_to as FK-populating equi join (reference fluent.py:578-640).

    Child rows use auto keys (every emission = a distinct row,
    executor.py:193-196); the link joins on the by-field, not the key.
    """
    li = _t(spark, sf_dir, "lineitem")
    big_orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    result = (
        etl(li, big_orders, spark=spark)
        .map_to(
            "lines",
            fields=[
                Field("okey", get("l_orderkey")),
                Field("ln", get("l_linenumber")),
            ],
        )
        .goto_root(1)
        .map_to(
            "big_orders",
            fields=[Field("id", get("o_orderkey"))],
            join_on=["id"],
        )
        .link_to("big_orders", by={"okey": "id"}, fk="big_order_fk", child="lines")
        .run()
    )
    return result["lines"].select(
        "okey", F.col("ln").cast("bigint").alias("ln"), "big_order_fk"
    )


@q(
    "q11_backlink_collect",
    """
    SELECT l_orderkey AS okey,
           string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS lines_csv,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """backlink: parent id-list -> ordered array of child rows
    (reference relationships.py:368-458)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "ln_key", F.col("l_orderkey") * 100 + F.col("l_linenumber")
    )
    order_docs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("ln_key")).alias("line_ids")
    )
    result = (
        etl(order_docs, li, spark=spark)
        .map_to(
            "orders_t",
            fields=[
                Field("okey", get("l_orderkey")),
                TempField("line_ids", get("line_ids")),
            ],
            join_on=["okey"],
        )
        .goto_root(1)
        .map_to(
            "lines_t",
            fields=[
                Field("ln_key", get("ln_key")),
                Field("ln", get("l_linenumber")),
            ],
            join_on=["ln_key"],
        )
        .backlink("orders_t", "lines_t", "lines", by={"line_ids": "ln_key"})
        .run()
    )
    out = result["orders_t"]
    return out.select(
        F.col("okey"),
        F.array_join(
            F.transform("lines", lambda s: s.getField("ln").cast("string")), ","
        ).alias("lines_csv"),
        F.size("lines").cast("bigint").alias("n_lines"),
    )


@q(
    "q12_junction_distinct",
    """
    SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Junction-pair extraction + exact dedup (SURVEY §2.6)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select("l_partkey", "l_suppkey").dropDuplicates()


@q(
    "q13_lookup_broadcast",
    """
    SELECT c.c_custkey, c.c_name, n.n_name AS nation_name
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """build_index/lookup as broadcast map probe (reference
    transforms.py:215-248, fluent.py:481-529)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    nmap = {r["n_nationkey"]: r["n_name"] for r in nation.collect()}
    result = (
        etl(cust, spark=spark)
        .build_index("nations", from_dict=nmap)
        .map_to(
            "t",
            fields=[
                Field("c_custkey", get("c_custkey")),
                Field("c_name", get("c_name")),
                Field("nation_name", lookup("nations", get("c_nationkey"))),
            ],
        )
        .run()
    )
    return result["t"]


@q(
    "q14_union_autokey",
    """
    SELECT c_name AS name, 'customer' AS kind FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-key emissions append rows — union semantics
    (reference executor.py:193-196)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    supp = _t(spark, sf_dir, "supplier")
    result = (
        etl(cust, supp, spark=spark)
        .map_to(
            "parties",
            fields=[Field("name", get("c_name")), Field("kind", literal("customer"))],
        )
        .goto_root(1)
        .map_to(
            "parties",
            fields=[Field("name", get("s_name")), Field("kind", literal("supplier"))],
        )
        .run()
    )
    return result["parties"]


@q(
    "q15_dedup_counts",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@q(
    "q16_window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "rk",
        )
    )


@q(
    "q17_set_difference",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.subtract(f)


@q(
    "q18_global_topk",
    """
    SELECT o_orderkey, round(o_totalprice, 4) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 4).alias("totalprice"))
    )


# ===========================================================================
# Event-time windows over `events` (Spark-native streaming surface,
# SURVEY §2.8 extension; runs identically on batch DataFrames)
# ===========================================================================


@q(
    "q19_tumbling_window",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            _ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@q(
    "q20_session_windows",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessioned AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id::BIGINT AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sessioned GROUP BY user_id, session_id
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands); the streaming twin is
    F.session_window — see etielle_spark.streaming."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessioned = flagged.withColumn("session_id", F.sum("new_session").over(w2))
    return sessioned.groupBy("user_id", F.col("session_id").cast("bigint").alias("session_id")).agg(
        _ts(F.min("ts")).alias("session_start"),
        F.count("*").alias("n_events"),
    )


@q(
    "q21_sliding_window",
    """
    WITH contrib AS (
      SELECT date_trunc('hour', ts)
               + to_minutes((extract('minute' FROM ts)::BIGINT // 30) * 30) AS b, *
      FROM events
    ), both_windows AS (
      SELECT b AS window_start, event_type, value FROM contrib
      UNION ALL
      SELECT b - INTERVAL 30 MINUTE AS window_start, event_type, value FROM contrib
    )
    SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n, round(sum(value), 4) AS total_value
    FROM both_windows GROUP BY 1, 2
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "60 minutes", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            _ts(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
