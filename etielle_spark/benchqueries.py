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

import math
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

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


_PREPPED: set[int] = set()


def _prep(spark: SparkSession) -> None:
    """Pin semantics the queries rely on, independent of the caller's
    session defaults (the driver owns the session).  Runs ONCE per
    session — repeated global conf mutation is both overhead and a race
    when queries run concurrently on a shared session (every query here
    is also ANSI-robust, so the ANSI pin is belt-and-braces for
    reference-permissive NULL semantics, not a correctness crutch)."""
    key = id(spark._jsparkSession) if hasattr(spark, "_jsparkSession") else id(spark)
    if key in _PREPPED:
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
    except Exception:
        pass
    _PREPPED.add(key)


# (applicationId, sf_dir, table) -> DataFrame.  A DataFrame is an
# immutable PLAN, so reuse across queries in one session is safe; the
# cache saves the ~0.14 s parquet-footer/schema py4j round trip that
# every query otherwise pays per table (bench loops and the 244-query
# oracle sweep touch the same ten tables hundreds of times).  Keyed by
# applicationId so a restarted session never sees stale JVM handles.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prep(spark)
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        # evict dead applications' entries so stop/start loops (bench
        # scale-curve subprocesses, test harnesses) don't retain py4j
        # handles of stopped sessions for the process lifetime
        for k in [k for k in _TABLE_CACHE if k[0] != app]:
            del _TABLE_CACHE[k]
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _TABLE_CACHE[key] = df
    return df


def _ts(col):
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def fix_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the events ``ts`` column to a plain (micros) TIMESTAMP.

    Earlier testdata generations stored TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects — with ``nanosAsLong`` those arrive as long
    nanos and are rebuilt as microsecond timestamps.  Current generations
    store TIMESTAMP(MICROS) (arrives as timestamp or timestamp_ntz) and
    only need an NTZ->TZ cast.  DuckDB reads the same column natively
    either way, so oracle comparisons agree at second granularity.
    """
    ts_type = df.schema[col].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn(
            col, F.timestamp_micros((F.col(col) / 1000).cast("long"))
        )
    if isinstance(ts_type, T.TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, "events@ts-fixed")
    df = _TABLE_CACHE.get(key)
    if df is None:
        for k in [k for k in _TABLE_CACHE if k[0] != app]:
            del _TABLE_CACHE[k]
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = fix_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
        _TABLE_CACHE[key] = df
    return df


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
    # release the PREVIOUS invocation's backlink-parent cache (the
    # result handed it over on the sink-less path) — repeated builds in
    # one session (bench loops, notebooks) must not accumulate stale
    # MEMORY_AND_DISK parents
    prev = getattr(q11, "_last_result", None)
    if prev is not None:
        prev.release()
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
            # NO assume_distinct here, deliberately: in real TPC-H
            # (orderkey, linenumber) is the primary key, but THIS
            # repo's synthetic lineitem carries duplicate pairs (up to
            # 5x at sf0.001), so the hint would be a false assertion
            # and the keyed LWW merge is semantically REQUIRED — the
            # round-10 full-sweep oracle caught exactly that (doubled
            # backlink rows).  The hint is for data whose keys are
            # honestly distinct; q11's merge premium is real work.
        )
        .backlink("orders_t", "lines_t", "lines", by={"line_ids": "ln_key"})
        .run()
    )
    q11._last_result = result
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


# ===========================================================================
# Training-data operators (SURVEY extension): text analysis, dedup,
# similarity search, multimodal plumbing — on documents/embeddings
# ===========================================================================

# Shared DuckDB fragments replicating operators/dedup.py tokenization
_TOKS = ("CASE WHEN length(trim(text)) > 0 "
         "THEN string_split_regex(lower(trim(text)), '\\s+') "
         "ELSE []::VARCHAR[] END")
_SHINGLES3 = (
    "list_distinct(CASE WHEN len(t) >= 3 THEN "
    "[array_to_string(t[i+1:i+3], ' ') for i in range(len(t)-2)] "
    "WHEN len(t) > 0 THEN [array_to_string(t, ' ')] ELSE [] END)"
)
_DOCS_PLUS_CLONES = (
    "SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20"
)


def _minhash_mins_sql(num_hashes: int) -> str:
    """DuckDB fragment reproducing operators/dedup.py minhash exactly:
    one 32-bit md5-prefix base hash per shingle, then multiply-mod-P
    universal-hash permutations with the same md5-derived (a, b)
    constants."""
    from .operators.dedup import MINHASH_P, minhash_perm_constants

    base = f"(('0x' || substr(md5(shingle), 1, 8))::BIGINT % {MINHASH_P})"
    return ",\n             ".join(
        f"min(({a} * {base} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in enumerate(minhash_perm_constants(num_hashes))
    )


_MINHASH_MINS8 = _minhash_mins_sql(8)


def _docs_plus_clones(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = (
        docs.filter(F.col("doc_id") < 20)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    return docs.union(clones)


@q(
    "q22_token_stats",
    f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           len(t)::BIGINT AS n_tokens,
           len(list_distinct(t))::BIGINT AS n_distinct_tokens,
           round(CASE WHEN len(t) > 0
                 THEN list_sum(list_transform(t, x -> length(x)))::DOUBLE / len(t)
                 END, 4) AS avg_token_len,
           ceil(length(text) / 4)::BIGINT AS est_bpe_tokens
    FROM toks
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import token_stats

    return token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "q23_quality_score",
    f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
    m AS (
      SELECT doc_id,
             length(text)::DOUBLE AS nc,
             length(regexp_replace(text, '[^.,;:!?''"()\\[\\]]', '', 'g'))::DOUBLE AS np,
             length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS nu,
             len(list_filter(t, x -> x IN ('the','and','of','to','in','is','that','it','with','for','der','die','das','und','ist','nicht','mit','ein','zu','von','le','la','les','et','est','pas','pour','que','une','dans','el','los','las','es','no','por','una','para'))) AS ns,
             len(t) AS nt
      FROM toks
    )
    SELECT doc_id,
           nc::BIGINT AS n_chars,
           nt::BIGINT AS n_tokens,
           round(CASE WHEN nc > 0 THEN np / nc ELSE 0 END, 6) AS punct_ratio,
           round(CASE WHEN nc > 0 THEN nu / nc ELSE 0 END, 6) AS upper_ratio,
           round(CASE WHEN nt > 0 THEN ns::DOUBLE / nt ELSE 0 END, 6) AS stopword_ratio,
           round(least(nt / 100.0, 1.0) * 0.4
                 + (CASE WHEN nt > 0 THEN ns::DOUBLE / nt ELSE 0 END) * 0.4
                 + (1.0 - least((CASE WHEN nc > 0 THEN np / nc ELSE 0 END) * 10.0, 1.0)) * 0.2,
                 6) AS quality_score
    FROM m
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import quality_score

    return quality_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "q24_lang_id",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    hits AS (
      SELECT doc_id,
        len(list_filter(t, x -> x IN ('the','and','of','to','in','is','that','it','with','for'))) AS h_en,
        len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','zu','von'))) AS h_de,
        len(list_filter(t, x -> x IN ('le','la','les','et','est','pas','pour','que','une','dans'))) AS h_fr,
        len(list_filter(t, x -> x IN ('el','la','los','las','es','no','por','que','una','para'))) AS h_es
      FROM toks
    )
    SELECT doc_id,
           CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                ELSE 'de' END AS pred_lang,
           greatest(h_en, h_de, h_fr, h_es)::BIGINT AS marker_hits
    FROM hits
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import lang_id

    return lang_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "q25_fingerprint",
    """
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
      FROM documents
    )
    SELECT doc_id, md5(norm) AS fingerprint,
           md5(substr(norm, 1, 64)) AS head_fp,
           md5(substr(reverse(norm), 1, 64)) AS tail_fp,
           length(norm)::BIGINT AS norm_len
    FROM n
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import doc_fingerprint

    return doc_fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "q26_exact_dedup_docs",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES})
    SELECT min(doc_id) AS doc_id, count(*) AS dup_count
    FROM all_docs GROUP BY md5(text)
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import exact_dedup_by_content

    return exact_dedup_by_content(_docs_plus_clones(spark, sf_dir), "doc_id", "text")


@q(
    "q27_minhash_signatures",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    )
    SELECT doc_id, h0::VARCHAR || '|' || h1::VARCHAR || '|' || h2::VARCHAR || '|' || h3::VARCHAR || '|' || h4::VARCHAR || '|' || h5::VARCHAR || '|' || h6::VARCHAR || '|' || h7::VARCHAR AS sig
    FROM mins
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_signatures

    sig = minhash_signatures(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=8
    )
    return sig.select("doc_id", F.array_join("signature", "|").alias("sig"))


@q(
    "q28_lsh_candidate_pairs",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    )
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(
        _docs_plus_clones(spark, sf_dir), "doc_id", "text", num_hashes=8, bands=4
    )


@q(
    "q29_ngram_jaccard",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE round(i::DOUBLE / (sa.sz + sb.sz - i), 6) >= 0.3
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import jaccard_pairs

    out = jaccard_pairs(_docs_plus_clones(spark, sf_dir), "doc_id", "text")
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).filter(F.round(F.col("jaccard"), 6) >= 0.3)


@q(
    "q30_simhash",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents) s(doc_id, text, t)),
    h AS (SELECT doc_id, md5(tok) AS hex FROM (SELECT doc_id, tok FROM toks) _),
    bits AS (
      SELECT doc_id, b,
             instr('0123456789abcdef', substr(hex, (b // 4) + 1, 1)) - 1 AS nib
      FROM h, (SELECT unnest(range(0, 32)) AS b) r
    ),
    contrib AS (
      SELECT doc_id, b,
             (floor(nib / power(2, 3 - b % 4))::INT % 2) * 2 - 1 AS c
      FROM bits
    ),
    summed AS (SELECT doc_id, b, sum(c) AS s FROM contrib GROUP BY doc_id, b)
    SELECT doc_id,
           string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS simhash
    FROM summed GROUP BY doc_id
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash

    return simhash(_t(spark, sf_dir, "documents"), "doc_id", "text", bits=32)


@q(
    "q31_cosine_topk",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
      FROM (SELECT * FROM e WHERE vec_id < 5) q
      JOIN e c USING (i)
      WHERE c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings")
    q_side = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    c_side = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").cast("array<double>").alias("cv")
    )
    scored = (
        c_side.crossJoin(F.broadcast(q_side))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@q(
    "q32_embedding_neardup",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
      FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots JOIN norms na ON id_a = na.vec_id JOIN norms nb ON id_b = nb.vec_id
    WHERE round(dot / (na.nrm * nb.nrm), 6) >= 0.35
    """,
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import cosine_pairs

    out = cosine_pairs(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding", threshold=-1.0)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine")).filter(
        F.round(F.col("cosine"), 6) >= 0.35
    )


@q(
    "q33_multimodal_features",
    """
    SELECT doc_id AS id, octet_length(encode(text))::BIGINT AS byte_len,
           md5(text) AS digest
    FROM documents
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload plumbing: encode -> mapInPandas feature extraction
    (Arrow batches); the oracle checks the deterministic parts."""
    from .operators.multimodal import attach_payload, extract_features

    docs = attach_payload(_t(spark, sf_dir, "documents"), "text")
    feats = extract_features(docs, "doc_id", feat_dim=4)
    return feats.select("id", "byte_len", "digest")


@q(
    "q34_scalar_transforms",
    """
    SELECT 'C_' || c_custkey::VARCHAR AS cid,
           c_name || '-' || c_mktsegment AS descr,
           c_mktsegment AS seg_or_name,
           length(c_name)::INT AS name_len
    FROM customer
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar transform surface: format_id/concat/coalesce/len_of
    (reference transforms.py:161-203)."""
    from .transforms import coalesce as t_coalesce, concat, format_id, len_of

    cust = _t(spark, sf_dir, "customer")
    result = (
        etl(cust, spark=spark)
        .map_to(
            "t",
            fields=[
                Field("cid", format_id(literal("C"), get("c_custkey"))),
                Field("descr", concat(get("c_name"), literal("-"), get("c_mktsegment"))),
                Field("seg_or_name", t_coalesce(get("no_such_col"), get("c_mktsegment"))),
                Field("name_len", len_of(get("c_name"))),
            ],
        )
        .run()
    )
    return result["t"]


@q(
    "q35_apply_udf",
    """
    SELECT c_custkey, upper(c_name) AS shout FROM customer
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """apply() escape hatch: arbitrary Python over a transform result
    (reference transforms.py:206-212) — a row-at-a-time UDF."""
    from .transforms import apply

    cust = _t(spark, sf_dir, "customer")
    result = (
        etl(cust, spark=spark)
        .map_to(
            "t",
            fields=[
                Field("c_custkey", get("c_custkey")),
                Field("shout", apply(lambda s: s.upper() if s else None, get("c_name"))),
            ],
        )
        .run()
    )
    return result["t"]


# ===========================================================================
# Spark-native SQL surface extensions (SURVEY §2.3/§2.6 declared set):
# JSON functions, running windows, cube/rollup, pivot, validation channel
# ===========================================================================


@q(
    "q36_json_extract",
    """
    SELECT event_id, json_extract(props, '$.k')::BIGINT AS k,
           event_type
    FROM events
    WHERE json_extract(props, '$.k')::BIGINT > 50
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over a string column (get_json_object/from_json) —
    the engine's `apply`-escape-hatch cases come free in Spark."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", k.alias("k"), "event_type")
        .filter(F.col("k") > 50)
    )


@q(
    "q37_running_window",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING), 4) AS running_spend,
           lag(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order
    FROM orders
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_spend"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
    )


@q(
    "q38_cube",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           count(*) AS n, round(sum(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
            "qty",
        )
    )


@q(
    "q39_pivot",
    """
    SELECT o_orderpriority,
           round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'O'), 0), 4) AS status_O,
           round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'F'), 0), 4) AS status_F,
           round(coalesce(sum(o_totalprice) FILTER (o_orderstatus = 'P'), 0), 4) AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .sum("o_totalprice")
    )
    return out.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 4).alias("status_O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 4).alias("status_F"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 4).alias("status_P"),
    )


@q(
    "q40_validation_errors",
    """
    SELECT concat('C_', c_custkey::VARCHAR) AS key,
           'age' AS field,
           concat('field age: cannot cast ''', raw_age, ''' to int') AS message,
           'update' AS stage
    FROM (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'not-a-number'
                  ELSE (c_custkey % 80)::VARCHAR END AS raw_age
      FROM customer
    ) WHERE c_custkey % 5 = 0
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row validation-error channel (FIXTURES F11; reference
    errors='collect', fluent.py:2042-2049): bad rows land in the errors
    DataFrame, good rows proceed — the job never fails."""
    cust = _t(spark, sf_dir, "customer").withColumn(
        "raw_age",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("not-a-number")).otherwise(
            (F.col("c_custkey") % 80).cast("string")
        ),
    ).withColumn("ckey", F.concat(F.lit("C_"), F.col("c_custkey").cast("string")))
    result = (
        etl(cust, spark=spark)
        .map_to(
            "people",
            fields=[
                Field("key", get("ckey")),
                Field("age", get("raw_age")),
            ],
            join_on=["key"],
            schema="key string, age int",
        )
        .run()
    )
    return result.errors["people"]


# ===========================================================================
# Additional TPC-H-style analytics (join-heavy bench credibility)
# ===========================================================================


@q(
    "q41_nation_volume_share",
    """
    WITH volumes AS (
      SELECT n.n_name AS nation,
             extract('year' FROM o.o_orderdate)::BIGINT AS yr,
             l.l_extendedprice * (1 - l.l_discount) AS vol
      FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
    )
    SELECT nation, yr, round(sum(vol), 4) AS volume
    FROM volumes GROUP BY nation, yr
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("vol"),
        )
        .groupBy("nation", "yr")
        .agg(F.round(F.sum("vol"), 4).alias("volume"))
    )


@q(
    "q42_part_type_profit",
    """
    SELECT p.p_type AS ptype,
           round(sum(l.l_extendedprice * (1 - l.l_discount) - 0.8 * l.l_quantity * p.p_retailprice), 4) AS profit,
           count(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size > 20
    GROUP BY p.p_type
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") > 20)
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.8 * F.col(
        "l_quantity"
    ) * F.col("p_retailprice")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_type").alias("ptype"))
        .agg(F.round(F.sum(profit), 4).alias("profit"), F.count("*").alias("n"))
    )


@q(
    "q43_returned_customers",
    """
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           n.n_name AS nation
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ===========================================================================
# Declared Spark-native function surface (SURVEY §2.3: date/string) + §2.6
# ===========================================================================


@q(
    "q44_date_functions",
    """
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95,
           extract('year' FROM o_orderdate)::BIGINT AS yr,
           extract('quarter' FROM o_orderdate)::BIGINT AS qtr
    FROM orders
    """,
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        _ts(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("days_since_95"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
    )


@q(
    "q45_string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substr(c_name, 1, 8) AS prefix,
           concat_ws('|', c_name, c_mktsegment) AS joined,
           length(trim(c_name))::INT AS trimmed_len,
           replace(c_name, '#', '-') AS replaced,
           CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END AS has_one
    FROM customer
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("joined"),
        F.length(F.trim(F.col("c_name"))).cast("int").alias("trimmed_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("replaced"),
        F.when(F.col("c_name").like("%1%"), F.lit(1)).otherwise(F.lit(0)).alias("has_one"),
    )


@q(
    "q46_intersect",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


@q(
    "q47_json_roundtrip_etl",
    """
    SELECT o_orderkey AS okey, o_custkey AS custkey,
           round(o_totalprice, 4) AS price
    FROM orders
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core use case at relational scale: serialize rows
    to JSON documents, parse them back (from_json), and run the fluent
    JSON->relational pipeline over the parsed docs — one compiled plan,
    no driver-side loops."""
    orders = _t(spark, sf_dir, "orders")
    payloads = orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("okey"),
                F.col("o_custkey").alias("custkey"),
                F.struct(F.col("o_totalprice").alias("amount")).alias("pricing"),
            )
        ).alias("payload")
    )
    parsed = payloads.select(
        F.from_json(
            "payload", "okey bigint, custkey bigint, pricing struct<amount:double>"
        ).alias("doc")
    )
    result = (
        etl(parsed, spark=spark)
        .goto("doc")
        .each(mode="single")
        .map_to(
            "orders_t",
            fields=[
                Field("okey", get("okey")),
                Field("custkey", get("custkey")),
                Field("price", get("pricing.amount")),
            ],
            join_on=["okey"],
        )
        .run()
    )
    return result["orders_t"].select(
        "okey", "custkey", F.round("price", 4).alias("price")
    )


# ===========================================================================
# Temporal joins Spark lacks natively (operators/temporal.py)
# ===========================================================================


@q(
    "q48_asof_join",
    """
    WITH e AS (
      SELECT event_id, user_id,
             to_timestamp(788918400 + (floor(epoch(ts))::BIGINT - 1704067200) * 80) AS ets
      FROM events
    ),
    o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS okey
      FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, o.okey AS last_okey,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_orderdate
    FROM e ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ets
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (union-and-window, fully codegen'd) — for each event,
    the user's most recent order at or before the event time.  Event
    timestamps are affinely mapped into the order-date era so the match
    varies per event; the DuckDB oracle uses its native ASOF JOIN."""
    from .operators.temporal import asof_join

    ev = _events(spark, sf_dir)
    # 788918400 = epoch('1995-01-01'), 1704067200 = epoch('2024-01-01')
    ev = ev.select(
        "event_id",
        "user_id",
        F.timestamp_seconds(
            F.lit(788918400) + (F.col("ts").cast("long") - F.lit(1704067200)) * 80
        ).alias("ets"),
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("okey"))
    )
    out = asof_join(
        ev,
        orders.select(F.col("o_custkey").alias("user_id"), "o_orderdate", "okey"),
        on="user_id",
        left_ts="ets",
        right_ts="o_orderdate",
        right_cols=["okey", "o_orderdate"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("okey").alias("last_okey"),
        _ts("o_orderdate").alias("last_orderdate"),
    )


@q(
    "q49_range_join",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 150000.0), ('mid', 150000.0, 300000.0),
             ('high', 300000.0, 1000000000.0)
    )
    SELECT b.band, count(*) AS n, round(sum(o.o_totalprice), 4) AS total
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: broadcast interval table + band predicate."""
    from .operators.temporal import range_join

    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 150000.0), ("mid", 150000.0, 300000.0), ("high", 300000.0, 1e9)],
        "band string, lo double, hi double",
    )
    out = range_join(orders, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi")
    return out.groupBy("band").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 4).alias("total")
    )


@q(
    "q50_array_map_functions",
    """
    WITH arrs AS (
      SELECT l_orderkey,
             list_sort(list(l_linenumber::BIGINT)) AS lns,
             list_sort(list(DISTINCT l_returnflag)) AS flags
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(lns)::BIGINT AS n_lines,
           list_contains(lns, 1) AS has_first,
           lns[1] AS first_ln,
           array_to_string(lns, ',') AS lns_csv,
           array_to_string(flags, ',') AS flags_csv,
           len(flatten([lns, lns]))::BIGINT AS doubled_len
    FROM arrs
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function surface (size/sort/contains/element_at/flatten) —
    the §2.3 declared Spark-native set over collected arrays."""
    li = _t(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_linenumber").cast("bigint"))).alias("lns"),
        F.sort_array(F.collect_set("l_returnflag")).alias("flags"),
    )
    return arrs.select(
        "l_orderkey",
        F.size("lns").cast("bigint").alias("n_lines"),
        F.array_contains("lns", 1).alias("has_first"),
        F.try_element_at("lns", F.lit(1)).alias("first_ln"),
        F.array_join(F.transform("lns", lambda x: x.cast("string")), ",").alias("lns_csv"),
        F.array_join("flags", ",").alias("flags_csv"),
        F.size(F.flatten(F.array("lns", "lns"))).cast("bigint").alias("doubled_len"),
    )


@q(
    "q51_map_column_json",
    """
    SELECT event_id,
           upper(event_type) AS etype,
           json_extract(props, '$.k')::BIGINT * 2 AS k2
    FROM events
    """,
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_column: the JVM-side escape hatch (compile-time Column
    functions instead of Python UDFs) inside an engine pipeline."""
    from .transforms import map_column

    ev = _events(spark, sf_dir)
    result = (
        etl(ev, spark=spark)
        .map_to(
            "t",
            fields=[
                Field("event_id", get("event_id")),
                Field("etype", map_column(F.upper, get("event_type"))),
                Field(
                    "k2",
                    map_column(
                        lambda c: F.get_json_object(c, "$.k").cast("bigint") * 2,
                        get("props"),
                    ),
                ),
            ],
        )
        .run()
    )
    return result["t"]


@q(
    "q52_rollup",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
        )
    )


@q(
    "q53_map_functions",
    """
    WITH per AS (
      SELECT o_orderpriority, o_orderstatus, count(*) AS n
      FROM orders GROUP BY 1, 2
    ), m AS (
      SELECT o_orderpriority,
             map_from_entries(list_sort(list(struct_pack(k := o_orderstatus, v := n)))) AS status_counts
      FROM per GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           array_to_string(map_keys(status_counts), ',') AS statuses,
           coalesce(map_extract(status_counts, 'O')[1], 0) AS n_open,
           cardinality(status_counts)::INT AS n_statuses
    FROM m
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface (map_from_entries/map_keys/element_at) —
    the §2.3 declared map set."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderpriority", "o_orderstatus").agg(F.count("*").alias("n"))
    m = per.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("o_orderstatus").alias("k"), F.col("n").alias("v"))))
        ).alias("status_counts")
    )
    return m.select(
        "o_orderpriority",
        F.array_join(F.map_keys("status_counts"), ",").alias("statuses"),
        F.coalesce(F.try_element_at("status_counts", F.lit("O")), F.lit(0)).alias("n_open"),
        F.size("status_counts").cast("int").alias("n_statuses"),
    )


# ===========================================================================
# Scale-path operators promoted to oracle-checked queries (round 2)
# ===========================================================================


@q(
    "q54_ann_lsh_topk",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    hp AS (
      SELECT p, i,
             CASE WHEN strpos('02468ace',
                              substr(md5(p::VARCHAR || '|' || (i - 1)::VARCHAR), 1, 1)) > 0
                  THEN 1.0 ELSE -1.0 END AS h
      FROM (SELECT unnest(range(0, 8)) AS p) pl,
           (SELECT unnest(range(1, 65)) AS i) dims
    ),
    bits AS (
      SELECT e.vec_id, hp.p,
             CASE WHEN sum(e.v * hp.h) >= 0 THEN '1' ELSE '0' END AS bit
      FROM e JOIN hp USING (i)
      GROUP BY e.vec_id, hp.p
    ),
    buckets AS (
      SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
      FROM bits GROUP BY vec_id
    ),
    qb AS (SELECT vec_id AS query_id, bucket FROM buckets WHERE vec_id < 5),
    qprobe AS (
      SELECT query_id, bucket FROM qb
      UNION
      SELECT query_id,
             substr(bucket, 1, j - 1)
             || (CASE WHEN substr(bucket, j, 1) = '1' THEN '0' ELSE '1' END)
             || substr(bucket, j + 1, 8 - j) AS bucket
      FROM qb, (SELECT unnest(range(1, 9)) AS j) js
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cand AS (
      SELECT DISTINCT qp.query_id, cb.vec_id AS neighbor_id
      FROM qprobe qp JOIN buckets cb USING (bucket)
      WHERE cb.vec_id <> qp.query_id
    ),
    dots AS (
      SELECT c.query_id, c.neighbor_id, sum(eq.v * ec.v) AS dot
      FROM cand c
      JOIN e eq ON eq.vec_id = c.query_id
      JOIN e ec ON ec.vec_id = c.neighbor_id AND ec.i = eq.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN scale path (operators/similarity.py:lsh_bucket_topk):
    sign-random-projection buckets + Hamming-1 multi-probe, exact cosine
    only within probed buckets.  The oracle reproduces the md5-parity
    hyperplanes, bucketing, probing and ranking entirely in SQL."""
    from .operators.similarity import lsh_bucket_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_bucket_topk(
        emb, queries, "vec_id", "embedding",
        k=10, planes=8, dim=64, probes=2, round_cosine=6,
    )


@q(
    "q55_salted_agg",
    """
    SELECT l_returnflag AS rf, l_linestatus AS ls,
           round(sum(l_quantity), 4) AS sum_qty,
           count(*) AS n_rows,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price
    FROM lineitem GROUP BY 1, 2
    """,
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregation (plans/skew.py:salted_agg): the
    oracle is the plain one-stage groupBy — algebraic partial/merge must
    be exactly equivalent."""
    from .plans.skew import salted_agg

    li = _t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "n_rows": ("*", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        salt=16,
    )
    return out.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.round("sum_qty", 4).alias("sum_qty"),
        F.col("n_rows"),
        F.round("min_price", 4).alias("min_price"),
        F.round("max_price", 4).alias("max_price"),
    )


@q(
    "q56_jaccard_lsh_pruned",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      JOIN cand c ON c.id_a = a.doc_id AND c.id_b = b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(i::DOUBLE / (sa.sz + sb.sz - i), 6) AS jaccard
    FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH-pruned exact-Jaccard path (operators/dedup.py:jaccard_pairs
    with candidates=): only LSH candidate pairs pay the verification
    aggregation — the 100 TB composition of q28 + q29."""
    from .operators.dedup import jaccard_pairs, lsh_candidate_pairs

    docs = _docs_plus_clones(spark, sf_dir)
    cand = lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    out = jaccard_pairs(docs, "doc_id", "text", candidates=cand)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@q(
    "q57_extend_policy",
    """
    SELECT o_custkey AS ck,
           string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS okeys_csv,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExtendPolicy: list-valued field merges by concatenation in arrival
    order (reference instances.py:47-55)."""
    from pyspark.sql import types as T

    from .policies import AddPolicy as _Add, ExtendPolicy
    from .transforms import map_column

    orders = _t(spark, sf_dir, "orders").withColumn("__arr", F.col("o_orderkey"))
    result = (
        etl(orders, spark=spark, order_col="__arr")
        .map_to(
            "t",
            fields=[
                Field("ck", get("o_custkey")),
                Field(
                    "okeys",
                    map_column(
                        lambda k: F.array(k),
                        get("o_orderkey"),
                        dtype=T.ArrayType(T.LongType()),
                    ),
                    merge=ExtendPolicy(),
                ),
                Field("n_orders", literal(1), merge=_Add()),
            ],
            join_on=["ck"],
        )
        .run()
    )
    return result["t"].select(
        F.col("ck"),
        F.array_join(F.transform("okeys", lambda x: x.cast("string")), ",").alias(
            "okeys_csv"
        ),
        F.col("n_orders").cast("bigint").alias("n_orders"),
    )


@q(
    "q58_first_non_null_policy",
    """
    SELECT o_custkey AS ck,
           min_by(o_orderkey, o_orderkey)
             FILTER (WHERE o_totalprice > 150000) AS first_big,
           count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FirstNonNullPolicy: the first non-None value in arrival order wins
    (reference instances.py:83-85); later non-null writes do not
    overwrite."""
    from .policies import AddPolicy as _Add, FirstNonNullPolicy
    from .transforms import map_column

    orders = _t(spark, sf_dir, "orders").withColumn("__arr", F.col("o_orderkey"))
    result = (
        etl(orders, spark=spark, order_col="__arr")
        .map_to(
            "t",
            fields=[
                Field("ck", get("o_custkey")),
                Field(
                    "first_big",
                    map_column(
                        lambda p, k: F.when(p > 150000, k),
                        get("o_totalprice"),
                        get("o_orderkey"),
                    ),
                    merge=FirstNonNullPolicy(),
                ),
                Field("n_orders", literal(1), merge=_Add()),
            ],
            join_on=["ck"],
        )
        .run()
    )
    return result["t"].select(
        "ck", "first_big", F.col("n_orders").cast("bigint").alias("n_orders")
    )


@q(
    "q59_dedup_clusters",
    f"""
    WITH RECURSIVE all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster assignment: LSH candidate pairs -> connected
    components by distributed min-label propagation
    (operators/clusters.py:dedup_clusters); the oracle computes the same
    components with a recursive transitive closure."""
    from .operators.clusters import dedup_clusters
    from .operators.dedup import lsh_candidate_pairs

    docs = _docs_plus_clones(spark, sf_dir)
    cand = lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    return dedup_clusters(cand)


@q(
    "q60_stratified_sample",
    """
    SELECT rf, ls, okey, ln FROM (
      SELECT l_returnflag AS rf, l_linestatus AS ls,
             l_orderkey AS okey, l_linenumber::BIGINT AS ln,
             row_number() OVER (
               PARTITION BY l_returnflag, l_linestatus
               ORDER BY md5((l_orderkey * 10 + l_linenumber)::VARCHAR),
                        l_orderkey * 10 + l_linenumber
             ) AS rk
      FROM lineitem
    ) WHERE rk <= 20
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deterministic stratified sampling: 20 rows per
    (returnflag, linestatus) stratum ordered by md5 of a unique key —
    reproducible across engines, unlike approximate sampleBy."""
    from .operators.clusters import stratified_sample_exact

    li = _t(spark, sf_dir, "lineitem").withColumn(
        "__sk", F.col("l_orderkey") * 10 + F.col("l_linenumber")
    )
    out = stratified_sample_exact(
        li, ["l_returnflag", "l_linestatus"], 20, order_key="__sk"
    )
    return out.select(
        F.col("l_returnflag").alias("rf"),
        F.col("l_linestatus").alias("ls"),
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").cast("bigint").alias("ln"),
    )


@q(
    "q61_ann_ivf_topk",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cent_ids AS (
      SELECT vec_id AS cvid,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    ce AS (SELECT c.cell, e.i, e.v FROM cent_ids c JOIN e ON e.vec_id = c.cvid),
    cnorm AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce GROUP BY cell),
    vcdot AS (
      SELECT e.vec_id, ce.cell, sum(e.v * ce.v) AS dot
      FROM e JOIN ce ON ce.i = e.i
      GROUP BY 1, 2
    ),
    vc AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm cn ON cn.cell = d.cell
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc
      ) WHERE rk = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc WHERE vec_id < 5
      ) WHERE rk <= 3
    ),
    cand AS (
      SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
      FROM qprobe q JOIN assign a ON a.cell = q.cell
      WHERE a.vec_id <> q.query_id
    ),
    dots AS (
      SELECT c.query_id, c.neighbor_id, sum(eq.v * ec.v) AS dot
      FROM cand c
      JOIN e eq ON eq.vec_id = c.query_id
      JOIN e ec ON ec.vec_id = c.neighbor_id AND ec.i = eq.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF ANN scale path (operators/similarity.py:ivf_topk): corpus
    partitioned into 16 centroid cells (seed centroids = 16 smallest
    vec_ids), queries probe their 3 closest cells, exact cosine only
    within probed cells.  Cell assignment is a literal-embedded projection
    (one corpus scan, no shuffle); the oracle reproduces seeding,
    assignment, probing and ranking in SQL."""
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(
        emb, queries, "vec_id", "embedding",
        k=10, nlist=16, nprobe=3, round_cosine=6,
    )


@q(
    "q62_repetition_signals",
    f"""
    WITH base AS (SELECT doc_id, text, length(text) AS n_chars FROM documents),
    lns AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM base),
    lc AS (SELECT doc_id, ln, count(*) AS c FROM lns GROUP BY 1, 2),
    lagg AS (
      SELECT doc_id, sum(c) AS n_lines, sum(c - 1) AS dup_lines,
             sum((c - 1) * length(ln)) AS dup_line_chars,
             sum(c * length(ln)) AS line_chars
      FROM lc GROUP BY 1
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM base),
    g2 AS (
      SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN
               [array_to_string(t[i+1:i+2], ' ') for i in range(len(t) - 1)]
             ELSE []::VARCHAR[] END) AS g
      FROM toks
    ),
    g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
    tagg AS (SELECT doc_id, max(c * length(g)) AS top_chars FROM g2c GROUP BY 1),
    g3 AS (
      SELECT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
               [array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)]
             ELSE []::VARCHAR[] END) AS g
      FROM toks
    ),
    g3c AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
    dagg AS (
      SELECT doc_id, sum((c - 1) * length(g)) AS dup_gram_chars
      FROM g3c GROUP BY 1
    )
    SELECT b.doc_id,
      round(CASE WHEN n_lines > 0
            THEN dup_lines::DOUBLE / n_lines END, 6) AS dup_line_frac,
      round(CASE WHEN line_chars > 0
            THEN dup_line_chars::DOUBLE / line_chars END, 6) AS dup_line_char_frac,
      round(CASE WHEN n_chars > 0
            THEN coalesce(top_chars, 0)::DOUBLE / n_chars END, 6) AS top_ngram_char_frac,
      round(CASE WHEN n_chars > 0
            THEN coalesce(dup_gram_chars, 0)::DOUBLE / n_chars END, 6) AS dup_ngram_char_frac
    FROM base b
    LEFT JOIN lagg USING (doc_id)
    LEFT JOIN tagg USING (doc_id)
    LEFT JOIN dagg USING (doc_id)
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (operators/text.py:
    repetition_signals): duplicate-line fraction/char-fraction, most
    frequent 2-gram char coverage, duplicated 3-gram excess char
    fraction.  Two-level aggregation on well-spread (doc, line|gram)
    keys; the oracle reproduces the same histograms in SQL."""
    from .operators.text import repetition_signals

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(docs, "doc_id", "text", top_n=2, dup_n=3)


@q(
    "q63_decontamination",
    f"""
    WITH ev AS (SELECT text FROM documents WHERE doc_id % 50 = 0),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
    ctoks AS (SELECT doc_id, {_TOKS} AS t FROM corpus),
    cg AS (SELECT doc_id, unnest({_SHINGLES3}) AS g FROM ctoks),
    etoks AS (SELECT {_TOKS} AS t FROM ev),
    eg AS (SELECT DISTINCT unnest({_SHINGLES3}) AS g FROM etoks),
    per_doc AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY 1),
    hits AS (
      SELECT doc_id, count(*) AS n_hits
      FROM cg JOIN eg USING (g) GROUP BY 1
    )
    SELECT doc_id, n_hits, n_grams,
           round(n_hits::DOUBLE / n_grams, 6) AS contam_frac
    FROM hits JOIN per_doc USING (doc_id)
    """,
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.py): corpus docs
    sharing any word 3-gram with a held-out eval slice (doc_id % 50 = 0).
    Eval gram digests are broadcast; the corpus streams once with a
    map-side probe — no corpus shuffle.  Reference has no analog; this is
    the training-pipeline extension surface."""
    from .operators.decontam import ngram_contamination

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    return ngram_contamination(corpus, ev, "doc_id", "text", n=3)


@q(
    "q64_unigram_nll",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(t) AS tok
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents) s
    ),
    vocab AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
    tot AS (SELECT sum(c) AS total FROM vocab)
    SELECT doc_id, count(*) AS n_toks,
           round(avg(-ln(c::DOUBLE / total)), 6) AS nll
    FROM toks JOIN vocab USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram perplexity proxy (operators/text.py:
    unigram_nll): mean -ln p(token) per document under a corpus-fit
    unigram model.  Vocabulary shuffle carries one row per type."""
    from .operators.text import unigram_nll

    return unigram_nll(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id", "text"
    )


@q(
    "q65_tfidf_top_terms",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(t) AS term
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents) s
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             round(tf * ln((n_docs + 1)::DOUBLE / (df + 1)), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tfidf, rank FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (operators/text.py:
    tfidf_top_terms): per-(doc,term) counts, vocabulary-sized DF table
    joined back, per-doc window rank — no global sort."""
    from .operators.text import tfidf_top_terms

    return tfidf_top_terms(
        _t(spark, sf_dir, "documents").select("doc_id", "text"),
        "doc_id", "text", k=3,
    )


@q(
    "q66_sequence_packing",
    f"""
    WITH RECURSIVE sized AS (
      SELECT doc_id, doc_id % 8 AS bucket, len(t) AS n
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents) s
    ),
    ord AS (
      SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM sized
    ),
    packed AS (
      SELECT bucket, rn, doc_id, n, 0::BIGINT AS seq, n AS cum
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.doc_id, o.n,
             CASE WHEN p.cum + o.n <= 64 THEN p.seq ELSE p.seq + 1 END,
             CASE WHEN p.cum + o.n <= 64 THEN p.cum + o.n ELSE o.n END
      FROM packed p JOIN ord o ON o.bucket = p.bucket AND o.rn = p.rn + 1
    )
    SELECT bucket * 1000000000 + seq AS pack_id, bucket,
           count(*) AS n_docs, sum(n) AS n_tokens,
           list(doc_id ORDER BY doc_id) AS doc_ids
    FROM packed GROUP BY 1, 2
    """,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (operators/packing.py): documents into
    64-token training packs, first-fit in doc_id order within
    doc_id % 8 buckets.  The oracle replays the same greedy scan as a
    recursive CTE — the packing is deterministic and engine-independent
    by construction (bucket = id % k, not a hash partition)."""
    from .operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return pack_sequences(docs, "doc_id", "text", capacity=64, num_buckets=8)


@q(
    "q67_funnel",
    """
    WITH u1 AS (
      SELECT user_id, min(floor(epoch(ts))::BIGINT) AS t1
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    u2 AS (
      SELECT e.user_id, min(floor(epoch(e.ts))::BIGINT) AS t2
      FROM events e JOIN u1 USING (user_id)
      WHERE e.event_type = 'click' AND floor(epoch(e.ts))::BIGINT > u1.t1
      GROUP BY 1
    ),
    u3 AS (
      SELECT e.user_id, min(floor(epoch(e.ts))::BIGINT) AS t3
      FROM events e JOIN u2 USING (user_id)
      WHERE e.event_type = 'purchase' AND floor(epoch(e.ts))::BIGINT > u2.t2
      GROUP BY 1
    )
    SELECT 1 AS step_idx, 'view' AS step, (SELECT count(*) FROM u1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT count(*) FROM u2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT count(*) FROM u3)
    """,
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase (operators/events.py:
    funnel_counts): one groupBy(user) carrying per-step timestamp
    arrays, then pure array expressions for the step chain."""
    from .operators.events import funnel_counts

    ev = _events(spark, sf_dir)
    return funnel_counts(ev, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"])


@q(
    "q68_cohort_retention",
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS week FROM events
    ),
    cohort AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1)
    SELECT cohort_week, ((week - cohort_week) // 7)::INT AS week_offset,
           count(*) AS n_users
    FROM act JOIN cohort USING (user_id)
    GROUP BY 1, 2
    """,
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (operators/events.py: cohort_retention):
    distinct (user, week) activity, per-user first week, offset rollup."""
    from .operators.events import cohort_retention

    return cohort_retention(_events(spark, sf_dir), "user_id", "ts")


@q(
    "q69_kmv_distinct",
    """
    WITH d AS (
      SELECT DISTINCT event_type, user_id FROM events WHERE user_id IS NOT NULL
    ),
    h AS (
      SELECT event_type,
             CAST('0x' || substr(md5(user_id::VARCHAR), 1, 13) AS UBIGINT)::DOUBLE
               / 4503599627370496.0 AS h
      FROM d
    ),
    r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM h
    )
    SELECT event_type,
           round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                 ELSE 63.0 / max(h) END, 4) AS est_distinct
    FROM r WHERE rk <= 64 GROUP BY 1
    """,
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (operators/sketches.py): md5-based
    k-minimum-values estimate of distinct users per event type —
    deterministic and reproducible in any engine with md5, unlike
    HyperLogLog register state."""
    from .operators.sketches import kmv_distinct

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    return kmv_distinct(ev, ["event_type"], "user_id", k=64)


@q(
    "q70_order_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_disc(o_totalprice, 0.5), 4) AS p50,
           round(quantile_disc(o_totalprice, 0.9), 4) AS p90,
           round(quantile_disc(o_totalprice, 0.99), 4) AS p99,
           count(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles of order totals per priority.
    percentile_disc picks actual data values (4-decimal exact money), so
    cross-engine float ties can't arise; one shuffle, partial-agg via
    Spark's exact percentile buffer."""
    _prep(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_totalprice"
    )
    o.createOrReplaceTempView("__q70_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
               round(percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
               round(percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p99,
               count(*) AS n_orders
        FROM __q70_orders GROUP BY o_orderpriority
        """
    )


@q(
    "q71_cms_heavy_hitters",
    """
    WITH toks AS (
      SELECT unnest(t) AS item
      FROM (SELECT {toks} AS t FROM documents) s
    ),
    cells AS (
      SELECT j, CAST('0x' || substr(md5(j::VARCHAR || '|' || item), 1, 8) AS UBIGINT)
                  % 256 AS b
      FROM toks, (SELECT unnest(range(0, 4)) AS j) r
    ),
    sketch AS (SELECT j, b, count(*) AS cnt FROM cells GROUP BY 1, 2),
    items AS (SELECT DISTINCT item FROM toks),
    icells AS (
      SELECT item, j,
             CAST('0x' || substr(md5(j::VARCHAR || '|' || item), 1, 8) AS UBIGINT)
               % 256 AS b
      FROM items, (SELECT unnest(range(0, 4)) AS j) r
    ),
    est AS (
      SELECT item, min(cnt) AS est_count
      FROM icells JOIN sketch USING (j, b) GROUP BY 1
    )
    SELECT item, est_count FROM est
    ORDER BY est_count DESC, item ASC LIMIT 10
    """.format(toks=_TOKS),
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch heavy hitters (operators/sketches.py:
    cms_heavy_hitters): top-10 document tokens by md5-bucketed CMS
    estimate — the sketch is depth*width rows regardless of corpus
    size; final top-k via distributed TakeOrdered."""
    from .operators.dedup import tokens_col
    from .operators.sketches import cms_heavy_hitters

    docs = _t(spark, sf_dir, "documents").select(
        F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    return cms_heavy_hitters(docs, "tok", depth=4, width=256, k=10)


@q(
    "q72_neardup_by_source",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    pairs AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    )
    SELECT least(da.source, db.source) AS source_a,
           greatest(da.source, db.source) AS source_b,
           count(*) AS n_pairs
    FROM pairs
    JOIN documents da ON pairs.id_a = da.doc_id
    JOIN documents db ON pairs.id_b = db.doc_id
    GROUP BY 1, 2
    """,
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplication rate across sources: LSH candidate pairs
    (operators/dedup.py) joined back to the source dimension on both
    ends, rolled up per unordered source pair.  Demonstrates operator
    composition — the pair frame is the same plan as q28, the dimension
    joins are id-equi joins AQE broadcasts at small scale."""
    from .operators.dedup import lsh_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        docs.select("doc_id", "text"), "doc_id", "text", num_hashes=8, bands=4
    )
    src = docs.select("doc_id", "source")
    return (
        pairs.join(src.withColumnRenamed("source", "__sa"),
                   pairs["id_a"] == src["doc_id"])
        .drop("doc_id")
        .join(src.withColumnRenamed("source", "__sb").alias("s2"),
              F.col("id_b") == F.col("s2.doc_id"))
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@q(
    "q73_kmeans_step",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cent_ids AS (
      SELECT vec_id AS cvid,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    ce AS (SELECT c.cell, e.i, e.v FROM cent_ids c JOIN e ON e.vec_id = c.cvid),
    cnorm AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce GROUP BY cell),
    vcdot AS (
      SELECT e.vec_id, ce.cell, sum(e.v * ce.v) AS dot
      FROM e JOIN ce ON ce.i = e.i
      GROUP BY 1, 2
    ),
    vc AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm cn ON cn.cell = d.cell
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc
      ) WHERE rk = 1
    ),
    upd AS (
      SELECT a.cell, e.i, round(avg(e.v), 6) AS m
      FROM assign a JOIN e USING (vec_id) GROUP BY 1, 2
    ),
    cent2 AS (SELECT cell, list(m ORDER BY i) AS centroid FROM upd GROUP BY cell),
    mem AS (SELECT cell, count(*) AS n_members FROM assign GROUP BY cell)
    SELECT cell, n_members, centroid FROM cent2 JOIN mem USING (cell)
    """,
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of cosine k-means (operators/similarity.py:
    kmeans_iteration) — trains the IVF codebook q61 searches with.
    Assignment is a literal-centroid projection (no shuffle); the update
    shuffle carries nlist*D (cell, dim) partial averages."""
    from .operators.similarity import kmeans_iteration

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return kmeans_iteration(emb, "vec_id", "embedding", nlist=16)


@q(
    "q74_neardup_survivors",
    f"""
    WITH RECURSIVE all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    clusters AS (SELECT s AS id, least(s, min(d)) AS cluster_id
                 FROM reach GROUP BY s)
    SELECT a.doc_id FROM all_docs a
    LEFT JOIN clusters c ON a.doc_id = c.id
    WHERE c.id IS NULL OR c.cluster_id = a.doc_id
    """,
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applying near-dedup: the documents that SURVIVE — cluster
    canonicals (minimum id per duplicate component) plus everything that
    never paired.  LSH pairs -> distributed connected components -> one
    left join deciding keep/drop; the corpus is never shuffled on
    content, only on ids."""
    from .operators.clusters import dedup_clusters
    from .operators.dedup import lsh_candidate_pairs

    docs = _docs_plus_clones(spark, sf_dir)
    cand = lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    clusters = dedup_clusters(cand)
    return (
        docs.join(clusters, docs["doc_id"] == clusters["id"], "left")
        .filter(
            F.col("id").isNull() | (F.col("cluster_id") == F.col("doc_id"))
        )
        .select(docs["doc_id"])
    )


@q(
    "q75_quality_filter",
    f"""
    WITH base AS (SELECT doc_id, text, length(text) AS n_chars FROM documents),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM base),
    nt AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
    g2 AS (
      SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN
               [array_to_string(t[i+1:i+2], ' ') for i in range(len(t) - 1)]
             ELSE []::VARCHAR[] END) AS g
      FROM toks
    ),
    g2c AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
    tagg AS (SELECT doc_id, max(c * length(g)) AS top_chars FROM g2c GROUP BY 1),
    rep AS (
      SELECT b.doc_id,
             round(CASE WHEN n_chars > 0
                   THEN coalesce(top_chars, 0)::DOUBLE / n_chars END, 6) AS frac
      FROM base b LEFT JOIN tagg USING (doc_id)
    ),
    tk AS (
      SELECT doc_id, unnest(t) AS tok FROM toks
    ),
    vocab AS (SELECT tok, count(*) AS c FROM tk GROUP BY 1),
    tot AS (SELECT sum(c) AS total FROM vocab),
    nll AS (
      SELECT doc_id, round(avg(-ln(c::DOUBLE / total)), 6) AS v
      FROM tk JOIN vocab USING (tok) CROSS JOIN tot GROUP BY 1
    ),
    verdict AS (
      SELECT nt.doc_id,
             CASE WHEN nt.n_tokens < 20 THEN 'too_short'
                  WHEN rep.frac > 0.12 THEN 'repetitive'
                  WHEN nll.v > 3.5 THEN 'high_nll'
                  ELSE 'ok' END AS reason
      FROM nt LEFT JOIN rep USING (doc_id) LEFT JOIN nll USING (doc_id)
    )
    SELECT doc_id, reason = 'ok' AS keep, reason FROM verdict
    """,
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite pretraining quality filter (operators/text.py:
    quality_filter_verdict): length + repetition + unigram-NLL gates
    with first-failure precedence; all comparisons on rounded feature
    values for engine parity."""
    from .operators.text import quality_filter_verdict

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_filter_verdict(docs, "doc_id", "text")


@q(
    "q76_scd2_intervals",
    """
    WITH e AS (
      SELECT user_id, date_trunc('second', ts) AS tss, event_type AS v
      FROM events
    ),
    r AS (
      SELECT user_id, tss, v,
             lag(v) OVER (PARTITION BY user_id ORDER BY tss, v) AS prev
      FROM e
    ),
    c AS (
      SELECT user_id, tss, v,
             sum(CASE WHEN prev IS NULL OR v <> prev THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tss, v) AS ver
      FROM r
    ),
    runs AS (SELECT user_id, ver, v, min(tss) AS valid_from
             FROM c GROUP BY 1, 2, 3)
    SELECT user_id, ver AS version, v AS value, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, v) AS valid_to
    FROM runs
    """,
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (operators/events.py: scd2_intervals):
    event stream -> per-user validity intervals of the event_type value,
    lag-compare run collapse in one keyed window.  Timestamps truncated
    to seconds for engine-independent boundaries."""
    from .operators.events import scd2_intervals

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    return scd2_intervals(ev, "user_id", "ts", "event_type")


# ===========================================================================
# Round-2 batch: sessionization, PII, chunking, splits, search, rolling aggs
# ===========================================================================


@q(
    "q77_sessionize",
    """
    WITH e AS (
      SELECT user_id, date_trunc('second', ts) AS tss, event_id FROM events
    ),
    l AS (
      SELECT user_id, tss, event_id,
             CASE WHEN lag(tss) OVER w IS NULL
                    OR epoch(tss)::BIGINT - epoch(lag(tss) OVER w)::BIGINT > 28800
                  THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)
    ),
    s AS (
      SELECT user_id, tss,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY tss, event_id) AS sid
      FROM l
    )
    SELECT user_id, sid::BIGINT AS session_id,
           strftime(min(tss), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(tss), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*)::BIGINT AS n_events,
           (epoch(max(tss))::BIGINT - epoch(min(tss))::BIGINT) AS duration_s
    FROM s GROUP BY user_id, sid
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/events.py: sessionize):
    8-hour inactivity gap, event_id tie-break; one shuffle on user_id
    (both windows and the rollup share the partitioning)."""
    from .operators.events import sessionize

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    out = sessionize(ev, "user_id", "ts", gap_seconds=28800, tiebreak_col="event_id")
    return out.select(
        "user_id",
        "session_id",
        _ts(F.col("session_start")).alias("session_start"),
        _ts(F.col("session_end")).alias("session_end"),
        "n_events",
        "duration_s",
    )


@q(
    "q78_pii_redact",
    """
    WITH enriched AS (
      SELECT doc_id,
             text || ' u' || doc_id::VARCHAR || '@ex' || (doc_id % 7)::VARCHAR
                  || '.com ip 10.' || (doc_id % 256)::VARCHAR || '.0.'
                  || (doc_id % 100)::VARCHAR
                  || CASE WHEN doc_id % 3 = 0
                          THEN ' tel +1555' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                          ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '[a-z0-9._%+\\-]+@[a-z0-9.\\-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
             '\\+\\d[\\d\\-]{6,14}\\d', '<PHONE>', 'g') AS redacted,
           len(regexp_extract_all(t, '[a-z0-9._%+\\-]+@[a-z0-9.\\-]+\\.[a-z]{2,}'))::BIGINT AS n_email,
           len(regexp_extract_all(
               regexp_replace(t, '[a-z0-9._%+\\-]+@[a-z0-9.\\-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'))::BIGINT AS n_ip,
           len(regexp_extract_all(
               regexp_replace(
                 regexp_replace(t, '[a-z0-9._%+\\-]+@[a-z0-9.\\-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
               '\\+\\d[\\d\\-]{6,14}\\d'))::BIGINT AS n_phone
    FROM enriched
    """,
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/text.py: pii_redact) over documents
    enriched with synthetic emails/IPs/phones (the raw synthetic text
    contains none) — exercises ordered regexp_replace + per-type counts
    in one scan pass."""
    from .operators.text import pii_redact

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" u"), did, F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".com ip 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."), (F.col("doc_id") % 100).cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" tel +1555"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_redact(enriched, "doc_id", "text")


@q(
    "q79_chunk_tokens",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    n AS (SELECT doc_id, t, len(t) AS n FROM toks),
    c AS (SELECT doc_id, t, n,
             CASE WHEN n = 0 THEN 0
                  WHEN n <= 16 THEN 1
                  ELSE (n - 16 + 12 - 1) // 12 + 1 END AS nc
          FROM n),
    s AS (SELECT doc_id, t, unnest(range(0, nc)) AS ci FROM c WHERE nc > 0)
    SELECT doc_id, ci::BIGINT AS chunk_idx, (ci * 12)::BIGINT AS start_token,
           len(t[ci*12 + 1 : ci*12 + 16])::BIGINT AS n_tokens,
           array_to_string(t[ci*12 + 1 : ci*12 + 16], ' ') AS chunk_text
    FROM s
    """,
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (operators/text.py:
    chunk_tokens): 16-token chunks, stride 12 — shuffle-free fan-out via
    sequence + posexplode + slice."""
    from .operators.text import chunk_tokens

    docs = _t(spark, sf_dir, "documents")
    return chunk_tokens(docs, "doc_id", "text", chunk_size=16, stride=12)


@q(
    "q80_hash_split",
    """
    SELECT doc_id,
           CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS UBIGINT)::BIGINT % 100 AS bucket,
           CASE WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS UBIGINT)::BIGINT % 100 < 80 THEN 'train'
                WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS UBIGINT)::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split (operators/clusters.py:
    hash_split): md5-bucket assignment, stable across engines/reruns,
    shuffle-free."""
    from .operators.clusters import hash_split

    return hash_split(_t(spark, sf_dir, "documents"), "doc_id")


@q(
    "q81_inverted_index",
    f"""
    WITH pairs AS (
      SELECT term, doc_id, count(*)::BIGINT AS tf
      FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
      GROUP BY term, doc_id
    )
    SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS tf_total,
           array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
    FROM pairs GROUP BY term HAVING count(*) >= 2
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index dictionary build (operators/search.py:
    inverted_index): term postings with df/tf totals and a bounded
    posting sample — explode + two keyed aggregations."""
    from .operators.search import inverted_index

    docs = _t(spark, sf_dir, "documents")
    return inverted_index(docs, "doc_id", "text", min_df=2, posting_sample=10)


@q(
    "q82_bm25_topk",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    l AS (SELECT doc_id, len(t)::DOUBLE AS dl, t FROM base),
    corpus AS (SELECT count(*)::DOUBLE AS N, avg(dl) AS avgdl FROM l),
    p0 AS (SELECT doc_id, dl, unnest(t) AS term FROM l),
    pairs AS (
      SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
      FROM p0 WHERE term IN ('spark', 'join', 'window')
      GROUP BY doc_id, dl, term
    ),
    dfreq AS (SELECT term, count(*)::DOUBLE AS dfc FROM pairs GROUP BY term),
    scored AS (
      SELECT pairs.doc_id,
             round(sum(
               ln(1 + (N - dfc + 0.5) / (dfc + 0.5))
               * tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
             ), 6) AS score
      FROM pairs JOIN dfreq ON pairs.term = dfreq.term, corpus
      GROUP BY pairs.doc_id
    )
    SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (operators/search.py: bm25_topk) for the
    query {{spark, join, window}}: doc length rides the explode (no
    corpus-sized join), tiny df/corpus frames broadcast, rank on the
    rounded score with doc-id tie-break."""
    from .operators.search import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", ["spark", "join", "window"], k=20)


@q(
    "q83_token_entropy",
    f"""
    WITH p AS (
      SELECT doc_id, term, count(*)::DOUBLE AS c
      FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM documents)
      GROUP BY doc_id, term
    )
    SELECT doc_id, sum(c)::BIGINT AS n_tokens,
           round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
    FROM p GROUP BY doc_id
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per document (operators/text.py:
    token_entropy) — repetition/quality signal, two doc-keyed
    aggregations sharing one partitioning."""
    from .operators.text import token_entropy

    return token_entropy(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "q84_rolling_range_agg",
    """
    WITH e AS (
      SELECT user_id, date_trunc('second', ts) AS tss, value FROM events
    )
    SELECT user_id,
           strftime(tss, '%Y-%m-%d %H:%M:%S') AS ts,
           round(value, 4) AS value,
           (count(*) OVER w)::BIGINT AS trailing_n,
           round(sum(value) OVER w, 4) AS trailing_sum
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(tss)::BIGINT
                 RANGE BETWEEN 28800 PRECEDING AND CURRENT ROW)
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 8h RANGE-frame rolling count/sum per user
    (operators/events.py: rolling_window_agg) — a true time-range
    window, one shuffle on the user key, ANSI peer semantics."""
    from .operators.events import rolling_window_agg

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    out = rolling_window_agg(
        ev, "user_id", "ts", "value", window_seconds=28800
    )
    return out.select(
        "user_id",
        _ts(F.col("ts")).alias("ts"),
        F.round(F.col("value"), 4).alias("value"),
        "trailing_n",
        "trailing_sum",
    )


@q(
    "q85_value_histogram",
    """
    SELECT least(greatest(floor(value / 10), 0), 39)::BIGINT AS bin,
           count(*)::BIGINT AS n_events,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value,
           round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of events.value (40 bins of width 10,
    clamped): the profiling pass a pipeline runs before choosing
    filters — single map-side-combinable aggregation."""
    ev = _events(spark, sf_dir)
    b = F.least(
        F.greatest(F.floor(F.col("value") / 10), F.lit(0)), F.lit(39)
    ).cast("bigint")
    return ev.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


@q(
    "q86_cdc_merge",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status, o_totalprice AS amt
      FROM orders
    ),
    ch AS (
      SELECT o_orderkey AS k, 1 AS seq, 'U' AS op, 'X' AS status,
             o_totalprice * 1.1 AS amt FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 2, 'U', 'Y', o_totalprice * 1.2
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, 1, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 10 = 1
      UNION ALL
      SELECT -o_orderkey, 1, 'I', 'N', 100.0
      FROM orders WHERE o_orderkey % 10 = 3
    ),
    latest AS (
      SELECT k, op, status, amt FROM (
        SELECT k, op, status, amt,
               row_number() OVER (
                 PARTITION BY k
                 ORDER BY seq DESC, (op = 'D')::INT DESC, op DESC
               ) AS rn
        FROM ch
      ) WHERE rn = 1
    )
    SELECT COALESCE(b.k, c.k) AS k,
           CASE WHEN c.op IS NOT NULL THEN c.status ELSE b.status END AS status,
           round(CASE WHEN c.op IS NOT NULL THEN c.amt ELSE b.amt END, 4) AS amt
    FROM base b FULL OUTER JOIN latest c ON b.k = c.k
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC / MERGE application (operators/cdc.py: apply_cdc):
    synthesized change log (double-update, delete, out-of-base insert)
    applied onto orders with LWW-by-seq, delete-wins-on-tie.  max_by
    folds histories in one partial-agg shuffle; one full-outer join
    resolves upsert/delete/keep."""
    from .operators.cdc import apply_cdc

    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("amt"),
    )
    k = F.col("o_orderkey")
    upd1 = o.filter(k % 10 == 0).select(
        k.alias("k"), F.lit(1).alias("seq"), F.lit("U").alias("op"),
        F.lit("X").alias("status"), (F.col("o_totalprice") * 1.1).alias("amt"),
    )
    upd2 = o.filter(k % 10 == 0).select(
        k.alias("k"), F.lit(2).alias("seq"), F.lit("U").alias("op"),
        F.lit("Y").alias("status"), (F.col("o_totalprice") * 1.2).alias("amt"),
    )
    dels = o.filter(k % 10 == 1).select(
        k.alias("k"), F.lit(1).alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("double").alias("amt"),
    )
    ins = o.filter(k % 10 == 3).select(
        (-k).alias("k"), F.lit(1).alias("seq"), F.lit("I").alias("op"),
        F.lit("N").alias("status"), F.lit(100.0).alias("amt"),
    )
    changes = upd1.unionByName(upd2).unionByName(dels).unionByName(ins)
    out = apply_cdc(base, changes, ["k"], "seq", "op", ["status", "amt"])
    return out.select("k", "status", F.round("amt", 4).alias("amt"))


@q(
    "q87_weighted_sample",
    """
    WITH s AS (
      SELECT lang, doc_id,
             ln(CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 13) AS UBIGINT)::DOUBLE
                / 4503599627370496.0) / n_chars::DOUBLE AS k
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT lang, doc_id, rn::BIGINT AS rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS rn
      FROM s
    ) WHERE rn <= 5
    """,
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (operators/clusters.py:
    weighted_sample): Efraimidis-Spirakis ln(u)/w keys with md5-derived
    uniforms — 5 docs per language, inclusion odds proportional to
    n_chars, reproducible across engines."""
    from .operators.clusters import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(
        docs, "doc_id", "n_chars", n=5, stratify_col="lang"
    )


@q(
    "q88_ema",
    """
    WITH RECURSIVE e AS (
      SELECT user_id, event_id, date_trunc('second', ts) AS tss, value,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY date_trunc('second', ts), event_id
             ) AS i
      FROM events
    ),
    r AS (
      SELECT user_id, event_id, tss, value, i, value AS ema
      FROM e WHERE i = 1
      UNION ALL
      SELECT e.user_id, e.event_id, e.tss, e.value, e.i,
             (1 - 0.2) * r.ema + 0.2 * e.value
      FROM e JOIN r ON e.user_id = r.user_id AND e.i = r.i + 1
    )
    SELECT user_id, strftime(tss, '%Y-%m-%d %H:%M:%S') AS ts,
           round(value, 4) AS value, round(ema, 6) AS ema
    FROM r
    """,
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EMA of the event value stream (operators/events.py:
    ema): the sequential recurrence no built-in window expresses —
    applyInPandas fold with exact IEEE evaluation order; the DuckDB
    oracle replays the identical recurrence as a RECURSIVE CTE and
    matches bit-for-bit before rounding."""
    from .operators.events import ema

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    out = ema(ev, "user_id", "ts", "value", alpha=0.2, tiebreak_col="event_id")
    return out.select(
        "user_id",
        _ts(F.col("ts")).alias("ts"),
        F.round("value", 4).alias("value"),
        "ema",
    )


@q(
    "q89_pagerank",
    """
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    edges AS (
      SELECT 'c' || c::VARCHAR AS src, 's' || s::VARCHAR AS dst FROM pairs
      UNION ALL
      SELECT 's' || s::VARCHAR, 'c' || c::VARCHAR FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
    pr0 AS (SELECT node, 1.0 AS pr FROM nodes),
    it1 AS (
      SELECT e.dst AS node, sum(p.pr / d.deg) AS inc
      FROM edges e JOIN pr0 p ON e.src = p.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    pr1 AS (
      SELECT n.node, (1 - 0.85) + 0.85 * COALESCE(i.inc, 0.0) AS pr
      FROM nodes n LEFT JOIN it1 i ON n.node = i.node
    ),
    it2 AS (
      SELECT e.dst AS node, sum(p.pr / d.deg) AS inc
      FROM edges e JOIN pr1 p ON e.src = p.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    pr2 AS (
      SELECT n.node, (1 - 0.85) + 0.85 * COALESCE(i.inc, 0.0) AS pr
      FROM nodes n LEFT JOIN it2 i ON n.node = i.node
    )
    SELECT node, round(pr, 6) AS rank FROM pr2
    """,
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-iteration PageRank (operators/graph.py: pagerank) on the
    undirected customer-supplier trade graph (distinct pairs from
    orders x lineitem, both edge directions) — per-iteration join+agg
    on spread keys, mean-1 normalized ranks."""
    from .operators.graph import pagerank

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    return pagerank(edges, "src", "dst", iterations=2, damping=0.85)


@q(
    "q90_minhash_jaccard_estimate",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(((a.h0 = b.h0)::INT + (a.h1 = b.h1)::INT + (a.h2 = b.h2)::INT
                + (a.h3 = b.h3)::INT + (a.h4 = b.h4)::INT + (a.h5 = b.h5)::INT
                + (a.h6 = b.h6)::INT + (a.h7 = b.h7)::INT) / 8.0, 6) AS est_jaccard
    FROM cand c
    JOIN mins a ON c.id_a = a.doc_id
    JOIN mins b ON c.id_b = b.doc_id
    """,
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-only Jaccard estimation for LSH candidates
    (operators/dedup.py: minhash_jaccard_estimate) — the scale
    replacement for exact shingle-join verification: scores from
    signature agreement, never re-reading document text."""
    from .operators.dedup import minhash_jaccard_estimate

    return minhash_jaccard_estimate(
        _docs_plus_clones(spark, sf_dir), "doc_id", "text",
        num_hashes=8, bands=4,
    )


@q(
    "q91_bigram_nll",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
      FROM toks WHERE len(t) >= 2
    ),
    vocab AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
    ctx AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c2) AS c1
      FROM vocab GROUP BY 1
    )
    SELECT g.doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(-ln(v.c2::DOUBLE / x.c1)), 6) AS nll
    FROM grams g
    JOIN vocab v ON g.bg = v.bg
    JOIN ctx x ON string_split(g.bg, ' ')[1] = x.w1
    GROUP BY g.doc_id
    """,
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM corpus-fit quality score (operators/text.py:
    bigram_nll): mean -ln P(w2|w1) per document; context totals folded
    from the bigram vocabulary, no second corpus pass."""
    from .operators.text import bigram_nll

    return bigram_nll(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "q92_bpe_pretokenize",
    """
    SELECT doc_id,
           len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+'))::BIGINT
             AS n_pretokens,
           len(list_distinct(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s]+')))::BIGINT
             AS n_distinct_pretokens
    FROM documents
    """,
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE pre-tokenizer span statistics (operators/text.py:
    bpe_pretokenize_stats): portable GPT-2-style span split, one
    regexp_extract_all per row, shuffle-free."""
    from .operators.text import bpe_pretokenize_stats

    return bpe_pretokenize_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


@q(
    "q93_zscore_normalize",
    """
    WITH ex AS (
      SELECT vec_id, unnest(range(0, len(embedding))) AS dim,
             unnest(embedding)::DOUBLE AS v
      FROM embeddings
    ),
    stats AS (
      SELECT dim, avg(v) AS m, avg(v * v) AS sq FROM ex GROUP BY dim
    )
    SELECT ex.vec_id, ex.dim::BIGINT AS dim, round(ex.v, 6) AS value,
           round(CASE WHEN sqrt(greatest(sq - m * m, 0)) > 0
                      THEN (ex.v - m) / sqrt(greatest(sq - m * m, 0))
                      ELSE 0.0 END, 6) AS zscore
    FROM ex JOIN stats ON ex.dim = stats.dim
    """,
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score normalization of embeddings
    (operators/similarity.py: zscore_normalize): population mean/std
    from one tiny dim-keyed aggregation, broadcast back — corpus read
    once, long-format output."""
    from .operators.similarity import zscore_normalize

    return zscore_normalize(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")


@q(
    "q94_profile_orders",
    """
    SELECT 'o_orderkey' AS column, 'bigint' AS dtype, count(*)::BIGINT AS n_rows,
           (count(*) - count(o_orderkey))::BIGINT AS n_null,
           count(DISTINCT o_orderkey)::BIGINT AS n_distinct,
           round(min(o_orderkey)::DOUBLE, 4) AS min_num,
           round(max(o_orderkey)::DOUBLE, 4) AS max_num,
           NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_custkey', 'bigint', count(*)::BIGINT,
           (count(*) - count(o_custkey))::BIGINT, count(DISTINCT o_custkey)::BIGINT,
           round(min(o_custkey)::DOUBLE, 4), round(max(o_custkey)::DOUBLE, 4),
           NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', 'string', count(*)::BIGINT,
           (count(*) - count(o_orderstatus))::BIGINT,
           count(DISTINCT o_orderstatus)::BIGINT,
           NULL, NULL, min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', 'double', count(*)::BIGINT,
           (count(*) - count(o_totalprice))::BIGINT,
           count(DISTINCT o_totalprice)::BIGINT,
           round(min(o_totalprice), 4), round(max(o_totalprice), 4), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', 'timestamp_ntz', count(*)::BIGINT,
           (count(*) - count(o_orderdate))::BIGINT,
           count(DISTINCT o_orderdate)::BIGINT,
           round(epoch(min(o_orderdate))::DOUBLE, 4),
           round(epoch(max(o_orderdate))::DOUBLE, 4), NULL, NULL
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', 'string', count(*)::BIGINT,
           (count(*) - count(o_orderpriority))::BIGINT,
           count(DISTINCT o_orderpriority)::BIGINT,
           NULL, NULL, min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiling (operators/profile.py:
    profile_table) of the orders snapshot: per-column nulls, exact
    distincts, typed min/max — the schema-drift gate before
    processing."""
    from .operators.profile import profile_table

    return profile_table(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Web-corpus curation (operators/web.py)

_HTML_SYNTH_SQL = (
    "'<html><head><style>p{color:red}</style></head><body><h1>Doc &amp; ' || lang"
    " || '</h1><p>' || text || '</p>"
    "<script type=\"text/javascript\">var x = 1 < 2;</script></body></html>'"
)


def _html_synth_col():
    """Deterministic HTML wrapper around each document (same construction
    as the oracle's _HTML_SYNTH_SQL) — script/style blocks, entities, and
    tags around the real text."""
    return F.concat(
        F.lit("<html><head><style>p{color:red}</style></head><body><h1>Doc &amp; "),
        F.col("lang"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit('</p><script type="text/javascript">var x = 1 < 2;</script>'
              "</body></html>"),
    )


@q(
    "q95_html_to_text",
    r"""
    WITH h AS (
      SELECT doc_id, """ + _HTML_SYNTH_SQL + r""" AS html FROM documents
    ),
    s1 AS (
      SELECT doc_id, regexp_replace(
        html, '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t
      FROM h
    ),
    s2 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM s1),
    s3 AS (
      SELECT doc_id,
             replace(replace(replace(replace(replace(replace(
               t, '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
               '&quot;', '"'), '&#39;', '''') AS t
      FROM s2
    )
    SELECT doc_id, trim(regexp_replace(t, '\s+', ' ', 'g')) AS text FROM s3
    """,
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-to-text extraction (operators/web.py: html_to_text): strip
    script/style blocks and tags, decode common entities, collapse
    whitespace — one codegen'd regexp chain per row, shuffle-free.  Input
    is the documents table wrapped in a deterministic HTML shell so the
    oracle can rebuild byte-identical input."""
    from .operators.web import html_to_text

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _html_synth_col().alias("html")
    )
    return html_to_text(docs, "doc_id", "html")


@q(
    "q96_charset_profile",
    r"""
    WITH s AS (
      SELECT doc_id,
             text || ' ' ||
             (['привет','中文テキスト','مرحبا','plain'])[(doc_id % 4) + 1] AS t
      FROM documents
    ),
    c AS (
      SELECT doc_id, length(t) AS n,
        length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS c_latin,
        length(regexp_replace(t, '[^0-9]', '', 'g')) AS c_digit,
        length(regexp_replace(t, '[^\x{0400}-\x{04FF}]', '', 'g')) AS c_cyr,
        length(regexp_replace(t, '[^\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g'))
          AS c_cjk,
        length(regexp_replace(t, '[^\x{0600}-\x{06FF}]', '', 'g')) AS c_ar,
        length(regexp_replace(t, '[^\s]', '', 'g')) AS c_sp
      FROM s
    )
    SELECT doc_id, n::BIGINT AS n_chars,
      round(c_latin::DOUBLE / n, 6) AS latin_frac,
      round(c_digit::DOUBLE / n, 6) AS digit_frac,
      round(c_cyr::DOUBLE / n, 6) AS cyrillic_frac,
      round(c_cjk::DOUBLE / n, 6) AS cjk_frac,
      round(c_ar::DOUBLE / n, 6) AS arabic_frac,
      round(c_sp::DOUBLE / n, 6) AS space_frac,
      round((n - c_latin - c_digit - c_cyr - c_cjk - c_ar - c_sp)::DOUBLE / n, 6)
        AS other_frac
    FROM c
    """,
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-set / script profiling (operators/web.py:
    charset_profile): per-document fractions of Latin, digit, Cyrillic,
    CJK, Arabic, whitespace, other — the mojibake/garbage gate.  Input is
    salted with deterministic non-ASCII suffixes so every class exercises
    real code points."""
    from .operators.web import charset_profile

    salts = ["привет", "中文テキスト", "مرحبا", "plain"]
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" "),
            F.element_at(
                F.array(*[F.lit(s) for s in salts]),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
        ).alias("t"),
    )
    return charset_profile(docs, "doc_id", "t")


_URL_SYNTH_SQL = (
    "(CASE doc_id % 3 WHEN 0 THEN 'https' WHEN 1 THEN 'http' ELSE 'ftp' END)"
    " || '://www.' || source || '-site.org/docs/' || doc_id"
    " || (CASE WHEN doc_id % 2 = 0 THEN '?ref=' || lang ELSE '' END)"
)


def _url_synth_col():
    return F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("https"))
        .when(F.col("doc_id") % 3 == 1, F.lit("http"))
        .otherwise(F.lit("ftp")),
        F.lit("://www."),
        F.col("source"),
        F.lit("-site.org/docs/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit("?ref="), F.col("lang"))
        ).otherwise(F.lit("")),
    )


@q(
    "q97_url_parts",
    r"""
    WITH u AS (SELECT doc_id, """ + _URL_SYNTH_SQL + r""" AS url FROM documents),
    p AS (
      SELECT doc_id,
        regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
        regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
        regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
      FROM u
    )
    SELECT doc_id, scheme, host,
           regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS registered_domain,
           path
    FROM p
    """,
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (operators/web.py: url_parts): scheme, host,
    registered domain (last two labels), path — regexp_extract
    expressions shared verbatim with the oracle."""
    from .operators.web import url_parts

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _url_synth_col().alias("url")
    )
    return url_parts(docs, "doc_id", "url")


@q(
    "q98_domain_cap",
    r"""
    WITH u AS (SELECT doc_id, """ + _URL_SYNTH_SQL + r""" AS url FROM documents),
    d AS (
      SELECT doc_id,
        regexp_extract(
          regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
          '([^.]+\.[^.]+)$', 1) AS registered_domain
      FROM u
    ),
    r AS (
      SELECT doc_id, registered_domain,
             row_number() OVER (
               PARTITION BY registered_domain
               ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT AS domain_rank
      FROM d
    )
    SELECT doc_id, registered_domain, domain_rank FROM r WHERE domain_rank <= 20
    """,
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap (operators/web.py: cap_per_domain): keep
    at most 20 documents per registered domain in deterministic md5
    order — the Common-Crawl-style anti-spam / diversity gate.  One
    shuffle on the domain key; zipfian domains are AQE-split."""
    from .operators.web import cap_per_domain

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _url_synth_col().alias("url")
    )
    return cap_per_domain(docs, "doc_id", "url", cap=20).select(
        "doc_id", "registered_domain", "domain_rank"
    )


# ---------------------------------------------------------------------------
# Scale-path dedup / sampling additions

_EMB_PLUS_CLONES = (
    "SELECT vec_id, embedding FROM embeddings UNION ALL "
    "SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 25"
)


def _emb_plus_clones(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    clones = (
        emb.filter(F.col("vec_id") < 25)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
    )
    return emb.union(clones)


@q(
    "q99_semdedup",
    f"""
    WITH all_e AS ({_EMB_PLUS_CLONES}),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM all_e),
    n AS (
      SELECT vec_id,
             CASE WHEN sqrt(list_dot_product(e, e)) > 0
                  THEN list_transform(e, x -> x / sqrt(list_dot_product(e, e)))
                  ELSE e END AS vn
      FROM v
    ),
    cent AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
             vn AS cn
      FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    vc AS (
      SELECT n.vec_id, c.cell,
             round(list_dot_product(n.vn, c.cn), 6) AS cos
      FROM n CROSS JOIN cent c
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc
      ) WHERE rk = 1
    ),
    pairs AS (
      SELECT aa.vec_id AS id_a, bb.vec_id AS id_b,
             round(list_dot_product(na.vn, nb.vn), 6) AS cos
      FROM assign aa
      JOIN assign bb ON aa.cell = bb.cell AND aa.vec_id < bb.vec_id
      JOIN n na ON na.vec_id = aa.vec_id
      JOIN n nb ON nb.vec_id = bb.vec_id
    ),
    dup AS (SELECT id_b, min(id_a) AS dup_of FROM pairs WHERE cos >= 0.4 GROUP BY id_b)
    SELECT a.vec_id AS id, a.cell::BIGINT AS cell,
           (d.dup_of IS NOT NULL) AS dropped, d.dup_of
    FROM assign a LEFT JOIN dup d ON a.vec_id = d.id_b
    """,
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style semantic dedup (operators/similarity.py: semdedup):
    centroid-bucketed intra-cluster cosine with one survivor per
    epsilon-ball — the scale path that replaces all-pairs cosine_pairs
    (q32's baseline).  Input embeddings plus 25 exact clones so real
    drops occur; threshold 0.4 also exercises organic near-pairs."""
    from .operators.similarity import semdedup

    return semdedup(
        _emb_plus_clones(spark, sf_dir), "vec_id", "embedding",
        threshold=0.4, nlist=16,
    )


@q(
    "q100_gram_duplication",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    grams AS (
      SELECT doc_id, md5(unnest(list_distinct(
        CASE WHEN len(t) >= 8 THEN
          [array_to_string(t[i+1:i+8], ' ') for i in range(len(t)-7)]
        WHEN len(t) > 0 THEN [array_to_string(t, ' ')] ELSE [] END))) AS g
      FROM toks
    ),
    counts AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY g),
    per AS (
      SELECT doc_id, count(*) AS n_grams,
             sum((n_docs > 1)::INT) AS n_shared
      FROM grams JOIN counts USING (g) GROUP BY doc_id
    )
    SELECT d.doc_id AS id, coalesce(n_grams, 0)::BIGINT AS n_grams,
           coalesce(n_shared, 0)::BIGINT AS n_shared_grams,
           round(CASE WHEN n_grams > 0
                 THEN n_shared::DOUBLE / n_grams END, 6) AS shared_frac,
           coalesce(round(CASE WHEN n_grams > 0
                 THEN n_shared::DOUBLE / n_grams END, 6) >= 0.8, FALSE) AS "drop"
    FROM all_docs d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document substring duplication (operators/dedup.py:
    gram_duplication_stats): fraction of each document's distinct
    8-grams shared with other documents, keep/drop at 0.8 — the
    exact-substring dedup signal computed from a gram-digest join, no
    suffix array.  Clones share every gram and are dropped."""
    from .operators.dedup import gram_duplication_stats

    return gram_duplication_stats(
        _docs_plus_clones(spark, sf_dir), "doc_id", "text",
        n=8, drop_threshold=0.8,
    )


@q(
    "q101_mixture_resample",
    """
    WITH w AS (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                         WHEN 'src2' THEN 0.0 ELSE 1.0 END AS wt
      FROM documents
    ),
    u AS (
      SELECT *,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
               / 4294967296.0 AS unif
      FROM w
    ),
    n AS (
      SELECT doc_id, source,
             (floor(wt) + (unif < wt - floor(wt))::INT)::INT AS n_copies
      FROM u
    )
    SELECT doc_id, source, unnest(range(0, n_copies))::BIGINT AS copy_idx
    FROM n WHERE n_copies > 0
    """,
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture re-sampling (operators/clusters.py:
    mixture_resample): per-source epoch weights (2.5x src0, 0.25x src1,
    drop src2, 1x rest) via floor(w) copies plus an md5-uniform
    fractional copy — reproducible source mixing with zero shuffle."""
    from .operators.clusters import mixture_resample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return mixture_resample(
        docs, "doc_id", "source",
        {"src0": 2.5, "src1": 0.25, "src2": 0.0},
    )


@q(
    "q102_mad_outliers",
    """
    WITH med AS (
      SELECT o_orderpriority, median(o_totalprice) AS med
      FROM orders GROUP BY 1
    ),
    j AS (
      SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice, m.med
      FROM orders o JOIN med m USING (o_orderpriority)
    ),
    mad AS (
      SELECT o_orderpriority, median(abs(o_totalprice - med)) AS mad
      FROM j GROUP BY 1
    )
    SELECT j.o_orderkey, j.o_orderpriority,
           round(j.med, 6) AS med, round(mad.mad, 6) AS mad,
           (round(mad.mad, 6) > 0 AND
            abs(j.o_totalprice - round(j.med, 6)) > 3.0 * round(mad.mad, 6))
             AS is_outlier
    FROM j JOIN mad USING (o_orderpriority)
    """,
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier flags (operators/profile.py:
    mad_outliers): median/MAD per order priority, flag
    |price - med| > 3*MAD — two grouped exact percentiles and two
    broadcast joins back, no driver collection."""
    from .operators.profile import mad_outliers

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = mad_outliers(orders, ["o_orderpriority"], "o_totalprice", k=3.0)
    return out.select("o_orderkey", "o_orderpriority", "med", "mad", "is_outlier")


@q(
    "q103_corr_matrix",
    """
    WITH c AS (
      SELECT corr(l_quantity, l_extendedprice) AS c1,
             corr(l_quantity, l_discount) AS c2,
             corr(l_quantity, l_tax) AS c3,
             corr(l_extendedprice, l_discount) AS c4,
             corr(l_extendedprice, l_tax) AS c5,
             corr(l_discount, l_tax) AS c6
      FROM lineitem
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, round(c1, 6) AS "corr" FROM c
    UNION ALL
    SELECT 'l_quantity', 'l_discount', round(c2, 6) FROM c
    UNION ALL
    SELECT 'l_quantity', 'l_tax', round(c3, 6) FROM c
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount', round(c4, 6) FROM c
    UNION ALL
    SELECT 'l_extendedprice', 'l_tax', round(c5, 6) FROM c
    UNION ALL
    SELECT 'l_discount', 'l_tax', round(c6, 6) FROM c
    """,
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (operators/profile.py:
    corr_matrix) over the lineitem measures — all pairs in ONE
    aggregation pass (single scan + reduce), unpivoted via explode."""
    from .operators.profile import corr_matrix

    li = _t(spark, sf_dir, "lineitem")
    return corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


@q(
    "q104_fuzzy_join",
    """
    WITH lt AS (
      SELECT p_partkey AS id_l,
             list_distinct(string_split_regex(lower(trim(p_name)), '\\s+')) AS t
      FROM part
    ),
    rt AS (
      SELECT p_partkey + 100000 AS id_r,
             list_distinct(string_split_regex(
               lower(trim(p_name || ' ' || p_type)), '\\s+')) AS t
      FROM part
    ),
    gl AS (SELECT id_l, unnest(t) AS tok FROM lt),
    gr AS (SELECT id_r, unnest(t) AS tok FROM rt),
    inter AS (
      SELECT id_l, id_r, count(*) AS i
      FROM gl JOIN gr USING (tok) GROUP BY 1, 2
    ),
    szl AS (SELECT id_l, len(t) AS nl FROM lt),
    szr AS (SELECT id_r, len(t) AS nr FROM rt)
    SELECT id_l, id_r,
           round(i::DOUBLE / (nl + nr - i), 6) AS jaccard
    FROM inter JOIN szl USING (id_l) JOIN szr USING (id_r)
    WHERE round(i::DOUBLE / (nl + nr - i), 6) >= 0.5
    """,
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record-linkage join (operators/dedup.py:
    jaccard_similarity_join): canonical part names vs a dirty catalog
    (name + container tokens), token-Jaccard >= 0.5 via a token-blocked
    hash join — no cross join.  The entity-resolution primitive."""
    from .operators.dedup import jaccard_similarity_join

    part = _t(spark, sf_dir, "part")
    dirty = part.select(
        (F.col("p_partkey") + 100000).alias("cat_id"),
        F.concat(F.col("p_name"), F.lit(" "), F.col("p_type")).alias(
            "cat_name"
        ),
    )
    return jaccard_similarity_join(
        part, dirty, "p_partkey", "p_name", "cat_id", "cat_name",
        threshold=0.5,
    )


@q(
    "q105_feature_hash",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(CASE WHEN length(trim(text)) > 0
                    THEN string_split_regex(lower(trim(text)), '\\s+')
                    ELSE []::VARCHAR[] END) AS tok
      FROM documents
    )
    SELECT doc_id AS id,
           (('0x' || substr(md5(tok), 1, 8))::BIGINT % 256) AS bucket,
           count(*)::BIGINT AS n
    FROM toks GROUP BY 1, 2
    """,
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (operators/text.py: feature_hash):
    md5-bucketed token counts per document, 256 buckets — fixed-width
    sparse features with no vocabulary state."""
    from .operators.text import feature_hash

    return feature_hash(_t(spark, sf_dir, "documents"), "doc_id", "text",
                        n_buckets=256)


@q(
    "q106_throttle_events",
    """
    WITH e AS (
      SELECT event_id, user_id, date_trunc('second', ts) AS tss, value
      FROM events
    ),
    b AS (
      SELECT *, (floor(epoch(tss)::BIGINT / 600) * 600)::BIGINT AS bucket_start
      FROM e
    ),
    r AS (
      SELECT event_id, user_id, tss, bucket_start,
             row_number() OVER (PARTITION BY user_id, bucket_start
                                ORDER BY tss, event_id)::BIGINT AS bucket_rank
      FROM b
    )
    SELECT event_id, user_id, strftime(tss, '%Y-%m-%d %H:%M:%S') AS ts,
           bucket_start, bucket_rank
    FROM r WHERE bucket_rank <= 1
    """,
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-stream rate limiting (operators/events.py:
    throttle_events): keep the first event per user per 10-minute
    bucket, deterministic (ts, event_id) order — one shuffle on the
    (user, bucket) key."""
    from .operators.events import throttle_events

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    out = throttle_events(
        ev, "user_id", "ts", bucket_seconds=600, keep=1, order_col="event_id"
    )
    return out.select(
        "event_id", "user_id", _ts(F.col("ts")).alias("ts"),
        "bucket_start", "bucket_rank",
    )


@q(
    "q107_gapfill_resample",
    """
    WITH e AS (
      SELECT user_id AS key,
             (floor(epoch(date_trunc('second', ts))::BIGINT / 21600) * 21600)::BIGINT
               AS slot,
             value
      FROM events
    ),
    slots AS (
      SELECT key, slot, count(*)::BIGINT AS n_events,
             round(sum(value), 6) AS value
      FROM e GROUP BY 1, 2
    ),
    spans AS (SELECT key, min(slot) AS lo, max(slot) AS hi FROM slots GROUP BY 1),
    grid AS (
      SELECT key, unnest(range(lo, hi + 21600, 21600))::BIGINT AS slot
      FROM spans
    )
    SELECT g.key, g.slot AS slot_start,
           coalesce(s.n_events, 0)::BIGINT AS n_events, s.value,
           last_value(s.value IGNORE NULLS) OVER (
             PARTITION BY g.key ORDER BY g.slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN slots s ON g.key = s.key AND g.slot = s.slot
    """,
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill / resample (operators/events.py:
    gapfill_resample): per-user 6-hour grid between first and last
    event, slot sums where data exists, last value carried forward —
    sequence-explode grid, no driver loop, two shuffles on the user
    key."""
    from .operators.events import gapfill_resample

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    return gapfill_resample(
        ev, "user_id", "ts", "value", step_seconds=21600, agg="sum"
    )


@q(
    "q108_rolling_anomaly",
    """
    WITH e AS (
      SELECT event_id, user_id, date_trunc('second', ts) AS tss, value
      FROM events
    ),
    s AS (
      SELECT event_id, user_id, tss, value,
             avg(value) OVER w AS m,
             stddev_samp(value) OVER w AS sd,
             count(value) OVER w AS np
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, strftime(tss, '%Y-%m-%d %H:%M:%S') AS ts,
           round(value, 6) AS value,
           round(m, 6) AS roll_mean,
           round(sd, 6) AS roll_std,
           round(CASE WHEN np >= 3 AND sd > 0 THEN (value - m) / sd END, 6)
             AS zscore,
           coalesce(abs(CASE WHEN np >= 3 AND sd > 0 THEN (value - m) / sd END)
                    > 3.0, FALSE) AS is_anomaly
    FROM s
    """,
)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags (operators/events.py:
    rolling_anomaly): each event scored against its user's previous 20
    values (strictly-prior ROWS frame, deterministic event_id
    tiebreak), |z| > 3 flagged — one keyed window shuffle."""
    from .operators.events import rolling_anomaly

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    out = rolling_anomaly(
        ev, "user_id", "ts", "value", lookback=20, k=3.0, order_col="event_id"
    )
    return out.select(
        "user_id", _ts(F.col("ts")).alias("ts"),
        F.round(F.col("value"), 6).alias("value"),
        "roll_mean", "roll_std", "zscore", "is_anomaly",
    )


@q(
    "q109_zorder_key",
    """
    SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
           (((((l_partkey % 256) >> 0) & 1) << 0) + ((((l_partkey % 256) >> 1) & 1) << 2) + ((((l_partkey % 256) >> 2) & 1) << 4) + ((((l_partkey % 256) >> 3) & 1) << 6) + ((((l_partkey % 256) >> 4) & 1) << 8) + ((((l_partkey % 256) >> 5) & 1) << 10) + ((((l_partkey % 256) >> 6) & 1) << 12) + ((((l_partkey % 256) >> 7) & 1) << 14) + ((((l_suppkey % 256) >> 0) & 1) << 1) + ((((l_suppkey % 256) >> 1) & 1) << 3) + ((((l_suppkey % 256) >> 2) & 1) << 5) + ((((l_suppkey % 256) >> 3) & 1) << 7) + ((((l_suppkey % 256) >> 4) & 1) << 9) + ((((l_suppkey % 256) >> 5) & 1) << 11) + ((((l_suppkey % 256) >> 6) & 1) << 13) + ((((l_suppkey % 256) >> 7) & 1) << 15))::BIGINT AS zval
    FROM lineitem
    """,
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key (plans/layout.py: zorder_key): the
    low 8 bits of part and supplier keys interleaved into one sort key
    for write-time data clustering — multi-column row-group pruning from
    a single sort.  Pure codegen bit-math; the oracle recomputes the
    interleave arithmetically."""
    from .plans.layout import zorder_key

    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
        zorder_key(
            [F.col("l_partkey") % 256, F.col("l_suppkey") % 256], bits=8
        ).alias("zval"),
    )


@q(
    "q110_group_quantiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 6) AS q25,
           round(quantile_cont(o_totalprice, 0.5), 6) AS q50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS q75,
           round(quantile_cont(o_totalprice, 0.95), 6) AS q95
    FROM orders GROUP BY 1
    """,
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped multi-quantile summary (operators/profile.py:
    group_quantiles): p25/p50/p75/p95 of order totals per priority from
    ONE grouped percentile(array(...)) pass — never a job per
    quantile."""
    from .operators.profile import group_quantiles

    return group_quantiles(
        _t(spark, sf_dir, "orders"), ["o_orderpriority"], "o_totalprice",
        quantiles=[0.25, 0.5, 0.75, 0.95],
    )


@q(
    "q111_event_transitions",
    """
    WITH e AS (
      SELECT event_id, user_id, date_trunc('second', ts) AS tss, event_type
      FROM events
    ),
    lagged AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY tss, event_id) AS prev
      FROM e
    ),
    pairs AS (
      SELECT prev AS from_type, event_type AS to_type, count(*)::BIGINT AS n
      FROM lagged WHERE prev IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM pairs
    """,
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition matrix (operators/events.py:
    event_transitions): per-user lag over time order, global
    (from, to) counts and per-source probabilities — the Markov
    next-action model builder."""
    from .operators.events import event_transitions

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    return event_transitions(
        ev, "user_id", "ts", "event_type", order_col="event_id"
    )


@q(
    "q112_vocab_stats",
    f"""
    WITH toks AS (
      SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
    top AS (
      SELECT sum(c) AS top_c,
             string_agg(tok || ':' || c, '|' ORDER BY c DESC, tok ASC)
               AS top_tokens
      FROM (SELECT tok, c FROM freq ORDER BY c DESC, tok ASC LIMIT 10)
    ),
    tot AS (
      SELECT sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
             sum((c = 1)::INT)::BIGINT AS n_hapax
      FROM freq
    )
    SELECT n_tokens, n_types, n_hapax,
           round(n_types::DOUBLE / n_tokens, 6) AS type_token_ratio,
           round(top_c::DOUBLE / n_tokens, 6) AS top10_share,
           top_tokens
    FROM tot CROSS JOIN top
    """,
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile (operators/text.py: vocab_stats):
    token/type/hapax counts, type-token ratio, Zipf-head share and the
    top-10 tokens — one token-frequency aggregation plus a tiny
    rollup."""
    from .operators.text import vocab_stats

    return vocab_stats(_t(spark, sf_dir, "documents"), "text", top_k=10)


@q(
    "q113_edit_distance_join",
    """
    WITH lt AS (SELECT p_partkey AS id_l, lower(trim(p_name)) AS t FROM part),
    rt AS (
      SELECT p_partkey + 200000 AS id_r,
             lower(trim(
               substr(p_name, 1, (p_partkey % length(p_name))::INT) || '#' ||
               substr(p_name, (p_partkey % length(p_name))::INT + 2)
             )) AS t
      FROM part
    ),
    c1 AS (
      SELECT id_l, l.t AS tl, id_r, r.t AS tr
      FROM lt l JOIN rt r ON substr(l.t, 1, 5) = substr(r.t, 1, 5)
    ),
    c2 AS (
      SELECT id_l, l.t AS tl, id_r, r.t AS tr
      FROM lt l JOIN rt r ON substr(l.t, 6) = substr(r.t, 6)
    ),
    cand AS (
      SELECT DISTINCT id_l, id_r, tl, tr FROM (
        SELECT * FROM c1 UNION ALL SELECT * FROM c2
      )
    )
    SELECT id_l, id_r, levenshtein(tl, tr)::BIGINT AS distance
    FROM cand WHERE levenshtein(tl, tr) <= 1
    """,
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-tolerant join (operators/dedup.py: edit_distance_join):
    part names vs one-substitution corruptions, pigeonhole segment
    blocking (two equi-joins, no cross join) + exact levenshtein
    verify at distance <= 1."""
    from .operators.dedup import edit_distance_join

    part = _t(spark, sf_dir, "part")
    pos = (F.col("p_partkey") % F.length("p_name")).cast("int")
    dirty = part.select(
        (F.col("p_partkey") + 200000).alias("tid"),
        F.concat(
            F.col("p_name").substr(F.lit(1), pos),
            F.lit("#"),
            F.col("p_name").substr(pos + 2, F.length("p_name")),
        ).alias("tname"),
    )
    return edit_distance_join(
        part, dirty, "p_partkey", "p_name", "tid", "tname",
        max_distance=1, split_at=5,
    )


@q(
    "q114_dq_rules",
    """
    WITH t AS (
      SELECT count(*) AS n,
             sum((NOT coalesce(o_totalprice > 0, FALSE))::INT) AS v1,
             sum((NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE))::INT) AS v2,
             sum((NOT coalesce(o_orderdate >= TIMESTAMP '1994-01-01 00:00:00',
                               FALSE))::INT) AS v3,
             sum((o_custkey IS NULL)::INT) AS v4
      FROM orders
    )
    SELECT 'positive_price' AS rule, n::BIGINT AS n_rows, v1::BIGINT AS n_violations,
           round(v1::DOUBLE / n, 6) AS violation_frac FROM t
    UNION ALL
    SELECT 'status_in_domain', n::BIGINT, v2::BIGINT, round(v2::DOUBLE / n, 6) FROM t
    UNION ALL
    SELECT 'date_in_range', n::BIGINT, v3::BIGINT, round(v3::DOUBLE / n, 6) FROM t
    UNION ALL
    SELECT 'custkey_not_null', n::BIGINT, v4::BIGINT, round(v4::DOUBLE / n, 6) FROM t
    """,
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/rules.py: check_rules):
    four named row predicates over orders evaluated in ONE aggregation
    pass, NULL-predicate counted as violation, unpivoted per rule."""
    from .operators.rules import check_rules

    return check_rules(
        _t(spark, sf_dir, "orders"),
        {
            "positive_price": F.col("o_totalprice") > 0,
            "status_in_domain": F.col("o_orderstatus").isin("O", "F", "P"),
            "date_in_range": "o_orderdate >= timestamp'1994-01-01 00:00:00'",
            "custkey_not_null": F.col("o_custkey").isNotNull(),
        },
    )


@q(
    "q115_pq_codes",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS ci,
             e AS ce
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    spaces AS (SELECT unnest(range(0, 8)) AS j),
    dists AS (
      SELECT v.vec_id, s.j, c.ci,
             round(list_sum([
               (v.e[s.j * 8 + k] - c.ce[s.j * 8 + k]) ^ 2
               for k in range(1, 9)
             ]), 6) AS d
      FROM v CROSS JOIN spaces s CROSS JOIN cent c
    ),
    best AS (
      SELECT vec_id, j, ci, d,
             row_number() OVER (PARTITION BY vec_id, j ORDER BY d, ci) AS rk
      FROM dists
    )
    SELECT vec_id AS id, j::BIGINT AS subspace, ci::BIGINT AS code, d AS dist
    FROM best WHERE rk = 1
    """,
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding (operators/similarity.py:
    pq_codes): 64-dim embeddings split into 8 subspaces, each assigned
    its nearest of 16 codebook centroids (squared-L2, deterministic
    seeding) — the PQ compression step of a billion-scale ANN index,
    one scan, literal codebooks, no shuffle."""
    from .operators.similarity import pq_codes

    return pq_codes(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        m=8, n_centroids=16,
    )


# ===========================================================================
# Round 2 additions: corpus curation + join/versioning primitives
# ===========================================================================


@q(
    "q116_segment_dedup",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    segs AS (
      SELECT doc_id,
             unnest(range(CAST(ceil(len(t)/10.0) AS BIGINT))) AS seg_idx,
             unnest([array_to_string(t[i*10+1:i*10+10], ' ')
                     for i in range(CAST(ceil(len(t)/10.0) AS BIGINT))]) AS seg
      FROM toks WHERE len(t) > 0
    ),
    cnt AS (SELECT seg, count(*) AS c FROM segs GROUP BY seg),
    kept AS (SELECT s.doc_id, s.seg_idx, s.seg
             FROM segs s JOIN cnt USING (seg) WHERE cnt.c <= 1),
    reb AS (
      SELECT doc_id,
             array_to_string(list(seg ORDER BY seg_idx), ' ') AS clean_text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id,
             CASE WHEN len(t) > 0 THEN CAST(ceil(len(t)/10.0) AS BIGINT)
                  ELSE 0 END AS n_segments
      FROM toks
    )
    SELECT b.doc_id AS id, coalesce(r.clean_text, '') AS clean_text,
           b.n_segments, b.n_segments - coalesce(r.n_kept, 0) AS n_removed
    FROM base b LEFT JOIN reb r ON b.doc_id = r.doc_id
    """,
)
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated-segment removal (operators/dedup.py:
    segment_dedup): 10-token windows, any segment occurring more than
    once across the corpus is dropped and documents are reassembled —
    CCNet-style paragraph dedup with fixed windows.  Input includes the
    20 synthetic clones so whole documents dissolve."""
    from .operators.dedup import segment_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = (
        docs.filter(F.col("doc_id") < 20)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    return segment_dedup(
        docs.unionByName(clones), "doc_id", "text", seg_tokens=10, max_count=1
    )


@q(
    "q117_bloom_join",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000
    """,
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned fact-dim join (plans/bloom.py: bloom_pruned_join):
    the filtered customer side is bitmapped (one bounded Spark job),
    the bitmap ships as an ~8 KB plan literal, and orders rows failing
    the k-probe bit test are dropped at the scan before any join
    machinery — the declarative form of Spark's runtime bloom filter.
    Result is exactly the plain join (no false negatives)."""
    from .plans.bloom import bloom_pruned_join

    orders = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return bloom_pruned_join(orders, dim, "o_custkey", "c_custkey").select(
        "o_orderkey", "o_totalprice", "c_name"
    )


@q(
    "q118_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 10 != 0
    ),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 7 != 0
    ),
    j AS (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice = n.o_totalprice
                       AND o.o_orderstatus = n.o_orderstatus THEN 'unchanged'
                  ELSE 'changed' END AS change,
             round(o.o_totalprice, 4) AS o_totalprice_old,
             round(n.o_totalprice, 4) AS o_totalprice_new,
             o.o_orderstatus AS o_orderstatus_old,
             n.o_orderstatus AS o_orderstatus_new
      FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    )
    SELECT * FROM j WHERE change != 'unchanged'
    """,
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff by primary key (operators/cdc.py: snapshot_diff):
    two derived orders snapshots compared in ONE full-outer join —
    added / removed / changed classification with null-safe value
    comparison, unchanged rows dropped before materializing."""
    from .operators.cdc import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    d = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    return d.select(
        "o_orderkey",
        "change",
        F.round("o_totalprice_old", 4).alias("o_totalprice_old"),
        F.round("o_totalprice_new", 4).alias("o_totalprice_new"),
        "o_orderstatus_old",
        "o_orderstatus_new",
    )


@q(
    "q119_bpe_merges",
    f"""
    WITH toks AS (SELECT {_TOKS} AS t FROM documents),
    words AS (SELECT unnest(t) AS w FROM toks),
    wf AS (SELECT w, count(*) AS wc FROM words GROUP BY w),
    pairs AS (
      SELECT unnest([substr(w, CAST(i AS INT), 2)
                     for i in range(1, CAST(length(w) AS BIGINT))]) AS pair,
             wc
      FROM wf WHERE length(w) >= 2
    )
    SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE vocabulary-training step (operators/text.py:
    bpe_merge_candidates): corpus -> word frequencies -> adjacent
    character-pair counts -> top-20 merge candidates, two tiny-key
    shuffles."""
    from .operators.text import bpe_merge_candidates

    return bpe_merge_candidates(
        _t(spark, sf_dir, "documents"), "text", top_n=20
    )


@q(
    "q120_token_budget",
    f"""
    WITH d AS (
      SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id AS id, source AS src, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING
             ) AS cum_tokens
      FROM d
    )
    SELECT * FROM c WHERE cum_tokens <= 10000
    """,
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget sampling (operators/text.py:
    token_budget_filter): walk each source's documents in id order and
    keep a strict prefix while the cumulative token count stays within
    the 10k budget — the 'N tokens per source' mixture-assembly step."""
    from .operators.text import token_budget_filter

    out = token_budget_filter(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "source", 10000
    )
    return out.withColumnRenamed("group", "src")


@q(
    "q121_pit_join",
    """
    WITH e AS (
      SELECT user_id, date_trunc('second', ts) AS tss, event_type AS v
      FROM events
    ),
    r AS (
      SELECT user_id, tss, v,
             lag(v) OVER (PARTITION BY user_id ORDER BY tss, v) AS prev
      FROM e
    ),
    c AS (
      SELECT user_id, tss, v,
             sum(CASE WHEN prev IS NULL OR v <> prev THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tss, v) AS ver
      FROM r
    ),
    runs AS (SELECT user_id, ver, v, min(tss) AS valid_from
             FROM c GROUP BY 1, 2, 3),
    scd AS (
      SELECT user_id, ver AS version, v AS value, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY valid_from, v) AS valid_to
      FROM runs
    ),
    facts AS (
      SELECT event_id, user_id, date_trunc('second', ts) AS tss
      FROM events WHERE event_id % 7 = 0
    )
    SELECT f.event_id, f.user_id,
           strftime(f.tss, '%Y-%m-%d %H:%M:%S') AS tss,
           s.value, s.version
    FROM facts f
    LEFT JOIN scd s
      ON s.user_id = f.user_id
     AND s.valid_from <= f.tss
     AND (s.valid_to IS NULL OR f.tss < s.valid_to)
    """,
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension lookup (operators/temporal.py:
    point_in_time_join): facts enriched with the SCD2 version valid at
    each fact's timestamp — the feature-store join that prevents label
    leakage.  Executed as an as-of merge (union + one keyed window),
    NOT an interval join: one shuffle, no candidate-pair explosion."""
    from .operators.events import scd2_intervals
    from .operators.temporal import point_in_time_join

    ev = _events(spark, sf_dir).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    )
    dim = scd2_intervals(ev, "user_id", "ts", "event_type")
    facts = ev.filter(F.col("event_id") % 7 == 0).select(
        "event_id", "user_id", "ts"
    )
    out = point_in_time_join(
        facts, dim, on="user_id", fact_ts="ts",
        dim_cols=["value", "version"],
    )
    return out.select(
        "event_id", "user_id", _ts(F.col("ts")).alias("tss"),
        "value", F.col("version").cast("bigint").alias("version"),
    )


@q(
    "q122_intradoc_dedup",
    f"""
    WITH d AS (SELECT doc_id, text || ' ' || text AS text FROM documents),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM d),
    segs AS (
      SELECT doc_id,
             unnest(range(CAST(ceil(len(t)/10.0) AS BIGINT))) AS seg_idx,
             unnest([array_to_string(t[i*10+1:i*10+10], ' ')
                     for i in range(CAST(ceil(len(t)/10.0) AS BIGINT))]) AS seg
      FROM toks WHERE len(t) > 0
    ),
    ranked AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY doc_id, seg
                                ORDER BY seg_idx) AS occ
      FROM segs
    ),
    reb AS (
      SELECT doc_id,
             array_to_string(list(seg ORDER BY seg_idx), ' ') AS clean_text,
             count(*) AS n_kept
      FROM ranked WHERE occ = 1 GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id,
             CASE WHEN len(t) > 0 THEN CAST(ceil(len(t)/10.0) AS BIGINT)
                  ELSE 0 END AS n_segments
      FROM toks
    )
    SELECT b.doc_id AS id, coalesce(r.clean_text, '') AS clean_text,
           b.n_segments, b.n_segments - coalesce(r.n_kept, 0) AS n_removed
    FROM base b LEFT JOIN reb r ON b.doc_id = r.doc_id
    """,
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-segment trim (operators/dedup.py:
    intradoc_segment_dedup): documents self-concatenated so every
    10-token window repeats, then repaired map-only (one aggregate fold
    per row, NO shuffle) keeping first occurrences in order."""
    from .operators.dedup import intradoc_segment_dedup

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat_ws(" ", "text", "text").alias("text")
    )
    return intradoc_segment_dedup(d, "doc_id", "text", seg_tokens=10)


@q(
    "q123_rrf_fusion",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             sum(q.v * c.v) AS dot,
             sum((q.v - c.v) * (q.v - c.v)) AS sqdist
      FROM (SELECT * FROM e WHERE vec_id < 5) q
      JOIN e c USING (i)
      WHERE c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ),
    cos_rank AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC, neighbor_id
             ) AS rank
      FROM pairs JOIN norms nq ON query_id = nq.vec_id
                 JOIN norms nc ON neighbor_id = nc.vec_id
    ),
    l2_rank AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(sqdist, 6), neighbor_id
             ) AS rank
      FROM pairs
    ),
    contrib AS (
      SELECT query_id, neighbor_id, 1.0 / (60 + rank) AS c
      FROM cos_rank WHERE rank <= 20
      UNION ALL
      SELECT query_id, neighbor_id, 1.0 / (60 + rank) AS c
      FROM l2_rank WHERE rank <= 20
    ),
    fused AS (
      SELECT query_id, neighbor_id, round(sum(c), 6) AS rrf_score
      FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, rrf_score, fused_rank FROM (
      SELECT query_id, neighbor_id, rrf_score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, neighbor_id)::BIGINT
               AS fused_rank
      FROM fused
    ) WHERE fused_rank <= 10
    """,
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-retrieval reciprocal-rank fusion (operators/search.py:
    rrf_fuse): a cosine top-20 and an L2 top-20 ranking per query
    fused with 1/(60+rank) — the dense+sparse merge step; fusion cost
    rides on the bounded candidate lists, never the corpus."""
    from pyspark.sql import Window as W

    from .operators.search import rrf_fuse
    from .operators.similarity import _dot, _norm

    emb = _t(spark, sf_dir, "embeddings")
    q_side = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    c_side = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    pairs = c_side.crossJoin(F.broadcast(q_side)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = F.round(
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        6,
    )
    sqd = F.round(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = pairs.select("query_id", "neighbor_id", cos.alias("cos"), sqd.alias("sqd"))
    cos_r = scored.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
        ),
    ).filter(F.col("rank") <= 20)
    l2_r = scored.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("query_id").orderBy(F.col("sqd"), "neighbor_id")
        ),
    ).filter(F.col("rank") <= 20)
    return rrf_fuse(
        [cos_r, l2_r],
        query_col="query_id", id_col="neighbor_id", top_k=10,
    ).select(
        "query_id", "neighbor_id", "rrf_score",
        F.col("fused_rank").cast("bigint").alias("fused_rank"),
    )


@q(
    "q124_hard_negatives",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    lab AS (SELECT vec_id, label FROM embeddings),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
      FROM (SELECT * FROM e WHERE vec_id < 5) q
      JOIN e c USING (i)
      WHERE c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots
      JOIN norms nq ON query_id = nq.vec_id
      JOIN norms nc ON neighbor_id = nc.vec_id
      JOIN lab lq ON query_id = lq.vec_id
      JOIN lab lc ON neighbor_id = lc.vec_id
      WHERE lc.label IS DISTINCT FROM lq.label
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py: hard_negatives):
    per query, the 10 most-cosine-similar vectors with a DIFFERENT
    label — the contrastive-training negative sampler; label mismatch
    rides the similarity scan for free."""
    from .operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    qids = emb.filter(F.col("vec_id") < 5).select("vec_id")
    return hard_negatives(
        emb, "vec_id", "embedding", "label", query_ids=qids, top_k=10
    )


@q(
    "q125_label_centroids",
    """
    WITH e AS (
      SELECT label, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    per AS (
      SELECT label, i, avg(v) AS m, count(*) AS n
      FROM e GROUP BY 1, 2
    )
    SELECT label,
           array_to_string(
             list(CAST(CAST(round(m, 6) AS DECIMAL(18,6)) AS VARCHAR)
                  ORDER BY i), ',') AS centroid,
           max(n)::BIGINT AS n
    FROM per GROUP BY label
    """,
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (operators/similarity.py:
    label_centroids): class prototypes in one (label, dim) shuffle with
    map-side partial averages — aggregation state is |labels| x dim
    regardless of corpus size."""
    from .operators.similarity import label_centroids

    return label_centroids(_t(spark, sf_dir, "embeddings"), "embedding", "label")


@q(
    "q126_curation_pipeline",
    f"""
    WITH all_docs AS (
      SELECT doc_id, text, source FROM documents UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text, source
      FROM documents WHERE doc_id < 20
    ),
    dig AS (
      SELECT doc_id, source, md5(text) AS digest,
             CAST(len({_TOKS}) AS BIGINT) AS ntok
      FROM all_docs
    ),
    surv AS (
      SELECT doc_id, source, ntok FROM (
        SELECT doc_id, source, ntok,
               row_number() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
        FROM dig
      ) WHERE rn = 1 AND ntok BETWEEN 10 AND 1000000
    ),
    assigned AS (
      SELECT source, ntok,
             CASE WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS UBIGINT)::BIGINT % 100 < 80 THEN 'train'
                  WHEN CAST('0x' || substr(md5(doc_id::VARCHAR), 1, 8) AS UBIGINT)::BIGINT % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM surv
    )
    SELECT split, source AS grp, count(*) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY 1, 2
    """,
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline (operators/curation.py:
    curate_corpus): exact dedup (clones dissolve) -> token-count gate ->
    deterministic split -> per-(split, source) dataset-card accounting,
    planned as one DAG whose only corpus-wide shuffle is the digest
    window."""
    from .operators.curation import curate_corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    clones = (
        docs.filter(F.col("doc_id") < 20)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text", "source")
    )
    out = curate_corpus(
        docs.unionByName(clones), "doc_id", "text", "source",
        min_tokens=10, max_tokens=1_000_000,
    )
    return out.withColumnRenamed("group", "grp")


@q(
    "q127_quality_percentile",
    f"""
    WITH toks AS (SELECT doc_id, source, text, {_TOKS} AS t FROM documents),
    m AS (
      SELECT doc_id, source,
             length(text)::DOUBLE AS nc,
             length(regexp_replace(text, '[^.,;:!?''"()\\[\\]]', '', 'g'))::DOUBLE AS np,
             len(list_filter(t, x -> x IN ('the','and','of','to','in','is','that','it','with','for','der','die','das','und','ist','nicht','mit','ein','zu','von','le','la','les','et','est','pas','pour','que','une','dans','el','los','las','es','no','por','una','para'))) AS ns,
             len(t) AS nt
      FROM toks
    ),
    s AS (
      SELECT doc_id AS id, source AS grp,
             round(least(nt / 100.0, 1.0) * 0.4
                   + (CASE WHEN nt > 0 THEN ns::DOUBLE / nt ELSE 0 END) * 0.4
                   + (1.0 - least((CASE WHEN nc > 0 THEN np / nc ELSE 0 END) * 10.0, 1.0)) * 0.2,
                   6) AS score
      FROM m
    )
    SELECT id, grp, score, pct_rank FROM (
      SELECT id, grp, score,
             round(percent_rank() OVER (PARTITION BY grp
                                        ORDER BY score DESC, id), 6) AS pct_rank
      FROM s
    ) WHERE pct_rank <= 0.3
    """,
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality filtering (operators/text.py:
    quality_percentile_filter): keep the top 30% of documents PER
    SOURCE by heuristic quality score — the DCLM-style distribution-
    aware alternative to a fixed threshold; one window shuffle."""
    from .operators.text import quality_percentile_filter

    out = quality_percentile_filter(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "source",
        keep_frac=0.3,
    )
    return out.withColumnRenamed("group", "grp")


@q(
    "q128_truncate_tokens",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    SELECT doc_id AS id,
           array_to_string(t[1:40], ' ') AS text,
           CAST(len(t) AS BIGINT) AS n_tokens,
           len(t) > 40 AS truncated
    FROM toks
    """,
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-limit truncation (operators/text.py: truncate_tokens):
    clamp every document to its first 40 tokens map-only (no shuffle),
    reporting original counts and a truncation flag."""
    from .operators.text import truncate_tokens

    return truncate_tokens(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_tokens=40
    )


# ===========================================================================
# Sketches II, skew plans, projections, sharding, classifier inference

_HLL_RHO = (
    "CASE WHEN length(regexp_extract(hx2, '^(0*)', 1)) = 13 THEN 53 "
    "ELSE length(regexp_extract(hx2, '^(0*)', 1)) * 4 + "
    "(CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1 WHEN nib >= 2 THEN 2 "
    "ELSE 3 END) + 1 END"
)


@q(
    "q129_hll_distinct",
    """
    WITH h AS (
      SELECT o_orderpriority AS grp, md5(CAST(o_custkey AS VARCHAR)) AS hx
      FROM orders WHERE o_custkey IS NOT NULL
    ),
    parts AS (
      SELECT grp,
             CAST('0x' || substr(hx, 1, 3) AS UBIGINT)::BIGINT AS bucket,
             substr(hx, 4, 13) AS hx2,
             CASE WHEN length(regexp_extract(substr(hx, 4, 13), '^(0*)', 1)) < 13
                  THEN CAST('0x' || substr(substr(hx, 4, 13),
                       length(regexp_extract(substr(hx, 4, 13), '^(0*)', 1)) + 1, 1)
                       AS UBIGINT)::BIGINT
                  ELSE 0 END AS nib
      FROM h
    ),
    reg AS (
      SELECT grp, bucket,
             max(CASE WHEN length(regexp_extract(hx2, '^(0*)', 1)) = 13 THEN 53
                 ELSE length(regexp_extract(hx2, '^(0*)', 1)) * 4
                      + (CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1
                              WHEN nib >= 2 THEN 2 ELSE 3 END) + 1 END) AS rho
      FROM parts GROUP BY grp, bucket
    ),
    agg AS (
      SELECT grp, sum(power(2.0, -rho)) AS z_used,
             count(*)::DOUBLE AS nreg
      FROM reg GROUP BY grp
    )
    SELECT grp,
           round(CASE WHEN (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                           / (z_used + (4096.0 - nreg)) <= 2.5 * 4096.0
                      AND 4096.0 - nreg > 0
                      THEN 4096.0 * ln(4096.0 / (4096.0 - nreg))
                      ELSE (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                           / (z_used + (4096.0 - nreg)) END, 4) AS est_distinct
    FROM agg
    """,
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog distinct sketch (operators/sketches.py:
    hll_distinct): per-priority distinct-customer estimate whose register
    state is a DataFrame — at 100 TB you build per-day registers, union,
    re-max, and estimate once; every stage's output is bounded by m=4096
    rows per group.  Reference has no sketch surface; this extends
    SURVEY §2 extras alongside KMV (q69) with the industry-standard
    mergeable form."""
    from .operators.sketches import hll_distinct

    return (
        hll_distinct(_t(spark, sf_dir, "orders"), ["o_orderpriority"], "o_custkey")
        .withColumnRenamed("o_orderpriority", "grp")
    )


@q(
    "q130_salted_join",
    """
    SELECT c_nationkey, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted equi join (plans/skew.py: salted_join): the
    orders fact side is salted per-row, the customer side replicated
    salt times, so one hot customer key spreads across salt reduce tasks
    instead of serializing on one.  Oracle is the plain join — salting
    must be semantically invisible."""
    from .plans.skew import salted_join

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = salted_join(orders, cust, ["o_custkey"], salt=8)
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def _rp_oracle_sql(out_dim: int, dim: int) -> str:
    """DuckDB twin of similarity._hyperplane sign projection: signs are
    md5-parity, computed here once and inlined as +-1 literals."""
    import hashlib

    cols = []
    for p in range(out_dim):
        terms = []
        for d in range(dim):
            sgn = (
                "+"
                if int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[0], 16) % 2 == 0
                else "-"
            )
            terms.append(f"{sgn} embedding[{d + 1}]::DOUBLE")
        expr = " ".join(terms)
        cols.append(f"round(((0.0 {expr}) / {math.sqrt(out_dim)!r}), 6) AS proj_{p}")
    return (
        "SELECT vec_id AS id, " + ", ".join(cols) + " FROM embeddings"
    )


@q("q131_random_projection", _rp_oracle_sql(4, 64))
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection (operators/similarity.py:
    random_projection): 64-dim embeddings down to 4 via the md5-parity
    +-1 hyperplanes — map-only, no shuffle, no stored model; the cheap
    front-end before any all-pairs / k-means stage."""
    from .operators.similarity import random_projection

    out = random_projection(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", 4
    )
    return out.select(
        "id", *[F.col("proj")[i].alias(f"proj_{i}") for i in range(4)]
    )


@q(
    "q132_shard_assign",
    """
    WITH h AS (
      SELECT doc_id,
             md5('0|' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    )
    SELECT doc_id,
           CAST('0x' || substr(hx, 1, 8) AS UBIGINT)::BIGINT % 8 AS shard,
           CAST(row_number() OVER (
             PARTITION BY CAST('0x' || substr(hx, 1, 8) AS UBIGINT)::BIGINT % 8
             ORDER BY hx, doc_id) - 1 AS BIGINT) AS position
    FROM h
    """,
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-shuffle sharding (operators/clusters.py:
    shard_assign): every document to one of 8 shards by seeded hash with
    its reproducible position inside the shard — the layout
    ``write_shards`` materializes (repartition + sortWithinPartitions +
    maxRecordsPerFile) for training ingestion."""
    from .operators.clusters import shard_assign

    out = shard_assign(
        _t(spark, sf_dir, "documents"), "doc_id", 8, with_position=True
    )
    return out.select(
        "doc_id", "shard", F.col("position").cast("bigint").alias("position")
    )


_CLS_WEIGHTS = {
    "the": 0.8,
    "and": 0.5,
    "of": 0.4,
    "science": 1.2,
    "data": 0.9,
    "free": -1.1,
    "click": -2.0,
    "winner": -1.7,
}


def _cls_oracle_sql() -> str:
    case = " ".join(
        f"WHEN '{t}' THEN {w!r}" for t, w in _CLS_WEIGHTS.items()
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    s AS (
      SELECT doc_id AS id,
             CASE WHEN len(t) = 0 THEN 0.0
                  ELSE list_reduce(
                         list_transform(t, x -> (CASE x {case} ELSE 0.0 END)::DOUBLE),
                         (a, b) -> a + b) / len(t)
             END AS z
      FROM toks
    )
    SELECT id, round(1.0 / (1.0 + exp(-(0.0 + z))), 6) AS score FROM s
    """


@q("q133_classifier_score", _cls_oracle_sql())
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference (operators/text.py:
    classifier_score): fastText-shaped token-weight model compiled to a
    broadcast map literal probed per token — sigmoid of the mean token
    weight, one scan, no Python.  The DCLM-style 'model-based quality
    filter' scoring pass."""
    from .operators.text import classifier_score

    return classifier_score(
        _t(spark, sf_dir, "documents"), "doc_id", "text", _CLS_WEIGHTS
    )


@q(
    "q134_c4_page_filter",
    r"""
    WITH lined AS (
      SELECT doc_id,
             regexp_replace(text, '((\S+ ){4}\S+) ', '\1' || chr(10), 'g') AS txt
      FROM documents
    ),
    f AS (
      SELECT doc_id, txt,
             list_filter(string_split(txt, chr(10)),
                         x -> length(trim(x)) > 0
                              AND len(string_split_regex(trim(x), '\s+')) >= 5)
               AS kept_lines
      FROM lined
    )
    SELECT doc_id AS id,
           CASE WHEN NOT contains(lower(txt), 'vector') AND len(kept_lines) >= 1
                THEN array_to_string(kept_lines, chr(10)) ELSE '' END AS clean_text,
           CAST(len(kept_lines) AS BIGINT) AS n_kept,
           CAST(len(string_split(txt, chr(10))) - len(kept_lines) AS BIGINT)
             AS n_dropped,
           (NOT contains(lower(txt), 'vector') AND len(kept_lines) >= 1) AS kept
    FROM f
    """,
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style page cleaning (operators/web.py: c4_page_filter): the
    documents are re-lined five words per line, then line-level word-count
    filtering and a page-level bad-substring gate run as one map-only
    array-expression pass — the Raffel et al. 2020 cleaning recipe in a
    single scan (terminal-punctuation rule exercised in pytest; the
    synthetic corpus has no punctuation)."""
    from .operators.web import c4_page_filter

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace(F.col("text"), r"((\S+ ){4}\S+) ", "$1\n")
    )
    return c4_page_filter(
        docs, "doc_id", "text",
        min_words_per_line=5, require_terminal_punct=False,
        bad_substrings=("vector",),
    )


@q(
    "q135_sampled_quantiles",
    """
    WITH s AS (
      SELECT o_orderpriority, o_totalprice FROM orders
      WHERE CAST('0x' || substr(md5('0|' || CAST(o_orderkey AS VARCHAR)), 1, 13)
                 AS UBIGINT)::DOUBLE / 4503599627370496.0 < 0.2
    )
    SELECT o_orderpriority AS grp,
           round(quantile_disc(o_totalprice, 0.5), 4) AS p_0_5,
           round(quantile_disc(o_totalprice, 0.9), 4) AS p_0_9,
           count(*) AS n_sampled
    FROM s GROUP BY 1
    """,
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-then-exact quantile sketch (operators/profile.py:
    sampled_quantiles): deterministic md5 20% sample of orders, exact
    discrete percentiles of the sample per priority — the mergeable,
    RNG-free alternative to sorting 100 TB for a percentile (union of
    samples IS the sample of the union)."""
    from .operators.profile import sampled_quantiles

    out = sampled_quantiles(
        _t(spark, sf_dir, "orders"),
        ["o_orderpriority"], "o_totalprice", "o_orderkey",
        [0.5, 0.9], rate=0.2,
    )
    return out.withColumnRenamed("o_orderpriority", "grp")


@q(
    "q136_per_key_sample",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5('0|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-key sample (operators/clusters.py:
    per_key_sample): 5 reproducible 'random' documents per source via the
    md5-order window — per-group reservoir sampling without RNG state;
    reduce-side buffer is O(k) thanks to row_number partial top-k."""
    from .operators.clusters import per_key_sample

    return per_key_sample(
        _t(spark, sf_dir, "documents"), ["source"], "doc_id", 5
    ).select("doc_id", "source")


@q(
    "q137_quantile_bins",
    """
    SELECT o_orderpriority AS grp, o_orderkey, o_totalprice,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) - 1 AS bin
    FROM orders
    """,
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency discretization (operators/profile.py:
    quantile_bins): every order assigned its within-priority quartile via
    ntile — the skew-robust binning a fixed-width histogram can't give;
    one window shuffle, ties broken on the id for cross-engine
    determinism."""
    from .operators.profile import quantile_bins

    out = quantile_bins(
        _t(spark, sf_dir, "orders"),
        ["o_orderpriority"], "o_totalprice", 4, id_col="o_orderkey",
    )
    return out.withColumnRenamed("o_orderpriority", "grp")


@q(
    "q138_ohlc_bars",
    """
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           round(first(value ORDER BY ts, event_id), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(last(value ORDER BY ts, event_id), 4) AS close,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling bars (operators/events.py: ohlc_bars): per
    event-type hourly open/high/low/close/count in ONE groupBy —
    open/close via min_by/max_by over the deterministic (ts, id) order
    struct, all aggregates algebraic (map-side partials), no window."""
    from .operators.events import ohlc_bars

    ev = _events(spark, sf_dir)
    out = ohlc_bars(ev, ["event_type"], "ts", "value", "event_id", bucket="1 hour")
    return out.withColumn("bucket_start", _ts(F.col("bucket_start")))


@q(
    "q139_winsorize",
    """
    WITH bounds AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.05) AS lo,
             quantile_disc(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY 1
    )
    SELECT o_orderkey, o.o_orderpriority AS grp, o_totalprice,
           round(least(greatest(o_totalprice, lo), hi), 4)
             AS o_totalprice_winsorized
    FROM orders o JOIN bounds b ON o.o_orderpriority = b.o_orderpriority
    """,
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (operators/profile.py: winsorize): clamp
    order totals to the within-priority [5%, 95%] discrete percentiles —
    exact bounds from one tiny grouped aggregate broadcast back; the row
    pass is map-only."""
    from .operators.profile import winsorize

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    out = winsorize(o, ["o_orderpriority"], "o_totalprice", lo=0.05, hi=0.95)
    return out.withColumnRenamed("o_orderpriority", "grp")


@q(
    "q140_prefix_filter_join",
    r"""
    WITH t AS (
      SELECT p_partkey AS id,
             list_distinct(string_split_regex(lower(trim(p_name)), '\s+')) AS tk
      FROM part
    ),
    g AS (SELECT id, unnest(tk) AS tok FROM t),
    dfreq AS (SELECT tok, count(*) AS dfc FROM g GROUP BY 1),
    rk AS (
      SELECT id, g.tok,
             row_number() OVER (PARTITION BY id ORDER BY dfc, g.tok) AS rk
      FROM g JOIN dfreq USING (tok)
    ),
    sz AS (SELECT id, count(*) AS sz FROM g GROUP BY 1),
    pref AS (
      SELECT rk.id, tok FROM rk JOIN sz USING (id)
      WHERE rk <= sz - ceil(0.6 * sz) + 1
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM pref a JOIN pref b USING (tok) WHERE a.id < b.id
    ),
    inter AS (
      SELECT ga.id AS id_a, gb.id AS id_b, count(*) AS i
      FROM g ga JOIN g gb USING (tok) WHERE ga.id < gb.id GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(i::DOUBLE / (sa + sb - i), 6) AS jaccard
    FROM cand
    JOIN inter USING (id_a, id_b)
    JOIN (SELECT id AS id_a, sz AS sa FROM sz) USING (id_a)
    JOIN (SELECT id AS id_b, sz AS sb FROM sz) USING (id_b)
    WHERE round(i::DOUBLE / (sa + sb - i), 6) >= 0.6
    """,
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered similarity self-join (operators/dedup.py:
    prefix_filter_pairs): PPJoin-style exact-threshold token-Jaccard —
    candidates only where rare-token prefixes collide (no false
    negatives, unlike LSH), verified exactly.  Part names at
    threshold 0.6."""
    from .operators.dedup import prefix_filter_pairs

    return prefix_filter_pairs(
        _t(spark, sf_dir, "part"), "p_partkey", "p_name", threshold=0.6
    )


@q(
    "q141_rendezvous_assign",
    """
    SELECT doc_id,
           arg_max(node, md5(node || '|' || CAST(doc_id AS VARCHAR))) AS node
    FROM documents,
         (SELECT unnest(['node-a', 'node-b', 'node-c', 'node-d']) AS node) n
    GROUP BY doc_id
    """,
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous / highest-random-weight sharding (operators/clusters.py:
    rendezvous_assign): every document owned by the argmax-md5 node —
    topology changes move only the departed node's keys, the consistent-
    assignment property modulo sharding lacks.  Map-only."""
    from .operators.clusters import rendezvous_assign

    out = rendezvous_assign(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        ["node-a", "node-b", "node-c", "node-d"],
    )
    return out.select("doc_id", "node")


_MESSY_URL_SQL = (
    "(CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'http' ELSE 'ftp' END)"
    " || '://'"
    " || (CASE WHEN doc_id % 7 = 0 THEN upper('www.' || source || '-site.org')"
    "      ELSE 'www.' || source || '-site.org' END)"
    " || '/docs/' || doc_id"
    " || (CASE WHEN doc_id % 2 = 0"
    "      THEN '?utm_source=feed&ref=' || lang || '&utm_campaign=x'"
    "      ELSE '?ref=' || lang END)"
    " || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
)


def _messy_url_col():
    host = F.concat(F.lit("www."), F.col("source"), F.lit("-site.org"))
    return F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTPS"))
        .when(F.col("doc_id") % 3 == 1, F.lit("http"))
        .otherwise(F.lit("ftp")),
        F.lit("://"),
        F.when(F.col("doc_id") % 7 == 0, F.upper(host)).otherwise(host),
        F.lit("/docs/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed&ref="),
                F.col("lang"),
                F.lit("&utm_campaign=x"),
            ),
        ).otherwise(F.concat(F.lit("?ref="), F.col("lang"))),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@q(
    "q142_canonical_url",
    r"""
    WITH u AS (SELECT doc_id, """ + _MESSY_URL_SQL + r""" AS url FROM documents),
    c AS (
      SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nf FROM u
    ),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
        regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
        regexp_extract(nf, '\?(.*)$', 1) AS query
      FROM c
    ),
    kept AS (
      SELECT doc_id, url, scheme, host, path,
             array_to_string(
               list_filter(string_split(query, '&'),
                 p -> p <> '' AND NOT regexp_matches(p,
                        '^(utm_[^=]*|gclid|fbclid|msclkid|ref_src)=')),
               '&') AS qs
      FROM parts
    )
    SELECT doc_id AS id, url,
           scheme || '://' || host || path ||
           (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) AS canonical_url
    FROM kept
    """,
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (operators/web.py: canonical_url): crawl
    variants — tracking params, fragments, case-shifted hosts — collapse
    to one canonical string, the dedup key a web pipeline computes BEFORE
    exact dedup.  Map-only regexp/array expressions shared with the
    oracle."""
    from .operators.web import canonical_url

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _messy_url_col().alias("url")
    )
    return canonical_url(docs, "doc_id", "url")


@q(
    "q143_blocklist_filter",
    r"""
    WITH u AS (SELECT doc_id, source, """ + _MESSY_URL_SQL + r""" AS url
               FROM documents)
    SELECT doc_id, source FROM u
    WHERE lower(regexp_extract(
            lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)),
            '([^.]+\.[^.]+)$', 1))
          NOT IN ('src3-site.org', 'src7-site.org', 'src12-site.org')
    """,
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain blocklist filtering (operators/web.py: blocklist_filter):
    drop documents whose registered domain is listed (case-insensitive,
    so the case-shifted host variants still match) — the crawl-pipeline
    URL-filter stage as one map-only scan."""
    from .operators.web import blocklist_filter

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", _messy_url_col().alias("url")
    )
    return blocklist_filter(
        docs, "url", ["src3-site.org", "src7-site.org", "src12-site.org"]
    ).select("doc_id", "source")


@q(
    "q144_leakage_safe_split",
    f"""
    WITH RECURSIVE all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    reach(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    clusters AS (
      SELECT s AS id, least(s, min(d)) AS cluster_id FROM reach GROUP BY s
    ),
    labeled AS (
      SELECT a.doc_id, coalesce(c.cluster_id, a.doc_id) AS cluster_id
      FROM all_docs a LEFT JOIN clusters c ON a.doc_id = c.id
    )
    SELECT doc_id,
           cluster_id,
           CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
                AS UBIGINT)::BIGINT % 100 AS bucket,
           CASE WHEN CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
                     AS UBIGINT)::BIGINT % 100 < 80 THEN 'train'
                WHEN CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)
                     AS UBIGINT)::BIGINT % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM labeled
    """,
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split (operators/clusters.py: leakage_safe_split):
    LSH near-dup clusters first, hash split keyed on the CLUSTER id —
    eval twins of training documents cannot cross splits.  The
    composition that makes q59's components and q80's hash split an
    actual eval-hygiene guarantee."""
    from .operators.clusters import leakage_safe_split
    from .operators.dedup import lsh_candidate_pairs

    docs = _docs_plus_clones(spark, sf_dir)
    pairs = lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    return leakage_safe_split(docs, "doc_id", pairs)


@q(
    "q145_interval_overlap",
    """
    WITH iv AS (
      SELECT l_orderkey * 10 + l_linenumber AS id, l_suppkey,
             l_shipdate AS s,
             l_shipdate + to_days(CAST(l_quantity AS INTEGER) % 10 + 1) AS e
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE s_nationkey = 0
    )
    SELECT a.l_suppkey, a.id AS id_a, b.id AS id_b
    FROM iv a JOIN iv b
      ON a.l_suppkey = b.l_suppkey AND a.id < b.id
         AND a.s <= b.e AND b.s <= a.e
    """,
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval-overlap self-join (operators/temporal.py:
    interval_overlap_pairs): per-supplier shipping windows that
    intersect, found via week-bucket blocking + exact verify — the
    equi-join replacement for the nested-loop theta join the oracle
    (safely, at sf0.01) runs directly."""
    from .operators.temporal import interval_overlap_pairs

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    iv = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .filter("s_nationkey = 0")
        .select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
            "l_suppkey",
            F.col("l_shipdate").alias("s"),
            F.date_add(
                "l_shipdate", F.col("l_quantity").cast("int") % 10 + 1
            ).alias("e"),
        )
    )
    return interval_overlap_pairs(iv, "id", "s", "e", key_cols=["l_suppkey"])


@q(
    "q146_grouped_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT source, unnest(t) AS item
      FROM (SELECT source, {_TOKS} AS t FROM documents) s
    ),
    cells AS (
      SELECT source, j,
             CAST('0x' || substr(md5(j::VARCHAR || '|' || item), 1, 8) AS UBIGINT)
               % 256 AS b
      FROM toks, (SELECT unnest(range(0, 4)) AS j) r
    ),
    sketch AS (
      SELECT source, j, b, count(*) AS cnt FROM cells GROUP BY 1, 2, 3
    ),
    items AS (SELECT DISTINCT source, item FROM toks),
    icells AS (
      SELECT source, item, j,
             CAST('0x' || substr(md5(j::VARCHAR || '|' || item), 1, 8) AS UBIGINT)
               % 256 AS b
      FROM items, (SELECT unnest(range(0, 4)) AS j) r
    ),
    est AS (
      SELECT icells.source, item, min(cnt) AS est_count
      FROM icells JOIN sketch USING (source, j, b) GROUP BY 1, 2
    )
    SELECT source, item, est_count FROM (
      SELECT source, item, est_count,
             row_number() OVER (PARTITION BY source
                                ORDER BY est_count DESC, item) AS rk
      FROM est
    ) WHERE rk <= 3
    """,
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group heavy hitters (operators/sketches.py: cms_heavy_hitters
    with group_cols): top-3 tokens per source from ONE Count-Min sketch
    per group — state is |groups| x depth x width regardless of
    occurrence counts; the per-source hot-terms report of a crawl
    pipeline."""
    from .operators.sketches import cms_heavy_hitters
    from .operators.dedup import tokens_col

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    return cms_heavy_hitters(toks, "tok", group_cols=["source"], k=3)


@q(
    "q147_windowed_hll_users",
    """
    WITH h AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS grp,
             md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events WHERE user_id IS NOT NULL
    ),
    reg AS (
      SELECT grp,
             CAST('0x' || substr(hx, 1, 3) AS UBIGINT)::BIGINT AS bucket,
             max(CASE WHEN length(regexp_extract(substr(hx, 4, 13), '^(0*)', 1)) = 13
                 THEN 53
                 ELSE length(regexp_extract(substr(hx, 4, 13), '^(0*)', 1)) * 4
                      + (CASE WHEN CAST('0x' || substr(substr(hx, 4, 13),
                           length(regexp_extract(substr(hx, 4, 13), '^(0*)', 1)) + 1, 1)
                           AS UBIGINT)::BIGINT >= 8 THEN 0
                         WHEN CAST('0x' || substr(substr(hx, 4, 13),
                           length(regexp_extract(substr(hx, 4, 13), '^(0*)', 1)) + 1, 1)
                           AS UBIGINT)::BIGINT >= 4 THEN 1
                         WHEN CAST('0x' || substr(substr(hx, 4, 13),
                           length(regexp_extract(substr(hx, 4, 13), '^(0*)', 1)) + 1, 1)
                           AS UBIGINT)::BIGINT >= 2 THEN 2 ELSE 3 END) + 1 END) AS rho
      FROM h GROUP BY 1, 2
    ),
    agg AS (
      SELECT grp, sum(power(2.0, -rho)) AS z_used, count(*)::DOUBLE AS nreg
      FROM reg GROUP BY grp
    )
    SELECT grp,
           round(CASE WHEN (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                           / (z_used + (4096.0 - nreg)) <= 2.5 * 4096.0
                      AND 4096.0 - nreg > 0
                      THEN 4096.0 * ln(4096.0 / (4096.0 - nreg))
                      ELSE (0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0
                           / (z_used + (4096.0 - nreg)) END, 4) AS est_distinct
    FROM agg
    """,
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed distinct-user sketch (operators/sketches.py:
    hll_distinct grouped by the hour bucket): hourly unique-user curves
    from register state bounded at m=4096 per hour — the streaming-
    dashboard composition of q129's mergeable sketch (per-hour registers
    union and re-max across days)."""
    from .operators.sketches import hll_distinct

    ev = _events(spark, sf_dir)
    hourly = ev.filter(F.col("user_id").isNotNull()).select(
        _ts(F.date_trunc("hour", F.col("ts"))).alias("grp"), "user_id"
    )
    return hll_distinct(hourly, ["grp"], "user_id")


# ===========================================================================
# TPC-H completion suite (round 3): the remaining classic query shapes,
# adapted to the driver's column subset (no partsupp, no commit/receipt
# dates).  Each exercises a distinct plan pattern — EXISTS semi-join,
# scalar-subquery broadcast, correlated-aggregate decorrelation,
# disjunctive pushdown, anti-join, min_by argmin — expressed Spark-first
# so Catalyst picks broadcast/partial-agg physical strategies.
# ===========================================================================


@q(
    "q148_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS -> left-semi join): orders with at least one
    late-shipping lineitem, counted per priority.  The semi join carries
    only o_orderkey/o_orderdate through the shuffle and stops probing an
    order after the first match — no duplicate-then-distinct blowup."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "q149_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             extract('year' FROM l.l_shipdate)::BIGINT AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations): the nation filters
    push THROUGH the dimension joins to the fact scan sides — supplier
    and customer shrink to one nation each before touching lineitem, and
    both dims broadcast."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "q150_important_parts",
    """
    WITH rev AS (
      SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
      FROM lineitem GROUP BY l_partkey
    ),
    total AS (SELECT sum(value) AS total_value FROM rev)
    SELECT r.l_partkey AS partkey, round(r.value, 4) AS value
    FROM rev r, total t
    WHERE r.value > 0.00065 * t.total_value
    ORDER BY value DESC, partkey
    """,
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (scalar-subquery threshold): per-part revenue vs a
    global total.  The total is a 1-row aggregate broadcast into the
    filter — Spark decorrelates this as a cross join with a
    single-row build side, not a per-row subquery."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("__value")
    )
    total = rev.agg(F.sum("__value").alias("__total"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("__value") > 0.00065 * F.col("__total"))
        .select("partkey", F.round("__value", 4).alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


@q(
    "q151_custdist",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                           AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT join keeps
    zero-order customers; the join predicate (not a WHERE) preserves
    them.  Two cascaded aggregations, the second over at most
    |distinct counts| rows."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@q(
    "q152_promo_revenue",
    """
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue share): conditional aggregation over a
    broadcast part join; the one-month shipdate range prunes the
    lineitem scan before the join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(0.0))
                / F.sum(disc),
                4,
            ).alias("promo_revenue")
        )
    )


@q(
    "q153_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the max-revenue scalar subquery becomes a
    1-row broadcast joined back against the per-supplier aggregate —
    the aggregate is computed once and reused for both sides via an
    explicit reuse of the same frame (Spark plans an exchange reuse)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "q154_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (9, 14, 19, 23, 36, 45, 49, 3)
      AND p.p_type <> 'MEDIUM'
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (NOT IN -> left-anti join): distinct supplier count
    per part attribute triple, excluding "complaint" suppliers (negative
    balance).  The anti join broadcasts the tiny exclusion set; distinct
    count is a two-stage partial aggregation."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_size").isin(9, 14, 19, 23, 36, 45, 49, 3)
        & (F.col("p_type") != "MEDIUM")
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@q(
    "q155_small_qty_revenue",
    """
    SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN (SELECT l_partkey, 0.5 * avg(l_quantity) AS qty_cut
            FROM lineitem GROUP BY l_partkey) t
        ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'PROMO'
      AND l.l_quantity < t.qty_cut
    """,
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity revenue): the correlated per-part AVG
    decorrelates into a pre-aggregation joined back to the fact — the
    Spark-first rewrite of a correlated scalar subquery.  Both the part
    filter and the per-part cutoffs broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "PROMO")
    )
    cuts = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cuts), li.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@q(
    "q156_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
           round(o.o_totalprice, 4) AS totalprice,
           round(sum(l.l_quantity), 4) AS total_qty
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 180
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): the IN-subquery is a left-semi
    join against a HAVING aggregate on the same fact — big keys found
    once, then only their rows re-aggregated with the dimensions."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 180)
        .select(F.col("l_orderkey").alias("__big_ok"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(big, li.l_orderkey == F.col("__big_ok"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            _ts(F.col("o_orderdate")).alias("orderdate"),
            F.round(F.col("o_totalprice"), 4).alias("totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@q(
    "q157_disjunctive_pred",
    """
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_type = 'SMALL'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_type = 'MEDIUM' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_type = 'LARGE'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (disjunctive predicates): three OR'd brand/size/quantity
    branches evaluated after a single broadcast join — Catalyst extracts
    the common join key and keeps the disjunction as one post-join
    filter, scanning each table once."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_type") == "SMALL")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_type") == "MEDIUM")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_type") == "LARGE")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return j.filter(b1 | b2 | b3).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )


@q(
    "q158_excess_suppliers",
    """
    SELECT s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 190
    )
    ORDER BY s.s_name
    """,
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (nested IN chain -> cascaded semi joins): parts by
    name prefix -> their heavy shippers in one year -> supplier names.
    Every level shrinks before the next join; the part filter is a
    broadcast semi join into the fact scan."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 190)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


@q(
    "q159_waiting_orders",
    """
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ),
    win AS (
      SELECT l_orderkey, l_suppkey, supp_last,
             count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             max(supp_last) OVER (PARTITION BY l_orderkey) AS order_last
      FROM per_supp
    ),
    marked AS (
      SELECT *, sum(CASE WHEN supp_last = order_last THEN 1 ELSE 0 END)
                  OVER (PARTITION BY l_orderkey) AS n_latest
      FROM win
    )
    SELECT s.s_name, count(*) AS numwait
    FROM marked m JOIN supplier s ON m.l_suppkey = s.s_suppkey
    WHERE m.n_supp > 1 AND m.n_latest = 1 AND m.supp_last = m.order_last
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (sole-blame supplier): in multi-supplier orders,
    the one supplier whose last shipment is strictly latest.  The
    reference formulation is EXISTS+NOT EXISTS self-joins; here one
    aggregation plus windows over the SAME (l_orderkey) partitioning —
    a single shuffle serves the aggregate and all three windows."""
    li = _t(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_last")
    )
    w = Window.partitionBy("l_orderkey")
    marked = (
        per_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn("order_last", F.max("supp_last").over(w))
        .withColumn(
            "n_latest",
            F.sum(
                F.when(F.col("supp_last") == F.max("supp_last").over(w), 1).otherwise(0)
            ).over(w),
        )
        .filter(
            (F.col("n_supp") > 1)
            & (F.col("n_latest") == 1)
            & (F.col("supp_last") == F.col("order_last"))
        )
    )
    supp = _t(spark, sf_dir, "supplier")
    return (
        marked.join(F.broadcast(supp), marked.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@q(
    "q160_sales_opportunity",
    """
    SELECT c.c_nationkey AS nationkey, count(*) AS numcust,
           round(sum(c.c_acctbal), 4) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (sales opportunity): above-average-balance customers
    with no RECENT orders (every customer has some order at this data
    density).  The global-average scalar broadcasts into the filter;
    NOT EXISTS is a left-anti join against the recent-orders key set —
    the date filter prunes the orders scan before the anti join."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("nationkey")
    )


@q(
    "q161_min_cost_supplier",
    """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             round(sum(l_extendedprice) / sum(l_quantity), 4) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.n_name, u.unit_price,
             row_number() OVER (PARTITION BY p.p_partkey
                                ORDER BY u.unit_price, e.s_suppkey) AS rn
      FROM unit u
        JOIN eu e   ON u.l_suppkey = e.s_suppkey
        JOIN part p ON u.l_partkey = p.p_partkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey AS partkey, p_name, s_name,
           round(s_acctbal, 4) AS s_acctbal, n_name AS nation, unit_price
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal DESC, partkey
    LIMIT 25
    """,
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (argmin per part): cheapest EU supplier per
    STANDARD/size-15 part.  The correlated MIN becomes a row_number
    window over the per-(part,supplier) unit-price aggregate; region
    and nation collapse the supplier side before it broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 4).alias("unit_price")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_price", "s_suppkey")
    return (
        unit.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("p_partkey").alias("partkey"),
            "p_name",
            "s_name",
            F.round("s_acctbal", 4).alias("s_acctbal"),
            F.col("n_name").alias("nation"),
            "unit_price",
        )
        .orderBy(F.col("s_acctbal").desc(), "partkey")
        .limit(25)
    )


@q(
    "q162_late_priority_lines",
    """
    SELECT l.l_linestatus,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (late shipments by priority class): conditional
    counts after a fact-fact equi join; the year filter prunes the
    lineitem scan and the lateness predicate rides the join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ===========================================================================
# Sketch algebra / attribution / graph analytics (round 3)
# ===========================================================================


@q(
    "q163_kmv_overlap",
    """
    WITH d AS (
      SELECT DISTINCT event_type AS g, user_id AS it
      FROM events WHERE user_id IS NOT NULL
    ),
    h AS (
      SELECT g, CAST('0x' || substr(md5(it::VARCHAR), 1, 13) AS UBIGINT)::DOUBLE
                  / 4503599627370496.0 AS h
      FROM d
    ),
    t AS (
      SELECT g, h FROM (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM h
      ) WHERE rk <= 64
    ),
    gs AS (SELECT DISTINCT g FROM t),
    pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a JOIN gs b ON a.g < b.g),
    merged AS (
      SELECT ga, gb, h, max(in_a) AS ia, max(in_b) AS ib FROM (
        SELECT p.ga, p.gb, t.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN t ON t.g = p.ga
        UNION ALL
        SELECT p.ga, p.gb, t.h, 0, 1
        FROM pairs p JOIN t ON t.g = p.gb
      ) GROUP BY 1, 2, 3
    ),
    u AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk
        FROM merged
      ) WHERE rk <= 64
    )
    SELECT ga AS group_a, gb AS group_b,
           round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                 ELSE 63.0 / max(h) END, 4) AS union_est,
           round(sum(ia * ib)::DOUBLE / count(*), 4) AS jaccard,
           round(sum(ia * ib)::DOUBLE / count(*)
                 * CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                   ELSE 63.0 / max(h) END, 4) AS intersect_est
    FROM u GROUP BY 1, 2
    """,
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch set-algebra (operators/sketches.py: kmv_overlap):
    pairwise audience overlap between event types from k-minimum-value
    sketches — union/Jaccard/intersection estimated from |groups| x k
    sketch rows, never an |A| x |B| item join."""
    from .operators.sketches import kmv_overlap

    ev = _events(spark, sf_dir)
    return kmv_overlap(ev, "event_type", "user_id", k=64)


@q(
    "q164_attribution",
    """
    WITH tagged AS (
      SELECT event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view', 'signup')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY floor(epoch(ts))::BIGINT, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
      FROM events
    )
    SELECT coalesce(ch, 'direct') AS channel,
           count(*) AS n_conversions,
           round(sum(value), 4) AS attributed_value
    FROM tagged WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution (operators/events.py:
    attribute_conversions): each purchase credits the user's most recent
    preceding touch channel via one running window — no self-join, one
    shuffle on the user key."""
    from .operators.events import attribute_conversions

    ev = _events(spark, sf_dir)
    return attribute_conversions(
        ev,
        "user_id",
        "ts",
        "event_type",
        "value",
        "event_id",
        conversion_type="purchase",
        touch_types=["click", "view", "signup"],
        mode="last",
    ).orderBy("channel")


@q(
    "q165_triangle_count",
    """
    WITH pk AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM pk a JOIN pk b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
        JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    per AS (
      SELECT node, count(*) AS n_triangles FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ) GROUP BY 1
    )
    SELECT node, n_triangles FROM per
    ORDER BY n_triangles DESC, node LIMIT 15
    """,
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-oriented triangle counting (operators/graph.py:
    triangle_count) over the parts-bought-together graph: wedges
    generate from each triangle's lowest-degree corner, so hub nodes
    contribute no quadratic blowup; the closing edge is a plain
    equi-join."""
    from .operators.graph import triangle_count

    li = _t(spark, sf_dir, "lineitem")
    pk = li.select("l_orderkey", "l_partkey").distinct()
    a = pk.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = pk.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    edges = a.join(b, "ok").filter(F.col("src") < F.col("dst")).select("src", "dst")
    return triangle_count(edges, "src", "dst", top_n=15)


@q(
    "q166_curriculum_interleave",
    """
    WITH b AS (
      SELECT quantile_cont(n_chars, 0.25) AS b1,
             quantile_cont(n_chars, 0.50) AS b2,
             quantile_cont(n_chars, 0.75) AS b3
      FROM documents
    ),
    scored AS (
      SELECT d.doc_id, d.n_chars,
             1 + (d.n_chars > b.b1)::INT + (d.n_chars > b.b2)::INT
               + (d.n_chars > b.b3)::INT AS bucket
      FROM documents d CROSS JOIN b
    ),
    pos AS (
      SELECT doc_id, bucket,
             row_number() OVER (PARTITION BY bucket ORDER BY n_chars, doc_id)
               AS pos_in_bucket
      FROM scored
    )
    SELECT doc_id, bucket::BIGINT AS bucket, pos_in_bucket
    FROM pos
    ORDER BY pos_in_bucket, bucket, doc_id
    LIMIT 40
    """,
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering with difficulty interleaving: docs bucket into
    4 difficulty tiers by PRECOMPUTED quartile boundaries (here: length
    as the difficulty proxy), then the training order round-robins
    across tiers so every batch mixes easy and hard examples.

    Scale shape: the boundaries are a 1-row exact-percentile aggregate
    broadcast onto one corpus scan — bucketing is a projection, NOT a
    global ntile sort (which would funnel 100 TB through one window
    task); the only window partitions by bucket, and the interleave
    order (pos_in_bucket, bucket) needs no further shuffle."""
    d = _t(spark, sf_dir, "documents")
    bounds = d.agg(
        F.expr("percentile(n_chars, 0.25)").alias("__b1"),
        F.expr("percentile(n_chars, 0.50)").alias("__b2"),
        F.expr("percentile(n_chars, 0.75)").alias("__b3"),
    )
    bucket = (
        F.lit(1)
        + (F.col("n_chars") > F.col("__b1")).cast("int")
        + (F.col("n_chars") > F.col("__b2")).cast("int")
        + (F.col("n_chars") > F.col("__b3")).cast("int")
    )
    scored = d.crossJoin(F.broadcast(bounds)).select(
        "doc_id", "n_chars", bucket.cast("bigint").alias("bucket")
    )
    wp = Window.partitionBy("bucket").orderBy("n_chars", "doc_id")
    return (
        scored.select(
            "doc_id", "bucket", F.row_number().over(wp).alias("pos_in_bucket")
        )
        .orderBy("pos_in_bucket", "bucket", "doc_id")
        .limit(40)
    )


@q(
    "q167_balanced_sample",
    """
    WITH sizes AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ),
    tgt AS (SELECT min(n_docs) AS min_n FROM sizes),
    kept AS (
      SELECT d.lang,
             (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
               / 4294967296.0
              < t.min_n::DOUBLE / s.n_docs) AS keep
      FROM documents d
        JOIN sizes s USING (lang)
        CROSS JOIN tgt t
    )
    SELECT lang, count(*) AS n_docs, sum(keep::INT) AS n_kept
    FROM kept GROUP BY lang ORDER BY lang
    """,
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency language balancing: per-language keep
    probability min_size/size computed FROM the data (unlike q101's
    static epoch weights), applied as a deterministic md5-uniform
    Bernoulli per doc.  The size table is a tiny aggregate broadcast
    back onto the corpus — one scan, one broadcast join, no shuffle of
    document rows; the same plan balances a 100 TB corpus because the
    join key cardinality is |languages|."""
    d = _t(spark, sf_dir, "documents")
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    tgt = sizes.agg(F.min("__n").alias("__min_n"))
    unif = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    keep = unif < F.col("__min_n").cast("double") / F.col("__n")
    return (
        d.join(F.broadcast(sizes), "lang")
        .crossJoin(F.broadcast(tgt))
        .select("lang", keep.alias("__keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("__keep").cast("int")).alias("n_kept"),
        )
        .orderBy("lang")
    )


@q(
    "q168_association_rules",
    """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM baskets),
    item_supp AS (
      SELECT l_partkey, count(*) AS cnt FROM baskets GROUP BY l_partkey
    ),
    pair_supp AS (
      SELECT a.l_partkey AS ante, b.l_partkey AS cons, count(*) AS pair_cnt
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= 3
    )
    SELECT p.ante, p.cons, p.pair_cnt,
           round(p.pair_cnt::DOUBLE / n.n, 6) AS support,
           round(p.pair_cnt::DOUBLE / ia.cnt, 6) AS confidence,
           round((p.pair_cnt::DOUBLE / ia.cnt) / (ic.cnt::DOUBLE / n.n), 6) AS lift
    FROM pair_supp p
      JOIN item_supp ia ON ia.l_partkey = p.ante
      JOIN item_supp ic ON ic.l_partkey = p.cons
      CROSS JOIN n_orders n
    ORDER BY lift DESC, p.ante, p.cons
    LIMIT 25
    """,
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift) over
    order baskets — the frequent-pair half of Apriori, which is the part
    that matters at scale (higher orders prune from these pairs).

    Plan shape: one distinct on (basket, item), a self-join ON THE BASKET
    KEY (bounded per-basket fan-out, not item x item), an early HAVING
    that prunes rare pairs BEFORE the dimension joins, and the two
    item-support joins run against a frame of |items| rows that
    broadcasts.  The global order count is a 1-row broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("__n")
    )
    item_supp = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("ante"))
    b = baskets.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("cons"))
    pair_supp = (
        a.join(b, "ok")
        .filter(F.col("ante") != F.col("cons"))
        .groupBy("ante", "cons")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 3)
    )
    ia = item_supp.select(F.col("l_partkey").alias("ante"), F.col("cnt").alias("__ca"))
    ic = item_supp.select(F.col("l_partkey").alias("cons"), F.col("cnt").alias("__cc"))
    return (
        pair_supp.join(F.broadcast(ia), "ante")
        .join(F.broadcast(ic), "cons")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "ante",
            "cons",
            "pair_cnt",
            F.round(F.col("pair_cnt") / F.col("__n"), 6).alias("support"),
            F.round(F.col("pair_cnt") / F.col("__ca"), 6).alias("confidence"),
            F.round(
                (F.col("pair_cnt") / F.col("__ca")) / (F.col("__cc") / F.col("__n")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "ante", "cons")
        .limit(25)
    )


@q(
    "q169_psi_drift",
    """
    WITH ref AS (
      SELECT o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ),
    cur AS (
      SELECT o_totalprice FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ),
    b AS (
      SELECT quantile_cont(o_totalprice, 0.2) AS b1,
             quantile_cont(o_totalprice, 0.4) AS b2,
             quantile_cont(o_totalprice, 0.6) AS b3,
             quantile_cont(o_totalprice, 0.8) AS b4
      FROM ref
    ),
    rb AS (
      SELECT 1 + (o_totalprice > b1)::INT + (o_totalprice > b2)::INT
               + (o_totalprice > b3)::INT + (o_totalprice > b4)::INT AS bin,
             count(*) OVER () AS n_tot
      FROM ref CROSS JOIN b
    ),
    cb AS (
      SELECT 1 + (o_totalprice > b1)::INT + (o_totalprice > b2)::INT
               + (o_totalprice > b3)::INT + (o_totalprice > b4)::INT AS bin,
             count(*) OVER () AS n_tot
      FROM cur CROSS JOIN b
    ),
    rp AS (SELECT bin, count(*)::DOUBLE / max(n_tot) AS p FROM rb GROUP BY bin),
    cp AS (SELECT bin, count(*)::DOUBLE / max(n_tot) AS p FROM cb GROUP BY bin)
    SELECT rp.bin::BIGINT AS bin,
           round(rp.p, 6) AS ref_frac,
           round(cp.p, 6) AS cur_frac,
           round((cp.p - rp.p) * ln(cp.p / rp.p), 6) AS psi_term
    FROM rp JOIN cp USING (bin)
    ORDER BY bin
    """,
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift detection: bin the current
    period's feature by the REFERENCE period's quintile boundaries and
    report each bin's PSI contribution ((cur-ref)*ln(cur/ref); total
    > 0.2 conventionally flags drift).

    Scale shape: boundaries are a 1-row exact-percentile aggregate over
    the reference slice, broadcast onto single scans of each period;
    both histograms aggregate to 5 rows before the final join — no
    per-row shuffle anywhere, so the same plan monitors a 100 TB
    feature log per day."""
    orders = _t(spark, sf_dir, "orders")
    ref = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_totalprice")
    cur = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_totalprice")
    bounds = ref.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q})").alias(f"__b{i}")
            for i, q in enumerate([0.2, 0.4, 0.6, 0.8], start=1)
        ]
    )
    binx = (
        F.lit(1)
        + (F.col("o_totalprice") > F.col("__b1")).cast("int")
        + (F.col("o_totalprice") > F.col("__b2")).cast("int")
        + (F.col("o_totalprice") > F.col("__b3")).cast("int")
        + (F.col("o_totalprice") > F.col("__b4")).cast("int")
    )

    def hist(side: DataFrame, frac_name: str) -> DataFrame:
        binned = side.crossJoin(F.broadcast(bounds)).select(
            binx.cast("bigint").alias("bin")
        )
        tot = binned.agg(F.count(F.lit(1)).cast("double").alias("__tot"))
        return (
            binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("__c"))
            .crossJoin(F.broadcast(tot))
            .select("bin", (F.col("__c") / F.col("__tot")).alias(frac_name))
        )

    rp = hist(ref, "__rp")
    cp = hist(cur, "__cp")
    return (
        rp.join(cp, "bin")
        .select(
            "bin",
            F.round("__rp", 6).alias("ref_frac"),
            F.round("__cp", 6).alias("cur_frac"),
            F.round(
                (F.col("__cp") - F.col("__rp")) * F.log(F.col("__cp") / F.col("__rp")),
                6,
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )


@q(
    "q170_embedding_decontam",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    hp AS (
      SELECT p, i,
             CASE WHEN strpos('02468ace',
                              substr(md5(p::VARCHAR || '|' || (i - 1)::VARCHAR), 1, 1)) > 0
                  THEN 1.0 ELSE -1.0 END AS h
      FROM (SELECT unnest(range(0, 8)) AS p) pl,
           (SELECT unnest(range(1, 65)) AS i) dims
    ),
    bits AS (
      SELECT e.vec_id, hp.p,
             CASE WHEN sum(e.v * hp.h) >= 0 THEN '1' ELSE '0' END AS bit
      FROM e JOIN hp USING (i)
      GROUP BY e.vec_id, hp.p
    ),
    buckets AS (
      SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
      FROM bits GROUP BY vec_id
    ),
    eb AS (SELECT vec_id AS eval_id, bucket FROM buckets WHERE vec_id < 5),
    eprobe AS (
      SELECT eval_id, bucket FROM eb
      UNION
      SELECT eval_id,
             substr(bucket, 1, j - 1)
             || (CASE WHEN substr(bucket, j, 1) = '1' THEN '0' ELSE '1' END)
             || substr(bucket, j + 1, 8 - j) AS bucket
      FROM eb, (SELECT unnest(range(1, 9)) AS j) js
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cand AS (
      SELECT DISTINCT cb.vec_id AS cid, ep.eval_id AS eid
      FROM eprobe ep JOIN buckets cb USING (bucket)
      WHERE cb.vec_id >= 5
    ),
    dots AS (
      SELECT c.cid, c.eid, sum(ec.v * ee.v) AS dot
      FROM cand c
      JOIN e ec ON ec.vec_id = c.cid
      JOIN e ee ON ee.vec_id = c.eid AND ee.i = ec.i
      GROUP BY 1, 2
    ),
    hits AS (
      SELECT cid, eid, round(dot / (nc.nrm * ne.nrm), 6) AS cosine
      FROM dots JOIN norms nc ON cid = nc.vec_id
                JOIN norms ne ON eid = ne.vec_id
      WHERE round(dot / (nc.nrm * ne.nrm), 6) >= 0.25
    )
    SELECT cid::BIGINT AS vec_id,
           max(cosine) AS max_cosine,
           (SELECT h2.eid FROM hits h2 WHERE h2.cid = hits.cid
            ORDER BY h2.cosine DESC, h2.eid LIMIT 1)::BIGINT AS matched_eval_id,
           count(*) AS n_eval_hits
    FROM hits GROUP BY cid
    """,
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (operators/decontam.py:embedding_contamination): the semantic twin of
    q63's n-gram pass — corpus vectors within cosine 0.25 of any eval
    vector (vec_id < 5), candidates from broadcast LSH buckets with
    Hamming-1 multi-probe, one verdict row per contaminated id."""
    from .operators.decontam import embedding_contamination

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.filter(F.col("vec_id") >= 5)
    eval_set = emb.filter(F.col("vec_id") < 5)
    return embedding_contamination(
        corpus, eval_set, "vec_id", "embedding",
        threshold=0.25, planes=8, dim=64, probes=2, round_cosine=6,
    )


@q(
    "q171_pooled_embeddings",
    """
    WITH e AS (
      SELECT label, vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    m AS (
      SELECT label, i, avg(v) AS mv, count(*) AS n
      FROM e GROUP BY label, i
    ),
    nrm AS (SELECT label, sqrt(sum(mv * mv)) AS nr, max(n) AS n_vectors
            FROM m GROUP BY label)
    SELECT m.label::INT AS label,
           nrm.n_vectors::BIGINT AS n_vectors,
           list(round(m.mv / nrm.nr, 6) ORDER BY m.i) AS pooled
    FROM m JOIN nrm USING (label)
    GROUP BY m.label, nrm.n_vectors
    """,
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-to-document embedding pooling
    (operators/similarity.py:pool_embeddings): element-wise mean per
    label, L2-normalized — the (group, dim)-keyed aggregation that never
    buffers a group's vectors."""
    from .operators.similarity import pool_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    out = pool_embeddings(emb, "label", "embedding", normalize=True)
    return out.select(
        "label",
        "n_vectors",
        F.transform(F.col("pooled"), lambda v: F.round(v, 6)).alias("pooled"),
    )


@q(
    "q172_nucleus_select",
    """
    WITH scored AS (
      SELECT source, doc_id, n_chars::DOUBLE AS s,
             sum(n_chars::DOUBLE) OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(n_chars::DOUBLE) OVER (PARTITION BY source) AS tot,
             row_number() OVER (PARTITION BY source
                 ORDER BY n_chars DESC, doc_id)::BIGINT AS rank
      FROM documents
    )
    SELECT doc_id, source, rank, round(cum / tot, 6) AS cum_frac
    FROM scored
    WHERE (cum - s) < 0.8 * tot
    """,
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted top-p curation (operators/curation.py:nucleus_select):
    per source keep the highest-scoring prefix covering 80% of the
    group's total score mass — the adaptive alternative to fixed top-k."""
    from .operators.curation import nucleus_select

    docs = _t(spark, sf_dir, "documents")
    out = nucleus_select(docs, "source", "n_chars", "doc_id", p=0.8)
    return out.select(
        "doc_id", "source", "rank", F.round("cum_frac", 6).alias("cum_frac")
    )


@q(
    "q173_containment",
    f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents UNION ALL
      SELECT doc_id + 2000000 AS doc_id,
             substr(text, 1, (length(text) // 2)::INT) AS text
      FROM documents WHERE doc_id < 20
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(i::DOUBLE / sa.sz, 6) AS cont_a_in_b,
           round(i::DOUBLE / sb.sz, 6) AS cont_b_in_a
    FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE greatest(i::DOUBLE / sa.sz, i::DOUBLE / sb.sz) >= 0.9
    """,
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-subset detection (operators/dedup.py:containment_pairs):
    directed n-gram containment over documents plus half-length
    truncations of the first 20 — the prefix copies score containment
    ~1 on the short side where Jaccard would sit near 0.5."""
    from .operators.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    halves = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.substring(
            F.col("text"), 1, F.floor(F.length("text") / 2).cast("int")
        ).alias("text"),
    )
    out = containment_pairs(
        docs.union(halves), "doc_id", "text", threshold=0.9
    )
    return out.select(
        "id_a",
        "id_b",
        F.round("cont_a_in_b", 6).alias("cont_a_in_b"),
        F.round("cont_b_in_a", 6).alias("cont_b_in_a"),
    )


_BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("e", "s"), ("o", "r"), ("e", "n"),
    ("an", "d"), ("in", "g"), ("a", "t"), ("o", "u"), ("s", "t"),
    ("e", "d"),
]

_BPE_MERGES_SQL = ", ".join(
    f"({i}, '{a}', '{b}')" for i, (a, b) in enumerate(_BPE_MERGES)
)


@q(
    "q174_bpe_encode",
    f"""
    WITH RECURSIVE
    merges(rank, a, b) AS (VALUES {_BPE_MERGES_SQL}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    spine AS (
      SELECT doc_id, i AS pos, t[i+1] AS w
      FROM toks, unnest(range(len(t))) AS u(i)
    ),
    words AS (SELECT DISTINCT w FROM spine),
    enc AS (
      SELECT w, 0 AS rank, regexp_extract_all(w, '.') AS toks FROM words
      UNION ALL
      SELECT w,
        CASE WHEN pos IS NULL THEN rank + 1 ELSE rank END,
        CASE WHEN pos IS NULL THEN toks
             ELSE toks[1:pos-1] || [toks[pos] || toks[pos+1]] || toks[pos+2:]
        END
      FROM (
        SELECT e.w, e.rank, e.toks,
          list_min(list_filter(
            list_transform(e.toks, (x, i) -> i),
            i -> i < len(e.toks) AND e.toks[i] = m.a AND e.toks[i+1] = m.b
          )) AS pos
        FROM enc e JOIN merges m ON m.rank = e.rank
      )
      WHERE rank <= (SELECT max(rank) FROM merges)
    ),
    final_enc AS (
      SELECT w, toks FROM enc
      WHERE rank = (SELECT max(rank) + 1 FROM merges)
    ),
    joined AS (
      SELECT s.doc_id, s.pos, f.toks
      FROM spine s JOIN final_enc f ON s.w = f.w
    ),
    assembled AS (
      SELECT doc_id,
             flatten(list(toks ORDER BY pos)) AS bpe_tokens
      FROM joined GROUP BY doc_id
    )
    SELECT doc_id, bpe_tokens, len(bpe_tokens)::BIGINT AS n_bpe
    FROM assembled
    """,
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenization (operators/text.py:bpe_encode): apply a
    rank-ordered merge table to every document via the distinct-word
    encode-once join; the merge loop is a Catalyst nested fold, no
    Python.  Train/apply twin of q119 (bpe_merge_candidates)."""
    from .operators.text import bpe_encode

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe_encode(docs, "doc_id", "text", _BPE_MERGES)


@q(
    "q175_phash_near_dup",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS phash
      FROM all_docs
    ),
    bands AS (
      SELECT doc_id, phash, b, (phash >> (b * 15)) & 32767 AS bv
      FROM h, unnest([0, 1, 2, 3]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
             l.phash AS ha, r.phash AS hb
      FROM bands l
      JOIN bands r ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(ha, hb))::INT AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    """,
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup on REAL bytes (round 3 de-stub):
    blocks-rendered PNGs -> perceptual_hash(method='ahash',
    decode_stub=False) — actual PNG decode, luma, 8x8 box resize,
    threshold (operators/imagecodec.py) -> pigeonhole-banded Hamming
    equi-join.  The decoded-pixel hash equals the md5 prefix by
    construction (lossless PNG + exact box means), so the oracle is
    codec-free.  Exact clones surface at hamming 0; the banded join,
    not all-pairs, is the scale path.  (q204 is the DCT-phash twin.)"""
    from .operators.multimodal import (
        generate_images,
        hamming_near_dup,
        perceptual_hash,
    )

    docs = _docs_plus_clones(spark, sf_dir)
    imgs = generate_images(docs, "doc_id", "text", style="blocks")
    hashes = perceptual_hash(imgs, "id", decode_stub=False, method="ahash")
    return hamming_near_dup(hashes, "id", "phash").select(
        "id_a", "id_b", "hamming"
    )


@q(
    "q176_simhash_near_dup",
    f"""
    WITH all_docs AS (
      SELECT doc_id, text FROM documents UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' zzz' AS text
      FROM documents WHERE doc_id < 20
    ),
    toks AS (SELECT doc_id, unnest(t) AS tok FROM (SELECT doc_id, {_TOKS} AS t FROM all_docs) s(doc_id, t)),
    h AS (SELECT doc_id, md5(tok) AS hex FROM toks),
    bits AS (
      SELECT doc_id, b,
             instr('0123456789abcdef', substr(hex, (b // 4) + 1, 1)) - 1 AS nib
      FROM h, (SELECT unnest(range(0, 32)) AS b) r
    ),
    summed AS (
      SELECT doc_id, b,
             sum((floor(nib / power(2, 3 - b % 4))::INT % 2) * 2 - 1) AS s
      FROM bits GROUP BY doc_id, b
    ),
    sim AS (
      SELECT doc_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY b) AS sh
      FROM summed GROUP BY doc_id
    ),
    v AS (
      SELECT doc_id,
             list_sum([CASE WHEN sh[i] = '1' THEN (1::BIGINT << (32 - i))
                       ELSE 0::BIGINT END for i in range(1, 33)]) AS hv
      FROM sim
    ),
    bands AS (
      SELECT doc_id, hv, b, (hv >> (b * 8)) & 255 AS bv
      FROM v, unnest([0, 1, 2, 3]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
             l.hv AS ha, r.hv AS hb
      FROM bands l
      JOIN bands r ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(ha, hb))::INT AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    """,
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text near-dup at bounded Hamming distance: SimHash (q30's map-only
    operator) composed with the pigeonhole-banded Hamming join
    (operators/multimodal.py:hamming_near_dup).  Exact clones land at
    hamming 0; one-token-appended perturbations land within a few bits —
    the banded equi-join finds both without all-pairs comparison."""
    from .operators.dedup import simhash
    from .operators.multimodal import hamming_near_dup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    perturbed = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    sh = simhash(docs.union(clones).union(perturbed), "doc_id", "text", bits=32)
    hashes = sh.select(
        "doc_id", F.conv("simhash", 2, 10).cast("bigint").alias("hv")
    )
    return hamming_near_dup(
        hashes, "doc_id", "hv", bits=32, bands=4, max_hamming=3
    ).select("id_a", "id_b", "hamming")


@q(
    "q177_duplicate_spans",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    toks AS (
      SELECT doc_id, t FROM (SELECT doc_id, {_TOKS} AS t FROM all_docs) s
      WHERE len(t) >= 8
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             md5(array_to_string(t[i+1:i+8], ' ')) AS d
      FROM toks, unnest(range(len(t) - 7)) AS u(i)
    ),
    dup AS (
      SELECT d FROM grams GROUP BY d HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (d)),
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos > lag(pos) OVER w + 8 THEN 1 ELSE 0 END AS nw
      FROM kept
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM flagged
    )
    SELECT doc_id, min(pos) AS start_tok, max(pos) + 7 AS end_tok,
           max(pos) + 7 - min(pos) + 1 AS span_tokens
    FROM islands GROUP BY doc_id, isl
    """,
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup spans (operators/dedup.py:duplicate_spans):
    cross-document duplicated 8-gram positions merged into maximal spans
    per document — full-document spans surface on the exact clones,
    shared boilerplate surfaces as partial spans."""
    from .operators.dedup import duplicate_spans

    return duplicate_spans(
        _docs_plus_clones(spark, sf_dir), "doc_id", "text", n=8, min_docs=2
    )


@q(
    "q178_mutual_nn",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT l.vec_id AS left_id, r.vec_id AS right_id, sum(l.v * r.v) AS dot
      FROM (SELECT * FROM e WHERE vec_id % 2 = 0) l
      JOIN (SELECT * FROM e WHERE vec_id % 2 = 1) r USING (i)
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT left_id, right_id, dot / (nl.nrm * nr.nrm) AS c
      FROM dots JOIN norms nl ON left_id = nl.vec_id
                JOIN norms nr ON right_id = nr.vec_id
    ),
    ranked AS (
      SELECT left_id, right_id, c,
             row_number() OVER (PARTITION BY left_id
                                ORDER BY c DESC, right_id) AS rl,
             row_number() OVER (PARTITION BY right_id
                                ORDER BY c DESC, left_id) AS rr
      FROM scored
    )
    SELECT left_id, right_id, round(c, 6) AS cosine
    FROM ranked WHERE rl = 1 AND rr = 1
    """,
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual nearest neighbors (operators/similarity.py:mutual_nn):
    bitext-mining rule over an even/odd split of the embeddings table —
    keep (a, b) iff each is the other's cosine top-1.  Brute-force
    baseline here; the candidates= parameter takes LSH/IVF buckets at
    scale."""
    from .operators.similarity import mutual_nn

    emb = _t(spark, sf_dir, "embeddings")
    out = mutual_nn(
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    )
    return out.select("left_id", "right_id", F.round("cosine", 6).alias("cosine"))


@q(
    "q179_distribution_match",
    """
    WITH b AS (
      SELECT quantile_cont(n_chars, 0.25) AS b1,
             quantile_cont(n_chars, 0.50) AS b2,
             quantile_cont(n_chars, 0.75) AS b3
      FROM documents WHERE source = 'src0'
    ),
    bucketed AS (
      SELECT d.doc_id AS id, d.source AS "group", d.n_chars AS value,
             (1 + (d.n_chars > b.b1)::INT + (d.n_chars > b.b2)::INT
                + (d.n_chars > b.b3)::INT)::BIGINT AS bucket
      FROM documents d CROSS JOIN b
    ),
    counts AS (
      SELECT "group", bucket, count(*) AS n FROM bucketed GROUP BY 1, 2
    ),
    fracs AS (
      SELECT "group", bucket,
             n::DOUBLE / sum(n) OVER (PARTITION BY "group") AS frac
      FROM counts
    ),
    ratios AS (
      SELECT f."group", f.bucket,
             coalesce(r.frac, 0) / f.frac AS ratio
      FROM fracs f
      LEFT JOIN (SELECT bucket, frac FROM fracs WHERE "group" = 'src0') r
        USING (bucket)
    ),
    keep AS (
      SELECT "group", bucket,
             CASE WHEN "group" = 'src0' THEN 1.0
                  ELSE ratio / max(ratio) OVER (PARTITION BY "group") END
               AS keep_p
      FROM ratios
    )
    SELECT b.id, b."group", b.value, b.bucket, round(k.keep_p, 6) AS keep_p
    FROM bucketed b JOIN keep k USING ("group", bucket)
    WHERE ('0x' || substr(md5('dmr|' || b.id), 1, 8))::BIGINT / 4294967296.0
          < k.keep_p
    """,
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-matching resample (operators/clusters.py:
    distribution_match_resample): every source's n_chars profile is
    bucket-wise downsampled toward src0's quartile shape; boundaries are
    a 1-row broadcast aggregate, selection is the salted-md5 uniform."""
    from .operators.clusters import distribution_match_resample

    return distribution_match_resample(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "n_chars",
        "source",
        "src0",
        buckets=4,
    )


@q(
    "q180_k_anonymity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment,
             count(*) AS group_size,
             count(DISTINCT c_acctbal > 0) AS distinct_sensitive
      FROM customer GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, group_size,
           distinct_sensitive::BIGINT AS distinct_sensitive,
           CASE WHEN group_size < 40 AND distinct_sensitive < 2 THEN 'k+l'
                WHEN group_size < 40 THEN 'k'
                ELSE 'l' END AS violation
    FROM g WHERE group_size < 40 OR distinct_sensitive < 2
    """,
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit (operators/rules.py:k_anonymity_audit): customer
    rows grouped by (nation, market segment) quasi-identifiers; groups
    under k=40 members or with fewer than 2 distinct values of the
    sensitive attribute (account-balance sign) are flagged."""
    from .operators.rules import k_anonymity_audit

    cust = _t(spark, sf_dir, "customer").withColumn(
        "__sens", F.col("c_acctbal") > 0
    )
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], 40,
        sensitive_col="__sens", l=2,
    )


@q(
    "q181_bpe_pack_pipeline",
    f"""
    WITH RECURSIVE
    merges(rank, a, b) AS (VALUES {_BPE_MERGES_SQL}),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    spine AS (
      SELECT doc_id, i AS pos, t[i+1] AS w
      FROM toks, unnest(range(len(t))) AS u(i)
    ),
    words AS (SELECT DISTINCT w FROM spine),
    enc AS (
      SELECT w, 0 AS rank, regexp_extract_all(w, '.') AS toks FROM words
      UNION ALL
      SELECT w,
        CASE WHEN pos IS NULL THEN rank + 1 ELSE rank END,
        CASE WHEN pos IS NULL THEN toks
             ELSE toks[1:pos-1] || [toks[pos] || toks[pos+1]] || toks[pos+2:]
        END
      FROM (
        SELECT e.w, e.rank, e.toks,
          list_min(list_filter(
            list_transform(e.toks, (x, i) -> i),
            i -> i < len(e.toks) AND e.toks[i] = m.a AND e.toks[i+1] = m.b
          )) AS pos
        FROM enc e JOIN merges m ON m.rank = e.rank
      )
      WHERE rank <= (SELECT max(rank) FROM merges)
    ),
    final_enc AS (
      SELECT w, len(toks) AS wn FROM enc
      WHERE rank = (SELECT max(rank) + 1 FROM merges)
    ),
    sized AS (
      SELECT s.doc_id, s.doc_id % 8 AS bucket, sum(f.wn)::BIGINT AS n
      FROM spine s JOIN final_enc f ON s.w = f.w
      GROUP BY 1, 2
    ),
    ord AS (
      SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
      FROM sized
    ),
    packed AS (
      SELECT bucket, rn, doc_id, n, 0::BIGINT AS seq, n AS cum
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.doc_id, o.n,
             CASE WHEN p.cum + o.n <= 128 THEN p.seq ELSE p.seq + 1 END,
             CASE WHEN p.cum + o.n <= 128 THEN p.cum + o.n ELSE o.n END
      FROM packed p JOIN ord o ON o.bucket = p.bucket AND o.rn = p.rn + 1
    )
    SELECT bucket * 1000000000 + seq AS pack_id, bucket,
           count(*) AS n_docs, sum(n) AS n_tokens,
           list(doc_id ORDER BY doc_id) AS doc_ids
    FROM packed GROUP BY 1, 2
    """,
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tokenize-and-pack: BPE-encode every document with the
    q174 merge table (operators/text.py:bpe_encode), then greedily pack
    the resulting per-document BPE token counts into 128-token training
    packs (operators/packing.py:pack_counts) — the tokenizer-apply and
    example-packing stages of an LLM data pipeline as one DAG."""
    from .operators.packing import pack_counts
    from .operators.text import bpe_encode

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    encoded = bpe_encode(docs, "doc_id", "text", _BPE_MERGES)
    return pack_counts(
        encoded, "doc_id", "n_bpe", capacity=128, num_buckets=8
    )


@q(
    "q182_grouping_sets",
    """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price,
           grouping(o_orderpriority)::INT AS g_prio,
           grouping(o_orderstatus)::INT AS g_status
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form behind cube/rollup (q38/q52):
    four explicit aggregation granularities in ONE pass over orders
    (Spark expands to a single Expand + hash aggregate, not four scans),
    with grouping() flags disambiguating NULL-as-total from NULL data."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__q182_orders")
    return spark.sql("""
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               CAST(grouping(o_orderstatus) AS INT) AS g_status
        FROM __q182_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
    """)


@q(
    "q183_window_functions",
    """
    SELECT c_custkey,
           c_mktsegment,
           round(c_acctbal, 2) AS bal,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           round(first_value(c_acctbal) OVER w, 2) AS seg_min_bal,
           round(nth_value(c_acctbal, 3) OVER
                 (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS third_bal,
           round(lag(c_acctbal, 2, -1.0) OVER w, 2) AS lag2_bal,
           round(lead(c_acctbal, 1, -1.0) OVER w, 2) AS next_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    QUALIFY row_number() OVER w <= 50
    """,
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window-function surface: percent_rank / cume_dist /
    first_value / nth_value (explicit ROWS frame) / lag+lead with
    defaults, all sharing ONE window shuffle per segment; deterministic
    total order via the (acctbal, custkey) tie-break."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = c.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("bal"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.first_value(F.col("c_acctbal")).over(w), 2).alias("seg_min_bal"),
        F.round(F.nth_value(F.col("c_acctbal"), 3).over(wf), 2).alias("third_bal"),
        F.round(F.lag("c_acctbal", 2, -1.0).over(w), 2).alias("lag2_bal"),
        F.round(F.lead("c_acctbal", 1, -1.0).over(w), 2).alias("next_bal"),
        F.row_number().over(w).alias("__rn"),
    )
    return out.filter(F.col("__rn") <= 50).drop("__rn")


@q(
    "q184_calendar_functions",
    """
    SELECT o_orderkey,
           o_orderdate,
           date_trunc('week', o_orderdate)::DATE AS week_start,
           date_trunc('quarter', o_orderdate)::DATE AS quarter_start,
           last_day(o_orderdate) AS month_end,
           dayofweek(o_orderdate)::INT AS dow,
           dayofyear(o_orderdate)::INT AS doy,
           weekofyear(o_orderdate)::INT AS woy,
           (o_orderdate + INTERVAL 3 MONTH)::DATE AS plus_3m,
           date_diff('day', o_orderdate, DATE '1998-12-31')::INT
             AS days_to_end
    FROM orders WHERE o_orderkey < 1000
    """,
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar/date function surface over orders: week/quarter
    truncation, month end, day-of-week/year, ISO week, month
    arithmetic, day difference — all codegen'd projections on one scan.
    DuckDB's dayofweek is 0=Sunday..6; Spark's dayofweek is 1=Sunday..7,
    aligned via -1."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("week_start"),
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias("quarter_start"),
        F.last_day("o_orderdate").alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.weekofyear("o_orderdate").cast("int").alias("woy"),
        F.add_months("o_orderdate", 3).alias("plus_3m"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate"))
        .cast("int")
        .alias("days_to_end"),
    )


@q(
    "q185_statistical_aggregates",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4)
             AS intercept,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q185(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface per return flag: sample
    stddev/variance, covariance, correlation, and least-squares
    regression slope/intercept/count — one hash aggregate with partial
    (map-side) combine; every function is algebraic, so the shuffle
    carries O(groups) state."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@q(
    "q186_lateral_topn",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) o
    WHERE c.c_custkey < 200
    """,
)
def q186(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-2 orders per customer expressed
    as the SQL-standard lateral form; Catalyst decorrelates it into the
    same join + per-key window plan a hand-written ranking would produce
    (no per-customer re-execution)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__q186_c")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__q186_o")
    return spark.sql("""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM __q186_c c,
        LATERAL (
          SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
          FROM __q186_o
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) o
        WHERE c.c_custkey < 200
    """)


@q(
    "q187_higher_order_functions",
    """
    WITH lines AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             round(l_extendedprice, 2) AS p
      FROM lineitem WHERE l_orderkey < 400
    ),
    per_order AS (
      -- one ordered collect with a full tie-break (duplicate line
      -- numbers exist), projected into aligned parallel arrays
      SELECT l_orderkey,
             list(l_quantity ORDER BY l_linenumber, l_quantity, p) AS qtys,
             list(p ORDER BY l_linenumber, l_quantity, p) AS prices
      FROM lines GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           list_transform(qtys, q -> q * 2) AS doubled,
           list_filter(qtys, q -> q > 25) AS big_qtys,
           list_sum(qtys) AS total_qty,
           len(list_filter(qtys, q -> q > 25)) > 0 AS any_big,
           len(list_filter(qtys, q -> q > 0)) = len(qtys) AS all_positive,
           list_transform(list_zip(qtys, prices),
                          t -> round(t[1] * t[2], 2)) AS line_amounts
    FROM per_order
    """,
)
def q187(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function surface: transform / filter /
    aggregate (sum) / exists / forall / zip_with, applied per order with
    a deterministic line order — the codegen'd array algebra every
    array-typed pipeline column relies on."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    # one ordered collect with a full tie-break (duplicate line numbers
    # exist in the synthetic data), projected into aligned arrays
    per = (
        l.groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "l_linenumber",
                        "l_quantity",
                        F.round("l_extendedprice", 2).alias("p"),
                    )
                )
            ).alias("__lines")
        )
        .select(
            "l_orderkey",
            F.transform("__lines", lambda s: s["l_quantity"]).alias("qtys"),
            F.transform("__lines", lambda s: s["p"]).alias("prices"),
        )
    )
    return per.select(
        "l_orderkey",
        F.transform("qtys", lambda q: q * 2).alias("doubled"),
        F.filter("qtys", lambda q: q > 25).alias("big_qtys"),
        F.aggregate("qtys", F.lit(0.0), lambda a, q: a + q).alias("total_qty"),
        F.exists("qtys", lambda q: q > 25).alias("any_big"),
        F.forall("qtys", lambda q: q > 0).alias("all_positive"),
        F.zip_with(
            "qtys", "prices", lambda q, p: F.round(q * p, 2)
        ).alias("line_amounts"),
    )


@q(
    "q188_unpivot_amounts",
    """
    SELECT l_orderkey, l_linenumber, component, round(amount, 2) AS amount
    FROM (
      SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
      FROM lineitem WHERE l_orderkey < 300
    )
    UNPIVOT (amount FOR component IN (l_extendedprice, l_discount, l_tax))
    """,
)
def q188(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT (DataFrame.unpivot / melt): the three money
    components of each line item as (component, amount) rows — a
    projection-time Expand, one scan, no shuffle."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    out = l.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "component",
        "amount",
    )
    return out.select(
        "l_orderkey", "l_linenumber", "component",
        F.round("amount", 2).alias("amount"),
    )


@q(
    "q189_winnow_fingerprints",
    f"""
    WITH toks AS (
      SELECT doc_id, t FROM (SELECT doc_id, {{toks}} AS t FROM documents) s
      WHERE len(t) >= 7
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             ('0x' || substr(md5(array_to_string(t[i+1:i+4], ' ')), 1, 8))::BIGINT
               % 2147483647 AS h
      FROM toks, unnest(range(len(t) - 3)) AS u(i)
    ),
    counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
    anchors AS (
      SELECT g.doc_id, g.pos AS i
      FROM grams g JOIN counts c USING (doc_id)
      WHERE g.pos <= c.n - 4
    ),
    wins AS (
      SELECT a.doc_id, a.i,
             arg_min(b.pos, b.h * 4 + (a.i + 3 - b.pos))::INT AS pos,
             min(b.h) AS fp
      FROM anchors a
      JOIN grams b ON b.doc_id = a.doc_id AND b.pos BETWEEN a.i AND a.i + 3
      GROUP BY 1, 2
    )
    SELECT DISTINCT doc_id, pos, fp FROM wins
    """.replace("{toks}", _TOKS),
)
def q189(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators/dedup.py:winnow_fingerprints,
    Schleimer et al. 2003): rightmost-minimum 4-gram hash per sliding
    window of 4 — position-robust overlap fingerprints, map-only on the
    Spark side; the oracle replays the window scan as a bounded
    range self-join with a composite arg_min tie-break."""
    from .operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=4, window=4
    )


@q(
    "q190_dedup_against_corpus",
    f"""
    WITH new_docs AS (
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' zzz' AS text
      FROM documents WHERE doc_id < 20
    ),
    ref_digests AS (SELECT DISTINCT md5(text) AS d FROM documents),
    exact AS (
      SELECT n.doc_id, r.d IS NOT NULL AS exact_dup
      FROM (SELECT doc_id, md5(text) AS d FROM new_docs) n
      LEFT JOIN ref_digests r USING (d)
    ),
    ref_toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    ref_sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM ref_toks),
    ref_mins AS (
      SELECT doc_id, {_MINHASH_MINS8} FROM ref_sh GROUP BY doc_id
    ),
    ref_bands AS (
      SELECT DISTINCT b, d FROM (
        SELECT 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM ref_mins UNION ALL
        SELECT 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM ref_mins UNION ALL
        SELECT 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM ref_mins UNION ALL
        SELECT 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM ref_mins
      )
    ),
    new_toks AS (SELECT doc_id, {_TOKS} AS t FROM new_docs),
    new_sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM new_toks),
    new_mins AS (
      SELECT doc_id, {_MINHASH_MINS8} FROM new_sh GROUP BY doc_id
    ),
    new_bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM new_mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM new_mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM new_mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM new_mins
    ),
    near AS (
      SELECT DISTINCT nb.doc_id
      FROM new_bands nb JOIN ref_bands rb ON nb.b = rb.b AND nb.d = rb.d
    )
    SELECT e.doc_id, e.exact_dup, near.doc_id IS NOT NULL AS near_dup
    FROM exact e LEFT JOIN near ON e.doc_id = near.doc_id
    """,
)
def q190(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus dedup (operators/dedup.py:dedup_against): a batch of
    exact clones and one-token perturbations checked against the full
    documents corpus — clones flag exact+near, perturbations flag near
    via shared LSH band buckets; joins carry only 32-byte digests."""
    from .operators.dedup import dedup_against

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    perturbed = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return dedup_against(
        clones.union(perturbed), docs, "doc_id", "text",
        num_hashes=8, bands=4,
    )


@q(
    "q191_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT {_TOKS} AS t FROM documents
    ),
    bigrams AS (
      SELECT t[i+1] AS w1, t[i+2] AS w2
      FROM (SELECT t FROM toks WHERE len(t) >= 2) s,
           unnest(range(len(t) - 1)) AS u(i)
    ),
    bg AS (
      SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2
      HAVING count(*) >= 5
    ),
    uni AS (
      SELECT unnest(t) AS w FROM toks
    ),
    uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
    n AS (SELECT count(*) AS n FROM bigrams)
    SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
           round(ln(c12::DOUBLE * n.n / (u1.c::DOUBLE * u2.c)), 6) AS pmi
    FROM bg
    JOIN uc u1 ON bg.w1 = u1.w
    JOIN uc u2 ON bg.w2 = u2.w
    CROSS JOIN n
    ORDER BY pmi DESC, w1, w2 LIMIT 50
    """,
)
def q191(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations (operators/text.py:pmi_collocations): adjacent
    word pairs beating chance co-occurrence over the documents corpus —
    bigram/unigram aggregations plus two count-attach joins, nothing
    collected."""
    from .operators.text import pmi_collocations

    return pmi_collocations(
        _t(spark, sf_dir, "documents"), "text", min_count=5, top_n=50
    )


def _rake_stops_sql() -> str:
    from .operators.text import RAKE_STOPWORDS

    return ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)


@q(
    "q192_rake_keyphrases",
    f"""
    WITH spine AS (
      SELECT doc_id, i AS pos, t[i+1] AS w,
             t[i+1] IN ({_rake_stops_sql()}) AS stop
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents) s,
           unnest(range(len(t))) AS u(i)
    ),
    isl AS (
      SELECT doc_id, pos, w, stop,
             sum(stop::INT) OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM spine
    ),
    phrases AS (
      SELECT doc_id, g,
             array_to_string(list(w ORDER BY pos), ' ') AS phrase,
             count(*) AS n_words
      FROM isl WHERE NOT stop
      GROUP BY doc_id, g
    ),
    members AS (
      SELECT phrase, n_words, unnest(string_split(phrase, ' ')) AS w
      FROM phrases
    ),
    wscore AS (
      SELECT w, sum(n_words)::DOUBLE / count(*) AS s FROM members GROUP BY w
    ),
    ptotal AS (
      SELECT m.phrase, sum(ws.s) AS total
      FROM members m JOIN wscore ws USING (w) GROUP BY m.phrase
    ),
    pfreq AS (
      SELECT phrase, n_words, count(*) AS freq
      FROM phrases GROUP BY phrase, n_words
    )
    SELECT p.phrase, p.n_words, p.freq,
           round(t.total / p.freq, 6) AS score
    FROM pfreq p JOIN ptotal t USING (phrase)
    ORDER BY score DESC, phrase LIMIT 50
    """,
)
def q192(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (operators/text.py:rake_keyphrases):
    stopword-delimited phrase islands scored by member-word
    degree/frequency — corpus top-50 phrases, all shuffles on word or
    phrase keys."""
    from .operators.text import rake_keyphrases

    return rake_keyphrases(
        _t(spark, sf_dir, "documents"), "doc_id", "text", top_n=50
    )


@q(
    "q193_textrank_keywords",
    f"""
    WITH spine AS (
      SELECT doc_id, i AS pos, t[i+1] AS w
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents) s,
           unnest(range(len(t))) AS u(i)
    ),
    kept AS (
      SELECT doc_id, pos, w,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
      FROM spine WHERE w NOT IN ({_rake_stops_sql()})
    ),
    adj AS (
      SELECT DISTINCT a.w AS src, b.w AS dst
      FROM kept a JOIN kept b
        ON a.doc_id = b.doc_id AND b.rn = a.rn + 1 AND a.w <> b.w
    ),
    edges AS (
      SELECT src, dst FROM adj UNION SELECT dst, src FROM adj
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src, count(*)::DOUBLE AS deg FROM edges GROUP BY src),
    pr0 AS (SELECT node, 1.0 AS pr FROM nodes),
    it1 AS (
      SELECT e.dst AS node, sum(p.pr / d.deg) AS inc
      FROM edges e JOIN pr0 p ON e.src = p.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    pr1 AS (
      SELECT n.node, (1 - 0.85) + 0.85 * COALESCE(i.inc, 0.0) AS pr
      FROM nodes n LEFT JOIN it1 i ON n.node = i.node
    ),
    it2 AS (
      SELECT e.dst AS node, sum(p.pr / d.deg) AS inc
      FROM edges e JOIN pr1 p ON e.src = p.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    pr2 AS (
      SELECT n.node, (1 - 0.85) + 0.85 * COALESCE(i.inc, 0.0) AS pr
      FROM nodes n LEFT JOIN it2 i ON n.node = i.node
    )
    SELECT node AS word, round(pr, 6) AS rank
    FROM pr2 ORDER BY rank DESC, word LIMIT 30
    """,
)
def q193(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (Mihalcea & Tarau 2004): PageRank over the
    stopword-filtered word co-occurrence graph (adjacent kept tokens,
    undirected) — composes operators/graph.py:pagerank with the text
    spine; corpus top-30 keywords."""
    from pyspark.sql import Window as W

    from .operators.graph import pagerank
    from .operators.text import RAKE_STOPWORDS

    from .operators.dedup import tokens_col

    spine = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos", "w"))
        .filter(~F.col("w").isin(RAKE_STOPWORDS))
    )
    kept = spine.withColumn(
        "rn", F.row_number().over(W.partitionBy("doc_id").orderBy("pos"))
    )
    a, b = kept.alias("a"), kept.alias("b")
    adj = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.rn") == F.col("a.rn") + 1)
            & (F.col("a.w") != F.col("b.w")),
        )
        .select(F.col("a.w").alias("src"), F.col("b.w").alias("dst"))
        .distinct()
    )
    edges = adj.union(adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    pr = pagerank(edges, "src", "dst", iterations=2)
    return (
        pr.select(F.col("node").alias("word"), "rank")
        .orderBy(F.col("rank").desc(), "word")
        .limit(30)
    )


@q(
    "q194_keyness_g2",
    f"""
    WITH words AS (
      SELECT unnest(t) AS w, lang = 'en' AS tgt
      FROM (SELECT {_TOKS} AS t, lang FROM documents) s
    ),
    counts AS (
      SELECT w, sum(tgt::INT)::BIGINT AS a, sum((NOT tgt)::INT)::BIGINT AS b
      FROM words GROUP BY w HAVING sum(tgt::INT) + sum((NOT tgt)::INT) >= 5
    ),
    totals AS (
      SELECT sum(tgt::INT)::BIGINT AS na, sum((NOT tgt)::INT)::BIGINT AS nb
      FROM words
    )
    SELECT w AS word, a, b,
           round(
             (CASE WHEN a::DOUBLE / na >= b::DOUBLE / nb THEN 1 ELSE -1 END) *
             2 * (
               CASE WHEN a > 0
                    THEN a * ln(a / (na * (a + b)::DOUBLE / (na + nb)))
                    ELSE 0 END +
               CASE WHEN b > 0
                    THEN b * ln(b / (nb * (a + b)::DOUBLE / (na + nb)))
                    ELSE 0 END
             ), 4) AS g2
    FROM counts CROSS JOIN totals
    ORDER BY abs(g2) DESC, word LIMIT 50
    """,
)
def q194(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning G2 keyness (operators/text.py:keyness_g2): words
    over/under-represented in the English subcorpus vs the rest — one
    conditional-sum word aggregation plus a broadcast total; signed by
    relative-rate direction."""
    from .operators.text import keyness_g2

    return keyness_g2(
        _t(spark, sf_dir, "documents"),
        "text",
        F.col("lang") == "en",
        min_count=5,
        top_n=50,
    )


@q(
    "q195_vocab_growth",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    words AS (SELECT doc_id, unnest(t) AS w FROM toks),
    first_seen AS (SELECT w, min(doc_id) AS fd FROM words GROUP BY w),
    doc_tokens AS (SELECT doc_id, count(*) AS n FROM words GROUP BY doc_id),
    marks AS (SELECT unnest([50, 100, 200, 300, 400, 500]) AS upto)
    SELECT m.upto,
           (SELECT sum(n) FROM doc_tokens WHERE doc_id < m.upto)::BIGINT
             AS tokens,
           (SELECT count(*) FROM first_seen WHERE fd < m.upto)::BIGINT
             AS types,
           round((SELECT count(*) FROM first_seen WHERE fd < m.upto)::DOUBLE
                 / (SELECT sum(n) FROM doc_tokens WHERE doc_id < m.upto),
                 6) AS ttr
    FROM marks m
    """,
)
def q195(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law): cumulative type and token
    counts at document checkpoints, computed WITHOUT any per-prefix
    rescan — each word aggregates to its first-occurrence document, each
    document to its token count, and the curve is a broadcast of six
    checkpoint marks against those two tiny aggregates."""
    from .operators.dedup import tokens_col

    words = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("w"))
    )
    first_seen = words.groupBy("w").agg(F.min("doc_id").alias("fd"))
    doc_tokens = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    marks = F.array(*[F.lit(x) for x in (50, 100, 200, 300, 400, 500)])
    mdf = words.sparkSession.range(1).select(
        F.explode(marks).alias("upto")
    )
    tok_counts = (
        mdf.join(doc_tokens, doc_tokens["doc_id"] < mdf["upto"])
        .groupBy("upto")
        .agg(F.sum("n").alias("tokens"))
    )
    type_counts = (
        mdf.join(first_seen, first_seen["fd"] < mdf["upto"])
        .groupBy("upto")
        .agg(F.count(F.lit(1)).alias("types"))
    )
    return (
        tok_counts.join(type_counts, "upto")
        .select(
            "upto",
            "tokens",
            "types",
            F.round(
                F.col("types").cast("double") / F.col("tokens"), 6
            ).alias("ttr"),
        )
    )


@q(
    "q196_zipf_slope",
    f"""
    WITH words AS (
      SELECT lang, unnest(t) AS w
      FROM (SELECT lang, {_TOKS} AS t FROM documents) s
    ),
    freqs AS (
      SELECT lang, w, count(*) AS c FROM words GROUP BY lang, w
    ),
    ranked AS (
      SELECT lang, c,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, w) AS r
      FROM freqs
    )
    SELECT lang,
           round(regr_slope(ln(c), ln(r)), 4) AS zipf_slope,
           round(regr_r2(ln(c), ln(r)), 4) AS r2,
           count(*) AS n_types
    FROM ranked GROUP BY lang
    """,
)
def q196(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent per language: regress log frequency on log rank
    over each language's word-frequency table — the power-law fit that
    flags degenerate subcorpora (templated or machine-generated text
    bends the slope).  One word aggregation, one per-language rank
    window, one regression aggregate."""
    from .operators.dedup import tokens_col

    words = (
        _t(spark, sf_dir, "documents")
        .select("lang", F.explode(tokens_col(F.col("text"))).alias("w"))
    )
    freqs = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(), "w")
    ranked = freqs.withColumn("r", F.row_number().over(w))
    return ranked.groupBy("lang").agg(
        F.round(F.regr_slope(F.log("c"), F.log("r")), 4).alias("zipf_slope"),
        F.round(F.regr_r2(F.log("c"), F.log("r")), 4).alias("r2"),
        F.count(F.lit(1)).alias("n_types"),
    )


@q(
    "q197_cdc_chunks",
    f"""
    WITH toks AS (
      SELECT doc_id, t FROM (SELECT doc_id, {_TOKS} AS t FROM documents) s
      WHERE len(t) > 0
    ),
    entries AS (
      SELECT doc_id, i AS pos, t[i+1] AS w,
             CASE WHEN i + 2 <= len(t)
                  THEN (('0x' || substr(md5(t[i+1] || ' ' || t[i+2]), 1, 8))::BIGINT
                        % 2147483647) & 15 = 0
                  ELSE FALSE END AS bnd
      FROM toks, unnest(range(len(t))) AS u(i)
    ),
    chunked AS (
      SELECT doc_id, pos, w,
             coalesce(sum(bnd::INT) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS chunk_idx
      FROM entries
    )
    SELECT doc_id, chunk_idx,
           min(pos) AS start_tok, max(pos) AS end_tok,
           count(*) AS n_tokens,
           md5(array_to_string(list(w ORDER BY pos), ' ')) AS digest
    FROM chunked GROUP BY doc_id, chunk_idx
    """,
)
def q197(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/text.py:cdc_chunks): documents
    split where the local bigram hash's low 4 bits are zero — insertion-
    robust boundaries (~16-token chunks) with per-chunk digests for
    chunk-level dedup."""
    from .operators.text import cdc_chunks

    return cdc_chunks(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=2, mask_bits=4
    )


@q(
    "q198_stylometric_deviation",
    f"""
    WITH toks AS (
      SELECT doc_id, source, t
      FROM (SELECT doc_id, source, {_TOKS} AS t FROM documents) s
      WHERE len(t) > 0
    ),
    topk AS (
      SELECT w FROM (
        SELECT unnest(t) AS w FROM toks
      ) GROUP BY w ORDER BY count(*) DESC, w LIMIT 10
    ),
    freqs AS (
      SELECT d.doc_id, d.source, k.w,
             len(list_filter(d.t, x -> x = k.w))::DOUBLE / len(d.t) AS f
      FROM toks d CROSS JOIN topk k
    ),
    stats AS (
      SELECT w, avg(f) AS m, stddev_samp(f) AS sd FROM freqs GROUP BY w
    ),
    z AS (
      SELECT f.doc_id, f.source, f.w,
             CASE WHEN s.sd > 0 THEN (f.f - s.m) / s.sd ELSE 0.0 END AS z
      FROM freqs f JOIN stats s USING (w)
    ),
    cent AS (
      SELECT source, w, avg(z) AS c FROM z GROUP BY source, w
    )
    SELECT z.doc_id AS id, z.source AS "group",
           round(avg(abs(z.z - cent.c)), 6) AS delta
    FROM z JOIN cent ON z.source = cent.source AND z.w = cent.w
    GROUP BY z.doc_id, z.source
    """,
)
def q198(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stylometric deviation (operators/text.py:stylometric_deviation,
    Burrows 2002): each document's function-word z-profile distance from
    its own source's centroid — the injected-content / wrong-source
    outlier signal; document text never shuffles."""
    from .operators.text import stylometric_deviation

    return stylometric_deviation(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "source", top_k=10
    )


@q(
    "q199_lang_agreement_kappa",
    """
    WITH pred AS (
      SELECT d.doc_id, d.lang AS a,
             (SELECT CASE WHEN max(hits) > 0
                     THEN max_by(code, hits * 10 + CASE code
                          WHEN 'de' THEN 0 WHEN 'en' THEN 1
                          WHEN 'es' THEN 2 ELSE 3 END)
                     ELSE 'und' END
              FROM (
                SELECT 'en' AS code, len(list_filter(t, x -> x IN
                  ('the','and','of','to','in','is','that','it','with','for'))) AS hits
                UNION ALL
                SELECT 'de', len(list_filter(t, x -> x IN
                  ('der','die','das','und','ist','nicht','mit','ein','zu','von')))
                UNION ALL
                SELECT 'fr', len(list_filter(t, x -> x IN
                  ('le','la','les','et','est','pas','pour','que','une','dans')))
                UNION ALL
                SELECT 'es', len(list_filter(t, x -> x IN
                  ('el','la','los','las','es','no','por','que','una','para')))
              )) AS b
      FROM (SELECT doc_id, lang,
                   CASE WHEN length(trim(text)) > 0
                        THEN string_split_regex(lower(trim(text)), '\\s+')
                        ELSE []::VARCHAR[] END AS t
            FROM documents) d
    ),
    base AS (SELECT a, b FROM pred WHERE a IS NOT NULL AND b IS NOT NULL),
    totals AS (
      SELECT count(*) AS n, sum((a = b)::INT) AS agree FROM base
    ),
    ma AS (SELECT a, count(*) AS ca FROM base GROUP BY a),
    mb AS (SELECT b, count(*) AS cb FROM base GROUP BY b),
    pe AS (
      SELECT sum(ca::DOUBLE * cb) AS pe_num
      FROM ma JOIN mb ON ma.a = mb.b
    )
    SELECT n,
           round(agree::DOUBLE / n, 6) AS po,
           round(coalesce(pe_num, 0) / (n::DOUBLE * n), 6) AS pe,
           round((agree::DOUBLE / n - coalesce(pe_num, 0) / (n::DOUBLE * n))
                 / (1 - coalesce(pe_num, 0) / (n::DOUBLE * n)), 6) AS kappa
    FROM totals CROSS JOIN pe
    """,
)
def q199(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/profile.py:agreement_kappa) between the
    documents table's lang metadata and the marker-token language ID
    (q24's operator) — chance-corrected agreement as the label-quality
    audit; only label-vocabulary-sized frames shuffle."""
    from .operators.profile import agreement_kappa
    from .operators.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    pred = lang_id(docs, "doc_id", "text").select(
        "doc_id", F.col("pred_lang")
    )
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    return agreement_kappa(joined, "lang", "pred_lang")


@q(
    "q200_corpus_health_report",
    f"""
    WITH toks AS (
      SELECT doc_id, source, lang, text, {_TOKS} AS t FROM documents
    ),
    per_doc AS (
      SELECT doc_id, source, lang, md5(text) AS dg, len(t) AS n_tok,
             length(text) AS n_chars
      FROM toks
    ),
    words AS (SELECT source, unnest(t) AS w FROM toks),
    src_vocab AS (
      SELECT source, count(DISTINCT w) AS types, count(*) AS tokens
      FROM words GROUP BY source
    ),
    src_docs AS (
      SELECT source,
             count(*) AS n_docs,
             count(DISTINCT dg) AS distinct_docs,
             round(avg(n_chars), 2) AS avg_chars,
             round(avg(n_tok), 2) AS avg_tokens,
             count(DISTINCT lang)::BIGINT AS n_langs
      FROM per_doc GROUP BY source
    )
    SELECT d.source, d.n_docs,
           round(1.0 - d.distinct_docs::DOUBLE / d.n_docs, 6) AS dup_rate,
           d.avg_chars, d.avg_tokens, d.n_langs,
           v.types, v.tokens,
           round(v.types::DOUBLE / v.tokens, 6) AS ttr
    FROM src_docs d JOIN src_vocab v USING (source)
    """,
)
def q200(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report — the dataset-card row every
    curation run ends with: document counts, exact-duplicate rate (via
    content digests), size averages, language spread, vocabulary size
    and type-token ratio, all from two source-keyed aggregations."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.dedup import tokens_col

    per_doc = docs.select(
        "source",
        "lang",
        F.md5("text").alias("dg"),
        F.size(tokens_col(F.col("text"))).alias("n_tok"),
        F.length("text").alias("n_chars"),
    )
    src_docs = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("dg").alias("distinct_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.round(F.avg("n_tok"), 2).alias("avg_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )
    words = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("w")
    )
    src_vocab = words.groupBy("source").agg(
        F.countDistinct("w").alias("types"),
        F.count(F.lit(1)).alias("tokens"),
    )
    return src_docs.join(src_vocab, "source").select(
        "source",
        "n_docs",
        F.round(
            1.0 - F.col("distinct_docs").cast("double") / F.col("n_docs"), 6
        ).alias("dup_rate"),
        "avg_chars",
        "avg_tokens",
        "n_langs",
        "types",
        "tokens",
        F.round(F.col("types").cast("double") / F.col("tokens"), 6).alias("ttr"),
    )


@q(
    "q201_skew_report",
    """
    WITH counts AS (
      SELECT o_custkey::VARCHAR AS key, count(*) AS cnt
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT key, cnt,
             row_number() OVER (ORDER BY cnt ASC, key ASC) AS i
      FROM counts
    ),
    stats AS (
      SELECT count(*) AS n_keys, sum(cnt) AS total,
             round(2.0 * sum(i * cnt) / (count(*)::DOUBLE * sum(cnt))
                   - (count(*) + 1.0) / count(*), 6) AS gini
      FROM ranked
    ),
    top AS (
      SELECT key, cnt,
             row_number() OVER (ORDER BY cnt DESC, key ASC) AS r
      FROM counts QUALIFY r <= 10
    )
    SELECT t.key, t.cnt,
           round(t.cnt::DOUBLE / s.total, 6) AS share,
           round(sum(t.cnt::DOUBLE) OVER (ORDER BY t.r
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / s.total, 6) AS cum_share,
           s.gini, s.n_keys
    FROM top t CROSS JOIN stats s
    """,
)
def q201(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostic (operators/profile.py:skew_report) over the
    orders-per-customer distribution: hot-key shares, cumulative share,
    and the global Gini coefficient — the pre-join report that decides
    whether plans.skew salting is warranted."""
    from .operators.profile import skew_report

    return skew_report(_t(spark, sf_dir, "orders"), "o_custkey", top_n=10)


# --- round 3: real-bytes multimodal (stdlib PNG codec, no stubs) ---


@q(
    "q202_image_decode_features",
    """
    SELECT doc_id AS id, 32.0 AS width, 32.0 AS height,
           round(bit_count(('0x' || substr(md5(text), 1, 15))::BIGINT)
                 * 255.0 * 16 / 1024, 6) AS mean_luma
    FROM documents
    """,
)
def q202(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: render one PNG per document
    (operators/multimodal.py:generate_images, blocks style — 4x4 cells
    per md5 bit), then extract_features with decode_stub=False
    (operators/imagecodec.py: zlib inflate → unfilter → luma → box
    stats).  The decoded mean luminance equals popcount(md5-prefix) *
    255 * 16 / 1024 exactly (constant blocks, lossless PNG), which the
    oracle computes without any codec."""
    from .operators.multimodal import extract_features, generate_images

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = generate_images(docs, "doc_id", "text", style="blocks")
    feats = extract_features(imgs, "id", feat_dim=4, decode_stub=False)
    return feats.select(
        "id",
        F.element_at("feat", 1).alias("width"),
        F.element_at("feat", 2).alias("height"),
        F.round(F.element_at("feat", 3), 6).alias("mean_luma"),
    )


@q(
    "q203_ahash_real_roundtrip",
    """
    SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS ahash
    FROM documents
    """,
)
def q203(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash on REAL decoded pixels: blocks-rendered PNGs →
    perceptual_hash(method='ahash', decode_stub=False) = decode → luma →
    8x8 box resize → threshold.  Box averaging over constant 4x4 blocks
    is exact and PNG is lossless, so the 60 recovered bits ARE the md5
    prefix — the oracle needs no codec."""
    from .operators.multimodal import generate_images, perceptual_hash

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = generate_images(docs, "doc_id", "text", style="blocks")
    hashes = perceptual_hash(imgs, "id", decode_stub=False, method="ahash")
    return hashes.select(F.col("id").alias("doc_id"), F.col("phash").alias("ahash"))


@q(
    "q204_phash_dct_near_dup",
    f"""
    WITH all_docs AS ({_DOCS_PLUS_CLONES}),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS phash
      FROM all_docs
    ),
    bands AS (
      SELECT doc_id, phash, b, (phash >> (b * 15)) & 32767 AS bv
      FROM h, unnest([0, 1, 2, 3]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
             l.phash AS ha, r.phash AS hb
      FROM bands l
      JOIN bands r ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id
    )
    SELECT id_a, id_b, bit_count(xor(ha, hb))::INT AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 3
    """,
)
def q204(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-2 VERDICT top ask, closed: pHash near-dup on REAL
    image bytes.  DCT-rendered PNGs (md5 bits as ±30 coefficients) →
    perceptual_hash(decode_stub=False): PNG decode → luma → 32x32 box
    resize → orthonormal 2-D DCT → sign of 60 AC coefficients →
    pigeonhole-banded Hamming equi-join (never all-pairs).  The DCT is
    linear and rounding noise ≪ amplitude, so the recovered bits equal
    the md5 prefix — engine-independent, hence the codec-free oracle.
    Exact clones land at hamming 0."""
    from .operators.multimodal import (
        generate_images,
        hamming_near_dup,
        perceptual_hash,
    )

    docs = _docs_plus_clones(spark, sf_dir)
    imgs = generate_images(docs, "doc_id", "text", style="dct")
    hashes = perceptual_hash(imgs, "id", decode_stub=False, method="phash")
    return hamming_near_dup(hashes, "id", "phash").select("id_a", "id_b", "hamming")


@q(
    "q205_mutual_nn_lsh_composed",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    hp AS (
      SELECT p, i,
             CASE WHEN strpos('02468ace',
                              substr(md5(p::VARCHAR || '|' || (i - 1)::VARCHAR), 1, 1)) > 0
                  THEN 1.0 ELSE -1.0 END AS h
      FROM (SELECT unnest(range(0, 8)) AS p) pl,
           (SELECT unnest(range(1, 65)) AS i) dims
    ),
    bits AS (
      SELECT e.vec_id, hp.p,
             CASE WHEN sum(e.v * hp.h) >= 0 THEN '1' ELSE '0' END AS bit
      FROM e JOIN hp USING (i)
      GROUP BY e.vec_id, hp.p
    ),
    buckets AS (
      SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
      FROM bits GROUP BY vec_id
    ),
    qb AS (SELECT vec_id AS left_id, bucket FROM buckets WHERE vec_id % 2 = 0),
    cb AS (SELECT vec_id AS right_id, bucket FROM buckets WHERE vec_id % 2 = 1),
    qprobe AS (
      SELECT left_id, bucket FROM qb
      UNION
      SELECT left_id,
             substr(bucket, 1, j - 1)
             || (CASE WHEN substr(bucket, j, 1) = '1' THEN '0' ELSE '1' END)
             || substr(bucket, j + 1, 8 - j) AS bucket
      FROM qb, (SELECT unnest(range(1, 9)) AS j) js
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cand AS (
      SELECT DISTINCT qp.left_id, cb.right_id
      FROM qprobe qp JOIN cb USING (bucket)
    ),
    dots AS (
      SELECT c.left_id, c.right_id, sum(el.v * er.v) AS dot
      FROM cand c
      JOIN e el ON el.vec_id = c.left_id
      JOIN e er ON er.vec_id = c.right_id AND er.i = el.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT left_id, right_id,
             dot / (nl.nrm * nr.nrm) AS c,
             round(dot / (nl.nrm * nr.nrm), 6) AS rc
      FROM dots JOIN norms nl ON left_id = nl.vec_id
                JOIN norms nr ON right_id = nr.vec_id
    ),
    topk AS (
      SELECT left_id, right_id, c FROM (
        SELECT left_id, right_id, c,
               row_number() OVER (PARTITION BY left_id
                                  ORDER BY rc DESC, right_id) AS rk
        FROM scored
      ) WHERE rk <= 5
    ),
    ranked AS (
      SELECT left_id, right_id, c,
             row_number() OVER (PARTITION BY left_id
                                ORDER BY c DESC, right_id) AS rl,
             row_number() OVER (PARTITION BY right_id
                                ORDER BY c DESC, left_id) AS rr
      FROM topk
    )
    SELECT left_id, right_id, round(c, 6) AS cosine
    FROM ranked WHERE rl = 1 AND rr = 1
    """,
)
def q205(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED bitext-mining scale path (round-2 VERDICT missing
    #1): mutual_nn restricted to lsh_bucket_topk candidates.  Candidate
    generation is the q54 machinery (md5-parity hyperplanes, Hamming-1
    multi-probe, top-5 per query within probed buckets); mutuality is
    then two windowed argmaxes over the candidate frame only — no
    all-pairs stage anywhere.  The oracle replays both stages in SQL."""
    from .operators.similarity import lsh_bucket_topk, mutual_nn

    emb = _t(spark, sf_dir, "embeddings")
    left = emb.filter(F.col("vec_id") % 2 == 0)
    right = emb.filter(F.col("vec_id") % 2 == 1)
    cand = lsh_bucket_topk(
        right, left, "vec_id", "embedding",
        k=5, planes=8, dim=64, probes=2, round_cosine=6,
    ).select(
        F.col("query_id").alias("left_id"),
        F.col("neighbor_id").alias("right_id"),
    )
    out = mutual_nn(left, right, candidates=cand)
    return out.select("left_id", "right_id", F.round("cosine", 6).alias("cosine"))


@q(
    "q206_jaccard_join_lsh_composed",
    f"""
    WITH rdocs AS (
      SELECT doc_id, text || ' extra tail marker' AS text
      FROM documents WHERE doc_id < 30
    ),
    un AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM rdocs
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM un),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_l, r.doc_id - 1000000 AS id_r
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
      WHERE l.doc_id < 1000000 AND r.doc_id >= 1000000
    ),
    dtl AS (
      SELECT doc_id AS id_l, unnest(list_distinct(t)) AS tok
      FROM (SELECT doc_id, {_TOKS} AS t FROM documents) s
    ),
    dtr AS (
      SELECT doc_id AS id_r, unnest(list_distinct(t)) AS tok
      FROM (SELECT doc_id, {_TOKS} AS t FROM rdocs) s
    ),
    szl AS (SELECT id_l, count(*) AS nl FROM dtl GROUP BY id_l),
    szr AS (SELECT id_r, count(*) AS nr FROM dtr GROUP BY id_r),
    inter AS (
      SELECT c.id_l, c.id_r, count(*) AS i
      FROM dtl JOIN dtr USING (tok)
      JOIN cand c ON c.id_l = dtl.id_l AND c.id_r = dtr.id_r
      GROUP BY 1, 2
    )
    SELECT i.id_l, i.id_r,
           round(i.i::DOUBLE / (szl.nl + szr.nr - i.i), 6) AS jaccard
    FROM inter i JOIN szl ON i.id_l = szl.id_l JOIN szr ON i.id_r = szr.id_r
    WHERE round(i.i::DOUBLE / (szl.nl + szr.nr - i.i), 6) >= 0.5
    """,
)
def q206(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED record-linkage scale path (round-2 VERDICT missing
    #1b): two-table token-Jaccard similarity join fed by MinHash-LSH
    candidates.  Blocking = lsh_candidate_pairs over the UNION of both
    tables with disjoint id namespaces (cross-namespace pairs only);
    verification = exact token Jaccard, aggregated over candidate pairs
    alone.  The oracle replays both stages in SQL."""
    from .operators.dedup import jaccard_similarity_join, lsh_candidate_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    right = docs.filter(F.col("doc_id") < 30).select(
        "doc_id", F.concat(F.col("text"), F.lit(" extra tail marker")).alias("text")
    )
    un = docs.union(right.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    cand = (
        lsh_candidate_pairs(un, "doc_id", "text", num_hashes=8, bands=4)
        .filter((F.col("id_a") < 1000000) & (F.col("id_b") >= 1000000))
        .select(
            F.col("id_a").alias("id_l"),
            (F.col("id_b") - 1000000).alias("id_r"),
        )
    )
    return jaccard_similarity_join(
        docs, right, "doc_id", "text", "doc_id", "text",
        threshold=0.5, candidates=cand,
    )


@q(
    "q207_cluster_dedup_cc",
    f"""
    WITH RECURSIVE all_docs AS (
      SELECT doc_id, text FROM documents UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' zzz' AS text
      FROM documents WHERE doc_id < 20
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    ),
    sym AS (
      SELECT id_a AS s, id_b AS dd FROM cand
      UNION
      SELECT id_b AS s, id_a AS dd FROM cand
    ),
    verts AS (SELECT DISTINCT s AS id FROM sym),
    reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT sym.dd, reach.r FROM reach JOIN sym ON sym.s = reach.id
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT a.doc_id AS id,
           coalesce(c.component, a.doc_id) AS component,
           (coalesce(c.component, a.doc_id) = a.doc_id) AS keep
    FROM all_docs a LEFT JOIN comp c ON c.id = a.doc_id
    """,
)
def q207(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER dedup end-to-end (operators/dedup.py:
    cluster_dedup): MinHash-LSH candidate pairs -> DISTRIBUTED connected
    components (operators/graph.py:connected_components_df — iterative
    min-label propagation, one join + one min-agg per round) -> keep one
    min-id representative per component; singletons keep themselves.
    The oracle replays the pair generation and closes the components
    with a recursive CTE — transitivity included, which pairwise dedup
    verdicts miss."""
    from .operators.dedup import cluster_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    perturbed = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    all_docs = docs.union(clones).union(perturbed)
    return cluster_dedup(all_docs, "doc_id", "text", num_hashes=8, bands=4)


@q(
    "q208_audio_decode_features",
    """
    WITH h AS (
      SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS v
      FROM documents
    )
    SELECT doc_id AS id, 16000 AS sample_rate, 960::BIGINT AS n_frames,
           60.0 AS duration_ms, 16384.0 AS rms, 16384 AS peak,
           bit_count(xor(v, v >> 1) & ((1::BIGINT << 59) - 1))::INT
             AS zero_crossings
    FROM h
    """,
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (the WAV twin of q202): render one
    PCM WAV per document (operators/multimodal.py:generate_audio — 16
    samples of ±16384 per md5-prefix bit), then extract_audio_features
    (operators/audiocodec.py: stdlib RIFF parse, numpy features).  The
    decoded features are closed-form functions of the bits — RMS and
    peak are the amplitude exactly, zero crossings = popcount of
    adjacent-bit flips — so the oracle needs no codec."""
    from .operators.multimodal import extract_audio_features, generate_audio

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    wavs = generate_audio(docs, "doc_id", "text")
    feats = extract_audio_features(wavs, "id")
    return feats.select(
        "id",
        "sample_rate",
        "n_frames",
        "duration_ms",
        "rms",
        "peak",
        "zero_crossings",
    )


@q(
    "q209_resize_decode_roundtrip",
    """
    SELECT doc_id AS id, 8.0 AS width, 8.0 AS height,
           round(bit_count(('0x' || substr(md5(text), 1, 15))::BIGINT)
                 * 255.0 / 64, 6) AS mean_luma
    FROM documents
    """,
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two REAL codec hops chained: blocks-rendered PNG -> resize_images
    (decode -> box resize 8x8 -> PNG re-encode, decode_stub=False) ->
    extract_features on the RESIZED payload (second decode).  Box means
    over constant 4x4 cells are exact and PNG is lossless twice over,
    so the final mean luminance is popcount(md5-prefix) * 255 / 64 — a
    codec-free oracle across an encode/decode/resize/encode/decode
    chain."""
    from .operators.multimodal import (
        extract_features,
        generate_images,
        resize_images,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    imgs = generate_images(docs, "doc_id", "text", style="blocks")
    resized = resize_images(imgs, "id", width=8, height=8, decode_stub=False)
    feats = extract_features(
        resized, "id", payload_col="resized", feat_dim=4, decode_stub=False
    )
    return feats.select(
        "id",
        F.element_at("feat", 1).alias("width"),
        F.element_at("feat", 2).alias("height"),
        F.round(F.element_at("feat", 3), 6).alias("mean_luma"),
    )


@q(
    "q210_kmeans_fit_2iter",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cent_ids AS (
      SELECT vec_id AS cvid,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    ce AS (SELECT c.cell, e.i, e.v FROM cent_ids c JOIN e ON e.vec_id = c.cvid),
    cnorm AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce GROUP BY cell),
    vcdot AS (
      SELECT e.vec_id, ce.cell, sum(e.v * ce.v) AS dot
      FROM e JOIN ce ON ce.i = e.i
      GROUP BY 1, 2
    ),
    vc AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm cn ON cn.cell = d.cell
    ),
    assign1 AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc
      ) WHERE rk = 1
    ),
    ce2 AS (
      SELECT a.cell, e.i, round(avg(e.v), 6) AS v
      FROM assign1 a JOIN e USING (vec_id) GROUP BY 1, 2
    ),
    cnorm2 AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce2 GROUP BY cell),
    vcdot2 AS (
      SELECT e.vec_id, ce2.cell, sum(e.v * ce2.v) AS dot
      FROM e JOIN ce2 ON ce2.i = e.i
      GROUP BY 1, 2
    ),
    vc2 AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot2 d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm2 cn ON cn.cell = d.cell
    ),
    assign2 AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc2
      ) WHERE rk = 1
    ),
    upd2 AS (
      SELECT a.cell, e.i, round(avg(e.v), 6) AS m
      FROM assign2 a JOIN e USING (vec_id) GROUP BY 1, 2
    ),
    cent3 AS (SELECT cell, list(m ORDER BY i) AS centroid FROM upd2 GROUP BY cell),
    mem2 AS (SELECT cell, count(*) AS n_members FROM assign2 GROUP BY cell)
    SELECT cell, n_members, centroid FROM cent3 JOIN mem2 USING (cell)
    """,
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd loop (operators/similarity.py: kmeans_fit), two
    iterations unrolled in the oracle.  Each round is one corpus pass;
    the nlist*D centroid table collects to the driver between rounds —
    the MLlib iteration pattern.  Verifies the feedback edge the
    single-step q73 cannot: round 2 assigns against round 1's ROUNDED
    collected centroids."""
    from .operators.similarity import kmeans_fit

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return kmeans_fit(emb, "vec_id", "embedding", nlist=16, n_iter=2)


@q(
    "q211_covariance_matrix",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
             unnest(embedding)::DOUBLE AS v
      FROM embeddings
    ),
    p AS (
      SELECT a.i AS i, b.i AS j, count(*) AS n,
             sum(a.v * b.v) AS sxy, sum(a.v) AS sx, sum(b.v) AS sy
      FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY 1, 2
    )
    SELECT i, j, round(sxy / n - (sx / n) * (sy / n), 6) + 0.0 AS cov
    FROM p
    """,
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance matrix (operators/similarity.py:
    gram_matrix): one corpus pass, upper-triangle products pipelined
    into a hash aggregate — the shuffle carries D*(D+1)/2 partial sums
    regardless of corpus size (the oracle's self-join is the naive
    formulation the operator avoids)."""
    from .operators.similarity import gram_matrix

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return gram_matrix(emb, "vec_id", "embedding", center=True, round_to=6)


@q(
    "q212_pca_project_2d",
    """
    WITH e AS (
      SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
      FROM embeddings
    ),
    st AS (
      SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
             round(sum(x * x) / count(*) - avg(x) * avg(x), 12) AS a,
             round(sum(x * y) / count(*) - avg(x) * avg(y), 12) AS b,
             round(sum(y * y) / count(*) - avg(y) * avg(y), 12) AS c
      FROM e
    ),
    comp AS (
      SELECT mx, my,
             cos(0.5 * atan2(2 * b, a - c)) AS v0,
             sin(0.5 * atan2(2 * b, a - c)) AS v1
      FROM st
    ),
    signed AS (
      SELECT mx, my,
             CASE WHEN (CASE WHEN abs(v0) >= abs(v1) THEN v0 ELSE v1 END) < 0
                  THEN -v0 ELSE v0 END AS c0,
             CASE WHEN (CASE WHEN abs(v0) >= abs(v1) THEN v0 ELSE v1 END) < 0
                  THEN -v1 ELSE v1 END AS c1
      FROM comp
    )
    SELECT e.vec_id, 0 AS comp,
           round((e.x - s.mx) * s.c0 + (e.y - s.my) * s.c1, 6) AS score
    FROM e, signed s
    """,
)
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit + project end-to-end (operators/similarity.py: pca_fit /
    pca_project) on the first two embedding dims — small enough that the
    oracle can fit the SAME principal axis in closed form (2x2 symmetric
    eigenproblem: theta = atan2(2b, a-c) / 2) and replay the centered
    projection.  Validates the distributed covariance -> driver eigh ->
    literal-component projection pipeline numerically."""
    from .operators.similarity import pca_fit, pca_project

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.slice(F.col("embedding").cast("array<double>"), 1, 2).alias("e2")
    )
    comps = pca_fit(emb, "vec_id", "e2", k=1)
    means_row = emb.select(
        F.avg(F.element_at("e2", 1)).alias("m0"),
        F.avg(F.element_at("e2", 2)).alias("m1"),
    ).collect()[0]
    return pca_project(
        emb,
        "vec_id",
        "e2",
        comps,
        center_means=[float(means_row["m0"]), float(means_row["m1"])],
    ).select("vec_id", "comp", "score")


@q(
    "q213_quantize_int8",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS v
      FROM embeddings
    ),
    st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM e GROUP BY i),
    c AS (
      SELECT e.vec_id, e.i, e.v, st.mn, st.mx,
             CASE WHEN st.mx > st.mn
                  THEN CAST(floor((e.v - st.mn) / (st.mx - st.mn) * 255.0 + 0.5) AS INT) - 128
                  ELSE -128 END AS code
      FROM e JOIN st USING (i)
    ),
    r AS (
      SELECT vec_id, i, code,
             CASE WHEN mx > mn
                  THEN (code + 128.0) / 255.0 * (mx - mn) + mn
                  ELSE mn END AS recon,
             v
      FROM c
    )
    SELECT vec_id, list(code ORDER BY i) AS codes,
           round(avg((v - recon) * (v - recon)), 6) AS mse
    FROM r GROUP BY vec_id
    """,
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization (operators/similarity.py: quantize_int8):
    per-dim min/max from a D-row aggregate broadcast into a map-only
    encode; mse is the per-vector reconstruction error.  The 4x
    compression step before shipping vectors to an ANN index."""
    from .operators.similarity import quantize_int8

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return quantize_int8(emb, "vec_id", "embedding")


@q(
    "q214_temperature_mixture",
    """
    WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
    t AS (SELECT sum(pow(cnt, 0.5)) AS z, sum(cnt) AS n FROM c),
    w AS (
      SELECT lang, round(pow(cnt, 0.5) / z * n / cnt, 9) AS weight
      FROM c, t
    ),
    d AS (
      SELECT doc_id, d.lang, w.weight,
             CAST(floor(w.weight) AS INT)
             + CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
                         / 4294967296.0 < w.weight - floor(w.weight)
                    THEN 1 ELSE 0 END AS nc
      FROM documents d JOIN w USING (lang)
    )
    SELECT doc_id, lang, weight, unnest(range(nc)) AS copy_idx
    FROM d WHERE nc > 0
    """,
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual mixture (operators/clusters.py:
    temperature_mixture, tau=0.5): target share c^tau / sum c^tau boosts
    low-resource langs; group counts shuffle one row per lang, the
    weight table broadcasts into a shuffle-free sequence-explode with
    md5-uniform fractional copies."""
    from .operators.clusters import temperature_mixture

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return temperature_mixture(docs, "doc_id", "lang", tau=0.5).select(
        "doc_id", "lang", "weight", "copy_idx"
    )


@q(
    "q215_logreg_train_2step",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(CASE WHEN length(trim(text)) > 0
                    THEN string_split_regex(lower(trim(text)), '\\s+')
                    ELSE []::VARCHAR[] END) AS tok
      FROM documents
    ),
    f0 AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
             count(*)::DOUBLE AS n
      FROM toks GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(n) AS t FROM f0 GROUP BY 1),
    x AS (
      SELECT f0.doc_id, f0.bucket, f0.n / tot.t AS v
      FROM f0 JOIN tot USING (doc_id)
    ),
    y AS (
      SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents d WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM x)
    ),
    nd AS (SELECT count(*)::DOUBLE AS n FROM y),
    spine AS (SELECT unnest(range(64)) AS bucket),
    r1 AS (SELECT doc_id, 0.5 - y AS r FROM y),
    g1 AS (
      SELECT x.bucket, sum(r1.r * x.v) AS g
      FROM x JOIN r1 USING (doc_id) GROUP BY x.bucket
    ),
    w1 AS (
      SELECT s.bucket,
             round(-0.1 * coalesce(g1.g, 0.0) / nd.n, 9) AS w
      FROM spine s LEFT JOIN g1 USING (bucket), nd
    ),
    b1 AS (SELECT round(-0.1 * sum(r) / nd.n, 9) AS b FROM r1, nd GROUP BY nd.n),
    z2 AS (
      SELECT x.doc_id, round(b1.b + sum(x.v * w1.w), 9) AS z
      FROM x JOIN w1 USING (bucket), b1
      GROUP BY x.doc_id, b1.b
    ),
    r2 AS (
      SELECT y.doc_id, 1.0 / (1.0 + exp(-z2.z)) - y.y AS r
      FROM y JOIN z2 USING (doc_id)
    ),
    g2 AS (
      SELECT x.bucket, sum(r2.r * x.v) AS g
      FROM x JOIN r2 USING (doc_id) GROUP BY x.bucket
    ),
    w2 AS (
      SELECT w1.bucket,
             round(w1.w - 0.1 * coalesce(g2.g, 0.0) / nd.n, 9) AS w
      FROM w1 LEFT JOIN g2 USING (bucket), nd
    ),
    b2 AS (SELECT round(b1.b - 0.1 * sum(r) / nd.n, 9) AS b FROM r2, b1, nd GROUP BY b1.b, nd.n)
    SELECT bucket, w FROM w2
    UNION ALL
    SELECT -1 AS bucket, b AS w FROM b2
    """,
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier TRAINING on Spark (operators/text.py:
    logreg_train): hashed token features (feature_hash) densified once
    (densify_counts — the one corpus shuffle, amortized over all steps),
    then two full-batch gradient steps of logistic regression against an
    is-English label.  Each step is one map-only margin pass plus a
    D-row gradient shuffle; the oracle unrolls both steps in SQL.
    Bias is emitted as bucket -1."""
    from .operators.text import densify_counts, feature_hash, logreg_train

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    feats = feature_hash(docs, "doc_id", "text", n_buckets=64)
    dense = densify_counts(feats, "id", "bucket", "n", n_buckets=64)
    labeled = dense.join(
        docs.select(
            F.col("doc_id").alias("id"),
            (F.col("lang") == "en").cast("double").alias("y"),
        ),
        "id",
    )
    w, b = logreg_train(labeled, "id", "x", "y", lr=0.1, n_steps=2)
    rows = [(int(j), float(w[j])) for j in range(len(w))] + [(-1, float(b))]
    return spark.createDataFrame(rows, "bucket long, w double")


@q(
    "q216_logreg_eval_metrics",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(CASE WHEN length(trim(text)) > 0
                    THEN string_split_regex(lower(trim(text)), '\\s+')
                    ELSE []::VARCHAR[] END) AS tok
      FROM documents
    ),
    f0 AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
             count(*)::DOUBLE AS n
      FROM toks GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(n) AS t FROM f0 GROUP BY 1),
    x AS (
      SELECT f0.doc_id, f0.bucket, f0.n / tot.t AS v
      FROM f0 JOIN tot USING (doc_id)
    ),
    y AS (
      SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents d WHERE d.doc_id IN (SELECT DISTINCT doc_id FROM x)
    ),
    nd AS (SELECT count(*)::DOUBLE AS n FROM y),
    spine AS (SELECT unnest(range(64)) AS bucket),
    r1 AS (SELECT doc_id, 0.5 - y AS r FROM y),
    g1 AS (
      SELECT x.bucket, sum(r1.r * x.v) AS g
      FROM x JOIN r1 USING (doc_id) GROUP BY x.bucket
    ),
    w1 AS (
      SELECT s.bucket,
             round(-0.1 * coalesce(g1.g, 0.0) / nd.n, 9) AS w
      FROM spine s LEFT JOIN g1 USING (bucket), nd
    ),
    b1 AS (SELECT round(-0.1 * sum(r) / nd.n, 9) AS b FROM r1, nd GROUP BY nd.n),
    z2 AS (
      SELECT x.doc_id, round(b1.b + sum(x.v * w1.w), 9) AS z
      FROM x JOIN w1 USING (bucket), b1
      GROUP BY x.doc_id, b1.b
    ),
    r2 AS (
      SELECT y.doc_id, 1.0 / (1.0 + exp(-z2.z)) - y.y AS r
      FROM y JOIN z2 USING (doc_id)
    ),
    g2 AS (
      SELECT x.bucket, sum(r2.r * x.v) AS g
      FROM x JOIN r2 USING (doc_id) GROUP BY x.bucket
    ),
    w2 AS (
      SELECT w1.bucket,
             round(w1.w - 0.1 * coalesce(g2.g, 0.0) / nd.n, 9) AS w
      FROM w1 LEFT JOIN g2 USING (bucket), nd
    ),
    b2 AS (SELECT round(b1.b - 0.1 * sum(r) / nd.n, 9) AS b
           FROM r2, b1, nd GROUP BY b1.b, nd.n),
    sy AS (
      SELECT y.doc_id,
             round(1.0 / (1.0 + exp(-(b2.b + zf.z))), 6) AS s, y.y
      FROM y
      JOIN (SELECT x.doc_id, sum(x.v * w2.w) AS z
            FROM x JOIN w2 USING (bucket) GROUP BY x.doc_id) zf USING (doc_id),
      b2
    ),
    dist AS (
      SELECT s, sum(y) AS pos, sum(1.0 - y) AS neg FROM sy GROUP BY s
    ),
    cum AS (
      SELECT s, pos, neg,
             coalesce(sum(neg) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS cumneg
      FROM dist
    ),
    auc AS (
      SELECT sum(pos * cumneg) + sum(pos * neg * 0.5) AS won,
             sum(pos) AS pp, sum(neg) AS nneg
      FROM cum
    ),
    conf AS (
      SELECT count(*) AS n, sum(y)::BIGINT AS n_pos,
             sum(CASE WHEN s >= 0.5 THEN y ELSE 0.0 END) AS tp,
             sum(CASE WHEN s >= 0.5 THEN 1.0 - y ELSE 0.0 END) AS fp,
             sum(CASE WHEN s < 0.5 THEN y ELSE 0.0 END) AS fn,
             sum(CASE WHEN s < 0.5 THEN 1.0 - y ELSE 0.0 END) AS tn
      FROM sy
    )
    SELECT n, n_pos,
           round(CASE WHEN pp > 0 AND nneg > 0 THEN won / (pp * nneg) END, 6) AS auc,
           round((tp + tn) / n, 6) AS accuracy,
           round(CASE WHEN tp + fp > 0 THEN tp / (tp + fp) END, 6) AS precision,
           round(CASE WHEN tp + fn > 0 THEN tp / (tp + fn) END, 6) AS recall,
           round(CASE WHEN tp + fp > 0 AND tp + fn > 0
                       AND tp / (tp + fp) + tp / (tp + fn) > 0
                      THEN 2 * (tp / (tp + fp)) * (tp / (tp + fn))
                           / (tp / (tp + fp) + tp / (tp + fn)) END, 6) AS f1
    FROM conf, auc
    """,
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train -> score -> evaluate, end-to-end (operators/text.py:
    logreg_train + logreg_score, operators/profile.py: binary_metrics):
    the full quality-classifier loop with rank-sum AUC (tie-corrected,
    computed over the score DISTRIBUTION — bounded by score resolution,
    never a corpus sort) and thresholded confusion metrics.  The oracle
    unrolls both gradient steps and replays the metrics."""
    from .operators.profile import binary_metrics
    from .operators.text import (
        densify_counts,
        feature_hash,
        logreg_score,
        logreg_train,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    feats = feature_hash(docs, "doc_id", "text", n_buckets=64)
    dense = densify_counts(feats, "id", "bucket", "n", n_buckets=64)
    labeled = dense.join(
        docs.select(
            F.col("doc_id").alias("id"),
            (F.col("lang") == "en").cast("double").alias("y"),
        ),
        "id",
    )
    w, b = logreg_train(labeled, "id", "x", "y", lr=0.1, n_steps=2)
    scored = logreg_score(labeled, "id", "x", w, b).join(
        labeled.select("id", "y"), "id"
    )
    return binary_metrics(scored, "score", "y", threshold=0.5)


@q(
    "q217_silhouette_after_step",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cent_ids AS (
      SELECT vec_id AS cvid,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    ce AS (SELECT c.cell, e.i, e.v FROM cent_ids c JOIN e ON e.vec_id = c.cvid),
    cnorm AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce GROUP BY cell),
    vcdot AS (
      SELECT e.vec_id, ce.cell, sum(e.v * ce.v) AS dot
      FROM e JOIN ce ON ce.i = e.i
      GROUP BY 1, 2
    ),
    vc AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm cn ON cn.cell = d.cell
    ),
    assign1 AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc
      ) WHERE rk = 1
    ),
    ce2 AS (
      SELECT a.cell, e.i, round(avg(e.v), 6) AS v
      FROM assign1 a JOIN e USING (vec_id) GROUP BY 1, 2
    ),
    cnorm2 AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce2 GROUP BY cell),
    vcdot2 AS (
      SELECT e.vec_id, ce2.cell, sum(e.v * ce2.v) AS dot
      FROM e JOIN ce2 ON ce2.i = e.i
      GROUP BY 1, 2
    ),
    vc2 AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot2 d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm2 cn ON cn.cell = d.cell
    ),
    rk AS (
      SELECT vec_id, cell, 1.0 - cos AS d,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cell) AS rk
      FROM vc2
    ),
    a AS (SELECT vec_id, cell, d FROM rk WHERE rk = 1),
    b AS (SELECT vec_id, d AS d2 FROM rk WHERE rk = 2)
    SELECT a.vec_id, a.cell,
           round(CASE WHEN greatest(a.d, b.d2) > 0
                      THEN (b.d2 - a.d) / greatest(a.d, b.d2)
                      ELSE 0.0 END, 6) AS silhouette
    FROM a JOIN b USING (vec_id)
    """,
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality evaluation: one Lloyd step trains centroids
    (kmeans_iteration, = q73), then silhouette_centroid scores every
    vector against them map-only (centroids are plan literals; a = own
    distance, b = second-nearest, s = (b-a)/max).  The k-selection
    gauge that avoids the O(n²) pairwise silhouette."""
    from .operators.similarity import kmeans_iteration, silhouette_centroid

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in kmeans_iteration(emb, "vec_id", "embedding", nlist=16).collect()
    ]
    return silhouette_centroid(emb, "vec_id", "embedding", cents)


@q(
    "q218_mmr_select_diverse",
    """
    WITH e AS (
      SELECT vec_id, label, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    rel AS (
      SELECT vec_id, any_value(label) AS label,
             round(sqrt(sum(v * v)), 6) AS score,
             sqrt(sum(v * v)) AS rn
      FROM e GROUP BY vec_id
    ),
    first AS (
      SELECT label, vec_id, score, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY label
                                     ORDER BY score DESC, vec_id) AS rk
        FROM rel
      ) WHERE rk = 1
    ),
    fvec AS (
      SELECT f.label, e.i, e.v FROM first f JOIN e ON e.vec_id = f.vec_id
    ),
    dots AS (
      SELECT r.label, r.vec_id, sum(e.v * fv.v) AS dot
      FROM rel r
      JOIN e ON e.vec_id = r.vec_id
      JOIN fvec fv ON fv.label = r.label AND fv.i = e.i
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT d.label, d.vec_id,
             round(0.5 * r.score - 0.5 * round(d.dot / (r.rn * f.rn), 6), 6) AS ms
      FROM dots d
      JOIN rel r ON r.vec_id = d.vec_id
      JOIN first f ON f.label = d.label
      WHERE d.vec_id != f.vec_id
    ),
    second AS (
      SELECT label, vec_id, ms FROM (
        SELECT *, row_number() OVER (PARTITION BY label
                                     ORDER BY ms DESC, vec_id) AS rk
        FROM cand
      ) WHERE rk = 1
    )
    SELECT label::VARCHAR AS bucket, vec_id AS id, 0::BIGINT AS rank,
           score AS mmr_score
    FROM first
    UNION ALL
    SELECT label::VARCHAR AS bucket, vec_id AS id, 1::BIGINT AS rank,
           ms AS mmr_score
    FROM second
    """,
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware exemplar selection (operators/similarity.py:
    mmr_select): greedy MMR per label bucket — pick the most relevant
    (here: largest-norm) vector, then the best lam*rel - (1-lam)*sim
    trade-off.  Runs per bucket in applyInPandas with numpy GEMM
    similarities (the semdedup in-cell pattern); the oracle unrolls the
    k=2 recurrence in SQL."""
    from .operators.similarity import mmr_select

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    scored = emb.withColumn(
        "rel",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.col("embedding").cast("array<double>"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
            6,
        ),
    )
    return mmr_select(
        scored, "vec_id", "embedding", "rel", k=2, lam=0.5, bucket_col="label"
    )


@q(
    "q220_doc_embedding_jl",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(CASE WHEN length(trim(text)) > 0
                    THEN string_split_regex(lower(trim(text)), '\\s+')
                    ELSE []::VARCHAR[] END) AS tok
      FROM documents
    ),
    f0 AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS bucket,
             count(*)::DOUBLE AS n
      FROM toks GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, sum(n) AS t FROM f0 GROUP BY 1),
    x AS (
      SELECT f0.doc_id, f0.bucket, f0.n / tot.t AS v
      FROM f0 JOIN tot USING (doc_id)
    )
    SELECT doc_id AS id,
           round(sum(v * ([-1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,1.0,-1.0,1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,1.0,1.0,1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_0,
           round(sum(v * ([-1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,-1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_1,
           round(sum(v * ([1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_2,
           round(sum(v * ([1.0,1.0,-1.0,1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,-1.0,1.0,1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_3,
           round(sum(v * ([1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_4,
           round(sum(v * ([1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,1.0,1.0,1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_5,
           round(sum(v * ([-1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,1.0,-1.0,1.0,1.0,-1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,1.0,1.0,1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0,1.0,-1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_6,
           round(sum(v * ([1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,-1.0,1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,-1.0,-1.0,-1.0,1.0,1.0,-1.0,1.0,-1.0,-1.0,-1.0,-1.0,-1.0,1.0])[bucket + 1]) / 2.8284271247461903, 6) AS proj_7
    FROM x GROUP BY doc_id
    """,
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free document embeddings: hashed bag-of-words
    (feature_hash, 64 buckets, L1-normalized) projected to 8 dims by
    the md5-parity JL sign projection (random_projection) — the bridge
    that gives raw text a dense vector column for the whole similarity
    stack (semdedup/IVF/MMR) without an external encoder.  One counts
    shuffle + one densify shuffle, then map-only projection."""
    from .operators.similarity import random_projection
    from .operators.text import densify_counts, feature_hash

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    feats = feature_hash(docs, "doc_id", "text", n_buckets=64)
    dense = densify_counts(feats, "id", "bucket", "n", n_buckets=64)
    proj = random_projection(dense, "id", "x", 8, dim=64)
    return proj.select(
        "id", *[F.col("proj")[i].alias(f"proj_{i}") for i in range(8)]
    )


@q(
    "q219_interpolated_nll",
    f"""
    WITH toksarr AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    grams AS (
      SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bg
      FROM toksarr WHERE len(t) >= 2
    ),
    vocab2 AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY bg),
    ctx AS (
      SELECT string_split(bg, ' ')[1] AS w1, sum(c2) AS c1
      FROM vocab2 GROUP BY 1
    ),
    toks AS (SELECT doc_id, unnest(t) AS tok FROM toksarr),
    uni AS (SELECT tok, count(*) AS cu FROM toks GROUP BY 1),
    tot AS (SELECT sum(cu) AS total FROM uni)
    SELECT g.doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(-ln(0.7 * v.c2::DOUBLE / x.c1
                         + 0.3 * u.cu::DOUBLE / tot.total)), 6) AS nll
    FROM grams g
    JOIN vocab2 v ON g.bg = v.bg
    JOIN ctx x ON string_split(g.bg, ' ')[1] = x.w1
    JOIN uni u ON string_split(g.bg, ' ')[2] = u.tok
    CROSS JOIN tot
    GROUP BY g.doc_id
    """,
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jelinek-Mercer interpolated bigram perplexity proxy
    (operators/text.py: interpolated_nll, lam=0.7): bigram conditional
    smoothed by the unigram backoff — the finite-for-rare-contexts form
    a KenLM quality filter actually uses.  All shuffles carry type
    counts, never occurrences."""
    from .operators.text import interpolated_nll

    return interpolated_nll(
        _t(spark, sf_dir, "documents"), "doc_id", "text", lam=0.7
    )


@q(
    "q221_normalized_dedup",
    """
    WITH all_docs AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, upper(text) || ' !!!' AS text
      FROM documents
    ),
    norm AS (
      SELECT doc_id,
             md5(trim(regexp_replace(
               regexp_replace(
                 regexp_replace(lower(trim(text)), '[^a-z0-9\\s]', ' ', 'g'),
                 '[0-9]+', '0', 'g'),
               '\\s+', ' ', 'g'))) AS g
      FROM all_docs
    ),
    groups AS (
      SELECT g, count(*) AS n_variants, min(doc_id) AS keeper
      FROM norm GROUP BY g
    )
    SELECT n.doc_id, gr.n_variants, n.doc_id = gr.keeper AS keep
    FROM norm n JOIN groups gr USING (g)
    """,
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-robust exact dedup (operators/dedup.py:
    normalize_text, level='aggressive'): clones that differ only in
    case, punctuation and digit runs collapse to one digest — the CCNet
    pre-pass that makes exact/MinHash dedup catch trivial variants.
    Map-only normalization + one 32-byte digest shuffle."""
    from .operators.dedup import normalize_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit(" !!!")).alias("text"),
    )
    norm = docs.unionAll(clones).select(
        "doc_id",
        F.md5(normalize_text(F.col("text"), level="aggressive")).alias("g"),
    )
    groups = norm.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_variants"), F.min("doc_id").alias("keeper")
    )
    return norm.join(groups, "g").select(
        "doc_id",
        F.col("n_variants").cast("bigint").alias("n_variants"),
        (F.col("doc_id") == F.col("keeper")).alias("keep"),
    )


@q(
    "q222_cluster_dedup_keep_best",
    f"""
    WITH RECURSIVE all_docs AS (
      SELECT doc_id, text FROM documents UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' zzz' AS text
      FROM documents WHERE doc_id < 20
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    ),
    sym AS (
      SELECT id_a AS s, id_b AS dd FROM cand
      UNION
      SELECT id_b AS s, id_a AS dd FROM cand
    ),
    verts AS (SELECT DISTINCT s AS id FROM sym),
    reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT sym.dd, reach.r FROM reach JOIN sym ON sym.s = reach.id
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    labeled AS (
      SELECT a.doc_id AS id,
             coalesce(c.component, a.doc_id) AS component,
             length(a.text) AS q
      FROM all_docs a LEFT JOIN comp c ON c.id = a.doc_id
    )
    SELECT id, component,
           row_number() OVER (PARTITION BY component
                              ORDER BY q DESC, id) = 1 AS keep
    FROM labeled
    """,
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware cluster dedup (operators/dedup.py: cluster_dedup
    keep_by=): same LSH-pair + connected-components chain as q207, but
    each near-dup component keeps its LONGEST member (ties -> smaller
    id) — the Dolma/FineWeb policy.  Here the ' zzz'-suffixed clones
    outrank their originals, flipping the representative q207 picks."""
    from .operators.dedup import cluster_dedup

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = docs.filter(F.col("doc_id") < 20)
    all_docs = docs.unionAll(
        extra.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    ).unionAll(
        extra.select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        )
    )
    return cluster_dedup(
        all_docs, "doc_id", "text", keep_by=F.length("text")
    ).select("id", "component", "keep")


@q(
    "q223_ridge_fit_2d",
    """
    WITH e AS (
      SELECT embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y,
             embedding[4]::DOUBLE AS t
      FROM embeddings
    ),
    m AS (
      SELECT count(*)::DOUBLE AS n, avg(x) AS mx, avg(y) AS my, avg(t) AS mt,
             sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy,
             sum(x * t) AS sxt, sum(y * t) AS syt
      FROM e
    ),
    c AS (
      SELECT mx, my, mt,
             sxx / n - mx * mx + 0.01 AS a11,
             sxy / n - mx * my AS a12,
             syy / n - my * my + 0.01 AS a22,
             sxt / n - mx * mt AS b1,
             syt / n - my * mt AS b2
      FROM m
    ),
    w AS (
      SELECT mx, my, mt,
             (a22 * b1 - a12 * b2) / (a11 * a22 - a12 * a12) AS w0,
             (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS w1
      FROM c
    )
    SELECT 0::BIGINT AS dim, round(w0, 9) AS w FROM w
    UNION ALL
    SELECT 1::BIGINT AS dim, round(w1, 9) AS w FROM w
    UNION ALL
    SELECT -1::BIGINT AS dim, round(mt - w0 * mx - w1 * my, 9) AS w FROM w
    """,
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (operators/similarity.py: ridge_fit,
    l2=0.01): predict embedding dim 3 from dims 0-1.  One D²-bounded
    moment aggregation, driver-side numpy solve; the oracle inverts the
    2x2 centered system with Cramer's rule.  Bias emitted as dim -1."""
    from .operators.similarity import ridge_fit

    emb = _t(spark, sf_dir, "embeddings").select(
        F.slice(F.col("embedding").cast("array<double>"), 1, 2).alias("x"),
        F.element_at(F.col("embedding").cast("array<double>"), 4).alias("t"),
    )
    w, b = ridge_fit(emb, "x", "t", l2=0.01, fit_intercept=True)
    rows = [(int(j), float(w[j])) for j in range(len(w))] + [(-1, float(b))]
    return spark.createDataFrame(rows, "dim long, w double")


@q(
    "q224_ivf_trained_codebook",
    """

    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    cent_ids AS (
      SELECT vec_id AS cvid,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell
      FROM embeddings ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    ce AS (SELECT c.cell, e.i, e.v FROM cent_ids c JOIN e ON e.vec_id = c.cvid),
    cnorm AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce GROUP BY cell),
    vcdot AS (
      SELECT e.vec_id, ce.cell, sum(e.v * ce.v) AS dot
      FROM e JOIN ce ON ce.i = e.i
      GROUP BY 1, 2
    ),
    vc AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm cn ON cn.cell = d.cell
    ),
    assign1 AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc
      ) WHERE rk = 1
    ),
    ce2 AS (
      SELECT a.cell, e.i, round(avg(e.v), 6) AS v
      FROM assign1 a JOIN e USING (vec_id) GROUP BY 1, 2
    ),
    cnorm2 AS (SELECT cell, sqrt(sum(v * v)) AS cn FROM ce2 GROUP BY cell),
    vcdot2 AS (
      SELECT e.vec_id, ce2.cell, sum(e.v * ce2.v) AS dot
      FROM e JOIN ce2 ON ce2.i = e.i
      GROUP BY 1, 2
    ),
    vc2 AS (
      SELECT d.vec_id, d.cell, round(d.dot / (n.nrm * cn.cn), 6) AS cos
      FROM vcdot2 d
      JOIN norms n ON n.vec_id = d.vec_id
      JOIN cnorm2 cn ON cn.cell = d.cell
    ),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc2
      ) WHERE rk = 1
    ),
    qprobe AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cell) AS rk
        FROM vc2 WHERE vec_id < 5
      ) WHERE rk <= 3
    ),
    cand AS (
      SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
      FROM qprobe q JOIN assign a ON a.cell = q.cell
      WHERE a.vec_id <> q.query_id
    ),
    dots AS (
      SELECT c.query_id, c.neighbor_id, sum(eq.v * ec.v) AS dot
      FROM cand c
      JOIN e eq ON eq.vec_id = c.query_id
      JOIN e ec ON ec.vec_id = c.neighbor_id AND ec.i = eq.i
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id, round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
      FROM scored
    ) WHERE rank <= 10

    """,
)
def q224(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL IVF lifecycle: train the codebook with a Lloyd iteration
    (kmeans_fit, = the q73 update) and search with it (ivf_topk
    centroids=) — codebook training and probing composed end-to-end, the
    production path q61\'s seed-centroid variant stands in for.  The
    oracle replays training AND search in SQL."""
    from .operators.similarity import ivf_topk, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = [
        (int(r["cell"]), [float(x) for x in r["centroid"]])
        for r in kmeans_fit(emb, "vec_id", "embedding", nlist=16, n_iter=1).collect()
    ]
    return ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 5),
        "vec_id",
        "embedding",
        k=10,
        nprobe=3,
        centroids=cents,
    )


@q(
    "q225_bootstrap_mean_ci",
    """
    WITH src AS (
      SELECT doc_id::VARCHAR AS id, n_chars::DOUBLE AS v
      FROM documents WHERE n_chars IS NOT NULL
    ),
    rep AS (
      SELECT id, v, unnest(range(50)) AS rep FROM src
    ),
    w AS (
      SELECT rep,
             CASE
               WHEN u < 0.367879441 THEN 0
               WHEN u < 0.735758882 THEN 1
               WHEN u < 0.919698603 THEN 2
               WHEN u < 0.981011843 THEN 3
               WHEN u < 0.996340153 THEN 4
               WHEN u < 0.999405815 THEN 5
               WHEN u < 0.999916758 THEN 6
               ELSE 7
             END::DOUBLE AS wt,
             v
      FROM (
        SELECT rep, v,
               ('0x' || substr(md5(id || '|' || rep::VARCHAR), 1, 8))::BIGINT::DOUBLE
                 / 4294967296.0 AS u
        FROM rep
      )
    ),
    per_rep AS (
      SELECT rep, sum(wt * v) / sum(wt) AS m FROM w GROUP BY rep
    ),
    ranked AS (
      SELECT m, row_number() OVER (ORDER BY m, rep) AS rk FROM per_rep
    ),
    bracket AS (
      SELECT max(CASE WHEN rk = 2 THEN m END) AS lo,
             max(CASE WHEN rk = 49 THEN m END) AS hi
      FROM ranked
    )
    SELECT (SELECT count(*) FROM src)::BIGINT AS n,
           50::BIGINT AS n_boot,
           round((SELECT avg(v) FROM src), 6) AS mean,
           round(lo, 6) AS ci_lo,
           round(hi, 6) AS ci_hi
    FROM bracket
    """,
)
def q225(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for a corpus mean (operators/profile.py:
    bootstrap_mean_ci, n_boot=50): each row joins replicate r a
    Poisson(1) number of times drawn from md5(id|r) through the shared
    inverse-CDF literals — the distributed bootstrap (Chamandy et al.)
    whose only shuffle is n_boot (sum, count) partials."""
    from .operators.profile import bootstrap_mean_ci

    docs = _t(spark, sf_dir, "documents")
    return bootstrap_mean_ci(docs, "doc_id", "n_chars", n_boot=50)


@q(
    "q226_image_dedup_clusters",
    f"""
    WITH RECURSIVE all_docs AS ({_DOCS_PLUS_CLONES}),
    h AS (
      SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS phash
      FROM all_docs
    ),
    bands AS (
      SELECT doc_id, phash, b, (phash >> (b * 15)) & 32767 AS bv
      FROM h, unnest([0, 1, 2, 3]) AS t(b)
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l
      JOIN bands r ON l.b = r.b AND l.bv = r.bv AND l.doc_id < r.doc_id
      WHERE bit_count(xor(l.phash, r.phash)) <= 3
    ),
    sym AS (
      SELECT id_a AS s, id_b AS dd FROM cand
      UNION
      SELECT id_b AS s, id_a AS dd FROM cand
    ),
    verts AS (SELECT DISTINCT s AS id FROM sym),
    reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT sym.dd, reach.r FROM reach JOIN sym ON sym.s = reach.id
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
    SELECT a.doc_id AS id,
           coalesce(c.component, a.doc_id) AS component,
           (coalesce(c.component, a.doc_id) = a.doc_id) AS keep
    FROM all_docs a LEFT JOIN comp c ON c.id = a.doc_id
    """,
)
def q226(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup dedup END-TO-END on real bytes: render PNGs,
    perceptual-hash (real decode), pigeonhole-banded Hamming pairs
    (q175's chain), then distributed connected components pick one
    representative per visual cluster (q207's chain) — the multimodal
    twin of text cluster dedup.  The oracle replays hashes (md5-prefix
    identity), banding, Hamming verify and components in SQL."""
    from .operators.clusters import dedup_clusters
    from .operators.multimodal import (
        generate_images,
        hamming_near_dup,
        perceptual_hash,
    )

    docs = _docs_plus_clones(spark, sf_dir)
    imgs = generate_images(docs, "doc_id", "text", style="blocks")
    hashes = perceptual_hash(imgs, "id", decode_stub=False, method="ahash")
    pairs = hamming_near_dup(hashes, "id", "phash").filter(F.col("hamming") <= 3)
    comp = dedup_clusters(pairs, id_a="id_a", id_b="id_b")
    base = docs.select(F.col("doc_id").alias("id"))
    return (
        base.join(comp, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cluster_id"), F.col("id")).alias("component"),
        )
        .withColumn("keep", F.col("id") == F.col("component"))
    )


@q(
    "q227_curation_v2_mixture",
    """
    WITH all_docs AS (
      SELECT doc_id, lang, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, lang, upper(text) || ' !!!' AS text
      FROM documents
    ),
    norm AS (
      SELECT doc_id, lang,
             md5(trim(regexp_replace(
               regexp_replace(
                 regexp_replace(lower(trim(text)), '[^a-z0-9\\s]', ' ', 'g'),
                 '[0-9]+', '0', 'g'),
               '\\s+', ' ', 'g'))) AS g
      FROM all_docs
    ),
    keep AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY g ORDER BY doc_id) AS rk
        FROM norm
      ) WHERE rk = 1
    ),
    c AS (SELECT lang, count(*) AS cnt FROM keep GROUP BY lang),
    t AS (SELECT sum(pow(cnt, 0.5)) AS z, sum(cnt) AS n FROM c),
    w AS (
      SELECT lang, round(pow(cnt, 0.5) / z * n / cnt, 9) AS weight
      FROM c, t
    ),
    d AS (
      SELECT k.doc_id, k.lang, w.weight,
             CAST(floor(w.weight) AS INT)
             + CASE WHEN ('0x' || substr(md5(k.doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
                         / 4294967296.0 < w.weight - floor(w.weight)
                    THEN 1 ELSE 0 END AS nc
      FROM keep k JOIN w USING (lang)
    )
    SELECT doc_id, lang, weight, unnest(range(nc)) AS copy_idx
    FROM d WHERE nc > 0
    """,
)
def q227(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation v2 flagship: normalization-robust exact dedup
    (normalize_text aggressive -> digest groupBy, min-id survivor) feeds
    temperature mixture re-sampling (tau=0.5 by lang) — the dedup ->
    rebalance chain of a multilingual pretraining pipeline, composed
    from the verified q221 + q214 operators.  One digest shuffle + one
    per-lang count + a shuffle-free copy explode."""
    from .operators.clusters import temperature_mixture
    from .operators.dedup import normalize_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    clones = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "lang",
        F.concat(F.upper("text"), F.lit(" !!!")).alias("text"),
    )
    norm = docs.unionAll(clones).select(
        "doc_id",
        "lang",
        F.md5(normalize_text(F.col("text"), level="aggressive")).alias("g"),
    )
    from pyspark.sql import Window

    keep = (
        norm.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.col("doc_id").asc())
            ),
        )
        .filter(F.col("__rk") == 1)
        .select("doc_id", "lang")
    )
    return temperature_mixture(keep, "doc_id", "lang", tau=0.5).select(
        "doc_id", "lang", "weight", "copy_idx"
    )


@q(
    "q228_quantization_recall",
    """
    WITH e AS (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             unnest(embedding)::DOUBLE AS v
      FROM embeddings
    ),
    st AS (SELECT i, min(v) AS mn, max(v) AS mx FROM e GROUP BY i),
    r AS (
      SELECT e.vec_id, e.i,
             CASE WHEN st.mx > st.mn
                  THEN round(
                    CAST(floor((e.v - st.mn) / (st.mx - st.mn) * 255.0 + 0.5) AS INT)
                      / 255.0 * (st.mx - st.mn) + st.mn, 6)
                  ELSE round(st.mn, 6) END AS rv
      FROM e JOIN st USING (i)
    ),
    nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS n FROM e GROUP BY vec_id),
    nrmr AS (SELECT vec_id, sqrt(sum(rv * rv)) AS n FROM r GROUP BY vec_id),
    exact AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(sum(eq.v * ec.v) / (nq.n * nc.n), 6) DESC,
                        c.vec_id) AS rk
      FROM (SELECT DISTINCT vec_id FROM e WHERE vec_id < 5) q
      JOIN (SELECT DISTINCT vec_id FROM e) c ON c.vec_id <> q.vec_id
      JOIN e eq ON eq.vec_id = q.vec_id
      JOIN e ec ON ec.vec_id = c.vec_id AND ec.i = eq.i
      JOIN nrm nq ON nq.vec_id = q.vec_id
      JOIN nrm nc ON nc.vec_id = c.vec_id
      GROUP BY q.vec_id, c.vec_id, nq.n, nc.n
    ),
    quant AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(sum(rq.rv * rc.rv) / (nq.n * nc.n), 6) DESC,
                        c.vec_id) AS rk
      FROM (SELECT DISTINCT vec_id FROM r WHERE vec_id < 5) q
      JOIN (SELECT DISTINCT vec_id FROM r) c ON c.vec_id <> q.vec_id
      JOIN r rq ON rq.vec_id = q.vec_id
      JOIN r rc ON rc.vec_id = c.vec_id AND rc.i = rq.i
      JOIN nrmr nq ON nq.vec_id = q.vec_id
      JOIN nrmr nc ON nc.vec_id = c.vec_id
      GROUP BY q.vec_id, c.vec_id, nq.n, nc.n
    )
    SELECT ex.query_id,
           round(count(qu.neighbor_id) / 10.0, 6) AS recall_at_10
    FROM (SELECT * FROM exact WHERE rk <= 10) ex
    LEFT JOIN (SELECT * FROM quant WHERE rk <= 10) qu
      ON qu.query_id = ex.query_id AND qu.neighbor_id = ex.neighbor_id
    GROUP BY ex.query_id
    """,
)
def q228(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization quality eval: recall@10 of int8-reconstructed
    vectors (quantize_int8 reconstruct=True) against the exact top-10
    (brute_force_topk on both sides, same rounded-cosine ranking) — the
    accept/reject gauge before swapping an ANN index to int8 storage."""
    from .operators.similarity import brute_force_topk, quantize_int8

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, qs, "vec_id", "embedding", k=10)
    rec = quantize_int8(emb, "vec_id", "embedding", reconstruct=True).select(
        "vec_id", F.col("recon").alias("embedding")
    )
    qrec = rec.filter(F.col("vec_id") < 5)
    quant = brute_force_topk(rec, qrec, "vec_id", "embedding", k=10)
    inter = exact.join(
        quant.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1)),
        ["query_id", "neighbor_id"],
        "left",
    )
    return inter.groupBy("query_id").agg(
        F.round(F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / 10.0, 6).alias(
            "recall_at_10"
        )
    )


@q(
    "q229_langid_confusion",
    f"""
    WITH toks AS (SELECT doc_id, lang, {_TOKS} AS t FROM documents),
    hits AS (
      SELECT doc_id, lang,
        len(list_filter(t, x -> x IN ('the','and','of','to','in','is','that','it','with','for'))) AS h_en,
        len(list_filter(t, x -> x IN ('der','die','das','und','ist','nicht','mit','ein','zu','von'))) AS h_de,
        len(list_filter(t, x -> x IN ('le','la','les','et','est','pas','pour','que','une','dans'))) AS h_fr,
        len(list_filter(t, x -> x IN ('el','la','los','las','es','no','por','que','una','para'))) AS h_es
      FROM toks
    ),
    pred AS (
      SELECT doc_id, lang AS true_lang,
             CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
                  WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
                  WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
                  WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
                  ELSE 'de' END AS pred_lang
      FROM hits
    )
    SELECT true_lang, pred_lang, count(*) AS n_docs,
           round(CASE WHEN true_lang = pred_lang THEN 1.0 ELSE 0.0 END, 6)
             AS cell_acc,
           (SELECT round(sum(CASE WHEN p2.true_lang = p2.pred_lang
                                  THEN 1.0 ELSE 0.0 END) / count(*), 6)
            FROM pred p2) AS overall_acc
    FROM pred
    GROUP BY true_lang, pred_lang
    """,
)
def q229(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class evaluation of the n-gram lang-ID heuristic against
    the corpus's true lang column: confusion-matrix cells plus overall
    accuracy — the eval gate before trusting a classifier to route a
    multilingual corpus.  One prediction scan + a |langs|²-bounded
    aggregate."""
    from .operators.text import lang_id

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pred = lang_id(docs, "doc_id", "text").select("doc_id", "pred_lang")
    joined = docs.select("doc_id", F.col("lang").alias("true_lang")).join(
        pred, "doc_id"
    )
    total = joined.count()
    correct = joined.filter(F.col("true_lang") == F.col("pred_lang")).count()
    return (
        joined.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "cell_acc",
            F.round(
                F.when(
                    F.col("true_lang") == F.col("pred_lang"), F.lit(1.0)
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .withColumn(
            "overall_acc", F.round(F.lit(float(correct) / float(total)), 6)
        )
    )


@q(
    "q230_dedup_report",
    f"""
    WITH RECURSIVE all_docs AS (
      SELECT doc_id, text FROM documents UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 20
      UNION ALL
      SELECT doc_id + 2000000 AS doc_id, text || ' zzz' AS text
      FROM documents WHERE doc_id < 20
    ),
    exact AS (
      SELECT count(*) - count(DISTINCT md5(text)) AS n_exact_dups
      FROM all_docs
    ),
    toks AS (SELECT doc_id, {_TOKS} AS t FROM all_docs),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS shingle FROM toks),
    mins AS (
      SELECT doc_id,
             {_MINHASH_MINS8}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, 0 AS b, md5(h0::VARCHAR || '|' || h1::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 1 AS b, md5(h2::VARCHAR || '|' || h3::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 2 AS b, md5(h4::VARCHAR || '|' || h5::VARCHAR) AS d FROM mins UNION ALL
      SELECT doc_id, 3 AS b, md5(h6::VARCHAR || '|' || h7::VARCHAR) AS d FROM mins
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r ON l.b = r.b AND l.d = r.d AND l.doc_id < r.doc_id
    ),
    sym AS (
      SELECT id_a AS s, id_b AS dd FROM cand
      UNION
      SELECT id_b AS s, id_a AS dd FROM cand
    ),
    verts AS (SELECT DISTINCT s AS id FROM sym),
    reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT sym.dd, reach.r FROM reach JOIN sym ON sym.s = reach.id
    ),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    lab AS (
      SELECT a.doc_id, coalesce(c.component, a.doc_id) AS component
      FROM all_docs a LEFT JOIN comp c ON c.id = a.doc_id
    )
    SELECT (SELECT count(*) FROM all_docs)::BIGINT AS n_docs,
           (SELECT n_exact_dups FROM exact)::BIGINT AS n_exact_dups,
           (SELECT count(*) FROM cand)::BIGINT AS n_candidate_pairs,
           (SELECT count(DISTINCT component) FROM lab)::BIGINT AS n_clusters,
           (SELECT count(*) FROM lab WHERE doc_id = component)::BIGINT AS n_survivors,
           round(1.0 - (SELECT count(*) FROM lab WHERE doc_id = component)
                       / (SELECT count(*) FROM all_docs), 6) AS frac_removed
    """,
)
def q230(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup effectiveness report — the artifact a curation run
    logs: corpus size, exact-dup count (content digests), LSH candidate
    pairs, near-dup cluster count, survivors and removal fraction, all
    composed from the verified exact-dedup + LSH + connected-components
    chains on the clones corpus."""
    from .operators.dedup import exact_dedup_by_content, lsh_candidate_pairs
    from .operators.clusters import dedup_clusters

    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    extra = base.filter(F.col("doc_id") < 20)
    docs = base.unionAll(
        extra.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    ).unionAll(
        extra.select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        )
    )
    n_docs = docs.count()
    n_unique = exact_dedup_by_content(docs, "doc_id", "text").count()
    pairs = lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    pairs = pairs.persist()
    n_pairs = pairs.count()
    comp = dedup_clusters(pairs, id_a="id_a", id_b="id_b")
    lab = (
        docs.select(F.col("doc_id").alias("id"))
        .join(comp, "id", "left")
        .select(
            "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("component")
        )
    )
    n_clusters = lab.select("component").distinct().count()
    n_surv = lab.filter(F.col("id") == F.col("component")).count()
    pairs.unpersist()
    row = [(
        int(n_docs), int(n_docs - n_unique), int(n_pairs), int(n_clusters),
        int(n_surv), round(1.0 - n_surv / n_docs, 6),
    )]
    return spark.createDataFrame(
        row,
        "n_docs bigint, n_exact_dups bigint, n_candidate_pairs bigint, "
        "n_clusters bigint, n_survivors bigint, frac_removed double",
    )


@q(
    "q231_video_frame_sample",
    """
    SELECT doc_id AS id, (j * 2)::BIGINT AS frame_idx,
           round(('0x' || substr(md5(text), j * 4 + 1, 2))::BIGINT + 0.0, 6)
               AS mean_luma
    FROM documents, unnest([0, 1, 2, 3]) AS t(j)
    """,
)
def q231(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end-to-end (the AVI twin of q202/q208): render
    one uncompressed AVI per document (operators/multimodal.py:
    generate_videos — 8 constant-gray frames, level = md5 byte i), then
    sample_frames with decode_stub=False (operators/avicodec.py: RIFF
    parse → bottom-up BGR DIB decode → BT.601 luma mean).  Sampling 4 of
    8 frames takes indices 0,2,4,6; the decoded mean luminance of frame
    i is EXACTLY md5-byte i (constant frames, lossless container), which
    the oracle computes from the hex digest without any codec."""
    from .operators.multimodal import generate_videos, sample_frames

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    vids = generate_videos(docs, "doc_id", "text", n_frames=8)
    frames = sample_frames(vids, "id", n_frames=4, decode_stub=False)
    return frames.select(
        "id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.round("mean_luma", 6).alias("mean_luma"),
    )


@q(
    "q232_line_dedup",
    """
    WITH d AS (
      SELECT doc_id,
             concat(text, chr(10), 'COMMON FOOTER', chr(10),
                    'unique ', doc_id) AS t
      FROM documents
    ),
    s AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
    ln AS (
      SELECT doc_id, i AS pos, ls[i] AS line
      FROM s, (SELECT unnest(range(1, 17)) AS i) r
      WHERE i <= len(ls)
    ),
    cnt AS (SELECT line, count(*) AS c FROM ln GROUP BY line),
    keep AS (
      SELECT l.doc_id, l.pos, l.line
      FROM ln l JOIN cnt USING (line) WHERE c < 2
    ),
    agg AS (
      SELECT doc_id,
             string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             count(*) AS n_kept
      FROM keep GROUP BY doc_id
    )
    SELECT s.doc_id AS id,
           coalesce(a.clean_text, '') AS clean_text,
           len(s.ls)::BIGINT AS n_lines,
           coalesce(a.n_kept, 0)::BIGINT AS n_kept
    FROM s LEFT JOIN agg a USING (doc_id)
    """,
)
def q232(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style corpus-wide line dedup
    (operators/dedup.py:line_dedup): a shared footer line is injected
    into every document plus one per-doc unique line; the operator must
    drop the footer everywhere (corpus count >= 2) and keep the unique
    lines and unique document bodies, reassembled in original order."""
    from .operators.dedup import line_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\nCOMMON FOOTER\nunique "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return line_dedup(docs, "doc_id", "text", min_dup=2)


@q(
    "q233_dsir_logratio",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 2 THEN
          [array_to_string(t[i+1:i+2], ' ') for i in range(len(t)-1)]
        WHEN len(t) > 0 THEN [array_to_string(t, ' ')] ELSE [] END)) AS gram
      FROM toks
    ),
    b AS (
      SELECT doc_id,
             ('0x' || substr(md5(gram), 1, 8))::BIGINT % 1024 AS bucket
      FROM g
    ),
    src AS (SELECT bucket, count(*) AS cs FROM b GROUP BY bucket),
    tgt AS (
      SELECT bucket, count(*) AS ct FROM b WHERE doc_id % 20 = 0
      GROUP BY bucket
    ),
    tot AS (SELECT (SELECT sum(cs) FROM src) AS ts,
                   (SELECT sum(ct) FROM tgt) AS tt),
    ratio AS (
      SELECT s.bucket,
             CAST(round(round(ln((coalesce(t.ct, 0) + 1.0) / (tot.tt + 1024.0))
                 - ln((s.cs + 1.0) / (tot.ts + 1024.0)), 6) * 1000000,
                 0) AS BIGINT) AS lr_u
      FROM src s LEFT JOIN tgt t USING (bucket), tot
    )
    SELECT b.doc_id AS id, count(*)::BIGINT AS n_grams,
           sum(r.lr_u) / 1000000.0 AS log_weight
    FROM b JOIN ratio r USING (bucket)
    GROUP BY b.doc_id
    """,
)
def q233(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scoring (operators/text.py:dsir_logratio): rank
    corpus documents by hashed-bigram log-likelihood ratio against a
    deterministic target sample (doc_id % 20 == 0) — the data-selection
    pass that picks pretraining documents resembling a target domain."""
    from .operators.text import dsir_logratio

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") % 20 == 0)
    return dsir_logratio(docs, "doc_id", "text", target, n=2, n_buckets=1024)


@q(
    "q234_bloom_anti_join",
    """
    WITH d AS (SELECT doc_id, substr(text, 1, 12) AS k, n_chars
               FROM documents),
    ref AS (SELECT DISTINCT k FROM d WHERE doc_id % 2 = 0)
    SELECT d.doc_id AS id, d.k AS key, d.n_chars
    FROM d
    WHERE d.doc_id % 3 = 0
      AND NOT EXISTS (SELECT 1 FROM ref r WHERE r.k = d.k)
    """,
)
def q234(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered EXACT anti join (operators/sketches.py:
    bloom_anti_join): "is this crawl record already in the corpus?" at
    100 TB — keys that miss the broadcast-sized bitmap-words table skip
    the wide join entirely; only the filter-positive sliver pays the
    exact left-anti shuffle.  Keys are 12-char text prefixes so the
    probe side genuinely collides with the reference across doc ids."""
    from .operators.sketches import bloom_anti_join

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.substring("text", 1, 12).alias("key"),
        "n_chars",
    )
    new = docs.filter(F.col("id") % 3 == 0)
    ref = docs.filter(F.col("id") % 2 == 0).select("key")
    return bloom_anti_join(new, ref, "key", num_bits=1 << 16, num_hashes=5)


@q(
    "q235_vocab_drift",
    f"""
    WITH toks AS (SELECT lang, {_TOKS} AS t FROM documents
                  WHERE lang IS NOT NULL),
    tok AS (SELECT lang, unnest(t) AS tk FROM toks),
    b AS (SELECT lang,
                 ('0x' || substr(md5(tk), 1, 8))::BIGINT % 1024 AS bucket
          FROM tok),
    cnt AS (SELECT lang, bucket, count(*) AS c FROM b GROUP BY lang, bucket),
    tot AS (SELECT lang, sum(c) AS t FROM cnt GROUP BY lang),
    grid AS (SELECT g.lang, r.i AS bucket
             FROM (SELECT DISTINCT lang FROM cnt) g,
                  (SELECT unnest(range(1024)) AS i) r),
    filled AS (SELECT gr.lang, gr.bucket, coalesce(cnt.c, 0) AS c
               FROM grid gr LEFT JOIN cnt
                 ON cnt.lang = gr.lang AND cnt.bucket = gr.bucket),
    pairs AS (SELECT a.lang AS ga, bb.lang AS gb, a.bucket,
                     a.c AS ca, bb.c AS cb
              FROM filled a JOIN filled bb
                ON a.bucket = bb.bucket AND a.lang < bb.lang),
    terms AS (
      SELECT ga, gb,
        CAST(round(round(
            0.5 * ((ca + 1.0) / (ta.t + 1024.0))
              * ln(((ca + 1.0) / (ta.t + 1024.0))
                   / ((((ca + 1.0) / (ta.t + 1024.0))
                       + ((cb + 1.0) / (tb.t + 1024.0))) / 2))
          + 0.5 * ((cb + 1.0) / (tb.t + 1024.0))
              * ln(((cb + 1.0) / (tb.t + 1024.0))
                   / ((((ca + 1.0) / (ta.t + 1024.0))
                       + ((cb + 1.0) / (tb.t + 1024.0))) / 2)),
          6) * 1000000, 0) AS BIGINT) AS u
      FROM pairs
      JOIN tot ta ON ta.lang = pairs.ga
      JOIN tot tb ON tb.lang = pairs.gb
    )
    SELECT t.ga AS group_a, t.gb AS group_b,
           ta2.t::BIGINT AS n_tokens_a, tb2.t::BIGINT AS n_tokens_b,
           sum(t.u) / 1000000.0 AS js_divergence
    FROM terms t
    JOIN tot ta2 ON ta2.lang = t.ga
    JOIN tot tb2 ON tb2.lang = t.gb
    GROUP BY t.ga, t.gb, ta2.t, tb2.t
    """,
)
def q235(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary drift (operators/text.py:vocab_drift): pairwise
    Jensen-Shannon divergence between per-language hashed unigram
    distributions — the "did this slice of the corpus shift?" monitor,
    with the same integer-micro-unit exactness trick as DSIR."""
    from .operators.text import vocab_drift

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return vocab_drift(docs, "text", "lang", n_buckets=1024)


@q(
    "q236_cross_group_overlap",
    """
    WITH d AS (SELECT DISTINCT lang AS g, md5(text) AS dg
               FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL),
    sz AS (SELECT g, count(*) AS n FROM d GROUP BY g),
    sh AS (SELECT a.g AS group_a, b.g AS group_b, count(*) AS n_shared
           FROM d a JOIN d b ON a.dg = b.dg AND a.g < b.g
           GROUP BY a.g, b.g)
    SELECT pa.g AS group_a, pb.g AS group_b,
           coalesce(sh.n_shared, 0)::BIGINT AS n_shared,
           pa.n::BIGINT AS n_a, pb.n::BIGINT AS n_b,
           round(coalesce(sh.n_shared, 0)
                 / (pa.n + pb.n - coalesce(sh.n_shared, 0)), 6) AS jaccard
    FROM sz pa JOIN sz pb ON pa.g < pb.g
    LEFT JOIN sh ON sh.group_a = pa.g AND sh.group_b = pb.g
    """,
)
def q236(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-content overlap matrix
    (operators/dedup.py:cross_group_overlap): distinct-digest Jaccard
    between every pair of languages — the "source B is a re-crawl of
    source A" provenance diagnostic run before mixture weighting."""
    from .operators.dedup import cross_group_overlap

    docs = _t(spark, sf_dir, "documents").select("text", "lang")
    return cross_group_overlap(docs, "text", "lang")


@q(
    "q237_ks_drift",
    """
    WITH v AS (SELECT lang AS g, n_chars::DOUBLE AS v FROM documents
               WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
    cnt AS (SELECT g, v, count(*) AS c FROM v GROUP BY g, v),
    sz AS (SELECT g, sum(c) AS n FROM cnt GROUP BY g),
    pairs AS (SELECT a.g AS ga, b.g AS gb, a.n AS na, b.n AS nb
              FROM sz a JOIN sz b ON a.g < b.g),
    vals AS (
      SELECT DISTINCT p.ga, p.gb, c.v
      FROM pairs p JOIN cnt c ON c.g = p.ga OR c.g = p.gb
    ),
    grid AS (
      SELECT vl.ga, vl.gb, vl.v,
             coalesce(a.c, 0) AS ca, coalesce(b.c, 0) AS cb
      FROM vals vl
      LEFT JOIN cnt a ON a.g = vl.ga AND a.v = vl.v
      LEFT JOIN cnt b ON b.g = vl.gb AND b.v = vl.v
    ),
    cdf AS (
      SELECT ga, gb,
             sum(ca) OVER (PARTITION BY ga, gb ORDER BY v) AS cum_a,
             sum(cb) OVER (PARTITION BY ga, gb ORDER BY v) AS cum_b
      FROM grid
    )
    SELECT c.ga AS group_a, c.gb AS group_b,
           p.na::BIGINT AS n_a, p.nb::BIGINT AS n_b,
           round(max(abs(c.cum_a / p.na - c.cum_b / p.nb)), 6) AS ks_stat
    FROM cdf c JOIN pairs p ON p.ga = c.ga AND p.gb = c.gb
    GROUP BY c.ga, c.gb, p.na, p.nb
    """,
)
def q237(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-feature drift (operators/profile.py:ks_drift): exact
    two-sample Kolmogorov-Smirnov statistic of the document-length
    distribution between every language pair — vocab_drift's numeric
    twin for corpus monitoring."""
    from .operators.profile import ks_drift

    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    return ks_drift(docs, "n_chars", "lang")


@q(
    "q238_psi_drift",
    """
    WITH v AS (SELECT lang AS g, n_chars::DOUBLE AS v FROM documents
               WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
    edges AS (
      SELECT quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS e
      FROM v WHERE g = (SELECT min(g) FROM v)
    ),
    binned AS (
      SELECT g,
             CASE WHEN v <= e[1] THEN 0 WHEN v <= e[2] THEN 1
                  WHEN v <= e[3] THEN 2 WHEN v <= e[4] THEN 3
                  WHEN v <= e[5] THEN 4 WHEN v <= e[6] THEN 5
                  WHEN v <= e[7] THEN 6 WHEN v <= e[8] THEN 7
                  WHEN v <= e[9] THEN 8 ELSE 9 END AS b
      FROM v, edges
    ),
    cnt AS (SELECT g, b, count(*) AS c FROM binned GROUP BY g, b),
    grid AS (SELECT gg.g, r.i AS b
             FROM (SELECT DISTINCT g FROM cnt) gg,
                  (SELECT unnest(range(10)) AS i) r),
    filled AS (SELECT grid.g, grid.b, coalesce(cnt.c, 0) AS c
               FROM grid LEFT JOIN cnt
                 ON cnt.g = grid.g AND cnt.b = grid.b),
    tot AS (SELECT g, sum(c) AS n FROM filled GROUP BY g),
    ref AS (SELECT f.b, f.c AS c_ref, t.n AS n_ref
            FROM filled f JOIN tot t ON t.g = f.g
            WHERE f.g = (SELECT min(g) FROM v)),
    terms AS (
      SELECT f.g,
        CAST(round(round(
            (((f.c + 0.5) / (t.n + 5.0)) - ((r.c_ref + 0.5) / (r.n_ref + 5.0)))
            * ln(((f.c + 0.5) / (t.n + 5.0)) / ((r.c_ref + 0.5) / (r.n_ref + 5.0))),
          6) * 1000000, 0) AS BIGINT) AS u,
        r.n_ref, t.n
      FROM filled f
      JOIN tot t ON t.g = f.g
      JOIN ref r ON r.b = f.b
      WHERE f.g <> (SELECT min(g) FROM v)
    )
    SELECT g AS "group", n_ref::BIGINT AS n_ref, n::BIGINT AS n,
           sum(u) / 1000000.0 AS psi
    FROM terms GROUP BY g, n_ref, n
    """,
)
def q238(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index (operators/profile.py:psi_drift):
    binned drift of every language's document-length distribution
    against the lexically-first language as reference — the standard
    model-monitoring drift score beside KS (q237) and JS (q235)."""
    from .operators.profile import psi_drift

    docs = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    ref = docs.filter(F.col("lang").isNotNull()).agg(F.min("lang")).first()[0]
    return psi_drift(docs, "n_chars", "lang", ref, bins=10)


@q(
    "q239_cluster_canonicalize",
    """
    WITH d AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS score
               FROM documents),
    l AS (
      SELECT d.doc_id, d.score,
             (p.doc_id IS NOT NULL AND
              ('0x' || substr(md5((d.doc_id - 1)::VARCHAR), 1, 2))::INT < 128)
               AS link_prev
      FROM d LEFT JOIN d p ON p.doc_id = d.doc_id - 1
    ),
    c AS (
      SELECT doc_id, score,
             max(CASE WHEN NOT link_prev THEN doc_id END)
               OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cluster_id
      FROM l
    ),
    k AS (
      SELECT cluster_id, doc_id AS keep_id FROM (
        SELECT cluster_id, doc_id,
               row_number() OVER (
                 PARTITION BY cluster_id
                 ORDER BY score DESC, doc_id ASC) AS rk
        FROM c) WHERE rk = 1
    )
    SELECT c.doc_id AS id, c.score, c.cluster_id,
           c.doc_id = k.keep_id AS keep,
           CASE WHEN c.doc_id <> k.keep_id THEN k.keep_id END AS dup_of
    FROM c JOIN k USING (cluster_id)
    """,
)
def q239(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup retention (operators/clusters.py:
    canonicalize_clusters): connected components over a candidate-pair
    graph, then the HIGHEST-scoring member of each component survives
    (ties -> min id) and the rest point at it via dup_of — the
    best-document-wins pass pipelines run over LSH/SemDedup pairs.

    The pair graph here is a deterministic md5 chain (doc i links to
    i+1 when md5(i) starts low), so components are multi-hop runs that
    exercise the label-propagation transitivity while the DuckDB oracle
    computes the same clusters with gaps-and-islands."""
    from .operators.clusters import canonicalize_clusters

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("double").alias("score")
    )
    link = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        < 128
    )
    a = docs.select("doc_id").filter(link).alias("a")
    b = docs.select(F.col("doc_id").alias("doc_b")).alias("b")
    pairs = a.join(b, F.col("doc_b") == F.col("doc_id") + 1).select(
        F.col("doc_id").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    return canonicalize_clusters(docs, pairs, "doc_id", "score")


@q(
    "q240_unimax_mixture",
    """
    WITH RECURSIVE b AS (
      SELECT CAST(sum(n_chars) AS DOUBLE) * 0.5 AS bud
      FROM documents WHERE lang IS NOT NULL
    ),
    g AS (
      SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS sz,
             row_number() OVER (
               ORDER BY CAST(sum(n_chars) AS DOUBLE), lang) AS rn,
             count(*) OVER () AS n
      FROM documents WHERE lang IS NOT NULL GROUP BY lang
      HAVING sum(n_chars) IS NOT NULL
    ),
    w AS (
      SELECT g.rn, g.n, g.lang, g.sz,
             least(g.sz * 0.65, b.bud / g.n) AS alloc,
             b.bud - least(g.sz * 0.65, b.bud / g.n) AS rem
      FROM g, b WHERE g.rn = 1
      UNION ALL
      SELECT g.rn, g.n, g.lang, g.sz,
             least(g.sz * 0.65, w.rem / (g.n - w.rn)),
             w.rem - least(g.sz * 0.65, w.rem / (g.n - w.rn))
      FROM g JOIN w ON g.rn = w.rn + 1
    )
    SELECT lang AS "group", CAST(sz AS BIGINT) AS group_size,
           round(alloc, 6) AS alloc_budget,
           round(alloc / (SELECT bud FROM b), 6) AS weight
    FROM w
    """,
)
def q240(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax epoch-capped mixture allocation (operators/clusters.py:
    unimax_mixture; Chung et al., ICLR 2023): split half the corpus's
    character budget across languages, no language repeated past 0.65
    epochs of its own data — the fair multilingual sampling rule.  The
    DuckDB oracle replays the exact waterfill recurrence as a recursive
    CTE (ascending-size order, ties on the language name), so the
    per-group allocations must agree to the rounded 6th decimal."""
    from .operators.clusters import unimax_mixture

    docs = _t(spark, sf_dir, "documents")
    total = (
        docs.filter(F.col("lang").isNotNull()).agg(F.sum("n_chars")).collect()[0][0]
    )
    return unimax_mixture(
        docs, "lang", size_col="n_chars", budget=total * 0.5, max_epochs=0.65
    )


@q(
    "q241_ann_recall_truncated",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    nf AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dotsf AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
      FROM (SELECT * FROM e WHERE vec_id < 5) q
      JOIN e c USING (i)
      WHERE c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ),
    full_k AS (
      SELECT query_id, neighbor_id FROM (
        SELECT d.query_id, d.neighbor_id,
               row_number() OVER (PARTITION BY d.query_id
                 ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC,
                          d.neighbor_id) AS rk
        FROM dotsf d JOIN nf nq ON d.query_id = nq.vec_id
                     JOIN nf nc ON d.neighbor_id = nc.vec_id
      ) WHERE rk <= 10
    ),
    t AS (SELECT * FROM e WHERE i <= 8),
    nt AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM t GROUP BY vec_id),
    dotst AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
      FROM (SELECT * FROM t WHERE vec_id < 5) q
      JOIN t c USING (i)
      WHERE c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ),
    trunc_k AS (
      SELECT query_id, neighbor_id FROM (
        SELECT d.query_id, d.neighbor_id,
               row_number() OVER (PARTITION BY d.query_id
                 ORDER BY round(d.dot / (nq.nrm * nc.nrm), 6) DESC,
                          d.neighbor_id) AS rk
        FROM dotst d JOIN nt nq ON d.query_id = nq.vec_id
                     JOIN nt nc ON d.neighbor_id = nc.vec_id
      ) WHERE rk <= 10
    )
    SELECT f.query_id AS query, count(*) AS n_exact,
           count(a.query_id) AS n_hit,
           round(count(a.query_id)::DOUBLE / count(*), 6) AS recall
    FROM full_k f LEFT JOIN trunc_k a
      ON f.query_id = a.query_id AND f.neighbor_id = a.neighbor_id
    GROUP BY 1
    """,
)
def q241(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN acceptance gate (operators/similarity.py: ann_recall):
    recall@10 of a dimension-truncated probe (first 8 of 64 dims)
    against exact full-dimension cosine top-10, per query.  Both sides
    rank on the ROUNDED cosine (the q31 idiom) so last-ulp summation
    differences between engines cannot flip a rank, and the recall
    aggregation is the operator under test."""
    from .operators.similarity import ann_recall, cosine

    emb = _t(spark, sf_dir, "embeddings")

    def ranked(vec: F.Column) -> DataFrame:
        q_side = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), vec.alias("qv")
        )
        c_side = emb.select(F.col("vec_id").alias("neighbor_id"), vec.alias("cv"))
        scored = (
            c_side.crossJoin(F.broadcast(q_side))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= 10
        )

    full = ranked(F.col("embedding").cast("array<double>"))
    trunc = ranked(F.slice(F.col("embedding").cast("array<double>"), 1, 8))
    return ann_recall(full, trunc)


@q(
    "q242_unimax_resample",
    """
    WITH RECURSIVE b AS (
      SELECT CAST(sum(n_chars) AS DOUBLE) * 0.5 AS bud
      FROM documents WHERE lang IS NOT NULL
    ),
    g AS (
      SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS sz,
             row_number() OVER (
               ORDER BY CAST(sum(n_chars) AS DOUBLE), lang) AS rn,
             count(*) OVER () AS n
      FROM documents WHERE lang IS NOT NULL GROUP BY lang
      HAVING sum(n_chars) IS NOT NULL
    ),
    w AS (
      SELECT g.rn, g.n, g.lang, g.sz,
             least(g.sz * 0.65, b.bud / g.n) AS alloc,
             b.bud - least(g.sz * 0.65, b.bud / g.n) AS rem
      FROM g, b WHERE g.rn = 1
      UNION ALL
      SELECT g.rn, g.n, g.lang, g.sz,
             least(g.sz * 0.65, w.rem / (g.n - w.rn)),
             w.rem - least(g.sz * 0.65, w.rem / (g.n - w.rn))
      FROM g JOIN w ON g.rn = w.rn + 1
    ),
    wt AS (
      SELECT lang,
             round(round(alloc, 6) / CAST(sz AS BIGINT), 9) AS epochs
      FROM w
    ),
    u AS (
      SELECT d.doc_id, d.lang, wt.epochs,
             ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
               / 4294967296.0 AS unif
      FROM documents d JOIN wt USING (lang)
      WHERE d.lang IS NOT NULL
    ),
    n AS (
      SELECT doc_id, lang,
             (floor(epochs) + (unif < epochs - floor(epochs))::INT)::INT
               AS n_copies
      FROM u
    )
    SELECT doc_id, lang, unnest(range(0, n_copies))::BIGINT AS copy_idx
    FROM n WHERE n_copies > 0
    """,
)
def q242(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end UniMax corpus balancing: the q240 waterfill allocation
    converted to per-language epoch weights and fanned out through the
    deterministic md5 mixture (operators/clusters.py: unimax_mixture ->
    mixture_resample).  The allocation table is a driver-side collect
    (one row per language); the fan-out is the shuffle-free ``sequence``
    explode.  Weights round to 9 decimals before the fractional-copy
    test (the temperature_mixture boundary idiom) so Spark and the
    DuckDB replay agree on boundary rows."""
    from .operators.clusters import mixture_resample, unimax_mixture

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    total = (
        docs.filter(F.col("lang").isNotNull()).agg(F.sum("n_chars")).collect()[0][0]
    )
    alloc = unimax_mixture(
        docs, "lang", size_col="n_chars", budget=total * 0.5, max_epochs=0.65
    ).collect()
    weights = {
        r["group"]: round(r["alloc_budget"] / r["group_size"], 9) for r in alloc
    }
    out = mixture_resample(
        docs.filter(F.col("lang").isNotNull()).select("doc_id", "lang"),
        "doc_id",
        "lang",
        weights,
        default_weight=0.0,
    )
    return out.select("doc_id", "lang", "copy_idx")


@q(
    "q243_pq_adc_topk",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS ci,
             e AS ce
      FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
    ),
    spaces AS (SELECT unnest(range(0, 8)) AS j),
    dists AS (
      SELECT v.vec_id, s.j, c.ci,
             round(list_sum([
               (v.e[s.j * 8 + k] - c.ce[s.j * 8 + k]) ^ 2
               for k in range(1, 9)
             ]), 6) AS d
      FROM v CROSS JOIN spaces s CROSS JOIN cent c
    ),
    best AS (
      SELECT vec_id, j, ci,
             row_number() OVER (PARTITION BY vec_id, j ORDER BY d, ci) AS rk
      FROM dists
    ),
    lut AS (
      SELECT q.vec_id AS query_id, s.j, c.ci,
             round(list_sum([
               (q.e[s.j * 8 + k] - c.ce[s.j * 8 + k]) ^ 2
               for k in range(1, 9)
             ]), 6) AS d
      FROM v q CROSS JOIN spaces s CROSS JOIN cent c
      WHERE q.vec_id < 8
    ),
    adc AS (
      SELECT l.query_id, b.vec_id AS neighbor_id, round(sum(l.d), 6) AS adc_dist
      FROM best b JOIN lut l ON l.j = b.j AND l.ci = b.ci
      WHERE b.rk = 1 AND b.vec_id != l.query_id
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT query_id, neighbor_id, adc_dist,
             row_number() OVER (
               PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS r
      FROM adc
    )
    SELECT query_id, neighbor_id, adc_dist, r::BIGINT AS rank
    FROM rk WHERE r <= 10
    """,
)
def q243(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ search (operators/similarity.py: pq_topk)
    over the q115 encoding: the corpus is touched only as its
    (id, subspace, code) bytes, each query precomputes an
    m x n_centroids L2 lookup table as column expressions, and the ADC
    distance is the map-side-combined sum of the broadcast-joined LUT
    entries — the RAM-sized search path of a billion-vector PQ index.
    The DuckDB oracle replays seed sampling, per-subspace encoding, the
    LUT, and the ADC ranking exactly (ties -> smaller neighbor id)."""
    from .operators.similarity import pq_codebooks, pq_codes, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    cbs = pq_codebooks(emb, "vec_id", "embedding", m=8, n_centroids=16)
    codes = pq_codes(
        emb, "vec_id", "embedding", m=8, n_centroids=16, codebooks=cbs
    )
    return pq_topk(
        codes,
        emb.filter(F.col("vec_id") < 8),
        "vec_id",
        "embedding",
        codebooks=cbs,
        k=10,
    )


@q(
    "q244_sharded_brute_force",
    """
    WITH e AS (
      SELECT vec_id, unnest(embedding)::DOUBLE AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.v * c.v) AS dot
      FROM (SELECT * FROM e WHERE vec_id < 8) q
      JOIN e c USING (i)
      WHERE c.vec_id <> q.vec_id
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             round(dot / (nq.nrm * nc.nrm), 6) AS cosine
      FROM dots JOIN norms nq ON query_id = nq.vec_id
                JOIN norms nc ON neighbor_id = nc.vec_id
    )
    SELECT query_id, neighbor_id, cosine, rank FROM (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def q244(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded top-k (operators/similarity.py: topk_sharded): the
    query set splits into bounded hash shards, each rides its own
    broadcast through brute_force_topk, and the union is provably
    identical to the unsharded call (each query's top-k depends only
    on its own vector) — the API form of the enforced broadcast
    contract's "shard your query set" hint.  The oracle is the plain
    unsharded brute-force SQL: shard-union ≡ unsharded is exactly what
    the comparison checks.  round_cosine=6 rounds BEFORE ranking on
    both engines so near-tie ranks resolve identically (the q31
    idiom)."""
    from .operators.similarity import topk_sharded

    emb = _t(spark, sf_dir, "embeddings")
    out = topk_sharded(
        emb,
        emb.filter(F.col("vec_id") < 8),
        "vec_id",
        "embedding",
        shard_rows=3,
        k=10,
        round_cosine=6,
    )
    return out.select("query_id", "neighbor_id", "cosine", "rank")
