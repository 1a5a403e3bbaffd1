"""Analytic query surface over the star schema (SURVEY.md §2.4 A5 and
§2.6): the aggregations the reference's warehouse DDL exists to serve
(starschema_dw.txt:55-77), Spark-native, each with a DuckDB oracle.

Determinism conventions: see plans/registry.py docstring.  COUNT of a
CASE (not SUM) for conditional counts so both engines emit BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import windows
from rta_registrations_pyspark_glue_spark.operators.analytics import MONEY, dsum, star_denormalize
from rta_registrations_pyspark_glue_spark.plans.planmemo import plan_memo
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
@plan_memo
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (A5). All sums accumulate in exact
    decimal; averages are exact-sum / count in double. Single groupBy →
    map-side partial aggregation, one shuffle of 6 groups."""
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice").cast(MONEY)
    disc = F.col("l_discount").cast(MONEY)
    tax = F.col("l_tax").cast(MONEY)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast(MONEY)).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
)
@plan_memo
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (§2.6): orderBy + limit. TakeOrderedAndProject in the
    physical plan — no global sort materialization, each task keeps k rows."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@register(
    "grouping_sets_suite",
    oracle="""
    SELECT 'rollup' AS tag,
           EXTRACT(year FROM o.o_orderdate)::INT AS order_year,
           c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY ROLLUP(order_year, mktsegment)
    UNION ALL BY NAME
    SELECT 'cube' AS tag,
           EXTRACT(year FROM o_orderdate)::INT AS order_year,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (order_year, o_orderstatus)
    """,
)
def grouping_sets_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals + CUBE all-combination totals under one
    union-tagged slot (A5 extension; Spark expands grouping sets in a
    single aggregate per leg — no extra pass per level). Round 9
    consolidates the former rollup_orders_year_segment and
    cube_orders_year_status entries (their rows carried verbatim as the
    'rollup'/'cube' legs) — the union-tag mechanism the gate's 50-slot
    cap is designed for, freeing the oracle slot taken by
    corpus_curation_pipeline."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
    r = (
        joined.rollup(
            F.year("o_orderdate").alias("order_year"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
        .select(F.lit("rollup").alias("tag"), "*")
    )
    c = (
        orders.cube(F.year("o_orderdate").alias("order_year"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
        .select(F.lit("cube").alias("tag"), "*")
    )
    return r.unionByName(c, allowMissingColumns=True)


@register(
    "nation_order_stats",
    oracle="""
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           COUNT(CASE WHEN o.o_orderstatus = 'O' THEN 1 END) AS n_open,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
@plan_memo
def nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counts + conditional counts per nation (A5).
    countDistinct shuffles (custkey, nation) pairs once; at 100 TB prefer
    approx_count_distinct unless exactness is required (oracle needs exact)."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    joined = orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey).join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    return joined.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        dsum("o_totalprice", "revenue"),
    )


@register(
    "orderstatus_pivot",
    oracle="""
    SELECT EXTRACT(year FROM o_orderdate)::INT AS order_year,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial
    FROM orders
    GROUP BY 1
    """,
)
def orderstatus_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via conditional aggregation (portable form of .pivot();
    identical physical plan: single aggregate, no extra shuffle)."""
    orders = load_table(spark, "orders", sf_dir)
    return orders.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
    )


@register(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROW_NUMBER() OVER w AS seq,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           LAG(o_orderkey) OVER w AS prev_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
@plan_memo
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate + lag over an explicit ROWS frame (window surface
    beyond the reference's ranking-only usage, SURVEY.md §2.5)."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    out = windows.running_aggregate(
        orders, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"],
        value="o_totalprice",
    )
    w = windows.ordered_window(["o_custkey"], ["o_orderdate", "o_orderkey"])
    return out.withColumn("prev_orderkey", F.lag("o_orderkey").over(w)).select(
        "o_custkey", "o_orderkey", "o_orderdate", "seq", "running_total", "prev_orderkey"
    )


@register(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice,
           CAST(rn AS INT) AS rn
    FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
               ROW_NUMBER() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) WHERE rn <= 3
    """,
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic top-k-per-group operator (generalized J5/W2,
    operators/windows.top_k_per_group): 3 priciest parts per brand."""
    part = load_table(spark, "part", sf_dir).select(
        "p_brand", "p_partkey", "p_name", "p_retailprice"
    )
    return windows.top_k_per_group(
        part,
        keys=["p_brand"],
        order_by=[F.col("p_retailprice").desc(), F.col("p_partkey")],
        k=3,
        keep_rank=True,
    )


@register(
    "events_last_signup_asof",
    oracle="""
    WITH tagged AS (
        SELECT event_id, user_id, ts, event_type,
               CAST(NULL AS TIMESTAMP) AS p_ts, CAST(NULL AS BIGINT) AS p_id,
               CAST(ts AS TIMESTAMP) AS o_ts, 1 AS side,
               event_id AS tb
        FROM events
        UNION ALL
        SELECT NULL, user_id, NULL, NULL,
               CAST(ts AS TIMESTAMP), event_id,
               CAST(ts AS TIMESTAMP), 0, event_id
        FROM events WHERE event_type = 'signup'
    )
    SELECT event_id, user_id, ts, event_type,
           asof_ts, asof_event_id
    FROM (
        SELECT event_id, user_id, ts, event_type, side,
               last_value(p_ts IGNORE NULLS) OVER w AS asof_ts,
               last_value(p_id IGNORE NULLS) OVER w AS asof_event_id
        FROM tagged
        WINDOW w AS (PARTITION BY user_id ORDER BY o_ts, side, tb
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ) WHERE side = 1
    """,
)
@plan_memo
def events_last_signup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/windows.asof_join): each event gets the most
    recent signup (ts and id) of the same user at-or-before its time —
    composed as tagged-union + running last-non-null, one shuffle, no
    candidate-pair explosion. Spark has no native as-of join; this is the
    scalable formulation."""
    events = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", "event_type"
    )
    signups = events.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id"
    )
    out = windows.asof_join(
        events,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["ts", "event_id"],
        tiebreak="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.col("asof_ts"),
        F.col("asof_event_id"),
    )


@register(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, event_id, ts, value,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY 1, 2
    """,
)
@plan_memo
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) + per-session rollup. Batch
    analogue of streaming session_window; see operators/windows.py."""
    events = load_table(spark, "events", sf_dir).select("user_id", "event_id", "ts", "value")
    sessions = windows.sessionize(events, gap_seconds=1800)
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value", "session_value"),
    )


@register(
    "revenue_by_region_priority",
    oracle="""
    SELECT r.r_name AS region_name,
           CASE WHEN o.o_orderpriority LIKE '1-%' OR o.o_orderpriority LIKE '2-%'
                THEN 'HIGH'
                WHEN o.o_orderpriority LIKE '3-%' THEN 'MEDIUM'
                ELSE 'LOW' END AS priority_class,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def revenue_by_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-cascade taxonomy normalization (P5 shape,
    etl1_clean_and_stage.py:120-125) feeding a star rollup."""
    denorm = star_denormalize(
        load_table(spark, "orders", sf_dir),
        load_table(spark, "customer", sf_dir),
        load_table(spark, "nation", sf_dir),
        load_table(spark, "region", sf_dir),
    )
    prio = (
        F.when(F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"), "HIGH")
        .when(F.col("o_orderpriority").like("3-%"), "MEDIUM")
        .otherwise("LOW")
    )
    return denorm.groupBy(
        F.col("r_name").alias("region_name"), prio.alias("priority_class")
    ).agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "revenue"))
