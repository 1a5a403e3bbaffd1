"""Star-schema analytics queries (SURVEY.md §2.4 A5, build-plan Phase 0/5)
with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rta_registrations_pyspark_glue_spark.operators import analytics, dedup
from rta_registrations_pyspark_glue_spark.plans.planmemo import plan_memo
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table


@register(
    "star_revenue_by_region_year",
    oracle="""
    SELECT r.r_name AS region_name,
           EXTRACT(year FROM o.o_orderdate)::INT AS order_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
@plan_memo
def star_revenue_by_region_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: star join (J1/J6) + year rollup (A5).
    Reference shape: etl2_advclean_and_dimcreatin.py:206-212,256-275."""
    return analytics.revenue_by_region_year(
        load_table(spark, "orders", sf_dir),
        load_table(spark, "customer", sf_dir),
        load_table(spark, "nation", sf_dir),
        load_table(spark, "region", sf_dir),
    )


@register(
    "dedup_keep_latest_event",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def dedup_keep_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest window dedup (A1/W1, etl1_clean_and_stage.py:68-70):
    latest event per user, event_id as the documented total-order tiebreak."""
    events = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return dedup.keep_latest(events, keys=["user_id"], order_by=["ts", "event_id"])
