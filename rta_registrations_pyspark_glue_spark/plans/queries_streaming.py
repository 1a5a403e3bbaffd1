"""Batch equivalents of the streaming window operators, with DuckDB
oracles. Spark's F.window on a batch DataFrame computes exactly the
windows the micro-batch engine emits (epoch-aligned), so these queries
verify the *semantics*; the streaming execution path (watermarks, state,
memory sink, applyInPandasWithState) is driven in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.plans.planmemo import plan_memo
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "events_windowed_hourly",
    oracle="""
    SELECT 'tumbling' AS kind,
           time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT 'sliding' AS kind, window_start, event_type,
           COUNT(*) AS n_events, NULL AS total_value
    FROM (
        SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS window_start,
               event_type
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                   - INTERVAL '30 minutes' AS window_start,
               event_type
        FROM events
    )
    GROUP BY 2, 3
    """,
)
@plan_memo
def events_windowed_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour and sliding 1h/30m event-time windows in one
    union-tagged result (batch semantics of streaming/windows). Every
    event belongs to exactly two sliding windows (width/slide = 2),
    which the oracle expands explicitly; total_value is tumbling-only
    (NULL on 'sliding' rows)."""
    ev = _events(spark, sf_dir)
    tumbling = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    sliding = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.lit("sliding").alias("kind"),
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            F.lit(None).cast("double").alias("total_value"),
        )
    )
    return tumbling.unionByName(sliding)
