"""Event-time windowed aggregation and stateful processing over streams.

The reference has no streaming surface (SURVEY.md §2.11); this module is
the Structured Streaming extension exercised by the events table. Each
streaming transform has a batch-equivalent registered in
plans/queries_streaming.py so the *semantics* are still oracle-checked
(Spark's windowing on a batch DataFrame computes the same windows the
micro-batch engine produces; the streaming path itself is pytest-driven
through a memory sink).

Scale notes: watermarks bound state (late events beyond the watermark are
dropped, state for closed windows is evicted); groupBy(window, key) state
lives in the state store partitioned by key — the same skew rules as any
shuffle apply. applyInPandasWithState holds one state object per key in
Arrow-backed memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def read_events_stream(spark, path: str) -> DataFrame:
    """File-source stream of events rows (schema pinned — streaming
    sources cannot infer)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows with a watermark for late data:
    count + exact-decimal value sum per (window, event_type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows (width/slide): each event lands in width/slide
    windows; Spark expands them at the source, state is per (window, key)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n_events")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Data-driven session windows (gap-based close), the streaming
    counterpart of operators.windows.sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


RUNNING_STATE_SCHEMA = "n bigint, total double"
RUNNING_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total, emitted once per micro-batch.
    The state store holds one (n, total) pair per user — O(users), not
    O(events)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion against a memory sink
    (synchronous; for tests/local smoke). Returns the query handle."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
