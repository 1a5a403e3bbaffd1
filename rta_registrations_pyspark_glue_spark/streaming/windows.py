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


SESSION_STATE_SCHEMA = "start timestamp, last timestamp, n bigint, total double"
SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)


def stateful_sessions(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful sessionizer with EVENT-TIME TIMEOUT — the
    bounded-state form of sessionization. session_windows covers the
    built-in aggregate; this operator exists for session state the
    built-in cannot hold (arbitrary per-session accumulators) and, more
    importantly at scale, demonstrates the state-EVICTION contract:

    - one open session per user lives in the state store (O(users), not
      O(events));
    - events extend it, and a batch-internal gap > ``gap_minutes``
      closes it inline (emitted immediately, append mode);
    - when the event-time WATERMARK passes last_event + gap, the state
      times out: the final session row is emitted and the state REMOVED
      — without this, per-key state grows forever and a 100 TB stream
      eventually spills the state store (the NoTimeout running_user_
      totals above is the demonstrative counter-example: totals are
      meant to live forever, sessions are not).

    Events inside a micro-batch are processed in (ts, event_id) order,
    so the emitted sessions are deterministic for a given batching;
    cross-batch determinism is the watermark's job, as for every
    streaming aggregate.

    Admitted-late events (older than the open session but inside the
    watermark) are handled with O(1) state: one that falls WITHIN the
    gap of the open session merges into it (extending session_start
    backward); DISJOINT ones (more than a gap earlier) accumulate into
    a single look-behind run — consecutive within-gap late events emit
    as ONE merged session, and a within-gap late event that pulls the
    open session's start back to within a gap of that run folds the
    run into the session (both exact batch semantics for in-order late
    runs). What remains approximate is late events arriving in a LATER
    micro-batch than the session they belong to: exact retroactive
    merging of arbitrarily late events requires buffering every
    in-watermark event per key, which is precisely what the built-in
    ``session_window`` aggregate's state store does (use
    session_windows for that); this operator trades that for bounded
    custom state, and documents the trade instead of hiding it. Timeout timestamps follow the repo-wide UTC session
    contract (session.py pins spark.sql.session.timeZone=UTC; the
    tz-naive pandas event times ARE UTC instants)."""
    gap_s = gap_minutes * 60

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        done: list[tuple] = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            done.append((key[0], start, last, n, total))
            state.remove()
        else:
            start = last = None
            n, total = 0, 0.0
            if state.exists:
                start, last, n, total = state.get
            rows = []
            for pdf in pdfs:
                rows.extend(
                    zip(pdf["ts"], pdf["event_id"], pdf["value"])
                )
            rows.sort(key=lambda r: (r[0], r[1]))
            # open run of admitted-late events disjoint from the open
            # session: (run_start, run_last, run_n, run_total). Events
            # are processed in ts order, so a one-session look-behind is
            # enough to merge consecutive within-gap late events into
            # ONE session instead of per-event singletons (ADVICE r10);
            # still O(1) state — exact retroactive merging of arbitrary
            # late arrivals remains session_window's job (docstring).
            late = None
            for ts, _eid, val in rows:
                if start is not None:
                    if (ts - last).total_seconds() > gap_s:
                        done.append((key[0], start, last, n, total))
                        start = None
                    elif (start - ts).total_seconds() > gap_s:
                        if (
                            late is not None
                            and (ts - late[1]).total_seconds() <= gap_s
                        ):
                            late = (late[0], ts, late[2] + 1,
                                    late[3] + float(val))
                        else:
                            if late is not None:
                                done.append((key[0],) + late)
                            late = (ts, ts, 1, float(val))
                        continue
                if start is None:
                    start, last, n, total = ts, ts, 0, 0.0
                elif ts < start:
                    start = ts  # late but within gap: extend backward
                n += 1
                total += float(val)
                if ts > last:
                    last = ts
                # a backward extension can bring the open session within
                # gap of the pending late run — fold the run in
                if (
                    late is not None
                    and (start - late[1]).total_seconds() <= gap_s
                ):
                    if late[0] < start:
                        start = late[0]
                    n += late[2]
                    total += late[3]
                    late = None
            if late is not None:
                done.append((key[0],) + late)
            if start is not None:
                state.update((start, last, n, total))
                state.setTimeoutTimestamp(
                    int(last.timestamp() * 1000) + gap_s * 1000
                )
        if done:
            yield pd.DataFrame(
                done,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "total_value",
                ],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
