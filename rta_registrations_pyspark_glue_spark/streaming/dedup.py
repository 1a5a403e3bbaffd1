"""Streaming exact deduplication — the continuous-ingest counterpart of
operators/dedup.py (SURVEY.md §2.11 extension; the reference is
batch-only).

At-least-once sources (Kafka redeliveries, retried file drops, replayed
micro-batches downstream of a crash) hand every training-data ingest
pipeline duplicate events; deduplicating them IN the stream, before they
reach the stage table, is what keeps the batch side's one-row-per-key
grain true without periodic scrub jobs.

State-boundedness is the whole design question at scale:

- ``dropDuplicatesWithinWatermark`` (the default here) keeps a key in
  the state store only until the event-time watermark passes its event's
  timestamp — duplicates arriving within the lateness bound collapse,
  and state is EVICTED after it. State size ~ distinct keys per
  watermark horizon: bounded, the only shape that survives an unbounded
  stream.
- plain ``dropDuplicates`` on a stream retains every key seen FOREVER
  (exact global dedup, state grows without bound) — available via
  ``bounded_state=False`` for short-lived backfill streams, with the
  hazard stated rather than hidden.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_events_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
    bounded_state: bool = True,
) -> DataFrame:
    """Drop duplicate events by ``keys`` from a stream.

    With ``bounded_state`` (default): watermark-scoped dedup — a
    duplicate is dropped iff it arrives while its key is still inside
    the ``watermark`` lateness horizon; key state is evicted afterwards,
    so the state store stays O(keys per horizon) no matter how long the
    stream runs. A duplicate arriving later than the watermark bound
    passes through — the same contract under which the windowed
    aggregations here drop late events, and why the batch
    keep-latest/merge operators still own end-of-day exactness.

    With ``bounded_state=False``: global exact dedup (every key held in
    state forever). Correct and occasionally right for bounded replay
    streams; never deploy it on an unbounded source.
    """
    s = events.withWatermark(ts_col, watermark)
    if bounded_state:
        return s.dropDuplicatesWithinWatermark(list(keys))
    return s.dropDuplicates(list(keys))
