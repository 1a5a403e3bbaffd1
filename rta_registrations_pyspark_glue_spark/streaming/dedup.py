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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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


def ingest_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    corpus_path: str,
    fingerprint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the streaming exact-dedup ingest (the
    ``foreachBatch`` body of ``stream_dedup_ingest``, module-level so
    replay semantics are directly testable).

    The batch is deduped within itself and against the persisted
    fingerprint store by ``textdedup.incremental_exact_dedup`` —
    O(batch) work plus one hash-probe anti-join over fp_md5, never a
    regroup of history — then survivors land in ``corpus_path`` and
    their fingerprints in ``fingerprint_path``, both under
    ``batch_id=<N>`` partitions.

    EXACTLY-ONCE-ish under replay, by construction rather than luck:

    - both writes are dynamic-partition overwrites of the batch's OWN
      ``batch_id=N`` partition — a replayed batch overwrites what its
      crashed predecessor wrote instead of appending twice;
    - the probe reads the store WHERE ``batch_id < N`` (partition-
      pruned), so a replay whose predecessor already wrote batch N's
      fingerprints recomputes the SAME survivor set (the crashed
      attempt's own fingerprints can't anti-join away its replay — that
      would overwrite the partition with zero rows and lose the docs).

    A crash between the two writes is therefore harmless in either
    order; corpus is written first so the store never references docs
    the corpus doesn't hold."""
    from rta_registrations_pyspark_glue_spark import io
    from rta_registrations_pyspark_glue_spark.operators import textdedup

    if io.table_exists(fingerprint_path):
        existing = spark.read.parquet(fingerprint_path).filter(
            F.col("batch_id") < F.lit(batch_id)
        )
    else:
        existing = spark.createDataFrame([], "fp_md5 string")
    survivors = textdedup.incremental_exact_dedup(
        batch_df,
        existing,
        text_col=text_col,
        id_col=id_col,
        existing_key_col="fp_md5",
    ).withColumn("batch_id", F.lit(batch_id)).persist()
    try:
        io.write_parquet(
            survivors.drop("content_key"),
            corpus_path,
            partition_by=["batch_id"],
            dynamic_partitions=True,
        )
        io.write_parquet(
            survivors.select(
                F.col(id_col),
                F.col("content_key").alias("fp_md5"),
                F.col("batch_id"),
            ),
            fingerprint_path,
            partition_by=["batch_id"],
            dynamic_partitions=True,
        )
    finally:
        survivors.unpersist()


def stream_dedup_ingest(
    docs_stream: DataFrame,
    corpus_path: str,
    fingerprint_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
):
    """Continuous exact-dedup corpus ingestion: each micro-batch of
    ``docs_stream`` (any streaming DataFrame — file-source JSONL/CSV,
    Kafka after parsing) is deduped against itself AND the full corpus
    history via the persisted fingerprint store, which the stream
    maintains as it goes — the streaming composition of
    ``incremental_exact_dedup`` (see ingest_dedup_batch for the replay
    contract). Returns the StreamingQuery.

    Scale shape: per-batch cost is the batch's own hashing plus one
    anti-join probe into a store of 32-byte keys — proportional to the
    BATCH, not the corpus; the store is partition-pruned on batch_id at
    probe time and is ~0.04% the corpus' size at 10 kB/doc. Compact its
    small batch partitions periodically with io.compact_partitions if
    trigger cadence is high."""
    def body(batch_df: DataFrame, batch_id: int) -> None:
        ingest_dedup_batch(
            batch_df.sparkSession,
            batch_df,
            batch_id,
            corpus_path,
            fingerprint_path,
            text_col=text_col,
            id_col=id_col,
        )

    writer = docs_stream.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
