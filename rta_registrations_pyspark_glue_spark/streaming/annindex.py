"""Streaming maintenance of a durable IVF index — the continuous form
of similarity.ivf_append_index (r11): a vector stream (file source,
Kafka after parsing — anything with (id, vector) rows) keeps a durable
ANN index current WITHOUT retraining, batch by batch.

Layout contract: the base index stays exactly what ivf_write_index
wrote (``assignment/cell=*``); streamed batches land in a SIBLING
``assignment_stream/batch=<id>/cell=*`` tree. Two reasons:

- REPLAY IDEMPOTENCE: foreachBatch re-delivers a batch after failure;
  writing with dynamic partition overwrite means a replayed batch
  OVERWRITES its own ``batch=<id>`` partitions instead of appending
  duplicates (pinned by test). A bare append into the base tree could
  not distinguish replay from growth.
- the base tree is never rewritten — the 100 TB invariant shared with
  ivf_append_index.

ivf_read_index unions the sibling in when present, so searches see one
assignment frame; ``cell`` is a partition column in BOTH trees, so the
probed-cell pruning (static IN or dynamic pruning subquery) applies to
each scan.

Per-batch health (the retrain trigger) goes to
``health/batch=<id>.json`` — quantization drift of the batch against
the build-time baseline plus occupancy counts; overwritten on replay,
so the health log is exactly-once too.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_ivf_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    corpus_vec: str = "vec",
) -> dict:
    """Assign ONE micro-batch against the durable index's frozen
    centroids and write it into the streaming sibling tree,
    idempotently (dynamic partition overwrite of ``batch=<id>``).
    Module-level so batch replay semantics are testable without a
    running stream (the streaming/dedup.py convention). Returns the
    health dict it also writes."""
    from rta_registrations_pyspark_glue_spark.operators.similarity import (
        _assignment_quant_stats,
        _cell_counts,
        ivf_build,
    )

    with open(os.path.join(index_path, "centroids.json")) as f:
        meta = json.load(f)
    if int(batch_id) <= int(meta.get("compacted_through_batch", -1)):
        # r12 replay guard: this batch was already folded into the
        # base tree by compact_ivf_index — a restarted stream whose
        # checkpoint predates the compaction would otherwise resurrect
        # its vectors as duplicates. Record the skip in the health log
        # (empty counts keep scan-free occupancy exact) and write
        # nothing.
        health = {
            "batch_id": int(batch_id),
            "appended": 0,
            "skipped_compacted": True,
            "cell_counts": {},
        }
        hdir = os.path.join(index_path, "health")
        os.makedirs(hdir, exist_ok=True)
        with open(os.path.join(hdir, f"batch={int(batch_id)}.json"), "w") as f:
            json.dump(health, f)
        return health
    corpus_id = meta["corpus_id"]
    cents = [
        (int(cell), [float(x) for x in cv]) for cell, cv in meta["centroids"]
    ]
    part = ivf_build(
        batch_df, centroids=cents, corpus_id=corpus_id, corpus_vec=corpus_vec
    )
    n_new, new_err = _assignment_quant_stats(part)
    batch_counts = _cell_counts(part.assignment)
    (
        part.assignment.select(
            F.col(corpus_id),
            F.col("__cv").alias("vec"),
            F.lit(int(batch_id)).alias("batch"),
            F.col("__cell").alias("cell"),
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "cell")
        .parquet(os.path.join(index_path, "assignment_stream"))
    )
    base = meta.get("stats") or {}
    baseline = base.get("build_mean_quant_err") or base.get("mean_quant_err")
    health = {
        "batch_id": int(batch_id),
        "appended": n_new,
        "new_mean_quant_err": new_err,
        "baseline_mean_quant_err": baseline,
        "drift_ratio": (new_err / baseline) if baseline else None,
        # per-batch occupancy counts, from the BATCH's own aggregation
        # (r12): summing these across health files + the base meta's
        # cell_counts gives whole-index occupancy with no tree scan,
        # and the file is overwritten on replay — exactly-once like
        # the partitions it describes (folding into the base meta
        # instead would double-count on replay)
        "cell_counts": batch_counts,
    }
    hdir = os.path.join(index_path, "health")
    os.makedirs(hdir, exist_ok=True)
    with open(os.path.join(hdir, f"batch={int(batch_id)}.json"), "w") as f:
        json.dump(health, f)
    return health


def should_compact(
    index_path: str,
    drift_threshold: float = 1.5,
    trend_window: int = 3,
) -> dict:
    """The compaction TRIGGER policy (r13, VERDICT r12 #4 / missing
    #3): fold the health log the way ivf_index_occupancy does and
    decide whether the drift trend says the coarse quantizer is stale.

    Rule: compact when the last ``trend_window`` live batches (past
    ``compacted_through_batch``, with a recorded drift_ratio) ALL read
    at or above ``drift_threshold``. Requiring the whole window —
    rather than one reading or a mean — makes the trigger a SUSTAINED
    distribution shift: one outlier batch (a burst of atypical
    documents) cannot fire a full index rewrite, and after a
    compaction resets the baseline the window starts empty, so the
    trigger re-arms only if drift actually rebuilds against the NEW
    quantizer.

    Pure driver-side file reads (one JSON per batch, no parquet scan
    — the same cost shape as ivf_index_occupancy). Returns the
    decision with its evidence: {"compact": bool, "window": [ratios],
    "n_batches": live-batch count, "drift_threshold", "trend_window"}.
    """
    with open(os.path.join(index_path, "centroids.json")) as f:
        meta = json.load(f)
    compacted_through = int(meta.get("compacted_through_batch", -1))
    readings: list[tuple[int, float]] = []
    hdir = os.path.join(index_path, "health")
    if os.path.isdir(hdir):
        for name in sorted(os.listdir(hdir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(hdir, name)) as f:
                health = json.load(f)
            bid = int(health.get("batch_id", -1))
            ratio = health.get("drift_ratio")
            if bid <= compacted_through or ratio is None:
                continue
            readings.append((bid, float(ratio)))
    readings.sort()
    window = [r for _, r in readings[-trend_window:]]
    return {
        "compact": len(window) >= trend_window
        and all(r >= drift_threshold for r in window),
        "window": window,
        "n_batches": len(readings),
        "drift_threshold": drift_threshold,
        "trend_window": trend_window,
    }


def stream_ivf_ingest(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    corpus_vec: str = "vec",
    available_now: bool = True,
    auto_compact: dict | None = None,
):
    """Continuous IVF-index ingestion: each micro-batch of
    ``vec_stream`` is assigned against the frozen coarse quantizer and
    merged into the durable index's streaming tree (see module
    docstring for the layout/replay contract). Returns the
    StreamingQuery.

    Scale shape: per-batch cost is the BATCH's assignment GEMM plus
    one partitioned write — proportional to the batch, never the
    index; searches pay one extra pruned scan over the streamed tree.
    When drift_ratio in the health log trends up, run
    similarity.compact_ivf_index (r12): it retrains on the union,
    rewrites the base tree under a new generation with the meta
    rewrite as the atomic commit, truncates the sibling + health log,
    resets the drift baseline, and records compacted_through_batch so
    replayed pre-compaction batches are skipped (see ingest_ivf_batch's
    guard).

    ``auto_compact`` (r13, VERDICT r12 #4) wires that advice into the
    stream itself — opt-in, OFF by default because a compaction is a
    full index read+rewrite and it runs INSIDE foreachBatch, stalling
    the stream for its duration (fine for availableNow maintenance
    runs; a continuous low-latency deployment should instead poll
    should_compact from a separate maintenance job). Pass a dict:
    ``drift_threshold`` (default 1.5) and ``trend_window`` (default 3)
    feed should_compact — fire only when the last trend_window batches
    ALL drift past the threshold — plus optional compact_ivf_index
    passthroughs ``n_pivots`` / ``train_iters`` / ``train_sample_mod``
    / ``retrain``. After a compaction the baseline resets and the
    window re-arms empty, so a drifting stream triggers ONCE and a
    stable one never does (pytest-pinned)."""

    def body(batch_df: DataFrame, batch_id: int) -> None:
        ingest_ivf_batch(
            batch_df.sparkSession, batch_df, batch_id, index_path,
            corpus_vec=corpus_vec,
        )
        if auto_compact is not None:
            decision = should_compact(
                index_path,
                drift_threshold=auto_compact.get("drift_threshold", 1.5),
                trend_window=auto_compact.get("trend_window", 3),
            )
            if decision["compact"]:
                from rta_registrations_pyspark_glue_spark.operators.similarity import (
                    compact_ivf_index,
                )

                compact_ivf_index(
                    batch_df.sparkSession,
                    index_path,
                    n_pivots=auto_compact.get("n_pivots"),
                    train_iters=auto_compact.get("train_iters", 2),
                    train_sample_mod=auto_compact.get("train_sample_mod", 1),
                    retrain=auto_compact.get("retrain", True),
                )

    writer = vec_stream.writeStream.foreachBatch(body).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivf_index_occupancy(index_path: str) -> dict:
    """Whole-index occupancy (base tree + streaming sibling) with NO
    parquet scan: fold the base meta's persisted ``cell_counts``
    (ivf_write_index / ivf_append_index) with every health file's
    per-batch counts. Each health file is overwritten on replay, so
    the fold is exactly-once by construction.

    Health files at or below the meta's ``compacted_through_batch``
    are SKIPPED (r13, ADVICE r12): their batches were folded into the
    base generation by compact_ivf_index — whose post-commit cleanup
    of the health log is best-effort — so folding a leftover would
    double-count every vector the compaction already absorbed into
    the base meta's counts. Mirrors ivf_read_index's sibling filter."""
    from rta_registrations_pyspark_glue_spark.operators.similarity import (
        _occupancy_from_counts,
    )

    with open(os.path.join(index_path, "centroids.json")) as f:
        meta = json.load(f)
    counts = dict(meta.get("cell_counts") or {})
    compacted_through = int(meta.get("compacted_through_batch", -1))
    hdir = os.path.join(index_path, "health")
    if os.path.isdir(hdir):
        for name in sorted(os.listdir(hdir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(hdir, name)) as f:
                health = json.load(f)
            if int(health.get("batch_id", -1)) <= compacted_through:
                continue
            for cell, n in (health.get("cell_counts") or {}).items():
                counts[cell] = counts.get(cell, 0) + int(n)
    return {"cell_counts": counts, **_occupancy_from_counts(counts)}
