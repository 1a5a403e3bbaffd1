"""Incremental (streaming) ingestion of the registration pipeline.

The reference's ETL1 is a full-reload batch job (etl1_clean_and_stage.py);
feeds like it actually arrive as monthly drops. This module runs the SAME
cleaning pipeline incrementally: a file-source stream of bronze CSV
micro-batches, each cleaned by ``plans.pipeline.clean_and_stage`` and
merged into the stage table by key (newest registration wins) via
``operators.upsert.merge_upsert`` inside ``foreachBatch``.

foreachBatch is the exactly-once-ish sink pattern for non-idempotent
targets: the merge runs per micro-batch with batch-id-based replay
semantics from the checkpoint. At scale the stage table would be
Delta/Iceberg (MERGE INTO); the parquet full-rewrite here keeps the
environment's constraints while preserving the dataflow shape.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from rta_registrations_pyspark_glue_spark import io
from rta_registrations_pyspark_glue_spark.jobs import BRONZE_COLUMNS
from rta_registrations_pyspark_glue_spark.operators.upsert import merge_upsert
from rta_registrations_pyspark_glue_spark.plans.pipeline import clean_and_stage


def stream_clean_and_stage(
    spark: SparkSession,
    input_dir: str,
    stage_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Start the incremental ETL1 stream. Returns the StreamingQuery.

    ``available_now=True`` (default) drains the currently-available files
    and terminates — batch-style catch-up. Pass ``available_now=False``
    for a continuously-running micro-batch query that picks up files as
    they arrive."""
    bronze_stream = (
        spark.readStream.schema(io.bronze_string_schema(BRONZE_COLUMNS))
        .option("header", True)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(input_dir)
    )

    tmp_path = stage_path + ".__tmp__"
    old_path = stage_path + ".__old__"

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Crash recovery: a previous run that died mid-swap left the stage
        # renamed aside — restore it before merging, or batches ingested
        # before the crash would be silently dropped.
        if not os.path.exists(stage_path) and os.path.exists(old_path):
            os.rename(old_path, stage_path)
        staged_new = clean_and_stage(batch_df)
        if os.path.exists(stage_path):
            current = spark.read.parquet(stage_path)
            merged = merge_upsert(
                current,
                staged_new,
                keys=["tempRegistrationNumber"],
                order_by=["fromdate_parsed", "slno"],
            )
        else:
            merged = staged_new
        # Write-then-swap with an aside rename (never rmtree the only
        # copy): write tmp → move stage aside → move tmp in → drop aside.
        # A crash at any point leaves either the old stage (possibly under
        # the aside name, restored above) or the new one — never neither.
        # (Delta/Iceberg replace this dance with MERGE INTO.)
        merged.write.mode("overwrite").parquet(tmp_path)
        if os.path.exists(old_path):
            shutil.rmtree(old_path)
        if os.path.exists(stage_path):
            os.rename(stage_path, old_path)
        os.rename(tmp_path, stage_path)
        if os.path.exists(old_path):
            shutil.rmtree(old_path)

    writer = bronze_stream.writeStream.foreachBatch(upsert_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
