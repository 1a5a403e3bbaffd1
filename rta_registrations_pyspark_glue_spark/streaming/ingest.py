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
):
    """Start the incremental ETL1 stream. Returns the StreamingQuery;
    callers drive it (processAllAvailable for batch-style catch-up, or
    leave running for continuous ingestion)."""
    bronze_stream = (
        spark.readStream.schema(io.bronze_string_schema(BRONZE_COLUMNS))
        .option("header", True)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(input_dir)
    )

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
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
        # Write-then-swap: the merge reads the current stage while writing
        # a sibling directory, then the swap is a metadata rename — no
        # read-overwrite conflict, crash leaves either old or new intact.
        # (Delta/Iceberg replace this whole dance with MERGE INTO.)
        tmp_path = stage_path + ".__tmp__"
        merged.write.mode("overwrite").parquet(tmp_path)
        if os.path.exists(stage_path):
            shutil.rmtree(stage_path)
        os.rename(tmp_path, stage_path)

    return (
        bronze_stream.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
