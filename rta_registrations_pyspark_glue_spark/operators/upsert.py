"""Incremental upsert (merge) — the batch pattern behind CDC/SCD-style
maintenance of a table from change feeds.

The lakehouse form is MERGE INTO (Delta/Iceberg, not in this
environment); the portable Spark form composes from the engine's own
primitives: union the current snapshot with the updates, then
keep-latest per key under a (version, source-priority) total order.
One shuffle on the key — the same cost profile as the window dedup the
reference already runs (etl1_clean_and_stage.py:68-70).

At scale: partition the snapshot by key range/bucket and co-bucket the
updates so the merge shuffle is partial; with Delta/Iceberg swap this
function for MERGE INTO and keep the call sites.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators.dedup import keep_latest_agg


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Apply ``updates`` over ``current``: new keys are inserted, existing
    keys take the row that wins the ``order_by`` total order (ties must be
    broken by the caller's ordering — include a version/priority column).
    Updates with missing columns are tolerated (drift-safe unionByName)."""
    merged = current.withColumn("__src_priority", F.lit(0)).unionByName(
        updates.withColumn("__src_priority", F.lit(1)), allowMissingColumns=True
    )
    out = keep_latest_agg(merged, keys, [*order_by, "__src_priority"])
    return out.drop("__src_priority")
