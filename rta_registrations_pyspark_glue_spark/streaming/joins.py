"""Stream-stream joins: the watermarked interval join.

The canonical two-stream stateful operator Structured Streaming
supports natively (ad-impression × click style): both sides carry
watermarks and the join condition carries a TIME-RANGE bound, which
is what lets the engine expire join state — without the bound, both
sides' state grows forever. Inner joins emit in append mode as soon
as both matching rows have arrived.

State-size contract at 100 TB/day: each side buffers only rows newer
than (watermark horizon + interval width); choose the watermark from
real out-of-orderness, not generously — state is per-key×per-row, and
the eviction boundary is ``event-time < watermark − interval``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "signup_ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Events (left) joined to the same key's anchor rows (right) that
    happened at most ``within`` BEFORE them:
    ``right_ts <= left_ts <= right_ts + within``. Both sides
    watermarked with ``watermark`` so buffered state expires. Works
    identically on batch DataFrames (watermarks are no-ops there) —
    the batch-equivalence tests rely on that."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(
        key, f"__r_{key}"
    )
    cond = (
        (lw[key] == rw[f"__r_{key}"])
        & (lw[left_ts] >= rw[right_ts])
        & (lw[left_ts] <= rw[right_ts] + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop(f"__r_{key}")
