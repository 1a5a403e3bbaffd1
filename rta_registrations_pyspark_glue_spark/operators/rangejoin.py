"""Range (interval) join: match point rows to interval rows with
``start <= point < end`` — the temporal-join shape Spark has no native
operator for. A naive ``points.join(intervals, point.between(s, e))``
is a pure theta join and Catalyst can only plan it as a
BroadcastNestedLoopJoin / cartesian — O(|P|·|I|) compared work and a
single-task broadcast at scale: the same trap as the all-pairs
embedding join, and the same fix.

The fix is blocking (the reference's one transferable scale idea,
etl2_advclean_and_dimcreatin.py:221-234, applied here to a numeric
dimension): quantize the point domain into fixed-width buckets;
- each interval explodes to every bucket it overlaps
  (``sequence(floor(s/w), floor(e/w))`` — ceil((e-s)/w)+1 copies);
- each point maps to exactly one bucket;
- equi-join on (bucket [, extra keys]) + residual range filter.

One shuffle on the bucket key, candidates bounded per bucket, AQE
handles skewed buckets. Bucket width trades interval fan-out against
per-bucket candidate count: width ≈ median interval length is a good
default (≤2 copies per interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    extra_keys: list[tuple[str, str]] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (half-open, the temporal-validity
    convention), optionally also requiring ``extra_keys`` equality.

    ``point_col`` / ``start_col`` / ``end_col`` must be numeric (cast
    dates to epoch days / timestamps to epoch seconds first);
    ``bucket_width`` is in the same unit. Output = all point columns +
    all interval columns (names must not collide; rename beforehand).

    ``how``: 'inner' or 'left_outer' (points with no covering interval
    kept with NULL interval columns).
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type: {how}")
    extra = extra_keys or []

    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    # Empty intervals ([s, e) with e <= s) match nothing; drop them before
    # exploding — Spark's sequence() with stop < start generates a
    # DESCENDING sequence, which would fabricate buckets.
    i = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                # end is exclusive, but an interval touching a bucket's
                # first unit still overlaps it — use end-1 (integer
                # domain) so [s, e) never explodes past its last bucket.
                F.floor((F.col(end_col) - 1) / F.lit(bucket_width)),
            )
        ),
    )
    cond = F.col(f"p.{point_col}") >= F.col(f"i.{start_col}")
    cond = cond & (F.col(f"p.{point_col}") < F.col(f"i.{end_col}"))
    on = (F.col("p.__bucket") == F.col("i.__bucket")) & cond
    for pk, ik in extra:
        on = on & (F.col(f"p.{pk}") == F.col(f"i.{ik}"))

    joined = p.alias("p").join(i.alias("i"), on, how)
    return joined.select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"i.{c}") for c in intervals.columns],
    )
