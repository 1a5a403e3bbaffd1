"""Window-function operators (SURVEY.md §2.5 plus the analytic window
surface the reference's warehouse layer implies).

The reference uses windows only for top-1-per-group ranking
(etl1_clean_and_stage.py:68-70, etl2_advclean_and_dimcreatin.py:236-238);
this module generalizes to running aggregates, lag/lead, top-k per group,
and gap-based sessionization.

Every window spec here carries a total order (unique tiebreaker column) —
ranking over a partial order is nondeterministic under Spark's parallel
sort and would not be reproducible run-to-run.

Scale: a window over ``partitionBy(k)`` is one hash shuffle on k plus a
per-partition sort. Skewed keys are the hazard at 100 TB; AQE skew-join
handling does not apply to window exchanges, so keys with billions of rows
per value (e.g. a null user_id) must be filtered or salted by the caller.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def ordered_window(keys: Sequence[str], order_by: Sequence[str]) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])


def top_k_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    """Generalized J5/W2 (etl2_advclean_and_dimcreatin.py:236-238): keep the
    k best rows per key under ``order_by`` (pass desc() columns for
    largest-first)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def running_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Cumulative decimal-exact sum of ``value`` per key in event order,
    with the row's sequence number. ROWS UNBOUNDED PRECEDING frame."""
    w = ordered_window(keys, order_by)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("seq", F.row_number().over(w)).withColumn(
        out_col, F.sum(F.col(value).cast(MONEY)).over(frame).cast("double")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """As-of join: for each left row, attach the payload of the most
    recent right row with the same keys and right_ts <= left_ts.

    Spark has no native as-of join; this composes one from a tagged
    union and a running last-non-null window — ONE shuffle on the keys,
    versus the naive range-join's quadratic candidate explosion. The
    pattern is order-of-magnitude cheaper than `left join ... on ts <=
    ts` + top-1 because the window never materializes candidate pairs.

    ``tiebreak`` must totally order rows sharing (keys, ts); right rows
    sort before left rows at equal timestamps (<= semantics). Tie rule:
    among right rows sharing (keys, ts), the one with the GREATEST
    tiebreak (in its native type's order — numeric for numeric columns)
    supplies the payload. If the two sides' tiebreak dtypes differ, both
    are cast to string and the order becomes lexicographic.

    NULL semantics match the SQL-join equivalent: right rows with a NULL
    timestamp or NULL key never match (filtered — under Spark's
    NULLS-FIRST ascending sort they would otherwise sort before
    everything and match every left row). The payload travels as ONE
    struct so the latest right row wins atomically — per-column
    last-non-null would back-fill a NULL field of the newest row from an
    older row, fabricating a row that never existed.
    """
    lcols = left.columns
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    # Order the tiebreak in its native type so numeric columns tie-break
    # numerically ('10' > '2'); only mismatched dtypes fall back to string.
    tb_type = ltypes[tiebreak] if ltypes[tiebreak] == rtypes[tiebreak] else "string"
    payload_ddl = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in right_payload) + ">"
    right_clean = right.filter(F.col(right_ts).isNotNull())
    for key in on:
        right_clean = right_clean.filter(F.col(key).isNotNull())
    tagged_left = left.select(
        *lcols,
        F.lit(None).cast(payload_ddl).alias("__p"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.col(tiebreak).cast(tb_type).alias("__tb"),
    )
    tagged_right = right_clean.select(
        *[
            (F.col(c) if c in on else F.lit(None).cast(ltypes[c])).alias(c)
            for c in lcols
        ],
        F.struct(*[F.col(c) for c in right_payload]).alias("__p"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).cast(tb_type).alias("__tb"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = unioned.select(
        *lcols,
        "__side",
        F.last("__p", ignorenulls=True).over(w).alias("__p_last"),
    )
    return attached.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__p_last.{c}").alias(f"asof_{c}") for c in right_payload],
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same user exceeds ``gap_seconds``.
    Adds ``session_seq`` (1-based per user). Batch analogue of streaming
    ``session_window`` (streaming/ module); two stacked windows over the
    same (user, ts) order → one shuffle, one sort."""
    w = ordered_window([user_col], [ts_col, tiebreak_col])
    prev_ts = F.lag(ts_col).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev_ts)) > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("__is_new", is_new).withColumn(
        "session_seq", F.sum("__is_new").over(frame)
    ).drop("__is_new")
