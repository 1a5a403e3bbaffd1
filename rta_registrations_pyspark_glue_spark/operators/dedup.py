"""Row-level deduplication operators (SURVEY.md §2.4 A1-A3, §2.5 W1).

The reference dedupes with a row_number window — keep the latest record
per ``tempRegistrationNumber`` ordered by ``fromdate`` desc
(etl1_clean_and_stage.py:68-70) — and with ``dropDuplicates`` on key
subsets (etl2_advclean_and_dimcreatin.py:180-197).

Two implementations are provided because they scale differently:

- ``keep_latest``      : row_number window. One hash shuffle + per-key sort.
  Matches the reference exactly and is what the SQL oracle expresses.
- ``keep_latest_agg``  : max_by(struct) aggregation. Same result for a
  total ordering, but does *map-side partial aggregation* — at 100 TB the
  shuffle moves one row per key per input partition instead of every row,
  which is the difference between a bounded shuffle and a full-data
  shuffle. Prefer this in pipelines; keep the window form for parity.

Both demand a total order (order column + unique tiebreaker): the
reference orders only by ``fromdate`` desc, which is nondeterministic on
ties (SURVEY.md §7 Phase 3a); we require a documented tiebreak.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by`` ranked
    descending (latest-first), with every listed column a tiebreaker.

    Reference parity: etl1_clean_and_stage.py:68-70 (W1/A1).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_latest_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """Shuffle-light keep-latest: ``max_by(struct(payload), struct(order))``
    aggregates partially map-side, so only one candidate row per key leaves
    each input partition. Output column order matches the input."""
    payload = [c for c in df.columns]
    ranked = F.struct(*[F.col(c) for c in order_by])
    row = F.struct(*[F.col(c) for c in payload])
    agg = df.groupBy(*keys).agg(F.max_by(row, ranked).alias("__row"))
    return agg.select(*[F.col(f"__row.{c}").alias(c) for c in payload])


def dedup_deterministic(
    df: DataFrame, keys: Sequence[str], count_col: str | None = None
) -> DataFrame:
    """One row per key with *deterministically* chosen attribute values:
    the lexicographically smallest struct of the non-key columns. Use when
    non-key columns are NOT functionally determined by the key —
    dropDuplicates would pick an arbitrary (partitioning-dependent) row.
    Same cost shape as dropDuplicates: one map-side-combined aggregate.

    ``count_col``: also emit the pre-dedup row count per key under this
    name, computed in the SAME aggregate — a consumer that needs both the
    deduped rows and per-key support (the pipeline's canonical-catalog
    threshold) would otherwise pay a second full shuffle plus a join."""
    others = [c for c in df.columns if c not in keys]
    aggs = [F.min(F.struct(*[F.col(c) for c in others])).alias("__row")]
    if count_col is not None:
        aggs.append(F.count(F.lit(1)).alias(count_col))
    agg = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    extra = [count_col] if count_col is not None else []
    return agg.select(
        *keys, *[F.col(f"__row.{c}").alias(c) for c in others], *extra
    )


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact dedup (A2/A3): ``dropDuplicates`` keeps an *arbitrary* row per
    key — fine for dimension building where all non-key columns are
    functionally determined by the key (etl2_advclean_and_dimcreatin.py:180).
    For nondeterministic inputs use ``keep_latest`` instead."""
    return df.dropDuplicates(list(subset)) if subset else df.distinct()
