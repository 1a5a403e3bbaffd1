"""Mergeable sketch operators: two-pass EXACT heavy hitters.

Misra-Gries (1982) defines the guarantee; the Spark-shaped candidate
generator implements it VECTORIZED: per Arrow batch, exact value
counts (C-speed) keep every item whose in-batch frequency exceeds
``N_batch/k`` — the same survivor set MG's k-counter walk bounds, with
memory already bounded by the Arrow batch size; by
pigeonhole, any item with GLOBAL frequency > ``N/k`` must clear that
bar in at least one batch, so the union of per-batch survivors is a
guaranteed SUPERSET of the true heavy hitters — at most ``k`` items
per batch, so the candidate table is tiny and broadcastable no matter
how large the stream. Pass 2 then computes EXACT counts for the
candidates (broadcast semi-join + one aggregation) and keeps items
with ``count·k > N`` — an integer comparison, no division, so the
final output is exact, deterministic, and directly mirrorable in SQL
(the DuckDB oracle computes true frequent items with a plain
HAVING).

This is the classic sketch-then-verify shape: the approximation is
confined to pass 1's candidate generation where only a false POSITIVE
is possible; pass 2 removes those. 100 TB: two scans, one bounded
broadcast, one aggregation whose key domain is ≤ k·n_batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_batch_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Pass 1: distinct union of per-batch Misra-Gries survivors —
    a superset of all items with global frequency > N/k."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pdf[col].dropna()
            n = len(vals)
            if n == 0:
                continue
            # Vectorized candidate generation: exact per-batch counts
            # (C-speed value_counts) filtered at the SAME pigeonhole bar
            # the classic Misra-Gries dict walk guarantees — an item
            # with batch frequency > n/k survives either way, and the
            # Arrow batch size already bounds the distinct count that
            # MG's k counters would otherwise cap.
            counts = vals.value_counts()
            survivors = counts.index[counts.to_numpy() * k > n]
            yield pd.DataFrame({col: pd.Series(survivors, dtype="object")})

    return df.select(col).mapInPandas(op, f"{col} string").distinct()


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """EXACT items with frequency > N/k (strict), via MG candidates +
    exact verification. Returns (``col``, n_occurrences) — deterministic,
    so it lives on an oracle-checked path (corpus_vocabulary 'heavy'
    rows). NULLs are excluded from both N and the counts."""
    nonnull = df.select(col).where(F.col(col).isNotNull())
    cands = mg_batch_candidates(nonnull, col, k)
    total = nonnull.agg(F.count(F.lit(1)).alias("n_total")).withColumn(
        "one", F.lit(1)
    )
    exact = (
        nonnull.join(F.broadcast(cands), col, "inner")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    return (
        exact.withColumn("one", F.lit(1))
        .join(F.broadcast(total), "one")
        .where(F.col("n_occurrences") * k > F.col("n_total"))
        .select(col, "n_occurrences")
    )
