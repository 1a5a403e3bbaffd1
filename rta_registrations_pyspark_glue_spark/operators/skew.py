"""Skew-resistant aggregation via salting.

AQE's skew-join splitting covers joins, but a groupBy on a hot key still
funnels one key's rows into one reducer. Salting splits each key into
``n_salts`` sub-keys for a partial aggregate, then combines partials —
two small shuffles instead of one skewed one. The salt must be
DETERMINISTIC (derived from row content, not rand()) so results are
reproducible and retry-safe under task re-execution.

Results are identical to the unsalted aggregate — which is exactly what
the DuckDB oracle checks (plain GROUP BY), proving the rewrite is
semantics-preserving.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_source: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {"count", "sum_decimal"}; extend as needed. ``salt_source`` is any
    roughly-uniform column (an id) hashed into the salt.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).alias("__salt")
    partial_exprs: list[Column] = []
    final_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum_decimal":
            partial_exprs.append(
                F.sum(F.col(col).cast("decimal(18,2)")).alias(f"__p_{out}")
            )
            final_exprs.append(F.sum(f"__p_{out}").cast("double").alias(out))
        else:
            raise ValueError(f"unsupported agg fn: {fn}")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
