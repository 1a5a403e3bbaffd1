"""Data-quality / constraint-validation operators.

The reference declares PK/FK/NOT NULL constraints in its warehouse DDL
(starschema_dw.txt:9-77) and trusts Redshift to enforce them
(SURVEY.md §2.14 C4). Spark enforces nothing, so an engine with the same
capabilities needs the checks as operators: each constraint becomes a
violation-set query (empty = constraint holds), which composes into
pipelines as a gate or an audit report. All are single-join/single-agg
plans — constraint checking at 100 TB is one broadcast or shuffle pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str | None = None) -> DataFrame:
    """Fact rows whose FK has no match in the dimension (left anti)."""
    dk = dim_key or fact_key
    dim_keys = dim.select(F.col(dk).alias(fact_key)).dropDuplicates()
    return fact.filter(F.col(fact_key).isNotNull()).join(
        F.broadcast(dim_keys), on=fact_key, how="left_anti"
    )


def not_null_violations(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Rows violating NOT NULL on any listed column."""
    cond = None
    for c in cols:
        test = F.col(c).isNull()
        cond = test if cond is None else (cond | test)
    return df.filter(cond)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """PK violations: key values appearing more than once, with counts."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )
