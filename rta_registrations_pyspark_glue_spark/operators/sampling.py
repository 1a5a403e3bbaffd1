"""Deterministic dataset splitting for training pipelines.

A train/val/test split over 100 TB must be (a) reproducible across runs
and engines, (b) stable under corpus growth (a document's split never
changes when other documents are added), and (c) computable scan-side
with zero shuffle. Random sampling fails all three; hashing the document
key satisfies them: split = f(md5(key)), a pure per-row expression that
whole-stage codegen evaluates inline.

The bucket is the first 4 hex chars of md5(key) — 65,536 lexicographic
buckets, uniform for any key distribution. Fraction boundaries become
fixed hex thresholds, so the same row lands in the same split in Spark,
DuckDB, or any engine with md5 (the oracle mirrors the exact
expression). Resolution is 1/65,536 ≈ 0.0015%%, plenty for split work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hex_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_bound_hex4)] with the last split unbounded.
    Fractions must sum to 1 (±1e-9); boundaries floor to bucket edges."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        out.append((name, format(int(acc * 65536), "04x")))
    out.append((names[-1], None))
    return out


def split_column(key: Column | str, fractions: dict[str, float]) -> Column:
    """The split label as a pure scan-side expression."""
    c = F.col(key) if isinstance(key, str) else key
    bucket = F.substring(F.md5(c.cast("string")), 1, 4)
    expr: Column | None = None
    for name, bound in hex_thresholds(fractions):
        if bound is None:
            expr = expr.otherwise(F.lit(name)) if expr is not None else F.lit(name)
        elif expr is None:
            expr = F.when(bucket < bound, name)
        else:
            expr = expr.when(bucket < bound, name)
    assert expr is not None
    return expr


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label keyed on ``key_col``.

    Default fractions: 80/10/10 train/val/test. The label depends only on
    the key's string form, so re-runs, engine changes, and corpus growth
    never move a row between splits."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_column(key_col, fractions))
