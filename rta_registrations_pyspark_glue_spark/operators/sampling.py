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

from pyspark.sql import Column, DataFrame, Window
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


def cumulative_bounds(fractions: dict[str, float]) -> list[tuple[str, float]]:
    """[(split_name, cumulative_fraction)] with the last split unbounded
    (None). Cumulative sums are rounded to 12 decimals so 0.8+0.1 is the
    clean literal 0.9 in BOTH engines (float accumulation would emit
    0.9000000000000001, shifting quota boundaries for group sizes where
    the product crosses an integer)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc = round(acc + fractions[name], 12)
        out.append((name, acc))
    out.append((names[-1], None))
    return out


def stratified_split(
    df: DataFrame,
    key_col: str,
    group_col: str,
    fractions: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """EXACT per-stratum split: within every ``group_col`` value, rows
    are ranked by (md5(key), key) — a deterministic, engine-independent
    total order — and quota'd so each split gets exactly
    ``ceil(cum_fraction * group_size)`` rows cumulatively. Use when
    per-class proportions must hold exactly (class-balanced train/val/
    test); ``hash_split`` only converges to the fractions in
    expectation, which under-represents small strata.

    Cost: ONE shuffle on the group key (row_number and the group count
    share the same window partitioning, so Spark evaluates both in one
    exchange+sort). Quotas per group mean no global coordination — each
    stratum is sized independently, so the operator scales with the
    number of rows, not groups. Skew note: a single giant stratum lands
    in one partition's sort — at 100 TB pre-aggregate group sizes and
    assign ranks via a two-level (salted rank + offset) scheme instead;
    for label-like strata (≤ millions of rows each) this direct window
    is the right plan."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    key = F.col(key_col)
    w = Window.partitionBy(group_col).orderBy(F.md5(key.cast("string")), key)
    wg = Window.partitionBy(group_col)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wg)
    expr: Column | None = None
    last_name = None
    for name, cum in cumulative_bounds(fractions):
        if cum is None:
            last_name = name
            continue
        cond = rn <= F.ceil(F.lit(cum) * n)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    assert last_name is not None
    expr = expr.otherwise(last_name) if expr is not None else F.lit(last_name)
    return df.withColumn(out_col, expr)


def weighted_mixture(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    out_col: str = "sampled",
) -> DataFrame:
    """Deterministic data mixing: downsample each source to its target
    rate (the "data mixture" step of corpus assembly — e.g. keep 25% of
    crawl, 100% of books). A row is kept iff its 16-bit md5 bucket of
    ``source:key`` falls below floor(rate·65536) — the same hex-bucket
    scheme as hash_split, so the decision is a pure scan-side
    expression: reproducible across runs and engines, stable under
    corpus growth (a kept row stays kept when other rows arrive), zero
    shuffle. Salting the hash with the source decorrelates a row's
    mixture fate from its hash_split fate and from other sources' cuts.

    Unknown sources take ``default_rate``. Rates must lie in [0, 1];
    rate 1.0 keeps everything (bucket < '10000' is always true for 4
    hex chars), rate 0.0 drops everything.

    Output: input columns + ``rate`` (double) + ``out_col`` (boolean);
    ``filter(out_col)`` IS the mixed corpus. The flag is emitted rather
    than pre-filtered so audits can count kept/dropped per source from
    one frame."""
    for name, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    src = F.col(source_col)
    rate_expr: Column | None = None
    for name in sorted(rates):
        clause = (src == name, F.lit(float(rates[name])))
        rate_expr = (
            F.when(*clause) if rate_expr is None else rate_expr.when(*clause)
        )
    rate_expr = (
        rate_expr.otherwise(F.lit(float(default_rate)))
        if rate_expr is not None
        else F.lit(float(default_rate))
    )
    bucket = F.substring(
        F.md5(F.concat_ws(":", src, F.col(key_col).cast("string"))), 1, 4
    )

    def keep(rate: float) -> Column:
        # Endpoints cannot use the hex comparison: 1.0 needs bucket <
        # 0x10000, which no 4-hex string comparison can express (string
        # order is lexicographic, "ffff" > "10000").
        if rate >= 1.0:
            return F.lit(True)
        if rate <= 0.0:
            return F.lit(False)
        return bucket < format(int(rate * 65536), "04x")

    keep_expr: Column | None = None
    for name in sorted(rates):
        clause = (src == name, keep(float(rates[name])))
        keep_expr = F.when(*clause) if keep_expr is None else keep_expr.when(*clause)
    keep_expr = (
        keep_expr.otherwise(keep(default_rate))
        if keep_expr is not None
        else keep(default_rate)
    )
    return df.withColumn("rate", rate_expr).withColumn(out_col, keep_expr)


def reservoir_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic uniform k-per-key sample ("reservoir" semantics
    without the sequential reservoir): rows rank by
    ``md5(salt || id)`` within each key and the top ``k`` survive.
    A cryptographic hash of the id is a uniform random order that is
    REPRODUCIBLE across engines, runs, and partitionings — unlike an
    actual streaming reservoir, whose result depends on encounter
    order — so the sample is oracle-checkable and stable under
    re-partitioning. ``salt`` yields independent re-draws. One window
    shuffle on the key; emits ``sample_rank`` (1..k) for downstream
    deterministic sub-sampling."""
    order = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(key_col).orderBy(order, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
