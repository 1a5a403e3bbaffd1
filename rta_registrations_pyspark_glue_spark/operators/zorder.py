"""Z-order (Morton-curve) clustering for data-skipping parquet layout.

The lakehouse OPTIMIZE ZORDER BY primitive (public technique: Morton
1966 space-filling curves; the layout strategy Delta/Iceberg expose):
rows sorted by the bit-interleaving of several range-normalized keys
land in files whose per-file min/max envelopes are TIGHT in every
dimension at once — so a predicate on ANY of the keys prunes most
files from a scan, where a lexicographic sort only prunes on its
leading column. At 100 TB this is the difference between reading one
row group and reading the table for a secondary-key query.

Spark-first shape: the Morton key is a pure codegen expression
(shift/or folds over fixed-width normalized ints — zero UDF), the sort
is ``repartitionByRange`` on the key (one range shuffle, the same
machinery a global orderBy uses, but writable per-partition without a
final coalesce), and verification reads the parquet FOOTERS (pyarrow)
to prove the per-file envelopes actually shrank — the physical fact
data-skipping depends on, not a proxy.

Rank-based variant: real keys are skewed, and raw linear
normalization wastes curve resolution on empty ranges; ``zorder_by``
therefore defaults to PERCENT_RANK normalization per key (one window
per key over the sort sample — Spark's range partitioner already
samples similarly), which equalizes occupancy across the curve.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def morton_key(norm_cols: list[Column], bits: int = 16) -> Column:
    """Bit-interleave ``len(norm_cols)`` already-normalized integer
    columns (each in [0, 2^bits)) into one Morton key: output bit
    ``i*n + j`` takes bit ``i`` of column ``j``. Pure expression —
    shiftleft/bitwise-or fold, codegen-friendly, no UDF."""
    n = len(norm_cols)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(norm_cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def rank_normalize(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Add ``__zn_<col>`` columns: each key percent-ranked over the
    dataset and scaled to [0, 2^bits) — skew-proof curve coordinates.
    One window per key; NULLs rank first (lowest coordinate), which
    keeps them clustered."""
    out = df
    top = (1 << bits) - 1
    for c in cols:
        pr = F.percent_rank().over(Window.orderBy(F.col(c)))
        out = out.withColumn(f"__zn_{c}", F.floor(pr * top).cast("long"))
    return out


def zorder_by(
    df: DataFrame,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    rank: bool = True,
) -> DataFrame:
    """Cluster ``df`` for write: rows ordered along the Morton curve of
    ``cols`` and range-partitioned into ``n_files`` partitions (write
    with ``.write.parquet`` → one tight-enveloped file per partition).

    ``rank=True`` (default) percent-rank-normalizes each key first;
    ``rank=False`` assumes the columns are already small non-negative
    ints within ``bits`` width (cheaper: no windows).

    Scale note: the per-key rank windows are global-ordering windows —
    at extreme scale replace them with approx-quantile bucketing (the
    same curve at coarser resolution); the Morton expression and range
    shuffle are unchanged. The range partitioner samples the key, so
    the only full-data passes are the windows (optional) and the final
    shuffle."""
    if rank:
        normed = rank_normalize(df, cols, bits)
        ncols = [F.col(f"__zn_{c}") for c in cols]
    else:
        normed = df
        ncols = [F.col(c) for c in cols]
    keyed = normed.withColumn("__zkey", morton_key(ncols, bits))
    out = keyed.repartitionByRange(n_files, "__zkey").sortWithinPartitions(
        "__zkey"
    )
    return out.drop("__zkey", *[f"__zn_{c}" for c in cols])


def file_envelopes(path: str, cols: list[str]) -> list[dict]:
    """Per-file (min, max) envelope of each column, read from the
    parquet FOOTER statistics (pyarrow) — the exact metadata a
    data-skipping scan consults. Returns one dict per data file."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        env: dict = {"file": name, "n_rows": md.num_rows}
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        for col in cols:
            ci = schema_names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is not None and st.has_min_max:
                    mins.append(st.min)
                    maxs.append(st.max)
            env[col] = (min(mins), max(maxs)) if mins else (None, None)
        out.append(env)
    return out


def skipping_ratio(envelopes: list[dict], col: str, value) -> float:
    """Fraction of files a point predicate ``col = value`` can SKIP
    given the footer envelopes — the measurable payoff of the layout."""
    total = len(envelopes)
    if total == 0:
        return 0.0
    hit = sum(
        1
        for e in envelopes
        if e[col][0] is not None and e[col][0] <= value <= e[col][1]
    )
    return (total - hit) / total
