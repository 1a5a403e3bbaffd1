"""Sequence packing — concatenate documents into fixed-length training
sequences (GPT-style pretraining packing: concat the token stream in a
deterministic document order, cut every ``seq_len`` tokens).

The operator computes, per document, where its tokens land in the packed
stream: the first/last sequence index and the offset within the first
sequence. Downstream loaders group by sequence index to materialize
training examples; a document may straddle sequence boundaries exactly
as in the standard packing scheme.

Scale design — the core is a GLOBAL prefix sum over a deterministic
total order, which a naive ``Window.orderBy`` without partitioning would
serialize onto one task. The distributed form here is the classic
two-level scan:

1. range-repartition by the order key, so partition i holds a
   contiguous, ordered slice of the stream;
2. per-partition token sums — one tiny aggregate, one row per
   partition, collected to the driver (bounded);
3. broadcast the per-partition prefix offsets back (a literal map) and
   finish with a WITHIN-partition running sum — window partitioned by
   the physical partition id, parallel, never a single-task global sort.

Determinism: range-boundary sampling places rows into partitions
nondeterministically at the margin, but the prefix sum is over the total
order key, so a document's cumulative offset — and therefore its packing
— is identical regardless of where boundaries land (asserted by the
partition-invariance test).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.caching import tracked_persist
from rta_registrations_pyspark_glue_spark.operators.text import tokens


def _doc_token_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    token_count_col: str | None,
    extra_cols: tuple[str, ...] = (),
    with_okey: bool = True,
) -> DataFrame:
    """(id[, extras], n_tokens[, __okey]): the shared input projection
    of the packers — token counts from ``token_count_col`` if given,
    else whitespace tokenization (empty/blank text = 0 tokens), plus the
    deterministic md5 order key when the caller's order needs one
    (select_token_budget orders by priority instead and skips the md5 +
    32 shuffled bytes per row). NULL counts (null text, or a null entry
    in token_count_col) pack as 0 tokens: without the coalesce a
    partition of all-null counts sums to NULL and the driver offset
    arithmetic crashes, while mixed nulls would silently skew offsets."""
    n_tok = (
        F.col(token_count_col)
        if token_count_col
        else F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
            F.size(tokens(text_col))
        )
    )
    cols = [
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.coalesce(n_tok.cast("long"), F.lit(0)).alias("n_tokens"),
    ]
    if with_okey:
        cols.append(F.md5(F.col(id_col).cast("string")).alias("__okey"))
    return df.select(*cols)


def _with_stream_offset(
    d: DataFrame, order_cols: list, num_partitions: int | None = None
) -> DataFrame:
    """Attach ``stream_offset`` — the running sum of ``n_tokens`` over
    all rows strictly preceding each row in the ``order_cols`` total
    order — via the distributed two-level scan (see module docstring):
    range-repartition on the order, collect one per-partition sum
    (bounded by partition count), broadcast the prefix offsets back as
    a literal map, finish with a within-partition window. Never a
    single-task global sort. ``order_cols`` must be a total order or
    offsets are nondeterministic."""
    nparts = num_partitions or int(
        d.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    d = tracked_persist(
        d.repartitionByRange(nparts, *order_cols).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    psums = {
        r["__pid"]: r["s"]
        for r in d.groupBy("__pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(psums):
        offsets[pid] = acc
        acc += psums[pid]
    off_expr = (
        F.element_at(
            F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv]),
            F.col("__pid"),
        )
        if offsets
        else F.lit(0)
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return d.withColumn(
        "stream_offset", off_expr + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream.

    Order is (md5(id), id) — deterministic, uniform (so range partitions
    balance regardless of id distribution), engine-independent. Token
    counts come from ``token_count_col`` if given, else whitespace
    tokenization of ``text_col`` (empty/blank text = 0 tokens).

    Output: (id_col, n_tokens, stream_offset, seq_first, seq_last,
    offset_in_seq) — stream_offset is the document's absolute start in
    the concatenated token stream, seq_first/seq_last the sequence
    indices its tokens touch (equal when it fits in one sequence),
    offset_in_seq = stream_offset % seq_len."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    d = _doc_token_frame(df, id_col, text_col, token_count_col)
    d = _with_stream_offset(
        d, [F.col("__okey"), F.col(id_col)], num_partitions
    )
    return d.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("stream_offset"),
    ).select(
        id_col,
        "n_tokens",
        "stream_offset",
        F.floor(F.col("stream_offset") / seq_len).alias("seq_first"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor((F.col("stream_offset") + F.col("n_tokens") - 1) / seq_len),
        )
        .otherwise(F.floor(F.col("stream_offset") / seq_len))
        .alias("seq_last"),
        (F.col("stream_offset") % seq_len).alias("offset_in_seq"),
    )


#: pack_bins sizing targets: a BFD group should hold well under one
#: Arrow batch of (id, count) rows; 500k rows ≈ tens of MB in pandas —
#: comfortable — while the 64-group floor keeps small corpora
#: deterministic and parallel.
BIN_GROUP_TARGET_DOCS = 500_000
BIN_GROUPS_FLOOR = 64


def derive_bin_groups(n_docs: int) -> int:
    """Group count for pack_bins from the corpus size: enough groups
    that each holds ~BIN_GROUP_TARGET_DOCS documents (the documented
    fits-in-an-Arrow-batch bound), never fewer than the floor. Pure so
    the sizing policy is unit-testable."""
    return max(BIN_GROUPS_FLOOR, math.ceil(n_docs / BIN_GROUP_TARGET_DOCS))


def pack_bins(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_groups: int | None = None,
) -> DataFrame:
    """Boundary-RESPECTING packing: documents never straddle sequences
    (the packing used when attention must not cross document boundaries
    and truncation losses matter — the complement of pack_sequences'
    concat-and-chop). Approximate bin packing via best-fit-decreasing
    (bin_pack_decreasing).

    Distribution scheme: documents are hashed into ``n_groups``
    DETERMINISTIC groups (xxhash64 of the md5 order key — not physical
    partitions, whose range-sampling boundaries shift between runs), and
    BFD runs independently inside each group via applyInPandas; bin ids
    are made globally disjoint as group * 2^40 + local index. Packing
    quality loses only the tail bin of each group versus a global BFD
    (waste ≤ n_groups·seq_len tokens overall), while each group packs in
    RAM with no global state — the only shape that works when the corpus
    outgrows one machine.

    ``n_groups`` defaults to ``derive_bin_groups(df.count())`` — one
    metadata-cheap count (parquet scans answer it from footers) sizes
    groups to ~500k (id, count) rows each, ENFORCING the
    fits-in-an-Arrow-batch bound instead of advising it; at 10⁹ docs the
    old fixed 64 would have put ~16M rows in one pandas group. Pass
    ``n_groups`` explicitly to skip the count (e.g. when the caller
    already knows the corpus size) — note the derived default makes the
    bin assignment a function of corpus SIZE too: the same corpus packs
    identically across runs and partitionings, but growing it past a
    500k-docs-per-group boundary re-shuffles group membership (fine for
    a from-scratch packing pass; pin n_groups to compare across grows).

    A document longer than ``seq_len`` gets a bin of its own with
    ``oversize=True`` — the loader decides whether to truncate or
    segment it; this operator never silently drops tokens.

    Output: (id_col, n_tokens, bin_id, oversize). Deterministic for a
    given (corpus, seq_len, n_groups) regardless of input partitioning
    (asserted by tests)."""
    import pandas as pd

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_groups is None:
        n_groups = derive_bin_groups(df.count())
    if n_groups <= 0:
        raise ValueError(f"n_groups must be positive, got {n_groups}")
    d = _doc_token_frame(df, id_col, text_col, token_count_col).withColumn(
        "__grp", F.pmod(F.xxhash64("__okey"), F.lit(n_groups))
    )

    id_field = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_field}, n_tokens long, bin_id long, oversize boolean"
    )

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = int(pdf["__grp"].iloc[0])
        base = grp << 40
        # Decreasing size; (okey, id) tiebreak = total order, so the
        # assignment is a pure function of the group's contents.
        pdf = pdf.sort_values(
            ["n_tokens", "__okey", id_col], ascending=[False, True, True]
        )
        local_bin, oversize = bin_pack_decreasing(
            [int(n) for n in pdf["n_tokens"]], seq_len
        )
        pdf = pdf.assign(bin_id=[base + b for b in local_bin], oversize=oversize)
        return pdf[[id_col, "n_tokens", "bin_id", "oversize"]]

    return d.groupBy("__grp").applyInPandas(ffd, schema=out_schema)


def bin_pack_decreasing(
    sizes: list[int], seq_len: int
) -> tuple[list[int], list[bool]]:
    """The pure packing core — BEST-fit-decreasing: ``sizes`` must
    already be in assignment order (pack_bins sorts decreasing with a
    deterministic tiebreak); each item goes to the TIGHTEST open bin
    that holds it (ties broken by lowest bin id), found by bisect over
    a capacity-sorted list — O(log bins) per choice, where a first-fit
    linear scan over open bins is O(items·bins) pure Python and
    quadratic at the ~10⁵-doc groups pack_bins targets. An item larger
    than ``seq_len`` owns a closed solo bin (never reopened — a cap-0
    entry would still admit zero-size items and break the
    oversize-bins-are-solo contract); a bin filled exactly closes too.
    Returns (bin index per item, oversize flag per item). Pure so the
    packing invariants are property-testable without a Spark session."""
    import bisect

    open_bins: list[tuple[int, int]] = []  # (capacity, bin_id), sorted
    n_bins = 0
    out_bin, out_over = [], []
    for n in sizes:
        if n > seq_len:
            out_bin.append(n_bins)
            out_over.append(True)
            n_bins += 1
            continue
        i = bisect.bisect_left(open_bins, (n, -1))
        if i == len(open_bins):
            b, cap = n_bins, seq_len - n
            n_bins += 1
        else:
            cap, b = open_bins.pop(i)
            cap -= n
        if cap > 0:
            bisect.insort(open_bins, (cap, b))
        out_bin.append(b)
        out_over.append(False)
    return out_bin, out_over


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    priority_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-budget corpus curation: flag the highest-priority documents
    whose tokens fit a global budget — "take the best N billion tokens"
    (priority is typically a quality score; any numeric column works).

    Selection rule is PREFIX TRUNCATION over the (priority DESC, id)
    total order: a document is selected iff its cumulative token count
    INCLUDING itself is within the budget. Because the cumulative sum is
    monotone, the selected set is a clean prefix — deterministic,
    engine-reproducible, and expressible as the same distributed
    two-level prefix sum pack_sequences uses (one range shuffle, no
    single-task global sort). This is deliberately NOT a knapsack
    back-fill: once the first document overflows the budget, nothing
    after it is taken, so the selected token total never exceeds
    ``budget_tokens`` and never depends on iterative state.

    Output: (id_col, priority_col, n_tokens, stream_offset, selected);
    ``filter(selected)`` is the curated corpus, and stream_offset gives
    each selected doc's position in the curated token stream."""
    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    d = _doc_token_frame(
        df,
        id_col,
        text_col,
        token_count_col,
        extra_cols=(priority_col,),
        with_okey=False,
    )
    d = _with_stream_offset(
        d,
        [F.col(priority_col).desc(), F.col(id_col)],
        num_partitions,
    )
    return d.select(
        F.col(id_col),
        F.col(priority_col),
        F.col("n_tokens"),
        F.col("stream_offset"),
        ((F.col("stream_offset") + F.col("n_tokens")) <= budget_tokens).alias(
            "selected"
        ),
    )

