"""Property-based tests (hypothesis) for the scalar operator layer:
batched through a single DataFrame per property so Spark round trips
stay cheap."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from rta_registrations_pyspark_glue_spark.functions.dates import parse_multiformat_date
from rta_registrations_pyspark_glue_spark.functions.hashing import surrogate_key
from rta_registrations_pyspark_glue_spark.operators.text import normalize_text

DATES = st.dates(min_value=datetime.date(1950, 1, 1), max_value=datetime.date(2026, 12, 31))


@settings(max_examples=10, deadline=None)
@given(st.lists(DATES, min_size=1, max_size=30))
def test_date_parse_roundtrip_all_formats(spark, dates):
    """format → parse is the identity for every dispatch branch."""
    rows = []
    for i, d in enumerate(dates):
        rows.append(Row(idx=3 * i, raw=d.strftime("%d/%m/%Y"), want=d))
        rows.append(Row(idx=3 * i + 1, raw=d.strftime("%d.%m.%Y"), want=d))
        rows.append(Row(idx=3 * i + 2, raw=d.strftime("%Y/%m/%d"), want=d))
    df = spark.createDataFrame(rows, "idx int, raw string, want date")
    out = df.select("want", parse_multiformat_date("raw").alias("got")).collect()
    for r in out:
        assert r.got == r.want


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcXYZ 09.|", min_size=0, max_size=24), min_size=1, max_size=25
    )
)
def test_surrogate_key_case_and_space_invariant(spark, values):
    """sha2 keys are invariant to case and surrounding whitespace of the
    natural key — the normalization contract of etl2:156-162."""
    rows = [Row(idx=i, a=v, b=f"  {v.upper()}  ") for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "idx int, a string, b string")
    out = df.select(
        surrogate_key("a").alias("ka"), surrogate_key("b").alias("kb")
    ).collect()
    for r in out:
        assert r.ka == r.kb


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=25))
def test_normalize_text_idempotent(spark, texts):
    """normalize(normalize(x)) == normalize(x) for arbitrary unicode."""
    df = spark.createDataFrame([Row(idx=i, t=t) for i, t in enumerate(texts)],
                               "idx int, t string")
    out = df.select(
        normalize_text("t").alias("once"),
    ).withColumn("twice", normalize_text("once")).collect()
    for r in out:
        assert r.once == r.twice


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**9),
                  st.integers(min_value=0, max_value=50)),
        min_size=1, max_size=40, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=64),
)
def test_pack_sequences_is_valid_packing(spark, docs, seq_len):
    """For arbitrary token counts and sequence lengths: offsets are the
    exact prefix sums of the (md5(id), id) order, every offset_in_seq is
    the stream offset mod seq_len, and the total stream length is the
    token-count sum — the invariants any packing consumer relies on."""
    import hashlib

    from pyspark.sql import functions as F

    from rta_registrations_pyspark_glue_spark.operators import packing

    df = spark.createDataFrame(docs, "doc_id bigint, n bigint")
    out = {
        r.doc_id: r
        for r in packing.pack_sequences(
            df, seq_len, token_count_col="n", num_partitions=3
        ).collect()
    }
    cum = 0
    for did, n in sorted(docs, key=lambda t: (hashlib.md5(str(t[0]).encode()).hexdigest(), t[0])):
        r = out[did]
        assert r.stream_offset == cum
        assert r.offset_in_seq == cum % seq_len
        assert r.seq_first == cum // seq_len
        cum += n
    assert cum == sum(n for _, n in docs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6),
                  st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    )
)
def test_stratified_split_quota_property(spark, rows):
    """Every stratum's split sizes are exactly the ceil-quota cuts of its
    own size, for arbitrary group compositions."""
    import math

    from rta_registrations_pyspark_glue_spark.operators import sampling

    df = spark.createDataFrame(rows, "k bigint, g string")
    out = sampling.stratified_split(df, "k", "g").collect()
    sizes: dict[str, int] = {}
    counts: dict[tuple[str, str], int] = {}
    for r in out:
        sizes[r.g] = sizes.get(r.g, 0) + 1
        counts[(r.g, r["split"])] = counts.get((r.g, r["split"]), 0) + 1
    for g, n in sizes.items():
        t, v = math.ceil(0.8 * n), math.ceil(0.9 * n)
        assert counts.get((g, "train"), 0) == t
        assert counts.get((g, "val"), 0) == v - t
        assert counts.get((g, "test"), 0) == n - v


@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=120),
    st.integers(min_value=1, max_value=100),
)
@settings(max_examples=200, deadline=None)
def test_ffd_invariants(sizes, seq_len):
    """Pure packing core (operators/packing.bin_pack_decreasing,
    best-fit-decreasing): every item assigned exactly once; no regular
    bin over capacity; oversize items alone in closed bins; bin count
    within the any-fit guarantee (< 2·OPT lower bound + 1: a new bin
    opens only when the item fits NO open bin, so no two non-oversize
    bins can both be ≤ half full)."""
    from rta_registrations_pyspark_glue_spark.operators.packing import (
        bin_pack_decreasing,
    )

    order = sorted(range(len(sizes)), key=lambda i: -sizes[i])
    ordered = [sizes[i] for i in order]
    bins, over = bin_pack_decreasing(ordered, seq_len)
    assert len(bins) == len(ordered) == len(over)
    fill: dict[int, int] = {}
    members: dict[int, list[int]] = {}
    for n, b, ov in zip(ordered, bins, over):
        assert ov == (n > seq_len)
        fill[b] = fill.get(b, 0) + n
        members.setdefault(b, []).append(n)
    for b, tot in fill.items():
        if any(n > seq_len for n in members[b]):
            assert len(members[b]) == 1
        else:
            assert tot <= seq_len
    # Bin ids are dense 0..k-1 in first-use order.
    assert sorted(set(bins)) == list(range(len(set(bins))))
    regular_total = sum(n for n in ordered if 0 < n <= seq_len)
    regular_bins = {
        b for n, b, ov in zip(ordered, bins, over) if not ov and n > 0
    }
    if regular_total:
        lower = -(-regular_total // seq_len)
        assert len(regular_bins) <= 2 * lower + 1
