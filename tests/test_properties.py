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
