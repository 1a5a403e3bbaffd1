"""Heavy-hitters contract (operators/sketches.py).

The output is EXACT (sketch only generates candidates), so every test
compares against brute-force counts; the candidate stage is tested for
its superset guarantee under adversarial orderings and tiny k.
"""

from __future__ import annotations

import collections

import numpy as np
import pytest

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import sketches


def _brute(values, k):
    c = collections.Counter(values)
    n = len(values)
    return {v: f for v, f in c.items() if f * k > n}


def _check(spark, values, k, n_partitions=4):
    df = spark.createDataFrame(
        [(v,) for v in values], "token string"
    ).repartition(n_partitions)
    got = {
        r.token: r.n_occurrences
        for r in sketches.heavy_hitters(df, "token", k).collect()
    }
    assert got == _brute(values, k), (k, n_partitions)


def test_zipfian_stream(spark):
    rng = np.random.default_rng(0x5EED)
    vals = [f"w{int(v)}" for v in rng.zipf(1.3, 5000) % 300]
    for k in (5, 20, 100):
        _check(spark, vals, k)


def test_adversarial_order_rotation(spark):
    # heavy item arrives LAST after k distinct decoys repeated — the
    # decrement cascade must not lose it
    vals = [f"d{i}" for i in range(50)] * 4 + ["heavy"] * 120
    _check(spark, vals, 3, n_partitions=1)
    _check(spark, list(reversed(vals)), 3, n_partitions=1)


def test_no_heavy_hitters_is_empty(spark):
    vals = [f"u{i}" for i in range(200)]  # all unique
    df = spark.createDataFrame([(v,) for v in vals], "token string")
    assert sketches.heavy_hitters(df, "token", 100).count() == 0


def test_threshold_is_strict(spark):
    # freq == N/k exactly must NOT qualify (contract: count*k > N)
    vals = ["a"] * 25 + [f"u{i}" for i in range(75)]  # N=100, k=4 -> N/k=25
    df = spark.createDataFrame([(v,) for v in vals], "token string")
    got = {r.token for r in sketches.heavy_hitters(df, "token", 4).collect()}
    assert "a" not in got
    vals.append("a")  # now 26 > 101/4
    df = spark.createDataFrame([(v,) for v in vals], "token string")
    got = {r.token for r in sketches.heavy_hitters(df, "token", 4).collect()}
    assert got == {"a"}


def test_nulls_excluded(spark):
    vals = ["a"] * 10 + [None] * 90
    df = spark.createDataFrame([(v,) for v in vals], "token string")
    got = {
        r.token: r.n_occurrences
        for r in sketches.heavy_hitters(df, "token", 2).collect()
    }
    assert got == {"a": 10}  # N counts only non-null -> 10*2 > 10


def test_candidate_superset_guarantee(spark):
    rng = np.random.default_rng(7)
    vals = [f"w{int(v) % 40}" for v in rng.zipf(1.2, 3000)]
    df = spark.createDataFrame([(v,) for v in vals], "token string").repartition(8)
    k = 10
    cands = {r.token for r in sketches.mg_batch_candidates(df, "token", k).collect()}
    assert set(_brute(vals, k)) <= cands


def test_broadcast_verification_in_plan(spark):
    df = spark.createDataFrame([("a",)] * 10, "token string")
    plan = (
        sketches.heavy_hitters(df, "token", 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------- reservoir_per_key ----------------------------


def test_reservoir_per_key_contract(spark):
    from rta_registrations_pyspark_glue_spark.operators.sampling import (
        reservoir_per_key,
    )

    rows = [(i, f"k{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = reservoir_per_key(df, "lang", k=4).collect()
    by_key = collections.defaultdict(list)
    for r in out:
        by_key[r.lang].append((r.sample_rank, r.doc_id))
    for key, got in by_key.items():
        assert sorted(r for r, _ in got) == [1, 2, 3, 4], key
    # repartitioning must not change the sample (hash order, not
    # encounter order — the property an actual reservoir lacks)
    out2 = reservoir_per_key(df.repartition(13), "lang", k=4).collect()
    assert {(r.lang, r.sample_rank, r.doc_id) for r in out2} == {
        (r.lang, r.sample_rank, r.doc_id) for r in out
    }
    # a different salt draws a different sample
    out3 = reservoir_per_key(df, "lang", k=4, salt="other").collect()
    assert {(r.lang, r.doc_id) for r in out3} != {
        (r.lang, r.doc_id) for r in out
    }


def test_reservoir_small_groups_keep_everything(spark):
    from rta_registrations_pyspark_glue_spark.operators.sampling import (
        reservoir_per_key,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id bigint, lang string"
    )
    out = reservoir_per_key(df, "lang", k=10).collect()
    assert len(out) == 3  # k larger than any group: all rows survive
