"""Trigram-LM quality filter contract (operators/text.trigram_lm_quality).

A pure-Python reference computes the same leakage-aware split, add-one
smoothing, and integer-scaled mean — independently of both the Spark
expression plan and the DuckDB oracle (which is the third copy, hashed
by the driver gate under text_metrics 'lm' rows).
"""

from __future__ import annotations

import collections
import math

import pytest

from rta_registrations_pyspark_glue_spark.operators import text

SCALE = 1_000_000_000


def _ref(docs, train_mod=10, train_buckets=8, keep_threshold=0.01):
    tris_by_doc = {
        i: [t[j : j + 3] for j in range(len(t) - 2)]
        for i, t in docs
        if len(t) >= 3
    }
    train = [
        tri
        for i, ts in tris_by_doc.items()
        if i % train_mod < train_buckets
        for tri in ts
    ]
    c3 = collections.Counter(train)
    c2 = collections.Counter(t[:2] for t in train)
    v = len({t[2] for t in train})
    out = {}
    for i, t in docs:
        ts = tris_by_doc.get(i, [])
        if not ts:
            out[i] = (0, None, 0, False)
            continue
        s = 0
        unseen = 0
        for tri in ts:
            p = (c3.get(tri, 0) + 1) / (c2.get(tri[:2], 0) + v)
            s += math.floor(p * SCALE)
            if tri not in c3:
                unseen += 1
        mean = s / (len(ts) * SCALE)
        out[i] = (len(ts), mean, unseen, mean >= keep_threshold)
    return out


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "the cat and the dog"),
    (3, "xyzzy qwfp zzzz"),          # junk: unlike the rest
    (4, "on the mat the cat sat"),
    (5, "hi"),                        # too short: no trigrams
    (8, "the mat on the cat"),        # train split member
    (9, "completely different text"),  # doc_id 9 -> HELD OUT of training
]


def test_matches_reference_exactly(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.n_trigrams, r.lm_mean_prob, r.n_unseen, r.lm_keep)
        for r in text.trigram_lm_quality(df).collect()
    }
    want = _ref(DOCS)
    assert set(got) == set(want)
    for i in got:
        gn, gm, gu, gk = got[i]
        wn, wm, wu, wk = want[i]
        assert (gn, gu, gk) == (wn, wu, wk), i
        if wm is None:
            assert gm is None, i
        else:
            assert gm == pytest.approx(wm, abs=0, rel=0), i  # exact


def test_held_out_docs_are_scored_by_unseen_model(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    rows = {r.doc_id: r for r in text.trigram_lm_quality(df).collect()}
    # doc 9 is excluded from training (9 % 10 >= 8) — its novel
    # trigrams must register as unseen
    assert rows[9].n_unseen > 0
    # in-distribution docs score higher than the junk doc
    assert rows[0].lm_mean_prob > rows[3].lm_mean_prob


def test_short_doc_contract(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    rows = {r.doc_id: r for r in text.trigram_lm_quality(df).collect()}
    assert rows[5].n_trigrams == 0
    assert rows[5].lm_mean_prob is None
    assert rows[5].lm_keep is False


def test_junk_filtered_by_keep_flag(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    rows = {r.doc_id: r for r in text.trigram_lm_quality(df).collect()}
    assert rows[0].lm_keep and rows[1].lm_keep and rows[4].lm_keep


def test_broadcast_joins_in_plan(spark):
    """The two per-trigram LM lookups must be broadcast hash joins —
    the bounded (charset³) LM table is the whole 100 TB story. The
    1-row smoothing-vocabulary attach constant-folds its key and plans
    as a BroadcastNestedLoopJoin with a single-row build side (equally
    scan-shaped); only the per-doc re-attach may shuffle."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    plan = text.trigram_lm_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan
    # the trigram-stream side must NOT sort-merge against the LM tables
    # (one SortMergeJoin is expected: the final per-doc re-attach)
    assert plan.count("SortMergeJoin") <= 1
