"""Tests for tools/make_scaled_data.py — the 10x replica builder the
r6 scaling study (SCALING.md, bench.py's ``scaling`` block) rests on.
If the replica construction were wrong (broken FK consistency, changed
schema, cross-replica text overlap), every measured exponent would be
measuring an artifact instead of the engine."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from make_scaled_data import TABLES, build  # noqa: E402

BASE = "/root/testdata/sf0.001"


def _built(tmp_path):
    out = str(tmp_path / "sf_x3")
    build(BASE, out, k=3)
    return out


def test_row_counts_and_schema(tmp_path):
    out = _built(tmp_path)
    for t in TABLES:
        base = pq.read_table(f"{BASE}/{t}.parquet")
        big = pq.read_table(f"{out}/{t}.parquet")
        assert big.schema.equals(base.schema), t
        expect = base.num_rows if t in ("region", "nation") else 3 * base.num_rows
        assert big.num_rows == expect, t


def test_foreign_keys_resolve(tmp_path):
    """Every replica's facts must reference that replica's dims — the
    TPC-H scaling law (join fan-out per key identical to base)."""
    out = _built(tmp_path)
    orders = pq.read_table(f"{out}/orders.parquet")
    cust = pq.read_table(f"{out}/customer.parquet")
    custkeys = set(cust.column("c_custkey").to_pylist())
    assert set(orders.column("o_custkey").to_pylist()) <= custkeys
    li = pq.read_table(f"{out}/lineitem.parquet")
    okeys = set(orders.column("o_orderkey").to_pylist())
    assert set(li.column("l_orderkey").to_pylist()) <= okeys


def test_keys_unique_across_replicas(tmp_path):
    out = _built(tmp_path)
    for t, key in [
        ("customer", "c_custkey"),
        ("orders", "o_orderkey"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("events", "event_id"),
    ]:
        col = pq.read_table(f"{out}/{t}.parquet").column(key)
        assert pc.count_distinct(col).as_py() == len(col), t


def test_documents_cipher_preserves_structure_zero_overlap(tmp_path):
    """The Caesar transform is a bijection on characters: within-replica
    text lengths identical to base; cross-replica token overlap ~zero
    (so near-dup pair volume scales linearly, not k^2)."""
    out = _built(tmp_path)
    base = pq.read_table(f"{BASE}/documents.parquet")
    big = pq.read_table(f"{out}/documents.parquet")
    n = base.num_rows
    base_texts = base.column("text").to_pylist()
    r1 = big.column("text").to_pylist()[n : 2 * n]
    assert all(len(a) == len(b) for a, b in zip(base_texts, r1))
    assert r1 != base_texts
    base_words = set(" ".join(t for t in base_texts if t).split())
    r1_words = set(" ".join(t for t in r1 if t).split())
    overlap = len(base_words & r1_words) / max(1, len(base_words))
    assert overlap < 0.05, overlap


def test_embeddings_transform_is_orthogonal(tmp_path):
    """Per-replica sign-flip+roll must preserve within-replica geometry
    exactly: all pairwise dot products of replica 1 equal the base's."""
    out = _built(tmp_path)
    base = np.array(
        pq.read_table(f"{BASE}/embeddings.parquet").column("embedding").to_pylist(),
        dtype=np.float32,
    )
    n = base.shape[0]
    big = np.array(
        pq.read_table(f"{out}/embeddings.parquet").column("embedding").to_pylist(),
        dtype=np.float32,
    )
    r1 = big[n : 2 * n]
    assert not np.allclose(base, r1)
    sample = np.arange(0, n, max(1, n // 50))
    g_base = base[sample] @ base[sample].T
    g_r1 = r1[sample] @ r1[sample].T
    np.testing.assert_allclose(g_base, g_r1, rtol=1e-5, atol=1e-4)


def test_cipher_distinct_past_caesar_period(tmp_path):
    """Regression for the k>26 wall: the old Caesar rotation repeated
    with period 26, so replicas 26 apart were byte-identical and a
    k=50 corpus (sf5) would carry quadratic cross-replica exact-dup
    volume. The permutation cipher must keep replicas 1 and 27 (and 13
    vs 26, the old 'or 13' collision) mutually distinct with ~zero
    word overlap."""
    from make_scaled_data import _letter_permutation_table

    base_texts = [
        t
        for t in pq.read_table(f"{BASE}/documents.parquet")
        .column("text")
        .to_pylist()[:200]
        if t
    ]
    for r_a, r_b in [(1, 27), (13, 26), (2, 28)]:
        ta, tb = _letter_permutation_table(r_a), _letter_permutation_table(r_b)
        a_words = set(" ".join(t.translate(ta) for t in base_texts).split())
        b_words = set(" ".join(t.translate(tb) for t in base_texts).split())
        overlap = len(a_words & b_words) / max(1, len(a_words))
        assert overlap < 0.05, (r_a, r_b, overlap)
