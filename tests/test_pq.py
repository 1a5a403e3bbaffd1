"""Product-quantization tests: determinism, partition invariance,
validation, and — the strong claim — refined-search bit-equality with
the exact (oracle-grade) paths on the real gate corpus."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import pq, similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def cb(emb):
    return pq.train_pq_codebooks(
        emb, m=16, n_codes=256, iters=8, corpus_id="vec_id",
        corpus_vec="embedding",
    )


@pytest.fixture(scope="module")
def codes(emb, cb):
    c = pq.pq_encode(emb, cb, corpus_id="vec_id", corpus_vec="embedding")
    c.cache()
    c.count()
    return c


def _q(emb):
    return emb.selectExpr("vec_id as qid", "embedding as qv")


def test_train_bit_deterministic(emb):
    a = pq.train_pq_codebooks(emb, m=8, n_codes=16, iters=4,
                              corpus_id="vec_id", corpus_vec="embedding")
    b = pq.train_pq_codebooks(emb, m=8, n_codes=16, iters=4,
                              corpus_id="vec_id", corpus_vec="embedding")
    assert a == b  # nested float tuples: bit equality


def test_encode_partition_invariant(emb, cb, codes):
    base = {r["vec_id"]: r["__code"] for r in codes.collect()}
    re = pq.pq_encode(
        emb.repartition(7), cb, corpus_id="vec_id", corpus_vec="embedding"
    )
    assert {r["vec_id"]: r["__code"] for r in re.collect()} == base


def test_code_width_and_compression(cb, codes):
    rows = codes.select(F.length("__code").alias("w")).distinct().collect()
    assert [r["w"] for r in rows] == [cb.m]
    assert cb.code_bytes == 16  # vs 64 dims * 8 B float64 = 32x


def test_shape_validation(emb):
    with pytest.raises(ValueError, match="must divide"):
        pq.train_pq_codebooks(emb, m=7, corpus_id="vec_id",
                              corpus_vec="embedding")
    with pytest.raises(ValueError, match="n_codes"):
        pq.train_pq_codebooks(emb, m=8, n_codes=257, corpus_id="vec_id",
                              corpus_vec="embedding")
    with pytest.raises(ValueError, match="n_codes"):
        pq.train_pq_codebooks(emb, m=8, n_codes=0, corpus_id="vec_id",
                              corpus_vec="embedding")


def test_zero_norm_rows_dropped(spark, cb):
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    out = pq.pq_encode(df, cb, corpus_id="vec_id", corpus_vec="embedding")
    assert [r["vec_id"] for r in out.collect()] == [2]


def test_ragged_codebooks_when_sample_small(spark):
    # 3 distinct unit vectors (norm exactly 1, so normalization is
    # bitwise stable) but n_codes=8: each subspace codebook shrinks to
    # its distinct-subvector count, and encoding still works
    rows = [
        (i, [1.0 if d == i % 3 else 0.0 for d in range(8)]) for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb3 = pq.train_pq_codebooks(df, m=4, n_codes=8, iters=2,
                                corpus_id="vec_id", corpus_vec="embedding")
    assert all(1 <= len(book) <= 3 for book in cb3.codebooks)
    assert any(len(book) < 8 for book in cb3.codebooks)
    out = pq.pq_encode(df, cb3, corpus_id="vec_id", corpus_vec="embedding")
    assert out.count() == 12


def test_max_train_rows_guard(emb):
    with pytest.raises(ValueError, match="max_train_rows"):
        pq.train_pq_codebooks(emb, corpus_id="vec_id", corpus_vec="embedding",
                              max_train_rows=10)


def test_refined_adc_equals_exact_bruteforce(emb, cb, codes):
    """The headline pin: ADC candidates + exact re-rank reproduce the
    fold-exact brute-force top-k BIT-FOR-BIT on the gate corpus."""
    q = _q(emb)
    exact = similarity.brute_force_topk(
        q, emb, k=5, corpus_id="vec_id", corpus_vec="embedding"
    )
    refined = pq.pq_topk_adc(
        codes, cb, q, k=5, corpus_id="vec_id",
        refine_with=emb, corpus_vec="embedding", refine_factor=16,
    )
    a = sorted(tuple(r) for r in exact.collect())
    b = sorted(tuple(r) for r in refined.collect())
    assert a == b


def test_pure_adc_recall_floor(emb, cb, codes):
    """Unrefined ADC ordering itself must stay useful: recall@5 vs the
    exact top-5 at m=16/256 codes measured 0.78 on this corpus shape —
    pin a conservative floor so codebook/scoring regressions surface."""
    q = _q(emb)
    exact = similarity.brute_force_topk(
        q, emb, k=5, corpus_id="vec_id", corpus_vec="embedding"
    )
    adc = pq.pq_topk_adc(codes, cb, q, k=5, corpus_id="vec_id")
    truth: dict[int, set[int]] = {}
    for r in exact.collect():
        truth.setdefault(r["qid"], set()).add(r["vec_id"])
    got: dict[int, set[int]] = {}
    for r in adc.collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    hits = sum(len(truth[k] & got.get(k, set())) for k in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.6


def test_ivfpq_search_equals_ivf_search(emb, cb):
    idx = similarity.ivf_build(
        emb, n_pivots=8, train_iters=2, corpus_id="vec_id",
        corpus_vec="embedding",
    )
    q = _q(emb)
    ivf = similarity.ivf_search(idx, q, k=5, nprobe=4)
    ipq = pq.ivfpq_search(idx, cb, q, k=5, nprobe=4, refine_factor=16)
    a = sorted(tuple(r) for r in ivf.collect())
    b = sorted(tuple(r) for r in ipq.collect())
    assert a == b


def test_ivfpq_empty_queries(emb, cb, spark):
    idx = similarity.ivf_build(
        emb, n_pivots=4, corpus_id="vec_id", corpus_vec="embedding"
    )
    q = _q(emb).filter(F.col("qid") < 0)
    out = pq.ivfpq_search(idx, cb, q, k=5, nprobe=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["qid", "vec_id", "rank", "cosine"]
    # pure-ADC mode (refine_factor=0): the score column is adc_ip for
    # non-empty inputs, so the zero-query schema must match (ADVICE r10)
    out0 = pq.ivfpq_search(idx, cb, q, k=5, nprobe=2, refine_factor=0)
    assert out0.count() == 0
    assert [f.name for f in out0.schema.fields] == ["qid", "vec_id", "rank", "adc_ip"]


def test_adc_scores_batch_layout_invariant(emb, cb, codes):
    """A row's adc_ip must not depend on which Arrow batch it lands in:
    re-partitioning the codes table leaves every (qid, cid, adc_ip)
    identical, not merely the same id sets."""
    q = _q(emb).filter(F.col("qid") % 50 == 0)
    a = sorted(tuple(r) for r in pq.pq_topk_adc(codes, cb, q, k=5,
                                                corpus_id="vec_id").collect())
    b = sorted(
        tuple(r)
        for r in pq.pq_topk_adc(codes.repartition(5), cb, q, k=5,
                                corpus_id="vec_id").collect()
    )
    assert a == b


def test_registry_entry_matches_oracle_backed_ivf(spark, sf_dir):
    """cosine_topk_ivfpq (rows-only) is pinned bit-equal to the
    ORACLE-BACKED cosine_topk_ivf at the gate corpus — the refined PQ
    path inherits the oracle's verdict transitively."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    a = sorted(tuple(r) for r in qs["cosine_topk_ivf"](spark, sf_dir).collect())
    b = sorted(tuple(r) for r in qs["cosine_topk_ivfpq"](spark, sf_dir).collect())
    assert a == b


@pytest.fixture(scope="module")
def ivf_idx(emb):
    return similarity.ivf_build(
        emb, n_pivots=8, train_iters=2, corpus_id="vec_id",
        corpus_vec="embedding",
    )


def test_residual_train_deterministic(ivf_idx):
    a = pq.train_pq_codebooks_residual(ivf_idx, m=8, n_codes=32, iters=4)
    b = pq.train_pq_codebooks_residual(ivf_idx, m=8, n_codes=32, iters=4)
    assert a == b and a.residual


def test_residual_ivfpq_equals_exact_ivf(ivf_idx):
    cbr = pq.train_pq_codebooks_residual(ivf_idx, m=16, n_codes=256, iters=8)
    codes = pq.ivfpq_encode(ivf_idx, cbr)
    q = ivf_idx.assignment.selectExpr("vec_id as qid", "__cv as qv")
    ivf = similarity.ivf_search(ivf_idx, q, k=5, nprobe=4)
    ipq = pq.ivfpq_search(ivf_idx, cbr, q, k=5, nprobe=4, refine_factor=16,
                          codes=codes)
    assert sorted(tuple(r) for r in ivf.collect()) == sorted(
        tuple(r) for r in ipq.collect()
    )


def test_residual_codebooks_rejected_without_cell_context(emb, ivf_idx):
    cbr = pq.train_pq_codebooks_residual(ivf_idx, m=8, n_codes=16, iters=2)
    with pytest.raises(ValueError, match="residual"):
        pq.pq_encode(emb, cbr, corpus_id="vec_id", corpus_vec="embedding")
    q = emb.selectExpr("vec_id as qid", "embedding as qv")
    with pytest.raises(ValueError, match="cell-coupled"):
        pq.pq_topk_adc(emb.limit(0), cbr, q, corpus_id="vec_id")


def test_ivfpq_pure_adc_mode(emb, cb, ivf_idx):
    """refine_factor=0: pure compressed search, (qid, cid, rank, adc_ip)
    schema, k rows per query, no raw-vector fetch."""
    q = emb.selectExpr("vec_id as qid", "embedding as qv").limit(20)
    out = pq.ivfpq_search(ivf_idx, cb, q, k=5, nprobe=4, refine_factor=0)
    rows = out.collect()
    assert [f.name for f in out.schema.fields] == ["qid", "vec_id", "rank", "adc_ip"]
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r["qid"]] = per_q.get(r["qid"], 0) + 1
    assert per_q and all(v == 5 for v in per_q.values())


def test_ivfpq_durable_roundtrip(spark, emb, cb, ivf_idx, tmp_path):
    """Write → read → search parity, plus the scan-pruning layout: the
    codes land partitioned by cell, and a loaded-codes search returns
    exactly what the in-memory codes return."""
    import os

    codes = pq.ivfpq_encode(ivf_idx, cb)
    path = str(tmp_path / "pqidx")
    pq.ivfpq_write_index(ivf_idx, cb, path, codes=codes)
    assert any(
        d.startswith("cell=") for d in os.listdir(os.path.join(path, "codes"))
    )
    cb2, codes2, cents2, cid = pq.ivfpq_read_index(spark, path)
    assert cb2 == cb and cid == "vec_id"
    assert cents2 == [(int(c), [float(x) for x in v]) for c, v in ivf_idx.centroids]
    q = emb.selectExpr("vec_id as qid", "embedding as qv").limit(30)
    a = sorted(tuple(r) for r in pq.ivfpq_search(
        ivf_idx, cb, q, k=5, nprobe=4, refine_factor=16, codes=codes
    ).collect())
    b = sorted(tuple(r) for r in pq.ivfpq_search(
        ivf_idx, cb2, q, k=5, nprobe=4, refine_factor=16, codes=codes2
    ).collect())
    assert a == b


def test_code_width_mismatch_is_named(emb, ivf_idx):
    """Searching codes encoded under one m with codebooks of another m
    must fail with the mismatch NAMED, not a bare numpy reshape error."""
    cb8 = pq.train_pq_codebooks(emb, m=8, n_codes=16, iters=2,
                                corpus_id="vec_id", corpus_vec="embedding")
    cb16 = pq.train_pq_codebooks(emb, m=16, n_codes=16, iters=2,
                                 corpus_id="vec_id", corpus_vec="embedding")
    codes8 = pq.ivfpq_encode(ivf_idx, cb8)
    q = emb.selectExpr("vec_id as qid", "embedding as qv").limit(5)
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="code width mismatch"):
        try:
            pq.ivfpq_search(ivf_idx, cb16, q, k=5, nprobe=2,
                            codes=codes8).collect()
        except Py4JJavaError as e:  # surfaced through the executor
            raise RuntimeError(str(e)) from e


def test_pq_topk_adc_refine_factor_zero_degrades_to_pure_adc(emb, cb, codes):
    """refine_with plus refine_factor=0 must behave like the pure-ADC
    mode (ivfpq_search's documented contract), not silently window on
    zero candidates."""
    q = _q(emb).limit(10)
    out = pq.pq_topk_adc(codes, cb, q, k=5, corpus_id="vec_id",
                         refine_with=emb, corpus_vec="embedding",
                         refine_factor=0)
    rows = out.collect()
    assert len(rows) == 50
    assert [f.name for f in out.schema.fields] == ["qid", "vec_id", "rank", "adc_ip"]


# ----------------------------- SQ8 family -----------------------------


@pytest.fixture(scope="module")
def sq(emb):
    return pq.train_sq_params(emb, corpus_id="vec_id", corpus_vec="embedding")


@pytest.fixture(scope="module")
def sq_codes(emb, sq):
    c = pq.sq_encode(emb, sq, corpus_id="vec_id", corpus_vec="embedding")
    c.cache()
    c.count()
    return c


def test_sq_train_deterministic_and_width(emb, sq, sq_codes):
    assert sq == pq.train_sq_params(emb, corpus_id="vec_id",
                                    corpus_vec="embedding")
    widths = {len(r["__sq"]) for r in sq_codes.limit(20).collect()}
    assert widths == {64}  # one byte per dim: 8x vs float64


def test_sq_encode_partition_invariant(emb, sq, sq_codes):
    base = {r["vec_id"]: r["__sq"] for r in sq_codes.collect()}
    re = pq.sq_encode(emb.repartition(7), sq, corpus_id="vec_id",
                      corpus_vec="embedding")
    assert {r["vec_id"]: r["__sq"] for r in re.collect()} == base


def test_sq_refined_equals_exact_bruteforce(emb, sq, sq_codes):
    """SQ8's per-dim error is range/255, so refine_factor=2 already
    recovers the exact fold-cosine top-k BIT-FOR-BIT on the gate corpus
    (PQ needs 16x on the same data — the family's documented trade)."""
    q = _q(emb)
    exact = sorted(tuple(r) for r in similarity.brute_force_topk(
        q, emb, k=5, corpus_id="vec_id", corpus_vec="embedding"
    ).collect())
    refined = sorted(tuple(r) for r in pq.sq_topk(
        sq_codes, sq, q, k=5, corpus_id="vec_id",
        refine_with=emb, corpus_vec="embedding", refine_factor=2,
    ).collect())
    assert refined == exact


def test_sq_pure_rank_agreement_floor(emb, sq, sq_codes):
    q = _q(emb)
    exact = {(r["qid"], r["rank"]): r["vec_id"]
             for r in similarity.brute_force_topk(
                 q, emb, k=5, corpus_id="vec_id", corpus_vec="embedding"
             ).collect()}
    pure = {(r["qid"], r["rank"]): r["vec_id"]
            for r in pq.sq_topk(sq_codes, sq, q, k=5,
                                corpus_id="vec_id").collect()}
    agree = sum(1 for kk in exact if pure.get(kk) == exact[kk]) / len(exact)
    assert agree >= 0.9  # measured 0.938 on this corpus


def test_sq_width_mismatch_named(emb, sq, cb, codes):
    """Feeding PQ codes (16 B) to the SQ scorer (expects 64 B) must fail
    with the mismatch named."""
    from py4j.protocol import Py4JJavaError

    q = _q(emb).limit(3)
    pq_as_sq = codes.withColumnRenamed("__code", "__sq")
    with pytest.raises(Exception, match="code width mismatch"):
        try:
            pq.sq_topk(pq_as_sq, sq, q, k=5, corpus_id="vec_id").collect()
        except Py4JJavaError as e:
            raise RuntimeError(str(e)) from e


def test_sq_constant_dim_decodes_exactly(spark):
    """A dimension that is constant across the corpus has range 0; it
    must decode to exactly lo (scale clamps to 1, codes to 0) rather
    than dividing by zero."""
    rows = [(i, [1.0, float(i % 3 + 1)]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sq2 = pq.train_sq_params(df, corpus_id="vec_id", corpus_vec="embedding")
    codes2 = pq.sq_encode(df, sq2, corpus_id="vec_id", corpus_vec="embedding")
    assert codes2.count() == 9
    q = df.selectExpr("vec_id as qid", "embedding as qv").limit(3)
    out = pq.sq_topk(codes2, sq2, q, k=2, corpus_id="vec_id")
    assert out.count() == 6


def test_sq8_registry_entry_matches_oracle_backed_bruteforce(spark, sf_dir):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    a = sorted(tuple(r) for r in qs["cosine_topk_bruteforce"](spark, sf_dir).collect())
    b = sorted(tuple(r) for r in qs["cosine_topk_sq8"](spark, sf_dir).collect())
    assert a == b
