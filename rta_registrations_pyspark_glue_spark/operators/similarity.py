"""Similarity search over embedding columns (array<float>).

Two paths, mirroring how ANN systems are actually deployed:

- ``brute_force_topk``: exact cosine top-k. The query set is broadcast;
  the candidate corpus streams — no shuffle of the big side, and the
  per-pair dot product runs as a codegen'd sequential fold (zip_with +
  aggregate), which is deterministic (fixed accumulation order) and
  therefore oracle-checkable bit-for-bit.
- ``ivf_topk``: IVF-style two-stage search — a coarse quantizer (one
  pivot vector per partition/label) prunes the corpus to ``nprobe``
  partitions per query, then exact cosine within the probed partitions.
  At 100 TB this is the difference between scanning the corpus per query
  and scanning ``nprobe/num_partitions`` of it. Pivots here are the
  min-id member per label (deterministic, join-free to define); a
  production variant would train k-means centroids the same way and
  nothing else changes.

Top-k is row_number over (cosine desc, candidate id) — a total order, so
ties break identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.caching import tracked_persist

#: Fixed seed for the Rademacher hyperplane bank. The planes are part of
#: the operator's contract: the DuckDB oracle embeds the same matrix as
#: literals, so both engines bucket identically bit-for-bit.
HYPERPLANE_SEED = 42


def rademacher_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane bank for sign-random-projection LSH.

    Rademacher entries approximate Gaussian hyperplanes in high dimension
    (each projection is a ±-signed sum, near-Gaussian by CLT) while being
    exactly representable as SQL literals — which is what lets the oracle
    reproduce the bucketing exactly.
    """
    import numpy as np

    rng = np.random.default_rng(HYPERPLANE_SEED)
    return rng.choice([-1.0, 1.0], size=(n_planes, dim)).tolist()


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product (deterministic accumulation order)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return dot(ca, cb) / (F.sqrt(dot(ca, ca)) * F.sqrt(dot(cb, cb)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qv",
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set, stream the corpus.
    Output: (qid, cid, rank, cosine). Zero-norm vectors are excluded."""
    q = queries.select(
        F.col(query_id), as_double(query_vec).alias("__qv")
    ).withColumn("__qn", dot("__qv", "__qv"))
    c = corpus.select(
        F.col(corpus_id), as_double(corpus_vec).alias("__cv")
    ).withColumn("__cn", dot("__cv", "__cv"))
    pairs = (
        c.join(F.broadcast(q), F.col(query_id) != F.col(corpus_id), "inner")
        .filter((F.col("__qn") > 0) & (F.col("__cn") > 0))
        .withColumn(
            "cosine", dot("__qv", "__cv") / (F.sqrt("__qn") * F.sqrt("__cn"))
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "rank", "cosine")
    )


def brute_force_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "qid",
    query_vec: str = "qv",
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    max_queries: int = 100_000,
) -> DataFrame:
    """BLAS-accelerated exact cosine top-k: the query matrix is broadcast
    to every partition; each Arrow batch of corpus vectors does ONE numpy
    matmul against it and emits its local top-k; a final per-query top-k
    merges partials. Same pairs as ``brute_force_topk`` (scores differ in
    the last ulp — numpy sums pairwise, the JVM fold sums sequentially),
    ~10x faster per pair. This is the production path; the fold variant
    stays as the oracle-exact baseline.

    Id columns keep their input types (string ids work — the output
    schema is derived from the input schemas, and ids ride through numpy
    as objects). The query set is collected to the driver and broadcast
    — that is the design (queries are the small side); ``max_queries``
    bounds it explicitly and raises instead of silently OOMing the
    driver when a caller passes a corpus-sized frame."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    n_queries = queries.count()
    if n_queries > max_queries:
        raise ValueError(
            f"brute_force_topk_fast broadcasts the query set to the driver: "
            f"{n_queries} rows exceeds max_queries={max_queries}. Swap sides "
            f"or raise max_queries if the driver has memory for it."
        )
    q_rows = queries.select(query_id, query_vec).collect()
    q_ids = np.array([r[0] for r in q_rows])  # natural dtype: ints or objects
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    keep = q_norm > 0
    q_ids, q_mat, q_norm = q_ids[keep], q_mat[keep], q_norm[keep]
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat, q_norm))

    out_schema = StructType(
        [
            StructField(query_id, queries.schema[query_id].dataType),
            StructField(corpus_id, corpus.schema[corpus_id].dataType),
            StructField("cosine", DoubleType()),
        ]
    )

    def op(batches):
        ids, mat, norms = bq.value
        for pdf in batches:
            c_ids = pdf[corpus_id].to_numpy()
            c_mat = np.stack(pdf[corpus_vec].map(np.asarray)).astype(np.float64)
            c_norm = np.sqrt((c_mat * c_mat).sum(axis=1))
            ok = c_norm > 0
            c_ids, c_mat, c_norm = c_ids[ok], c_mat[ok], c_norm[ok]
            if len(c_ids) == 0:
                continue
            cos = (mat @ c_mat.T) / np.outer(norms, c_norm)  # (Q, C)
            local_k = min(k + 1, cos.shape[1])  # +1: self may be present
            # Keep everything >= the k-th best score (not argpartition's
            # arbitrary k): boundary TIES must all survive to the final
            # window, whose (cosine desc, cid asc) order resolves them the
            # same way the fold baseline does. Duplicate vectors (common
            # in dedup corpora) make such ties real.
            kth = -np.partition(-cos, local_k - 1, axis=1)[:, local_k - 1]
            rows = {query_id: [], corpus_id: [], "cosine": []}
            for qi in range(len(ids)):
                for ci in np.nonzero(cos[qi] >= kth[qi])[0]:
                    if c_ids[ci] == ids[qi]:
                        continue
                    rows[query_id].append(ids[qi])
                    rows[corpus_id].append(c_ids[ci])
                    rows["cosine"].append(cos[qi, ci])
            yield pd.DataFrame(rows)

    partials = corpus.select(corpus_id, corpus_vec).mapInPandas(op, out_schema)
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "rank", "cosine")
    )


def hyperplane_lsh_candidates(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits_per_band: int = 4,
    n_bands: int = 24,
    dim: int = 64,
) -> DataFrame:
    """Near-dup candidate pairs via sign-random-projection (SimHash-for-
    vectors) LSH banding — the blocking structure that replaces an
    all-pairs theta join for embedding dedup at scale.

    Each vector gets ``n_bands * bits_per_band`` sign bits (bit j =
    sign of <v, plane_j>, planes a fixed Rademacher bank); bits group
    into ``n_bands`` integer band keys; vectors sharing any (band, key)
    bucket become a candidate pair. Same banding calculus as MinHash LSH
    (textdedup.py): a pair at angular similarity p per bit survives with
    prob 1-(1-p^bits)^bands, while unrelated pairs (p≈0.5) collide at
    1-(1-2^-bits)^bands.

    Parameter guidance: at dedup-grade thresholds (cosine >= 0.9,
    p≈0.86) use (bits_per_band=8, n_bands=16) — recall ≈ 0.996 with
    ≈ 6% background collisions. The loose default (4, 24) targets the
    synthetic gate corpus whose near-dups sit at cosine 0.35-0.51
    (p≈0.61) — recall 0.98 measured at sf0.01.

    Plan shape at scale: bit computation is scan-side (96 codegen'd
    folds per row, no Python); explode to n_bands rows per vector; the
    only shuffle is the bucket equi-join, bounded by bucket sizes — no
    BroadcastNestedLoopJoin / cartesian anywhere (plan-asserted in
    tests). The bucket index is tracked-persisted (both join sides read
    it); callers release via caching.release_tracked().
    """
    planes = rademacher_planes(bits_per_band * n_bands, dim)
    v = (
        df.select(F.col(id_col), as_double(vec_col).alias("__e"))
        .withColumn("__n", dot("__e", "__e"))
        .filter(F.col("__n") > 0)
    )
    # All band keys as ONE SQL expression parsed JVM-side: building 96
    # zip_with/aggregate Columns through the Python API costs a py4j
    # round-trip per lambda (~10s of pure driver time measured); one
    # F.expr string is a single call and parses in ~ms. The fold shape
    # (zip_with -> sequential aggregate) is identical to dot(), so sign
    # bits stay bit-compatible with the DuckDB oracle.
    def dot_sql(plane: list[float]) -> str:
        arr = "array(" + ",".join("1.0D" if s > 0 else "-1.0D" for s in plane) + ")"
        return f"aggregate(zip_with(__e, {arr}, (x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"

    key_sqls = []
    for t in range(n_bands):
        terms = [
            f"IF({dot_sql(planes[t * bits_per_band + i])} >= 0, {1 << i}, 0)"
            for i in range(bits_per_band)
        ]
        key_sqls.append("CAST((" + " + ".join(terms) + ") AS INT)")
    bands = F.expr("array(" + ", ".join(key_sqls) + ")")
    buckets = tracked_persist(
        v.select(F.col(id_col), F.posexplode(bands).alias("band", "bkey"))
    )
    a = buckets.select("band", "bkey", F.col(id_col).alias("id_a"))
    b = buckets.select(
        F.col("band").alias("band_b"),
        F.col("bkey").alias("bkey_b"),
        F.col(id_col).alias("id_b"),
    )
    pairs = a.join(
        b,
        (F.col("band") == F.col("band_b"))
        & (F.col("bkey") == F.col("bkey_b"))
        & (F.col("id_a") < F.col("id_b")),
        "inner",
    )
    return pairs.select("id_a", "id_b").distinct()


def cosine_verify(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Exact cosine on candidate pairs only (never all pairs): joins the
    candidate list back to the corpus twice by id (equi-joins), computes
    the deterministic fold cosine, keeps pairs >= threshold.
    Output: (id_a, id_b, cosine)."""
    v = (
        df.select(F.col(id_col), as_double(vec_col).alias("__e"))
        .withColumn("__n", dot("__e", "__e"))
        .filter(F.col("__n") > 0)
    )
    a = v.select(
        F.col(id_col).alias("id_a"), F.col("__e").alias("__ea"), F.col("__n").alias("__na")
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col("__e").alias("__eb"), F.col("__n").alias("__nb")
    )
    out = (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", dot("__ea", "__eb") / (F.sqrt("__na") * F.sqrt("__nb")))
    )
    return out.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def train_ivf_centroids(
    corpus: DataFrame,
    n_pivots: int = 8,
    iters: int = 2,
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
    quant_scale: int = 1000,
) -> DataFrame:
    """Deterministic spherical k-means for the IVF coarse quantizer:
    init = the ``n_pivots`` lowest-id vectors, then ``iters`` Lloyd
    updates (assign by max fold-cosine, centroid = element mean).

    Cross-engine determinism is built in so a SQL oracle can reproduce
    training exactly: elements are quantized to integers with
    ``floor(x * quant_scale + 0.5)`` (floor is unambiguous in every
    engine, unlike round()), and each centroid component is the exact
    integer sum divided by the member count — one IEEE division of two
    integers, identical everywhere, independent of aggregation order.
    Centroids are not normalized: cosine assignment is scale-invariant,
    so the un-normalized mean assigns identically and saves a pass.
    Empty cells simply vanish (their rows drop out of the group-by) in
    both engines alike.

    Scale: per iteration — one broadcast of k centroid arrays, one
    explode to (cell, dim) rows, one map-side-combinable integer-sum
    shuffle over k*dim groups. Production systems train the quantizer
    on a sample; pass a sampled corpus for that.

    Returns (cell, cv): cell = the init pivot's id, cv array<double>."""
    v = (
        corpus.select(F.col(corpus_id), as_double(corpus_vec).alias("__cv"))
        .withColumn("__cn", dot("__cv", "__cv"))
        .filter(F.col("__cn") > 0)
    )
    quant = F.transform(
        F.col("__cv"), lambda x: F.floor(x * quant_scale + F.lit(0.5)).cast("long")
    )
    v = v.withColumn("__q", quant)
    cents = (
        v.orderBy(F.col(corpus_id))
        .limit(n_pivots)
        .select(F.col(corpus_id).cast("long").alias("cell"), F.col("__cv").alias("cv"))
    )
    for _ in range(iters):
        c = cents.select(
            F.col("cell").alias("__pid"), F.col("cv").alias("__pv")
        ).withColumn("__pn", dot("__pv", "__pv"))
        scores = v.crossJoin(F.broadcast(c)).withColumn(
            "__acos", dot("__cv", "__pv") / (F.sqrt("__cn") * F.sqrt("__pn"))
        )
        w = Window.partitionBy(corpus_id).orderBy(F.col("__acos").desc(), F.col("__pid"))
        assigned = (
            scores.withColumn("__arn", F.row_number().over(w))
            .filter(F.col("__arn") == 1)
            .select(F.col("__pid").alias("__cell"), "__q")
        )
        per_dim = (
            assigned.select(F.col("__cell"), F.posexplode("__q").alias("__d", "__qv"))
            .groupBy("__cell", "__d")
            .agg(F.sum("__qv").alias("__s"), F.count(F.lit(1)).alias("__cnt"))
            .withColumn("__v", F.col("__s").cast("double") / F.col("__cnt").cast("double"))
        )
        cents = (
            per_dim.groupBy("__cell")
            .agg(F.array_sort(F.collect_list(F.struct("__d", "__v"))).alias("__dv"))
            .select(
                F.col("__cell").alias("cell"),
                F.transform(F.col("__dv"), lambda s: s["__v"]).alias("cv"),
            )
        )
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    n_pivots: int = 8,
    train_iters: int = 0,
    query_id: str = "qid",
    query_vec: str = "qv",
    corpus_id: str = "cid",
    corpus_vec: str = "cv",
) -> DataFrame:
    """IVF two-stage ANN. Index build: every corpus vector is assigned to
    its nearest pivot by cosine (the coarse quantizer). With
    ``train_iters=0`` pivots are the ``n_pivots`` lowest-id vectors;
    with ``train_iters>0`` they are deterministic spherical-k-means
    centroids (train_ivf_centroids), which makes recall a property of
    the clustering rather than luck of the id order. Search: each query
    probes its ``nprobe`` nearest pivots and runs exact top-k within
    those cells only.

    Output: (qid, cid, rank, cosine) — approximate (recall < 1) by design.

    Scale: the build is one broadcast pass over the corpus (n_pivots dot
    products per vector, no shuffle except the rank-1 window); a search
    scans ~nprobe/n_pivots of the corpus per query. In production the
    assignment is computed once and persisted partitioned by cell id, so
    queries prune cells via partition pruning."""
    if train_iters > 0:
        cents = tracked_persist(
            train_ivf_centroids(
                corpus,
                n_pivots=n_pivots,
                iters=train_iters,
                corpus_id=corpus_id,
                corpus_vec=corpus_vec,
            )
        )
        pivots = (
            cents.select(F.col("cell").alias("__pid"), F.col("cv").alias("__pv"))
            .withColumn("__pn", dot("__pv", "__pv"))
            .filter(F.col("__pn") > 0)
        )
    else:
        pivots = (
            corpus.orderBy(F.col(corpus_id))
            .limit(n_pivots)
            .select(F.col(corpus_id).alias("__pid"), as_double(corpus_vec).alias("__pv"))
            .withColumn("__pn", dot("__pv", "__pv"))
            .filter(F.col("__pn") > 0)
        )

    c = corpus.select(F.col(corpus_id), as_double(corpus_vec).alias("__cv")).withColumn(
        "__cn", dot("__cv", "__cv")
    ).filter(F.col("__cn") > 0)

    # Index build: nearest pivot per corpus vector.
    assign_scores = c.crossJoin(F.broadcast(pivots)).withColumn(
        "__acos", dot("__cv", "__pv") / (F.sqrt("__cn") * F.sqrt("__pn"))
    )
    wassign = Window.partitionBy(corpus_id).orderBy(F.col("__acos").desc(), F.col("__pid"))
    assigned = (
        assign_scores.withColumn("__arn", F.row_number().over(wassign))
        .filter(F.col("__arn") == 1)
        .select(F.col(corpus_id), "__cv", "__cn", F.col("__pid").alias("__cell"))
    )

    q = queries.select(F.col(query_id), as_double(query_vec).alias("__qv")).withColumn(
        "__qn", dot("__qv", "__qv")
    ).filter(F.col("__qn") > 0)

    probe_scores = q.crossJoin(F.broadcast(pivots)).withColumn(
        "__pcos", dot("__qv", "__pv") / (F.sqrt("__qn") * F.sqrt("__pn"))
    )
    wprobe = Window.partitionBy(query_id).orderBy(F.col("__pcos").desc(), F.col("__pid"))
    probed = (
        probe_scores.withColumn("__prn", F.row_number().over(wprobe))
        .filter(F.col("__prn") <= nprobe)
        .select(query_id, "__qv", "__qn", F.col("__pid").alias("__cell"))
    )

    cands = probed.join(
        assigned.withColumnRenamed("__cell", "__ccell"),
        (F.col("__cell") == F.col("__ccell")) & (F.col(query_id) != F.col(corpus_id)),
        "inner",
    ).withColumn("cosine", dot("__qv", "__cv") / (F.sqrt("__qn") * F.sqrt("__cn")))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "rank", "cosine")
    )
