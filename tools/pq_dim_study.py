#!/usr/bin/env python
"""Where product quantization wins on TIME, as a function of dimension.

SCALING.md §14's sf5 measurement showed IVFPQ(R) LOSING wall-clock to
exact IVF at d=64: the exact in-cell dgemm at 64 dims is already so
cheap per candidate that PQ's extra machinery (bigger merge window +
the refine join) costs more than ADC saves. The claim that PQ is the
scale path rests on production embedding dims (768-3072), where the
exact path's per-candidate cost is 12-48x higher while ADC's stays m
lookups. This tool measures that flip on a deterministic synthetic
corpus (fixed-seed Gaussian — the same neighbor-contrast-free worst
case as the testdata embeddings): steady-state (pass-2) search times
for exact IVF, IVFPQ+refine, and pure-ADC IVFPQ, plus agreement, per
dimension.

Usage: python tools/pq_dim_study.py [--n 20000] [--dims 64,1024]
           [--m 16] [--k 5] [--refine 16]
Prints one JSON line per dimension.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import pq, similarity
from rta_registrations_pyspark_glue_spark.session import get_spark


def _corpus(spark, n: int, dim: int, clusters: int = 0, sigma: float = 0.3):
    """Fixed-seed synthetic corpus. ``clusters=0`` is iid Gaussian — the
    PQ WORST case (zero neighbor contrast, nothing for codebooks to
    model). ``clusters=K`` draws a K-center Gaussian mixture (center +
    sigma*noise) — the manifold shape real embeddings have, where both
    the coarse quantizer and the subspace codebooks have structure to
    exploit; quality numbers from the two regimes bracket a real
    corpus."""
    rng = np.random.default_rng(7)  # fixed seed: reproducible study
    if clusters > 0:
        centers = rng.standard_normal((clusters, dim))
        which = rng.integers(0, clusters, size=n)
        mat = centers[which] + sigma * rng.standard_normal((n, dim))
    else:
        mat = rng.standard_normal((n, dim))
    pdf = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    return spark.createDataFrame(pdf).repartition(32)


def _pass2(fn) -> tuple[float, int]:
    fn().count()
    t0 = time.time()
    rows = fn().count()
    return time.time() - t0, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--dims", default="64,1024")
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--n-codes", type=int, default=256)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--refine", type=int, default=16)
    ap.add_argument("--clusters", type=int, default=0,
                    help="0 = iid Gaussian (PQ worst case); K>0 = "
                    "K-center Gaussian mixture (realistic manifold)")
    ap.add_argument("--sigma", type=float, default=0.3)
    ap.add_argument("--residual", action="store_true",
                    help="train codebooks on coarse-quantizer residuals "
                    "(the FAISS IndexIVFPQ form)")
    args = ap.parse_args()

    spark = get_spark("pq-dim-study")
    for dim in [int(d) for d in args.dims.split(",")]:
        emb = _corpus(spark, args.n, dim, args.clusters, args.sigma)
        emb.persist()
        emb.count()
        q = emb.filter(F.col("vec_id") % 10 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        idx = similarity.ivf_build(
            emb, n_pivots=similarity.derive_n_pivots(args.n), train_iters=2,
            train_sample_mod=4, corpus_id="vec_id", corpus_vec="embedding",
        )
        idx.assignment.count()
        nprobe = similarity.derive_nprobe(len(idx.centroids))
        t0 = time.time()
        if args.residual:
            cb = pq.train_pq_codebooks_residual(
                idx, m=args.m, n_codes=args.n_codes, iters=8, sample_mod=4,
            )
        else:
            cb = pq.train_pq_codebooks(
                emb, m=args.m, n_codes=args.n_codes, iters=8,
                corpus_id="vec_id", corpus_vec="embedding", sample_mod=4,
            )
        train_s = time.time() - t0
        codes = pq.ivfpq_encode(idx, cb)
        codes.persist()
        codes.count()

        ivf_s, _ = _pass2(
            lambda: similarity.ivf_search(idx, q, k=args.k, nprobe=nprobe)
        )
        ref_s, _ = _pass2(
            lambda: pq.ivfpq_search(idx, cb, q, k=args.k, nprobe=nprobe,
                                    refine_factor=args.refine, codes=codes)
        )
        adc_s, _ = _pass2(
            lambda: pq.ivfpq_search(idx, cb, q, k=args.k, nprobe=nprobe,
                                    refine_factor=0, codes=codes)
        )

        iv = {(r["qid"], r["rank"]): r["vec_id"]
              for r in similarity.ivf_search(idx, q, k=args.k,
                                             nprobe=nprobe).collect()}
        ip = {(r["qid"], r["rank"]): r["vec_id"]
              for r in pq.ivfpq_search(idx, cb, q, k=args.k, nprobe=nprobe,
                                       refine_factor=args.refine,
                                       codes=codes).collect()}
        agree = sum(1 for kk in iv if ip.get(kk) == iv[kk]) / max(1, len(iv))

        print(json.dumps({
            "dim": dim,
            "n": args.n,
            "clusters": args.clusters,
            "residual": bool(args.residual),
            "m": cb.m,
            "nprobe": nprobe,
            "code_bytes": cb.code_bytes,
            "raw_bytes_f64": dim * 8,
            "compression_x": round(dim * 8 / cb.code_bytes, 1),
            "ivf_exact_s": round(ivf_s, 2),
            "ivfpq_refined_s": round(ref_s, 2),
            "ivfpq_pure_adc_s": round(adc_s, 2),
            "refined_vs_exact_agreement": round(agree, 4),
            "pq_train_s": round(train_s, 2),
        }), flush=True)
        emb.unpersist()
        codes.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
