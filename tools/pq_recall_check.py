#!/usr/bin/env python
"""Measure PQ quality against exact baselines, as numbers.

The compression story (16-byte codes vs 512-byte float64 vectors) is
only honest together with its recall cost, measured separately for the
two places quantization can lose a neighbor:

- ``adc_recall``   — recall@k of the PURE ADC ordering over the whole
  corpus vs exact brute force: the quantization error alone.
- ``refined_recall`` — recall@k after the exact re-rank of the top
  k·refine_factor ADC candidates: what a user of pq_topk_adc(refine)
  actually gets. 1.0 means the refined output IS the exact result.
- ``ivfpq_vs_ivf``  — agreement of ivfpq_search with exact ivf_search
  at the same nprobe (isolates ADC loss from cell-probing loss, which
  both paths share; tools/ivf_recall_check.py measures the latter).

Prints one JSON line so SCALING.md can cite the run verbatim.

Usage: python tools/pq_recall_check.py [--dir /root/testdata/sf0.1]
           [--m 16] [--n-codes 256] [--refine 16] [--k 5] [--nprobe 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import pq, similarity
from rta_registrations_pyspark_glue_spark.session import get_spark
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table


def _topk_sets(rows, qid="qid", cid="cid") -> dict:
    out: dict = {}
    for r in rows:
        out.setdefault(r[qid], set()).add(r[cid])
    return out


def _recall(truth: dict, got: dict) -> float:
    hits = sum(len(truth[k] & got.get(k, set())) for k in truth)
    total = sum(len(v) for v in truth.values())
    return hits / total if total else 1.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/root/testdata/sf0.1")
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--n-codes", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--refine", type=int, default=16)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--nprobe", type=int, default=0,
                    help="0 = derive from cell count like the registry")
    ap.add_argument("--sample-mod", type=int, default=1,
                    help="train codebooks on the id %% S == 0 slice")
    args = ap.parse_args()

    spark = get_spark("pq-recall")
    emb = load_table(spark, "embeddings", args.dir)
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )

    t0 = time.time()
    cb = pq.train_pq_codebooks(
        emb, m=args.m, n_codes=args.n_codes, iters=args.iters,
        corpus_id="vec_id", corpus_vec="embedding",
        sample_mod=args.sample_mod,
    )
    train_s = time.time() - t0
    t0 = time.time()
    codes = pq.pq_encode(emb, cb, corpus_id="vec_id", corpus_vec="embedding")
    codes.cache()
    codes.count()
    encode_s = time.time() - t0

    exact = _topk_sets(
        similarity.brute_force_topk_fast(
            q, emb, k=args.k, corpus_id="vec_id", corpus_vec="embedding"
        ).collect(),
        cid="vec_id",
    )
    t0 = time.time()
    adc = _topk_sets(
        pq.pq_topk_adc(codes, cb, q, k=args.k, corpus_id="vec_id").collect(),
        cid="vec_id",
    )
    adc_s = time.time() - t0
    refined = _topk_sets(
        pq.pq_topk_adc(
            codes, cb, q, k=args.k, corpus_id="vec_id",
            refine_with=emb, corpus_vec="embedding",
            refine_factor=args.refine,
        ).collect(),
        cid="vec_id",
    )

    idx = similarity.ivf_build(
        emb,
        n_pivots=similarity.derive_n_pivots(n),
        train_iters=2,
        train_sample_mod=4,
        corpus_id="vec_id",
        corpus_vec="embedding",
    )
    nprobe = args.nprobe or similarity.derive_nprobe(len(idx.centroids))
    ivf = _topk_sets(
        similarity.ivf_search(idx, q, k=args.k, nprobe=nprobe).collect(),
        cid="vec_id",
    )
    ipq = _topk_sets(
        pq.ivfpq_search(
            idx, cb, q, k=args.k, nprobe=nprobe,
            refine_factor=args.refine, codes=pq.ivfpq_encode(idx, cb),
        ).collect(),
        cid="vec_id",
    )

    print(json.dumps({
        "dir": args.dir,
        "n": n,
        "dim": dim,
        "m": cb.m,
        "n_codes": cb.n_codes,
        "k": args.k,
        "refine_factor": args.refine,
        "nprobe": nprobe,
        "code_bytes": cb.code_bytes,
        "raw_bytes_f64": dim * 8,
        "compression_x": round(dim * 8 / cb.code_bytes, 1),
        "adc_recall": round(_recall(exact, adc), 4),
        "refined_recall": round(_recall(exact, refined), 4),
        "ivfpq_vs_ivf": round(_recall(ivf, ipq), 4),
        "train_s": round(train_s, 2),
        "encode_s": round(encode_s, 2),
        "adc_scan_s": round(adc_s, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
