#!/usr/bin/env python
"""A/B the ivf_search probe-ranking modes at any SF directory — the
measurement companion of decide_rank_mode (SCALING.md §17): build ONE
index, search with rank_mode=flat and rank_mode=hier (forced, i.e.
calibrated to the overlap target without the flop budget), time both,
and report the RESULT overlap ((qid, cid) pair sets) plus the recorded
calibration decision. This is what turns the validator's sampled
probe-set recall into an end-to-end number on the actual corpus.

Usage:
    python tools/rank_mode_ab.py [--query-mod 100] [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rta_registrations_pyspark_glue_spark import caching
from rta_registrations_pyspark_glue_spark.operators import similarity
from rta_registrations_pyspark_glue_spark.session import get_spark

from pyspark.sql import functions as F


def main() -> None:
    args = sys.argv[1:]
    query_mod = 100
    if "--query-mod" in args:
        i = args.index("--query-mod")
        query_mod = int(args[i + 1])
        del args[i : i + 2]
    dirs = args or ["/root/repo/.scale/sf135"]
    spark = get_spark("rank_mode_ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for sf in dirs:
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        q = emb.filter(F.col("vec_id") % query_mod == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
        )
        n = c.count()
        k = similarity.derive_n_pivots(n)
        nprobe = similarity.derive_nprobe(k)
        cents = similarity.train_ivf_centroids_hierarchical(
            c.filter(F.col("cid") % 4 == 0), n_pivots=k
        )
        idx = similarity.ivf_build(c, centroids=cents)
        idx.assignment.write.format("noop").mode("overwrite").save()
        results = {}
        times = {}
        decisions = {}
        for mode in ("flat", "hier"):
            t0 = time.perf_counter()
            rows = similarity.ivf_search(
                idx, q, k=5, nprobe=nprobe, rank_mode=mode
            ).collect()
            times[mode] = time.perf_counter() - t0
            results[mode] = {(r.qid, r.cid) for r in rows}
            d = similarity._LAST_RANK_DECISION
            decisions[mode] = (
                {k_: v for k_, v in d.items() if not k_.startswith("_")}
                if d and mode == "hier"
                else None
            )
        inter = len(results["flat"] & results["hier"])
        overlap = inter / max(1, len(results["flat"]))
        print(
            f"{sf}: n={n} k={k} nprobe={nprobe} query_mod={query_mod} "
            f"flat={times['flat']:.1f}s hier={times['hier']:.1f}s "
            f"result_overlap={overlap:.4f} "
            f"pairs_flat={len(results['flat'])} "
            f"hier_decision={decisions['hier']}"
        )
        caching.release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
