#!/usr/bin/env python
"""Driver-side isolation A/B of the exact GEMM probe ranking's score
dtype (r13, VERDICT r12 #2) — the float32 counterpart of the §17
ranking-isolation protocol: SCALING.md §17 measured the exact ranking
MEMORY-bound on writing the (chunk, k) float64 score matrix; float32
halves exactly that traffic. This tool times NOTHING distributed —
train + query collect once, then both dtypes ranked back-to-back on
the same in-memory matrices, plus the probe-set agreement between
them (how many queries get an identical top-nprobe CELL SET — order
flips inside the set don't change which candidates are scored).

Usage:
    python tools/rank_dtype_ab.py [--query-mod 100] [--passes 2] \
        [sf_dir ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    passes = 2
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    dirs = args or ["/root/repo/.scale/sf405"]
    spark = get_spark("rank_dtype_ab")
    import numpy as np

    for sf in dirs:
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        n = c.count()
        k = similarity.derive_n_pivots(n)
        nprobe = similarity.derive_nprobe(k)
        t0 = time.perf_counter()
        cents = similarity.train_ivf_centroids_hierarchical(
            c.filter(F.col("cid") % 4 == 0), n_pivots=k
        )
        t_train = time.perf_counter() - t0
        rows = (
            emb.filter(F.col("vec_id") % query_mod == 0)
            .select("embedding")
            .collect()
        )
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        sqrtn = np.sqrt((mat * mat).sum(axis=1))
        keep = sqrtn > 0
        mat, sqrtn = mat[keep], sqrtn[keep]
        _, cm, cn = similarity._centroid_arrays(np, cents)
        times: dict[str, list[float]] = {"f64": [], "f32": []}
        orders: dict[str, object] = {}
        for name, dt in (("f64", np.float64), ("f32", np.float32)):
            for _ in range(passes):
                ts = time.perf_counter()
                orders[name] = similarity._negcos_order_gemm(
                    np, mat, sqrtn, cm, cn, nprobe, score_dtype=dt
                )
                times[name].append(time.perf_counter() - ts)
        same_set = sum(
            1
            for a, b in zip(orders["f64"], orders["f32"])
            if set(a.tolist()) == set(b.tolist())
        )
        f64s = " ".join(f"{t:.1f}" for t in times["f64"])
        f32s = " ".join(f"{t:.1f}" for t in times["f32"])
        print(
            f"{sf}: n={n} k={k} nprobe={nprobe} Q={len(mat)} "
            f"train={t_train:.1f}s rank_f64=[{f64s}]s rank_f32=[{f32s}]s "
            f"speedup={min(times['f64']) / min(times['f32']):.2f}x "
            f"probe_set_agree={same_set}/{len(mat)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
