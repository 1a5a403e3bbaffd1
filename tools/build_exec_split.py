#!/usr/bin/env python
"""Split each headline query's bench time into driver DAG-build vs
execution (guide §1/§5): build = the `qs[name](spark, sf_dir)` call,
exec = the noop write. Two passes; pass-2 numbers are the steady state
the bench's best-of-two reports. One line per query, sorted by pass-2
build time, so driver-overhead targets are ranked.

Usage: python tools/build_exec_split.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rta_registrations_pyspark_glue_spark import caching
from rta_registrations_pyspark_glue_spark.plans import registry
from rta_registrations_pyspark_glue_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()

    import bench

    spark = get_spark("build_exec_split")
    qs = registry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    names = args.queries.split(",") if args.queries else list(bench.HEADLINE)
    rows = []
    for name in names:
        per_pass = []
        for _p in range(2):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            per_pass.append((t1 - t0, t2 - t1))
            caching.release_tracked()
        rows.append((name, per_pass))
    rows.sort(key=lambda r: -r[1][1][0])
    print(f"{'query':>34} {'build1':>7} {'exec1':>7} {'build2':>7} {'exec2':>7}")
    for name, pp in rows:
        print(
            f"{name:>34} {pp[0][0]:>7.3f} {pp[0][1]:>7.3f} "
            f"{pp[1][0]:>7.3f} {pp[1][1]:>7.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
