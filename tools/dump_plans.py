#!/usr/bin/env python
"""Dump .explain("formatted") for every registered query to a directory.

Usage: python tools/dump_plans.py <out_dir> [--suffix _before] [--sf-dir DIR]
                                  [--queries a,b,c]

The optimization-round deliverable: plans/r13/<query>_before.txt /
_after.txt, so plan-shape claims (Exchange counts, join strategies,
PushedFilters, BatchEvalPython nodes) are checkable without running Spark.
Plans are captured unexecuted (AQE shows isFinalPlan=false) at the bench
scale directory so broadcast/AQE thresholds see the real input sizes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rta_registrations_pyspark_glue_spark import caching
from rta_registrations_pyspark_glue_spark.plans import registry
from rta_registrations_pyspark_glue_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    qs = registry.queries()
    names = args.queries.split(",") if args.queries else list(qs)
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure in-file
            plan = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}"
        with open(os.path.join(args.out_dir, f"{name}{args.suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}{args.suffix}.txt ({len(plan)} chars)")
        caching.release_tracked()
    spark.stop()


if __name__ == "__main__":
    main()
