#!/usr/bin/env python
"""Per-stage profile of one or more registered queries (guide §1/§7.1).

Runs each named query once (or --passes N) with the noop sink, then reads
the Spark UI REST API for the jobs/stages that ran between the start and
end of that query, printing per-stage wall time, executor-run-time sum,
shuffle read/write bytes, and input bytes — the empirical loop of the
optimization guide without leaving the terminal.

Usage: python tools/profile_query.py q1 [q2 ...] [--sf-dir DIR] [--passes N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rta_registrations_pyspark_glue_spark import caching
from rta_registrations_pyspark_glue_spark.plans import registry
from rta_registrations_pyspark_glue_spark.session import get_spark


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as fh:
        return json.load(fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--top", type=int, default=14)
    args = ap.parse_args()

    spark = get_spark("profile_query")
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    qs = registry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.queries:
        for p in range(args.passes):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            t1 = time.perf_counter()
            sc.setJobDescription(f"profile:{name}:pass{p}")
            first_job = len(rest(base, "/jobs"))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            sc.setJobDescription(None)
            caching.release_tracked()
            print(f"\n=== {name} pass{p}: build {t1-t0:.2f}s exec {t2-t1:.2f}s ===")
            if p != args.passes - 1:
                continue
            jobs = [j for j in rest(base, "/jobs")
                    if (j.get("description") or "").startswith(f"profile:{name}:pass{p}")]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            rows = []
            for sid in stage_ids:
                try:
                    for att in rest(base, f"/stages/{sid}"):
                        rows.append(att)
                except Exception:
                    pass
            rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
            print(f"{'stage':>6} {'tasks':>5} {'wall_s':>7} {'execRun_s':>9} "
                  f"{'cpu_s':>7} {'in_MB':>7} {'shRd_MB':>8} {'shWr_MB':>8}  name")
            for s in rows[: args.top]:
                sub = (s.get("submissionTime") or "")
                comp = (s.get("completionTime") or "")
                wall = ""
                try:
                    from datetime import datetime
                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    wall = f"{(datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)).total_seconds():.2f}"
                except Exception:
                    pass
                print(f"{s['stageId']:>6} {s['numCompleteTasks']:>5} {wall:>7} "
                      f"{(s.get('executorRunTime') or 0)/1e3:>9.2f} "
                      f"{(s.get('executorCpuTime') or 0)/1e9:>7.2f} "
                      f"{(s.get('inputBytes') or 0)/1e6:>7.1f} "
                      f"{(s.get('shuffleReadBytes') or 0)/1e6:>8.2f} "
                      f"{(s.get('shuffleWriteBytes') or 0)/1e6:>8.2f}  "
                      f"{s.get('name','')[:60]}")
            total_exec = sum((s.get("executorRunTime") or 0) for s in rows) / 1e3
            print(f"stages={len(rows)} jobs={len(jobs)} sum(executorRunTime)={total_exec:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
