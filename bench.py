#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the noop sink (measures
compute, not result transfer). The set spans every operator family:
scan+agg, star joins, windows, sessionization, date parsing, fuzzy
resolution, the full ETL pipeline, dedup (exact + MinHash-LSH), ANN
(exact + IVF), streaming-window semantics, and text stats.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rta_registrations_pyspark_glue_spark import caching
from rta_registrations_pyspark_glue_spark.plans import registry
from rta_registrations_pyspark_glue_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "star_revenue_by_region_year",
    "top_customers_by_revenue",
    "nation_order_stats",
    "running_customer_spend",
    "sessionize_events",
    "events_last_signup_asof",
    "multiformat_date_parse",
    "fuzzy_resolution_parts",
    "rta_pipeline_star",
    "exact_dedup_documents",
    "minhash_lsh_near_dups",
    "cosine_topk_bruteforce",
    "cosine_topk_bruteforce_fast",
    "cosine_topk_ivf",
    "merge_upsert_orders",
    "events_windowed_hourly",
    "text_metrics",
    "near_dup_clusters",
    # round 4 additions — keep earlier names stable for cross-round
    # comparison (the common subset is summed across rounds). When a
    # query's WORK grows under its stable name, its SCOPES version below
    # is bumped — cross-round tooling should only sum queries whose
    # scope version matches.
    "embedding_near_dup_bucketed",
    "simhash_suite",
    "dataset_split",
    "decontamination_report",
    "packed_sequences",
    # round 5 additions
    "repetition_filters",
    "pii_scrub",
    "corpus_vocabulary",
    "semantic_dedup_survivors",
    "packed_bins",
    "embedding_near_dup_bucketed_fast",
]

#: Per-query SCOPE VERSION, emitted in the bench JSON ("scopes") so
#: cross-round time comparisons stay apples-to-apples: a version bump
#: declares "this name now does more work than last round" (round 5:
#: exact_dedup_documents +incremental-batch rows, packed_sequences
#: +token-budget rows, dataset_split +mixture rows, near_dup_clusters
#: +leakage-safe split column; round 6: pii_scrub +credit-card/intl-
#: phone/SSN patterns). Queries not listed are scope version 1.
SCOPES = {
    "exact_dedup_documents": 2,
    "packed_sequences": 2,
    "dataset_split": 2,
    "near_dup_clusters": 2,
    "pii_scrub": 2,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    qs = registry.queries()
    # Warm the JVM/session (codegen infra, parquet reader, decimal agg
    # paths) so session startup is not attributed to the first timed query.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").selectExpr(
        "sum(cast(r_regionkey as decimal(18,2)))"
    ).collect()
    # COLD-START metric: the first execution of the flagship pipeline in a
    # fresh session pays one-time costs no later query sees — Janino
    # compilation of the wide cleaning projection, Catalyst/JIT warmup,
    # first parquet footer reads. Reporting it separately (a) makes the
    # cold tax a tracked number instead of noise inside pass 1, and
    # (b) leaves the per-query times below as true steady-state costs.
    t0 = time.perf_counter()
    qs["rta_pipeline_star"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    cold_start = round(time.perf_counter() - t0, 3)
    caching.release_tracked()
    # Best-of-two passes per query: the host is shared and transient CPU
    # contention can inflate a 3s query to 30s+; the minimum of two runs
    # separated by a full pass is a far more faithful throughput number
    # (and the second pass also reflects steady-state codegen).
    times: dict[str, float] = {}
    for _pass in range(2):
        for name in HEADLINE:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            elapsed = round(time.perf_counter() - t0, 3)
            if name not in times or elapsed < times[name]:
                times[name] = elapsed
        # Release operator-internal persists (LSH index, pipeline stage)
        # between passes so caches can't accumulate across invocations;
        # pass 2 then measures a cold-cache steady state like pass 1.
        caching.release_tracked()
    total = round(sum(times.values()), 3)
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "scopes": {n: SCOPES.get(n, 1) for n in HEADLINE},
                "cold_start_sec": cold_start,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
