"""Unexecuted-plan memo for ACTION-FREE query builds (r14).

Measured with tools/build_exec_split.py at sf0.1 (VERDICT r13 #8: the
per-query fixed floor): rebuilding each registered query's DataFrame on
every invocation costs 0.05-2.1 s of pure driver time — py4j round
trips through withColumn/expr chains, analysis, spread-guard probes —
while the queries' EXECUTION is often far cheaper (multimodal_suite
builds for 2.07 s; simhash_suite 1.01 s; the ~25 sub-second queries
carry a 0.05-0.25 s build each). A long-lived session re-serving the
same analytic DAGs (the bench loop, a Thrift/BI server, a scheduled
driver) pays that cost per submission for an identical plan.

``plan_memo`` memoizes the built (unexecuted) DataFrame per
(applicationId, sf_dir, input fingerprint, query). This is the same
plan-object precedent as sources/testdata._PLAN_MEMO and
plans/queries_pipeline._MEMO, with the same non-negotiable line:

* The memoized value is an immutable PLAN, never data. Every action on
  it still computes from the parquet inputs; nothing is result-cached
  across invocations or runs.
* Internal ``tracked_persist`` frames are captured during the first
  build (caching.record_persists) and RE-ARMED on every memo hit, so
  the persist lifecycle — materialize during the query's own jobs,
  released by ``caching.release_tracked`` — is indistinguishable from
  a fresh build.
* ONLY action-free builds may be wrapped. A build that runs Spark
  actions (collect/count/localCheckpoint/driver-side training) bakes
  DATA-derived values into the plan; memoizing it would carry computed
  results across invocations — result caching, not plan reuse. The
  deliberately-unwrapped builds and their actions: packed_sequences /
  packed_bins (driver-collected partition prefix sums), the
  cosine_topk_ivf/ivfpq/sq8 family + semantic_dedup_survivors +
  embedding_near_dup_ivf (IVF/PQ training collects), near_dup_clusters
  / corpus_curation_pipeline (connected-components fixpoint actions,
  localCheckpoint), bpe_merges (iterative merge loop),
  embedding_pca_reduced (driver eigh on collected moments).

Staleness: the key folds in a fingerprint of the sf_dir's *.parquet
listing (name, mtime_ns, size — one os.scandir, ~50 µs), so
regenerating testdata mid-application invalidates the memo, matching
load_table's r14 contract. For non-local sf_dirs the fingerprint is
None and the static-input contract applies — call ``clear_plan_memo``
after rewriting inputs in-process. Entries die with the application;
stale applications' entries are dropped on first touch of a new one.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession

from rta_registrations_pyspark_glue_spark.caching import (
    record_persists,
    tracked_persist,
)

_MEMO: dict[tuple, tuple[DataFrame, tuple[DataFrame, ...]]] = {}


def clear_plan_memo() -> None:
    """Invalidate every memoized query plan (for tools/tests that
    rewrite inputs within one application)."""
    _MEMO.clear()


def _dir_fingerprint(sf_dir: str) -> tuple | None:
    try:
        with os.scandir(sf_dir) as it:
            return tuple(
                sorted(
                    (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                    for e in it
                    if e.name.endswith(".parquet")
                )
            )
    except OSError:
        return None


def plan_memo(fn):
    """Decorator for a registered ``(spark, sf_dir) -> DataFrame`` query
    whose build is ACTION-FREE (module docstring): returns the memoized
    unexecuted plan on repeat invocations, re-arming its recorded
    persists."""
    qual = f"{fn.__module__}.{fn.__qualname__}"

    @functools.wraps(fn)
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        app_id = spark.sparkContext.applicationId
        key = (app_id, sf_dir, _dir_fingerprint(sf_dir), qual)
        hit = _MEMO.get(key)
        if hit is not None:
            df, persisted = hit
            for frame in persisted:
                tracked_persist(frame)
            return df
        if any(k[0] != app_id for k in _MEMO):
            for k in [k for k in _MEMO if k[0] != app_id]:
                del _MEMO[k]
        with record_persists() as rec:
            df = fn(spark, sf_dir)
        _MEMO[key] = (df, tuple(rec))
        return df

    return wrapper
