"""workercache: worker-process-persistent fixture memos (r13).

The mapInPandas synth ops resolve their payload memos through
``worker_cache`` at call time (an import executed inside the op), so a
reused Python worker shares one dict across tasks and jobs. These tests
pin the process-level identity/cap contract and — end to end on a real
session — that a leg's fixtures actually land in the worker module's
cache (the closure-captured module-global form they replace was
cloudpickled by value and provably never shared)."""

from __future__ import annotations

from rta_registrations_pyspark_glue_spark.operators import workercache


def test_worker_cache_identity_and_cap():
    a = workercache.worker_cache("t_identity")
    b = workercache.worker_cache("t_identity")
    assert a is b
    c = workercache.worker_cache("t_other")
    assert c is not a
    small = workercache.worker_cache("t_cap")
    for i in range(5):
        workercache.cache_put(small, i, i, cap=3)
    assert len(small) == 3  # admission stops at the cap
    # existing keys still readable; puts of present keys are no-ops past cap
    assert small[0] == 0


def test_synth_fixtures_land_in_worker_module_cache(spark):
    """End-to-end: after one audio synth leg runs, a probe task on the
    same worker pool sees non-empty ims/ms caches in ITS process-level
    module — the property that makes a second invocation (bench pass 2,
    the per-leg decomposition) skip the fixture encode entirely."""
    import pandas as pd  # noqa: F401

    from rta_registrations_pyspark_glue_spark.operators import audio

    docs = spark.range(0, 64).selectExpr("id as doc_id")
    audio.decode_audio_features(audio.synthesize_adpcm_docs(docs)).write.format(
        "noop"
    ).mode("overwrite").save()

    def probe(batches):
        import pandas as pd

        from rta_registrations_pyspark_glue_spark.operators import (
            workercache as w,
        )

        n = len(w.worker_cache("ima_synth"))
        for _ in batches:
            yield pd.DataFrame({"n": [n]})

    rows = (
        spark.range(0, 64, 1, 8)
        .mapInPandas(probe, "n long")
        .collect()
    )
    # at least one reused worker carries warmed fixtures
    assert max(r.n for r in rows) > 0


def test_load_table_plan_memo_identity_and_isolation(spark):
    """r13: load_table memoizes the UNEXECUTED DataFrame plan per
    (applicationId, sf_dir, name) — repeated loads return the same
    immutable plan object (the bench paid a fresh footer-read/schema
    inference py4j round per call), different tables/dirs stay distinct,
    and the session confs the loader pins are still pinned on memo hits."""
    from rta_registrations_pyspark_glue_spark.sources import testdata

    sf = "/root/testdata/sf0.001"
    a = testdata.load_table(spark, "documents", sf)
    b = testdata.load_table(spark, "documents", sf)
    assert a is b
    c = testdata.load_table(spark, "region", sf)
    assert c is not a
    # conf pinning still happens on the hit path
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    testdata.load_table(spark, "documents", sf)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # the memoized plan recomputes from parquet on every action (it is a
    # plan, not data): two actions agree with a fresh non-memo read
    fresh = spark.read.parquet(f"{sf}/documents.parquet")
    assert a.count() == fresh.count() == a.count()


def test_spread_decision_memo_consistent_with_probe(spark):
    """r13: spread_ids/spread_rows memoize the widen decision per
    (application, analyzed-plan semanticHash, target) — the raw
    partition probe runs full physical planning per fresh DataFrame.
    Pin: repeated semantically-equal inputs give the same partitioning
    as the unmemoized probe would, and a genuinely-wide frame is never
    coalesced."""
    from rta_registrations_pyspark_glue_spark.operators import spread

    narrow = spark.range(0, 100, 1, 1).selectExpr("id as doc_id")
    s1 = spread.spread_ids(narrow)
    s2 = spread.spread_ids(spark.range(0, 100, 1, 1).selectExpr("id as doc_id"))
    tgt = max(8, spark.sparkContext.defaultParallelism // 4)
    assert s1.rdd.getNumPartitions() == tgt
    assert s2.rdd.getNumPartitions() == tgt  # memo hit path, same answer
    wide = spark.range(0, 1000, 1, 64).selectExpr("id as doc_id")
    assert spread.spread_rows(wide) is wide  # never coalesced
    assert spread.spread_rows(wide) is wide  # memo hit path
