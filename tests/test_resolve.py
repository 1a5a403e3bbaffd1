"""Resolution-operator edge cases surfaced by review: normalized-text
collisions in the catalog, and dimension determinism when attributes are
not key-determined."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import dedup, resolve


def test_exact_stage_collision_resolves_to_one_row(spark):
    """Two catalog ids whose text normalizes equal ('alto lxi' vs
    'Alto Lxi') must yield exactly ONE resolution row per probe key, with
    the deterministic lowest-id winner."""
    catalog = spark.createDataFrame(
        [Row(cid=11, text="alto lxi"), Row(cid=10, text="Alto Lxi")]
    )
    probe = spark.createDataFrame([Row(pk=1, text="ALTO LXI ")])
    out = resolve.resolve_exact_fuzzy(
        probe, catalog, probe_key="pk", probe_text="text",
        catalog_id="cid", catalog_text="text",
    ).collect()
    assert len(out) == 1
    assert out[0]["RESOLVED_ID"] == 10
    assert out[0]["IS_FUZZY_MATCH"] is False


def test_dedup_deterministic_stable_across_partitioning(spark):
    rows = [Row(k="a", v=f"val{i}", n=i) for i in range(20)]
    df1 = spark.createDataFrame(rows).repartition(1)
    df7 = spark.createDataFrame(rows).repartition(7)
    a = dedup.dedup_deterministic(df1, ["k"]).collect()
    b = dedup.dedup_deterministic(df7, ["k"]).collect()
    assert a == b
    assert a[0]["v"] == "val0"  # lexicographic min struct


def test_fuzzy_path_unaffected_by_collision_fix(spark):
    """A probe that misses exactly still fuzzy-matches within threshold."""
    catalog = spark.createDataFrame([Row(cid=1, text="swift vdi")])
    probe = spark.createDataFrame([Row(pk=9, text="swfit vdi")])  # lev 2
    out = resolve.resolve_exact_fuzzy(
        probe, catalog, probe_key="pk", probe_text="text",
        catalog_id="cid", catalog_text="text",
    ).collect()
    assert len(out) == 1
    assert out[0]["RESOLVED_ID"] == 1 and out[0]["IS_FUZZY_MATCH"] is True
    assert out[0]["LEV_DIST"] == 2
