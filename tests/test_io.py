"""Sink tests: partitioned writes, adaptive file-count policy
(SURVEY.md §2.1 S3-S6)."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark import io
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

OUT = "/root/repo/.tmp/io_test"


def test_target_file_count_policy():
    mb = 1024 * 1024
    # Reference policy (etl2_advclean_and_dimcreatin.py:301-308):
    # collapse below target/2, clamp(ceil(bytes/target), 1, 100).
    assert io.target_file_count(0) == 1
    assert io.target_file_count(int(63 * mb)) == 1
    assert io.target_file_count(int(120 * mb)) == 1  # < 128/2? no: 120>64 → ceil(120/128)=1
    assert io.target_file_count(int(600 * mb)) == 5
    assert io.target_file_count(int(100_000 * mb)) == 100  # clamped


def test_partitioned_write_roundtrip(spark, sf_dir):
    shutil.rmtree(OUT, ignore_errors=True)
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "order_year", F.year("o_orderdate")
    )
    io.write_parquet(orders, OUT, partition_by=["order_year"])
    back = spark.read.parquet(OUT)
    assert back.count() == orders.count()
    # Hive-style layout exists (partition pruning works off directories).
    assert glob.glob(f"{OUT}/order_year=*"), "expected partitioned layout"
    # Partition pruning: reading one partition scans only its directory.
    one_year = back.filter(F.col("order_year") == 1996).count()
    assert one_year == orders.filter(F.col("order_year") == 1996).count()
    # Small data → policy collapses to one file per partition directory.
    for d in glob.glob(f"{OUT}/order_year=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) >= 1
    shutil.rmtree(OUT, ignore_errors=True)


def test_estimate_plan_bytes_positive(spark, sf_dir):
    df = load_table(spark, "lineitem", sf_dir)
    assert io.estimate_plan_bytes(df) > 0


def test_reconcile_union_tolerates_drift(spark):
    a = spark.createDataFrame([(1, "x")], "id int, col_a string")
    b = spark.createDataFrame([(2, "y")], "id int, col_b string")  # drifted
    out = io.reconcile_union([a, b])
    assert sorted(out.columns) == ["col_a", "col_b", "id"]
    rows = {r.id: (r.col_a, r.col_b) for r in out.collect()}
    assert rows[1] == ("x", None) and rows[2] == (None, "y")
