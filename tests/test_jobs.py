"""End-to-end job entrypoint tests: bronze CSV → etl1 → stage parquet →
etl2 → gold star schema, through the CLI main() (reference C1-C3
surface), plus extractor filename derivation."""

from __future__ import annotations

import glob
import shutil

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark import jobs
from rta_registrations_pyspark_glue_spark.sources import extractor
from rta_registrations_pyspark_glue_spark.sources.bronze import synthesize_bronze

ROOT = "/root/repo/.tmp/jobs_test"


def test_etl1_etl2_end_to_end(spark, sf_dir):
    shutil.rmtree(ROOT, ignore_errors=True)
    # Materialize dirty bronze as CSV — exercising the real CSV scan (S1).
    bronze = synthesize_bronze(spark, sf_dir)
    bronze.coalesce(2).write.mode("overwrite").option("header", True).csv(f"{ROOT}/bronze")

    assert jobs.main(["etl1", "--input", f"{ROOT}/bronze", "--output", f"{ROOT}/out"]) == 0
    stage = spark.read.parquet(f"{ROOT}/out/stage_clean_source")
    assert stage.count() > 0
    assert glob.glob(f"{ROOT}/out/stage_clean_source/year=*"), "partitioned layout"

    assert jobs.main(
        ["etl2", "--input", f"{ROOT}/out/stage_clean_source", "--output", f"{ROOT}/out"]
    ) == 0
    fact = spark.read.parquet(f"{ROOT}/out/gold_fact_registrations")
    dim_v = spark.read.parquet(f"{ROOT}/out/gold_dim_vehicle")
    assert fact.count() > 0 and dim_v.count() > 0
    # FK closure survives the round trip through disk.
    assert fact.join(dim_v, on="VEHICLE_ID", how="left_anti").count() == 0
    assert glob.glob(f"{ROOT}/out/gold_fact_registrations/REGISTRATION_YEAR=*")
    # Issue-date NOT NULL invariant (DDL starschema_dw.txt:59).
    assert fact.filter(F.col("REGISTRATION_ISSUE_DATE_ID").isNull()).count() == 0
    # Date-key FK closure into the written dim_date spine.
    dim_date = spark.read.parquet(f"{ROOT}/out/gold_dim_date")
    dangling = fact.join(
        dim_date.select(F.col("DATE_ID").alias("REGISTRATION_ISSUE_DATE_ID")),
        on="REGISTRATION_ISSUE_DATE_ID",
        how="left_anti",
    ).count()
    assert dangling == 0
    shutil.rmtree(ROOT, ignore_errors=True)


def test_job_failure_exit_code(spark):
    assert jobs.main(["etl2", "--input", "/nonexistent/path", "--output", f"{ROOT}/x"]) == 1


def test_extractor_filename_derivation():
    url = "https://data.example.org/files/Consolidated%20list%2001-03-2023%20to%2031-03-2023.csv"
    assert extractor.derive_filename(url) == "transport_2023-03.csv"
    assert extractor.derive_filename("https://x.org/a/plain_dump.csv") == "plain_dump.csv"
    assert extractor.derive_filename("https://x.org/a/file.csv?sig=abc") == "file.csv"


def test_extractor_distribution_listing():
    payload = {
        "distribution": [
            {"downloadURL": "https://x/a.csv"},
            {"noUrl": True},
            {"downloadURL": "https://x/b.csv"},
        ]
    }
    assert extractor.list_distribution_urls(payload) == ["https://x/a.csv", "https://x/b.csv"]
