"""Job entrypoints — the reference's Glue job surface made portable
(SURVEY.md §2.14 C1-C3).

The reference couples its pipeline to Glue: getResolvedOptions argv
parsing, GlueContext bootstrap, per-stage try/except with job.commit()
and exit(1) (etl1_clean_and_stage.py:16-21, etl2_advclean_and_dimcreatin.py:28-49,
93-99 and 8 more blocks). Here the same contract runs anywhere Spark
does:

    python -m rta_registrations_pyspark_glue_spark.jobs etl1 --input <csv dir> --output <root>
    python -m rta_registrations_pyspark_glue_spark.jobs etl2 --input <stage dir> --output <root>

Per-stage failure isolation is kept (a named stage logs and aborts with
exit 1); Glue-specific pieces (boto3 size probe, temp-prefix delete) are
replaced by the single-pass adaptive writer in io.py.
"""

from __future__ import annotations

import argparse
import logging
import sys

from pyspark.sql import SparkSession

from rta_registrations_pyspark_glue_spark import io
from rta_registrations_pyspark_glue_spark.plans.pipeline import build_star, clean_and_stage
from rta_registrations_pyspark_glue_spark.session import get_spark

log = logging.getLogger("rta_jobs")

BRONZE_COLUMNS = [
    "slno",
    "tempRegistrationNumber",
    "fromdate",
    "todate",
    "OfficeCd",
    "makerName",
    "modelDesc",
    "fuel",
    "makeYear",
    "colour",
    "vehicleClass",
    "seatCapacity",
]


def run_etl1(spark: SparkSession, input_path: str, output_root: str) -> str:
    """Bronze CSVs → cleaned, deduplicated stage parquet partitioned by
    (year, month) — the reference's ETL1 (etl1_clean_and_stage.py:59-145)."""
    stage_path = f"{output_root.rstrip('/')}/stage_clean_source"
    raw = io.read_csv(spark, input_path, schema=io.bronze_string_schema(BRONZE_COLUMNS))
    staged = clean_and_stage(raw)
    io.write_parquet(staged, stage_path, partition_by=["year", "month"])
    return stage_path


def run_etl2(spark: SparkSession, input_path: str, output_root: str) -> dict[str, str]:
    """Stage parquet → gold star schema (3 dims + fact partitioned by
    REGISTRATION_YEAR) — the reference's ETL2
    (etl2_advclean_and_dimcreatin.py:94-315), with the two-pass coalesce
    replaced by the one-pass adaptive writer."""
    root = output_root.rstrip("/")
    staged = spark.read.parquet(input_path)
    out = build_star(staged)
    paths = {
        "dim_vehicle": f"{root}/gold_dim_vehicle",
        "dim_manufacturer": f"{root}/gold_dim_manufacturer",
        "dim_rta": f"{root}/gold_dim_rta",
        "dim_date": f"{root}/gold_dim_date",
        "fact_registrations": f"{root}/gold_fact_registrations",
    }
    io.write_parquet(out.dim_vehicle, paths["dim_vehicle"])
    io.write_parquet(out.dim_manufacturer, paths["dim_manufacturer"])
    io.write_parquet(out.dim_rta, paths["dim_rta"])
    io.write_parquet(out.dim_date, paths["dim_date"])
    io.write_parquet(out.fact, paths["fact_registrations"], partition_by=["REGISTRATION_YEAR"])
    return paths


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="rta_jobs")
    parser.add_argument("job", choices=["etl1", "etl2"])
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    spark = get_spark(f"rta_{args.job}")
    stage = "session"
    try:
        if args.job == "etl1":
            stage = "etl1 clean+stage"
            out = run_etl1(spark, args.input, args.output)
            log.info("etl1 complete: %s", out)
        else:
            stage = "etl2 star build"
            paths = run_etl2(spark, args.input, args.output)
            log.info("etl2 complete: %s", paths)
        return 0
    except Exception:  # per-stage failure protocol (reference C3)
        log.exception("job failed during stage: %s", stage)
        return 1


if __name__ == "__main__":
    sys.exit(main())
