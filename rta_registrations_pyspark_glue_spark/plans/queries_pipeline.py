"""End-to-end registration pipeline queries (rows-only driver checks —
the full bronze→star dataflow is not reasonably expressible as one ANSI
oracle; its operators are each oracle-verified individually in
queries_etl.py, and pipeline invariants are pytest-asserted
(tests/test_pipeline.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rta_registrations_pyspark_glue_spark.plans.pipeline import run_pipeline
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.bronze import synthesize_bronze


@register("rta_pipeline_fact")
def rta_pipeline_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference pipeline (ETL1+ETL2, SURVEY.md §3.1-3.2): dirty
    bronze → clean/stage → dims + resolution → fact_registrations."""
    return run_pipeline(synthesize_bronze(spark, sf_dir)).fact


@register("rta_pipeline_dim_vehicle")
def rta_pipeline_dim_vehicle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_vehicle from the same pipeline (schema per starschema_dw.txt:9-21)."""
    return run_pipeline(synthesize_bronze(spark, sf_dir)).dim_vehicle
