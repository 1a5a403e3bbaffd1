"""Table loaders for the driver-provided star schema (TESTDATA.md) and
reference-shaped bronze fixtures (FIXTURES.md §B)."""

from rta_registrations_pyspark_glue_spark.sources.testdata import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
