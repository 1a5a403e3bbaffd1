"""Date functions (SURVEY.md §2.9 D1-D5).

- ``parse_multiformat_date``: the reference's three-branch regex-dispatch
  parser (etl1_clean_and_stage.py:36-49) — normalize separators, then
  choose the format by shape, else NULL. Two-digit years are expanded
  in-string with the POSIX %y pivot, so the result does not depend on
  ``spark.sql.legacy.timeParserPolicy`` (hermetic under any session).
- ``date_key``: yyyyMMdd integer smart key
  (etl2_advclean_and_dimcreatin.py:263-267, starschema_dw.txt:44-50).
- ``date_spine``: Spark-native replacement for the warehouse's
  recursive-CTE date dimension (starschema_dw.txt:83-97) — Spark SQL has
  no recursive CTE; sequence+explode generates the same spine in one
  task per year-chunk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def clean_date_string(col: Column | str) -> Column:
    """Strip non-date chars, unify [.-] separators to '/'
    (etl1_clean_and_stage.py:36-39)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.trim(F.regexp_replace(c.cast("string"), r"[^\d/.\-]", ""))
    return F.regexp_replace(cleaned, r"[\.-]", "/")


def _expand_two_digit_year(cleaned: Column) -> Column:
    """Rewrite dd/MM/yy -> dd/MM/yyyy in-string with the POSIX %y pivot
    (00-68 -> 20yy, 69-99 -> 19yy). Century-explicit rewriting makes the
    parse independent of ``spark.sql.legacy.timeParserPolicy`` — the
    reference relies on a per-job LEGACY conf (etl1_clean_and_stage.py:23)
    whose SimpleDateFormat pivot floats with wall-clock time; a fixed
    pivot is deterministic across sessions and engines."""
    yy = F.substring(cleaned, 7, 2).cast("int")
    century = F.when(yy <= 68, F.lit("20")).otherwise(F.lit("19"))
    return F.concat(F.substring(cleaned, 1, 6), century, F.substring(cleaned, 7, 2))


def parse_multiformat_date(col: Column | str) -> Column:
    """Regex-shape dispatch over dd/MM/yyyy, dd/MM/yy, yyyy/MM/dd; any
    other shape parses to NULL (etl1_clean_and_stage.py:40-49). Two-digit
    years are expanded in-string (POSIX pivot) so no parser-policy session
    conf is required."""
    cleaned = clean_date_string(col)
    return (
        F.when(cleaned.rlike(r"^\d{2}/\d{2}/\d{4}$"), F.to_date(cleaned, "dd/MM/yyyy"))
        .when(
            cleaned.rlike(r"^\d{2}/\d{2}/\d{2}$"),
            F.to_date(_expand_two_digit_year(cleaned), "dd/MM/yyyy"),
        )
        .when(cleaned.rlike(r"^\d{4}/\d{2}/\d{2}$"), F.to_date(cleaned, "yyyy/MM/dd"))
        .otherwise(F.lit(None).cast("date"))
    )


def date_key(col: Column | str) -> Column:
    """Date -> yyyyMMdd INT surrogate (D3,
    etl2_advclean_and_dimcreatin.py:263-264)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyyMMdd").cast("int")


def date_spine(
    spark: SparkSession,
    start: str = "2010-01-01",
    end: str = "2026-12-31",
) -> DataFrame:
    """dim_date spine with the warehouse DDL's columns
    (starschema_dw.txt:44-50,83-97). Explicit end date (not "today") so
    output is deterministic across runs."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
                )
            ).alias("FULL_DATE")
        )
        .select(
            date_key("FULL_DATE").alias("DATE_ID"),
            F.col("FULL_DATE"),
            F.year("FULL_DATE").alias("YEAR"),
            F.month("FULL_DATE").alias("MONTH"),
            F.dayofmonth("FULL_DATE").alias("DAY"),
            F.quarter("FULL_DATE").alias("QUARTER"),
            F.dayofweek("FULL_DATE").alias("DAY_OF_WEEK"),
        )
    )
