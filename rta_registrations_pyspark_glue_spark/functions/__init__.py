"""Scalar column-function library (SURVEY.md §2.8-2.10): string/regex
normalization, multi-format date parsing, and hash-based surrogate keys.
All built on pyspark.sql.functions (JVM-side, codegen-friendly) — zero
Python UDFs, preserving the reference's UDF-free property (SURVEY.md §2.12).
"""

from rta_registrations_pyspark_glue_spark.functions.dates import date_key, parse_multiformat_date
from rta_registrations_pyspark_glue_spark.functions.hashing import surrogate_key
from rta_registrations_pyspark_glue_spark.functions.strings import (
    clean_symbols,
    normalize_token,
    strip_trailing_punct,
)

__all__ = [
    "clean_symbols",
    "date_key",
    "normalize_token",
    "parse_multiformat_date",
    "strip_trailing_punct",
    "surrogate_key",
]
