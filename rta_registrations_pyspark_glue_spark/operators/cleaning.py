"""Cleaning / normalization operators — the ETL1 surface (SURVEY.md §7
Phase 1; reference etl1_clean_and_stage.py) plus ETL2's standardization
steps (etl2_advclean_and_dimcreatin.py:105-145).

Each operator is a pure ``DataFrame -> DataFrame`` transform over the
bronze registrations schema (SURVEY.md §1.4, all-string columns). All
expressions are built-ins: the whole chain fuses into one codegen'd
scan-project stage, so cleaning 100 TB costs one pass with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from rta_registrations_pyspark_glue_spark.functions.dates import parse_multiformat_date
from rta_registrations_pyspark_glue_spark.functions.strings import clean_symbols, strip_trailing_punct, tokenize_words

# Office-code shapes that indicate a value misaligned into a date column
# (etl1_clean_and_stage.py:79).
OFFICE_CODE_RE = "(?i)^(RTA|UNIT OFFICE|MVI|DTO|ZONAL|TRANSPORT).*"
TRAILER_RE = "trailer|trailor|tipper|tractor|tanker"  # etl1:101
ELECTRIC_RE = r"\b(ev|bov|electric|hybrid)\b"  # etl1:102
YEAR_RE = r"(19\d{2}|20[0-2]\d)"  # etl1:127
EMISSION_RE = r"(BS\s?III[AB]?|BS\s?IV|BS\s?V|BS\s?VI)"  # etl2:125


def clean_maker_name(df: DataFrame, col: str = "makerName") -> DataFrame:
    """Strip trailing punctuation from maker names (etl1:66)."""
    return df.withColumn(col, strip_trailing_punct(col))


def repair_office_code_misalignment(
    df: DataFrame, office_col: str = "OfficeCd", date_col: str = "fromdate"
) -> DataFrame:
    """Cross-column repair (etl1:76-94): office codes that landed in the
    date column are moved back; stray TS/TG state codes are nulled; a
    still-missing office code falls back to the (non-office-shaped)
    date-column value."""
    # The three sequential repair steps are composed as nested expressions
    # and applied in ONE withColumns call: every eager withColumn
    # re-analyzes the whole (growing) plan, which made deep cleaning
    # chains pay O(n²) driver time. Semantics identical to the stepwise
    # reference code.
    date_is_office = F.col(date_col).cast("string").rlike(OFFICE_CODE_RE)
    office0 = F.col(office_col)
    date1 = F.when(date_is_office, F.lit(None).cast("string")).otherwise(F.col(date_col))
    office1 = F.when(date_is_office & office0.isNull(), F.col(date_col)).otherwise(office0)
    office2 = F.when(office1.rlike("(?i)^(TS|TG)$"), F.lit(None)).otherwise(office1)
    office3 = F.when(office2.isNull() & date1.isNotNull(), date1).otherwise(office2)
    return df.withColumns({office_col: office3, date_col: date1})


def derive_model_variant(df: DataFrame, col: str = "modelDesc") -> DataFrame:
    """Free-text model description → modelDescClean, isTrailer, isElectric,
    modelName (first token, or full text for trailers), variant (remaining
    tokens, or a fixed class for trailers; UNKNOWN when empty)
    (etl1:100-109)."""
    # Composed as shared expression objects → two withColumns batches
    # (the second depends on columns created by the first); runtime
    # subexpression elimination dedups the repeated subtrees.
    clean = clean_symbols(col)
    df = df.withColumns(
        {
            "modelDescClean": clean,
            "isTrailer": F.lower(clean).rlike(TRAILER_RE),
            "isElectric": F.lower(clean).rlike(ELECTRIC_RE),
        }
    )
    words = tokenize_words("modelDescClean")
    variant_words = F.slice(words, 2, F.size(words) - 1)
    variant_raw = F.upper(
        F.when(F.col("isTrailer"), F.lit("TRAILER/TIPPER/TRACTOR/TANKER")).otherwise(
            F.trim(F.concat_ws(" ", variant_words))
        )
    )
    return df.withColumns(
        {
            "modelName": F.upper(
                F.when(F.col("isTrailer"), F.col("modelDescClean")).otherwise(words[0])
            ),
            "variant": F.when(
                (variant_raw == "") | variant_raw.isNull(), "UNKNOWN"
            ).otherwise(variant_raw),
        }
    )


def normalize_fuel(df: DataFrame, col: str = "fuel", out: str = "fuel_clean") -> DataFrame:
    """Fuel taxonomy CASE cascade (etl1:120-125)."""
    c = F.col(col)
    return df.withColumn(
        out,
        F.upper(
            F.when(c.rlike("BATTERY|ELECTRIC"), "ELECTRIC")
            .when(c.rlike("PETROL|GASOLINE"), "PETROL")
            .when(c.rlike("DIESEL"), "DIESEL")
            .when(c.rlike("CNG"), "CNG")
            .when(c.rlike("LPG"), "LPG")
            .otherwise("UNKNOWN")
        ),
    )


def backfill_make_year(
    df: DataFrame, year_col: str = "makeYear", text_col: str = "modelDescClean"
) -> DataFrame:
    """Missing/UNKNOWN make-year backfilled from a year embedded in the
    model description, else 'UNKNOWN' (etl1:127-130)."""
    inferred = F.regexp_extract(F.col(text_col), YEAR_RE, 0)
    missing = F.col(year_col).isNull() | (F.col(year_col) == "") | (F.col(year_col) == "UNKNOWN")
    return df.withColumn(
        year_col,
        F.when(
            missing, F.when(inferred != "", inferred).otherwise(F.lit("UNKNOWN"))
        ).otherwise(F.col(year_col)),
    )


def parse_date_columns(df: DataFrame, cols: tuple[str, str] = ("fromdate", "todate")) -> DataFrame:
    """Multi-format date parse of both date columns → *_parsed DateType
    (etl1:32-53)."""
    return df.withColumns({f"{c}_parsed": parse_multiformat_date(c) for c in cols})


def fix_two_digit_year(df: DataFrame, col: str = "makeYear", out: str = "makeYear_clean") -> DataFrame:
    """'19' → '2019' for exactly-two-digit years (etl2:112-117)."""
    c = F.col(col).cast("string")
    return df.withColumn(
        out,
        F.when((F.length(c) == 2) & c.rlike("^[0-9]{2}$"), F.concat(F.lit("20"), c)).otherwise(c),
    )


def derive_emission_standard(df: DataFrame) -> DataFrame:
    """Schema-drift-tolerant emission standard (etl2:120-135): if the
    column is absent, derive from the BS-norm regex over modelDescClean
    (ELECTRIC for EVs, UNKNOWN otherwise); if present, null → UNKNOWN."""
    if "emissionStandard" not in df.columns:
        raw = F.when(
            F.col("modelDescClean").isNotNull(),
            F.regexp_extract(F.col("modelDescClean"), EMISSION_RE, 1),
        ).otherwise(F.lit(None))
        df = df.withColumn("__em_raw", raw)
        df = df.withColumn(
            "emissionStandard",
            F.when(F.col("isElectric") == True, F.lit("ELECTRIC"))  # noqa: E712
            .when(F.col("__em_raw").isNull() | (F.col("__em_raw") == ""), F.lit("UNKNOWN"))
            .otherwise(F.upper(F.regexp_replace(F.col("__em_raw"), r"\s", ""))),
        ).drop("__em_raw")
        return df
    return df.withColumn(
        "emissionStandard",
        F.when(F.col("emissionStandard").isNull(), "UNKNOWN").otherwise(
            F.col("emissionStandard")
        ),
    )


def coerce_is_electric(df: DataFrame) -> DataFrame:
    """Boolean hardening of isElectric, tolerant of string '1'/'True'
    encodings and of the column being absent (etl2:138-145)."""
    if "isElectric" not in df.columns:
        return df.withColumn("isElectric", F.lit(False).cast(BooleanType()))
    s = F.col("isElectric").cast("string")
    return df.withColumn(
        "isElectric",
        F.when((s == "True") | (s == "true") | (s == "1"), F.lit(True))
        .otherwise(F.lit(False))
        .cast(BooleanType()),
    )
