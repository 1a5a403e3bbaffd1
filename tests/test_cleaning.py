"""Unit tests for the cleaning operator library (SURVEY.md §5 item 2):
every regex branch, repair rule, and taxonomy case on tiny in-memory
frames."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from rta_registrations_pyspark_glue_spark.functions.dates import parse_multiformat_date
from rta_registrations_pyspark_glue_spark.operators import cleaning


def _parse(spark, raw):
    df = spark.createDataFrame([Row(d=raw)], "d string")
    return df.select(parse_multiformat_date("d").alias("p")).collect()[0]["p"]


class TestMultiformatDateParse:
    def test_ddmmyyyy(self, spark):
        assert _parse(spark, "15/03/2023") == datetime.date(2023, 3, 15)

    def test_dots_normalized(self, spark):
        assert _parse(spark, "15.03.2023") == datetime.date(2023, 3, 15)

    def test_dashes_normalized(self, spark):
        assert _parse(spark, "15-03-2023") == datetime.date(2023, 3, 15)

    def test_two_digit_year_recent_century(self, spark):
        # LEGACY SimpleDateFormat: -80/+20 years around now.
        assert _parse(spark, "15/03/23") == datetime.date(2023, 3, 15)

    def test_iso_like(self, spark):
        assert _parse(spark, "2023/03/15") == datetime.date(2023, 3, 15)

    def test_garbage_is_null(self, spark):
        assert _parse(spark, "N/A") is None
        assert _parse(spark, "RTA HYDERABAD") is None
        assert _parse(spark, None) is None

    def test_whitespace_stripped(self, spark):
        assert _parse(spark, " 15/03/2023 ") == datetime.date(2023, 3, 15)


class TestOfficeCdRepair:
    def rows(self, spark, fromdate, office):
        df = spark.createDataFrame(
            [Row(fromdate=fromdate, OfficeCd=office)], "fromdate string, OfficeCd string"
        )
        return cleaning.repair_office_code_misalignment(df).collect()[0]

    def test_office_moved_from_date(self, spark):
        r = self.rows(spark, "RTA HYDERABAD", None)
        assert r["OfficeCd"] == "RTA HYDERABAD" and r["fromdate"] is None

    def test_state_code_nulled(self, spark):
        r = self.rows(spark, None, "TS")
        assert r["OfficeCd"] is None

    def test_state_code_then_backfill_from_date(self, spark):
        # Reference quirk (etl1:91-94): TS nulled, then backfilled from a
        # date-shaped fromdate.
        r = self.rows(spark, "15/03/2023", "TG")
        assert r["OfficeCd"] == "15/03/2023"

    def test_clean_row_untouched(self, spark):
        r = self.rows(spark, "15/03/2023", "RTA WARANGAL")
        assert r["OfficeCd"] == "RTA WARANGAL" and r["fromdate"] == "15/03/2023"


class TestModelVariant:
    def derive(self, spark, desc):
        df = spark.createDataFrame([Row(modelDesc=desc)])
        return cleaning.derive_model_variant(df).collect()[0]

    def test_simple_split(self, spark):
        r = self.derive(spark, "SWIFT VDI BS IV 2019")
        assert r["modelName"] == "SWIFT"
        assert r["variant"] == "VDI BS IV 2019"

    def test_symbols_cleaned(self, spark):
        r = self.derive(spark, "SWIFT@VDI#")
        assert r["modelName"] == "SWIFT"
        assert r["variant"] == "VDI"

    def test_trailer_keeps_full_text(self, spark):
        r = self.derive(spark, "FLATBED TRAILER")
        assert r["isTrailer"] is True
        assert r["modelName"] == "FLATBED TRAILER"
        assert r["variant"] == "TRAILER/TIPPER/TRACTOR/TANKER"

    def test_electric_flag(self, spark):
        r = self.derive(spark, "NEXON EV")
        assert r["isElectric"] is True

    def test_single_word_variant_unknown(self, spark):
        r = self.derive(spark, "ALTO")
        assert r["variant"] == "UNKNOWN"


class TestFuelTaxonomy:
    def norm(self, spark, fuel):
        df = spark.createDataFrame([Row(fuel=fuel)], "fuel string")
        return cleaning.normalize_fuel(df).collect()[0]["fuel_clean"]

    def test_cases(self, spark):
        assert self.norm(spark, "BATTERY") == "ELECTRIC"
        assert self.norm(spark, "GASOLINE") == "PETROL"
        assert self.norm(spark, "DIESEL ") == "DIESEL"
        assert self.norm(spark, "CNG ONLY") == "CNG"
        assert self.norm(spark, "LPG") == "LPG"
        assert self.norm(spark, "") == "UNKNOWN"
        assert self.norm(spark, None) == "UNKNOWN"
        # ELECTRIC outranks PETROL in the cascade order.
        assert self.norm(spark, "PETROL/ELECTRIC HYBRID") == "ELECTRIC"


class TestYearHardening:
    def test_two_digit_fix(self, spark):
        df = spark.createDataFrame([Row(makeYear="19")])
        assert cleaning.fix_two_digit_year(df).collect()[0]["makeYear_clean"] == "2019"

    def test_four_digit_untouched(self, spark):
        df = spark.createDataFrame([Row(makeYear="1999")])
        assert cleaning.fix_two_digit_year(df).collect()[0]["makeYear_clean"] == "1999"

    def test_backfill_from_text(self, spark):
        df = spark.createDataFrame([Row(makeYear="UNKNOWN", modelDescClean="ALTO 2018")])
        assert cleaning.backfill_make_year(df).collect()[0]["makeYear"] == "2018"

    def test_backfill_no_year_in_text(self, spark):
        df = spark.createDataFrame([Row(makeYear=None, modelDescClean="ALTO")], "makeYear string, modelDescClean string")
        assert cleaning.backfill_make_year(df).collect()[0]["makeYear"] == "UNKNOWN"

    def test_year_regex_bounds(self, spark):
        # 20[0-2]\d: 2039 not matched; 1899 not matched.
        df = spark.createDataFrame([Row(makeYear="", modelDescClean="X 2039 1899")])
        assert cleaning.backfill_make_year(df).collect()[0]["makeYear"] == "UNKNOWN"


class TestEmission:
    def test_derived_from_text(self, spark):
        df = spark.createDataFrame(
            [Row(modelDescClean="SWIFT BS IV", isElectric=False)],
            "modelDescClean string, isElectric boolean",
        )
        out = cleaning.derive_emission_standard(df).collect()[0]
        assert out["emissionStandard"] == "BSIV"

    def test_electric_overrides(self, spark):
        df = spark.createDataFrame([Row(modelDescClean="NEXON BS VI", isElectric=True)])
        assert cleaning.derive_emission_standard(df).collect()[0]["emissionStandard"] == "ELECTRIC"

    def test_present_column_null_defaulted(self, spark):
        df = spark.createDataFrame(
            [Row(modelDescClean="X", isElectric=False, emissionStandard=None)],
            "modelDescClean string, isElectric boolean, emissionStandard string",
        )
        assert cleaning.derive_emission_standard(df).collect()[0]["emissionStandard"] == "UNKNOWN"
