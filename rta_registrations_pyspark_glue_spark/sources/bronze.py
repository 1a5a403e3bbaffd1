"""Deterministic dirty "bronze registrations" synthesizer (FIXTURES.md §B).

The driver testdata has no raw registrations feed, so the pipeline's
end-to-end path is exercised on a bronze table synthesized *deterministically*
from the TPC-H-ish tables: every dirty variant from FIXTURES.md §B is
produced by keying off stable ids (no randomness → identical across runs
and engines). All columns are strings, matching the reference's CSV
input contract (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.sources.testdata import load_table


def synthesize_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders x part → dirty registration rows.

    Dirt patterns (keyed on o_orderkey so every sf has them all):
      %4==0  fromdate 'dd/MM/yyyy'          %4==1  'dd.MM.yy'
      %4==2  'yyyy/MM/dd'                   %4==3  office code misaligned
             into fromdate, OfficeCd NULL (repair path, etl1:76-94)
      %5==0  makerName with trailing '.,'   %6==0  modelDesc with symbols
      %7 selects fuel dirt incl. GASOLINE/BATTERY/''/NULL
      %8==0  modelDesc carries 'TRAILER'    %8==4  carries 'EV'
      %9 selects makeYear dirt: 2-digit / '' / 'UNKNOWN' / NULL
      %10==0 duplicate row with older fromdate (keep-latest dedup path)
      %53==17 model-name typo: 3rd char of p_name becomes 'q' — a
             1-edit misspelling that exercises the blocked-Levenshtein
             fuzzy path end-to-end (typo'd vehicles stay below the
             canonical-catalog support threshold, so their probes must
             resolve fuzzily; see plans/pipeline.py MIN_CATALOG_SUPPORT)
    """
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"
    )
    # The orders parquet is 1-3 files → as few input partitions; the dirty
    # row synthesis and the downstream cleaning chain are CPU-bound per
    # row, so spread across cores up front. r13: widen-only guard — the
    # old unconditional repartition would have COALESCED an already-wide
    # real bronze feed down to the core count.
    from rta_registrations_pyspark_glue_spark.operators.spread import spread_rows

    orders = spread_rows(orders)
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_name", "p_brand")
    k = F.col("o_orderkey")

    base = orders.join(
        F.broadcast(part.filter(F.col("p_partkey") <= 200)),
        (k % 200 + 1).cast("bigint") == F.col("p_partkey"),
        "inner",
    )
    # Deterministic 1-edit typo in the model source text. Position 3 keeps
    # the 2-char fuzzy block key intact, so the typo is recoverable by the
    # blocked-Levenshtein stage (editing inside the block would make the
    # row unresolvable by design choice, not by data).
    base = base.withColumn(
        "p_name",
        F.when(
            k % 53 == 17,
            F.concat(
                F.substring("p_name", 1, 2), F.lit("q"), F.expr("substring(p_name, 4)")
            ),
        ).otherwise(F.col("p_name")),
    )

    d = F.col("o_orderdate")
    fromdate = (
        F.when(k % 4 == 0, F.date_format(d, "dd/MM/yyyy"))
        .when(k % 4 == 1, F.date_format(d, "dd.MM.yy"))
        .when(k % 4 == 2, F.date_format(d, "yyyy/MM/dd"))
        .otherwise(F.lit("RTA HYDERABAD"))
    )
    todate = F.date_format(F.date_add(d, 365), "dd/MM/yyyy")
    office = F.when(k % 4 == 3, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("RTA OFFICE "), (k % 11).cast("string"))
    )
    maker = F.when(k % 5 == 0, F.concat(F.upper("p_brand"), F.lit(".,"))).otherwise(
        F.upper("p_brand")
    )
    model_desc = (
        F.when(k % 8 == 0, F.concat(F.upper("p_name"), F.lit(" FLATBED TRAILER")))
        .when(k % 8 == 4, F.concat(F.upper("p_name"), F.lit(" EV 2021")))
        .when(k % 6 == 0, F.concat(F.upper("p_name"), F.lit("@#$ BS IV")))
        .otherwise(F.concat(F.upper("p_name"), F.lit(" "), (1990 + k % 30).cast("string")))
    )
    fuel = (
        F.when(k % 7 == 0, F.lit("GASOLINE"))
        .when(k % 7 == 1, F.lit("BATTERY"))
        .when(k % 7 == 2, F.lit("DIESEL "))
        .when(k % 7 == 3, F.lit("CNG ONLY"))
        .when(k % 7 == 4, F.lit(""))
        .when(k % 7 == 5, F.lit(None).cast("string"))
        .otherwise(F.lit("PETROL"))
    )
    make_year = (
        F.when(k % 9 == 0, F.lit("19"))
        .when(k % 9 == 1, F.lit(""))
        .when(k % 9 == 2, F.lit("UNKNOWN"))
        .when(k % 9 == 3, F.lit(None).cast("string"))
        .otherwise((1995 + k % 25).cast("string"))
    )
    colour = F.when(k % 3 == 0, F.lit(None).cast("string")).otherwise(F.lit("WHITE"))
    vclass = F.when(k % 3 == 1, F.lit(None).cast("string")).otherwise(F.lit("MOTOR CAR"))
    seats = F.when(k % 3 == 2, F.lit(None).cast("string")).otherwise((2 + k % 5).cast("string"))

    bronze = base.select(
        k.cast("string").alias("slno"),
        F.concat(F.lit("TR"), F.lpad(k.cast("string"), 9, "0")).alias(
            "tempRegistrationNumber"
        ),
        fromdate.alias("fromdate"),
        todate.alias("todate"),
        office.alias("OfficeCd"),
        maker.alias("makerName"),
        model_desc.alias("modelDesc"),
        fuel.alias("fuel"),
        make_year.alias("makeYear"),
        colour.alias("colour"),
        vclass.alias("vehicleClass"),
        seats.alias("seatCapacity"),
    )

    # Older duplicate for every 10th registration → keep-latest must win.
    # Emitted via explode instead of union-of-filtered-branch: a union
    # re-executes the whole scan+join+synthesis subtree once per branch,
    # which doubled the most expensive stage of every pipeline
    # materialization; explode produces the same row set in one pass.
    variants = F.when(
        F.col("slno").cast("bigint") % 10 == 0, F.array(F.lit("orig"), F.lit("dup"))
    ).otherwise(F.array(F.lit("orig")))
    exploded = bronze.select("*", F.explode(variants).alias("__variant"))
    return exploded.select(
        F.when(F.col("__variant") == "dup", F.concat(F.col("slno"), F.lit("_dup")))
        .otherwise(F.col("slno"))
        .alias("slno"),
        "tempRegistrationNumber",
        F.when(F.col("__variant") == "dup", F.lit("01/01/1990"))
        .otherwise(F.col("fromdate"))
        .alias("fromdate"),
        "todate",
        "OfficeCd",
        "makerName",
        "modelDesc",
        "fuel",
        "makeYear",
        "colour",
        "vehicleClass",
        "seatCapacity",
    )
