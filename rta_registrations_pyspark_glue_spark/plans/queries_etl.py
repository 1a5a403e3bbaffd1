"""ETL operator queries (SURVEY.md §2 / §7 Phases 1-3) with DuckDB
oracles. Dirty inputs are synthesized *deterministically* from the
driver tables (keyed on stable ids — FIXTURES.md §B patterns), then run
through the real operator library; the oracle re-expresses the same
semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.functions.dates import date_key, date_spine, parse_multiformat_date
from rta_registrations_pyspark_glue_spark.functions.hashing import surrogate_key
from rta_registrations_pyspark_glue_spark.operators import cleaning, resolve, urls
from rta_registrations_pyspark_glue_spark.plans.planmemo import plan_memo
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table


@register(
    "surrogate_part_dim",
    oracle="""
    SELECT DISTINCT
        sha256(concat_ws('|', lower(trim(p_brand)), lower(trim(p_type)))) AS PART_DIM_ID,
        lower(trim(p_brand)) AS brand_norm,
        lower(trim(p_type)) AS type_norm
    FROM part
    """,
)
def surrogate_part_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha2 surrogate keys over normalized natural keys + key-subset dedup
    (F11 + A2, etl2_advclean_and_dimcreatin.py:156-183)."""
    part = load_table(spark, "part", sf_dir)
    return part.select(
        surrogate_key("p_brand", "p_type").alias("PART_DIM_ID"),
        F.lower(F.trim(F.col("p_brand"))).alias("brand_norm"),
        F.lower(F.trim(F.col("p_type"))).alias("type_norm"),
    ).dropDuplicates(["PART_DIM_ID"])


@register(
    "multiformat_date_parse",
    oracle=r"""
    WITH dirty AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%d/%m/%Y')
                    WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%d.%m.%y')
                    WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%Y/%m/%d')
                    ELSE 'RTA HYDERABAD' END AS raw_date
        FROM orders
    ), cleaned AS (
        SELECT o_orderkey, raw_date,
               regexp_replace(trim(regexp_replace(raw_date, '[^0-9/.\-]', '', 'g')),
                              '[.\-]', '/', 'g') AS c
        FROM dirty
    ), parsed AS (
        SELECT o_orderkey, raw_date,
               CASE WHEN regexp_matches(c, '^\d{2}/\d{2}/\d{4}$')
                         THEN CAST(strptime(c, '%d/%m/%Y') AS DATE)
                    WHEN regexp_matches(c, '^\d{2}/\d{2}/\d{2}$')
                         THEN CAST(strptime(c, '%d/%m/%y') AS DATE)
                    WHEN regexp_matches(c, '^\d{4}/\d{2}/\d{2}$')
                         THEN CAST(strptime(c, '%Y/%m/%d') AS DATE)
                    ELSE NULL END AS parsed_date
        FROM cleaned
    )
    SELECT o_orderkey, raw_date, parsed_date,
           CAST(strftime(parsed_date, '%Y%m%d') AS INT) AS date_id
    FROM parsed
    """,
)
@plan_memo
def multiformat_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-branch multi-format date parse + yyyyMMdd key (D1/D3,
    etl1_clean_and_stage.py:36-49). Dirty strings synthesized from
    o_orderdate per orderkey%4 incl. a non-date (office code) shape."""
    orders = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    d = F.col("o_orderdate")
    raw = (
        F.when(k % 4 == 0, F.date_format(d, "dd/MM/yyyy"))
        .when(k % 4 == 1, F.date_format(d, "dd.MM.yy"))
        .when(k % 4 == 2, F.date_format(d, "yyyy/MM/dd"))
        .otherwise(F.lit("RTA HYDERABAD"))
    )
    df = orders.select(k.alias("o_orderkey"), raw.alias("raw_date"))
    df = df.withColumn("parsed_date", parse_multiformat_date("raw_date"))
    return df.withColumn("date_id", date_key("parsed_date"))


_OFFICE_ORACLE = r"""
    WITH synth AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 4 = 3 THEN 'RTA HYDERABAD'
                    ELSE strftime(o_orderdate, '%d/%m/%Y') END AS fromdate,
               CASE WHEN o_orderkey % 4 = 3 THEN NULL
                    WHEN o_orderkey % 11 = 5 THEN 'TS'
                    WHEN o_orderkey % 11 = 6 THEN 'TG'
                    ELSE 'RTA OFFICE ' || CAST(o_orderkey % 11 AS VARCHAR) END AS OfficeCd
        FROM orders
    ), s1 AS (  -- move office-shaped fromdate into a NULL OfficeCd; null the date
        SELECT o_orderkey,
               CASE WHEN regexp_matches(fromdate, '(?i)^(RTA|UNIT OFFICE|MVI|DTO|ZONAL|TRANSPORT).*')
                         AND OfficeCd IS NULL
                    THEN fromdate ELSE OfficeCd END AS OfficeCd,
               CASE WHEN regexp_matches(fromdate, '(?i)^(RTA|UNIT OFFICE|MVI|DTO|ZONAL|TRANSPORT).*')
                    THEN NULL ELSE fromdate END AS fromdate
        FROM synth
    ), s2 AS (  -- drop bare TS/TG state codes
        SELECT o_orderkey, fromdate,
               CASE WHEN regexp_matches(OfficeCd, '(?i)^(TS|TG)$') THEN NULL
                    ELSE OfficeCd END AS OfficeCd
        FROM s1
    )
    SELECT o_orderkey, fromdate,
           CASE WHEN OfficeCd IS NULL AND fromdate IS NOT NULL THEN fromdate
                ELSE OfficeCd END AS OfficeCd
    FROM s2
    """


def officecd_misalignment_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-column misalignment repair truth table (P5,
    etl1_clean_and_stage.py:76-94), including the reference's quirk that a
    TS/TG-nulled office code backfills from the (date-shaped) fromdate."""
    orders = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    fromdate = F.when(k % 4 == 3, F.lit("RTA HYDERABAD")).otherwise(
        F.date_format("o_orderdate", "dd/MM/yyyy")
    )
    office = (
        F.when(k % 4 == 3, F.lit(None).cast("string"))
        .when(k % 11 == 5, F.lit("TS"))
        .when(k % 11 == 6, F.lit("TG"))
        .otherwise(F.concat(F.lit("RTA OFFICE "), (k % 11).cast("string")))
    )
    synth = orders.select(k.alias("o_orderkey"), fromdate.alias("fromdate"), office.alias("OfficeCd"))
    return cleaning.repair_office_code_misalignment(synth).select(
        "o_orderkey", "fromdate", "OfficeCd"
    )


_FUEL_ORACLE = """
    WITH synth AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'GASOLINE'
                    WHEN o_orderkey % 7 = 1 THEN 'BATTERY'
                    WHEN o_orderkey % 7 = 2 THEN 'DIESEL '
                    WHEN o_orderkey % 7 = 3 THEN 'CNG ONLY'
                    WHEN o_orderkey % 7 = 4 THEN ''
                    WHEN o_orderkey % 7 = 5 THEN NULL
                    ELSE 'PETROL' END AS fuel
        FROM orders
    )
    SELECT o_orderkey, fuel,
           upper(CASE WHEN regexp_matches(fuel, 'BATTERY|ELECTRIC') THEN 'ELECTRIC'
                      WHEN regexp_matches(fuel, 'PETROL|GASOLINE') THEN 'PETROL'
                      WHEN regexp_matches(fuel, 'DIESEL') THEN 'DIESEL'
                      WHEN regexp_matches(fuel, 'CNG') THEN 'CNG'
                      WHEN regexp_matches(fuel, 'LPG') THEN 'LPG'
                      ELSE 'UNKNOWN' END) AS fuel_clean
    FROM synth
    """


def fuel_taxonomy_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuel taxonomy CASE cascade over every dirty variant incl. '' and
    NULL (P5, etl1_clean_and_stage.py:120-125)."""
    orders = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    fuel = (
        F.when(k % 7 == 0, F.lit("GASOLINE"))
        .when(k % 7 == 1, F.lit("BATTERY"))
        .when(k % 7 == 2, F.lit("DIESEL "))
        .when(k % 7 == 3, F.lit("CNG ONLY"))
        .when(k % 7 == 4, F.lit(""))
        .when(k % 7 == 5, F.lit(None).cast("string"))
        .otherwise(F.lit("PETROL"))
    )
    synth = orders.select(k.alias("o_orderkey"), fuel.alias("fuel"))
    return cleaning.normalize_fuel(synth).select("o_orderkey", "fuel", "fuel_clean")


@register(
    "model_variant_derivation",
    oracle=r"""
    WITH synth AS (
        SELECT doc_id,
               CASE WHEN doc_id % 8 = 0 THEN upper(substr(text, 1, 40)) || ' FLATBED TRAILER'
                    WHEN doc_id % 8 = 4 THEN upper(substr(text, 1, 40)) || ' EV 2021'
                    WHEN doc_id % 6 = 0 THEN upper(substr(text, 1, 40)) || '@#$ BS IV'
                    ELSE upper(substr(text, 1, 40)) || ' ' || CAST(1990 + doc_id % 30 AS VARCHAR)
               END AS modelDesc
        FROM documents
    ), cleaned AS (
        SELECT doc_id, modelDesc,
               trim(regexp_replace(modelDesc, '[^A-Za-z0-9\s\+\-\(\)\./]', ' ', 'g')) AS mdc
        FROM synth
    ), flags AS (
        SELECT doc_id, modelDesc, mdc,
               regexp_matches(lower(mdc), 'trailer|trailor|tipper|tractor|tanker') AS isTrailer,
               regexp_matches(lower(mdc), '\b(ev|bov|electric|hybrid)\b') AS isElectric,
               regexp_split_to_array(mdc, '\s+') AS words
        FROM cleaned
    )
    SELECT doc_id, mdc AS modelDescClean, isTrailer, isElectric,
           upper(CASE WHEN isTrailer THEN mdc ELSE words[1] END) AS modelName,
           CASE WHEN (v = '' OR v IS NULL) THEN 'UNKNOWN' ELSE v END AS variant,
           regexp_extract(mdc, '(19\d{2}|20[0-2]\d)', 1) AS year_inferred,
           upper(regexp_replace(regexp_extract(mdc, '(BS\s?III[AB]?|BS\s?IV|BS\s?V|BS\s?VI)', 1),
                                '\s', '', 'g')) AS emission_extract
    FROM (
        SELECT *,
               upper(CASE WHEN isTrailer THEN 'TRAILER/TIPPER/TRACTOR/TANKER'
                          ELSE trim(array_to_string(words[2:], ' ')) END) AS v
        FROM flags
    )
    """,
)
def model_variant_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text model/variant/flag derivation + year and emission regex
    extraction (F1-F9/M1-M3, etl1_clean_and_stage.py:100-109,127;
    etl2_advclean_and_dimcreatin.py:125). Input synthesized from
    documents.text prefixes with trailer/EV/symbol/year suffixes."""
    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id")
    prefix = F.upper(F.substring("text", 1, 40))
    model_desc = (
        F.when(d % 8 == 0, F.concat(prefix, F.lit(" FLATBED TRAILER")))
        .when(d % 8 == 4, F.concat(prefix, F.lit(" EV 2021")))
        .when(d % 6 == 0, F.concat(prefix, F.lit("@#$ BS IV")))
        .otherwise(F.concat(prefix, F.lit(" "), (1990 + d % 30).cast("string")))
    )
    synth = docs.select(d.alias("doc_id"), model_desc.alias("modelDesc"))
    out = cleaning.derive_model_variant(synth)
    return out.select(
        "doc_id",
        "modelDescClean",
        "isTrailer",
        "isElectric",
        "modelName",
        "variant",
        F.regexp_extract("modelDescClean", cleaning.YEAR_RE, 1).alias("year_inferred"),
        F.upper(
            F.regexp_replace(
                F.regexp_extract("modelDescClean", cleaning.EMISSION_RE, 1), r"\s", ""
            )
        ).alias("emission_extract"),
    )


_YEAR_ORACLE = r"""
    WITH synth AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 9 = 0 THEN '19'
                    WHEN o_orderkey % 9 = 1 THEN ''
                    WHEN o_orderkey % 9 = 2 THEN 'UNKNOWN'
                    WHEN o_orderkey % 9 = 3 THEN NULL
                    ELSE CAST(1995 + o_orderkey % 25 AS VARCHAR) END AS makeYear,
               CASE WHEN o_orderkey % 2 = 0
                    THEN 'MODEL X ' || CAST(1990 + o_orderkey % 30 AS VARCHAR)
                    ELSE 'MODEL X' END AS modelDescClean
        FROM orders
    ), backfilled AS (
        SELECT o_orderkey, makeYear, modelDescClean,
               CASE WHEN makeYear IS NULL OR makeYear = '' OR makeYear = 'UNKNOWN'
                    THEN CASE WHEN regexp_extract(modelDescClean, '(19\d{2}|20[0-2]\d)', 1) <> ''
                              THEN regexp_extract(modelDescClean, '(19\d{2}|20[0-2]\d)', 1)
                              ELSE 'UNKNOWN' END
                    ELSE makeYear END AS y
        FROM synth
    )
    SELECT o_orderkey, modelDescClean,
           y AS makeYear_backfilled,
           CASE WHEN length(y) = 2 AND regexp_matches(y, '^[0-9]{2}$')
                THEN '20' || y ELSE y END AS makeYear_clean
    FROM backfilled
    """


def make_year_harden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Make-year hardening: backfill missing/UNKNOWN from embedded year
    (etl1:127-130), then the two-digit-year fix (etl2:112-117)."""
    orders = load_table(spark, "orders", sf_dir)
    k = F.col("o_orderkey")
    make_year = (
        F.when(k % 9 == 0, F.lit("19"))
        .when(k % 9 == 1, F.lit(""))
        .when(k % 9 == 2, F.lit("UNKNOWN"))
        .when(k % 9 == 3, F.lit(None).cast("string"))
        .otherwise((1995 + k % 25).cast("string"))
    )
    mdc = F.when(
        k % 2 == 0, F.concat(F.lit("MODEL X "), (1990 + k % 30).cast("string"))
    ).otherwise(F.lit("MODEL X"))
    synth = orders.select(
        k.alias("o_orderkey"), make_year.alias("makeYear"), mdc.alias("modelDescClean")
    )
    out = cleaning.backfill_make_year(synth)  # backfills makeYear in place
    out = cleaning.fix_two_digit_year(out)
    return out.select(
        "o_orderkey",
        "modelDescClean",
        F.col("makeYear").alias("makeYear_backfilled"),
        "makeYear_clean",
    )


#: Deterministic MESSY URL per doc: residue-driven case, default and
#: non-default ports, utm_* params in every position (incl. an
#: ADJACENT multi-utm run and a non-utm "xutm_" param that anchored
#: stripping must keep — ADVICE r9), fragments, trailing slashes, www.
#: prefixes, and .com / .co.uk / .co.kr / *.ck-wildcard /
#: github.io-PRIVATE-section hosts spanning the PSL rule shapes (the
#: github.io branch exercises the full vendored list's private
#: section, r11) — each targeting one normalize_url rewrite or one
#: registrable_domain rule. Mirrored literally below.
_RAW_URL_SQL = """
    (CASE doc_id % 2 WHEN 0 THEN 'HTTP' ELSE 'https' END || '://'
     || CASE WHEN doc_id % 5 = 0
             THEN 'WWW.News.Site' || (doc_id % 7) || '.CO.UK'
             WHEN doc_id % 5 = 1
             THEN 'Shop' || (doc_id % 7) || '.CO.KR'
             WHEN doc_id % 5 = 2
             THEN 'Press' || (doc_id % 7) || '.GOV.CK'
             WHEN doc_id % 5 = 3
             THEN 'Docs.User' || (doc_id % 7) || '.GitHub.IO'
             ELSE 'Www.Site' || (doc_id % 7) || '.COM' END
     || CASE WHEN doc_id % 3 = 0
             THEN CASE doc_id % 2 WHEN 0 THEN ':80' ELSE ':443' END
             WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END
     || '/Page/' || (doc_id % 11)
     || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
     || CASE doc_id % 4
        WHEN 1 THEN '?utm_source=x&utm_medium=m&id=' || (doc_id % 13)
        WHEN 2 THEN '?id=' || (doc_id % 13) || '&utm_campaign=y'
        WHEN 3 THEN '?id=' || (doc_id % 13) || '&xutm_k=1' ELSE '' END
     || CASE WHEN doc_id % 6 = 5 THEN '#sec' || (doc_id % 3) ELSE '' END)
"""


def _raw_url_expr() -> "F.Column":
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(
            d % 5 == 0,
            F.concat(F.lit("WWW.News.Site"), (d % 7).cast("string"), F.lit(".CO.UK")),
        )
        .when(
            d % 5 == 1,
            F.concat(F.lit("Shop"), (d % 7).cast("string"), F.lit(".CO.KR")),
        )
        .when(
            d % 5 == 2,
            F.concat(F.lit("Press"), (d % 7).cast("string"), F.lit(".GOV.CK")),
        )
        .when(
            d % 5 == 3,
            F.concat(
                F.lit("Docs.User"), (d % 7).cast("string"), F.lit(".GitHub.IO")
            ),
        )
        .otherwise(
            F.concat(F.lit("Www.Site"), (d % 7).cast("string"), F.lit(".COM"))
        ),
        F.when(
            d % 3 == 0,
            F.when(d % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        )
        .when(d % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/Page/"),
        (d % 11).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 4 == 1,
            F.concat(
                F.lit("?utm_source=x&utm_medium=m&id="), (d % 13).cast("string")
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("?id="), (d % 13).cast("string"), F.lit("&utm_campaign=y")
            ),
        )
        .when(
            d % 4 == 3,
            F.concat(F.lit("?id="), (d % 13).cast("string"), F.lit("&xutm_k=1")),
        )
        .otherwise(F.lit("")),
        F.when(
            d % 6 == 5, F.concat(F.lit("#sec"), (d % 3).cast("string"))
        ).otherwise(F.lit("")),
    )


_URL_ORACLE = f"""
    WITH raw AS (
        SELECT doc_id, {_RAW_URL_SQL} AS url_raw FROM documents
    ), norm AS (
        SELECT doc_id, url_raw,
               {urls.normalize_url_sql("url_raw")} AS url_norm
        FROM raw
    ), dom AS (
        SELECT doc_id, url_raw, url_norm,
               {urls.registrable_domain_sql(
                   "regexp_extract(url_norm, '^[a-z]+://([^/:?#]*)', 1)"
               )} AS domain
        FROM norm
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY domain
            ORDER BY md5(url_norm), url_norm, doc_id
        ) AS rn FROM dom
    )
    SELECT doc_id, url_raw, url_norm, domain,
           CAST(rn AS INT) AS domain_rank,
           rn <= 3 AS kept
    FROM ranked
    """


def url_domain_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL hygiene + per-domain quotas, scan-side end to end (r9):
    each doc gets a deterministic MESSY url (every residue targets one
    rewrite — case, default ports, utm_* in every position, fragments,
    www., trailing slashes, multi-level public suffixes), the
    normalizer (operators/urls.py — Column expressions only, RE2∩Java
    regex subset) canonicalizes it, the registrable domain comes from
    the eTLD+1 rule, and the md5-ordered per-domain rank enforces the
    cap-documents-per-domain curation quota deterministically. The
    oracle replays all five rewrites, the suffix rule, and the rank
    with the same patterns."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    with_urls = docs.withColumn("url_raw", _raw_url_expr()).withColumn(
        "url_norm", urls.normalize_url(F.col("url_raw"))
    )
    return urls.cap_per_domain(with_urls, cap=3).select(
        "doc_id", "url_raw", "url_norm", "domain", "domain_rank", "kept"
    )


@register(
    "cleaning_suite",
    oracle=f"""
    SELECT 'office' AS kind, * FROM ({_OFFICE_ORACLE})
    UNION ALL BY NAME
    SELECT 'fuel' AS kind, * FROM ({_FUEL_ORACLE})
    UNION ALL BY NAME
    SELECT 'year' AS kind, * FROM ({_YEAR_ORACLE})
    UNION ALL BY NAME
    SELECT 'url' AS kind, * FROM ({_URL_ORACLE})
    """,
)
def cleaning_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three single-column cleaning truth tables — office-code
    misalignment repair ('office' rows), fuel taxonomy normalization
    ('fuel' rows), make-year backfill + two-digit hardening ('year'
    rows) — union-tagged under ONE gate slot (each was its own slot
    through round 4; consolidated in round 5 to free oracle capacity
    under the gate's 50-row cap without weakening coverage: every input
    row of all three still hash-verifies, and the same operators run
    end-to-end inside rta_pipeline_star). Columns absent from a row kind
    are NULL."""
    office = officecd_misalignment_repair(spark, sf_dir).select(
        F.lit("office").alias("kind"), "*"
    )
    fuel = fuel_taxonomy_normalize(spark, sf_dir).select(F.lit("fuel").alias("kind"), "*")
    year = make_year_harden(spark, sf_dir).select(F.lit("year").alias("kind"), "*")
    # 'url' rows (round 9, scope v2): URL normalization + registrable
    # domain + per-domain quota rank — the web-curation cleaning ops,
    # scan-side Column expressions only
    url = url_domain_curation(spark, sf_dir).select(
        F.lit("url").alias("kind"), "*"
    )
    return (
        office.unionByName(fuel, allowMissingColumns=True)
        .unionByName(year, allowMissingColumns=True)
        .unionByName(url, allowMissingColumns=True)
    )


@register(
    "customer_order_activity",
    oracle="""
    SELECT 'no_orders' AS activity, c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'open_orders' AS activity, c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def customer_order_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS — J2/U2, etl2:216-218) and LEFT SEMI
    (EXISTS) joins in one union-tagged result: 'no_orders' rows come
    from the anti join, 'open_orders' rows from the semi join —
    completing the reference's join surface under one gate slot."""
    customer = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    without = customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select(
        F.lit("no_orders").alias("activity"), "c_custkey", "c_name", "c_mktsegment"
    )
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    with_open = customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select(
        F.lit("open_orders").alias("activity"), "c_custkey", "c_name", "c_mktsegment"
    )
    return without.unionByName(with_open)


@register(
    "date_spine_dim",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS DATE_ID,
           CAST(d AS DATE) AS FULL_DATE,
           EXTRACT(year FROM d)::INT AS YEAR,
           EXTRACT(month FROM d)::INT AS MONTH,
           EXTRACT(day FROM d)::INT AS DAY,
           EXTRACT(quarter FROM d)::INT AS QUARTER,
           (EXTRACT(dow FROM d)::INT + 1) AS DAY_OF_WEEK
    FROM generate_series(DATE '2010-01-01', DATE '2026-12-31', INTERVAL 1 DAY) AS t(d)
    """,
)
def date_spine_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dim_date spine via sequence+explode — Spark-native replacement for
    the warehouse recursive CTE (D5, starschema_dw.txt:83-97). Spark
    dayofweek is 1=Sunday; DuckDB dow is 0=Sunday, hence the +1."""
    return date_spine(spark)


@register(
    "fuzzy_resolution_parts",
    oracle=r"""
    WITH catn AS (
        SELECT lower(trim(p_name)) AS cat_text, MIN(p_partkey) AS cat_id
        FROM part GROUP BY 1
    ), probe AS (
        SELECT p_partkey AS probe_key,
               lower(trim(CASE WHEN p_partkey % 3 = 0
                               THEN substr(p_name, 1, 3) || substr(p_name, 5)
                               WHEN p_partkey % 3 = 1 THEN p_name
                               ELSE p_name || ' xq' END)) AS probe_text
        FROM part
    ), exact AS (
        SELECT p.probe_key, c.cat_id
        FROM probe p JOIN catn c ON p.probe_text = c.cat_text
    ), unresolved AS (
        SELECT * FROM probe p
        WHERE NOT EXISTS (SELECT 1 FROM exact e WHERE e.probe_key = p.probe_key)
    ), cands AS (
        SELECT u.probe_key, c.cat_id,
               levenshtein(u.probe_text, c.cat_text) AS lev
        FROM unresolved u
        JOIN catn c ON substr(u.probe_text, 1, 2) = substr(c.cat_text, 1, 2)
        WHERE length(u.probe_text) >= 2
          AND levenshtein(u.probe_text, c.cat_text) <= 3
    ), best AS (
        SELECT probe_key, cat_id, lev FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_key
                                         ORDER BY lev, cat_id) AS rn
            FROM cands
        ) WHERE rn = 1
    )
    SELECT probe_key AS p_partkey, cat_id AS RESOLVED_ID,
           CAST(NULL AS INT) AS LEV_DIST, FALSE AS IS_FUZZY_MATCH
    FROM exact
    UNION ALL
    SELECT probe_key, cat_id, CAST(lev AS INT), TRUE
    FROM best
    """,
)
@plan_memo
def fuzzy_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's crown-jewel operator: exact resolution + anti-join
    staging + blocked Levenshtein fuzzy match + deterministic top-1
    (J1-J5, etl2_advclean_and_dimcreatin.py:195-244). Probes are part
    names perturbed per partkey%3: char deleted (lev 1), unchanged
    (exact), 3-char suffix (lev 3)."""
    part = load_table(spark, "part", sf_dir)
    catalog = part.groupBy(F.lower(F.trim("p_name")).alias("cat_text")).agg(
        F.min("p_partkey").alias("cat_id")
    )
    p = F.col("p_partkey")
    probe_text = (
        F.when(p % 3 == 0, F.concat(F.substring("p_name", 1, 3), F.expr("substring(p_name, 5)")))
        .when(p % 3 == 1, F.col("p_name"))
        .otherwise(F.concat(F.col("p_name"), F.lit(" xq")))
    )
    probe = part.select(p.alias("p_partkey"), probe_text.alias("probe_text"))
    return resolve.resolve_exact_fuzzy(
        probe,
        catalog,
        probe_key="p_partkey",
        probe_text="probe_text",
        catalog_id="cat_id",
        catalog_text="cat_text",
    )
