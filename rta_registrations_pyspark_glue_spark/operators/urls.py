"""URL normalization + domain-level curation — scan-side, UDF-free.

The web-curation steps between ingestion (operators/web.py) and the
text operators: canonicalize URLs so exact-URL dedup keys agree
(fragment and utm_* tracking-parameter stripping, scheme/host
lowercasing, default-port and www. removal, trailing-slash
normalization), extract the REGISTRABLE domain (last two labels,
three under common second-level public suffixes), and enforce
PER-DOMAIN QUOTAS (the RefinedWeb/FineWeb "cap documents per
domain" rule) with a deterministic md5-ordered rank so the kept set
is reproducible across runs, engines, and partitionings.

Everything here is a Column expression or a window — whole-stage
codegen end to end, because at corpus scale URL hygiene runs on
every row and a Python UDF here would gate the whole scan. Every
regex stays inside the Java-regex ∩ RE2 common subset (no
lookarounds, no backrefs in PATTERNS; replacement group syntax
differs per engine and lives in the per-engine strings) so the
DuckDB oracle mirrors each step exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: second-level public suffixes under which the registrable domain is
#: three labels, not two (a small built-in subset of the PSL — the
#: full list is a data file in production; the RULE is what matters)
SECOND_LEVEL_SUFFIX_RE = r"(\.|^)(co|com|org|gov|ac|net)\.(uk|au|jp|br|in|nz)$"


def normalize_url(col: Column) -> Column:
    """Canonical URL form, five deterministic rewrites in fixed order:
    1. drop the fragment;
    2. drop utm_* query parameters — anchored to a '?'/'&' boundary so
       path segments and values that merely CONTAIN "utm_" survive; a
       RUN of adjacent utm params is consumed in one match (global
       replacement never rescans replaced text, so ``?utm_a&utm_b&id``
       needs the ``(&utm_...)*`` extension, not a second pass);
    3. lowercase the scheme://authority prefix (path/query keep case);
    4. drop default ports (:80 for http, :443 for https);
    5. drop a 'www.' host prefix and any trailing slash."""
    u = F.regexp_replace(col, "#.*$", "")
    u = F.regexp_replace(u, "([?&])utm_[^&#]*(&utm_[^&#]*)*&", "$1")
    u = F.regexp_replace(u, "[?&]utm_[^&#]*(&utm_[^&#]*)*$", "")
    auth = F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    u = F.concat(F.lower(auth), F.substring(u, F.length(auth) + 1, 1_000_000))
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, "^(https?://)www\\.", "$1")
    u = F.regexp_replace(u, "([^/])/$", "$1")
    return u


NORMALIZE_URL_SQL_STEPS = """
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            lower(regexp_extract({u2}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1))
              || substring({u2}, length(regexp_extract({u2}, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) + 1),
            '^(http://[^/?#:]*):80([/?#].*)?$', '\\1\\2'),
          '^(https://[^/?#:]*):443([/?#].*)?$', '\\1\\2'),
        '^(https?://)www\\.', '\\1'),
      '([^/])/$', '\\1')
"""


def normalize_url_sql(raw_expr: str) -> str:
    """The DuckDB mirror of normalize_url over ``raw_expr`` — the same
    five rewrites with the same RE2∩Java patterns (replacement group
    syntax is per-engine: \\1 here, $1 in Spark; the utm steps pass
    DuckDB's 'g' option because Spark's regexp_replace is global while
    DuckDB's defaults to first-match-only)."""
    u2 = (
        "regexp_replace(regexp_replace(regexp_replace("
        + raw_expr
        + ", '#.*$', '', 'g'),"
        " '([?&])utm_[^&#]*(&utm_[^&#]*)*&', '\\1', 'g'),"
        " '[?&]utm_[^&#]*(&utm_[^&#]*)*$', '', 'g')"
    )
    return NORMALIZE_URL_SQL_STEPS.format(u2=u2)


def host_of(url_norm: Column) -> Column:
    return F.regexp_extract(url_norm, "^[a-z]+://([^/:?#]*)", 1)


def registrable_domain(host: Column) -> Column:
    """eTLD+1: three labels under a second-level public suffix, two
    otherwise (a host that IS a bare suffix has no third label — fall
    back to its own two labels)."""
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return F.when(
        host.rlike(SECOND_LEVEL_SUFFIX_RE) & (three != ""), three
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def registrable_domain_sql(host_expr: str) -> str:
    three = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    return f"""
    CASE WHEN regexp_matches({host_expr}, '{SECOND_LEVEL_SUFFIX_RE}')
              AND {three} != ''
         THEN {three}
         ELSE regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1) END
    """


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url_norm",
    cap: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain quota: md5-ordered deterministic rank within each
    registrable domain (ties by url then id — partitioning can never
    reorder the kept set), kept = rank ≤ cap. The shuffle is ONE hash
    exchange on the domain; at corpus scale domains are the natural
    skew axis, and the md5 rank makes the kept subset a uniform
    sample of each domain rather than a scan-order artifact."""
    domain = registrable_domain(host_of(F.col(url_col)))
    w = (
        Window.partitionBy("domain")
        .orderBy(F.md5(F.col(url_col)), F.col(url_col), F.col(id_col))
    )
    return (
        df.withColumn("domain", domain)
        .withColumn("domain_rank", F.row_number().over(w))
        .withColumn("kept", F.col("domain_rank") <= cap)
    )
