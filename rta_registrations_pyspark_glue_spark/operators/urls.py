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

import os
from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: second-level public suffixes under which the registrable domain is
#: three labels, not two — the r9 built-in subset, kept ONLY as the
#: no-data fallback when the vendored PSL file is absent
SECOND_LEVEL_SUFFIX_RE = r"(\.|^)(co|com|org|gov|ac|net)\.(uk|au|jp|br|in|nz)$"

#: vendored subset of the Mozilla Public Suffix List in the upstream
#: publicsuffix.org format (exact / "*." wildcard / "!" exception
#: rules) — production swaps in the full file, same parser
_PSL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_subset.dat",
)


@dataclass(frozen=True)
class PslRules:
    """Parsed public-suffix rules, bucketed by shape so the lookup is
    pure InSet membership (the rule shapes the vendored ICANN subset
    uses: 2- and 3-label exact rules, single-label wildcards, 2-label
    exceptions). Lists are sorted for deterministic plans/SQL."""

    exact2: tuple[str, ...]
    exact3: tuple[str, ...]
    wildcard_tlds: tuple[str, ...]
    exceptions: tuple[str, ...]


@lru_cache(maxsize=4)
def load_psl(path: str | None = None) -> PslRules | None:
    """Parse a publicsuffix.org-format rules file (comments '//',
    blank lines, exact / '*.' wildcard / '!' exception rules). Returns
    None when the file is absent — callers fall back to the built-in
    regex subset, so a missing data file degrades, never breaks."""
    p = path or _PSL_PATH
    if not os.path.isfile(p):
        return None
    exact2, exact3, wild, exc = [], [], [], []
    with open(p, encoding="utf-8") as fh:
        for line in fh:
            rule = line.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                exc.append(rule[1:])
            elif rule.startswith("*."):
                wild.append(rule[2:])
            else:
                n = rule.count(".") + 1
                if n == 2:
                    exact2.append(rule)
                elif n == 3:
                    exact3.append(rule)
                # 1-label exact rules are the implicit default ("*");
                # >3-label rules don't occur in the vendored subset
    return PslRules(
        tuple(sorted(exact2)),
        tuple(sorted(exact3)),
        tuple(sorted(wild)),
        tuple(sorted(exc)),
    )


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


def registrable_domain(host: Column, psl_path: str | None = None) -> Column:
    """eTLD+1 against the vendored PSL (publicsuffix.org algorithm over
    the subset's rule shapes, longest rule first): exception rules beat
    wildcards; 3-label exact suffixes register at the fourth label;
    2-label exact suffixes and wildcard TLDs at the third; everything
    else at the second. A host that IS a bare suffix has no extra label
    — fall back to its own two labels. Pure Column expressions: the
    rule sets become InSet predicates (whole-stage codegen; no UDF, no
    join, no shuffle — at corpus scale this runs on every row of the
    scan). Falls back to the r9 built-in regex subset when the PSL data
    file is absent."""
    rules = load_psl(psl_path)
    if rules is None:
        return _registrable_domain_regex(host)
    ext2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    ext3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    ext4 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+\.[^.]+)$", 1)
    tld = F.regexp_extract(host, r"([^.]+)$", 1)
    pick3 = F.when(ext3 != "", ext3).otherwise(ext2)
    pick4 = F.when(ext4 != "", ext4).otherwise(ext3)

    def member(col: Column, vals: tuple[str, ...]) -> Column:
        return col.isin(list(vals)) if vals else F.lit(False)

    return (
        F.when(member(ext2, rules.exceptions), ext2)
        .when(member(ext3, rules.exact3), pick4)
        .when(member(ext2, rules.exact2), pick3)
        .when(member(tld, rules.wildcard_tlds), pick3)
        .otherwise(ext2)
    )


def _registrable_domain_regex(host: Column) -> Column:
    """The r9 built-in approximation (6 cartesian second-level
    suffixes) — the documented no-data fallback for registrable_domain."""
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return F.when(
        host.rlike(SECOND_LEVEL_SUFFIX_RE) & (three != ""), three
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def registrable_domain_sql(host_expr: str, psl_path: str | None = None) -> str:
    """DuckDB mirror of registrable_domain: the literal IN lists are
    generated from the SAME load_psl() parse, so the engines cannot
    disagree on the rule set."""
    rules = load_psl(psl_path)
    h = host_expr
    ext2 = f"regexp_extract({h}, '([^.]+\\.[^.]+)$', 1)"
    if rules is None:
        three = f"regexp_extract({h}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
        return f"""
        CASE WHEN regexp_matches({h}, '{SECOND_LEVEL_SUFFIX_RE}')
                  AND {three} != ''
             THEN {three}
             ELSE {ext2} END
        """
    ext3 = f"regexp_extract({h}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
    ext4 = f"regexp_extract({h}, '([^.]+\\.[^.]+\\.[^.]+\\.[^.]+)$', 1)"
    tld = f"regexp_extract({h}, '([^.]+)$', 1)"
    pick3 = f"CASE WHEN {ext3} != '' THEN {ext3} ELSE {ext2} END"
    pick4 = f"CASE WHEN {ext4} != '' THEN {ext4} ELSE {ext3} END"

    def inlist(vals: tuple[str, ...]) -> str:
        # '.' can never equal an extracted label group — a safe
        # never-matching literal for an empty rule bucket
        return ", ".join(f"'{v}'" for v in vals) if vals else "'.'"

    return f"""
    CASE WHEN {ext2} IN ({inlist(rules.exceptions)}) THEN {ext2}
         WHEN {ext3} IN ({inlist(rules.exact3)}) THEN {pick4}
         WHEN {ext2} IN ({inlist(rules.exact2)}) THEN {pick3}
         WHEN {tld} IN ({inlist(rules.wildcard_tlds)}) THEN {pick3}
         ELSE {ext2} END
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
