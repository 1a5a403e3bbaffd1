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

#: vendored FULL Mozilla Public Suffix List (ICANN + PRIVATE sections,
#: ~8k non-redundant rules) in the upstream publicsuffix.org format
#: (exact / "*." wildcard / "!" exception rules); refresh is a data
#: change — overwrite with a newer upstream copy, same parser
_PSL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


@dataclass(frozen=True)
class PslRules:
    """Parsed public-suffix rules, bucketed BY LABEL COUNT so the
    lookup compiles to one InSet membership test per (shape, length)
    bucket — the full upstream list has exact rules of 2-5 labels,
    wildcard bases of 1-4 labels, and exceptions of 2-3 labels, and
    the buckets are discovered from the data, not hard-coded. Values
    are sorted for deterministic plans/SQL."""

    #: exact rule of n labels -> registrable domain has n+1 labels
    exact: dict[int, tuple[str, ...]]
    #: "*.base" with an n-label base -> any (n+1)-label host ending in
    #: base is itself a public suffix -> registrable has n+2 labels
    wildcards: dict[int, tuple[str, ...]]
    #: "!rule" of n labels -> the rule ITSELF is registrable
    exceptions: dict[int, tuple[str, ...]]


@lru_cache(maxsize=4)
def load_psl(path: str | None = None) -> PslRules | None:
    """Parse a publicsuffix.org-format rules file (comments '//',
    blank lines, exact / '*.' wildcard / '!' exception rules). Returns
    None when the file is absent — callers fall back to the built-in
    regex subset, so a missing data file degrades, never breaks.

    1-label exact rules (every plain TLD and gTLD, ~1500 of them) are
    dropped at parse time: they register at the second label, which is
    exactly what the list's implicit default rule ("*") does, so they
    are redundant with the CASE's ELSE branch and would only bloat the
    InSet tables. Unicode (IDN) rules are kept verbatim and match
    hosts given in the same Unicode form; punycode (xn--) hosts only
    match where the upstream list itself carries punycode rules —
    punycode<->unicode normalization is the caller's canonicalization
    step, not this lookup's."""
    p = path or _PSL_PATH
    if not os.path.isfile(p):
        return None
    exact: dict[int, list] = {}
    wild: dict[int, list] = {}
    exc: dict[int, list] = {}
    with open(p, encoding="utf-8") as fh:
        for line in fh:
            rule = line.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            if rule.startswith("!"):
                body = rule[1:]
                exc.setdefault(body.count(".") + 1, []).append(body)
            elif rule.startswith("*."):
                base = rule[2:]
                wild.setdefault(base.count(".") + 1, []).append(base)
            else:
                n = rule.count(".") + 1
                if n > 1:
                    exact.setdefault(n, []).append(rule)
    freeze = lambda d: {k: tuple(sorted(v)) for k, v in sorted(d.items())}  # noqa: E731
    return PslRules(freeze(exact), freeze(wild), freeze(exc))


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


def _label_pattern(n: int) -> str:
    """Regex capturing the last ``n`` dot-separated labels of a host
    (Java-regex ∩ RE2: non-capturing repetition, no lookarounds)."""
    if n == 1:
        return "([^.]+)$"
    return "([^.]+(?:\\.[^.]+){" + str(n - 1) + "})$"


def _psl_branches(rules: PslRules):
    """The publicsuffix.org precedence as an ordered branch list shared
    by the Spark and DuckDB code generators: each entry is
    (shape, rule_label_count, registrable_label_count) where shape is
    'exception' | 'exact' | 'wildcard'. Exception rules beat everything
    (longest first — the rule itself is registrable); then the longest
    matching rule wins, with exact-n and wildcard-base-(n-1) rules both
    having effective length n (a same-length tie yields the same
    registrable domain either way, so intra-length order is free)."""
    out = []
    for n in sorted(rules.exceptions, reverse=True):
        out.append(("exception", n, n))
    max_len = max(
        [n for n in rules.exact]
        + [b + 1 for b in rules.wildcards]
        + [1]
    )
    for ln in range(max_len, 1, -1):
        if ln in rules.exact:
            out.append(("exact", ln, ln + 1))
        if ln - 1 in rules.wildcards:
            out.append(("wildcard", ln - 1, ln + 1))
    return out


def registrable_domain(host: Column, psl_path: str | None = None) -> Column:
    """eTLD+1 against the vendored FULL Public Suffix List
    (publicsuffix.org algorithm, every upstream rule shape): exception
    rules beat everything, then the longest matching rule wins — an
    n-label exact suffix registers at label n+1, a wildcard with an
    n-label base at label n+2 (and only when the wildcard label is
    actually present: a host that IS the bare base falls through to
    shorter rules), everything else at the second label. A host that
    IS a public suffix has no extra label — fall back to the suffix
    itself (best effort, same contract as r10). Pure Column
    expressions: each (shape, length) rule bucket becomes ONE InSet
    predicate over the extracted last-n-labels string (whole-stage
    codegen; no UDF, no join, no shuffle — at corpus scale this runs
    on every row of the scan). Falls back to the r9 built-in regex
    subset when the PSL data file is absent."""
    rules = load_psl(psl_path)
    if rules is None:
        return _registrable_domain_regex(host)
    branches = _psl_branches(rules)
    need = max(reg for _, _, reg in branches) if branches else 2
    ext = {
        n: F.regexp_extract(host, _label_pattern(n), 1)
        for n in range(1, need + 1)
    }

    def member(col: Column, vals: tuple[str, ...]) -> Column:
        return col.isin(list(vals)) if vals else F.lit(False)

    def pick(n: int) -> Column:
        return F.when(ext[n] != "", ext[n]).otherwise(ext[n - 1])

    buckets = {"exception": rules.exceptions, "exact": rules.exact,
               "wildcard": rules.wildcards}
    result = None
    for shape, n, reg in branches:
        if shape == "exception":
            cond, val = member(ext[n], buckets[shape][n]), ext[n]
        elif shape == "exact":
            cond, val = member(ext[n], buckets[shape][n]), pick(reg)
        else:  # wildcard: the wildcard label itself must be present
            cond = member(ext[n], buckets[shape][n]) & (ext[n + 1] != "")
            val = pick(reg)
        result = F.when(cond, val) if result is None else result.when(cond, val)
    return ext[2] if result is None else result.otherwise(ext[2])


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
    branches = _psl_branches(rules)
    need = max(reg for _, _, reg in branches) if branches else 2
    ext = {
        n: f"regexp_extract({h}, '{_label_pattern(n)}', 1)"
        for n in range(1, need + 1)
    }

    def inlist(vals: tuple[str, ...]) -> str:
        # '.' can never equal an extracted label group — a safe
        # never-matching literal for an empty rule bucket
        return ", ".join(f"'{v}'" for v in vals) if vals else "'.'"

    def pick(n: int) -> str:
        return f"CASE WHEN {ext[n]} != '' THEN {ext[n]} ELSE {ext[n-1]} END"

    buckets = {"exception": rules.exceptions, "exact": rules.exact,
               "wildcard": rules.wildcards}
    whens = []
    for shape, n, reg in branches:
        vals = inlist(buckets[shape][n])
        if shape == "exception":
            whens.append(f"WHEN {ext[n]} IN ({vals}) THEN {ext[n]}")
        elif shape == "exact":
            whens.append(f"WHEN {ext[n]} IN ({vals}) THEN {pick(reg)}")
        else:
            whens.append(
                f"WHEN {ext[n]} IN ({vals}) AND {ext[n+1]} != '' "
                f"THEN {pick(reg)}"
            )
    if not whens:
        return ext[2]
    return "\n    CASE " + "\n         ".join(whens) + f"\n         ELSE {ext[2]} END\n    "


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
