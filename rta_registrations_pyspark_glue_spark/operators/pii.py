"""PII detection and redaction for training-data pipelines: count and
scrub email addresses, credit-card numbers, phone numbers (NANP +
international), US SSNs, and IPv4 addresses from a text column,
scan-side.

Everything is built-in regexp functions (regexp_count /
regexp_replace) plus higher-order array expressions for the Luhn
check, so detection+redaction is one codegen'd projection — zero
Python, zero shuffle, linear in corpus bytes: the only shape that
works when the corpus is 100 TB.

The patterns are deliberately restricted to constructs Java regex and
RE2 (DuckDB) evaluate identically — ASCII classes, bounded repetition,
``\\b`` word boundaries (both engines define ``\\w`` as
``[0-9A-Za-z_]`` for ASCII input), no lookaround (RE2 has none), no
backreferences (RE2 has none — which is why the credit-card pattern
allows per-position rather than uniform separators) — so the DuckDB
oracle can verify counts and the redacted text byte-for-byte. Further
pattern packs (IBANs, other national-ID schemes) slot into
PII_PATTERNS without touching the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Ordered pattern -> replacement-token table. Order matters for
#: redaction, most-specific first: emails before the number patterns so
#: an address's dotted local part / host labels can never re-match as a
#: number after partial replacement; credit cards before phones so a
#: dashed 4×4 card is claimed whole rather than piecemeal; the
#: international +CC phone before the bare NANP form it may embed
#: (``+1-415-555-0123`` contains ``415-555-0123``).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # 16-digit card in 4×4 groups, each junction independently '', ' '
    # or '-' (uniform separators would need a backreference — RE2 has
    # none). \b on both ends keeps it out of longer digit runs.
    "cc": (r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}\b", "<CC>"),
    # +CC then 2-4 / 3-4 / 3-4 digit groups: +1-415-555-0123,
    # +44 20 7946 0958, +91 98765 43210-style forms.
    "intl_phone": (r"\+\d{1,3}[ -]?\d{2,5}[ -]?\d{3,5}[ -]?\d{3,5}\b", "<PHONE>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    # US SSN (the national-ID representative): 3-2-4 dashed — disjoint
    # from NANP's 3-3-4 middle group by construction.
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def luhn_valid(number: Column) -> Column:
    """Expression-level Luhn checksum over a matched card string
    (separators stripped): from the right, every second digit doubles
    (minus 9 when >9); valid iff the sum ≡ 0 (mod 10). Pure array
    expressions — transform over the digit chars with positional
    parity, aggregate to the sum — so the check stays inside
    whole-stage codegen; the DuckDB oracle mirrors it with
    list_transform/list_sum over the same 1-based arithmetic."""
    digits = F.split(F.regexp_replace(number, r"[ -]", ""), "")
    n = F.size(digits)
    terms = F.transform(
        digits,
        lambda ch, i: F.when(
            ((n - 1 - i) % 2) == 1,
            F.when(ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9).otherwise(
                ch.cast("int") * 2
            ),
        ).otherwise(ch.cast("int")),
    )
    return F.aggregate(terms, F.lit(0), lambda acc, x: acc + x) % 10 == 0


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII report + scrubbed text: id, one count per
    pattern kind, ``n_cc_luhn_valid`` (how many of the claimed card
    matches pass the Luhn checksum — matches are positional candidates;
    the checksum separates real card numbers from arbitrary 16-digit
    runs), ``has_pii``, and ``redacted`` (the text with every match
    replaced by its kind token, in PII_PATTERNS order — Spark's
    regexp_replace replaces all occurrences; oracles must pass 'g').
    Row-local projection — composes with any upstream filter and keeps
    whole-stage codegen. ``select(id, redacted)`` is the scrub,
    ``filter(~has_pii)`` the strict drop-policy variant.

    NULL text folds to '' (zero counts, has_pii=false, redacted='') —
    the same NULL discipline as content_norm for dedup keys; without it
    NULL propagates through every count into has_pii, and the
    drop-policy ``filter(~has_pii)`` silently discards NULL-text rows."""
    # Counts are STAGED: each kind counts over the text with all
    # earlier kinds already redacted, so n_<kind> always equals the
    # number of <KIND>-family tokens in the final redacted text.
    # Counting every kind on the raw text instead would claim e.g. a
    # phone match for the digit run inside an email address that
    # redaction then consumes — an impossible report (counts without
    # matching tokens).
    stage = F.coalesce(F.col(text_col), F.lit(""))
    counts: dict[str, Column] = {}
    luhn_count = None
    for kind, (pat, token) in PII_PATTERNS.items():
        counts[kind] = F.regexp_count(stage, F.lit(pat))
        if kind == "cc":
            # Luhn runs on the same staged text the count sees, so
            # n_cc_luhn_valid <= n_cc always reconciles.
            matches = F.regexp_extract_all(stage, F.lit(pat), F.lit(0))
            luhn_count = F.size(F.filter(matches, luhn_valid))
        stage = F.regexp_replace(stage, pat, token)
    total = None
    for cnt in counts.values():
        total = cnt if total is None else total + cnt
    return df.select(
        F.col(id_col),
        *[cnt.alias(f"n_{kind}") for kind, cnt in counts.items()],
        luhn_count.alias("n_cc_luhn_valid"),
        (total > 0).alias("has_pii"),
        stage.alias("redacted"),
    )
