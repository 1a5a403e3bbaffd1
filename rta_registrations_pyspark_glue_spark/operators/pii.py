"""PII detection and redaction for training-data pipelines: count and
scrub email addresses, phone numbers, and IPv4 addresses from a text
column, scan-side.

Everything is built-in regexp functions (regexp_count /
regexp_replace), so detection+redaction is one codegen'd projection —
zero Python, zero shuffle, linear in corpus bytes: the only shape that
works when the corpus is 100 TB.

The patterns are deliberately restricted to constructs Java regex and
RE2 (DuckDB) evaluate identically — ASCII classes, bounded repetition,
``\\b`` word boundaries (both engines define ``\\w`` as
``[0-9A-Za-z_]`` for ASCII input), no lookaround (RE2 has none) — so
the DuckDB oracle can verify counts and the redacted text
byte-for-byte. Production pattern packs (international phone formats,
IBANs, national-ID schemes) slot into PII_PATTERNS without touching
the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Ordered pattern -> replacement-token table. Order matters for
#: redaction: emails are scrubbed before phones/IPs so the dotted local
#: parts and host labels inside an address can never be re-matched as a
#: number pattern after partial replacement.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII report + scrubbed text: id, one count per
    pattern kind, ``has_pii``, and ``redacted`` (the text with every
    match replaced by its kind token, in PII_PATTERNS order — Spark's
    regexp_replace replaces all occurrences; oracles must pass 'g').
    Row-local projection — composes with any upstream filter and keeps
    whole-stage codegen. ``select(id, redacted)`` is the scrub,
    ``filter(~has_pii)`` the strict drop-policy variant."""
    # Counts are STAGED: each kind counts over the text with all
    # earlier kinds already redacted, so n_<kind> always equals the
    # number of <KIND> tokens in the final redacted text. Counting every
    # kind on the raw text instead would claim e.g. a phone match for
    # the digit run inside an email address that redaction then
    # consumes — an impossible report (counts without matching tokens).
    stage = F.col(text_col)
    counts: dict[str, Column] = {}
    for kind, (pat, token) in PII_PATTERNS.items():
        counts[kind] = F.regexp_count(stage, F.lit(pat))
        stage = F.regexp_replace(stage, pat, token)
    total = None
    for cnt in counts.values():
        total = cnt if total is None else total + cnt
    return df.select(
        F.col(id_col),
        *[cnt.alias(f"n_{kind}") for kind, cnt in counts.items()],
        (total > 0).alias("has_pii"),
        stage.alias("redacted"),
    )
