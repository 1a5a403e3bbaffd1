"""String/regex normalization functions (SURVEY.md §2.8 F1-F9).

Column -> Column helpers mirroring the reference's cleaning expressions;
each cites the reference site it reproduces. Pure built-ins: they inline
into whole-stage codegen, so a 100 TB scan applies them at vector speed
with no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_trailing_punct(col: Column | str) -> Column:
    """Remove trailing dots/commas, e.g. maker names "MARUTI SUZUKI.,"
    (F1, etl1_clean_and_stage.py:66)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"[\.,]+$", "")


def clean_symbols(col: Column | str) -> Column:
    """Replace any char outside [A-Za-z0-9 space + - ( ) . /] with a space
    and trim (F1, etl1_clean_and_stage.py:100) — the free-text model
    description cleaner."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"[^A-Za-z0-9\s\+\-\(\)\./]", " "))


def normalize_token(col: Column | str) -> Column:
    """lower(trim(x)) — the reference's canonical key normalization before
    matching and hashing (F4, etl2_advclean_and_dimcreatin.py:157-162)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(c))


def tokenize_words(col: Column | str) -> Column:
    """Whitespace tokenization of cleaned text (F5,
    etl1_clean_and_stage.py:104)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r"\s+")
