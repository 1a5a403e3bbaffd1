"""Text-analysis operators for large-scale training-data pipelines:
tokenization + statistics, quality scoring, language-ID heuristic,
document fingerprinting, and shingling (the substrate for the near-dup
operators in textdedup.py).

Everything is built-in array/string functions — per-row array lambdas
(transform/filter/aggregate) execute JVM-side inside codegen, so a 100 TB
corpus pays one scan and zero Python. No shuffle in any operator here;
they are all row-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small multilingual stopword marker sets for the language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "a", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


#: GPT-2-style pretokenizer pattern, restricted to constructs Java regex
#: and RE2 (DuckDB) match identically — no lookahead (RE2 lacks it), so
#: trailing-space handling is approximated by the bare whitespace branch.
#: Whitespace is an explicit character class, not ``\s``: Java's ``\s``
#: includes vertical tab (\x0B) while RE2's does not, so the shorthand
#: would diverge on \x0B-bearing text. Both engines use leftmost-first
#: alternation, so counts agree exactly (verified cross-engine on
#: contractions, unicode classes, mixed runs, and \x0B).
_WS = r" \t\n\x0B\f\r"
BPE_TOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}]+|[{_WS}]+"
)


def bpe_token_count(col: Column | str) -> Column:
    """Subword-boundary token count via the BPE-ish pretokenizer regex —
    the standard cheap estimate of LLM token cost (contractions split,
    letter runs / digit runs / punctuation runs counted separately),
    computed scan-side with one regexp_count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN))


def normalize_text(col: Column | str) -> Column:
    """Canonical text: lowercase, non-alphanumerics → space, collapsed
    whitespace, trimmed. The fingerprinting/dedup normal form."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.lower(c)
    out = F.regexp_replace(out, r"[^a-z0-9]+", " ")
    return F.trim(out)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token statistics: counts, unique ratio, average token
    length, stopword ratio — the standard quality-scoring signals."""
    t = tokens(text_col)
    df = df.withColumn("__t", t)
    n_tok = F.size("__t")
    n_uniq = F.size(F.array_distinct("__t"))
    tok_chars = F.aggregate(
        F.transform("__t", lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter("__t", lambda x: F.array_contains(stop_arr, F.lower(x))))
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        n_uniq.alias("n_unique_tokens"),
        (n_uniq.cast("double") / n_tok).alias("unique_ratio"),
        (tok_chars.cast("double") / n_tok).alias("avg_token_len"),
        (n_stop.cast("double") / n_tok).alias("stopword_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite heuristic quality score in [0,1]: rewards stopword
    presence and token diversity, penalizes extreme lengths. The weights
    are arbitrary but fixed; the point is the *shape* (filterable scalar
    per doc, computed scan-side)."""
    stats = token_stats(df, text_col, id_col)
    length_ok = (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(F.col("stopword_ratio") * 3, F.lit(0.3))
        + F.least(F.col("unique_ratio"), F.lit(0.3))
    )
    return stats.withColumn("quality_score", score)


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language ID: count marker hits per language over the
    token set; argmax with fixed precedence order (en, es, de, fr) and
    'und' (undetermined) when no marker hits at all."""
    df = df.withColumn("__t", F.transform(tokens(text_col), lambda x: F.lower(x)))
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        score_cols.append(
            F.size(F.filter("__t", lambda x: F.array_contains(arr, x))).alias(f"score_{lang}")
        )
    df = df.select(F.col(id_col), F.col(text_col), *score_cols)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANG_MARKERS:  # first-wins precedence on ties
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return df.select(
        id_col, *[f"score_{lang}" for lang in LANG_MARKERS], pred.alias("predicted_lang")
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints over the normalized text: md5 (dedup key) and
    sha256 (collision-paranoid key)."""
    norm = normalize_text(text_col)
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.sha2(norm, 256).alias("fp_sha256"),
    )


def _zip_shingles(unit_array: str, n: int, sep: str) -> str:
    """n-gram construction as arrays_zip of n shifted copies of the unit
    array, NOT as indexed access inside a transform lambda: projection
    collapse inlines column aliases into lambdas, so ``f(arr, i)`` with
    arr = split(...) would re-run the split per element — O(len²) regex
    work per row. The zip form evaluates the unit array a constant number
    of times regardless of length."""
    shifted = ", ".join(
        [unit_array]
        + [f"slice({unit_array}, {j + 1}, size({unit_array}) - {j})" for j in range(1, n)]
    )
    fields = ", ".join(f"x['{j}']" for j in range(n))
    return (
        f"transform(slice(arrays_zip({shifted}), 1, size({unit_array}) - {n - 1}), "
        f"x -> concat_ws('{sep}', {fields}))"
    )


def word_shingles(name: str, n: int = 3) -> Column:
    """Distinct word n-grams (default 3) of the text column ``name`` — the
    unit set for Jaccard/MinHash. Empty array when fewer than n tokens."""
    tok = f"split(trim({name}), '\\\\s+')"
    expr = (
        f"array_distinct(CASE WHEN size({tok}) < {n} THEN array() "
        f"ELSE {_zip_shingles(tok, n, ' ')} END)"
    )
    return F.expr(expr)


def char_shingles(name: str, n: int = 5) -> Column:
    """Distinct character n-grams (default 5) of the normalized text
    column ``name``."""
    chars = f"split({name}, '')"
    expr = (
        f"array_distinct(CASE WHEN length({name}) < {n} THEN array({name}) "
        f"ELSE {_zip_shingles(chars, n, '')} END)"
    )
    return F.expr(expr)
