"""Text-analysis operators for large-scale training-data pipelines:
tokenization + statistics, quality scoring, language-ID heuristic,
document fingerprinting, and shingling (the substrate for the near-dup
operators in textdedup.py).

Everything is built-in array/string functions — per-row array lambdas
(transform/filter/aggregate) execute JVM-side inside codegen, so a 100 TB
corpus pays one scan and zero Python. Every operator here is row-local
(zero shuffle) except ``trigram_lm_quality``, whose LM-count
aggregations shuffle a bounded (charset³) key domain and whose lookups
are broadcast joins.
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


def content_norm(col: Column | str) -> Column:
    """normalize_text with NULL folded to '' — THE text identity used by
    every content-keyed operator (fingerprints, exact dedup, incremental
    dedup). The fold matters for the join-based paths: a NULL key never
    matches in an equi-join, so a NULL-text row would silently vanish
    from an anti-join dedup instead of deterministically grouping with
    the other content-empty rows. One rule everywhere keeps the
    fingerprint store and its probes key-compatible."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(normalize_text(c), F.lit(""))


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
    """Content fingerprints over the normalized text (content_norm —
    NULL folds to ''): md5 (dedup key; key-compatible with
    textdedup.incremental_exact_dedup's probe) and sha256
    (collision-paranoid key)."""
    norm = content_norm(text_col)
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


def word_ngrams(name: str, n: int) -> Column:
    """ALL word n-gram occurrences (positions, not the distinct set) of
    the text column ``name`` — the unit for repetition counting, where
    occurrence multiplicity is the whole point (word_shingles dedups for
    set-similarity; this keeps every position). Empty array when fewer
    than n tokens."""
    tok = f"split(trim({name}), '\\\\s+')"
    if n == 1:
        return F.expr(tok)
    return F.expr(
        f"CASE WHEN size({tok}) < {n} THEN array() "
        f"ELSE {_zip_shingles(tok, n, ' ')} END"
    )


#: Gopher-style repetition-filter thresholds (Rae et al. 2021, table A1
#: flavor): a doc is kept when every repetition fraction is at or below
#: its cap. Fixed constants so the keep flag is reproducible.
REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "top_bigram_frac": 0.20,
    "dup_trigram_frac": 0.30,
    "top_word_frac": 0.30,
}

#: Below this many tokens a document is too short for repetition to be
#: judged at all — the caps pass vacuously (keep=True). Without the
#: gate, top_word_frac alone (1/n for an all-distinct doc) condemns
#: every <=3-token document as "repetitive"; short/empty docs are the
#: length filters' jurisdiction (quality_score), not this one's. 4 is
#: the smallest n where an all-distinct doc clears the 0.30 word cap.
MIN_TOKENS_FOR_REPETITION = 4


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality filters, per document:

    - ``dup_line_frac``   — fraction of '\\n'-separated lines that are
      repeats of an earlier line (row-local array arithmetic, no shuffle);
    - ``top_word_frac``   — occurrences of the most frequent token over
      total tokens;
    - ``top_bigram_frac`` — characters covered by occurrences of the most
      frequent word 2-gram over total normalized characters, 0 unless
      that 2-gram actually repeats (a count-1 maximum is length, not
      repetition, and would condemn every short document);
    - ``dup_trigram_frac``— characters covered by word 3-grams occurring
      more than once over total normalized characters (overlap-blind:
      occurrences are counted independently, so the bound can exceed 1
      on pathologically repetitive text — the threshold comparison is
      what matters);
    - ``keep``            — True iff every metric is at or below its
      REPETITION_THRESHOLDS cap, or the doc is shorter than
      MIN_TOKENS_FOR_REPETITION tokens (too short to judge repetition —
      vacuously kept; ``n_tokens`` is emitted so callers can chain
      their own length filter).

    Token/n-gram metrics run over normalize_text; line splitting runs on
    the raw text. Plan shape at scale: one tagged explode of 1/2/3-gram
    positions (~3× token volume), a (doc, n, gram) partial-aggregated
    count, a per-doc aggregate, and one join back to the row-local stats
    — grams never leave their doc's keyspace, so the shuffles are plain
    hash-partitioned aggs with map-side combine, no skew beyond document
    length itself."""
    norm = normalize_text(text_col)
    base = df.select(
        F.col(id_col),
        F.col(text_col).alias("__raw"),
        norm.alias("__norm"),
    )
    lines = F.split("__raw", "\n", -1)
    n_lines = F.size(lines)
    dup_line_frac = F.when(n_lines > 0, (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines).otherwise(F.lit(0.0))
    n_tokens = F.when(F.col("__norm") == "", F.lit(0)).otherwise(
        F.size(F.split("__norm", " ", -1))
    )
    stats = base.select(
        F.col(id_col),
        F.length("__norm").alias("__n_chars"),
        n_tokens.alias("n_tokens"),
        n_lines.alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
    )
    grams = None
    for n in (1, 2, 3):
        g = base.select(
            F.col(id_col),
            F.lit(n).alias("__n"),
            F.explode(word_ngrams("__norm", n)).alias("__g"),
        )
        grams = g if grams is None else grams.unionByName(g)
    # The empty string is not a token: split('') yields [''] in both
    # engines, and counting it would give empty docs top_word_frac=1.0.
    counts = (
        grams.filter(F.col("__g") != "")
        .groupBy(id_col, "__n", "__g")
        .agg(F.count("*").alias("__cnt"))
    )
    gram_chars = F.col("__cnt") * F.length("__g")
    per_doc = counts.groupBy(id_col).agg(
        F.max(F.when(F.col("__n") == 1, F.col("__cnt"))).alias("__top_word_cnt"),
        # The Gopher metric is "chars covered by the MOST FREQUENT
        # 2-gram": pick the repeating bigram by max count — via a
        # lexicographic struct max, ties broken toward max char
        # coverage (deterministic; both engines order structs
        # field-by-field) — and report ITS char coverage, not the max
        # coverage over all repeating bigrams (which could pick a
        # longer-but-rarer gram).
        F.max(
            F.when(
                (F.col("__n") == 2) & (F.col("__cnt") > 1),
                F.struct(F.col("__cnt").alias("c"), gram_chars.alias("ch")),
            )
        ).getField("ch").alias("__top_bigram_chars"),
        F.sum(
            F.when((F.col("__n") == 3) & (F.col("__cnt") > 1), gram_chars)
        ).alias("__dup_trigram_chars"),
    )
    joined = stats.join(per_doc, id_col, "left")

    def _frac(num: Column, den: Column) -> Column:
        return F.when(den > 0, F.coalesce(num, F.lit(0)).cast("double") / den).otherwise(
            F.lit(0.0)
        )

    out = joined.select(
        F.col(id_col),
        "n_tokens",
        "n_lines",
        "dup_line_frac",
        _frac(F.col("__top_word_cnt"), F.col("n_tokens")).alias("top_word_frac"),
        _frac(F.col("__top_bigram_chars"), F.col("__n_chars")).alias("top_bigram_frac"),
        _frac(F.col("__dup_trigram_chars"), F.col("__n_chars")).alias("dup_trigram_frac"),
    )
    keep = F.lit(True)
    for metric, cap in REPETITION_THRESHOLDS.items():
        keep = keep & (F.col(metric) <= cap)
    keep = (F.col("n_tokens") < MIN_TOKENS_FOR_REPETITION) | keep
    return out.withColumn("keep", keep)


def doc_token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, token, cnt): per-document occurrence counts of normalized
    tokens — THE tokenization pass. vocabulary and tfidf_top_terms both
    derive from this frame; callers computing several lexical products
    should build it once (persist it) and pass it via their ``counts``
    parameter instead of paying one corpus scan + explode per product."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ", -1)).alias("token"),
    ).filter(F.col("token") != "")
    return toks.groupBy(id_col, "token").agg(F.count("*").alias("cnt"))


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Corpus vocabulary: one row per distinct normalized token with
    total occurrences (``tf``) and document frequency (``df_docs``).
    Plan shape: explode → two-level hash aggregate (count + distinct-doc
    count via the (token, doc) pre-aggregate), all map-side combinable —
    the canonical wordcount that survives any corpus size."""
    if counts is None:
        counts = doc_token_counts(df, text_col, id_col)
    return counts.groupBy("token").agg(
        F.sum("cnt").alias("tf"), F.count("*").alias("df_docs")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Top-``top_n`` characteristic terms per document scored by
    tf·(N/df) — term frequency times the RAW inverse document frequency
    ratio, not its logarithm. The ratio keeps the score inside exactly-
    specified IEEE arithmetic (integer products < 2^53, one correctly-
    rounded division), so scores and hence rankings are bit-identical
    across engines; a log-idf's transcendental differs in the last ulp
    between libm implementations, which can flip near-tie rankings. Both
    weightings are monotone in 1/df for fixed tf and standard variants.
    Ranking total order: (score DESC, token ASC). One explode + agg for
    per-doc counts (shared with vocabulary via ``counts`` — the df/tf
    aggregate derives from the same frame, so the corpus is tokenized
    once, not twice), an equi-join on token against the vocabulary, and
    a per-doc window — all key-partitioned, no broadcast of the
    (possibly huge) vocabulary needed."""
    from pyspark.sql import Window

    if counts is None:
        counts = doc_token_counts(df, text_col, id_col)
    vocab = vocabulary(df, text_col, id_col, counts=counts).select("token", "df_docs")
    n_docs = df.select(F.count("*").alias("__n_docs"))
    scored = (
        counts.join(vocab, "token")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            (F.col("cnt") * F.col("__n_docs")).cast("double") / F.col("df_docs"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(id_col, "token", "cnt", "df_docs", "score", "rank")
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


def trigram_lm_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 10,
    train_buckets: int = 8,
    scale: int = 1_000_000_000,
    keep_threshold: float = 0.01,
) -> DataFrame:
    """CCNet-style language-model quality filter, Spark-first and
    EXACTLY mirrorable in SQL: a character-trigram LM with add-one
    smoothing is trained on the deterministic train split
    (``id % train_mod < train_buckets`` — leakage-aware: held-out docs
    are scored by a model that never saw them), and every document is
    scored by its mean conditional trigram probability. Low scores =
    text unlike the corpus (boilerplate, mojibake, wrong language) —
    the classic perplexity filter with probabilities in place of
    log-space.

    Numeric contract (what makes the DuckDB oracle hash-exact): no
    transcendentals and no cross-row double sums. Each trigram's
    smoothed probability (c3+1)/(c2+V) is one correctly-rounded double
    division, scaled by ``scale`` and floored to int64; per-document
    aggregation then happens in ORDER-INDEPENDENT integer arithmetic,
    and only the final mean is a double division of two exact
    integers.

    100 TB design: the LM table is bounded by the DISTINCT trigram
    count — charset³, e.g. ≲1M entries for text — independent of
    corpus size, so both probability lookups are broadcast hash joins
    and the whole operator is two scans (count + score), one small
    shuffle each. The smoothing vocabulary V rides a 1-row broadcast
    join (no driver action, no collect)."""
    from rta_registrations_pyspark_glue_spark.caching import tracked_persist

    tri_arr = (
        f"transform(sequence(1, length({text_col}) - 2), "
        f"i -> substring({text_col}, i, 3))"
    )
    # The exploded trigram stream feeds FOUR consumers (trigram counts,
    # context counts, smoothing vocabulary, scoring) — persist it so the
    # scan+explode runs once, not four times. At extreme scale (stream
    # ≈ 3× corpus chars) recomputation can beat spilling; the persist is
    # released by caching.release_tracked like every operator-internal
    # cache.
    tris = tracked_persist(
        df.where(F.length(text_col) >= 3)
        .select(id_col, F.explode(F.expr(tri_arr)).alias("tri"))
    )
    train = tris.where(F.col(id_col) % train_mod < train_buckets)
    tri_counts = train.groupBy("tri").agg(F.count(F.lit(1)).alias("c3"))
    # context counts and the smoothing vocabulary are exact aggregates
    # OF tri_counts (Σ c3 over the 2-char prefix; distinct third chars)
    # — derive them from the small aggregated table instead of paying
    # two more full-stream passes over the trigram explode
    ctx_counts = (
        tri_counts.groupBy(F.substring("tri", 1, 2).alias("ctx"))
        .agg(F.sum("c3").alias("c2"))
    )
    vocab = tri_counts.agg(
        F.countDistinct(F.substring("tri", 3, 1)).alias("v_chars")
    ).withColumn("one", F.lit(1))
    scored = (
        tris.withColumn("one", F.lit(1))
        .join(F.broadcast(tri_counts), "tri", "left")
        .join(
            F.broadcast(ctx_counts),
            F.substring("tri", 1, 2) == F.col("ctx"),
            "left",
        )
        .join(F.broadcast(vocab), "one")
        .select(
            id_col,
            F.floor(
                (F.coalesce(F.col("c3"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("c2"), F.lit(0)) + F.col("v_chars")).cast(
                    "double"
                )
                * F.lit(float(scale))
            ).alias("scaled"),
            F.when(F.col("c3").isNull(), 1).otherwise(0).alias("unseen"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.sum("scaled").alias("s"),
        F.sum("unseen").alias("n_unseen"),
    )
    mean = F.col("s").cast("double") / (
        F.col("n_trigrams") * F.lit(scale)
    ).cast("double")
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            mean.alias("lm_mean_prob"),
            F.coalesce(F.col("n_unseen"), F.lit(0)).alias("n_unseen"),
            F.coalesce(mean >= keep_threshold, F.lit(False)).alias("lm_keep"),
        )
    )


#: Ordered literal mojibake repairs (UTF-8 read as latin-1/cp1252, the
#: dominant real-world corruption): longest-first so compound sequences
#: win. Interpolated into the DuckDB oracle so the two engines cannot
#: drift. Public mapping — these are the standard ftfy-style pairs.
MOJIBAKE_REPAIRS: tuple[tuple[str, str], ...] = (
    ("\u00e2\u20ac\u2122", "'"),
    ("\u00e2\u20ac\u0153", '"'),
    ("\u00e2\u20ac\u009d", '"'),
    ("\u00e2\u20ac\u201c", "-"),
    ("\u00e2\u20ac\u201d", "--"),
    ("\u00e2\u20ac\u00a6", "..."),
    ("\u00c3\u00a9", "\u00e9"),
    ("\u00c3\u00a8", "\u00e8"),
    ("\u00c3\u00bc", "\u00fc"),
    ("\u00c3\u00b6", "\u00f6"),
    ("\u00c3\u00a4", "\u00e4"),
    ("\u00c3\u00b1", "\u00f1"),
    ("\u00c3\u00a7", "\u00e7"),
    ("\u00c3\u00a1", "\u00e1"),
    ("\u00c3\u00b3", "\u00f3"),
    ("\u00c3\u00ba", "\u00fa"),
)

#: Regex fragments shared verbatim by Spark (Java regex) and DuckDB
#: (RE2) — the \x{...} hex-codepoint syntax is the portable subset.
ZERO_WIDTH_RE = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"
CONTROL_RE = "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}]"


def fix_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """ftfy-lite text repair, pure codegen expressions (zero UDF, zero
    shuffle): ordered literal mojibake repairs (MOJIBAKE_REPAIRS),
    CRLF/CR \u2192 LF, NBSP \u2192 space, zero-width character removal, C0/DEL
    control stripping (tab/newline preserved), and 3+-newline collapse
    \u2014 in that fixed order, which is part of the contract (repairs see
    the raw bytes; the newline collapse sees post-CR text). Emits the
    repaired text plus a changed flag and the net character delta."""
    col = F.col(text_col)
    c = col
    for bad, good in MOJIBAKE_REPAIRS:
        c = F.replace(c, F.lit(bad), F.lit(good))
    c = F.replace(c, F.lit("\r\n"), F.lit("\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\n"))
    c = F.replace(c, F.lit("\u00a0"), F.lit(" "))
    c = F.regexp_replace(c, ZERO_WIDTH_RE, "")
    c = F.regexp_replace(c, CONTROL_RE, "")
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    return df.select(
        id_col,
        c.alias("fixed_text"),
        (c != col).alias("fix_changed"),
        (F.length(col) - F.length(c)).alias("n_chars_delta"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-corpus chunking: overlapping token windows, stride =
    ``chunk_tokens - overlap``; chunk ``i`` covers tokens
    ``[i*stride, i*stride + chunk_tokens)`` and the count of chunks is
    ``ceil(max(n - overlap, 1) / stride)`` (a short document yields
    exactly one chunk; the final chunk may be short). Pure codegen —
    one split, one sequence/transform explode, integer arithmetic only
    (no float ceil), so the DuckDB oracle mirrors it exactly."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = (F.greatest(n - overlap, F.lit(1)) + (stride - 1)) / stride
    n_chunks = F.floor(n_chunks).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("idx"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    df = df.select(id_col, F.explode(chunks).alias("c"))
    return df.select(
        id_col,
        F.col("c.idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.col("c.ctoks")).alias("chunk_text"),
        F.size("c.ctoks").alias("n_chunk_tokens"),
    )
