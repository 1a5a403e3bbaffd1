"""Text-analysis and deduplication queries (BASELINE.json north-star:
LLM-data-pipeline operators) with DuckDB oracles.

Near-dup inputs are synthesized deterministically: every 5th document
gets a copy (id+1,000,000) with every 7th token dropped — a realistic
near-duplicate; every 10th gets an exact copy (id+2,000,000). Both
corpora are reproduced identically in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.caching import tracked_persist
from rta_registrations_pyspark_glue_spark.operators import (
    bpe,
    curation,
    graph,
    packing,
    pii,
    sampling,
    sketches,
    text,
    textdedup,
)
from rta_registrations_pyspark_glue_spark.plans.planmemo import plan_memo
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

# Normalized text in DuckDB — must match operators.text.normalize_text.
SQL_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


def _drop_every_kth_token(text_col: str, k: int) -> "F.Column":
    """Text with every k-th token removed — the deterministic
    perturbation both engines reproduce (the near-dup corpus uses k=7,
    the incremental-dedup batch k=5). Spark filter lambda index is
    0-based; DuckDB's is 1-based — hence i+1 here and bare i in
    _drop_every_kth_token_sql, the one subtle correspondence kept in
    exactly one place."""
    toks = F.split(F.trim(text_col), r"\s+")
    return F.concat_ws(" ", F.filter(toks, lambda x, i: (i + 1) % k != 0))


def _drop_every_kth_token_sql(k: int) -> str:
    """DuckDB mirror of _drop_every_kth_token over a ``text`` column."""
    return (
        r"array_to_string(list_filter(string_split_regex(trim(text), '\s+'),"
        rf" (x, i) -> i % {k} != 0), ' ')"
    )


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ token-dropped copies of every 5th doc."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    perturbed = _drop_every_kth_token("text", 7)
    copies = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), perturbed.alias("text"))
    )
    # The docs parquet is a single small file → 1-2 input partitions; the
    # shingle/MinHash work downstream is CPU-bound per row, so spread it
    # across the cores (a 6k-row shuffle is free). r13: widen-only guard
    # instead of an unconditional repartition — the old form would have
    # COALESCED an already-wide production scan down to the core count.
    from rta_registrations_pyspark_glue_spark.operators.spread import spread_rows

    return spread_rows(docs.unionByName(copies))


SQL_NEAR_CORPUS = f"""
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               {_drop_every_kth_token_sql(7)} AS text
        FROM documents WHERE doc_id % 5 = 0
"""


# Interpolated from the operator's own constant (quote-doubled for the
# SQL literal) so the two engines can never drift apart silently.
_BPE_SQL_LIT = "'" + text.BPE_TOKEN_PATTERN.replace("'", "''") + "'"


def _quality_sql(t: str) -> str:
    """The quality_score formula over a token-array SQL identifier —
    ONE fragment shared by the text_metrics and packed_sequences
    oracles, so the 0.4/0.3/0.3 weights and the exact double-arithmetic
    shape (division before the *3, matching operators/text.quality_score
    bit-for-bit) can never drift between the two mirrors."""
    return f"""(CASE WHEN len({t}) >= 5 AND len({t}) <= 100000 THEN 0.4 ELSE 0.0 END
            + least(CAST(len(list_filter({t}, x -> lower(x) IN
                  ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
                  / len({t}) * 3, 0.3)
            + least(CAST(len(list_distinct({t})) AS DOUBLE) / len({t}), 0.3))"""


def _fix_sql(col: str) -> str:
    """DuckDB mirror of text.fix_text over column ``col`` — built from
    the operator's own MOJIBAKE_REPAIRS / regex constants so the two
    engines cannot drift. chr() builds the invisible characters the
    repair chain must consume (CR, NBSP, zero-width, BEL)."""
    e = col
    for bad, good in text.MOJIBAKE_REPAIRS:
        b, g = bad.replace("'", "''"), good.replace("'", "''")
        e = f"replace({e}, '{b}', '{g}')"
    e = f"replace({e}, chr(13)||chr(10), chr(10))"
    e = f"replace({e}, chr(13), chr(10))"
    e = f"replace({e}, chr(160), ' ')"
    e = f"regexp_replace({e}, '{text.ZERO_WIDTH_RE}', '', 'g')"
    e = f"regexp_replace({e}, '{text.CONTROL_RE}', '', 'g')"
    e = f"regexp_replace({e}, '\\n{{3,}}', chr(10)||chr(10), 'g')"
    return e


#: Deterministic corruption injected in BOTH engines for the
#: text_metrics 'fix' rows (the pii_scrub pattern): every 7th doc gets
#: mojibake, 11th CR/CRLF, 13th zero-width + BEL, 19th a newline run,
#: 23rd an NBSP; a doc can carry several.
_FIX_CORRUPT_SQL = """
        SELECT doc_id, text
            || CASE WHEN doc_id % 7 = 0 THEN ' it'||chr(226)||chr(8364)||chr(8482)||'s a caf'||chr(195)||chr(169)||'' ELSE '' END
            || CASE WHEN doc_id % 11 = 0 THEN chr(13)||chr(10)||'line2'||chr(13)||'line3' ELSE '' END
            || CASE WHEN doc_id % 13 = 0 THEN ' ab'||chr(8203)||'c'||chr(65279)||chr(7) ELSE '' END
            || CASE WHEN doc_id % 19 = 0 THEN repeat(chr(10), 5)||'end' ELSE '' END
            || CASE WHEN doc_id % 23 = 0 THEN ' x'||chr(160)||'y' ELSE '' END
            AS t
        FROM documents
"""


@register(
    "text_metrics",
    oracle=rf"""
    WITH toks AS (
        SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS t
        FROM documents
    ), stats AS (
        SELECT doc_id,
               length(text)::INT AS n_chars,
               len(t)::INT AS n_tokens,
               len(regexp_extract_all(text,
                   {_BPE_SQL_LIT}
                   ))::INT AS n_bpe_tokens,
               len(list_distinct(t))::INT AS n_unique_tokens,
               CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS unique_ratio,
               CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE) / len(t) AS avg_token_len,
               CAST(len(list_filter(t, x -> lower(x) IN
                    ('the','a','an','and','or','of','to','in','is','it'))) AS DOUBLE)
                   / len(t) AS stopword_ratio
        FROM toks
    ), lang_scores AS (
        SELECT doc_id,
               len(list_filter(lt, x -> x IN ('the','and','of','a','to')))::INT AS score_en,
               len(list_filter(lt, x -> x IN ('el','la','de','los','que')))::INT AS score_es,
               len(list_filter(lt, x -> x IN ('der','die','und','das','ist')))::INT AS score_de,
               len(list_filter(lt, x -> x IN ('le','la','et','les','des')))::INT AS score_fr
        FROM (SELECT doc_id, list_transform(t, x -> lower(x)) AS lt FROM toks)
    )
    SELECT 'stats' AS kind, doc_id, n_chars, n_tokens, n_bpe_tokens,
           n_unique_tokens, unique_ratio, avg_token_len, stopword_ratio
    FROM stats
    UNION ALL BY NAME
    SELECT 'quality' AS kind, doc_id,
           {_quality_sql("t")} AS quality_score
    FROM toks
    UNION ALL BY NAME
    SELECT 'lang' AS kind, doc_id, score_en, score_es, score_de, score_fr,
           CASE WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
                WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
                WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
                WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM lang_scores
    UNION ALL BY NAME
    SELECT 'lm' AS kind, doc_id, n_trigrams, lm_mean_prob, n_unseen, lm_keep
    FROM (
        WITH tris AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, length(text) - 1),
                          i -> substr(text, CAST(i AS INT), 3))) AS tri
            FROM documents WHERE length(text) >= 3
        ), train AS (
            SELECT * FROM tris WHERE doc_id % 10 < 8
        ), tc AS (
            SELECT tri, COUNT(*) AS c3 FROM train GROUP BY tri
        ), cc AS (
            SELECT substr(tri, 1, 2) AS ctx, COUNT(*) AS c2
            FROM train GROUP BY substr(tri, 1, 2)
        ), vv AS (
            SELECT COUNT(DISTINCT substr(tri, 3, 1)) AS v_chars FROM train
        ), scored AS (
            SELECT t.doc_id,
                   CAST(floor(CAST(COALESCE(tc.c3, 0) + 1 AS DOUBLE)
                        / CAST(COALESCE(cc.c2, 0) + vv.v_chars AS DOUBLE)
                        * 1000000000) AS BIGINT) AS scaled,
                   CASE WHEN tc.tri IS NULL THEN 1 ELSE 0 END AS unseen
            FROM tris t
            LEFT JOIN tc ON t.tri = tc.tri
            LEFT JOIN cc ON substr(t.tri, 1, 2) = cc.ctx
            CROSS JOIN vv
        ), agg AS (
            SELECT doc_id, COUNT(*) AS n_trigrams, SUM(scaled) AS s,
                   SUM(unseen) AS n_unseen
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(a.n_trigrams, 0) AS BIGINT) AS n_trigrams,
               CAST(a.s AS DOUBLE)
                   / CAST(a.n_trigrams * 1000000000 AS DOUBLE) AS lm_mean_prob,
               CAST(COALESCE(a.n_unseen, 0) AS BIGINT) AS n_unseen,
               COALESCE(CAST(a.s AS DOUBLE)
                   / CAST(a.n_trigrams * 1000000000 AS DOUBLE) >= 0.01,
                   FALSE) AS lm_keep
        FROM documents d LEFT JOIN agg a USING (doc_id)
    )
    UNION ALL BY NAME
    SELECT 'fix' AS kind, doc_id, fixed_text, fix_changed, n_chars_delta
    FROM (
        SELECT doc_id, fixed_text,
               fixed_text != t AS fix_changed,
               CAST(length(t) - length(fixed_text) AS INT) AS n_chars_delta
        FROM (
            SELECT doc_id, t, {_fix_sql("t")} AS fixed_text
            FROM ({_FIX_CORRUPT_SQL})
        )
    )
    """,
)
@plan_memo
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics, composite quality score, marker-word language
    ID, and — since round 7 — the trigram-LM quality filter in one
    union-tagged result ('stats' / 'quality' / 'lang' / 'lm' rows;
    columns absent from a row kind are NULL). One gate slot pins all
    four text-analysis operators; the 'lm' rows in particular
    hash-verify the leakage-aware train split, add-one smoothing, and
    the order-independent integer-scaled probability aggregation of
    text.trigram_lm_quality against an independent SQL formulation.

    r13: the shared docs frame goes through spread_ids — the bench
    corpus is ONE parquet file, so the stats/quality/lang/fix branches
    each ran their token-array work as a single task (profiled: four
    concurrent 1-task stages of 3.1 s CPU each, guide §2.5 input-skew
    case). One tiny round-robin exchange (3.5 MB of text) fans all four
    branches out; Spark's exchange reuse computes it once. At real scale
    the scan arrives wide and the guard is a no-op."""
    from rta_registrations_pyspark_glue_spark.operators.spread import spread_ids

    docs = spread_ids(load_table(spark, "documents", sf_dir))
    stats = text.token_stats(docs).select(
        F.lit("stats").alias("kind"),
        "doc_id",
        "n_chars",
        "n_tokens",
        "n_bpe_tokens",
        "n_unique_tokens",
        "unique_ratio",
        "avg_token_len",
        "stopword_ratio",
    )
    quality = text.quality_score(docs).select(
        F.lit("quality").alias("kind"), "doc_id", "quality_score"
    )
    lang = text.language_id(docs).select(
        F.lit("lang").alias("kind"),
        "doc_id",
        "score_en",
        "score_es",
        "score_de",
        "score_fr",
        "predicted_lang",
    )
    lm = text.trigram_lm_quality(docs).select(
        F.lit("lm").alias("kind"),
        "doc_id",
        "n_trigrams",
        "lm_mean_prob",
        "n_unseen",
        "lm_keep",
    )
    d = F.col("doc_id")
    # invisible characters built from explicit escapes (mirrors the
    # oracle's chr() calls): mojibake, CR/CRLF, zero-width + BEL,
    # newline run, NBSP
    corrupted = F.concat(
        F.col("text"),
        F.when(
            d % 7 == 0,
            F.lit(" it\u00e2\u20ac\u2122s a caf\u00c3\u00a9"),
        ).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit("\r\nline2\rline3")).otherwise(F.lit("")),
        F.when(
            d % 13 == 0, F.lit(" ab\u200bc\ufeff\u0007")
        ).otherwise(F.lit("")),
        F.when(d % 19 == 0, F.lit("\n\n\n\n\nend")).otherwise(F.lit("")),
        F.when(d % 23 == 0, F.lit(" x\u00a0y")).otherwise(F.lit("")),
    )
    fix = text.fix_text(
        docs.select("doc_id", corrupted.alias("text"))
    ).select(F.lit("fix").alias("kind"), "*")
    return (
        stats.unionByName(quality, allowMissingColumns=True)
        .unionByName(lang, allowMissingColumns=True)
        .unionByName(lm, allowMissingColumns=True)
        .unionByName(fix, allowMissingColumns=True)
    )


#: Unrolled Morton interleave over (doc_id%256, (doc_id*7)%256) — the
#: independent SQL formulation of zorder.morton_key(bits=8, n=2).
_ZORDER_KEY_SQL = "(" + """((((doc_id % 256) >> 0) & 1) << 0) | (((((doc_id * 7) % 256) >> 0) & 1) << 1) | ((((doc_id % 256) >> 1) & 1) << 2) | (((((doc_id * 7) % 256) >> 1) & 1) << 3) | ((((doc_id % 256) >> 2) & 1) << 4) | (((((doc_id * 7) % 256) >> 2) & 1) << 5) | ((((doc_id % 256) >> 3) & 1) << 6) | (((((doc_id * 7) % 256) >> 3) & 1) << 7) | ((((doc_id % 256) >> 4) & 1) << 8) | (((((doc_id * 7) % 256) >> 4) & 1) << 9) | ((((doc_id % 256) >> 5) & 1) << 10) | (((((doc_id * 7) % 256) >> 5) & 1) << 11) | ((((doc_id % 256) >> 6) & 1) << 12) | (((((doc_id * 7) % 256) >> 6) & 1) << 13) | ((((doc_id % 256) >> 7) & 1) << 14) | (((((doc_id * 7) % 256) >> 7) & 1) << 15)""" + ")"


def _duplicate_spans_sql(span_tokens: int = 8, min_docs: int = 2) -> str:
    """DuckDB mirror of textdedup.duplicate_spans over the near-dup
    corpus: same normalization/tokenization as the simhash mirror, the
    same windowed md5 keys (list_slice is 1-based like Spark's slice),
    the same gaps-and-islands interval merge."""
    L = span_tokens
    return f"""
    WITH corpus AS (
        {SQL_NEAR_CORPUS}
    ), tok AS (
        SELECT doc_id, string_split_regex({SQL_NORM}, '\\s+') AS toks
        FROM corpus
    ), idx AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - {L} + 2)) AS i
        FROM tok WHERE len(toks) >= {L}
    ), wins AS (
        SELECT doc_id, i - 1 AS start,
               md5(array_to_string(list_slice(toks, i, i + {L} - 1), ' ')) AS wkey
        FROM idx
    ), dup AS (
        SELECT wkey FROM wins GROUP BY wkey
        HAVING COUNT(DISTINCT doc_id) >= {min_docs}
    ), dw AS (
        SELECT w.doc_id, w.start FROM wins w JOIN dup USING (wkey)
    ), flagged AS (
        SELECT doc_id, start,
               CASE WHEN MAX(start + {L}) OVER w IS NULL
                      OR start > MAX(start + {L}) OVER w
                    THEN 1 ELSE 0 END AS newgrp
        FROM dw
        WINDOW w AS (PARTITION BY doc_id ORDER BY start
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), islands AS (
        SELECT doc_id, start,
               SUM(newgrp) OVER (PARTITION BY doc_id ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM flagged
    )
    SELECT doc_id, MIN(start) AS span_start, MAX(start) + {L} AS span_end,
           COUNT(*) AS n_windows
    FROM islands GROUP BY doc_id, grp
    """


def _incremental_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared Spark side of the incremental-substring-dedup check:
    history = base documents, batch = the +1,000,000 near-dup copies,
    PRODUCTION path (window_index over history once, then
    incremental_duplicate_spans probing only the batch's windows).
    Used by both the doc_fingerprints 'incdup' oracle rows (the gate
    is capped at 50 oracle-backed queries — consolidation by union-tag
    is the designed mechanism) and the rows-only
    incremental_substring_dedup bench query (isolated timing)."""
    corpus = _near_dup_corpus(spark, sf_dir)
    existing = corpus.filter(F.col("doc_id") < 1000000)
    batch = corpus.filter(F.col("doc_id") >= 1000000)
    idx = textdedup.window_index(existing, span_tokens=6)
    return textdedup.incremental_duplicate_spans(batch, idx, span_tokens=6).select(
        "doc_id",
        F.col("span_start").cast("int"),
        F.col("span_end").cast("int"),
        "n_windows",
    )


_INCDUP_SQL = f"""
    SELECT doc_id, CAST(span_start AS INT) AS span_start,
           CAST(span_end AS INT) AS span_end, n_windows
    FROM ({_duplicate_spans_sql(span_tokens=6)})
    WHERE doc_id >= 1000000
"""



@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT 'fp' AS kind, doc_id,
           md5(COALESCE({SQL_NORM}, '')) AS fp_md5,
           sha256(COALESCE({SQL_NORM}, '')) AS fp_sha256
    FROM documents
    UNION ALL BY NAME
    SELECT 'zorder' AS kind, doc_id,
           CAST({_ZORDER_KEY_SQL} AS BIGINT) AS zkey
    FROM documents
    UNION ALL BY NAME
    SELECT 'dupspan' AS kind, doc_id,
           CAST(span_start AS INT) AS span_start,
           CAST(span_end AS INT) AS span_end,
           n_windows
    FROM ({_duplicate_spans_sql()})
    UNION ALL BY NAME
    SELECT 'dupfrac' AS kind, n.doc_id,
           CAST(n.n_tokens AS INT) AS n_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CASE WHEN n.n_tokens > 0
                THEN COALESCE(p.dup_tokens, 0) / n.n_tokens
                ELSE CAST(0.0 AS DOUBLE) END AS dup_fraction,
           (CASE WHEN n.n_tokens > 0
                 THEN COALESCE(p.dup_tokens, 0) / n.n_tokens
                 ELSE CAST(0.0 AS DOUBLE) END) <= 0.5 AS keep
    FROM (
        SELECT doc_id,
               COALESCE(len(string_split_regex({SQL_NORM}, '\\s+')), 0)
                   AS n_tokens
        FROM ({SQL_NEAR_CORPUS})
    ) n
    LEFT JOIN (
        SELECT doc_id, SUM(span_end - span_start) AS dup_tokens
        FROM ({_duplicate_spans_sql()}) GROUP BY doc_id
    ) p USING (doc_id)
    UNION ALL BY NAME
    SELECT 'incdup' AS kind, doc_id, span_start, span_end, n_windows
    FROM ({_INCDUP_SQL})
    """,
)
@plan_memo
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints over normalized text ('fp' rows); 'zorder'
    rows (round 7) hash-verifying the Morton-interleave key expression
    (operators/zorder.morton_key) against an independent unrolled
    bit-arithmetic SQL formulation — the physical payoff (per-file
    footer envelopes tighten in every dimension) is pinned separately
    by tests/test_zorder.py against pyarrow-read parquet statistics;
    and 'dupspan' rows (round 8) hash-verifying
    textdedup.duplicate_spans — EXACT duplicated-substring intervals
    (Lee et al. 2022 substring-level dedup) over the near-dup corpus,
    every merged (span_start, span_end, n_windows) interval compared
    against an independent SQL gaps-and-islands formulation."""
    from rta_registrations_pyspark_glue_spark.operators import zorder

    docs = load_table(spark, "documents", sf_dir)
    fp = text.fingerprint(docs).select(F.lit("fp").alias("kind"), "*")
    d = F.col("doc_id")
    zk = docs.select(
        F.lit("zorder").alias("kind"),
        "doc_id",
        zorder.morton_key([(d % 256).cast("long"), ((d * 7) % 256).cast("long")], bits=8)
        .cast("long")
        .alias("zkey"),
    )
    corpus = _near_dup_corpus(spark, sf_dir)
    from rta_registrations_pyspark_glue_spark.caching import tracked_persist

    spans_df = tracked_persist(textdedup.duplicate_spans(corpus))
    spans = spans_df.select(
        F.lit("dupspan").alias("kind"),
        "doc_id",
        F.col("span_start").cast("int"),
        F.col("span_end").cast("int"),
        "n_windows",
    )
    # 'dupfrac' rows (round 8): the doc-level boilerplate filter built
    # on the same spans frame (persisted — one window-index shuffle
    # feeds both row kinds).
    frac = textdedup.duplication_stats(corpus, spans=spans_df).select(
        F.lit("dupfrac").alias("kind"),
        "doc_id",
        "n_tokens",
        "dup_tokens",
        "dup_fraction",
        "keep",
    )
    # 'incdup' rows (round 9): the PRODUCTION incremental substring
    # dedup — window_index over history + batch-only probe — hash-
    # verified against the full-union SQL restricted to batch docs
    # (the incremental contract, end-to-end on real data). Lives here
    # because the gate caps oracle-backed queries at 50; the rows-only
    # incremental_substring_dedup entry times the same plan isolated.
    incdup = _incremental_spans(spark, sf_dir).select(
        F.lit("incdup").alias("kind"),
        "doc_id",
        "span_start",
        "span_end",
        "n_windows",
    )
    return (
        fp.unionByName(zk, allowMissingColumns=True)
        .unionByName(spans, allowMissingColumns=True)
        .unionByName(frac, allowMissingColumns=True)
        .unionByName(incdup, allowMissingColumns=True)
    )


@register("incremental_substring_dedup")
@plan_memo
def incremental_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental substring-level dedup (round 9): history = the base
    documents, batch = the token-dropped near-dup copies (ids
    +1,000,000). The Spark side runs the PRODUCTION incremental path —
    window_index over history once, then incremental_duplicate_spans
    probing only the batch's windows — while the oracle recomputes the
    FULL union with the independent SQL gaps-and-islands formulation
    and restricts to batch docs: a hash match proves the incremental
    contract (sum of disjoint-id counts == union count) end-to-end on
    real data, not just on the pytest micro-corpus. span_tokens=6, not
    the default 8: dropping every 7th token leaves kept runs of exactly
    6, so EVERY batch doc shares 6-token windows with its history
    original (at 8 no window survives the perturbation) — the
    cross-corpus regime the index exists for, exercised corpus-wide.

    Registered rows-only: the gate caps oracle-backed queries at 50,
    so the ORACLE for these exact rows lives in doc_fingerprints'
    'incdup' union leg (same _incremental_spans plan, hash-checked by
    the driver); this standalone entry exists for isolated bench
    timing of the production incremental path."""
    return _incremental_spans(spark, sf_dir)


@register(
    "exact_dedup_documents",
    oracle=rf"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
    ), pert AS (
        SELECT doc_id, {_drop_every_kth_token_sql(5)} AS text
        FROM documents WHERE doc_id % 3 = 1
    ), batch AS (
        SELECT doc_id + 3000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 3000000 AS doc_id, text FROM pert
        UNION ALL
        SELECT doc_id + 4000000 AS doc_id, text FROM pert
    ), bk AS (
        SELECT doc_id, md5(COALESCE({SQL_NORM}, '')) AS content_key FROM batch
    ), bw AS (
        SELECT content_key, MIN(doc_id) AS w FROM bk GROUP BY 1
    ), ek AS (
        SELECT DISTINCT md5(COALESCE({SQL_NORM}, '')) AS content_key FROM documents
    )
    SELECT 'groups' AS kind, md5(COALESCE({SQL_NORM}, '')) AS content_key,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY 2
    UNION ALL BY NAME
    SELECT 'incremental' AS kind, b.doc_id, b.content_key
    FROM bk b
    JOIN bw ON b.content_key = bw.content_key AND b.doc_id = bw.w
    -- NOT EXISTS, not NOT IN: one NULL in the probe side would make
    -- NOT IN return zero rows for the whole branch.
    WHERE NOT EXISTS (SELECT 1 FROM ek WHERE ek.content_key = b.content_key)
    """,
)
@plan_memo
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, batch AND incremental modes under one slot:
    - 'groups' rows: full-corpus dedup by content hash over a corpus
      with injected exact copies — every 10th doc appears twice and
      must collapse to one group with n_copies=2
      (textdedup.exact_duplicates).
    - 'incremental' rows: the production mode
      (textdedup.incremental_exact_dedup) — a synthetic new batch
      carrying re-submissions of existing docs (every 3rd, shifted ids,
      must ALL be dropped by the anti-join against the corpus's
      content keys), genuinely new content (every-5th-token-dropped
      variants of the %3==1 docs, must survive), and batch-internal
      duplicates of that new content (must collapse to the min-id
      survivor). The hash pins every survive/drop decision without
      ever regrouping the existing corpus."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    groups = textdedup.exact_duplicates(docs.unionByName(copies)).select(
        F.lit("groups").alias("kind"), "content_key", "representative_id", "n_copies"
    )
    pert = _drop_every_kth_token("text", 5)
    fresh = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id", pert.alias("text"))
    batch = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 3000000).alias("doc_id"), "text")
        .unionByName(
            fresh.select((F.col("doc_id") + 3000000).alias("doc_id"), "text")
        )
        .unionByName(
            fresh.select((F.col("doc_id") + 4000000).alias("doc_id"), "text")
        )
    )
    # Probe the FINGERPRINT STORE, not raw history — the operator's
    # production contract (fp_md5 IS the content key).
    store = text.fingerprint(docs).select("fp_md5")
    inc = textdedup.incremental_exact_dedup(
        batch, store, existing_key_col="fp_md5"
    ).select(F.lit("incremental").alias("kind"), "doc_id", "content_key")
    return groups.unionByName(inc, allowMissingColumns=True)


def _minhash_sig_sql(num_hashes: int = 8) -> str:
    comps = ",\n               ".join(
        f"list_min(list_transform(s, x -> md5('{i}:' || x))) AS mh{i}"
        for i in range(num_hashes)
    )
    bands = "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, md5(concat_ws('|', mh{2*b}, mh{2*b+1})) AS band_key FROM sig"
        for b in range(num_hashes // 2)
    )
    return comps, bands


_MH_COMPS, _MH_BANDS = _minhash_sig_sql(8)


# The candidate-generation + verification CTE stack from ``normed``
# down, parameterized only by a preceding ``corpus`` CTE — so the pair
# query, the clustering query, and the curation pipeline (whose corpus
# is FILTERED by the duplication stage first) all share one mirror.
_MINHASH_TAIL = f"""normed AS (
        SELECT doc_id, {SQL_NORM} AS norm FROM corpus
    ), toks AS (
        SELECT doc_id, string_split_regex(norm, '\\s+') AS t FROM normed
    ), sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) < 3 THEN []
                   ELSE list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
        FROM toks
    ), sig AS (
        SELECT doc_id,
               {_MH_COMPS}
        FROM sh WHERE len(s) > 0
    ), bucketed AS (
        {_MH_BANDS}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bucketed a
        JOIN bucketed b ON a.band_idx = b.band_idx
                       AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id
    ), verified AS (
        SELECT c.id_a, c.id_b,
               CASE WHEN len(list_distinct(sa.s || sb.s)) > 0
                    THEN CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                         / len(list_distinct(sa.s || sb.s))
                    ELSE 0.0 END AS jaccard
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.id_a
        JOIN sh sb ON sb.doc_id = c.id_b
    )"""


# The full stack over the standard near-dup corpus, shared by the pair
# query and the clustering query built on top of it.
_MINHASH_CTES = f"""corpus AS (
        {SQL_NEAR_CORPUS}
    ), {_MINHASH_TAIL}"""


@register(
    "minhash_lsh_near_dups",
    oracle=f"""
    WITH {_MINHASH_CTES}
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.35
    """,
)
@plan_memo
def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(8) + LSH banding (4 bands of 2) candidate generation, then
    exact-Jaccard verification at 0.35 — the scalable near-dup pipeline
    (generalizing the reference's blocked fuzzy join, SURVEY.md §4)."""
    # Three plan branches read the corpus (signature build + both sides
    # of the verification join) — persist it once.
    corpus = tracked_persist(_near_dup_corpus(spark, sf_dir))
    cands = textdedup.minhash_lsh_candidates(corpus)
    return textdedup.jaccard_verify(cands, corpus, threshold=0.35)


@register(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH normed AS (
        SELECT doc_id, lang, source, {SQL_NORM} AS norm FROM documents
    ), grams AS (
        SELECT doc_id, lang, source,
               list_distinct(CASE WHEN length(norm) < 5 THEN [norm]
                   ELSE list_transform(range(1, length(norm) - 3),
                        i -> substr(norm, i, 5)) END) AS g
        FROM normed
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
               / len(list_distinct(a.g || b.g)) AS jaccard
    FROM grams a
    JOIN grams b ON a.lang = b.lang AND a.source = b.source
                AND a.doc_id < b.doc_id
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard similarity between documents blocked on
    (lang, source) — the reference's equi-key blocking pattern applied to
    n-gram sets."""
    docs = load_table(spark, "documents", sf_dir)
    grams = docs.withColumn("__norm", text.normalize_text("text")).select(
        "doc_id", "lang", "source", text.char_shingles("__norm", 5).alias("g")
    )
    a = grams.select(
        F.col("lang"), F.col("source"), F.col("doc_id").alias("id_a"), F.col("g").alias("g_a")
    )
    b = grams.select(
        F.col("lang").alias("lang_b"),
        F.col("source").alias("source_b"),
        F.col("doc_id").alias("id_b"),
        F.col("g").alias("g_b"),
    )
    pairs = a.join(
        b,
        (F.col("lang") == F.col("lang_b"))
        & (F.col("source") == F.col("source_b"))
        & (F.col("id_a") < F.col("id_b")),
        "inner",
    )
    jac = F.size(F.array_intersect("g_a", "g_b")).cast("double") / F.size(
        F.array_distinct(F.concat("g_a", "g_b"))
    )
    return pairs.select("id_a", "id_b", jac.alias("jaccard"))


def _simhash_sql(corpus_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """64-bit SimHash in DuckDB, bit-for-bit the Spark operator: same
    md5-hex nibble extraction, same ±1 majority votes, same signed-long
    recomposition (bit 63 lands last as -2^63 so no partial sum ever
    leaves BIGINT range)."""
    votes = []
    for b in range(64):
        j, k = divmod(b, 4)
        nib = f"(strpos('0123456789abcdef', substr(m, {j + 1}, 1)) - 1)"
        votes.append(
            f"SUM(CASE WHEN (({nib} >> {k}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}"
        )
    sums = ",\n               ".join(votes)
    terms = [
        f"(CASE WHEN b{b} > 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END)" for b in range(63)
    ]
    terms.append("(CASE WHEN b63 > 0 THEN (-9223372036854775807 - 1)::BIGINT ELSE 0::BIGINT END)")
    recompose = " + ".join(terms)
    return f"""
    WITH corpus AS (
        {corpus_sql}
    ), normed AS (
        SELECT doc_id, {SQL_NORM} AS norm FROM corpus
    ), tok AS (
        SELECT doc_id, unnest(string_split_regex(norm, '\\s+')) AS t FROM normed
    ), h AS (
        SELECT doc_id, md5(t) AS m FROM tok
    ), bits AS (
        SELECT doc_id,
               {sums}
        FROM h GROUP BY doc_id
    )
    SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash FROM bits
    """


# (simhash_suite is registered below, after _simhash_pairs_sql.)


def _simhash_pairs_sql(n_bands: int = 4, max_hamming: int = 3, r: int = 1) -> str:
    """DuckDB mirror of textdedup.simhash_near_pairs at ANY (n_bands, r)
    scheme — same block partition (_simhash_blocks), same C(n_bands, r)
    combination tables keyed by concatenated blocks, so the derived
    schemes (derive_simhash_scheme) are oracle-mirrorable, not just the
    (4, 1) gate floor (r7 verdict's last parity gap). Arithmetic >> on
    BIGINT slices identically in both engines because every slice is
    masked."""
    import itertools

    from rta_registrations_pyspark_glue_spark.operators.textdedup import (
        _simhash_blocks,
    )

    widths, offsets = _simhash_blocks(n_bands)

    def table_key(combo: tuple[int, ...]) -> str:
        terms, shift = [], 0
        for j in combo:
            mask = (1 << widths[j]) - 1
            terms.append(
                f"(((simhash >> {offsets[j]}) & {mask}) * {1 << shift})"
            )
            shift += widths[j]
        return " + ".join(terms)

    bands = "\n        UNION ALL ".join(
        f"SELECT doc_id, simhash, {t} AS band, {table_key(combo)} AS bkey FROM fp"
        for t, combo in enumerate(itertools.combinations(range(n_bands), r))
    )
    return f"""
    WITH fp AS ({_simhash_sql(SQL_NEAR_CORPUS)}
    ), buckets AS (
        {bands}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM buckets a
        JOIN buckets b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """


@register(
    "simhash_suite",
    oracle=f"""
    SELECT 'fp' AS kind, doc_id, simhash FROM ({_simhash_sql()})
    UNION ALL BY NAME
    SELECT 'pair' AS kind, id_a, id_b, hamming FROM ({_simhash_pairs_sql()})
    """,
)
@plan_memo
def simhash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints over the documents table ('fp' rows,
    majority vote over token-hash bits) and Hamming-≤3 near-dup pairs
    over the injected near-dup corpus ('pair' rows, exact 4-band
    bucketing: any pair within distance 3 shares a full 16-bit slice by
    pigeonhole — no recall loss) in one union-tagged result. One gate
    slot pins both the fingerprint values and the banded pair
    semantics."""
    from rta_registrations_pyspark_glue_spark.operators.spread import spread_ids

    # spread (r13): the one-file corpus scan ran the majority-vote bit
    # computation as a single 1.9 s task (guide §2.5 input skew); a
    # round-robin of (doc_id, text) fans it across the cores and is a
    # no-op on a wide production scan.
    fp = textdedup.simhash_fingerprints(
        spread_ids(load_table(spark, "documents", sf_dir))
    ).select(F.lit("fp").alias("kind"), "doc_id", "simhash")
    pairs = textdedup.simhash_near_pairs(_near_dup_corpus(spark, sf_dir)).select(
        F.lit("pair").alias("kind"), "id_a", "id_b", "hamming"
    )
    return fp.unionByName(pairs, allowMissingColumns=True)


@register(
    "near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_CTES}, pairs AS (
        SELECT id_a, id_b FROM verified WHERE jaccard >= 0.35
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL
        SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(node, label) AS (
        SELECT doc_id, doc_id FROM corpus
        UNION
        SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
    ), comp AS (
        SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    ), sizes AS (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id
    ), pri AS (
        SELECT c.doc_id, c.cluster_id,
               CAST(substr(d.source, 4) AS INT) AS priority
        FROM comp c
        JOIN documents d ON d.doc_id = c.doc_id % 1000000
    ), surv AS (
        SELECT doc_id,
               FIRST_VALUE(doc_id) OVER (
                   PARTITION BY cluster_id
                   ORDER BY priority ASC NULLS LAST, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS keep_doc_id
        FROM pri
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           c.doc_id = c.cluster_id AS is_canonical,
           CASE WHEN substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train'
                WHEN substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'val'
                ELSE 'test' END AS split,
           v.keep_doc_id,
           c.doc_id = v.keep_doc_id AS keep
    FROM comp c JOIN sizes s USING (cluster_id) JOIN surv v USING (doc_id)
    """,
    expensive=True,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after pair detection that an actionable dedup needs:
    MinHash-LSH near-dup pairs → connected components (min-label
    propagation, operators/graph.py) → one cluster id per document,
    cluster sizes, and a deterministic canonical survivor (minimum id)
    per cluster. ``filter(is_canonical)`` IS the deduplicated corpus.
    The ``split`` column is the LEAKAGE-SAFE train/val/test split: the
    hash_split keyed on cluster_id rather than doc_id, so every member
    of a near-dup cluster lands in the same split — a near-duplicate of
    a training document can never leak into the test set (the
    split-time complement of decontamination's audit-time check).
    Round 8 (scope v3) adds SOURCE-PRIORITY survivor selection
    (graph.priority_survivors — the keep-the-curated-copy rule real
    pipelines apply when near-dups span sources of different quality):
    ``keep_doc_id``/``keep`` pick each cluster's member with the
    lowest source rank ('src3' → 3; perturbed copies inherit their
    original's source via doc_id % 1000000), ties by id. The oracle
    mirrors the fixpoint with a recursive transitive-closure CTE over
    the identical verified pair set and the survivor rule with the
    same FIRST_VALUE total order."""
    corpus = tracked_persist(_near_dup_corpus(spark, sf_dir))
    cands = textdedup.minhash_lsh_candidates(corpus)
    pairs = textdedup.jaccard_verify(cands, corpus, threshold=0.35)
    clusters = graph.dedup_clusters(corpus.select("doc_id"), pairs)
    split = sampling.hash_split(clusters, "cluster_id")
    docs = load_table(spark, "documents", sf_dir)
    priorities = (
        corpus.select("doc_id")
        .join(
            docs.select(
                F.col("doc_id").alias("__src_id"),
                F.substring("source", 4, 10).cast("int").alias("priority"),
            ),
            F.col("doc_id") % 1000000 == F.col("__src_id"),
        )
        .select("doc_id", "priority")
    )
    return graph.priority_survivors(split, priorities)


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH RECURSIVE allc AS (
        {SQL_NEAR_CORPUS}
    ), ntok AS (
        SELECT doc_id,
               COALESCE(len(string_split_regex({SQL_NORM}, '\\s+')), 0)
                   AS n_tokens
        FROM allc
    ), dupagg AS (
        SELECT doc_id, SUM(span_end - span_start) AS dup_tokens
        FROM ({_duplicate_spans_sql()}) GROUP BY doc_id
    ), dupfrac AS (
        SELECT n.doc_id,
               CAST(n.n_tokens AS INT) AS n_tokens,
               CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CASE WHEN n.n_tokens > 0
                    THEN COALESCE(p.dup_tokens, 0) / n.n_tokens
                    ELSE CAST(0.0 AS DOUBLE) END AS dup_fraction
        FROM ntok n LEFT JOIN dupagg p USING (doc_id)
    ), corpus AS (
        SELECT a.doc_id, a.text FROM allc a JOIN dupfrac f USING (doc_id)
        WHERE f.dup_fraction <= 0.5
    ), {_MINHASH_TAIL}, pairs AS (
        SELECT id_a, id_b FROM verified WHERE jaccard >= 0.35
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL
        SELECT id_b AS a, id_a AS b FROM pairs
    ), reach(node, label) AS (
        SELECT doc_id, doc_id FROM corpus
        UNION
        SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
    ), comp AS (
        SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    ), sizes AS (
        SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id
    ), pri AS (
        SELECT c.doc_id, c.cluster_id,
               CAST(substr(d.source, 4) AS INT) AS priority
        FROM comp c
        JOIN documents d ON d.doc_id = c.doc_id % 1000000
    ), surv AS (
        SELECT doc_id,
               FIRST_VALUE(doc_id) OVER (
                   PARTITION BY cluster_id
                   ORDER BY priority ASC NULLS LAST, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS keep_doc_id
        FROM pri
    )
    SELECT f.doc_id, f.n_tokens, f.dup_tokens, f.dup_fraction,
           f.dup_fraction <= 0.5 AS dup_keep,
           c.cluster_id, s.cluster_size, v.keep_doc_id,
           CASE WHEN c.cluster_id IS NULL THEN NULL
                ELSE f.doc_id = v.keep_doc_id END AS survivor,
           CASE WHEN c.cluster_id IS NULL THEN NULL
                WHEN substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train'
                WHEN substr(md5(CAST(c.cluster_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'val'
                ELSE 'test' END AS split,
           COALESCE(f.doc_id = v.keep_doc_id, FALSE) AS final_keep
    FROM dupfrac f
    LEFT JOIN comp c ON c.doc_id = f.doc_id
    LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
    LEFT JOIN surv v ON v.doc_id = f.doc_id
    """,
    expensive=True,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation composite (round 9, VERDICT r8 #6): the
    full Lee-et-al.-shaped chain — substring-duplication filter →
    MinHash+LSH near-dup clustering OVER THE FILTERED corpus →
    source-priority survivor selection → leakage-safe cluster-keyed
    split — fused into ONE dataflow (operators/curation.curate_corpus),
    the LLM-pipeline analogue of rta_pipeline_star. One row per input
    doc carries every decision, so the driver hash pins the whole
    chain including the stage INTERACTIONS (a doc dropped by the
    duplication filter never reaches clustering — its absence changes
    which pairs exist downstream; 47 of 600 docs drop at sf0.01). The
    oracle recomputes each stage independently: the gaps-and-islands
    span mirror feeds the dup_fraction gate, the minhash CTE stack
    runs over the FILTERED corpus CTE, the recursive closure and
    FIRST_VALUE survivor rule mirror near_dup_clusters', and the split
    hex-bucket rule is hash_split's."""
    corpus = tracked_persist(_near_dup_corpus(spark, sf_dir))
    docs = load_table(spark, "documents", sf_dir)
    priorities = (
        corpus.select("doc_id")
        .join(
            docs.select(
                F.col("doc_id").alias("__src_id"),
                F.substring("source", 4, 10).cast("int").alias("priority"),
            ),
            F.col("doc_id") % 1000000 == F.col("__src_id"),
        )
        .select("doc_id", "priority")
    )
    return curation.curate_corpus(corpus, priorities)


# Mixture rates for the dataset_split 'mixture' rows: the 20 testdata
# sources cycle through 0.25/0.5/0.75/1.0 so every interesting rate —
# including the no-hex-comparison 1.0 endpoint — is exercised. The
# oracle CASE chains are generated from this dict (single source of
# truth).
_MIX_RATES = {f"src{i}": (i % 4 + 1) / 4 for i in range(20)}


def _mix_rate_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{n}' THEN CAST({_MIX_RATES[n]} AS DOUBLE)"
        for n in sorted(_MIX_RATES)
    )
    return f"CASE {whens} ELSE CAST(1.0 AS DOUBLE) END"


def _mix_keep_sql() -> str:
    clauses = []
    for n in sorted(_MIX_RATES):
        r = _MIX_RATES[n]
        if r >= 1.0:
            cond = "TRUE"
        elif r <= 0.0:
            cond = "FALSE"
        else:
            cut = format(int(r * 65536), "04x")
            cond = (
                "substr(md5(source || ':' || CAST(doc_id AS VARCHAR)), 1, 4)"
                f" < '{cut}'"
            )
        clauses.append(f"WHEN source = '{n}' THEN {cond}")
    return "CASE " + " ".join(clauses) + " ELSE TRUE END"


@register(
    "dataset_split",
    oracle=f"""
    SELECT 'hash' AS row_kind, doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                ELSE 'test' END AS split,
           NULL AS lang
    FROM documents
    UNION ALL BY NAME
    SELECT 'stratified' AS row_kind, doc_id, NULL AS bucket, lang,
           CASE WHEN rn <= CAST(ceil(0.8 * cnt) AS BIGINT) THEN 'train'
                WHEN rn <= CAST(ceil(0.9 * cnt) AS BIGINT) THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS cnt
        FROM documents
    )
    UNION ALL BY NAME
    SELECT 'mixture' AS row_kind, doc_id, source,
           {_mix_rate_sql()} AS rate,
           {_mix_keep_sql()} AS sampled
    FROM documents
    UNION ALL BY NAME
    SELECT 'reservoir' AS row_kind, doc_id, lang,
           CAST(rn AS INT) AS sample_rank
    FROM (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY md5('rsv' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
)
@plan_memo
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two dataset-split modes under one union-tagged slot:
    - 'hash' rows: deterministic 80/10/10 train/val/test keyed on
      md5(doc_id) — reproducible across engines and runs, stable under
      corpus growth, zero-shuffle scan-side labeling.
    - 'stratified' rows: EXACT per-language quotas — within each lang,
      rows ranked by (md5, id) are cut at ceil(0.8·n)/ceil(0.9·n), so
      every stratum hits its fractions exactly (hash_split only
      converges in expectation, under-representing small strata). One
      group-key shuffle (operators/sampling.py:stratified_split).
    - 'mixture' rows: deterministic per-source data mixing
      (sampling.weighted_mixture) — each source downsampled to its
      _MIX_RATES target via the source-salted hex-bucket rule, the
      sampled flag hash-verified per row (rates cycle 0.25-1.0 so the
      no-comparison 1.0 endpoint is exercised too)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "source")
    h = (
        sampling.hash_split(docs.select("doc_id"), "doc_id")
        .withColumn("bucket", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4))
        .withColumn("row_kind", F.lit("hash"))
        .select("row_kind", "doc_id", "bucket", "split")
    )
    s = (
        sampling.stratified_split(docs.select("doc_id", "lang"), "doc_id", "lang")
        .withColumn("row_kind", F.lit("stratified"))
        .select("row_kind", "doc_id", "lang", "split")
    )
    m = (
        sampling.weighted_mixture(docs.select("doc_id", "source"), _MIX_RATES)
        .withColumn("row_kind", F.lit("mixture"))
        .select("row_kind", "doc_id", "source", "rate", "sampled")
    )
    # 'reservoir' rows (round 7): deterministic k-per-key sample —
    # hash-ranked uniform order, reproducible across engines/
    # partitionings (sampling.reservoir_per_key)
    r = (
        sampling.reservoir_per_key(
            docs.select("doc_id", "lang"), "lang", k=5, salt="rsv"
        )
        .withColumn("row_kind", F.lit("reservoir"))
        .select("row_kind", "doc_id", "lang", F.col("sample_rank").cast("int"))
    )
    return (
        h.unionByName(s, allowMissingColumns=True)
        .unionByName(m, allowMissingColumns=True)
        .unionByName(r, allowMissingColumns=True)
    )


_RT = text.REPETITION_THRESHOLDS


@register(
    "repetition_filters",
    oracle=rf"""
    WITH tk AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), lined AS (
        -- COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
        -- concat_ws over an empty slice is '' (short docs at small sf).
        SELECT doc_id,
               COALESCE(array_to_string(t[1:8], ' '), '') || chr(10) ||
               COALESCE(array_to_string(t[9:16], ' '), '') || chr(10) ||
               CASE WHEN doc_id % 6 = 0 THEN COALESCE(array_to_string(t[1:8], ' '), '')
                    ELSE COALESCE(array_to_string(t[17:24], ' '), '') END AS text
        FROM tk
    ), norm AS (
        SELECT doc_id, text, {SQL_NORM} AS nrm FROM lined
    ), base AS (
        SELECT doc_id,
               length(nrm) AS n_chars,
               CASE WHEN nrm = '' THEN 0
                    ELSE len(string_split(nrm, ' ')) END AS n_tokens,
               string_split(text, chr(10)) AS lines
        FROM norm
    ), words AS (
        SELECT doc_id, string_split(nrm, ' ') AS w FROM norm
    ), grams AS (
        SELECT doc_id, 1 AS n, unnest(w) AS g FROM words
        UNION ALL
        SELECT doc_id, 2 AS n, unnest(CASE WHEN len(w) < 2 THEN []
            ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS g
        FROM words
        UNION ALL
        SELECT doc_id, 3 AS n, unnest(CASE WHEN len(w) < 3 THEN []
            ELSE list_transform(range(1, len(w) - 1),
                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) END) AS g
        FROM words
    ), cnts AS (
        SELECT doc_id, n, g, COUNT(*) AS cnt FROM grams
        WHERE g <> '' GROUP BY doc_id, n, g
    ), perdoc AS (
        SELECT doc_id,
               MAX(CASE WHEN n = 1 THEN cnt END) AS topw,
               -- most-frequent repeating bigram's char coverage (struct
               -- max: count first, char-coverage tiebreak) — mirrors the
               -- operator's Gopher-spec selection exactly
               struct_extract(MAX(CASE WHEN n = 2 AND cnt > 1
                   THEN {{'c': cnt, 'ch': cnt * length(g)}} END), 'ch') AS topbg,
               SUM(CASE WHEN n = 3 AND cnt > 1 THEN cnt * length(g) END) AS duptg
        FROM cnts GROUP BY doc_id
    ), m AS (
        SELECT b.doc_id,
               b.n_tokens::INT AS n_tokens,
               len(b.lines)::INT AS n_lines,
               CASE WHEN len(b.lines) > 0
                    THEN CAST(len(b.lines) - len(list_distinct(b.lines)) AS DOUBLE)
                         / len(b.lines)
                    ELSE 0.0 END AS dup_line_frac,
               CASE WHEN b.n_tokens > 0
                    THEN CAST(COALESCE(p.topw, 0) AS DOUBLE) / b.n_tokens
                    ELSE 0.0 END AS top_word_frac,
               CASE WHEN b.n_chars > 0
                    THEN CAST(COALESCE(p.topbg, 0) AS DOUBLE) / b.n_chars
                    ELSE 0.0 END AS top_bigram_frac,
               CASE WHEN b.n_chars > 0
                    THEN CAST(COALESCE(p.duptg, 0) AS DOUBLE) / b.n_chars
                    ELSE 0.0 END AS dup_trigram_frac
        FROM base b LEFT JOIN perdoc p USING (doc_id)
    )
    SELECT *,
           (n_tokens < {text.MIN_TOKENS_FOR_REPETITION}
            OR (dup_line_frac <= {_RT["dup_line_frac"]}
                AND top_bigram_frac <= {_RT["top_bigram_frac"]}
                AND dup_trigram_frac <= {_RT["dup_trigram_frac"]}
                AND top_word_frac <= {_RT["top_word_frac"]})) AS keep
    FROM m
    """,
)
@plan_memo
def repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters
    (operators/text.repetition_metrics): duplicate-line fraction, top
    word/2-gram fractions, duplicated-3-gram character fraction, and the
    composite keep flag. Input is a lined corpus synthesized identically
    in both engines — each doc becomes three 8-token '\\n'-joined
    sentences, with every 6th doc's third sentence replaced by a repeat
    of its first, so the line and n-gram repetition paths (and the drop
    decision) are actually exercised."""
    docs = load_table(spark, "documents", sf_dir)
    t = F.split(F.trim("text"), r"\s+")
    s1 = F.concat_ws(" ", F.slice(t, 1, 8))
    s2 = F.concat_ws(" ", F.slice(t, 9, 8))
    s3 = F.concat_ws(" ", F.slice(t, 17, 8))
    lined = F.concat(
        s1,
        F.lit("\n"),
        s2,
        F.lit("\n"),
        F.when(F.col("doc_id") % 6 == 0, s1).otherwise(s3),
    )
    corpus = docs.select("doc_id", lined.alias("text"))
    return text.repetition_metrics(corpus)


def _pat(kind: str) -> str:
    return pii.PII_PATTERNS[kind][0]


#: DuckDB mirror of operators/pii.luhn_valid, inlined into the oracle:
#: same 1-based from-the-left index i, doubling when the position from
#: the right (len - i) is odd.
_CC_D = "replace(replace(m, ' ', ''), '-', '')"
_LUHN_SQL = f"""list_sum(list_transform(range(1, length({_CC_D}) + 1),
        i -> CASE WHEN (length({_CC_D}) - i) % 2 = 1
                  THEN CASE WHEN CAST(substr({_CC_D}, i, 1) AS INT) * 2 > 9
                            THEN CAST(substr({_CC_D}, i, 1) AS INT) * 2 - 9
                            ELSE CAST(substr({_CC_D}, i, 1) AS INT) * 2 END
                  ELSE CAST(substr({_CC_D}, i, 1) AS INT) END)) % 10 = 0"""


@register(
    "pii_scrub",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text
            || CASE WHEN doc_id % 7 = 0
                    THEN ' contact john.doe' || CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE '' END
            || CASE WHEN doc_id % 11 = 0
                    THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
            || CASE WHEN doc_id % 13 = 0
                    THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                         || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                    ELSE '' END
            || CASE WHEN doc_id % 17 = 0
                    THEN CASE WHEN doc_id % 2 = 0 THEN ' card 4111 1111 1111 1111'
                         ELSE ' card 1234-5678-9012-3456' END
                    ELSE '' END
            || CASE WHEN doc_id % 23 = 0
                    THEN ' intl +44 20 7946 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
            || CASE WHEN doc_id % 29 = 0
                    THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                         || '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END
            AS text
        FROM documents
    )
    , s1 AS (  -- counts are staged exactly like the operator's
        SELECT doc_id, text,
               regexp_replace(text, '{_pat("email")}', '<EMAIL>', 'g') AS t1
        FROM corpus
    ), s2 AS (
        SELECT *, regexp_replace(t1, '{_pat("cc")}', '<CC>', 'g') AS t2 FROM s1
    ), s3 AS (
        SELECT *, regexp_replace(t2, '{_pat("intl_phone")}', '<PHONE>', 'g') AS t3
        FROM s2
    ), s4 AS (
        SELECT *, regexp_replace(t3, '{_pat("phone")}', '<PHONE>', 'g') AS t4 FROM s3
    ), s5 AS (
        SELECT *, regexp_replace(t4, '{_pat("ssn")}', '<SSN>', 'g') AS t5 FROM s4
    ), cnts AS (
        SELECT doc_id,
               len(regexp_extract_all(text, '{_pat("email")}'))::INT AS n_email,
               len(regexp_extract_all(t1, '{_pat("cc")}'))::INT AS n_cc,
               len(regexp_extract_all(t2, '{_pat("intl_phone")}'))::INT AS n_intl_phone,
               len(regexp_extract_all(t3, '{_pat("phone")}'))::INT AS n_phone,
               len(regexp_extract_all(t4, '{_pat("ssn")}'))::INT AS n_ssn,
               len(regexp_extract_all(t5, '{_pat("ipv4")}'))::INT AS n_ipv4,
               len(list_filter(regexp_extract_all(t1, '{_pat("cc")}'),
                   m -> {_LUHN_SQL}))::INT AS n_cc_luhn_valid,
               regexp_replace(t5, '{_pat("ipv4")}', '<IP>', 'g') AS redacted
        FROM s5
    )
    SELECT doc_id, n_email, n_cc, n_intl_phone, n_phone, n_ssn, n_ipv4,
           n_cc_luhn_valid,
           (n_email + n_cc + n_intl_phone + n_phone + n_ssn + n_ipv4) > 0 AS has_pii,
           redacted
    FROM cnts
    """,
)
@plan_memo
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (operators/pii.scrub_pii): per-doc
    email / credit-card / intl-phone / NANP-phone / SSN / IPv4 counts,
    the Luhn-validated card count, has_pii flag, and the redacted text
    itself — the hash check verifies every replacement byte-for-byte.
    PII is injected deterministically in both engines (every 7th doc an
    email, 11th a phone, 13th an IPv4, 17th a card — alternating
    Luhn-valid/invalid so both checksum branches are exercised — 23rd an
    international phone, 29th an SSN; a doc can carry several). The
    oracle interpolates the operator's own PII_PATTERNS and mirrors its
    Luhn arithmetic so the two engines can never drift."""
    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.when(
            d % 7 == 0,
            F.concat(
                F.lit(" contact john.doe"), d.cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 11 == 0,
            F.concat(F.lit(" call 415-555-"), F.lpad((d % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            d % 13 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (d % 256).cast("string"),
                F.lit("."),
                ((d * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 17 == 0,
            F.when(d % 2 == 0, F.lit(" card 4111 1111 1111 1111")).otherwise(
                F.lit(" card 1234-5678-9012-3456")
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 23 == 0,
            F.concat(
                F.lit(" intl +44 20 7946 "), F.lpad((d % 10000).cast("string"), 4, "0")
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 29 == 0,
            F.concat(
                F.lit(" ssn "),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((d % 100).cast("string"), 2, "0"),
                F.lit("-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    from rta_registrations_pyspark_glue_spark.operators.spread import spread_ids

    # spread (r13): scrub_pii is one shuffle-free regex projection, so on
    # the one-file bench scan the whole query was a single 0.66 s task.
    corpus = spread_ids(docs.select("doc_id", injected.alias("text")))
    return pii.scrub_pii(corpus)


@register(
    "corpus_vocabulary",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split({SQL_NORM}, ' ')) AS token FROM documents
    ), tf0 AS (
        SELECT token, doc_id, COUNT(*) AS c FROM toks WHERE token <> ''
        GROUP BY token, doc_id
    ), vocab AS (
        SELECT token, CAST(SUM(c) AS BIGINT) AS tf, COUNT(*) AS df_docs
        FROM tf0 GROUP BY token
    ), top AS (
        SELECT token, tf, df_docs FROM vocab ORDER BY tf DESC, token LIMIT 100
    ), n AS (
        SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
        SELECT f.doc_id, f.token, f.c AS cnt, v.df_docs,
               CAST(f.c * n.n_docs AS DOUBLE) / v.df_docs AS score
        FROM tf0 f JOIN vocab v USING (token) CROSS JOIN n
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, token) AS rnk
        FROM scored
    )
    SELECT 'vocab' AS kind, token, tf, df_docs FROM top
    UNION ALL BY NAME
    SELECT 'tfidf' AS kind, doc_id, token, cnt, df_docs, score,
           CAST(rnk AS INT) AS rank
    FROM ranked WHERE rnk <= 3
    UNION ALL BY NAME
    SELECT 'heavy' AS kind, token,
           CAST(SUM(c) AS BIGINT) AS n_occurrences
    FROM tf0
    GROUP BY token
    HAVING SUM(c) * 500 > (SELECT SUM(c) FROM tf0)
    """,
)
@plan_memo
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary + per-doc characteristic terms in one
    union-tagged slot: 'vocab' rows are the top-100 tokens by total
    occurrences (tf) with document frequencies — the canonical two-level
    wordcount aggregate; 'tfidf' rows are each doc's top-3 terms by
    tf·(N/df) with the (score DESC, token ASC) total order
    (operators/text.vocabulary / tfidf_top_terms; see the latter's
    docstring for why the idf is the raw ratio, not a log). The N-docs
    scalar rides a 1-row broadcast join — the only sound way to put a
    corpus-level constant into a row expression without a driver
    action."""
    docs = load_table(spark, "documents", sf_dir)
    # Tokenize ONCE: both products derive from the same persisted
    # (doc, token, cnt) frame instead of re-exploding the corpus.
    counts = tracked_persist(text.doc_token_counts(docs))
    top = (
        text.vocabulary(docs, counts=counts)
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(100)
        .select(F.lit("vocab").alias("kind"), "token", "tf", "df_docs")
    )
    tfidf = text.tfidf_top_terms(docs, top_n=3, counts=counts).select(
        F.lit("tfidf").alias("kind"), "doc_id", "token", "cnt", "df_docs", "score", "rank"
    )
    # 'heavy' rows (round 7): EXACT heavy hitters via the Misra-Gries
    # sketch-then-verify pass (operators/sketches.py) over the RAW
    # token stream — deliberately not derived from the aggregated
    # counts frame, so the gate hash exercises the sketch path
    # (candidate generation + broadcast verification), whose final
    # output is exact and therefore SQL-mirrorable.
    tok_stream = docs.select(
        F.explode(F.split(text.normalize_text("text"), " ", -1)).alias("token")
    ).filter(F.col("token") != "")
    heavy = sketches.heavy_hitters(tok_stream, "token", k=500).select(
        F.lit("heavy").alias("kind"), "token", "n_occurrences"
    )
    return top.unionByName(tfidf, allowMissingColumns=True).unionByName(
        heavy, allowMissingColumns=True
    )


@register(
    "decontamination_report",
    oracle=rf"""
    WITH split AS (
        SELECT doc_id, text,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ), sh AS (
        SELECT doc_id, split,
               list_distinct(CASE WHEN len(t) < 3 THEN []
                   ELSE list_transform(range(1, len(t) - 1),
                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
        FROM (SELECT doc_id, split, string_split_regex({SQL_NORM}, '\s+') AS t
              FROM split)
    ), tr_post AS (
        SELECT doc_id AS train_id, unnest(s) AS shingle FROM sh WHERE split = 'train'
    ), tr AS (
        SELECT * FROM tr_post WHERE shingle IN (
            SELECT shingle FROM tr_post GROUP BY shingle HAVING COUNT(*) <= 50)
    ), ev_post AS (
        SELECT doc_id AS eval_id, unnest(s) AS shingle FROM sh WHERE split = 'test'
    ), hits AS (
        SELECT ev_post.eval_id, ev_post.shingle, tr.train_id
        FROM ev_post JOIN tr USING (shingle)
    ), per_pair AS (
        SELECT eval_id, train_id, COUNT(*) AS overlap FROM hits GROUP BY 1, 2
    ), top AS (
        SELECT eval_id, train_id, overlap FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_id
                ORDER BY overlap DESC, train_id) AS rn FROM per_pair) WHERE rn = 1
    ), cont AS (
        SELECT eval_id, COUNT(DISTINCT shingle) AS n_contaminated
        FROM hits GROUP BY 1
    )
    SELECT b.doc_id, len(b.s)::INT AS n_shingles,
           COALESCE(c.n_contaminated, 0) AS n_contaminated,
           CASE WHEN len(b.s) > 0
                THEN CAST(COALESCE(c.n_contaminated, 0) AS DOUBLE) / len(b.s)
                ELSE 0.0 END AS contamination,
           t.train_id AS top_train_id,
           COALESCE(t.overlap, 0) AS top_overlap
    FROM (SELECT doc_id, s FROM sh WHERE split = 'test') b
    LEFT JOIN cont c ON c.eval_id = b.doc_id
    LEFT JOIN top t ON t.eval_id = b.doc_id
    """,
)
@plan_memo
def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination over the engine's own split: the
    documents corpus is hash-split 80/10/10, and every test-split doc is
    scored for word-3-gram overlap against the train split
    (operators/textdedup.decontaminate — inverted-index join with
    stop-shingle skew cap). Oracle-backed since round 5 (the pytest
    DuckDB mirror was promoted into the registry when consolidation
    freed gate slots); hand-computed expectations remain in
    tests/test_extensions.py::test_decontaminate_*."""
    from rta_registrations_pyspark_glue_spark.operators.spread import spread_ids

    # spread (r13): the shingle projections of both split branches ran as
    # concurrent single tasks (four 1.2 s 1-task stages profiled) off the
    # one-file scan; one shared round-robin exchange fans them out.
    docs = spread_ids(load_table(spark, "documents", sf_dir).select("doc_id", "text"))
    d = sampling.hash_split(docs, "doc_id")
    train = d.filter(F.col("split") == "train").drop("split")
    ev = d.filter(F.col("split") == "test").drop("split")
    return textdedup.decontaminate(train, ev, max_shingle_df=50)


#: Token budget for the packed_sequences 'budget' rows — sized so the
#: prefix cut lands strictly inside the corpus at every gate sf
#: (500-doc corpora hold ~22k whitespace tokens; sf0.1's 5000 docs far
#: more), exercising both selected and cut documents.
_CURATION_BUDGET = 20_000


@register(
    "packed_sequences",
    oracle=r"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS okey
        FROM documents
    ), c AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY okey, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS stream_offset
        FROM d
    ), toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), quality AS (
        SELECT doc_id, {q} AS quality_score
        FROM toks
    ), bc AS (
        SELECT q.doc_id, q.quality_score, d.n_tokens,
               CAST(COALESCE(SUM(d.n_tokens) OVER (
                   ORDER BY q.quality_score DESC, q.doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS stream_offset
        FROM quality q JOIN d USING (doc_id)
    )
    SELECT 'pack' AS kind, doc_id, n_tokens, stream_offset,
           stream_offset // 512 AS seq_first,
           CASE WHEN n_tokens > 0 THEN (stream_offset + n_tokens - 1) // 512
                ELSE stream_offset // 512 END AS seq_last,
           stream_offset % 512 AS offset_in_seq
    FROM c
    UNION ALL BY NAME
    SELECT 'budget' AS kind, doc_id, quality_score,
           CAST(n_tokens AS BIGINT) AS n_tokens, stream_offset,
           (stream_offset + n_tokens) <= {budget} AS selected
    FROM bc
    """.replace("{budget}", str(_CURATION_BUDGET)).replace(
        "{q}", _quality_sql("t")
    ),
)
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both distributed-prefix-sum products under one union-tagged slot:
    - 'pack' rows: GPT-style sequence packing into 512-token sequences
      (operators/packing.pack_sequences — range repartition +
      per-partition offsets, never a single-task global window; the
      oracle's single-task window over the whole corpus is exactly what
      the operator avoids at scale). Layout invariants also pinned by
      tests/test_extensions.py::test_pack_sequences_*.
    - 'budget' rows: token-budget curation (packing.select_token_budget)
      — the corpus prefix-truncated to _CURATION_BUDGET tokens in
      (quality_score DESC, id) order; the hash pins every
      selected/cut decision and each selected doc's offset in the
      curated stream. The oracle recomputes the quality priority with
      the same formula the text_metrics oracle pins."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    # ONE whitespace-tokenization pass feeds both prefix-sum products:
    # base carries the 0-convention token count (blank text = 0, the
    # packers' contract — token_stats' array count says 1 there, so its
    # n_tokens is NOT reused) and the quality priority, persisted since
    # both branches and their shuffles read it.
    n0 = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(text.tokens("text"))
    )
    base = tracked_persist(
        docs.select("doc_id", "text", n0.alias("n_tokens")).join(
            text.quality_score(docs).select("doc_id", "quality_score"), "doc_id"
        )
    )
    pack = packing.pack_sequences(
        base, seq_len=512, token_count_col="n_tokens"
    ).select(F.lit("pack").alias("kind"), "*")
    budget = packing.select_token_budget(
        base, _CURATION_BUDGET, "quality_score", token_count_col="n_tokens"
    ).select(F.lit("budget").alias("kind"), "*")
    return pack.unionByName(budget, allowMissingColumns=True)


@register("packed_bins")
def packed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting bin packing of the documents corpus into
    128-token bins (operators/packing.pack_bins — best-fit-decreasing
    inside deterministic hash groups via applyInPandas; docs never
    straddle sequences, oversize docs flagged in solo bins). Rows-only:
    the assignment is iterative bin state, not SQL-expressible — the
    capacity/coverage/determinism invariants are pinned by
    tests/test_corpus_quality.py::test_pack_bins_*."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return packing.pack_bins(docs, seq_len=128, n_groups=8)


@register("bpe_merges")
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE vocabulary training on the documents corpus
    (operators/bpe.py): 30 merges learned from the top-2000 words,
    returned as the ordered merge table (rank, left, right, merged).
    Rows-only: the trainer is ITERATIVE (per-round best-pair selection
    feeds the next round's pair counts), the documented
    non-SQL-expressible case — determinism is instead pinned
    merge-for-merge against an independent pure-Python reference
    implementation in tests/test_bpe.py, and the encode side is pinned
    by detokenization-roundtrip tests."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    merges = bpe.train_bpe(docs, n_merges=30, max_words=2000)
    return bpe.merges_df(spark, merges)
