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
from rta_registrations_pyspark_glue_spark.operators import graph, packing, sampling, text, textdedup
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

# Normalized text in DuckDB — must match operators.text.normalize_text.
SQL_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ token-dropped copies of every 5th doc."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    toks = F.split(F.trim("text"), r"\s+")
    # Spark filter lambda index is 0-based; DuckDB's is 1-based — hence i+1.
    perturbed = F.concat_ws(
        " ", F.filter(toks, lambda x, i: (i + 1) % 7 != 0)
    )
    copies = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), perturbed.alias("text"))
    )
    # The docs parquet is a single small file → 1-2 input partitions; the
    # shingle/MinHash work downstream is CPU-bound per row, so spread it
    # across the cores (a 6k-row shuffle is free; at real scale the input
    # is already many files and this is a no-op sizing choice).
    return docs.unionByName(copies).repartition(
        spark.sparkContext.defaultParallelism
    )


SQL_NEAR_CORPUS = r"""
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(
                   list_filter(string_split_regex(trim(text), '\s+'),
                               (x, i) -> i % 7 != 0), ' ') AS text
        FROM documents WHERE doc_id % 5 = 0
"""


# Interpolated from the operator's own constant (quote-doubled for the
# SQL literal) so the two engines can never drift apart silently.
_BPE_SQL_LIT = "'" + text.BPE_TOKEN_PATTERN.replace("'", "''") + "'"


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
           (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 0.4 ELSE 0.0 END
            + least(stopword_ratio * 3, 0.3)
            + least(unique_ratio, 0.3)) AS quality_score
    FROM stats
    UNION ALL BY NAME
    SELECT 'lang' AS kind, doc_id, score_en, score_es, score_de, score_fr,
           CASE WHEN greatest(score_en, score_es, score_de, score_fr) = 0 THEN 'und'
                WHEN score_en = greatest(score_en, score_es, score_de, score_fr) THEN 'en'
                WHEN score_es = greatest(score_en, score_es, score_de, score_fr) THEN 'es'
                WHEN score_de = greatest(score_en, score_es, score_de, score_fr) THEN 'de'
                ELSE 'fr' END AS predicted_lang
    FROM lang_scores
    """,
)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics, composite quality score, and marker-word
    language ID in one union-tagged result ('stats' / 'quality' / 'lang'
    rows; columns absent from a row kind are NULL). One gate slot pins
    all three row-local text-analysis operators."""
    docs = load_table(spark, "documents", sf_dir)
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
    return stats.unionByName(quality, allowMissingColumns=True).unionByName(
        lang, allowMissingColumns=True
    )


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5({SQL_NORM}) AS fp_md5,
           sha256({SQL_NORM}) AS fp_sha256
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints over normalized text."""
    return text.fingerprint(load_table(spark, "documents", sf_dir))


@register(
    "exact_dedup_documents",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 2000000 AS doc_id, text
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT md5({SQL_NORM}) AS content_key,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS n_copies
    FROM corpus
    GROUP BY 1
    """,
)
def exact_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash over a corpus with injected exact
    copies — every 10th doc appears twice, and must collapse to one
    group with n_copies=2."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    return textdedup.exact_duplicates(docs.unionByName(copies))


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


# The full candidate-generation + verification CTE stack, shared by the
# pair query and the clustering query built on top of it.
_MINHASH_CTES = f"""corpus AS (
        {SQL_NEAR_CORPUS}
    ), normed AS (
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


@register(
    "minhash_lsh_near_dups",
    oracle=f"""
    WITH {_MINHASH_CTES}
    SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.35
    """,
)
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


def _simhash_pairs_sql(n_bands: int = 4, max_hamming: int = 3) -> str:
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    bands = "\n        UNION ALL ".join(
        f"SELECT doc_id, simhash, {t} AS band, (simhash >> {t * band_bits}) & {mask} AS bkey FROM fp"
        for t in range(n_bands)
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
def simhash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprints over the documents table ('fp' rows,
    majority vote over token-hash bits) and Hamming-≤3 near-dup pairs
    over the injected near-dup corpus ('pair' rows, exact 4-band
    bucketing: any pair within distance 3 shares a full 16-bit slice by
    pigeonhole — no recall loss) in one union-tagged result. One gate
    slot pins both the fingerprint values and the banded pair
    semantics."""
    fp = textdedup.simhash_fingerprints(
        load_table(spark, "documents", sf_dir)
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
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           c.doc_id = c.cluster_id AS is_canonical
    FROM comp c JOIN sizes s USING (cluster_id)
    """,
    expensive=True,
)
def near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after pair detection that an actionable dedup needs:
    MinHash-LSH near-dup pairs → connected components (min-label
    propagation, operators/graph.py) → one cluster id per document,
    cluster sizes, and a deterministic canonical survivor (minimum id)
    per cluster. ``filter(is_canonical)`` IS the deduplicated corpus.
    The oracle mirrors the fixpoint with a recursive transitive-closure
    CTE over the identical verified pair set."""
    corpus = tracked_persist(_near_dup_corpus(spark, sf_dir))
    cands = textdedup.minhash_lsh_candidates(corpus)
    pairs = textdedup.jaccard_verify(cands, corpus, threshold=0.35)
    return graph.dedup_clusters(corpus.select("doc_id"), pairs)


@register(
    "dataset_split",
    oracle="""
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
    """,
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two dataset-split modes under one union-tagged slot:
    - 'hash' rows: deterministic 80/10/10 train/val/test keyed on
      md5(doc_id) — reproducible across engines and runs, stable under
      corpus growth, zero-shuffle scan-side labeling.
    - 'stratified' rows: EXACT per-language quotas — within each lang,
      rows ranked by (md5, id) are cut at ceil(0.8·n)/ceil(0.9·n), so
      every stratum hits its fractions exactly (hash_split only
      converges in expectation, under-representing small strata). One
      group-key shuffle (operators/sampling.py:stratified_split)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    h = (
        sampling.hash_split(docs.select("doc_id"), "doc_id")
        .withColumn("bucket", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4))
        .withColumn("row_kind", F.lit("hash"))
        .select("row_kind", "doc_id", "bucket", "split")
    )
    s = (
        sampling.stratified_split(docs, "doc_id", "lang")
        .withColumn("row_kind", F.lit("stratified"))
        .select("row_kind", "doc_id", "lang", "split")
    )
    return h.unionByName(s, allowMissingColumns=True)


@register("decontamination_report")
def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination over the engine's own split: the
    documents corpus is hash-split 80/10/10, and every test-split doc is
    scored for word-3-gram overlap against the train split
    (operators/textdedup.decontaminate — inverted-index join with
    stop-shingle skew cap). Rows-only by gate-slot policy (the 50
    oracle-backed slots are saturated); the operator's arithmetic is
    pinned by tests/test_extensions.py::test_decontaminate_* with
    hand-computed expectations."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    d = sampling.hash_split(docs, "doc_id")
    train = d.filter(F.col("split") == "train").drop("split")
    ev = d.filter(F.col("split") == "test").drop("split")
    return textdedup.decontaminate(train, ev, max_shingle_df=50)


@register("packed_sequences")
def packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing of the documents corpus into 512-token
    sequences (operators/packing.pack_sequences — distributed prefix sum
    via range repartition + per-partition offsets, never a single-task
    global window). Rows-only by gate-slot policy; packing arithmetic is
    pinned by tests/test_extensions.py::test_pack_sequences_* against a
    Python recomputation of the exact cumulative layout."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return packing.pack_sequences(docs, seq_len=512)
