"""Distributed byte-pair-encoding (BPE) vocabulary training + encoding.

The canonical subword-tokenizer trainer (Sennrich et al. 2016, public
algorithm; the merge-list format is the one GPT-2/RoBERTa vocabularies
ship) re-expressed Spark-first:

- **Pre-tokenization** is one corpus scan: whitespace words →
  ``(word, count)`` — the classic BPE frequency dictionary. Everything
  after runs on the DISTINCT-word table, which grows sublinearly in
  corpus size (and is optionally capped to the top-``max_words`` by
  count — the standard practical move, deterministic here via
  (count DESC, word ASC) ranking).
- **Each merge iteration** is three cheap distributed steps on that
  table: explode adjacent symbol pairs weighted by word count
  (map-side combine → one small shuffle on the pair domain), take the
  top-1 pair under the DETERMINISTIC total order
  (count DESC, pair ASC) — a 1-row TakeOrdered, the only driver
  action per round — and a map-only rewrite merging that pair inside
  each word's symbol array (Arrow-batched pandas; the fold is
  per-row). ``localCheckpoint`` every few rounds stops logical-plan
  growth, the same discipline as operators/graph.py.
- **Encoding** applies the learned ranks with the standard greedy
  lowest-rank-first loop per word, Arrow-batched, with an LRU-ish
  per-batch word cache (real corpora repeat words heavily).

Determinism contract: integer counts + total-order tie-breaks ⇒ the
merge list is a pure function of the corpus. tests/test_bpe.py pins it
against an INDEPENDENT pure-Python reference implementation of the
published algorithm, and the ``bpe_merges`` gate entry records it
rows-only (iterative training is the documented non-SQL-expressible
case).

100 TB design: corpus-size-dependent work is exactly one scan
(pre-tokenization). Iterations touch only the capped word table;
pair-count shuffles carry ≤ |words|·avg_len rows of a few bytes.
End-of-word is modelled with the trailing marker ``</w>`` (the
original formulation), so merges never cross word boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """(word, n): whitespace-word frequency dictionary; optionally the
    deterministic top-``max_words`` by (n DESC, word ASC)."""
    wc = (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words is not None:
        wc = wc.orderBy(F.col("n").desc(), "word").limit(max_words)
    return wc


def _merge_pair_in_rows(left: str, right: str):
    """Arrow-batched rewrite: merge every adjacent (left, right) symbol
    occurrence, left-to-right non-overlapping (the published rule)."""
    merged = left + right

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                syms = list(syms)
                res = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame(
                {"word": pdf["word"], "n": pdf["n"], "syms": out}
            )

    return op


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int | None = None,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...]. Stops early when no pair
    occurs twice (nothing left worth merging)."""
    spark = df.sparkSession
    words = word_counts(df, text_col, max_words).select(
        "word",
        "n",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
    )
    words = words.persist()
    words.count()  # materialize before the loop
    merges: list[tuple[str, str]] = []
    schema = "word string, n bigint, syms array<string>"
    try:
        for it in range(n_merges):
            pairs = (
                words.select(
                    "n",
                    F.explode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1), "
                            "(s, i) -> struct(s AS a, syms[i + 1] AS b))"
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("n").alias("cnt"))
            )
            top = pairs.orderBy(
                F.col("cnt").desc(), F.col("a"), F.col("b")
            ).limit(1).collect()
            if not top or top[0]["cnt"] < 2:
                break
            left, right = top[0]["a"], top[0]["b"]
            merges.append((left, right))
            old = words
            words = words.mapInPandas(
                _merge_pair_in_rows(left, right), schema
            ).persist()
            if (it + 1) % checkpoint_every == 0:
                words = words.localCheckpoint()
            words.count()
            old.unpersist()
    finally:
        try:
            words.unpersist()
        except Exception:
            pass
    del spark
    return merges


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Learned merge list as a DataFrame (rank, left, right, merged) —
    the durable artifact (write it as parquet; broadcast it to encode)."""
    rows = [
        (rank, left, right, left + right)
        for rank, (left, right) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly apply the
    lowest-ranked applicable merge (the standard inference loop)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best = (syms[i], syms[i + 1])
        if best is None:
            break
        left, right = best
        res = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                res.append(left + right)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens, n_tokens): documents encoded with a learned merge
    list. Arrow-batched; per-batch word memoization exploits the
    Zipfian repetition of real text."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in str(text).split():
                    if w not in cache:
                        cache[w] = encode_word(w, ranks)
                    toks.extend(cache[w])
                toks_col.append(toks)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks_col,
                    "n_tokens": [len(t) for t in toks_col],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        op, f"{id_col} bigint, tokens array<string>, n_tokens int"
    )
