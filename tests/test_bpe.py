"""Distributed BPE trainer/encoder contract (operators/bpe.py).

The trainer must be a PURE FUNCTION of the corpus: integer pair counts
with the (count DESC, pair ASC) total order make every merge decision
deterministic, so the distributed implementation is pinned MERGE-FOR-
MERGE against an independent pure-Python reference implementation of
the published algorithm (frequency dict → iterative best-pair merge),
written from the paper, sharing no code with the operator.
"""

from __future__ import annotations

import collections

import numpy as np
import pytest

from rta_registrations_pyspark_glue_spark.operators import bpe


# ------------------------ independent reference -----------------------


def _ref_train(word_freqs: dict[str, int], n_merges: int):
    """Sennrich-style reference: symbol sequences per word, best pair
    by (count desc, pair asc), left-to-right non-overlapping merge."""
    vocab = {
        tuple(list(w) + [bpe.END]): n for w, n in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = collections.defaultdict(int)
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _cnt = best
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = n
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
]


def _corpus_freqs(lines):
    freqs: dict[str, int] = collections.defaultdict(int)
    for line in lines:
        for w in line.split():
            freqs[w] += 1
    return dict(freqs)


def test_reference_reproduces_paper_shape():
    # the classic low/lower/newest/widest-style corpus: frequent word
    # endings merge early; sanity-check the reference itself
    merges = _ref_train(_corpus_freqs(CORPUS), 10)
    assert len(merges) == 10
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in merges)


def test_distributed_trainer_matches_reference_exactly(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )
    got = bpe.train_bpe(df, n_merges=12)
    want = _ref_train(_corpus_freqs(CORPUS), 12)
    assert got == want


def test_distributed_trainer_matches_reference_on_random_corpus(spark):
    rng = np.random.default_rng(0xB9E)
    vocab = ["ab", "abc", "abcd", "bcd", "cd", "dab", "aab", "bb", "ccc"]
    lines = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "doc_id bigint, text string"
    )
    got = bpe.train_bpe(df, n_merges=20)
    want = _ref_train(_corpus_freqs(lines), 20)
    assert got == want


def test_trainer_stops_when_nothing_repeats(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id bigint, text string"
    )
    # every word is a single char: the only pairs are (char, </w>),
    # each with count 1 -> no merge is worth making
    got = bpe.train_bpe(df, n_merges=5)
    assert got == []


def test_max_words_cap_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )
    freqs = _corpus_freqs(CORPUS)
    top3 = dict(
        sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    )
    got = bpe.train_bpe(df, n_merges=8, max_words=3)
    want = _ref_train(top3, 8)
    assert got == want


def test_encode_inverts_to_original_text(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id bigint, text string"
    )
    merges = bpe.train_bpe(df, n_merges=10)
    enc = {
        r.doc_id: (list(r.tokens), r.n_tokens)
        for r in bpe.bpe_encode(df, merges).collect()
    }
    for i, line in enumerate(CORPUS):
        toks, n = enc[i]
        assert n == len(toks)
        # detokenize: </w> marks word ends
        text = "".join(toks).replace(bpe.END, " ").strip()
        assert text == " ".join(line.split())


def test_encode_word_greedy_rank_order():
    # merges: (e,s) rank 0, (es,t) rank 1, (t,</w>) rank 2
    ranks = {("e", "s"): 0, ("es", "t"): 1, ("t", bpe.END): 2}
    assert bpe.encode_word("est", ranks) == ["est", bpe.END]
    assert bpe.encode_word("set", ranks) == ["s", "e", "t" + bpe.END]


def test_merges_df_roundtrip(spark):
    merges = [("a", "b"), ("ab", "c")]
    rows = bpe.merges_df(spark, merges).orderBy("rank").collect()
    assert [(r.left, r.right, r.merged) for r in rows] == [
        ("a", "b", "ab"),
        ("ab", "c", "abc"),
    ]


@pytest.mark.parametrize("word", ["", "a", "hello", "aaaa"])
def test_encode_word_edge_cases(word):
    assert "".join(bpe.encode_word(word, {})) == word + bpe.END
