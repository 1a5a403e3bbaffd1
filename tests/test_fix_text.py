"""ftfy-lite text repair contract (operators/text.fix_text).

Hand-computed expectations for every repair class, pinned against the
codegen expression chain; the DuckDB oracle (text_metrics 'fix' rows)
is the independent third copy.
"""

from __future__ import annotations

import pytest

from rta_registrations_pyspark_glue_spark.operators import text


def _fix_one(spark, raw: str):
    df = spark.createDataFrame([(0, raw)], "doc_id bigint, text string")
    row = text.fix_text(df).collect()[0]
    return row.fixed_text, row.fix_changed, row.n_chars_delta


def test_mojibake_pairs(spark):
    cases = {
        "itâ€™s": "it's",
        "cafÃ©": "café",
        "â€œquotedâ€\u009d": '"quoted"',
        "naÃ¯ve stays": "naÃ¯ve stays",  # ï pair not in map: untouched
        "piÃ±ata Ã¼ber": "piñata über",
    }
    for raw, want in cases.items():
        got, changed, _ = _fix_one(spark, raw)
        assert got == want, raw
        assert changed == (raw != want)


def test_line_endings_normalized(spark):
    got, changed, delta = _fix_one(spark, "a\r\nb\rc")
    assert got == "a\nb\nc"
    assert changed and delta == 1  # CRLF -> LF drops one char


def test_invisible_characters_stripped(spark):
    got, _, delta = _fix_one(spark, "a​b‌c‍d﻿e")
    assert got == "abcde" and delta == 4
    got, _, _ = _fix_one(spark, "x y")
    assert got == "x y"  # NBSP becomes a real space, not deleted


def test_control_chars_stripped_tab_newline_kept(spark):
    got, _, _ = _fix_one(spark, "a\x00b\x07c\td\ne\x7ff")
    assert got == "abc\td\nef"


def test_newline_runs_collapse(spark):
    got, _, _ = _fix_one(spark, "a\n\n\n\n\nb\n\nc")
    assert got == "a\n\nb\n\nc"


def test_clean_text_unchanged(spark):
    clean = "A perfectly ordinary line.\nAnd another, with café."
    got, changed, delta = _fix_one(spark, clean)
    assert got == clean and not changed and delta == 0


def test_order_crlf_before_collapse(spark):
    # three CRLFs become three LFs which must then collapse to two
    got, _, _ = _fix_one(spark, "a\r\n\r\n\r\nb")
    assert got == "a\n\nb"


def test_zero_udf_plan(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    plan = text.fix_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.parametrize("raw", ["", "\r", "​", "\n\n\n"])
def test_degenerate_inputs(spark, raw):
    got, _, _ = _fix_one(spark, raw)
    assert isinstance(got, str)


# ------------------------- chunk_documents ---------------------------


def _chunks(spark, text_str, chunk_tokens=8, overlap=2):
    from rta_registrations_pyspark_glue_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(0, text_str)], "doc_id bigint, text string")
    rows = chunk_documents(df, chunk_tokens, overlap).orderBy("chunk_idx").collect()
    return [(r.chunk_idx, r.chunk_text, r.n_chunk_tokens) for r in rows]


def test_chunking_boundaries_hand_computed(spark):
    words = [f"w{i}" for i in range(20)]
    got = _chunks(spark, " ".join(words), chunk_tokens=8, overlap=2)
    # stride 6: starts 0, 6, 12 (ceil(max(20-2,1)/6) = 3)
    assert got == [
        (0, " ".join(words[0:8]), 8),
        (1, " ".join(words[6:14]), 8),
        (2, " ".join(words[12:20]), 8),
    ]


def test_chunking_short_doc_single_chunk(spark):
    assert _chunks(spark, "a b c") == [(0, "a b c", 3)]
    assert _chunks(spark, "solo") == [(0, "solo", 1)]


def test_chunking_final_partial_chunk(spark):
    words = [f"w{i}" for i in range(21)]
    got = _chunks(spark, " ".join(words), chunk_tokens=8, overlap=2)
    # starts 0, 6, 12, 18 (ceil(19/6) = 4); last chunk has 3 tokens
    assert len(got) == 4
    assert got[-1] == (3, " ".join(words[18:21]), 3)


def test_chunking_overlap_reconstructs_document(spark):
    words = [f"t{i}" for i in range(50)]
    got = _chunks(spark, " ".join(words), chunk_tokens=10, overlap=4)
    seen = []
    for idx, ctext, _n in got:
        toks = ctext.split()
        start = idx * 6
        assert toks == words[start : start + 10]
        seen.extend(toks[4:] if idx else toks)
    # de-overlapped concatenation restores the document exactly
    assert seen == words


def test_chunking_rejects_bad_overlap(spark):
    from rta_registrations_pyspark_glue_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=8, overlap=8)
