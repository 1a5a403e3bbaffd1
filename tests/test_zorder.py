"""Z-order clustering contract (operators/zorder.py).

Three layers: the Morton key expression against a hand-written Python
interleave; the physical layout against parquet FOOTER statistics
(pyarrow — the exact metadata a data-skipping scan consults), proving
per-file envelopes tighten on BOTH keys vs a lexicographic sort; and
the skew story (rank normalization keeps file occupancy balanced when
a key is exponentially skewed).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import zorder


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_morton_key_matches_reference(spark):
    rows = [(a, b) for a in range(0, 256, 37) for b in range(0, 256, 41)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zorder.morton_key([F.col("a"), F.col("b")], bits=8).alias("k")
    ).collect()
    for r in got:
        assert r.k == _py_morton([r.a, r.b], 8), (r.a, r.b)


def test_morton_key_three_dims(spark):
    df = spark.createDataFrame([(5, 3, 7)], "a long, b long, c long")
    k = df.select(
        zorder.morton_key([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("k")
    ).collect()[0].k
    assert k == _py_morton([5, 3, 7], 4)


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """A 64x64 uniform grid written as 16 files: lexicographic layout
    prunes well on the leading key and NOT AT ALL on the second;
    z-order must prune well on BOTH (the whole point)."""
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long").repartition(8)

    lex_path = str(tmp_path / "lex")
    (
        df.repartitionByRange(16, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.parquet(lex_path)
    )
    z_path = str(tmp_path / "z")
    zorder.zorder_by(df, ["x", "y"], n_files=16).write.parquet(z_path)

    lex_env = zorder.file_envelopes(lex_path, ["x", "y"])
    z_env = zorder.file_envelopes(z_path, ["x", "y"])
    assert len(z_env) == 16
    assert sum(e["n_rows"] for e in z_env) == 64 * 64

    # average skipping over a probe set of point predicates
    probes = list(range(4, 64, 8))
    def avg_skip(env, col):
        return sum(zorder.skipping_ratio(env, col, v) for v in probes) / len(probes)

    lex_x, lex_y = avg_skip(lex_env, "x"), avg_skip(lex_env, "y")
    z_x, z_y = avg_skip(z_env, "x"), avg_skip(z_env, "y")
    # lexicographic: leading key prunes, second key dead
    assert lex_x > 0.7
    assert lex_y < 0.1
    # z-order: BOTH keys prune meaningfully
    assert z_x > 0.5, (z_x, z_y)
    assert z_y > 0.5, (z_x, z_y)


def test_rank_normalization_handles_skew(spark, tmp_path):
    """Exponentially skewed key: raw values would crowd 99% of rows
    into one curve cell; percent-rank normalization keeps the files
    balanced (no file holds more than ~3x its fair share)."""
    rows = [(i, 2 ** min(i % 1024 // 64, 16)) for i in range(4096)]
    df = spark.createDataFrame(rows, "i long, v long")
    path = str(tmp_path / "skew")
    zorder.zorder_by(df, ["i", "v"], n_files=8).write.parquet(path)
    env = zorder.file_envelopes(path, ["i"])
    sizes = [e["n_rows"] for e in env]
    assert sum(sizes) == 4096
    assert max(sizes) <= 3 * (4096 // 8)


def test_output_schema_unchanged_and_complete(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "k long, v long, s string"
    )
    out = zorder.zorder_by(df, ["k", "v"], n_files=2)
    assert out.columns == ["k", "v", "s"]
    assert sorted(r.k for r in out.collect()) == [1, 2, 3]


def test_nulls_cluster_low(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None if i % 10 == 0 else i) for i in range(100)], "i long, v long"
    )
    path = str(tmp_path / "nulls")
    zorder.zorder_by(df, ["i", "v"], n_files=4).write.parquet(path)
    total = sum(e["n_rows"] for e in zorder.file_envelopes(path, ["i"]))
    assert total == 100  # NULL keys never drop rows


def test_no_udf_in_plan(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    plan = (
        zorder.zorder_by(df, ["a", "b"], n_files=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
