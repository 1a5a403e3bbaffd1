"""Gate-adjacent parity for DERIVED blocking schemes (r7 verdict item 3).

The oracle-checked queries pin the floor schemes (simhash (4 bands, r=1);
hyperplane LSH (4 bits, 24 bands)). The adaptive derivations
(derive_simhash_scheme / derive_lsh_bank) were pytest-only: correct by
the floor-parity construction but never hash-compared against a DuckDB
mirror built from the SAME derived parameters. These tests close that
gap: derive a NON-floor scheme, run the Spark operator under it, build
the mirror SQL from the identical parameters, and compare exactly —
pairs AND values — at sf0.1 (documents) / sf0.01 (embeddings).
"""

from __future__ import annotations

import duckdb
import pytest

from rta_registrations_pyspark_glue_spark.operators import similarity, textdedup

SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"


def _duck(sf_dir: str, tables=("documents", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_derived_simhash_scheme_oracle_parity(spark):
    """A derived (5, 2) Manku scheme — non-floor — must hash-match the
    generalized DuckDB mirror built from the SAME (n_bands, r)."""
    from rta_registrations_pyspark_glue_spark.plans.queries_text import (
        _near_dup_corpus,
        _simhash_pairs_sql,
    )

    # Derive for real: a tight per-bucket target pushes the scheme past
    # the (4, 1) floor exactly as a 10^9-doc corpus would.
    n_bands, r = textdedup.derive_simhash_scheme(2500, target_bucket_rows=0.01)
    assert (n_bands, r) != (4, 1) and r > 1

    corpus = _near_dup_corpus(spark, SF01)
    got = {
        (r_["id_a"], r_["id_b"], r_["hamming"])
        for r_ in textdedup.simhash_near_pairs(
            corpus, n_bands=n_bands, r=r
        ).collect()
    }

    con = _duck(SF01, tables=("documents",))
    want = {
        (ia, ib, h)
        for ia, ib, h in con.execute(
            _simhash_pairs_sql(n_bands=n_bands, max_hamming=3, r=r)
        ).fetchall()
    }
    assert len(want) > 0, "vacuous: derived scheme surfaced no pairs"
    assert got == want
    # And the derived scheme loses nothing vs the floor: exact banding +
    # exact verify make the final pair set scheme-independent.
    floor = {
        (ia, ib, h)
        for ia, ib, h in con.execute(
            _simhash_pairs_sql(n_bands=4, max_hamming=3, r=1)
        ).fetchall()
    }
    assert got == floor


def test_derived_lsh_bank_oracle_parity(spark):
    """A derived non-floor hyperplane bank must hash-match the DuckDB
    mirror parameterized with the SAME (bits_per_band, n_bands) —
    cosines bit-for-bit (both engines fold sequentially)."""
    from rta_registrations_pyspark_glue_spark.plans.queries_similarity import (
        _bucketed_near_dup_oracle,
    )
    from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

    threshold = 0.45
    advice = similarity.derive_lsh_bank(threshold)
    kw = advice.as_kwargs()
    assert (kw["bits_per_band"], kw["n_bands"]) != (4, 24)  # non-floor

    emb = load_table(spark, "embeddings", SF001)
    cands = similarity.hyperplane_lsh_candidates(emb, **kw)
    got = {
        (r_["id_a"], r_["id_b"], repr(r_["cosine"]))
        for r_ in similarity.cosine_verify(
            cands, emb, threshold=threshold
        ).collect()
    }

    con = _duck(SF001, tables=("embeddings",))
    want = {
        (ia, ib, repr(c))
        for ia, ib, c in con.execute(
            _bucketed_near_dup_oracle(threshold=threshold, **kw)
        ).fetchall()
    }
    assert len(want) > 0, "vacuous: derived bank surfaced no pairs"
    assert got == want


def test_derived_lsh_bank_flags_superlinear_regime(spark):
    """The honesty contract: at the gate corpus's near-orthogonal 0.35
    threshold the S-curve says NO bank is sub-quadratic — the advice
    must say so (superlinear=True + UserWarning), recommending IVF."""
    with pytest.warns(UserWarning, match="ivf"):
        advice = similarity.derive_lsh_bank(0.35)
    assert advice.superlinear
