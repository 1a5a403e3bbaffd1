"""URL normalization + domain curation contract (operators/urls.py).

Each rewrite pinned individually, the registrable-domain rule across
suffix classes, and the per-domain quota's determinism under
repartitioning. The DuckDB-side check is cleaning_suite's 'url' rows
(every rewrite mirrored with the same RE2∩Java patterns)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import urls


def _norm_one(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], "u string")
    return df.select(urls.normalize_url(F.col("u")).alias("n")).first()["n"]


def test_normalize_rewrites(spark):
    cases = {
        # fragment
        "https://a.com/p#frag": "https://a.com/p",
        # utm mid-query keeps following params, trailing loses its sep
        "https://a.com/p?utm_source=x&id=5": "https://a.com/p?id=5",
        "https://a.com/p?id=5&utm_campaign=y": "https://a.com/p?id=5",
        "https://a.com/p?utm_only=1": "https://a.com/p",
        # runs of ADJACENT utm params go in one match (global replace
        # never rescans replaced text)
        "https://a.com/p?utm_a=1&utm_b=2&id=3": "https://a.com/p?id=3",
        "https://a.com/p?id=3&utm_a=1&utm_b=2": "https://a.com/p?id=3",
        "https://a.com/p?utm_a=1&utm_b=2&utm_c=3": "https://a.com/p",
        "https://a.com/p?utm_a&x&utm_b&utm_c&y": "https://a.com/p?x&y",
        # anchored to ?/& — "utm_" inside a VALUE or a PATH segment
        # must survive (the round-9 mid-query pattern mangled both)
        "https://a.com/p?a=butm_x=1&b=2": "https://a.com/p?a=butm_x=1&b=2",
        "https://a.com/x/utm_a&b/y": "https://a.com/x/utm_a&b/y",
        "https://a.com/p?xutm_k=1&id=2": "https://a.com/p?xutm_k=1&id=2",
        # scheme/authority lowercased, path+query case PRESERVED
        "HTTPS://A.COM/PaTh?Q=Mixed": "https://a.com/PaTh?Q=Mixed",
        # default ports stripped per scheme, others kept
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        "https://a.com:80/x": "https://a.com:80/x",  # not https default
        # www. and trailing slash
        "https://www.a.com/x/": "https://a.com/x",
        "http://WWW.A.com/": "http://a.com",
    }
    for raw, want in cases.items():
        assert _norm_one(spark, raw) == want, raw


_DOMAIN_CASES = [
    ("news.site1.co.uk", "site1.co.uk"),
    ("a.b.site2.com.au", "site2.com.au"),
    ("deep.sub.site3.com", "site3.com"),
    ("site4.org", "site4.org"),
    ("gov.uk", "gov.uk"),  # bare suffix: best-effort two labels
    # r10 PSL cases — the r9 6-suffix regex got all of these wrong
    ("news.shop.co.kr", "shop.co.kr"),
    ("x.y.site5.com.cn", "site5.com.cn"),
    ("portal.gob.mx", "portal.gob.mx"),
    # 3-label exact rule: vic.edu.au registers at the FOURTH label
    ("myschool.vic.edu.au", "myschool.vic.edu.au"),
    ("deep.sub.myschool.vic.edu.au", "myschool.vic.edu.au"),
    # wildcard *.ck: any <label>.ck is itself a suffix
    ("a.gov.ck", "a.gov.ck"),
    ("x.a.gov.ck", "a.gov.ck"),
    ("gov.ck", "gov.ck"),  # bare wildcard suffix
    # exception !www.ck beats the wildcard
    ("www.ck", "www.ck"),
    ("sub.www.ck", "www.ck"),
    # r11 full-list shapes (the vendored subset had none of these):
    # PRIVATE-section 2-label exact rule — per-user subdomain hosting
    ("user.github.io", "user.github.io"),
    ("assets.user.github.io", "user.github.io"),
    # 4-label exact rule (a.prod.fastly.net): registers at label five
    ("x.a.prod.fastly.net", "x.a.prod.fastly.net"),
    ("y.x.a.prod.fastly.net", "x.a.prod.fastly.net"),
    # 5-label exact rule: registers at label six
    ("app.cn-north-1.eb.amazonaws.com.cn",
     "app.cn-north-1.eb.amazonaws.com.cn"),
    # 2-label wildcard base (*.0emm.com): <label>.0emm.com is a suffix
    ("bar.foo.0emm.com", "bar.foo.0emm.com"),
    ("foo.0emm.com", "foo.0emm.com"),  # bare wildcard suffix
    # ...but the bare BASE is NOT covered by the wildcard — plain .com
    ("0emm.com", "0emm.com"),
    # 3-label exception beats the *.kawasaki.jp wildcard
    ("city.kawasaki.jp", "city.kawasaki.jp"),
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
    ("x.y.kawasaki.jp", "x.y.kawasaki.jp"),
]


def test_registrable_domain_rule(spark):
    df = spark.createDataFrame(_DOMAIN_CASES, "host string, want string")
    out = df.select(
        urls.registrable_domain(F.col("host")).alias("got"), "want"
    ).collect()
    for r in out:
        assert r.got == r.want, r


def test_registrable_domain_sql_mirror():
    """The DuckDB mirror must agree with Spark on every rule shape —
    both sides are generated from the same load_psl() parse, and this
    pins that the generated SQL actually implements the same CASE."""
    import duckdb

    con = duckdb.connect()
    sql = urls.registrable_domain_sql("host")
    for host, want in _DOMAIN_CASES:
        got = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS host)", [host]
        ).fetchone()[0]
        assert got == want, (host, got, want)


def test_registrable_domain_regex_fallback(spark):
    """A missing PSL data file degrades to the r9 built-in regex subset
    (documented fallback), never breaks."""
    assert urls.load_psl("/nonexistent/psl.dat") is None
    got = (
        spark.createDataFrame([("news.site1.co.uk",)], "host string")
        .select(
            urls.registrable_domain(
                F.col("host"), psl_path="/nonexistent/psl.dat"
            ).alias("got")
        )
        .first()["got"]
    )
    assert got == "site1.co.uk"


def test_cap_per_domain_deterministic_under_repartition(spark):
    rows = [
        (i, f"https://site{i % 3}.com/p/{i}") for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url_norm string")
    a = {
        (r.doc_id, r.domain_rank, r.kept)
        for r in urls.cap_per_domain(df, cap=4).collect()
    }
    b = {
        (r.doc_id, r.domain_rank, r.kept)
        for r in urls.cap_per_domain(df.repartition(13), cap=4).collect()
    }
    assert a == b
    kept = [t for t in a if t[2]]
    assert len(kept) == 12  # 3 domains x cap 4


def test_url_leg_is_codegen_only(spark, sf_dir):
    """The whole url leg must stay whole-stage-codegen: no
    BatchEvalPython / ArrowEvalPython (a Python UDF here would gate
    the full corpus scan)."""
    from rta_registrations_pyspark_glue_spark.plans.queries_etl import (
        url_domain_curation,
    )

    plan = url_domain_curation(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_cap_per_domain_single_exchange(spark, sf_dir):
    """The quota leg costs exactly ONE shuffle (the window's hash
    exchange on the domain) — a second Exchange would mean the rank
    re-partitions what the synthesis already colocated."""
    from rta_registrations_pyspark_glue_spark.plans.queries_etl import (
        url_domain_curation,
    )

    plan = (
        url_domain_curation(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
