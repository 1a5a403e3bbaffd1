"""Incremental-maintenance and approximate-aggregate queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rta_registrations_pyspark_glue_spark.operators import similarity, upsert
from rta_registrations_pyspark_glue_spark.plans.planmemo import plan_memo
from rta_registrations_pyspark_glue_spark.plans.registry import register
from rta_registrations_pyspark_glue_spark.sources.testdata import load_table

ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _updates(orders: DataFrame) -> DataFrame:
    k = F.col("o_orderkey")
    changed = orders.filter(k % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )
    inserted = orders.filter(k % 13 == 0).select(
        (k + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return changed.unionByName(inserted)


@register(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice + 1000.0 AS o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'N',
               o_totalprice, o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 13 = 0
    ), merged AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               o_orderdate, o_orderpriority, 0 AS p
        FROM orders
        UNION ALL
        SELECT *, 1 AS p FROM updates
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY p DESC) AS rn
        FROM merged
    ) WHERE rn = 1
    """,
)
@plan_memo
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style merge (operators/upsert.py): every 7th order updated,
    every 13th inserted under a new key; updates win by source priority.
    Portable MERGE INTO equivalent built from union + keep-latest."""
    orders = load_table(spark, "orders", sf_dir).select(*ORDER_COLS)
    out = upsert.merge_upsert(orders, _updates(orders), keys=["o_orderkey"], order_by=[])
    return out.select(*ORDER_COLS)


@register("approx_distinct_stats")
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates (rows-only: HLL/t-digest internals are
    engine-specific, so no cross-engine oracle — accuracy vs exact is
    pytest-bounded instead). At 100 TB these replace exact distinct
    counts/quantiles: both partial-aggregate map-side with tiny state."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register("cosine_topk_bruteforce_fast")
def cosine_topk_bruteforce_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS path for exact cosine top-k (rows-only: numpy's pairwise
    summation differs from the sequential fold in the last ulp, so no
    value-hash oracle — pair-set equality with the fold variant is
    pytest-asserted). ~10x faster per pair; the production choice."""
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    return similarity.brute_force_topk_fast(q, c, k=5)
