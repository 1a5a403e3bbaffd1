"""Analytic query surface over the star schema (SURVEY.md §2.4 A5).

The reference delegates all group-by analytics to the warehouse its DDL
defines (starschema_dw.txt:55-77, README dashboard); this module is that
query surface, Spark-native. Dimension joins broadcast (region/nation/
customer are tiny next to the fact tables); aggregations are expressed on
built-in functions only so they partial-aggregate map-side and stay inside
whole-stage codegen.

Float policy: money aggregates cast to DECIMAL(18,2) *before* summing.
Decimal addition is exact and associative, so results are bit-identical
regardless of partitioning — required both for the DuckDB oracle and for
run-to-run reproducibility on a cluster. The final value is cast back to
double for a stable, engine-neutral schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def dsum(col: Column | str, alias: str, scale_out: str = "double") -> Column:
    """Deterministic sum: exact decimal accumulation, double output."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast(scale_out).alias(alias)


def star_denormalize(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """orders ⟕ customer ⟕ nation ⟕ region (J1/J6 shape,
    etl2_advclean_and_dimcreatin.py:206-212, 256-258). Dimensions are
    broadcast: at 100 TB the fact side never shuffles for these joins."""
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
    )


def revenue_by_region_year(
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Flagship rollup: order count + revenue per (region, order-year)."""
    denorm = star_denormalize(orders, customer, nation, region)
    return (
        denorm.groupBy(
            F.col("r_name").alias("region_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_revenue"),
        )
        .orderBy("region_name", "order_year")
    )
