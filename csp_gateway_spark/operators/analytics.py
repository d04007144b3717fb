"""Relational analytics query shapes (TPC-H-adapted) for the gateway's
batch surface.

The reference has no relational join operator (SURVEY §2.4 — stream
combination only), but BASELINE.json's north star is an analytics
engine usable on 100 TB, so the classic join/agg query shapes are
first-class here. Each function is written for scale:

- **dimension tables broadcast** (`region`, `nation`, filtered
  `customer`/`part` slices) — no shuffle of the fact table for the
  join, verified by ``plans.scale.assert_pushdown`` / plan audits;
- **filters applied before joins** so they reach the parquet scan
  (PushedFilters) and shrink the build side below the broadcast
  threshold at any SF;
- **decimal aggregation** — `SUM(double)` is accumulation-order
  dependent and would never hash-match a single-threaded oracle;
  casting the inputs to `decimal(18,2)` makes the result exact and
  associative, so partial (map-side) aggregation stays enabled;
- one shuffle per aggregation; `LIMIT`-ed results carry a
  deterministic tiebreaker key.

Reference parity note: these go beyond `csp_gateway`'s surface
(`csp_gateway/server/demo/omnibus.py:252-257` suggests joins are
user-space there); they are the additive SURVEY §7.8 set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from csp_gateway_spark.plans.scale import broadcast_dim

__all__ = [
    "dec",
    "net_revenue",
    "shipping_priority",
    "local_supplier_volume",
    "volume_shipping",
    "returned_item_revenue",
    "promo_revenue_effect",
    "large_volume_orders",
    "brand_discount_revenue",
]


def dec(c: str, scale: int = 2) -> Column:
    """Exact-arithmetic projection of a double column (see module doc)."""
    return F.col(c).cast(f"decimal(18,{scale})")


def net_revenue() -> Column:
    """`l_extendedprice * (1 - l_discount)` in exact decimal — the
    revenue measure shared by Q3/Q5/Q7/Q10/Q19 shapes."""
    return (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(18,4)")


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1997-03-15",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: top unshipped orders by revenue for one market
    segment. The segment filter reduces customer to ~1/5 before the
    join; orders filtered by date before joining lineitem."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < F.lit(cutoff)).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > F.lit(cutoff)).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(broadcast_dim(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(net_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(k)
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation, customers restricted to one region. nation⨝region
    collapses to a broadcast key list; the only big shuffles are
    lineitem⨝orders and the final group-by."""
    nations = nation.join(
        broadcast_dim(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(broadcast_dim(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast_dim(customer.select("c_custkey", "c_nationkey")),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(broadcast_dim(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(net_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations by year and
    direction. Both nation sides resolve through broadcast joins; the
    fact table shuffles once for lineitem⨝orders."""
    n1 = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    supp = supplier.join(
        broadcast_dim(n1.select(F.col("n_nationkey").alias("sn_key"),
                                F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        broadcast_dim(n1.select(F.col("n_nationkey").alias("cn_key"),
                                F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate",
                        "l_extendedprice", "l_discount")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast_dim(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast_dim(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(net_revenue()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    date_from: str = "1996-10-01",
    date_to: str = "1997-01-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: customers who returned items in a quarter,
    ranked by lost revenue."""
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast_dim(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(net_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def promo_revenue_effect(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-09-01",
    date_to: str = "1996-10-01",
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo parts in one month.
    The ratio is computed double-from-exact-decimal so it is
    bit-deterministic regardless of partitioning."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from)) & (F.col("l_shipdate") < F.lit(date_to))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    agg = (
        li.join(broadcast_dim(part.select("p_partkey", "p_type")),
                li.l_partkey == F.col("p_partkey"))
        .agg(
            F.sum(F.when(F.col("p_type") == promo_type, net_revenue())
                   .otherwise(F.lit(0).cast("decimal(18,4)"))).alias("promo_revenue"),
            F.sum(net_revenue()).alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue").cast("double") * F.lit(100.0)
         / F.col("total_revenue").cast("double")).alias("promo_pct"),
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 300.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold. The HAVING subquery is a self-aggregation of lineitem —
    one shuffle on l_orderkey shared (via reuse) with the outer sum."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        big.join(orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
                 big.l_orderkey == F.col("o_orderkey"))
        .join(broadcast_dim(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                dec("o_totalprice").alias("o_totalprice"), "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(k)
    )


def brand_discount_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    terms: tuple = (
        ("Brand#11", 1, 15, 1.0, 15.0),
        ("Brand#19", 10, 30, 5.0, 25.0),
        ("Brand#23", 20, 50, 10.0, 40.0),
    ),
) -> DataFrame:
    """TPC-H Q19 shape: disjunction of (brand, size-range, qty-range)
    terms. The part-side predicate is pushed into the broadcast build;
    the lineitem qty bounds below the global min/max prune the scan."""
    min_q = min(t[3] for t in terms)
    max_q = max(t[4] for t in terms)
    pred = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in terms:
        term = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(qty_lo, qty_hi)
        )
        pred = term if pred is None else (pred | term)
    parts = part.filter(
        F.col("p_brand").isin([t[0] for t in terms])
    ).select("p_partkey", "p_brand", "p_size")
    return (
        lineitem.filter(F.col("l_quantity").between(min_q, max_q))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(broadcast_dim(parts), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(F.sum(net_revenue()).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )
