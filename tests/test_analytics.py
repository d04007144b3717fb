"""Join-heavy analytics shapes (operators/analytics.py).

Correctness of values is driver-oracle-checked at sf0.01
(tools/check.py); these tests pin the *plan* properties the module
promises — dims broadcast, filters pushed to the scan — plus cheap
semantic invariants at sf0.001.
"""

import pytest
from pyspark.sql import functions as F

from csp_gateway_spark.operators import analytics as A


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    return {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for t in ["customer", "orders", "lineitem", "supplier", "nation", "region", "part"]
    }


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_shipping_priority_broadcasts_and_limits(tables):
    df = A.shipping_priority(tables["customer"], tables["orders"], tables["lineitem"])
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    rows = df.collect()
    assert 0 < len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_local_supplier_volume_nation_consistency(tables):
    df = A.local_supplier_volume(
        tables["customer"], tables["orders"], tables["lineitem"],
        tables["supplier"], tables["nation"], tables["region"],
    )
    assert "SortMergeJoin" not in _plan(df)
    rows = df.collect()
    # only nations in the chosen region can appear
    asia = {
        r.n_name
        for r in tables["nation"]
        .join(tables["region"].filter(F.col("r_name") == "ASIA"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .collect()
    }
    assert {r.n_name for r in rows} <= asia


def test_volume_shipping_directional_pairs(tables):
    df = A.volume_shipping(
        tables["supplier"], tables["lineitem"], tables["orders"],
        tables["customer"], tables["nation"],
    )
    rows = df.collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r.supp_nation != r.cust_nation for r in rows)


def test_promo_revenue_pct_bounds(tables):
    row = A.promo_revenue_effect(tables["lineitem"], tables["part"]).collect()[0]
    assert 0.0 <= row.promo_pct <= 100.0
    assert row.promo_revenue <= row.total_revenue


def test_large_volume_orders_threshold(tables):
    rows = A.large_volume_orders(
        tables["customer"], tables["orders"], tables["lineitem"], min_qty=300.0
    ).collect()
    assert all(float(r.total_qty) > 300.0 for r in rows)
    # every returned order's qty re-derivable from lineitem
    if rows:
        ok = (
            tables["lineitem"]
            .filter(F.col("l_orderkey") == rows[0].o_orderkey)
            .agg(F.sum("l_quantity").alias("q"))
            .collect()[0]
        )
        assert abs(float(ok.q) - float(rows[0].total_qty)) < 1e-6


def test_brand_discount_terms_are_a_filter(tables):
    out = A.brand_discount_revenue(tables["lineitem"], tables["part"]).collect()[0]
    # n is a subset of the unfiltered join
    total = tables["lineitem"].count()
    assert 0 <= out.n <= total


def test_returned_items_only_r_flag(tables):
    df = A.returned_item_revenue(
        tables["customer"], tables["orders"], tables["lineitem"], tables["nation"],
        date_from="1995-01-01", date_to="2002-01-01", k=5,
    )
    assert len(df.collect()) <= 5
    assert "BroadcastHashJoin" in _plan(df)
