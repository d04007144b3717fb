"""Product-analytics dashboard pipeline — the wave-4 warehouse
operators composed the way an events-to-dashboard run chains them
(additive surface, SURVEY §7.8; every stage is an oracle-checked
operator):

    event stream (user_id, event_type, ts, value)
      → funnel              (view → click → purchase conversion)
      → transitions         (Markov "what happens after X" matrix)
      → sessionized cadence (inter-arrival percentiles per type)
      → daily heavy hitters (top users per day window)
      → gap-filled series   (6 h LOCF grid per user, chart-ready)
      → rolling bands       (trailing-20 decimal sums per type)
      → SCD2 history        (event-type version intervals per user)
      → anomaly screen      (per-type equi-width histogram + MAD
                             outliers on the order book)
    order book (orders, lineitem)
      → retention cohorts   (first-order month triangle)
      → MoM trend           (monthly revenue deltas)
      → Pareto tiers        (revenue concentration by part decile)
      → market basket       (co-purchase lift pairs)
      → VWAP                (exact-decimal notional/qty)
      → FK + Benford audits (referential + first-digit screens)

Every stage is deterministic (integer/decimal arithmetic, seeded
hashes, tie-broken windows), so re-runs are byte-identical and any
panel can be backfilled independently.

Run: python examples/product_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run_dashboard(spark, sf_dir: str):
    """Returns {panel: DataFrame}, lazily defined."""
    from csp_gateway_spark.operators.analytics import (
        benford_report,
        fk_audit,
        funnel,
        mad_outliers,
        market_basket,
        pareto,
        period_over_period,
        retention_cohorts,
        vwap,
    )
    from csp_gateway_spark.operators.state import scd2
    from csp_gateway_spark.operators.windows import (
        event_transitions,
        gap_fill_locf,
        interarrival_stats,
        rolling_stats,
        windowed_topk,
    )
    from csp_gateway_spark.session import load_tables

    t = load_tables(spark, sf_dir, ["events", "orders", "lineitem", "customer"])
    ev, orders, lineitem = t["events"], t["orders"], t["lineitem"]

    panels = {
        "funnel": funnel(ev, ["view", "click", "purchase"]),
        "transitions": event_transitions(
            ev, "user_id", "event_type", ["ts", "event_id"]
        ),
        "cadence": interarrival_stats(ev, "event_type", "ts", "event_id"),
        "daily_top_users": windowed_topk(ev, "ts", "user_id", 86400, k=3),
        "user_series": gap_fill_locf(ev, "ts", "value", ["user_id"], 21600),
        "rolling_bands": rolling_stats(
            ev, "value", ["event_type"], ["ts", "event_id"], n=20
        ),
        "type_history": scd2(
            ev.select("user_id", "event_type", "ts"),
            keys=["user_id"], ts_col="ts", attr_cols=["event_type"],
        ),
        "retention": retention_cohorts(orders),
        "mom_trend": period_over_period(orders),
        "pareto": pareto(lineitem),
        "basket": market_basket(lineitem, k=20),
        "vwap": vwap(lineitem, k=25),
        "price_outliers": mad_outliers(orders, "o_totalprice", group_col="o_orderpriority"),
        "fk_audit": fk_audit(
            lineitem, orders, "l_orderkey", "o_orderkey", "lineitem->orders"
        ),
        "benford": benford_report(orders, "o_totalprice"),
    }
    return panels


def main() -> None:
    from csp_gateway_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("product-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    for name, df in run_dashboard(spark, sf_dir).items():
        n = df.count()
        print(f"{name:>16}: {n} rows")
        df.show(3, truncate=False)


if __name__ == "__main__":
    main()
