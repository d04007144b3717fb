"""State insert/query microbenchmark mirroring the reference's asv grid
(`benchmarks/benchmarks/server/gateway/csp/state.py:57-193`):

- insert N rows (N ∈ {1_000, 10_000, 100_000}) with keyby unique and
  keyby mod 100,
- first (cold) query-all latency — includes the "bulk load" cost
  (here: the first Spark job over the appended data),
- warm repeated query-all and a 2-filter conjunctive query.

Prints one JSON line: {"metric": "state_microbench", "cases": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import types as T

    from csp_gateway_spark.catalog import ChannelCatalog
    from csp_gateway_spark.query import Filter, Query
    from csp_gateway_spark.session import get_spark

    spark = get_spark("bench_state")
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    q2 = Query(filters=[Filter(attr="a", op="<=", value=1000), Filter(attr="a", op="<=", value=1000)])
    cases = {}
    for n in (1_000, 10_000, 100_000):
        for key_mode in ("unique", "mod100"):
            cat = ChannelCatalog(spark)
            name = f"s_{n}_{key_mode}"
            cat.declare(name, schema)
            cat.declare_state(name, "a")
            rows = [
                {"a": i if key_mode == "unique" else i % 100, "b": f"b{i}", "c": i * 0.5}
                for i in range(n)
            ]
            t0 = time.time()
            # bulk insert (the reference buffers then bulk-loads; one
            # createDataFrame append is the same design point)
            cat.send(name, rows)
            insert_s = time.time() - t0
            t0 = time.time()
            cat.state(name).count()  # cold query-all
            cold_s = time.time() - t0
            t0 = time.time()
            for _ in range(3):
                cat.state(name).count()
            warm_s = (time.time() - t0) / 3
            t0 = time.time()
            cat.query(name, q2).count()
            filt_s = time.time() - t0
            cases[f"n={n},key={key_mode}"] = {
                "insert_s": round(insert_s, 3),
                "cold_query_s": round(cold_s, 3),
                "warm_query_s": round(warm_s, 3),
                "filtered_query_s": round(filt_s, 3),
            }
    print(json.dumps({"metric": "state_microbench", "cases": cases}))


if __name__ == "__main__":
    main()
