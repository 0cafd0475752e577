"""Benchmark headline queries; prints ONE JSON line for the driver.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pg2kinesis_spark.plans.queries import QUERIES
from pg2kinesis_spark.session import get_spark

BENCH_QUERIES = [
    "q13_hash_agg",       # scan + hash aggregate (TPC-H Q1 skeleton)
    "q2_join_chain",      # 3-table join
    "q17_rank_window",    # window exchange + sort
    "q9_maxby_lastwins",  # wide groupBy (14k+ groups at sf0.1: 150k)
    "q23_array_aggregate",# array lambda over embeddings
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench")

    # Warm the JVM/codegen once with an unrelated query.
    spark.range(1000000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
