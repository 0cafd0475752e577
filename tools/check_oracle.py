"""Run every declared query against the DuckDB oracle and report.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pg2kinesis_spark.oracle_compare import compare_query
from pg2kinesis_spark.plans import ORACLE_SQL, QUERIES
from pg2kinesis_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"SKIP  {name} (no oracle — rows-only check)")
            n = fn(spark, sf_dir).count()
            print(f"      rows={n}")
            continue
        try:
            res = compare_query(spark, name, fn, sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failures += 1
            continue
        status = "OK   " if res.ok else "FAIL "
        print(f"{status} {name}  spark={res.spark_rows} oracle={res.oracle_rows}")
        if not res.ok:
            print(f"      {res.detail[:1000]}")
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
