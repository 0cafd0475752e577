"""Every declared query must hash-match its DuckDB oracle (SURVEY §2.13).

Runs at sf0.001 for speed; the driver's gate runs the same comparison at
sf0.01 — tools/check_oracle.py runs it there manually.
"""

from __future__ import annotations

import pytest

from pg2kinesis_spark.oracle_compare import compare_query
from pg2kinesis_spark.plans import ORACLE_SQL, QUERIES


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_small, name):
    fn = QUERIES[name]
    sql = ORACLE_SQL.get(name)
    if sql is None:
        assert fn(spark, sf_small).count() >= 0
        return
    res = compare_query(spark, name, fn, sql, sf_small)
    assert res.ok, f"{name}: {res.detail}"
