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


# Canonical sha256 of n8_minhash_lsh_pairs at the driver's gate SF
# (sf0.01), pinned on BOTH engines. The r6 driver board hash-flipped
# this row while rows/schema matched and the same contract passed
# locally — the only non-integer surface was the float est_jaccard
# render, now replaced by integer n_eq. If a DuckDB/Spark upgrade ever
# drifts either side's canonical text, this fails locally before the
# driver sees it.
N8_SF001_SHA256 = "19e8b10ec5103ec9a3621419914f6ceeeff4b503250e15472db37e02b60c3417"


def test_n8_canonical_hash_pinned_at_gate_sf(spark, sf_oracle):
    from pg2kinesis_spark.oracle_compare import canonicalize, run_duckdb

    name = "n8_minhash_lsh_pairs"
    sdf = QUERIES[name](spark, sf_oracle)
    s_hash, _ = canonicalize([tuple(r) for r in sdf.collect()], list(sdf.columns))
    o_rows, o_cols = run_duckdb(ORACLE_SQL[name], sf_oracle)
    o_hash, _ = canonicalize(o_rows, o_cols)
    assert s_hash == N8_SF001_SHA256, f"spark-side canonical hash drifted: {s_hash}"
    assert o_hash == N8_SF001_SHA256, f"oracle-side canonical hash drifted: {o_hash}"
