"""Local replica of the driver's Spark-vs-DuckDB correctness check.

Canonicalization per FIXTURES.md: sort all result rows by every output
column, round floats to 6 decimal places, render timestamps as
``YYYY-MM-DD HH:MM:SS.ffffff`` (UTC session), NULLs sort first and render
as empty string; columns joined with ',', rows with newline, sha256.

Used by tests/test_queries_oracle.py so oracle mismatches are caught
locally before the driver's per-round verify.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from dataclasses import dataclass
from decimal import Decimal


def _render(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return format(round(v, 6), ".6f")
    if isinstance(v, Decimal):
        return format(round(float(v), 6), ".6f")
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ";".join(_render(x) for x in v) + "]"
    return str(v)


def canonicalize(rows: list[tuple], columns: list[str]) -> tuple[str, str]:
    """Return (sha256-hash, canonical-text) for a result set.

    Columns are sorted by name (driver contract) so Spark/DuckDB column
    order differences don't matter; rows are then sorted lexically by the
    rendered values.
    """
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    rendered = sorted(
        ",".join(_render(row[i]) for i in order) for row in rows
    )
    text = "\n".join(rendered)
    return hashlib.sha256(text.encode("utf-8")).hexdigest(), text


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def run_duckdb(sql: str, sf_dir: str) -> tuple[list[tuple], list[str]]:
    """Run oracle SQL with the testdata tables registered as views."""
    import duckdb

    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return rows, cols


def compare_query(spark, name: str, query_fn, oracle_sql: str, sf_dir: str) -> CompareResult:
    sdf = query_fn(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    s_cols = list(sdf.columns)
    o_rows, o_cols = run_duckdb(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(name, False, len(s_rows), len(o_rows), f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")
    s_hash, s_text = canonicalize(s_rows, s_cols)
    o_hash, o_text = canonicalize(o_rows, o_cols)
    if s_hash != o_hash:
        s_lines, o_lines = s_text.split("\n"), o_text.split("\n")
        diff = next(
            (f"first diff at row {i}:\n  spark : {a}\n  oracle: {b}" for i, (a, b) in enumerate(zip(s_lines, o_lines)) if a != b),
            "hash differs but no per-row diff found",
        )
        return CompareResult(name, False, len(s_rows), len(o_rows), diff)
    return CompareResult(name, True, len(s_rows), len(o_rows))
