"""Catalog pipeline tests — last-wins collapse and information_schema
query shape (reference slot.py:18-33, 88-94; pinned by the reference's
test_slot.py:124-140)."""

from __future__ import annotations

import pytest

from pg2kinesis_spark import fixtures as fx
from pg2kinesis_spark.catalog import build_pk_catalog, primary_key_map


@pytest.fixture(scope="module")
def info(spark):
    d = fx.info_schema_rows()
    return {
        "tables": spark.createDataFrame(
            d["tables"], "table_catalog string, table_schema string, table_name string, table_type string"
        ),
        "table_constraints": spark.createDataFrame(
            d["table_constraints"],
            "constraint_catalog string, constraint_schema string, constraint_name string,"
            "table_catalog string, table_schema string, table_name string, constraint_type string",
        ),
        "key_column_usage": spark.createDataFrame(
            d["key_column_usage"],
            "constraint_catalog string, constraint_schema string, constraint_name string,"
            "table_catalog string, table_schema string, table_name string, column_name string, ordinal_position int",
        ),
        "columns": spark.createDataFrame(
            d["columns"],
            "table_catalog string, table_schema string, table_name string, column_name string, data_type string",
        ),
    }


def test_build_pk_catalog_left_join_keeps_pkless_tables(spark, info):
    cat = build_pk_catalog(info["tables"], info["table_constraints"], info["key_column_usage"], info["columns"])
    rows = {(r.table_name, r.col_name) for r in cat.collect()}
    assert ("public.nopk", None) in rows  # LEFT JOIN semantics (slot.py:20-31)
    assert ("public.test_table", "uuid") in rows
    # the VIEW and the UNIQUE constraint are filtered out
    assert not any(t == "public.some_view" for t, _ in rows)
    assert sum(1 for t, _ in rows if t == "public.test_table") == 1


def test_composite_pk_last_ordinal_wins(spark, info):
    cat = build_pk_catalog(info["tables"], info["table_constraints"], info["key_column_usage"], info["columns"])
    pk = {r.table_name: r for r in primary_key_map(cat).collect()}
    # ordinal 2 ('b') overwrites ordinal 1 ('a') — SURVEY §8.3
    assert pk["public.composite"].pk_col_name == "b"
    assert pk["public.nopk"].pk_col_name is None
    assert pk["public.nopk"].pk_pattern is None  # can never match → MISSING_PK


def test_pk_pattern_matches_reference_template(spark):
    catalog = spark.createDataFrame(
        [("public.test_table", "uuid", "uuid", 0)],
        "table_name string, col_name string, col_type string, col_ord_pos int",
    )
    row = primary_key_map(catalog).collect()[0]
    # reference compiled pattern (test_formatter.py:53):
    #   uuid\[uuid\]:'?([\w\-]+)'?   (+ our (?U) unicode-parity prefix)
    assert row.pk_pattern == "(?U)uuid\\[uuid\\]:'?([\\w\\-]+)'?"
