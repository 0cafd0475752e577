"""Materialize Group-A fixtures as parquet under fixtures/ (seed=42).

Usage: python tools/gen_fixtures.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from pg2kinesis_spark import fixtures as fx


def write(out_dir: str, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"))
    print(f"wrote {name}: {len(next(iter(cols.values())))} rows")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures"
    os.makedirs(out, exist_ok=True)

    rows = fx.pk_catalog_rows()
    write(
        out,
        "pk_catalog",
        {
            "table_name": pa.array([r[0] for r in rows], pa.string()),
            "col_name": pa.array([r[1] for r in rows], pa.string()),
            "col_type": pa.array([r[2] for r in rows], pa.string()),
            "col_ord_pos": pa.array([r[3] for r in rows], pa.int32()),
        },
    )

    info = fx.info_schema_rows()
    write(out, "info_tables", {
        "table_catalog": [r[0] for r in info["tables"]],
        "table_schema": [r[1] for r in info["tables"]],
        "table_name": [r[2] for r in info["tables"]],
        "table_type": [r[3] for r in info["tables"]],
    })
    write(out, "info_table_constraints", {
        "constraint_catalog": [r[0] for r in info["table_constraints"]],
        "constraint_schema": [r[1] for r in info["table_constraints"]],
        "constraint_name": [r[2] for r in info["table_constraints"]],
        "table_catalog": [r[3] for r in info["table_constraints"]],
        "table_schema": [r[4] for r in info["table_constraints"]],
        "table_name": [r[5] for r in info["table_constraints"]],
        "constraint_type": [r[6] for r in info["table_constraints"]],
    })
    write(out, "info_key_column_usage", {
        "constraint_catalog": [r[0] for r in info["key_column_usage"]],
        "constraint_schema": [r[1] for r in info["key_column_usage"]],
        "constraint_name": [r[2] for r in info["key_column_usage"]],
        "table_catalog": [r[3] for r in info["key_column_usage"]],
        "table_schema": [r[4] for r in info["key_column_usage"]],
        "table_name": [r[5] for r in info["key_column_usage"]],
        "column_name": [r[6] for r in info["key_column_usage"]],
        "ordinal_position": pa.array([r[7] for r in info["key_column_usage"]], pa.int32()),
    })
    write(out, "info_columns", {
        "table_catalog": [r[0] for r in info["columns"]],
        "table_schema": [r[1] for r in info["columns"]],
        "table_name": [r[2] for r in info["columns"]],
        "column_name": [r[3] for r in info["columns"]],
        "data_type": [r[4] for r in info["columns"]],
    })

    for name, gen in (("cdc_test_decoding", fx.gen_test_decoding), ("cdc_wal2json", fx.gen_wal2json)):
        rows = gen()
        write(out, name, {
            "lsn": pa.array([r[0] for r in rows], pa.int64()),
            "data_size": pa.array([r[1] for r in rows], pa.int32()),
            "payload": pa.array([r[2] for r in rows], pa.string()),
        })


if __name__ == "__main__":
    main()
