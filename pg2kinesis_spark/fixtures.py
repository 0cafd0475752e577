"""Deterministic Group-A fixture generation (FIXTURES.md, seed=42).

Generates the CDC golden-parity corpora:
- ``pk_catalog``          — PK catalog snapshot (FIXTURES.md A1)
- ``info_schema_*``       — information_schema-shaped tables feeding
                            catalog.build_pk_catalog (reference slot.py:18-33)
- ``cdc_test_decoding``   — clean test_decoding wire lines (A2)
- ``cdc_wal2json``        — clean wal2json wire messages (A3)

"Clean" corpora contain no error-path rows (those live in unit tests)
so the oracle-checked pipeline queries run strict end to end.
Everything is reproducible from the seed; ``tools/gen_fixtures.py``
materializes parquet under fixtures/.
"""

from __future__ import annotations

import json
import random

# (qualified name, pk col, pk type, quoted?, pk value generator kind)
STREAM_TABLES = [
    ("public.test_table", "uuid", "uuid", True, "uuid"),
    ("public.test_table2", "name", "character varying", True, "name"),
    ("public.orders_cdc", "id", "int4", False, "int"),
]

OPS_TD = ["INSERT", "UPDATE", "DELETE"]  # test_decoding: uppercase verbatim
OPS_W2J = ["insert", "update", "delete"]  # wal2json: lowercase kinds


def pk_catalog_rows() -> list[tuple]:
    """(table_name, col_name, col_type, col_ord_pos) incl. the composite
    (last-ordinal-wins pin, SURVEY §8.3) and no-PK (NULL row) cases."""
    rows = [(t, c, ty, 0) for t, c, ty, _, _ in STREAM_TABLES]
    rows += [
        ("public.composite", "a", "int4", 1),
        ("public.composite", "b", "int4", 2),
        ("public.nopk", None, None, None),
    ]
    return rows


def info_schema_rows() -> dict[str, list[tuple]]:
    """information_schema-shaped inputs whose pk pipeline output equals
    pk_catalog_rows(). Includes a VIEW and a non-PK constraint that the
    query must filter out."""
    cat = "db"
    tables, constraints, kcu, columns = [], [], [], []
    for t, c, ty, _, _ in STREAM_TABLES + [("public.composite", None, None, None, None), ("public.nopk", None, None, None, None)]:
        schema, name = t.split(".")
        tables.append((cat, schema, name, "BASE TABLE"))
    tables.append((cat, "public", "some_view", "VIEW"))

    def pk(schema, name, col, ty, ord_pos):
        cn = f"{name}_pkey"
        constraints.append((cat, schema, cn, cat, schema, name, "PRIMARY KEY"))
        kcu.append((cat, schema, cn, cat, schema, name, col, ord_pos))
        columns.append((cat, schema, name, col, ty))

    for t, c, ty, _, _ in STREAM_TABLES:
        schema, name = t.split(".")
        pk(schema, name, c, ty, 0)
    pk("public", "composite", "a", "int4", 1)
    # second pk column of the composite shares the constraint row
    kcu.append((cat, "public", "composite_pkey", cat, "public", "composite", "b", 2))
    columns.append((cat, "public", "composite", "b", "int4"))
    # a UNIQUE constraint the PRIMARY KEY filter must exclude
    constraints.append((cat, "public", "test_table_uniq", cat, "public", "test_table", "UNIQUE"))
    kcu.append((cat, "public", "test_table_uniq", cat, "public", "test_table", "uuid", 0))
    return {
        "tables": tables,
        "table_constraints": constraints,
        "key_column_usage": kcu,
        "columns": columns,
    }


def _uuid(rng: random.Random) -> str:
    h = "".join(rng.choice("0123456789abcdef") for _ in range(32))
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def _pk_value(rng: random.Random, kind: str):
    if kind == "uuid":
        return _uuid(rng)
    if kind == "name":
        return f"Name-{rng.randrange(100000)}"
    return rng.randrange(1, 10_000_000)


def gen_test_decoding(n_txns: int = 2000, seed: int = 42) -> list[tuple[int, int, str]]:
    """(lsn, data_size, payload) rows: BEGIN/COMMIT-framed transactions of
    1-4 DML lines each, grammar per reference formatter.py:45-57."""
    rng = random.Random(seed)
    rows, lsn, xid = [], 1000, 100

    def emit(payload: str):
        nonlocal lsn
        rows.append((lsn, len(payload.encode()), payload))
        lsn += rng.randrange(1, 50)

    for _ in range(n_txns):
        xid += rng.randrange(1, 5)
        emit(f"BEGIN {xid}")
        for _ in range(rng.randrange(1, 5)):
            t, col, ty, quoted, kind = rng.choice(STREAM_TABLES)
            op = rng.choice(OPS_TD)
            val = _pk_value(rng, kind)
            vtxt = f"'{val}'" if quoted else str(val)
            extra = f" other_col[text]:'x{rng.randrange(1000)}'"
            emit(f"table {t}: {op}: {col}[{ty}]:{vtxt}{extra}")
        emit("COMMIT")
    return rows


def gen_wal2json(n_msgs: int = 2000, seed: int = 43) -> list[tuple[int, int, str]]:
    """(lsn, data_size, payload) wal2json messages; includes empty change
    arrays, multi-change messages, pk at varying positions, mixed-type and
    null extra columnvalues, occasional null pk (→ pkey 'None')."""
    rng = random.Random(seed)
    rows, lsn, xid = [], 5000, 500

    def emit(payload: str):
        nonlocal lsn
        rows.append((lsn, len(payload.encode()), payload))
        lsn += rng.randrange(1, 50)

    for _ in range(n_msgs):
        xid += rng.randrange(1, 5)
        n_changes = rng.choice([0, 1, 1, 1, 2, 3])
        changes = []
        for _ in range(n_changes):
            t, col, ty, _, kind = rng.choice(STREAM_TABLES)
            schema, table = t.split(".")
            pk_val = None if rng.random() < 0.02 else _pk_value(rng, kind)
            extra_cols = [
                ("num_col", "int4", rng.randrange(1000)),
                ("txt_col", "text", f"v{rng.randrange(1000)}"),
                ("nullable_col", "text", None),
            ][: rng.randrange(0, 4)]
            cols = [(col, ty, pk_val)] + extra_cols
            rng.shuffle(cols)  # pk position varies (pins P9 lookup-by-name)
            changes.append(
                {
                    "kind": rng.choice(OPS_W2J),
                    "schema": schema,
                    "table": table,
                    "columnnames": [c[0] for c in cols],
                    "columntypes": [c[1] for c in cols],
                    "columnvalues": [c[2] for c in cols],
                }
            )
        emit(json.dumps({"xid": xid, "change": changes}))
    return rows


def gen_pgoutput(n_txns: int = 2000, seed: int = 44) -> list[tuple[int, int, str]]:
    """(lsn, data_size, payload) rows of base64-encoded pgoutput
    messages — Relation declarations up front, then Begin/DML/Commit
    framed transactions. data_size counts the BINARY message bytes
    (the wire size a real slot serves)."""
    import base64

    from pg2kinesis_spark.operators.pgoutput import (
        encode_begin,
        encode_commit,
        encode_delete,
        encode_insert,
        encode_relation,
        encode_update,
    )

    rng = random.Random(seed)
    rows, lsn, xid = [], 1000, 100
    rels = [
        (101, "public", "users", ["id", "name"], ("id",)),
        (102, "public", "orders", ["order_id", "total"], ("order_id",)),
        (103, "app", "events", ["event_id", "kind"], ("event_id",)),
    ]

    def emit(msg: bytes):
        nonlocal lsn
        rows.append((lsn, len(msg), base64.b64encode(msg).decode()))
        lsn += rng.randrange(1, 50)

    for rel_id, ns, rel, cols, keys in rels:
        emit(encode_relation(rel_id, ns, rel, cols, key_cols=keys))
    for _ in range(n_txns):
        xid += rng.randrange(1, 5)
        emit(encode_begin(lsn + 500, xid))
        for _ in range(rng.randrange(1, 5)):
            rel_id, ns, rel, cols, keys = rng.choice(rels)
            pk = str(rng.randrange(10_000))
            other = f"v{rng.randrange(1000)}"
            op = rng.choice(["insert", "update", "delete"])
            if op == "insert":
                emit(encode_insert(rel_id, [pk, other]))
            elif op == "update":
                emit(encode_update(rel_id, [pk, other], old=[pk, None], old_kind="K"))
            else:
                emit(encode_delete(rel_id, [pk, None]))
        emit(encode_commit(lsn + 500, lsn + 501))
    return rows
