"""Hypothesis fuzz: the DataFrame test_decoding parser must agree with an
independent pure-Python model of the reference's parse semantics
(reference formatter.py:45-81) on randomly generated wire corpora."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from pg2kinesis_spark.catalog import primary_key_map
from pg2kinesis_spark.operators.test_decoding import parse_test_decoding

TABLES = {
    "public.test_table": ("uuid", "uuid"),
    "public.test_table2": ("name", "character varying"),
}

word = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=12).filter(
    lambda s: re.fullmatch(r"[\w\-]+", s)
)


@st.composite
def corpus(draw):
    lines = []
    n_txns = draw(st.integers(1, 5))
    xid = 100
    for _ in range(n_txns):
        xid += draw(st.integers(1, 9))
        lines.append(f"BEGIN {xid}")
        for _ in range(draw(st.integers(0, 4))):
            table = draw(st.sampled_from(sorted(TABLES)))
            col, typ = TABLES[table]
            op = draw(st.sampled_from(["INSERT", "UPDATE", "DELETE"]))
            val = draw(word)
            quoted = draw(st.booleans())
            vtxt = f"'{val}'" if quoted else val
            lines.append(f"table {table}: {op}: {col}[{typ}]:{vtxt}")
        lines.append("COMMIT")
    return lines


def model_parse(lines):
    """Independent model of the reference's semantics (not its code):
    BEGIN sets xid; COMMIT ignored; table lines yield
    (xid, table, op, first regex match of the pk pattern)."""
    out, cur = [], ""
    pats = {
        t: re.compile(rf"{c}\[{ty}\]:'?([\w\-]+)'?") for t, (c, ty) in TABLES.items()
    }
    for line in lines:
        toks = line.split(" ", 3)
        if toks[0] == "BEGIN":
            cur = toks[1]
        elif toks[0] == "COMMIT":
            pass
        else:
            table = toks[1][:-1]
            m = pats[table].search(toks[3])
            out.append((cur, table, toks[2][:-1], m.group(1)))
    return out


@pytest.fixture(scope="module")
def pk_map(spark):
    catalog = spark.createDataFrame(
        [(t, c, ty, 0) for t, (c, ty) in TABLES.items()],
        "table_name string, col_name string, col_type string, col_ord_pos int",
    )
    return primary_key_map(catalog).persist()


@settings(max_examples=15, deadline=None, derandomize=True)
@given(lines=corpus())
def test_parse_agrees_with_model(spark, pk_map, lines):
    raw = spark.createDataFrame(
        [(i * 2, len(p.encode()), p) for i, p in enumerate(lines)],
        "lsn long, data_size int, payload string",
    )
    got = [
        (r.xid, r.table, r.operation, r.pkey)
        for r in parse_test_decoding(raw, pk_map).orderBy("lsn").collect()
    ]
    assert got == model_parse(lines)
