"""CDC materialization: last-wins snapshot vs an independent python
replay oracle; incremental foreachBatch merge == one-shot snapshot;
tombstones survive replay; oldkeys delete shape."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.catalog import primary_key_map
from pg2kinesis_spark.operators.apply_cdc import (
    CdcTableMaterializer,
    cdc_changes,
    snapshot_changes,
)


@pytest.fixture(scope="module")
def raw(spark):
    return spark.read.parquet("fixtures/cdc_wal2json.parquet")


@pytest.fixture(scope="module")
def pk_map(spark):
    return primary_key_map(spark.read.parquet("fixtures/pk_catalog.parquet"))


def _oracle_snapshot(rows, pk_by_table):
    """Independent serial replay: live (table, pkey) set after last-wins."""
    state = {}
    for r in sorted(rows, key=lambda r: r.lsn):
        msg = json.loads(r.payload)
        for idx, ch in enumerate(msg.get("change", [])):
            table = f"{ch['schema']}.{ch['table']}"
            pk_col = pk_by_table.get(table)
            if pk_col is None:
                continue
            names = ch.get("columnnames") or ch.get("oldkeys", {}).get("keynames") or []
            values = ch.get("columnvalues") or ch.get("oldkeys", {}).get("keyvalues") or []
            if pk_col not in names:
                continue
            pkey = values[names.index(pk_col)]
            pkey = "None" if pkey is None else str(pkey)
            state[(table, pkey)] = ch["kind"].lower()
    return {k for k, op in state.items() if op != "delete"}


def test_snapshot_matches_python_oracle(spark, raw, pk_map):
    pk_by_table = {r.table_name: r.pk_col_name for r in pk_map.collect()}
    want = _oracle_snapshot(raw.collect(), pk_by_table)
    snap = snapshot_changes(raw, pk_map)
    got = {(r.table, r.pkey) for r in snap.collect()}
    assert got == want
    assert len(got) > 0
    # every live row carries its full payload map and a real lsn
    one = snap.first()
    assert isinstance(one.row, dict) and one.last_lsn > 0


def test_incremental_merge_equals_oneshot(spark, raw, pk_map, tmp_path):
    """Apply the corpus in 3 lsn-ordered slices; final state must equal
    the one-shot snapshot over everything."""
    bounds = [5400, 5800]
    slices = [
        raw.filter(F.col("lsn") <= bounds[0]),
        raw.filter((F.col("lsn") > bounds[0]) & (F.col("lsn") <= bounds[1])),
        raw.filter(F.col("lsn") > bounds[1]),
    ]
    mat = CdcTableMaterializer(spark, str(tmp_path / "state"))
    assert mat.current() is None and mat.snapshot() is None
    for s in slices:
        mat.apply(cdc_changes(s, pk_map))
    got = {(r.table, r.pkey, r.last_lsn) for r in mat.snapshot().collect()}
    want = {(r.table, r.pkey, r.last_lsn) for r in snapshot_changes(raw, pk_map).collect()}
    assert got == want


def test_replayed_batch_is_idempotent_and_keeps_tombstones(spark, pk_map, tmp_path):
    def msg(lsn, kind, pkval, extra=None):
        ch = {
            "kind": kind,
            "schema": "public",
            "table": "orders_cdc",
            "columnnames": ["id"] + (["txt_col"] if extra else []),
            "columntypes": ["int4"] + (["text"] if extra else []),
            "columnvalues": [pkval] + ([extra] if extra else []),
        }
        return (lsn, 1, json.dumps({"xid": 1, "change": [ch]}))

    b1 = [msg(10, "insert", 1, "a"), msg(20, "delete", 1)]
    b2_replay = [msg(10, "insert", 1, "a")]  # re-served pre-delete change
    schema = "lsn long, data_size int, payload string"
    mat = CdcTableMaterializer(spark, str(tmp_path / "state"))
    mat.apply(cdc_changes(spark.createDataFrame(b1, schema), pk_map))
    assert mat.snapshot().count() == 0  # deleted
    mat.apply(cdc_changes(spark.createDataFrame(b2_replay, schema), pk_map))
    # tombstone at lsn 20 must win over the replayed lsn-10 insert
    assert mat.snapshot().count() == 0
    tomb = mat.current().collect()
    assert len(tomb) == 1 and tomb[0].last_operation == "delete"


def test_oldkeys_delete_shape(spark, pk_map):
    payload = json.dumps(
        {
            "xid": 7,
            "change": [
                {
                    "kind": "delete",
                    "schema": "public",
                    "table": "orders_cdc",
                    "oldkeys": {"keynames": ["id"], "keyvalues": [42]},
                }
            ],
        }
    )
    raw = spark.createDataFrame([(10, 1, payload)], "lsn long, data_size int, payload string")
    rows = cdc_changes(raw, pk_map).collect()
    assert len(rows) == 1
    assert rows[0].operation == "delete" and rows[0].pkey == "42"
    assert rows[0].row == {"id": "42"}


def test_unknown_table_gets_error_row(spark, pk_map):
    payload = json.dumps(
        {
            "xid": 8,
            "change": [
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "nope",
                    "columnnames": ["id"],
                    "columntypes": ["int4"],
                    "columnvalues": [1],
                }
            ],
        }
    )
    raw = spark.createDataFrame([(10, 1, payload)], "lsn long, data_size int, payload string")
    rows = cdc_changes(raw, pk_map).collect()
    assert rows[0].error == 'Unable to locate table: "public.nope"'


def _tmsg(lsn, kind, pkval=None, extra=None, table="orders_cdc"):
    ch = {"kind": kind, "schema": "public", "table": table}
    if kind != "truncate":
        ch["columnnames"] = ["id"] + (["txt_col"] if extra else [])
        ch["columntypes"] = ["int4"] + (["text"] if extra else [])
        ch["columnvalues"] = [pkval] + ([extra] if extra else [])
    return (lsn, 1, json.dumps({"xid": 1, "change": [ch]}))


def test_snapshot_truncate_semantics(spark, pk_map):
    """A truncate kills every key whose last change precedes it; a key
    re-inserted after the truncate survives; other tables untouched."""
    schema = "lsn long, data_size int, payload string"
    raw = spark.createDataFrame(
        [
            _tmsg(10, "insert", 1, "a"),
            _tmsg(20, "insert", 2, "b"),
            _tmsg(30, "truncate"),
            _tmsg(40, "insert", 3, "c"),
        ],
        schema,
    )
    from pg2kinesis_spark.operators.apply_cdc import snapshot_changes

    snap = snapshot_changes(raw, pk_map).collect()
    assert {(r.table, r.pkey) for r in snap} == {("public.orders_cdc", "3")}
    # truncate LAST -> table empties entirely
    raw2 = spark.createDataFrame(
        [_tmsg(10, "insert", 1, "a"), _tmsg(50, "truncate")], schema
    )
    assert snapshot_changes(raw2, pk_map).count() == 0


def test_materializer_truncate_tombstone_survives_replay(spark, pk_map, tmp_path):
    """Truncate works across micro-batches AND under at-least-once
    replay: a re-served pre-truncate insert must re-die against the
    persisted truncate tombstone."""
    schema = "lsn long, data_size int, payload string"
    mat = CdcTableMaterializer(spark, str(tmp_path / "state"))
    b1 = [_tmsg(10, "insert", 1, "a"), _tmsg(20, "insert", 2, "b")]
    mat.apply(cdc_changes(spark.createDataFrame(b1, schema), pk_map))
    assert mat.snapshot().count() == 2
    b2 = [_tmsg(30, "truncate"), _tmsg(40, "insert", 3, "c")]
    mat.apply(cdc_changes(spark.createDataFrame(b2, schema), pk_map))
    assert {(r.table, r.pkey) for r in mat.snapshot().collect()} == {
        ("public.orders_cdc", "3")
    }
    # replay batch 1: pre-truncate inserts must NOT resurrect
    mat.apply(cdc_changes(spark.createDataFrame(b1, schema), pk_map))
    assert {(r.table, r.pkey) for r in mat.snapshot().collect()} == {
        ("public.orders_cdc", "3")
    }
    tomb = [r for r in mat.current().collect() if r.last_operation == "truncate"]
    assert len(tomb) == 1 and tomb[0].pkey is None
