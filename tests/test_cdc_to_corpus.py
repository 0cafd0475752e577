"""CDC -> corpus integration: the reference's domain (logical-decoding
change streams) feeding the training-data domain (curation).

A wal2json change stream maintains a `public.documents` table;
`snapshot_changes` materializes current state; the curation operators
run directly on the materialized table. Pins that updates are reflected
before dedup, deletes never resurface, and CDC-introduced duplicates
are deduplicated."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.catalog import primary_key_map
from pg2kinesis_spark.functions import curate
from pg2kinesis_spark.operators.apply_cdc import snapshot_changes

TEXT_A = "a perfectly unique document about spark pipelines and shuffles"
TEXT_B = "ephemeral document that will be deleted by the change stream"
TEXT_C0 = "original third document before any update arrives"


def _msg(lsn, *changes):
    return (lsn, 100, json.dumps({"change": list(changes)}))


def _ins(doc_id, text):
    return {
        "kind": "insert", "schema": "public", "table": "documents",
        "columnnames": ["doc_id", "text"], "columnvalues": [doc_id, text],
    }


def _upd(doc_id, text):
    return {
        "kind": "update", "schema": "public", "table": "documents",
        "columnnames": ["doc_id", "text"], "columnvalues": [doc_id, text],
    }


def _del(doc_id):
    return {
        "kind": "delete", "schema": "public", "table": "documents",
        "oldkeys": {"keynames": ["doc_id"], "keyvalues": [doc_id]},
    }


@pytest.fixture(scope="module")
def materialized(spark):
    raw = spark.createDataFrame(
        [
            _msg(1, _ins(1, TEXT_A)),
            _msg(2, _ins(2, TEXT_B), _ins(3, TEXT_C0)),
            _msg(3, _upd(3, TEXT_A)),  # update makes doc 3 an exact dup of 1
            _msg(4, _del(2)),
        ],
        "lsn long, data_size int, payload string",
    )
    cat = spark.createDataFrame(
        [("public.documents", "doc_id", "bigint", 1)],
        "table_name string, col_name string, col_type string, col_ord_pos int",
    )
    snap = snapshot_changes(raw, primary_key_map(cat))
    return snap.select(
        F.col("pkey").cast("long").alias("doc_id"),
        F.col("row")["text"].alias("text"),
    )


def test_snapshot_reflects_stream(materialized):
    got = {r["doc_id"]: r["text"] for r in materialized.collect()}
    assert got == {1: TEXT_A, 3: TEXT_A}  # doc 2 deleted, doc 3 updated


def test_curate_over_materialized_cdc_state(materialized):
    out = curate.curate_corpus(materialized, near_dup_jaccard=None)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    # the CDC-introduced exact duplicate collapses to the smaller id
    assert kept == {1}


def test_deleted_doc_cannot_reenter_via_curation(materialized):
    out = curate.curate_corpus(materialized, near_dup_jaccard=0.5)
    texts = [r["text"] for r in out.collect()]
    assert all(TEXT_B not in t for t in texts)
