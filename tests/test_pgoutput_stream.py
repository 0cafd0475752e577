"""Streaming pgoutput: base64 replay corpus -> parse kernel -> stateful
xid carry-forward -> registry join -> format -> in-memory Kinesis sink,
with batch boundaries INSIDE transactions."""

from __future__ import annotations

import base64
import os

import pytest

from pg2kinesis_spark.fixtures import gen_pgoutput
from pg2kinesis_spark.operators.pgoutput import (
    decode_message,
    relation_registry_from_replay,
)
from pg2kinesis_spark.sinks.kinesis import InMemoryTransport, KinesisLikeWriter
from pg2kinesis_spark.streaming.pipeline import build_pgoutput_stream, run_until


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    rows = gen_pgoutput(n_txns=12, seed=44)
    path = str(tmp_path_factory.mktemp("pgout") / "corpus.parquet")
    spark.createDataFrame(
        rows, "lsn long, data_size int, payload string"
    ).coalesce(1).write.mode("overwrite").parquet(path)
    return path, rows


def _expected_csv(rows):
    """Python oracle: decode the corpus in lsn order, carry xid, emit
    the reference CSV line per DML row."""
    rels, out, cur = {}, [], ""
    for lsn, _size, payload in sorted(rows):
        d = decode_message(base64.b64decode(payload))
        if d["op"] == "relation":
            rels[d["rel_id"]] = d
        elif d["op"] == "begin":
            cur = str(d["xid"])
        elif d["op"] in ("insert", "update", "delete"):
            rel = rels[d["rel_id"]]
            vals = d["old"] if d["op"] == "delete" else d["new"]
            key = rel["key_cols"][0]
            pk = vals[rel["col_names"].index(key)]
            table = f"{rel['namespace']}.{rel['relname']}"
            out.append(f"0,CDC,{cur},{table},{d['op']},{pk}")
    return out


def _msgs(transport):
    from pg2kinesis_spark.sinks.kpl import deaggregate_kpl

    return [m.decode() for _, data in transport.records for _, m in deaggregate_kpl(data)]


def test_pgoutput_stream_end_to_end(spark, corpus, tmp_path):
    path, rows = corpus
    want = _expected_csv(rows)
    registry = relation_registry_from_replay(spark, path)
    assert registry.count() == 3

    transport = InMemoryTransport()
    writer = KinesisLikeWriter(transport)
    stream = build_pgoutput_stream(
        spark, path, registry, formatter="CSV", rows_per_batch=7
    )
    run_until(
        stream,
        writer,
        str(tmp_path / "ckpt"),
        done=lambda: writer.put_message_calls >= len(want)
        and writer._agg.num_bytes == 0,
    )
    writer.flush_tail()
    got = _msgs(transport)
    # content AND commit order, xids correct across batch boundaries
    assert got == want


def test_pgoutput_stream_table_pat_and_ops(spark, corpus, tmp_path):
    path, rows = corpus
    registry = relation_registry_from_replay(spark, path)
    transport = InMemoryTransport()
    writer = KinesisLikeWriter(transport)
    stream = build_pgoutput_stream(
        spark, path, registry, formatter="CSV",
        operations=("insert",), table_pat="users", rows_per_batch=50,
    )
    want = [
        m for m in _expected_csv(rows)
        if ",public.users,insert," in m
    ]
    # put_message is called for EVERY surviving users DML row (filtered
    # ops call with None — reference counter parity), so completion is
    # the full users row count, not just the inserts
    n_users_rows = sum(1 for m in _expected_csv(rows) if ",public.users," in m)
    run_until(
        stream,
        writer,
        str(tmp_path / "ckpt2"),
        done=lambda: writer.put_message_calls >= n_users_rows
        and writer._agg.num_bytes == 0,
    )
    writer.flush_tail()
    assert _msgs(transport) == want
