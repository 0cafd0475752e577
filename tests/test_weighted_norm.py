"""Weighted sampling (Efraimidis-Spirakis) + text normalization tests."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.sampling import weighted_sample_n
from pg2kinesis_spark.functions.text import normalize_text


def _es_key(key: str, w: float) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
    u = (h + 1.0) / float(1 << 60)
    return -math.log(u) / w


def test_weighted_sample_matches_python(spark):
    rows = [(f"d{i}", float(1 + (i * 7) % 13)) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [r["doc_id"] for r in weighted_sample_n(df, "w", 25, "doc_id").collect()]
    want = sorted(rows, key=lambda x: (_es_key(x[0], x[1]), x[0]))[:25]
    assert sorted(got) == sorted(d for d, _ in want)


def test_weighted_sample_properties(spark):
    rows = [("heavy", 10000.0)] + [(f"d{i}", 1.0) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = {r["doc_id"] for r in weighted_sample_n(df, "w", 10, "doc_id").collect()}
    assert "heavy" in out and len(out) == 10
    # deterministic across reruns
    out2 = {r["doc_id"] for r in weighted_sample_n(df, "w", 10, "doc_id").collect()}
    assert out == out2
    # zero/negative/null weights excluded
    df2 = spark.createDataFrame(
        [("a", 1.0), ("b", 0.0), ("c", -1.0), ("d", None)], ["doc_id", "w"]
    )
    assert {r["doc_id"] for r in weighted_sample_n(df2, "w", 4, "doc_id").collect()} == {"a"}


def test_weighted_sample_no_single_partition_phase1(spark):
    df = spark.createDataFrame([(f"d{i}", 1.0) for i in range(100)], ["doc_id", "w"])
    plan = (
        weighted_sample_n(df, "w", 5, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # phase 1 must partition by salt; the only SinglePartition stage is
    # the bounded (<= n_salt * n rows) refine
    assert "_salt" in plan


def test_normalize_text(spark):
    rows = [
        (1, "a  b\tc"),
        (2, "line1\r\nline2\rline3"),
        (3, "  padded  \n  inner  "),
        (4, "ctrl\x07chars\x1fgone"),
        (5, "Ünïcode Stays ÉÉ"),
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in normalize_text(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert got[1] == "a b c"
    assert got[2] == "line1\nline2\nline3"
    assert got[3] == "padded\ninner"
    assert got[4] == "ctrlcharsgone"
    assert got[5] == "Ünïcode Stays ÉÉ"  # no case/unicode mangling


def test_chunk_documents(spark):
    from pg2kinesis_spark.functions.text import chunk_documents

    ws = [f"w{i}" for i in range(25)]
    docs = spark.createDataFrame(
        [(1, " ".join(ws)), (2, "tiny doc"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, max_tokens=10, overlap=2)
    rows = sorted(
        [r.asDict() for r in out.collect()], key=lambda r: (r["doc_id"], r["chunk_id"])
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    # stride 8: chunks start at 1, 9, 17 and the engine guard stops
    # starts past size(ws) - overlap = 23
    assert [r["chunk_pos"] for r in d1] == [1, 9, 17]
    assert d1[0]["chunk"].split(" ") == ws[0:10]
    assert d1[1]["chunk"].split(" ") == ws[8:18]
    assert d1[2]["chunk"].split(" ") == ws[16:25]  # remainder, unpadded
    assert d1[2]["n_chunk_tokens"] == 9
    # full coverage with the configured overlap
    covered = set()
    for r in d1:
        covered.update(range(r["chunk_pos"], r["chunk_pos"] + r["n_chunk_tokens"]))
    assert covered == set(range(1, 26))
    # small docs -> exactly one chunk with an honest token count
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["n_chunk_tokens"] == 2
    # empty / whitespace-only docs -> ZERO chunks (split('',' ') gives
    # [''] — a spurious 1-token empty chunk would poison RAG indexes)
    assert not [r for r in rows if r["doc_id"] == 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_whitespace_only_and_multispace(spark):
    from pg2kinesis_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, "   "), (2, "a  b   c")], ["doc_id", "text"]
    )
    rows = [r.asDict() for r in chunk_documents(docs, max_tokens=4, overlap=1).collect()]
    assert {r["doc_id"] for r in rows} == {2}
    assert rows[0]["n_chunk_tokens"] == 3  # empty tokens from space runs ignored
    assert rows[0]["chunk"] == "a b c"
