"""Exact substring dedup (Lee et al.) vs a pure-Python oracle."""

from __future__ import annotations

import pytest

from pg2kinesis_spark.functions.substr_dedup import (
    dedup_substrings,
    duplicated_kgram_losers,
    duplication_profile,
)
from pg2kinesis_spark.io import load_table

K = 5

SHARED = "alpha beta gamma delta epsilon zeta"  # 6 tokens -> two 5-grams
DOCS = [
    (1, f"one two {SHARED} three four"),
    (2, f"prefix tokens here {SHARED} suffix tail"),
    (3, "totally unrelated text with enough words to stand alone"),
    (4, f"{SHARED}"),
    (5, "self repeat self repeat self repeat self repeat self repeat self"),
    (6, "short doc"),
]


def _py_losers(docs: list[tuple[int, str]], k: int) -> set[tuple[int, int]]:
    first: dict[tuple, tuple[int, int]] = {}
    occs: list[tuple[tuple, int, int]] = []
    for doc_id, text in sorted(docs):
        ws = text.split(" ")
        for i in range(len(ws) - k + 1):
            g = tuple(ws[i : i + k])
            occs.append((g, doc_id, i + 1))
            if g not in first or (doc_id, i + 1) < first[g]:
                first[g] = (doc_id, i + 1)
    from collections import Counter

    cnt = Counter(g for g, _, _ in occs)
    return {
        (d, p) for g, d, p in occs if cnt[g] > 1 and (d, p) != first[g]
    }


def _py_dedup(docs: list[tuple[int, str]], k: int) -> dict[int, str]:
    losers = _py_losers(docs, k)
    out = {}
    cut: dict[int, set[int]] = {}
    for d, p in losers:
        cut.setdefault(d, set()).update(range(p, p + k))
    for doc_id, text in docs:
        ws = text.split(" ")
        if doc_id not in cut:
            out[doc_id] = text
            continue
        kept = [w for i, w in enumerate(ws, start=1) if i not in cut[doc_id]]
        if kept:
            out[doc_id] = " ".join(kept)
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_losers_match_python(df):
    got = {(r["doc_id"], r["pos"]) for r in duplicated_kgram_losers(df, K).collect()}
    assert got == _py_losers(DOCS, K)
    # doc 1 contains the first occurrence -> never loses; docs 2 and 4 lose
    assert not any(d == 1 for d, _ in got)
    assert any(d == 2 for d, _ in got) and any(d == 4 for d, _ in got)


def test_dedup_substrings_matches_python(df):
    got = {r["doc_id"]: r["text"] for r in dedup_substrings(df, K).collect()}
    assert got == _py_dedup(DOCS, K)
    # winner and untouched docs byte-identical
    assert got[1] == DOCS[0][1]
    assert got[3] == DOCS[2][1]
    assert got[6] == DOCS[5][1]
    # shared span cut from the losers
    assert "gamma" not in got[2]
    # self-repetition within one doc is also deduplicated
    assert got[5] != DOCS[4][1]


def test_doc_cut_to_nothing_is_dropped(spark):
    rows = [(1, "a b c d e"), (2, "a b c d e")]
    out = dedup_substrings(spark.createDataFrame(rows, ["doc_id", "text"]), 5)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == {1: "a b c d e"}


def test_extra_columns_survive(spark):
    rows = [(1, "a b c d e f", "en"), (2, "x a b c d e y", "de")]
    out = dedup_substrings(spark.createDataFrame(rows, ["doc_id", "text", "lang"]), 5)
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in out.collect()}
    assert got[2][1] == "de" and "c" not in got[2][0]
    assert got[1] == ("a b c d e f", "en")


def test_stride_documented_approximation(df):
    # stride 2 misses at most spans < k + stride - 1; everything it DOES
    # flag must be a true loser
    s2 = {(r["doc_id"], r["pos"]) for r in duplicated_kgram_losers(df, K, stride=2).collect()}
    assert s2 <= _py_losers(DOCS, K)


def test_profile_and_no_hot_key_window(spark, df):
    prof = duplication_profile(df, K).collect()[0]
    assert prof["n_docs_cut"] >= 2 and prof["n_tokens_cut"] > 0
    plan = (
        duplicated_kgram_losers(df, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # first-occurrence selection must be partial-aggregated, not a
    # window over the gram hash (viral-gram reducer funnel)
    assert "Window" not in plan
    assert "partial_min" in plan or "partial" in plan.lower()


def test_real_docs_invariants(spark, sf_small):
    docs = load_table(spark, sf_small, "documents").limit(300).select("doc_id", "text")
    out = dedup_substrings(docs, 20)
    lens = {r[0]: r[1] for r in out.selectExpr("doc_id", "length(text)").collect()}
    orig = {r[0]: r[1] for r in docs.selectExpr("doc_id", "length(text)").collect()}
    assert set(lens) <= set(orig)
    assert all(lens[d] <= orig[d] for d in lens)
