"""IVF-PQ ANN: recall against the exact brute-force baseline,
determinism, code compactness, and the materialized-index path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.functions import pq, similarity
from pg2kinesis_spark.io import load_table

K = 5
N_QUERIES = 20


@pytest.fixture(scope="module")
def emb(spark, sf_oracle):
    return load_table(spark, sf_oracle, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < N_QUERIES)


@pytest.fixture(scope="module")
def exact_topk(emb, queries):
    out = similarity.cosine_topk(emb, queries, k=K).collect()
    return {(r.query_id, r.neighbor_id) for r in out}


def _recall(got_rows, want_pairs):
    got = {(r.query_id, r.neighbor_id) for r in got_rows}
    return len(got & want_pairs) / len(want_pairs)


def test_ivfpq_recall_vs_bruteforce(spark, emb, queries, exact_topk):
    got = pq.ivfpq_ann_topk(emb, queries, k=K, n_centroids=16, nprobe=6, refine=8).collect()
    assert len(got) == N_QUERIES * K
    # nprobe=6/16 cells + PQ shortlist: well above half of exact top-5
    assert _recall(got, exact_topk) >= 0.6
    # refine step guarantees reported cosines are EXACT — spot-check one
    r0 = got[0]
    exact_cos = (
        similarity.with_cosine(
            emb.filter(F.col("vec_id") == r0.query_id).alias("a").crossJoin(
                emb.filter(F.col("vec_id") == r0.neighbor_id).alias("b")
            )
        ).collect()[0].cos
    )
    assert abs(r0.cos - exact_cos) < 1e-9


def test_ivfpq_deterministic(spark, emb, queries):
    a = sorted(map(tuple, pq.ivfpq_ann_topk(emb, queries, k=K).collect()))
    b = sorted(map(tuple, pq.ivfpq_ann_topk(emb, queries, k=K).collect()))
    assert a == b


def test_pq_codes_are_compact(spark, emb):
    cents = pq.ivf_centroids(emb, 16, 13)
    assigned = pq.ivf_assign(emb, cents)
    books = pq.train_pq_codebooks(assigned, cents, m=8, ksub=16, sample=512)
    assert books.shape == (8, 16, 8)
    codes = pq.pq_encode(assigned, cents, books)
    row = codes.first()
    assert len(row.codes) == 8  # m ints per vector — vs 64 floats raw
    assert all(0 <= c < 16 for c in row.codes)
    assert codes.count() == emb.count()


def test_ivfpq_materialized_index_matches_inline(spark, emb, queries, tmp_path):
    path = str(tmp_path / "ivfpq")
    pq.write_ivfpq_index(emb, path, n_centroids=16, m=8, ksub=16)
    from_idx = pq.ivfpq_ann_topk_from_index(
        spark, path, emb, queries, k=K, nprobe=6, refine=8
    )
    inline = pq.ivfpq_ann_topk(emb, queries, k=K, nprobe=6, refine=8)
    assert sorted(map(tuple, from_idx.collect())) == sorted(map(tuple, inline.collect()))
    # probe-time read must partition-prune on cid
    plan = from_idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
