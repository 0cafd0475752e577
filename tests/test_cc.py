"""Connected components (large-star/small-star) vs a union-find oracle,
and transitive cluster dedup vs the greedy pair rule."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.cc import (
    cluster_drop_list,
    connected_components,
    duplicate_clusters,
)
from pg2kinesis_spark.functions.curate import curate_corpus
from pg2kinesis_spark.functions.dedup import minhash_lsh_pairs


def _uf_components(edges):
    """Union-find oracle: {node: min-id-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = rng.sample(range(10_000), 400)
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(300)
    ]
    got = _spark_components(spark, edges)
    want = _uf_components([e for e in edges if e[0] != e[1]])
    assert got == want


def test_long_chain_converges_logarithmically(spark):
    # A 200-node path with shuffled ids is the adversarial diameter case
    # for plain label propagation (O(n) rounds); the star algorithm must
    # finish inside the default 25-round cap (O(log n)).
    rng = random.Random(7)
    ids = list(range(1000, 1200))
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    got = _spark_components(spark, edges)
    assert set(got.values()) == {min(ids)}
    assert set(got) == set(ids)


def test_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(1, 1), (2, 3), (3, 2), (2, 3), (5, 5)]
    got = _spark_components(spark, edges)
    # Pure self-loop nodes carry no connectivity information; 2–3 is one
    # component labelled by its min.
    assert got == {1: 1, 2: 2, 3: 2, 5: 5}


def test_determinism(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(500), rng.randrange(500)) for _ in range(200)]
    assert _spark_components(spark, edges) == _spark_components(spark, edges)


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "src string, dst string"
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"b": "b", "c": "b", "d": "b", "x": "x", "y": "x"}


def test_transitive_beats_greedy_on_chain(spark):
    # Chain 2—10—1: greedy (drop larger id of each pair) keeps {1, 2} —
    # two survivors from ONE duplicate cluster. Transitive keeps {1}.
    pairs = spark.createDataFrame([(2, 10), (1, 10)], "id1 long, id2 long")
    greedy_drop = {r["id2"] for r in pairs.select("id2").distinct().collect()}
    cc_drop = {r["doc_id"] for r in cluster_drop_list(pairs).collect()}
    assert greedy_drop == {10}
    assert cc_drop == {2, 10}
    cl = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert cl == {(1, 1), (2, 1), (10, 1)}


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    from pg2kinesis_spark.io import load_table

    return load_table(spark, sf_small, "documents")


def test_lsh_clusters_one_survivor_each(spark, docs):
    pairs = minhash_lsh_pairs(docs.select("doc_id", "text")).filter(
        F.col("est_jaccard") >= 0.6
    )
    clusters = duplicate_clusters(pairs)
    per = (
        clusters.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("doc_id") == F.col("cluster_id")).cast("int")).alias(
                "survivors"
            ),
            F.min("doc_id").alias("mn"),
        )
        .collect()
    )
    assert per, "sf0.001 documents must contain near-dup pairs"
    for r in per:
        assert r["n"] >= 2
        assert r["survivors"] == 1
        assert r["mn"] == r["cluster_id"]


def test_curate_transitive_subset_of_greedy(spark, docs):
    greedy = curate_corpus(docs, near_dup_jaccard=0.6)
    trans = curate_corpus(docs, near_dup_jaccard=0.6, transitive=True)
    g = {r["doc_id"] for r in greedy.select("doc_id").collect()}
    t = {r["doc_id"] for r in trans.select("doc_id").collect()}
    assert t <= g
    # Every doc greedy kept but transitive dropped must be clustered
    # with a smaller surviving doc.
    pairs = minhash_lsh_pairs(docs.select("doc_id", "text")).filter(
        F.col("est_jaccard") >= 0.6
    )
    clusters = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    for d in g - t:
        assert clusters[d] < d and clusters[d] in t
