"""Distributed connected components: candidate pairs → duplicate clusters.

LSH / SRP dedup (dedup.py, similarity.py) emits candidate PAIRS; a real
dedup pass needs CLUSTERS — the transitive closure of the pair graph —
so exactly one document survives per duplicate set. The greedy
drop-the-larger-id-of-each-pair rule (curate.py's default) keeps every
LOCAL minimum: in the chain 2—10, 10—1 it keeps both 1 and 2 from one
cluster. Transitive clustering keeps only the global minimum.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC 2014) — converges
in O(log² n) rounds (O(log n) in practice), each round two
groupBy+join passes over the EDGE set only. Nothing here touches
document payloads, so at 100 TB the iteration runs over (id, id) longs
whose volume is bounded by the LSH collision bound, not the corpus.

  large-star: every node connects its larger neighbors to its smallest
  known neighbor (or itself); small-star does the same for smaller
  neighbors. The fixpoint is a star forest: every node points at its
  component's minimum id, which becomes the cluster label.

Spark-first notes:
  - Pure DataFrame groupBy + broadcast-free equi-joins on the node id —
    both halves of a round shuffle on the same key, and AQE coalesces
    the tiny late rounds as the edge set collapses.
  - A LAZY ``localCheckpoint`` after every round truncates the
    iterative lineage (the classic iterative-DataFrame plan explosion);
    the signature agg that follows immediately forces it, so each round
    is ONE job wave instead of the two an eager checkpoint paid
    (materialize, then re-scan for the agg). At cluster scale swap it
    for a parquet checkpoint dir so recovery does not depend on
    executor-local blocks.
  - Convergence is detected by a (count, xxhash64-xor) signature — one
    cheap agg over the checkpointed edges instead of an exceptAll join.
  - GraphFrames is not assumed present; this stays in core pyspark.

The reference system has no graph/dedup surface; this is north-star
scope like the rest of the dedup family (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ⁺(u))."""
    bi = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = bi.groupBy("u").agg(F.min("v").alias("_mv"))
    m = m.select("u", F.least("u", "_mv").alias("_m"))
    return (
        bi.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor of u (and u itself) to min(N(u))."""
    c = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    m = c.groupBy("u").agg(F.min("v").alias("_m"))
    nbr = (
        c.join(m, "u")
        .filter(F.col("v") != F.col("_m"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
    )
    own = m.select("u", F.col("_m").alias("v"))
    return nbr.union(own).distinct()


def _signature(e: DataFrame) -> tuple:
    # bit_xor, not sum: order-independent and cannot overflow under ANSI.
    row = e.agg(
        F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every endpoint of ``edges``; ``component``
    is the minimum node id of its connected component. Ids need only be
    orderable + hashable (long or string). Self-loops are ignored;
    isolated nodes never appear (callers union singletons back)."""
    # lazy: the _signature agg right below is the materializing action —
    # an eager checkpoint would run the identical computation as a
    # separate job first and the agg as a second (guide §1.2: don't pay
    # two job waves where one suffices)
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    prev = _signature(e)
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _signature(e)  # forces the round's checkpoint in the same job
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (expected O(log n) rounds)"
        )
    labels = e.groupBy("u").agg(F.min("v").alias("_c"))
    return nodes.join(labels, nodes["node"] == labels["u"], "left").select(
        "node", F.coalesce("_c", "node").alias("component")
    )


def duplicate_clusters(
    pairs: DataFrame, id1: str = "id1", id2: str = "id2", max_iter: int = 25
) -> DataFrame:
    """(doc_id, cluster_id) for every doc in at least one candidate
    pair; ``cluster_id`` is the transitive cluster's minimum doc_id."""
    cc = connected_components(pairs, src=id1, dst=id2, max_iter=max_iter)
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def cluster_drop_list(
    pairs: DataFrame, id1: str = "id1", id2: str = "id2", max_iter: int = 25
) -> DataFrame:
    """doc_ids to DROP under one-survivor-per-cluster dedup: every
    clustered doc except its cluster's minimum id. A superset of the
    greedy larger-of-each-pair rule (equal when every cluster is a
    clique containing its minimum)."""
    cl = duplicate_clusters(pairs, id1, id2, max_iter)
    return cl.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
