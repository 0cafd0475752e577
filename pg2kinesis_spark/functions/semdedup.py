"""SemDeDup — semantic deduplication via embedding clustering.

Implements the method of Abbas et al. 2023 ("SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540)
as a composition of this repo's existing primitives:

1. **Cluster** all embeddings with the deterministic integer k-means
   (``similarity.ivf_int_centroids`` — hash-seeded init + fixed Lloyd
   steps, exact-integer arithmetic, so reruns and engines agree).
2. **Within each cluster**, score pairwise cosine similarity; two items
   with ``cos >= 1 - eps`` are *semantic duplicates*.
3. **Keep one representative per duplicate group**: order the cluster
   by similarity-to-centroid (the paper found keeping the *least*
   centroid-similar example best preserves diversity) and drop any item
   that has a semantic duplicate EARLIER in that order. As in the
   paper's triangular-matrix implementation, suppression does not
   cascade: a dropped item still suppresses later duplicates of itself.

Scale shape (the reason this survives 100 TB): the only pair-generating
step is a self-equi-join on cluster id, so the pair count is
Σ size(cluster)² — the operator's cost is controlled by ``n_clusters``
exactly as the paper controls it with K (they use K = 50k on 234M
docs, ~5k docs/cluster). Assignment is a broadcast of K·dim ints and a
map-side argmin; no corpus shuffle except the cid equi-join.
``max_cluster_size`` optionally sub-splits oversized clusters by key
hash (a recall/cost trade identical to simhash's ``max_bucket_df``).

The reference (/root/reference/pg2kinesis) has no analogue — this is
north-star training-data surface, not parity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.dedup import HASH60
from pg2kinesis_spark.functions.similarity import (
    IVF_INT_SCALE,
    _dot,
    _int_sqdist,
    _ivf_int_vec,
    _norm,
    ivf_int_centroids,
)


def semdedup_assign(
    emb: DataFrame,
    dim: int,
    n_clusters: int = 16,
    n_iter: int = 2,
    scale: int = IVF_INT_SCALE,
    hierarchical: bool = False,
    nprobe: int = 2,
    train_per_centroid: int = 64,
) -> DataFrame:
    """(vec_id, cid, cent_sim, embedding): deterministic cluster id and
    exact double cosine to the (dequantized) centroid.

    The centroid used for ``cent_sim`` is the integer centroid mapped
    back to doubles ((c - scale)/scale) — exact integers in, the same
    IEEE ops in the same order out, so every engine agrees bitwise.

    ``hierarchical=True`` is the scale path: Lloyd trains on a
    deterministic ``train_per_centroid · K`` sample and points route
    through a √K coarse quantizer (``hier_assign``) — O(N·√K·nprobe)
    instead of the flat O(N·K). Assignment becomes IVF-approximate;
    clustering is a partition of the data either way, so the drop rule
    downstream stays exact within each produced cluster.
    """
    spark = emb.sparkSession
    if hierarchical:
        cents = ivf_int_centroids(
            emb, dim, n_clusters, n_iter, scale,
            train_limit=train_per_centroid * n_clusters,
        )
        assigned = hier_assign(emb, cents, scale, nprobe).withColumn(
            "cent_d",
            F.expr(
                f"transform(cent, v -> (cast(v as double) - {scale}.0D) / {scale}.0D)"
            ),
        )
        return assigned.select(
            "vec_id",
            "cid",
            (
                _dot("embedding", "cent_d") / (_norm("embedding") * _norm("cent_d"))
            ).alias("cent_sim"),
            "embedding",
        )
    cents = ivf_int_centroids(emb, dim, n_clusters, n_iter, scale)
    return assign_with_centroids(emb, cents, scale)


def assign_with_centroids(
    emb: DataFrame, cents: list, scale: int = IVF_INT_SCALE
) -> DataFrame:
    """Flat assignment against PRECOMPUTED integer centroids — the
    broadcast map-side argmin used by both one-shot semdedup and the
    streaming stage (where centroids are fit once on a reference corpus
    and every micro-batch routes through the same frozen quantizer)."""
    spark = emb.sparkSession
    cdf = F.broadcast(
        spark.createDataFrame(
            [(i, list(c)) for i, c in enumerate(cents)], "cid int, cent array<bigint>"
        ).withColumn(
            "cent_d",
            F.expr(
                f"transform(cent, v -> (cast(v as double) - {scale}.0D) / {scale}.0D)"
            ),
        )
    )
    return (
        emb.select("vec_id", "embedding", _ivf_int_vec("embedding", scale).alias("qv"))
        .crossJoin(cdf)
        .withColumn("_d", _int_sqdist("qv", "cent"))
        .groupBy("vec_id")
        # min over (distance, cid) structs = deterministic tie-break
        .agg(
            F.min(F.struct(F.col("_d"), F.col("cid"), F.col("cent_d"))).alias("m"),
            F.first("embedding").alias("embedding"),
        )
        .select(
            "vec_id",
            F.col("m.cid").alias("cid"),
            (
                _dot("embedding", "m.cent_d") / (_norm("embedding") * _norm("m.cent_d"))
            ).alias("cent_sim"),
            "embedding",
        )
    )


def _py_sqdist(a: list, b: list) -> int:
    acc = 0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _coarse_groups(cents: list, k1: int, n_iter: int = 2) -> list:
    """Driver-side deterministic integer k-means over the K fine
    centroids (K rows — microseconds): returns gid per fine centroid.
    Seeds are the first k1 centroids (already deterministic), updates
    are exact-integer sum // count, ties break on the smaller gid."""
    coarse = [list(c) for c in cents[:k1]]
    assign = [0] * len(cents)

    def _assign():
        for i, c in enumerate(cents):
            assign[i] = min(
                range(len(coarse)), key=lambda g: (_py_sqdist(c, coarse[g]), g)
            )

    for _ in range(n_iter):
        _assign()
        groups: dict[int, list] = {}
        for i, g in enumerate(assign):
            groups.setdefault(g, []).append(cents[i])
        for g, members in groups.items():
            n = len(members)
            coarse[g] = [sum(m[d] for m in members) // n for d in range(len(cents[0]))]
    # final assignment against the FINAL coarse centroids — the fine
    # routing table and the point-side probe must see the same coarse
    # space, or a fine centroid can sit in a group its points never probe
    _assign()
    return assign, coarse


def hier_assign(
    emb: DataFrame,
    cents: list,
    scale: int = IVF_INT_SCALE,
    nprobe: int = 2,
) -> DataFrame:
    """(vec_id, cid, embedding): two-level centroid assignment.

    Flat argmin over K centroids is O(N·K·dim) — the SemDeDup paper's
    K-scales-with-N rule makes that O(N²) on CPU. The standard fix
    (IVF/IMI coarse quantizer): cluster the K centroids into K1≈√K
    coarse groups driver-side, route each point to its ``nprobe``
    nearest coarse groups (O(N·K1)), then argmin only over the fine
    centroids of those groups (O(N·nprobe·K/K1)) — O(N·√K) total.
    Approximate exactly where IVF is (the true nearest fine centroid
    can live in an unprobed group); determinism is unchanged.
    """
    spark = emb.sparkSession
    k1 = max(1, int(math.isqrt(len(cents))))
    assign, coarse = _coarse_groups(cents, k1)
    # a coarse group that ended up with ZERO fine centroids must not be
    # probed: a point whose nprobe nearest groups were all empty would
    # join no fine centroid and silently vanish from the partition
    used = sorted(set(assign))
    # coarse probe happens IN-ROW against a literal array of the used
    # coarse centroids (≤K1·dim ints of codegen constant — ~√K, small
    # by construction): no N·K1 crossJoin, no per-point window shuffle.
    # Each literal struct carries its ORIGINAL gid (indices shift when
    # empty groups are dropped).
    coarse_lit = (
        "array(" + ", ".join(
            f"struct({g} as gid, array("
            + ", ".join(f"{v}L" for v in coarse[g])
            + ") as c)"
            for g in used
        ) + ")"
    )
    sq = (
        "aggregate(zip_with(qv, s.c, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as bigint), (acc, v) -> acc + v)"
    )
    probe_expr = (
        f"transform(slice(array_sort(transform({coarse_lit},"
        f" s -> struct({sq} as d, s.gid as gid))), 1, {nprobe}), p -> p.gid)"
    )
    cdf_fine = F.broadcast(
        spark.createDataFrame(
            [(assign[i], i, c) for i, c in enumerate(cents)],
            "gid int, cid int, cent array<bigint>",
        )
    )
    probed = (
        emb.select("vec_id", "embedding", _ivf_int_vec("embedding", scale).alias("qv"))
        .withColumn("gid", F.explode(F.expr(probe_expr)))
    )
    return (
        probed.join(cdf_fine, "gid")
        .withColumn("_d", _int_sqdist("qv", "cent"))
        .groupBy("vec_id")
        .agg(
            F.min(F.struct(F.col("_d"), F.col("cid"), F.col("cent"))).alias("m"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.cent").alias("cent"), "embedding")
    )


def _subsplit(assigned: DataFrame, max_cluster_size: int) -> DataFrame:
    """Sub-split clusters larger than the cap by key hash.

    n_sub = ceil(size / cap) sub-buckets per oversized cluster; pairs
    across sub-buckets of the same cluster are no longer compared (the
    documented recall trade). One tiny per-cid count + broadcast join.
    """
    sizes = assigned.groupBy("cid").agg(
        F.ceil(F.count("*") / max_cluster_size).cast("int").alias("_nsub")
    )
    h = F.expr(HASH60.format(x="cast(vec_id as string)"))
    return assigned.join(F.broadcast(sizes), "cid").withColumn(
        "sub", F.pmod(h, F.greatest(F.col("_nsub"), F.lit(1)))
    ).drop("_nsub")


def _seq_fold(prod):
    """Left-fold sum over the last axis matching Spark's ``aggregate``
    lambda (acc + v in array order): ``np.add.accumulate`` is strictly
    sequential, unlike ``np.sum``'s pairwise summation — the difference
    is real ULPs on cosines near the eps boundary."""
    import numpy as np

    return np.add.accumulate(prod, axis=-1)[..., -1]


def _int_sqdist_matrix(qv, C):
    """(n, k) exact int64 squared distances via the ||q||^2 - 2q.C +
    ||c||^2 decomposition — integer arithmetic, so bit-identical to the
    naive (q - c)^2 sum but without its (n, k, dim) int64 temporary
    (1.9 GB at n=20k, k=16, dim=768 — a driver OOM at the default
    driver_threshold; the decomposition peaks at O(n*dim))."""
    import numpy as np

    q2 = np.einsum("ij,ij->i", qv, qv)
    c2 = np.einsum("ij,ij->i", C, C)
    return q2[:, None] - 2 * (qv @ C.T) + c2[None, :]


def _spark_order_key(cent_sim: float, vec_id):
    """Spark sort key for (cent_sim, vec_id): NaN sorts LAST (Spark
    treats NaN as larger than any double, unlike IEEE)."""
    return (math.isnan(cent_sim), cent_sim, vec_id)


def _semdedup_driver(
    spark, rows, vec_id_field, dim, eps, n_clusters, n_iter, scale, max_pairs
):
    """Driver-side numpy twin of the flat semdedup path for SMALL
    inputs — the broadcast-side-compute analogue: bit-identical to the
    distributed path by construction (same float64 ops in the same
    order, same integer Lloyd, same Spark NaN semantics), parity-pinned
    by tests. Returns None when the pair count exceeds ``max_pairs``
    (caller falls back to the distributed join)."""
    import hashlib

    import numpy as np
    from pyspark.sql import types as T

    schema_empty = T.StructType(
        [
            vec_id_field,
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("cent_sim", T.DoubleType(), True),
            T.StructField("kept", T.BooleanType(), False),
        ]
    )
    if not rows:
        return spark.createDataFrame([], schema_empty)
    ids = [r["vec_id"] for r in rows]
    emb64 = np.array([[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64)
    n = len(ids)
    # quantize exactly like _ivf_int_vec: floor(double(x)·scale) + scale
    qv = np.floor(emb64 * float(scale)).astype(np.int64) + scale
    # hash-seeded init: smallest (HASH60(str(vec_id)), vec_id)
    h = [int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) for v in ids]
    order = sorted(range(n), key=lambda i: (h[i], ids[i]))
    cents = [qv[i].tolist() for i in order[:n_clusters]]
    for _ in range(n_iter):
        C = np.array(cents, dtype=np.int64)
        d = _int_sqdist_matrix(qv, C)  # exact ints
        cid = d.argmin(axis=1)  # first-min index == min-cid tie-break
        new = {}
        for k in range(len(cents)):
            mask = cid == k
            cnt = int(mask.sum())
            if cnt:
                s = qv[mask].sum(axis=0)
                new[k] = [int(v) // cnt for v in s]
        cents = [new.get(i, cents[i]) for i in range(len(cents))]
    C = np.array(cents, dtype=np.int64)
    d = _int_sqdist_matrix(qv, C)
    cid = d.argmin(axis=1)
    cent_d = (C.astype(np.float64) - float(scale)) / float(scale)
    cd = cent_d[cid]
    nrm_e = np.sqrt(_seq_fold(emb64 * emb64))
    nrm_c = np.sqrt(_seq_fold(cd * cd))
    denom = nrm_e * nrm_c
    if bool((denom == 0.0).any()):
        # parity with the distributed path: Spark 4 ANSI mode raises
        # DIVIDE_BY_ZERO for double division too, so a zero-norm
        # embedding fail-stops there — mirror it, don't emit NaN
        raise ArithmeticError(
            "Division by zero in cent_sim (zero-norm embedding) — "
            "matches the distributed path's ANSI DIVIDE_BY_ZERO"
        )
    cent_sim = _seq_fold(emb64 * cd) / denom

    total_pairs = 0
    by_cluster: dict[int, list[int]] = {}
    for i, k in enumerate(cid.tolist()):
        by_cluster.setdefault(k, []).append(i)
    for idx in by_cluster.values():
        total_pairs += len(idx) * (len(idx) - 1) // 2
    if total_pairs > max_pairs:
        return None

    thr = 1.0 - eps
    kept = [True] * n
    for idx in by_cluster.values():
        idx.sort(key=lambda i: _spark_order_key(float(cent_sim[i]), ids[i]))
        E = emb64[idx]
        NR = nrm_e[idx]
        for j in range(1, len(idx)):
            cos = _seq_fold(E[:j] * E[j]) / (NR[:j] * NR[j])
            # Spark comparison semantics: NaN >= thr is TRUE (NaN is
            # the largest double in Spark's ordering)
            if bool(np.any((cos >= thr) | np.isnan(cos))):
                kept[idx[j]] = False

    schema = T.StructType(
        [
            vec_id_field,
            T.StructField("cid", T.IntegerType(), False),
            T.StructField("cent_sim", T.DoubleType(), True),
            T.StructField("kept", T.BooleanType(), False),
        ]
    )
    out = [
        (ids[i], int(cid[i]), float(cent_sim[i]), bool(kept[i])) for i in range(n)
    ]
    return spark.createDataFrame(out, schema)


def semdedup(
    emb: DataFrame,
    dim: int | None = None,
    eps: float = 0.05,
    n_clusters: int = 16,
    n_iter: int = 2,
    scale: int = IVF_INT_SCALE,
    max_cluster_size: int | None = None,
    hierarchical: bool = False,
    nprobe: int = 2,
    driver_threshold: int | None = 20_000,
    driver_max_pairs: int = 50_000_000,
) -> DataFrame:
    """(vec_id, cid, cent_sim, kept) — ``kept = false`` for items with a
    semantic duplicate (cos >= 1 - eps) earlier in the keep order.

    Keep order within a cluster is ascending (cent_sim, vec_id): the
    least-centroid-similar duplicate survives (SemDeDup §3: "keeping
    examples with low similarity to cluster centroids" scored best),
    vec_id breaking exact-tie determinism. The drop rule is an
    EXISTS — expressed as pair-join → distinct losers → anti-join flag,
    so no window function ever sees a whole cluster in one reducer.

    Inputs at or below ``driver_threshold`` rows take a numpy driver
    path (``_semdedup_driver``) — bit-identical by construction and
    parity-pinned by tests — because the distributed path's ~15 Spark
    jobs (Lloyd collects, assignment, pair join) are pure scheduling
    overhead at that size (measured ~5 s on a 2.4k-row survivor set).
    ``driver_threshold=None`` (or the hierarchical / sub-split paths,
    or a blown ``driver_max_pairs`` budget) always runs distributed.

    ``dim=None`` infers the dimension from the data: free on the
    driver path (the collected sample carries it), one ``first()``
    probe on the distributed path. Callers that used to probe dim
    themselves before calling paid that probe job even when the driver
    path was about to collect the same rows anyway (r12 opt round).
    """
    if (
        driver_threshold is not None
        and not hierarchical
        and max_cluster_size is None
    ):
        sample = (
            emb.select("vec_id", "embedding").limit(driver_threshold + 1).collect()
        )
        if len(sample) <= driver_threshold:
            out = _semdedup_driver(
                emb.sparkSession,
                sample,
                emb.schema["vec_id"],
                dim,
                eps,
                n_clusters,
                n_iter,
                scale,
                driver_max_pairs,
            )
            if out is not None:
                return out
    if dim is None:
        dim = len(emb.select("embedding").first()["embedding"])
    assigned = semdedup_assign(
        emb, dim, n_clusters, n_iter, scale, hierarchical=hierarchical, nprobe=nprobe
    )
    if max_cluster_size is not None:
        assigned = _subsplit(assigned, max_cluster_size)
        join_keys = ["cid", "sub"]
    else:
        join_keys = ["cid"]

    sides = assigned.select(
        *join_keys,
        "vec_id",
        "cent_sim",
        F.col("embedding"),
        _norm("embedding").alias("nrm"),
    )
    a, b = sides.alias("a"), sides.alias("b")
    precede = (F.col("a.cent_sim") < F.col("b.cent_sim")) | (
        (F.col("a.cent_sim") == F.col("b.cent_sim"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
    )
    cond = precede
    for kcol in join_keys:
        cond = (F.col(f"a.{kcol}") == F.col(f"b.{kcol}")) & cond
    dropped = (
        a.join(b, cond)
        .withColumn(
            "cos",
            _dot("a.embedding", "b.embedding") / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("cos") >= 1.0 - eps)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_dup", F.lit(True)), "vec_id", "left")
        .withColumn("kept", F.col("_dup").isNull())
        .select("vec_id", "cid", "cent_sim", "kept")
    )


def semdedup_incremental(
    new_emb: DataFrame,
    index_assigned: DataFrame | None,
    cents: list,
    eps: float = 0.05,
    scale: int = IVF_INT_SCALE,
) -> DataFrame:
    """Streaming SemDeDup: kept flags for the NEW side only.

    The cross-batch contract mirrors ``dedup.lsh_pairs_incremental``:
    the accepted index is immutable — a new item is dropped when it has
    a semantic duplicate (cos >= 1 - eps) ANYWHERE in the accepted
    index (accepted always wins; you cannot retroactively drop what
    previous batches shipped), or an EARLIER duplicate in the paper's
    keep order (cent_sim asc, vec_id asc) within its own batch.
    Both checks are cid-equi-joins against the same frozen centroids,
    so pair cost stays Σ cluster² exactly like the one-shot operator —
    no all-pairs join, index side shuffles only the matching clusters.

    ``index_assigned`` is the accepted-embedding index
    ((vec_id, cid, cent_sim, embedding) — what ``assign_with_centroids``
    produced when those batches were accepted), or None for the first
    batch. Returns (vec_id, cid, cent_sim, embedding, kept).
    """
    assigned = assign_with_centroids(new_emb, cents, scale)
    sides = assigned.select(
        "cid", "vec_id", "cent_sim", "embedding", _norm("embedding").alias("nrm")
    )
    a, b = sides.alias("a"), sides.alias("b")
    precede = (F.col("a.cent_sim") < F.col("b.cent_sim")) | (
        (F.col("a.cent_sim") == F.col("b.cent_sim"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
    )
    within = (
        a.join(b, (F.col("a.cid") == F.col("b.cid")) & precede)
        .withColumn(
            "cos",
            _dot("a.embedding", "b.embedding") / (F.col("a.nrm") * F.col("b.nrm")),
        )
        .filter(F.col("cos") >= 1.0 - eps)
        .select(F.col("b.vec_id").alias("vec_id"))
    )
    dropped = within
    if index_assigned is not None:
        idx = index_assigned.select(
            "cid",
            F.col("vec_id").alias("_ivid"),
            F.col("embedding").alias("iemb"),
            _norm("embedding").alias("inrm"),
        )
        vs_index = (
            sides.join(idx, "cid")
            .withColumn(
                "cos", _dot("embedding", "iemb") / (F.col("nrm") * F.col("inrm"))
            )
            .filter(F.col("cos") >= 1.0 - eps)
            .select("vec_id")
        )
        dropped = dropped.unionByName(vs_index)
    return (
        assigned.join(
            dropped.distinct().withColumn("_dup", F.lit(True)), "vec_id", "left"
        )
        .withColumn("kept", F.col("_dup").isNull())
        .select("vec_id", "cid", "cent_sim", "embedding", "kept")
    )
