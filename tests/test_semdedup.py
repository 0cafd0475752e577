"""SemDeDup oracle tests.

The pure-Python mirror below re-implements the WHOLE operator
independently — integer k-means, assignment, centroid cosine, and the
triangular drop rule — with plain left-fold double arithmetic, so the
comparison with the Spark result is exact set equality, not tolerance.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.functions import semdedup as sd
from pg2kinesis_spark.io import load_table

SCALE = 10000


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_int_vec(v):
    return [int(math.floor(float(x) * float(SCALE))) + SCALE for x in v]


def _py_sqdist(a, b):
    acc = 0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _py_dot(a, b):
    # left-fold in element order — matches Spark's aggregate(zip_with(...))
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _py_cos(a, b):
    return _py_dot(a, b) / (math.sqrt(_py_dot(a, a)) * math.sqrt(_py_dot(b, b)))


def _py_centroids(rows, n_centroids, n_iter):
    """rows: list[(vec_id, emb)] — mirror of similarity.ivf_int_centroids."""
    q = {vid: _py_int_vec(emb) for vid, emb in rows}
    seeds = sorted(q, key=lambda vid: (_py_hash60(str(vid)), vid))[:n_centroids]
    cents = [list(q[vid]) for vid in seeds]
    dim = len(cents[0])
    for _ in range(n_iter):
        buckets: dict[int, list] = {}
        for vid, qv in q.items():
            cid = min(range(len(cents)), key=lambda i: (_py_sqdist(qv, cents[i]), i))
            buckets.setdefault(cid, []).append(qv)
        new = []
        for i, c in enumerate(cents):
            members = buckets.get(i)
            if not members:
                new.append(c)
                continue
            n = len(members)
            new.append([sum(m[d] for m in members) // n for d in range(dim)])
        cents = new
    return cents


def _py_semdedup(rows, n_centroids, n_iter, eps):
    cents = _py_centroids(rows, n_centroids, n_iter)
    cents_d = [[(c - SCALE) / SCALE for c in cent] for cent in cents]
    assigned = []  # (vec_id, cid, cent_sim, emb)
    for vid, emb in rows:
        qv = _py_int_vec(emb)
        cid = min(range(len(cents)), key=lambda i: (_py_sqdist(qv, cents[i]), i))
        assigned.append((vid, cid, _py_cos(emb, cents_d[cid]), emb))
    clusters: dict[int, list] = {}
    for vid, cid, cs, emb in assigned:
        clusters.setdefault(cid, []).append((cs, vid, emb))
    dropped = set()
    for members in clusters.values():
        members.sort(key=lambda t: (t[0], t[1]))
        for j in range(len(members)):
            for i in range(j):
                if _py_cos(members[i][2], members[j][2]) >= 1.0 - eps:
                    dropped.add(members[j][1])
                    break
    return {(vid, cid, vid not in dropped) for vid, cid, _, _ in assigned}


@pytest.fixture(scope="module")
def emb_rows(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    return [(r.vec_id, list(r.embedding)) for r in emb.collect()]


def test_semdedup_matches_python_oracle(spark, sf_small, emb_rows):
    # BOTH execution paths against the independent mirror: the numpy
    # driver fast path (default at this size) and the distributed
    # join path (driver_threshold=None)
    emb = load_table(spark, sf_small, "embeddings")
    want = _py_semdedup(emb_rows, n_centroids=8, n_iter=2, eps=0.6)
    for thr in (20_000, None):
        got = {
            (r.vec_id, r.cid, r.kept)
            for r in sd.semdedup(
                emb, dim=64, eps=0.6, n_clusters=8, n_iter=2, driver_threshold=thr
            ).collect()
        }
        assert got == want, f"driver_threshold={thr}"
    # the oracle corpus must actually exercise both branches
    assert any(not kept for _, _, kept in want)
    assert any(kept for _, _, kept in want)


def test_semdedup_driver_path_bitwise_parity(spark):
    """Driver fast path == distributed path EXACTLY, including
    cent_sim to the last ULP, on adversarial inputs: negatives,
    near-duplicates straddling the eps boundary, and exact clones
    (cent_sim ties). A zero-norm embedding FAIL-STOPS on both paths
    (Spark 4 ANSI raises DIVIDE_BY_ZERO for double division; the
    driver mirror raises too)."""
    import struct as _struct

    import numpy as np

    rng = np.random.RandomState(77)
    base = rng.randn(40, 8).astype(np.float32)
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(40)]
    rows += [(100, rows[3][1])]  # exact clone (cent_sim tie)
    rows += [(101, [float(x) for x in (base[5] * 1.000001)])]  # boundary dup
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(dim=8, eps=0.15, n_clusters=4, n_iter=2)
    fast = sorted(
        sd.semdedup(emb, driver_threshold=20_000, **kw).collect(),
        key=lambda r: r.vec_id,
    )
    dist = sorted(
        sd.semdedup(emb, driver_threshold=None, **kw).collect(),
        key=lambda r: r.vec_id,
    )
    assert len(fast) == len(dist) == len(rows)
    assert any(not r.kept for r in dist)  # the planted dups actually drop
    for a, b in zip(fast, dist):
        assert (a.vec_id, a.cid, a.kept) == (b.vec_id, b.cid, b.kept)
        pa = _struct.pack(">d", a.cent_sim)
        pb = _struct.pack(">d", b.cent_sim)
        assert pa == pb, (a.vec_id, a.cent_sim, b.cent_sim)
    # zero-norm embedding: both paths fail-stop
    zemb = spark.createDataFrame(
        rows[:8] + [(102, [0.0] * 8)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ArithmeticError):
        sd.semdedup(zemb, driver_threshold=20_000, **kw).collect()
    with pytest.raises(Exception, match="(?i)divide|zero"):
        sd.semdedup(zemb, driver_threshold=None, **kw).collect()


def test_semdedup_deterministic_across_runs(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    r1 = sorted(map(tuple, sd.semdedup(emb, dim=64, eps=0.5, n_clusters=8).collect()))
    r2 = sorted(map(tuple, sd.semdedup(emb, dim=64, eps=0.5, n_clusters=8).collect()))
    assert r1 == r2


def test_semdedup_eps_zero_drops_only_exact_clones(spark):
    # two bitwise-identical vectors + one distinct: eps=0 keeps the
    # distinct vector and exactly one of the clones
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r.kept for r in sd.semdedup(emb, dim=3, eps=0.0, n_clusters=2).collect()}
    assert rows[3] is True
    assert sorted([rows[1], rows[2]]) == [False, True]


def test_semdedup_subsplit_never_drops_more(spark, sf_small):
    """Sub-splitting oversized clusters only REMOVES candidate pairs, so
    the kept set can only grow — the documented recall/cost trade."""
    emb = load_table(spark, sf_small, "embeddings")
    exact = {r.vec_id for r in sd.semdedup(emb, dim=64, eps=0.6, n_clusters=4).collect() if r.kept}
    split = {
        r.vec_id
        for r in sd.semdedup(
            emb, dim=64, eps=0.6, n_clusters=4, max_cluster_size=20
        ).collect()
        if r.kept
    }
    assert exact <= split


def test_semdedup_plan_has_no_cluster_funnel_window(spark, sf_small):
    """The drop rule must be join+distinct, not a per-cluster window —
    a window over cid would funnel a whole cluster into one task."""
    emb = load_table(spark, sf_small, "embeddings")
    plan = (
        sd.semdedup(emb, dim=64, eps=0.5, n_clusters=8, driver_threshold=None)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan


def test_hier_assign_exact_when_all_groups_probed(spark, sf_small):
    """K=8 → K1=2 coarse groups; nprobe=2 probes both, so hierarchical
    assignment must equal the flat argmin exactly."""
    emb = load_table(spark, sf_small, "embeddings")
    flat = {
        (r.vec_id, r.cid)
        for r in sd.semdedup_assign(emb, dim=64, n_clusters=8).collect()
    }
    hier = {
        (r.vec_id, r.cid)
        for r in sd.semdedup_assign(
            emb, dim=64, n_clusters=8, hierarchical=True, nprobe=2,
            train_per_centroid=1_000_000,
        ).collect()
    }
    assert hier == flat


def test_hier_assign_high_agreement_when_probing_subset(spark, sf_small):
    """K=16 → K1=4, nprobe=2 probes half the groups: assignment is
    IVF-approximate but must agree with flat for the large majority."""
    emb = load_table(spark, sf_small, "embeddings")
    flat = {
        r.vec_id: r.cid for r in sd.semdedup_assign(emb, dim=64, n_clusters=16).collect()
    }
    hier = {
        r.vec_id: r.cid
        for r in sd.semdedup_assign(
            emb, dim=64, n_clusters=16, hierarchical=True, nprobe=2,
            train_per_centroid=1_000_000,
        ).collect()
    }
    assert set(hier) == set(flat)
    agree = sum(1 for v in flat if hier[v] == flat[v]) / len(flat)
    assert agree >= 0.8, agree


def test_hier_semdedup_deterministic_and_plan(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    kw = dict(dim=64, eps=0.5, n_clusters=16, hierarchical=True)
    r1 = sorted(map(tuple, sd.semdedup(emb, **kw).collect()))
    r2 = sorted(map(tuple, sd.semdedup(emb, **kw).collect()))
    assert r1 == r2
    plan = sd.semdedup(emb, **kw)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan  # the flat path's crossJoin is gone
