"""IVF-PQ: product-quantized approximate nearest neighbor — the
standard architecture for vector search at 100 TB (Faiss IVFPQ shape,
re-expressed as DataFrames).

Why PQ at scale: IVF alone still stores and scans full vectors
(64 floats = 256 B here). PQ splits each residual (vector minus its
coarse centroid) into ``m`` subspaces and stores only the id of the
nearest codeword per subspace — ``m`` small ints per vector (32× less
I/O at m=8 vs 64 float32). Queries score candidates with asymmetric
distance computation (ADC): one lookup table of ``m × ksub`` exact
subdistances per (query, probed cell), then every candidate's distance
is just ``m`` table lookups — a pure JVM array expression here, no
Python in the per-candidate path.

Division of labor (each piece where it belongs):
- codebook TRAINING: driver-side numpy Lloyd's on a deterministic
  sample of residuals (Faiss trains on a sample too; the codebook is
  m·ksub·dsub floats — tiny, shipped to executors by closure);
- ENCODING: Arrow-batched ``mapInPandas`` (argmin over ksub codewords
  per subspace — vectorized einsum work, the justified Python kernel);
- SEARCH: probe selection, LUT join, ADC scoring, and the salted
  two-phase top-k are all DataFrame ops; the shortlist is re-ranked by
  EXACT cosine (refine step), so PQ coarseness costs recall only via
  shortlist membership, never final ordering.

No cross-engine oracle: like seeded k-means IVF (n15), codebooks are
not reproducible in SQL — correctness is pinned by recall-vs-brute-force
and determinism tests (tests/test_pq.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import _dot, _norm, _topk_per_query, ivf_assign, ivf_centroids


def _kmeans_np(X: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Seeded Lloyd's over a driver-side sample. Deterministic: fixed
    init choice, fixed iteration count, ties broken by argmin order."""
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].astype(np.float64).copy()
    if len(C) < k:  # degenerate tiny sample: pad by repeating
        C = np.vstack([C] * (k // len(C) + 1))[:k]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            members = X[a == j]
            if len(members):
                C[j] = members.mean(0)
    return C


def train_pq_codebooks(
    assigned: DataFrame,
    centroids: DataFrame,
    m: int = 8,
    ksub: int = 16,
    seed: int = 29,
    sample: int = 2048,
) -> np.ndarray:
    """(m, ksub, dsub) codebooks from a deterministic residual sample
    (lowest vec_ids — stable across runs/partitionings, unlike df.sample)."""
    cent = {r.cid: np.asarray(r.centroid, dtype=np.float64) for r in centroids.collect()}
    rows = assigned.select("vec_id", "cid", "embedding").orderBy("vec_id").limit(sample).collect()
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) - cent[r.cid] for r in rows])
    d = X.shape[1]
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    dsub = d // m
    return np.stack(
        [_kmeans_np(X[:, j * dsub : (j + 1) * dsub], ksub, seed + j) for j in range(m)]
    )


def pq_encode(assigned: DataFrame, centroids: DataFrame, books: np.ndarray) -> DataFrame:
    """(vec_id, cid, codes array<int>): nearest codeword per subspace of
    the residual. Arrow-batched; the codebook rides in the closure."""
    m, ksub, dsub = books.shape
    cent = {r.cid: np.asarray(r.centroid, dtype=np.float64) for r in centroids.collect()}

    def encode(batches):
        for pdf in batches:
            E = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            C = np.stack([cent[c] for c in pdf["cid"]])
            R = (E - C).reshape(len(pdf), m, dsub)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                # (n, ksub) squared distances to subspace-j codewords
                dj = ((R[:, j, None, :] - books[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = dj.argmin(1)
            out = pdf[["vec_id", "cid"]].copy()
            out["codes"] = [list(map(int, c)) for c in codes]
            yield out

    return assigned.mapInPandas(encode, "vec_id long, cid int, codes array<int>")


def _probes(queries: DataFrame, centroids: DataFrame, nprobe: int) -> DataFrame:
    """Per query: the nprobe nearest cells (query_id, qemb, cid, centroid)."""
    from .similarity import _sqdist

    qj = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    ).crossJoin(F.broadcast(centroids))
    w = W.partitionBy("query_id").orderBy(_sqdist("qemb", "centroid"), "cid")
    return (
        qj.withColumn("prnk", F.row_number().over(w))
        .filter(F.col("prnk") <= nprobe)
        .select("query_id", "qemb", "cid", "centroid")
    )


def _probes_with_lut(probes: DataFrame, books: np.ndarray) -> DataFrame:
    """ADC lookup table per (query, cell): flat array of m·ksub exact
    subdistances between the query residual and every codeword."""
    m, ksub, dsub = books.shape

    def lut(batches):
        for pdf in batches:
            Q = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["qemb"]])
            C = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["centroid"]])
            R = (Q - C).reshape(len(pdf), m, dsub)
            tabs = np.empty((len(pdf), m, ksub))
            for j in range(m):
                tabs[:, j, :] = ((R[:, j, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            out = pdf[["query_id", "cid"]].copy()
            out["lut"] = [list(map(float, t.ravel())) for t in tabs]
            yield out

    return probes.mapInPandas(lut, "query_id long, cid int, lut array<double>")


def ivfpq_ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    seed: int = 13,
    pq_seed: int = 29,
    refine: int = 8,
) -> DataFrame:
    """IVF-PQ ANN with exact-cosine refine; output schema matches
    ivf_ann_topk/cosine_topk: (query_id, neighbor_id, cos, rnk)."""
    cents = ivf_centroids(emb, n_centroids, seed)
    assigned = ivf_assign(emb, cents)
    books = train_pq_codebooks(assigned, cents, m, ksub, pq_seed)
    codes = pq_encode(assigned, cents, books)
    return _search(codes, cents, books, emb, queries, k, nprobe, refine)


def _search(
    codes: DataFrame,
    cents: DataFrame,
    books: np.ndarray,
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int,
    refine: int,
) -> DataFrame:
    m, ksub, _ = books.shape
    plut = _probes_with_lut(_probes(queries, cents, nprobe), books)
    # ADC: m array lookups per candidate, all JVM-side codegen.
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), cast(0.0 as double),"
        f" (acc, i) -> acc + lut[i * {ksub} + codes[i]])"
    )
    scored = (
        codes.alias("c")
        .join(F.broadcast(plut).alias("q"), "cid")
        .filter(F.col("c.vec_id") != F.col("query_id"))
        # _topk_per_query ranks by `cos` DESC: negate the ADC distance.
        .withColumn("cos", -adc)
    )
    shortlist = _topk_per_query(scored, refine * k, neighbor="c.vec_id").select(
        "query_id", F.col("c.vec_id").alias("nid")
    )
    # refine: exact cosine on the shortlist only (|shortlist| = refine·k per query)
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb"))
    exact = (
        shortlist.join(emb.select(F.col("vec_id").alias("nid"), "embedding"), "nid")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", _dot("qemb", "embedding") / (_norm("qemb") * _norm("embedding")))
    )
    return _topk_per_query(exact, k, neighbor="nid").select(
        "query_id", F.col("nid").alias("neighbor_id"), "cos", "rnk"
    )


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 8,
    ksub: int = 16,
    seed: int = 13,
    pq_seed: int = 29,
) -> None:
    """The 100 TB shape: train once, write the compressed corpus once —
    codes are m ints per vector (the 32× I/O win), partitioned by cell
    for probe-time partition pruning; centroids and codebooks ride along
    as tiny side tables."""
    cents = ivf_centroids(emb, n_centroids, seed)
    assigned = ivf_assign(emb, cents)
    books = train_pq_codebooks(assigned, cents, m, ksub, pq_seed)
    pq_encode(assigned, cents, books).write.mode("overwrite").partitionBy("cid").parquet(
        f"{path}/codes"
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    spark = emb.sparkSession
    flat = [
        (j, i, [float(x) for x in books[j, i]])
        for j in range(m)
        for i in range(ksub)
    ]
    spark.createDataFrame(flat, "sub int, code int, word array<double>").write.mode(
        "overwrite"
    ).parquet(f"{path}/books")


def ivfpq_ann_topk_from_index(
    spark,
    path: str,
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    refine: int = 8,
) -> DataFrame:
    """Search a materialized IVF-PQ index: the codes read partition-prunes
    to probed cells; k-means and codebook training never rerun. ``emb``
    supplies full vectors for the exact-cosine refine step only (at scale:
    a vec_id-bucketed table, probed for |shortlist| rows per query)."""
    codes = spark.read.parquet(f"{path}/codes")
    cents = spark.read.parquet(f"{path}/centroids")
    rows = spark.read.parquet(f"{path}/books").collect()
    m = 1 + max(r.sub for r in rows)
    ksub = 1 + max(r.code for r in rows)
    dsub = len(rows[0].word)
    books = np.zeros((m, ksub, dsub))
    for r in rows:
        books[r.sub, r.code] = r.word
    return _search(codes, cents, books, emb, queries, k, nprobe, refine)
