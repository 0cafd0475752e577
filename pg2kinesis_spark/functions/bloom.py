"""Bloom-filter prefilter for incremental dedup indexes.

At 100 TB the hash index behind ``CorpusIngest``'s exact dedup holds
billions of 16-byte keys, and every micro-batch pays a left-anti join
against it. Most batch rows are NEW (never seen): a Bloom filter over
the accepted-hash set answers "definitely new" for them WITHOUT
touching the index, so the anti-join runs only over the (tiny)
maybe-seen residue. False positives cost one redundant join probe;
false NEGATIVES are impossible by construction, so the accepted set is
bit-identical with the prefilter on or off — the invariant the tests
pin.

Design:

* **Double hashing, JVM-side.** The two 64-bit base hashes are
  ``xxhash64(key)`` and ``xxhash64(key, 1)`` computed as Catalyst
  expressions (codegen, no Python); probe ``i`` is ``h1 + i*h2 mod m``
  (Kirsch–Mitzenmacher), evaluated vectorized in numpy inside an
  Arrow-batched pandas UDF against a task-broadcast bit array.
* **Distributed build, driver OR.** Each Arrow batch of accepted
  hashes packs its own ``m/8``-byte partial bloom (``np.packbits``
  layout); the driver ORs the partials — a few MB each, never
  data-sized.
* **Per-batch sidecar files.** ``bloom/bloom_{batch_id}.bin`` next to
  the parquet index, OR-unioned at load. Loading EXCLUDES the current
  batch id — the same crash-replay contract as the parquet indexes
  (a replayed batch must not see its own partial writes). A bloom file
  is written BEFORE its index partition: if the job dies between the
  two, the bloom over-approximates (rows flagged maybe-seen hit the
  index, find nothing, and are re-accepted) — never under-approximates,
  which would silently re-admit duplicates.

Sizing: ``m_bits = 1 << 23`` (1 MiB) with ``k = 7`` holds ~600k keys
at <1% false-positive rate; at deployment scale pick
``m_bits ≈ 10 × expected_keys`` (still MBs per billion keys per
batch-file; the union cost is driver-side ORs of small arrays).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_hash_cols(key: Column) -> tuple[Column, Column]:
    """The two JVM-side base hashes for double hashing. ``xxhash64``
    with an extra literal column is an independent 64-bit hash of the
    same key (the literal perturbs the streaming state)."""
    return F.xxhash64(key), F.xxhash64(key, F.lit(1))


def _probe_positions(h1: np.ndarray, h2: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch–Mitzenmacher double hashing.
    ``m_bits`` must be a power of two (mask instead of modulo)."""
    u1 = h1.astype(np.int64).view(np.uint64)
    u2 = h2.astype(np.int64).view(np.uint64)
    ks = np.arange(k, dtype=np.uint64)
    return (u1[:, None] + ks[None, :] * u2[:, None]) & np.uint64(m_bits - 1)


def build_bloom(df: DataFrame, h1_col: str, h2_col: str, m_bits: int, k: int) -> np.ndarray:
    """Distributed bloom build: per-Arrow-batch partial bit arrays
    (packed uint8), OR-reduced on the driver. Returns the packed
    ``m_bits/8``-byte array."""
    if m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")

    def kernel(batches):
        for pdf in batches:
            bits = np.zeros(m_bits // 8, dtype=np.uint8)
            if len(pdf):
                pos = _probe_positions(
                    pdf[h1_col].to_numpy(), pdf[h2_col].to_numpy(), m_bits, k
                ).ravel()
                np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                                 (1 << (pos & np.uint64(7))).astype(np.uint8))
            yield pd.DataFrame({"partial": [bits.tobytes()]})

    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in df.select(h1_col, h2_col).mapInPandas(kernel, "partial binary").collect():
        out |= np.frombuffer(row.partial, dtype=np.uint8)
    return out


def maybe_seen_udf(spark, bloom_bits: np.ndarray, k: int):
    """Vectorized membership test: BooleanType pandas UDF over the two
    base-hash columns. The packed bit array rides a SparkContext
    broadcast (one copy per executor, not per task)."""
    from pyspark.sql.functions import pandas_udf

    m_bits = len(bloom_bits) * 8
    bc = spark.sparkContext.broadcast(bloom_bits.tobytes())

    @pandas_udf("boolean")
    def _maybe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        if len(h1) == 0:
            return pd.Series([], dtype=bool)
        pos = _probe_positions(h1.to_numpy(), h2.to_numpy(), m_bits, k)
        hit = (bits[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return _maybe


class BloomSidecar:
    """Per-batch bloom files next to a parquet dedup index, with the
    index's replay-exclusion contract."""

    def __init__(self, dir_path: str, m_bits: int = 1 << 23, k: int = 7):
        if m_bits & (m_bits - 1):
            raise ValueError(f"m_bits must be a power of two, got {m_bits}")
        self.dir = dir_path
        self.m_bits = m_bits
        self.k = k

    def _files(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(
            f for f in os.listdir(self.dir) if re.fullmatch(r"bloom_-?\d+\.bin", f)
        )

    def load_union(
        self,
        exclude_batch_id: int | None = None,
        require_batch_ids: "set[int] | None" = None,
    ) -> np.ndarray | None:
        """OR of every batch's bloom except ``exclude_batch_id``'s.
        Returns None when no (other-batch) blooms exist yet.

        ``require_batch_ids`` is the coverage contract: the batch ids
        the index being prefiltered actually holds. If ANY of them has
        no bloom file (an index created before the sidecar existed, a
        stretch of batches run with the filter disabled, a lost/partial
        ``bloom/`` dir), the union would UNDER-approximate — a key from
        the uncovered batch reads "definitely new" and a duplicate is
        silently re-admitted. That breaks the no-false-negatives
        contract, so the load refuses (returns None) and the caller
        falls back to the full index join."""
        out = None
        covered: set[int] = set()
        for f in self._files():
            bid = int(f[len("bloom_") : -len(".bin")])
            if exclude_batch_id is not None and bid == exclude_batch_id:
                continue
            covered.add(bid)
            with open(os.path.join(self.dir, f), "rb") as fh:
                arr = np.frombuffer(fh.read(), dtype=np.uint8)
            if len(arr) != self.m_bits // 8:
                raise ValueError(
                    f"bloom file {f} has {len(arr)} bytes, expected {self.m_bits // 8}"
                    " — m_bits changed under an existing index"
                )
            out = arr.copy() if out is None else (out | arr)
        if require_batch_ids is not None and not set(require_batch_ids) <= covered:
            return None  # index batches without a bloom: filter unsafe
        return out

    def write(self, df: DataFrame, h1_col: str, h2_col: str, batch_id: int) -> None:
        """Build + atomically write this batch's bloom (tmp + rename —
        a torn write must never surface as a short valid file)."""
        bits = build_bloom(df, h1_col, h2_col, self.m_bits, self.k)
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(self.dir, f"bloom_{batch_id}.bin")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(bits.tobytes())
        os.replace(tmp, path)
