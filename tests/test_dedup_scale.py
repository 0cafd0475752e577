"""SimHash multi-index pair search vs brute force, and the incremental
LSH index path's union invariant."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.functions.dedup import (
    append_minhash_signatures,
    lsh_pairs_incremental,
    minhash_lsh_pairs,
    minhash_lsh_pairs_from_signatures,
    simhash,
    simhash_pairs,
    write_minhash_signatures,
)

MASK64 = (1 << 64) - 1


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _brute_pairs(sigs: dict[int, int], d: int) -> set[tuple[int, int, int]]:
    ids = sorted(sigs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((sigs[a] ^ sigs[b]) & MASK64).count("1")
            if h <= d:
                out.add((a, b, h))
    return out


@pytest.fixture(scope="module")
def planted(spark):
    # 150 random signatures plus 30 planted near-neighbors (≤3 flipped
    # bits off a base) — brute force is the oracle.
    rng = random.Random(3)
    sigs = {i: rng.getrandbits(64) for i in range(150)}
    nid = 1000
    for _ in range(30):
        base = sigs[rng.randrange(150)]
        v = base
        for _ in range(rng.randint(0, 3)):
            v ^= 1 << rng.randrange(64)
        sigs[nid] = v
        nid += 1
    df = spark.createDataFrame(
        [(i, _signed(v)) for i, v in sigs.items()], "doc_id long, simhash long"
    )
    return sigs, df


def test_simhash_pairs_match_brute_force(spark, planted):
    sigs, df = planted
    got = {
        (r["id1"], r["id2"], r["hamming"])
        for r in simhash_pairs(df, max_hamming=3).collect()
    }
    assert got == _brute_pairs(sigs, 3)


def test_simhash_pairs_exact_mode(spark, planted):
    # max_hamming=0 → one 64-bit segment: exact signature duplicates.
    sigs, df = planted
    got = {
        (r["id1"], r["id2"]) for r in simhash_pairs(df, max_hamming=0).collect()
    }
    assert got == {(a, b) for a, b, _ in _brute_pairs(sigs, 0)}


def test_simhash_bucket_cap_bounds_cost(spark):
    # 50 docs sharing segment 0 (low 16 bits) but far apart elsewhere:
    # the cap drops that bucket; the planted close pair (differing only
    # in a high bit) still surfaces through segment 1-3 buckets.
    rows = [(i, _signed((i << 32) | 0xBEEF)) for i in range(50)]
    rows += [(100, _signed(0xAAAA_0000_0000_0001)), (101, _signed(0x2AAA_0000_0000_0001))]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    capped = simhash_pairs(df, max_hamming=3, max_bucket_df=10).collect()
    got = {(r["id1"], r["id2"]) for r in capped}
    assert (100, 101) in got
    assert all(not (a < 50 and b < 50) for a, b in got)


def test_simhash_pipeline_consistency(spark, sf_small):
    from pg2kinesis_spark.io import load_table

    docs = load_table(spark, sf_small, "documents").limit(200)
    sig = simhash(docs.select("doc_id", "text"))
    pairs = simhash_pairs(sig, max_hamming=3).collect()
    sigs = {r["doc_id"]: r["simhash"] & MASK64 for r in sig.collect()}
    assert {
        (r["id1"], r["id2"], r["hamming"]) for r in pairs
    } == _brute_pairs(sigs, 3)


@pytest.fixture(scope="module")
def split_docs(spark, sf_small):
    from pg2kinesis_spark.io import load_table

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text")
    med = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    return docs, docs.filter(F.col("doc_id") <= med), docs.filter(F.col("doc_id") > med)


def _pairset(df):
    return {
        (r["id1"], r["id2"], round(r["est_jaccard"], 6)) for r in df.collect()
    }


def test_incremental_union_equals_full(spark, split_docs, tmp_path):
    docs, old, new = split_docs
    path = str(tmp_path / "sig_idx")
    write_minhash_signatures(old, path)
    full = _pairset(minhash_lsh_pairs(docs))
    old_only = _pairset(minhash_lsh_pairs(old))
    inc = _pairset(lsh_pairs_incremental(spark, new, path))
    assert old_only | inc == full
    assert old_only.isdisjoint(inc)
    assert inc, "sf0.001 halves must share near-dup candidates"


def test_append_then_reread_equals_full(spark, split_docs, tmp_path):
    docs, old, new = split_docs
    path = str(tmp_path / "sig_idx2")
    write_minhash_signatures(old, path)
    append_minhash_signatures(new, path)
    full = _pairset(minhash_lsh_pairs(docs))
    assert _pairset(minhash_lsh_pairs_from_signatures(spark, path)) == full


def test_refine_pairs_levenshtein(spark):
    from pg2kinesis_spark.functions.dedup import (
        minhash_lsh_pairs,
        refine_pairs_levenshtein,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today ok"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("today", "tonite")),     # few edits
            (3, base.replace("quick", "slow").replace("lazy", "busy")),
            (4, "completely different words forming some other document body"),
        ],
        ["doc_id", "text"],
    )
    pairs = minhash_lsh_pairs(docs, n=2, k=16, bands=8)
    refined = refine_pairs_levenshtein(pairs, docs, max_dist=8)
    got = {(r["id1"], r["id2"]): r["edit_dist"] for r in refined.collect()}
    assert (1, 2) in got and got[(1, 2)] <= 6
    # pairs over the threshold are dropped even if the sketch proposed them
    assert all(d <= 8 for d in got.values())
    # the threshold form must short-circuit (-1) rather than compute full
    # distance: no pair with a big true distance survives
    assert (1, 4) not in got and (2, 4) not in got


def test_write_sharded(spark, tmp_path):
    import glob

    from pg2kinesis_spark.io import write_sharded

    df = spark.createDataFrame(
        [(i, "x" * 1000) for i in range(2000)], ["doc_id", "text"]
    )
    # 2 MB of text / 2.5 -> ~0.8 MB est; 1 MB target -> 1 shard
    n = write_sharded(df, str(tmp_path / "a"), target_mb=1)
    files = glob.glob(str(tmp_path / "a" / "part-*"))
    assert n == len(files) == 1
    # tiny target -> multiple equal shards
    n2 = write_sharded(df, str(tmp_path / "b"), target_mb=0.2)
    files2 = glob.glob(str(tmp_path / "b" / "part-*"))
    assert n2 == len(files2) > 1
    assert spark.read.parquet(str(tmp_path / "b")).count() == 2000
