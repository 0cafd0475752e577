"""Benchmark headline queries for the driver.

Output contract (round 11): the orchestrator prints the FULL record
as line 1 (mirrored to BENCH_FULL_latest.json) and a COMPACT headline
JSON line LAST — the driver machine-reads only the last ~2,000 chars
of stdout, so the final line must be a complete object on its own
(metric/value/unit/queries/sf + probe context, kept under 1,900
chars). Child/subset invocations print exactly one line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).

Harness shape (round 6): by default this process is an ORCHESTRATOR —
it runs the entries in a handful of FRESH-JVM groups (subprocesses with
``SPARK_GRAFT_BENCH_ONLY`` set) and merges their JSON lines. A 32-entry
single-JVM run measures accumulated GC/codegen-cache pressure as much
as the operators (BENCH_r04/r05 vs the controlled SCALING.md table
disagreed ~1.2-1.6x on entries whose code hadn't changed); small fresh
processes reproduce the controlled condition the SCALING.md
reconciliation used. Each entry gets an untimed warm-up pass plus
best-of-3 (best-of-2 for slow entries), and the artifact carries the
per-entry [min, max, reps] spread so run-to-run noise is visible
instead of silently baked into a single number. Children's stderr is
scanned for JVM stack traces: any found are counted and labeled in the
output (r05's artifact carried an unexplained py4j AnalysisException
trace — the first-batch index probe in corpus_ingest, since fixed to a
quiet Hadoop-FS existence check).

``SPARK_GRAFT_BENCH_ONLY=a,b,c`` still runs exactly that subset inline
in THIS process (the controlled-conditions knob, and the orchestrator's
child protocol).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q13_hash_agg",       # scan + hash aggregate (TPC-H Q1 skeleton)
    "q2_join_chain",      # 3-table join
    "q17_rank_window",    # window exchange + sort
    "q9_maxby_lastwins",  # wide groupBy (14k+ groups at sf0.1: 150k)
    "q23_array_aggregate",# array lambda over embeddings
    "n5_dedup_exact",     # content-hash dedup over documents
    "n9_cosine_topk",     # brute-force ANN baseline
    "q26_asof_join",      # as-of join over 100k events (union+window)
]


def bench_minhash_full(spark, sf_dir):
    """MinHash+LSH candidate pairs over the FULL documents table —
    the representative 100 TB dedup workload shape."""
    from pg2kinesis_spark.functions.dedup import minhash_lsh_pairs
    from pg2kinesis_spark.io import load_table

    return minhash_lsh_pairs(_docs_parallel(spark, sf_dir), n=3, k=16, bands=4)


def bench_cdc_replay(spark, sf_dir, xid_eager=False):
    """CDC replay throughput: parse+enrich+format ~450k test_decoding
    wire lines (BASELINE.md bench item 4). The corpus is materialized to
    parquet once — the measured pipeline then reads the same columnar
    source the replay path uses (and the prefix-scan's min/max pass
    prunes to the lsn column). Sized so throughput is measured against
    the pipeline's marginal rate, not Spark's ~0.4 s fixed job overhead,
    which dominated the previous ~100k-line corpus."""
    import tempfile

    from pg2kinesis_spark import fixtures as fx
    from pg2kinesis_spark.catalog import primary_key_map
    from pg2kinesis_spark.operators.formatters import format_csv
    from pg2kinesis_spark.operators.test_decoding import parse_test_decoding

    # layout is part of the name: a host with the old 8-file cache must
    # rebuild, or the repartition(32) change silently never applies
    corpus = os.path.join(tempfile.gettempdir(), "bench_cdc_corpus_100000x32.parquet")
    if not os.path.exists(corpus):
        rows = fx.gen_test_decoding(n_txns=100000, seed=42)  # ~450k wire lines
        # 32 files: the kernel is embarrassingly parallel and the bench
        # box has 32 cores — an 8-file corpus was measuring scheduling,
        # not the parser (real CDC archives ship many segments)
        spark.createDataFrame(rows, "lsn long, data_size int, payload string").repartition(
            32, "lsn"
        ).write.mode("overwrite").parquet(corpus)
    raw = spark.read.parquet(corpus)
    cat = spark.createDataFrame(
        fx.pk_catalog_rows(), "table_name string, col_name string, col_type string, col_ord_pos int"
    )
    # xid_eager=False: a replay backfill builds the plan once and runs
    # it once, so the xid carry's two driver-blocking jobs are pure
    # latency — the lazy carry schedules them inside the measured job
    # graph instead (eager-vs-lazy equality is pytest-pinned and the
    # lazy path is hash-checked by driver row c2). This is where the
    # r2-r4 vs r5-r7 throughput gap lived: the build-inclusive timer
    # pays plan construction + eager jobs, not parse cost (SCALING.md
    # "cdc_replay: reconciling").
    return format_csv(
        parse_test_decoding(raw, primary_key_map(cat), xid_eager=xid_eager)
    ).select("lsn", "xid", "fmt_msg")


_PGOUT_REG_CACHE: dict = {}


def bench_pgoutput_replay(spark, sf_dir, xid_eager=False):
    """pgoutput binary-protocol parse throughput: ~190k framed messages
    through decode kernel + distributed xid prefix-scan + broadcast
    registry join + CSV format — the binary twin of cdc_replay_450k.

    The relation registry is built ONCE per corpus and passed in
    materialized: that is the deployment shape (Relation messages
    establish the registry once per slot connection; every subsequent
    batch reuses it), so timing a per-batch registry rebuild would
    measure a job no deployment runs. The xid prefix-scan's eager
    phases run on the pure-JVM begin-stats twin (parse_pgoutput), so
    the timed build no longer re-executes the Python decode 3x."""
    import tempfile

    from pg2kinesis_spark import fixtures as fx
    from pg2kinesis_spark.operators.formatters import format_csv
    from pg2kinesis_spark.operators.pgoutput import (
        pgoutput_cdc_changes,
        relation_registry_from_replay,
    )
    from pyspark.sql import functions as F

    corpus = os.path.join(tempfile.gettempdir(), "bench_pgout_corpus_40000x32.parquet")
    if not os.path.exists(corpus):
        rows = fx.gen_pgoutput(n_txns=40000, seed=44)
        # 32 files: the kernel is embarrassingly parallel and the bench
        # box has 32 cores — an 8-file corpus was measuring scheduling,
        # not the parser (real CDC archives ship many segments)
        spark.createDataFrame(rows, "lsn long, data_size int, payload string").repartition(
            32, "lsn"
        ).write.mode("overwrite").parquet(corpus)
    raw = spark.read.parquet(corpus).select(
        "lsn", "data_size", F.unbase64("payload").alias("payload")
    )
    if corpus not in _PGOUT_REG_CACHE:
        reg_df = relation_registry_from_replay(spark, corpus)
        _PGOUT_REG_CACHE[corpus] = (reg_df.collect(), reg_df.schema)
    rows, schema = _PGOUT_REG_CACHE[corpus]
    registry = spark.createDataFrame(rows, schema)
    # xid_eager=False: same backfill argument as cdc_replay — the JVM
    # begin twins feed the LAZY bounds/summary branches, so the build
    # runs zero driver jobs (SCALING.md "cdc_replay: reconciling")
    return format_csv(
        pgoutput_cdc_changes(raw, registry=registry, xid_eager=xid_eager)
    ).select("lsn", "xid", "fmt_msg")


def _table_parallel(spark, sf_dir, name="documents", cols=None):
    """A testdata table, repartitioned with a localCheckpoint barrier:
    every sf0.1 file is ONE parquet row group, so any per-row map work
    ahead of an operator's first shuffle (tokenize, shingle, minhash,
    vector parse, gates) would otherwise run on one core — splits align
    to row groups, no split knob can help (see the gopher_filter
    parallelism note). At deployment scale multi-row-group files make
    this a no-op shape; the barrier is needed because Catalyst pushes
    deterministic work straight back through a bare repartition()."""
    from pg2kinesis_spark.io import load_table

    df = load_table(spark, sf_dir, name)
    if cols:
        df = df.select(*cols)
    return df.repartition(
        spark.sparkContext.defaultParallelism
    ).localCheckpoint(eager=False)


def _docs_parallel(spark, sf_dir, cols=None):
    return _table_parallel(spark, sf_dir, "documents", cols)


def bench_curate(spark, sf_dir):
    """Full corpus curation over documents: fused annotate + lang/quality
    filter + exact dedup + MinHash-LSH near-dup removal — the end-to-end
    100 TB training-data pipeline shape."""
    from pg2kinesis_spark.functions.curate import curate_corpus

    return curate_corpus(
        _docs_parallel(spark, sf_dir), min_quality=0.2, near_dup_jaccard=0.6
    )


def bench_curate_max(spark, sf_dir):
    """curate_corpus with EVERY gate on: quality + Gopher + PII + exact
    dedup + LSH near-dup + substring dedup + eval decontamination — the
    full 100 TB pipeline wall-to-wall."""
    from pyspark.sql import functions as F

    from pg2kinesis_spark.functions.curate import curate_corpus

    docs = _docs_parallel(spark, sf_dir, cols=("doc_id", "text"))
    eval_df = docs.limit(20).select(
        F.col("doc_id").alias("eval_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 3, 18))").alias("text"),
    )
    return curate_corpus(
        docs,
        min_quality=0.2,
        gopher=True,
        max_pii=0,
        near_dup_jaccard=0.6,
        substring_k=20,
        eval_df=eval_df,
    )


def bench_curate_ultra(spark, sf_dir):
    """curate_corpus with EVERY gate in the repo on, including the
    round-4 stages: URL front door (synthesized deterministic URLs) ->
    quality + Gopher + PII + exact/LSH/substring dedup + eval
    decontamination + SemDeDup (embeddings joined on doc_id) -> DSIR
    selection toward a 200-doc target. The complete 100 TB pipeline
    wall-to-wall."""
    from pyspark.sql import functions as F

    from pg2kinesis_spark.functions.curate import curate_corpus
    from pg2kinesis_spark.io import load_table

    docs = (
        _docs_parallel(spark, sf_dir, cols=("doc_id", "text"))
        .withColumn(
            "url",
            F.expr(
                "concat('https://www.d', pmod(hash(doc_id), 500), '.example.com/p/',"
                " doc_id, '?utm_source=bench')"
            ),
        )
    )
    emb = _table_parallel(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.col("embedding")
    )
    eval_df = docs.limit(20).select(
        F.col("doc_id").alias("eval_id"),
        F.expr("concat_ws(' ', slice(split(text, ' '), 3, 18))").alias("text"),
    )
    target = docs.select("doc_id", "text").limit(200)
    return curate_corpus(
        docs,
        min_quality=0.2,
        gopher=True,
        max_pii=0,
        near_dup_jaccard=0.6,
        substring_k=20,
        eval_df=eval_df,
        url_col="url",
        url_blocklist=[f"d{i}.example.com" for i in range(20)],
        url_badwords=("casino",),
        embeddings=emb,
        semdedup_eps=0.4,
        semdedup_clusters=8,
        dsir_target=target,
        dsir_n=1500,
    )


def bench_cosine_blas(spark, sf_dir):
    """Same workload as n9_cosine_topk through the BLAS mapInPandas path
    (one dgemm per Arrow batch, local top-k per batch) — the exact-ANN
    throughput shape for 100 TB corpora."""
    from pg2kinesis_spark.functions.similarity import cosine_topk_blas
    from pg2kinesis_spark.io import load_table
    from pyspark.sql import functions as F

    # plain load: the dgemm batches are already core-bound through
    # Arrow; the _table_parallel checkpoint materialization costs more
    # than it spreads here (r9 decomposition — the r8 "regression")
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_blas(emb, emb.filter(F.col("vec_id") < 20), k=5)


def bench_gopher(spark, sf_dir):
    """Gopher A1.1 repetition+shape gate over the FULL documents table —
    six doc_id-keyed explode/agg passes (top 2/3/4-gram, dup 5/10-gram,
    dup lines) plus the zero-shuffle shape pass."""
    from pg2kinesis_spark.functions.repetition import gopher_filter
    from pg2kinesis_spark.io import load_table

    # parallelism: the sf0.1 documents file is ONE parquet row group, so
    # without the explicit repartition the whole interpreted HOF gate
    # runs on one core — measuring storage layout, not the operator
    # (the cdc corpus's repartition(32) precedent)
    return gopher_filter(
        _docs_parallel(spark, sf_dir),
        parallelism=spark.sparkContext.defaultParallelism,
    )


def bench_substr_dedup(spark, sf_dir):
    """Exact substring dedup (Lee et al.) over the FULL documents table:
    rolling 20-gram hash stream, groupBy-min first-occurrence, loser-only
    rebuild."""
    from pg2kinesis_spark.functions.substr_dedup import dedup_substrings
    from pg2kinesis_spark.io import load_table

    return dedup_substrings(
        _docs_parallel(spark, sf_dir, cols=("doc_id", "text")), k=20
    )


def bench_bm25(spark, sf_dir):
    """BM25 over the FULL documents table, index built in-plan: the
    lexical-retrieval workload shape (tokenize -> postings -> broadcast
    query probe -> salted two-phase top-k)."""
    from pg2kinesis_spark.functions.search import bm25_topk
    from pg2kinesis_spark.io import load_table

    qs = {
        "q1": "spark window merge join",
        "q2": "customer order data stream",
        "q3": "vector hash batch",
        # the synthetic corpus puts almost every term in >half the docs
        # (idf floors to 0 — Lucene semantics), so q1-q3 measure only the
        # index build; "dup" is the one selective term (df ~5%) and makes
        # the scoring + salted top-k path do real work too
        "q4": "dup scan filter",
    }
    return bm25_topk(spark, _docs_parallel(spark, sf_dir), qs, k=10)


def bench_decontam(spark, sf_dir):
    """Eval-set decontamination over the FULL documents table vs a
    50-snippet eval set (broadcast gram probe + anti join)."""
    from pyspark.sql import functions as F

    from pg2kinesis_spark.functions.contamination import decontaminate
    from pg2kinesis_spark.io import load_table

    docs = _docs_parallel(spark, sf_dir)
    eval_df = (
        docs.limit(50)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.expr("concat_ws(' ', slice(split(text, ' '), 3, 18))").alias("text"),
        )
    )
    return decontaminate(docs, eval_df, n=13)


def bench_pack(spark, sf_dir):
    """Sequence packing layout over the FULL documents table
    (distributed two-phase cumsum, 2048-token sequences)."""
    from pyspark.sql import functions as F

    from pg2kinesis_spark.functions.packing import pack_sequences
    from pg2kinesis_spark.io import load_table

    # plain load: the per-row map work here is one split+size — the
    # _docs_parallel checkpoint materialization costs more than it
    # spreads (r9: 0.96 s with the barrier vs ~0.77 without, the whole
    # r8 "regression" on this entry)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("nt")
    )
    return pack_sequences(docs, F.col("nt"), 2048, "doc_id")


def bench_bpe(spark, sf_dir):
    """BPE subword token counts over the FULL documents table against a
    500-merge model learned on a deterministic half sample: one
    word-count shuffle + driver merges (learn), then distinct-word
    Python encode + broadcast join + per-doc sum (count). Learn runs
    inside the timer — it is part of the workload, exactly once per
    corpus. The sample is hash_sample, NOT limit(): a global limit
    funnels the whole tokenize into one partition (GlobalLimit =
    single-task upstream), which is both the measured cost here and a
    scale defect at any corpus size — the hash filter is map-side and
    keeps all 32 cores on the explode."""
    from pg2kinesis_spark.functions.bpe import bpe_token_counts, learn_bpe
    from pg2kinesis_spark.functions.sampling import hash_sample
    from pg2kinesis_spark.io import load_table

    # plain load: this entry is fixed-job-overhead bound, and the
    # _docs_parallel checkpoint costs more than the map work it spreads
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = learn_bpe(hash_sample(docs, "cast(doc_id as string)", 50), num_merges=500)
    return bpe_token_counts(docs, model)


def bench_lm(spark, sf_dir):
    """CCNet perplexity gate over the FULL documents table: train the
    capped interpolated bigram model on a 2.5k-doc sample, score every
    doc (three broadcast probes + one doc-keyed agg). Train runs inside
    the timer — once per corpus, like bench_bpe."""
    from pg2kinesis_spark.functions.lm import score_perplexity, train_ngram_lm
    from pg2kinesis_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # hash_sample, not limit(): see bench_bpe — a global limit is a
    # one-partition funnel in front of the train tokenize
    from pg2kinesis_spark.functions.sampling import hash_sample

    lm = train_ngram_lm(
        hash_sample(docs, "cast(doc_id as string)", 50), max_vocab=50_000, max_bigrams=500_000
    )
    return score_perplexity(docs, lm)


def bench_semdedup(spark, sf_dir):
    """SemDeDup over the FULL embeddings table: deterministic integer
    k-means (2 Lloyd steps inside the timer) + within-cluster cosine
    pair join + anti-join drop rule — the semantic-dedup workload
    shape (pair count = Σ cluster², controlled by n_clusters)."""
    from pg2kinesis_spark.functions.semdedup import semdedup
    from pg2kinesis_spark.io import load_table

    return semdedup(
        _table_parallel(spark, sf_dir, "embeddings"), dim=64, eps=0.4, n_clusters=8
    )


def bench_dsir(spark, sf_dir):
    """DSIR importance resampling over the FULL documents table: hashed
    uni+bigram features, 10k-bucket log-ratio fit vs a 200-doc target
    (two partial-agg passes), broadcast-scored docs, Gumbel top-k
    select. Fit runs inside the timer — once per corpus."""
    from pg2kinesis_spark.functions.dsir import dsir_fit_select
    from pg2kinesis_spark.io import load_table

    docs = _docs_parallel(spark, sf_dir, cols=("doc_id", "text"))
    # fused fit+select: the corpus gram explode runs ONCE (was 3x —
    # fit raw counts, the totals broadcast re-executing them, scoring);
    # results are bit-equal to the unfused composition (r12 opt round)
    return dsir_fit_select(docs, docs.limit(200), n=1000)


def bench_urls(spark, sf_dir):
    """URL front-door gates over the FULL documents table with
    deterministically synthesized URLs (500 domains, ~10% duplicate
    paths, tracking params): parse/normalize -> badword filter ->
    blocklist -> normalized-URL dedup -> per-domain cap."""
    from pyspark.sql import functions as F

    from pg2kinesis_spark.functions import urls as U
    from pg2kinesis_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id").withColumn(
        "url",
        F.expr(
            "concat('https://www.d', pmod(hash(doc_id), 500), '.example.com/p/',"
            " pmod(doc_id, 4500), '?utm_source=bench&id=', pmod(doc_id, 4500))"
        ),
    )
    gated = U.url_badword_filter(docs, ("casino", "poker"), max_score=0)
    # parse once — blocklist/dedup/cap reuse host/domain/url_norm; the
    # stages are multi-reference, so materialize between them (the
    # localCheckpoint discipline; measured 2.6x on this pipeline)
    parsed = U.parse_urls(gated)
    parsed = U.domain_blocklist_filter(
        parsed, [f"d{i}.example.com" for i in range(50)],
        host_col="host", domain_col="domain",
    ).localCheckpoint(eager=False)
    deduped = U.url_dedup(parsed, norm_col="url_norm").localCheckpoint(eager=False)
    capped = U.domain_cap(deduped, k=8, domain_col="domain")
    return capped.drop("host", "domain", "path", "url_norm")


def bench_warc(spark, sf_dir):
    """CommonCrawl-style ingestion: gzip WARC archives (one per ~312
    docs, materialized once from the documents table) through record
    split + HTTP parse + codegen HTML->text. Measures the full
    archive->corpus front door."""
    import glob
    import tempfile

    from pg2kinesis_spark.functions import warc as W
    from pg2kinesis_spark.io import load_table

    d = os.path.join(tempfile.gettempdir(), "bench_warc_archives")
    if not glob.glob(os.path.join(d, "*.warc.gz")):
        os.makedirs(d, exist_ok=True)
        rows = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        for shard in range(16):
            recs = [
                {
                    "warc_type": "response",
                    "url": f"https://bench.example/doc/{r.doc_id}",
                    "payload": W.http_response_bytes(
                        f"<html><body><p>{r.text}</p></body></html>".encode()
                    ),
                }
                for r in rows
                if r.doc_id % 16 == shard
            ]
            with open(os.path.join(d, f"crawl-{shard:05d}.warc.gz"), "wb") as f:
                f.write(W.encode_warc(recs, gzip_members=True))
    return W.warc_to_corpus(spark.read.format("binaryFile").load(d))


def bench_unigram(spark, sf_dir):
    """Unigram-LM subword token counts over the FULL documents table
    against a 500-piece model EM-trained on a 5k-doc sample (driver-side
    over the word-type table, inside the timer like bench_bpe); count
    path = distinct-word Viterbi + broadcast join + per-doc sum."""
    from pg2kinesis_spark.functions.unigram import learn_unigram, unigram_token_counts
    from pg2kinesis_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from pg2kinesis_spark.functions.sampling import hash_sample

    model = learn_unigram(hash_sample(docs, "cast(doc_id as string)", 50), vocab_size=500)
    return unigram_token_counts(docs, model)


def bench_ingest_batch(spark, sf_dir, out_dir):
    """Streaming-ingest micro-batch cost against a POPULATED index: the
    number a continuous deployment actually sees. Batch 0 (3/5 of the
    documents table) seeds the hash/sig indexes + bloom sidecars
    untimed; the TIMED batch 1 mixes never-seen docs with planted exact
    and near duplicates of batch 0, so it pays every stage — gates,
    within-batch dedup, bloom probe + residual anti-join, incremental
    LSH vs the index, write-back + sidecar build. Returns (batch0_df,
    batch1_df, ingest) — the caller times ingest.process_batch.

    The wall is dominated by FIXED per-batch cost (driver-blocking
    jobs: checkpoints, index joins, write-back, sidecar builds —
    ~3.3-3.5 s at sf0.1 after the round-7 sign-once cut, see
    SCALING.md), i.e. the number bounds micro-batch FREQUENCY, not doc
    throughput; deployment batches of 10^5-10^6 docs amortize it to
    the marginal rate."""
    from pyspark.sql import functions as F

    from pg2kinesis_spark.io import load_table
    from pg2kinesis_spark.streaming.corpus_ingest import CorpusIngest

    # plain load: the ingest pipeline manages its own localCheckpoints
    # (sign-once discipline) — a pre-checkpointed input re-materializes
    # against them and measured 2x SLOWER, not faster
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.expr("doc_id % 5 < 3"))  # residues {0,1,2} mod 5
    fresh = docs.filter(F.expr("doc_id % 5 = 3")).selectExpr(
        "doc_id + 1000000 AS doc_id", "text"
    )  # residue 3 mod 5: disjoint from b0 -> genuinely never seen
    exact = docs.filter(F.expr("doc_id % 10 = 0")).selectExpr(
        "doc_id + 2000000 AS doc_id", "text"
    )  # residue 0 mod 5 IS in b0: verbatim recrawls hit the hash index
    near = docs.filter(F.expr("doc_id % 10 = 1")).selectExpr(
        "doc_id + 3000000 AS doc_id",
        "concat(text, ' tail edit') AS text",
    )  # residue 1 mod 5 IS in b0: near-dups hit the incremental LSH
    b1 = fresh.unionByName(exact).unionByName(near)
    ingest = CorpusIngest(out_dir, near_dup_jaccard=0.6, bloom_bits=1 << 23)
    return b0, b1, ingest


_BENCH_MEDIA_DIR = "/tmp/bench_media_corpus_v1"


def bench_curate_media(spark, sf_dir):
    """Media curation end-to-end over a deterministic image corpus
    (~260 rows: bases + exact dupes + re-encoded perceptual dupes +
    junk): gates -> exact dedup -> perceptual dedup. Round 10's fused
    one-decode kernel (image_features_sig) is the thing this entry
    watches — decode dominates media cost, and the old gate+dhash
    pipeline paid it twice. Corpus parquet is cached at
    /tmp/bench_media_corpus_v1 (rm to rebuild), the warc precedent."""
    import os

    from pg2kinesis_spark.functions.multimodal import MEDIA_SCHEMA, curate_media

    if not os.path.exists(_BENCH_MEDIA_DIR):
        import numpy as np

        from pg2kinesis_spark.functions import codecs as C

        rng = np.random.default_rng(42)
        rows = []
        mid = 0

        def add(content, mime="image/png"):
            nonlocal mid
            rows.append(
                (mid, bytearray(content), (mime, len(content), f"m{mid}"))
            )
            mid += 1

        for i in range(150):
            base = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
            img = C.resize_nearest(base, 64, 64)
            png = C.encode_png(img)
            add(png)
            if i % 3 == 0:
                add(png)  # exact duplicate
            elif i % 3 == 1:
                add(C.encode_bmp(img), "image/bmp")  # perceptual dup
            if i % 10 == 9:
                add(b"junk bytes that decode nowhere")  # quarantine
        spark.createDataFrame(rows, MEDIA_SCHEMA).write.mode(
            "overwrite"
        ).parquet(_BENCH_MEDIA_DIR)
    media = spark.read.parquet(_BENCH_MEDIA_DIR)
    clean, _rejected = curate_media(media, kind="image", min_pixels=100)
    return clean


EXTRA_BENCHES = {
    "bpe_token_counts_full": bench_bpe,
    "unigram_token_counts_full": bench_unigram,
    "semdedup_full": bench_semdedup,
    "dsir_select_full": bench_dsir,
    "url_pipeline_full": bench_urls,
    "warc_ingest_full": bench_warc,
    "lm_perplexity_full": bench_lm,
    "minhash_lsh_full": bench_minhash_full,
    "gopher_filter_full": bench_gopher,
    "bm25_topk_full": bench_bm25,
    "substr_dedup_full": bench_substr_dedup,
    "decontam_full": bench_decontam,
    "pack_sequences_full": bench_pack,
    "cdc_replay_450k": bench_cdc_replay,
    "pgoutput_replay_190k": bench_pgoutput_replay,
    "curate_full": bench_curate,
    "curate_max_full": bench_curate_max,
    "curate_ultra_full": bench_curate_ultra,
    "curate_media_full": bench_curate_media,
    "n9_blas_cosine_topk": bench_cosine_blas,
}

# Fresh-JVM group layout: each group is one subprocess, sized so no
# process accumulates 30+ entries of JVM/GC/codegen-cache pressure (the
# measured cause of the r4/r5 scoreboard-vs-controlled disagreement).
# The throughput headliners (cdc/pgoutput/e2e_sink) get their own
# near-empty JVM — those are the numbers the baseline comparison reads.
BENCH_GROUPS: list[tuple[str, list[str]]] = [
    ("plans", list(BENCH_QUERIES)),
    (
        "light",
        [
            "bpe_token_counts_full",
            "unigram_token_counts_full",
            "semdedup_full",
            "warc_ingest_full",
            "lm_perplexity_full",
            "minhash_lsh_full",
            "bm25_topk_full",
            "decontam_full",
            "pack_sequences_full",
            "n9_blas_cosine_topk",
        ],
    ),
    (
        "heavy",
        [
            "gopher_filter_full",
            "substr_dedup_full",
            "dsir_select_full",
            "url_pipeline_full",
            "curate_full",
        ],
    ),
    ("curate", ["curate_max_full", "curate_ultra_full", "curate_media_full"]),
    ("cdc", ["cdc_replay_450k", "pgoutput_replay_190k", "e2e_sink"]),
    ("ingest", ["ingest_batch"]),
]

# Reps policy: warm-up pass (untimed) + best-of-3; entries whose warm
# pass exceeds this many seconds get best-of-2 to bound total wall.
SLOW_ENTRY_SEC = 8.0


def _box_probe() -> float:
    """Single-core Python spin (best of 3) — the box-speed context every
    number in this artifact must be read against. This host is a shared
    hypervisor guest: the same code has measured 1.6× slower when the
    probe reads ~0.7 s than when it reads ~0.45 s (SCALING.md "Bench
    reconciliation"), with GUEST load idle both times. Embedding the
    probe makes a slow-box artifact self-labeling instead of looking
    like a code regression."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(10**7):
            acc += i * i
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _spin_once(_):
    acc = 0
    for i in range(10**7):
        acc += i * i
    return acc


def _box_probe_mt(n_procs: int = 8) -> float:
    """Multi-core twin of _box_probe: wall to run n_procs process spins
    concurrently. A shared hypervisor can be fast single-core yet
    oversubscribed across cores (measured: a run with single probe 0.6
    came out 1.5x slower than one at 0.72) — all-core contention is
    what actually throttles 32-thread Spark stages, and this probe
    reads it directly: idle host ≈ the single-core number, contended
    host rises toward n_procs × it."""
    import concurrent.futures as cf

    t0 = time.perf_counter()
    with cf.ProcessPoolExecutor(max_workers=n_procs) as ex:
        list(ex.map(_spin_once, range(n_procs)))
    return round(time.perf_counter() - t0, 3)


def _time_reps(run_once, warm_sec: float) -> tuple[float, float, int]:
    """(best, worst, reps) over best-of-3 (best-of-2 when slow)."""
    reps = 2 if warm_sec >= SLOW_ENTRY_SEC else 3
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_once()
        samples.append(time.perf_counter() - t0)
    return min(samples), max(samples), reps


def run_inline(only_set: set[str] | None, sf_dir: str) -> tuple[dict, dict]:
    """Run a subset (or everything) in THIS process; returns
    (times, spread) where spread[name] = [min, max, reps]."""
    from pg2kinesis_spark.plans import QUERIES
    from pg2kinesis_spark.session import get_spark

    def selected(name: str) -> bool:
        return only_set is None or name in only_set

    spark = get_spark("bench")
    # Warm the JVM/codegen once with an unrelated query.
    spark.range(1000000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    spread: dict[str, list] = {}

    for name in BENCH_QUERIES:
        if not selected(name):
            continue
        fn = QUERIES[name]
        # label jobs for event-log/UI attribution (guide §1.5); free —
        # a local-properties set, nothing in the timed region changes
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()  # untimed warm-up (page cache + codegen)
        warm = time.perf_counter() - t0
        best, worst, reps = _time_reps(lambda: fn(spark, sf_dir).collect(), warm)
        times[name] = round(best, 4)
        spread[name] = [round(best, 4), round(worst, 4), reps]

    for name, fn in EXTRA_BENCHES.items():
        if not selected(name):
            continue
        spark.sparkContext.setJobGroup(name, name)
        # one untimed pass first: page cache + codegen warm-up (the cold
        # first run is 2-4x the steady state and best-of-N alone can
        # record it when all timed reps land cold)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm = time.perf_counter() - t0
        n = 0

        def run_once():
            # build INSIDE the timer: some operators (pack_sequences)
            # run a driver-side phase at construction time.
            nonlocal n
            n = fn(spark, sf_dir).count()

        best, worst, reps = _time_reps(run_once, warm)
        times[name] = round(best, 4)
        spread[name] = [round(best, 4), round(worst, 4), reps]
        if name == "cdc_replay_450k":
            times["cdc_replay_msgs_per_sec"] = round(n / times[name], 1)
        elif name == "pgoutput_replay_190k":
            # n counts DML rows; frames (~45% of wire messages) are
            # parsed too but emit no change row
            times["pgoutput_dml_rows_per_sec"] = round(n / times[name], 1)
            # Steady-state twin (VERDICT r5 item 5): re-execute the
            # already-built plan — the deployment shape, where the
            # pipeline is constructed once per slot connection and every
            # micro-batch only EXECUTES it. The build-inclusive number
            # above is the backfill/cold-start rate; this is the rate a
            # long-lived stream sustains (SCALING.md "pgoutput:
            # reconciling ...").
            # the steady plan builds EAGER (xid literal-map carry): a
            # long-lived stream pays the two driver jobs once and then
            # re-executes the cheapest possible plan — the lazy carry is
            # the BACKFILL shape measured by the build-inclusive number
            built = bench_pgoutput_replay(spark, sf_dir, xid_eager=True)
            built.count()  # untimed: materialize the eager carry build
            ss = [_timed_count(built) for _ in range(3)]
            times["pgoutput_steady_rows_per_sec"] = round(n / min(ss), 1)
            spread["pgoutput_replay_steady"] = [round(min(ss), 4), round(max(ss), 4), 3]

    # Streaming corpus ingest: time ONE micro-batch against a populated
    # index (fresh state dir per rep — the op is stateful, so the
    # EXTRA_BENCHES re-run contract doesn't apply). Metric = input
    # docs/sec through the full gate + dedup + write-back path.
    if selected("ingest_batch"):
        import shutil
        import tempfile

        samples = []
        for rep in range(2):
            out_dir = tempfile.mkdtemp(prefix="bench_ingest_")
            try:
                b0, b1, ingest = bench_ingest_batch(spark, sf_dir, out_dir)
                ingest.process_batch(b0, 0)  # seed the indexes, untimed
                b1.count()
                t0 = time.perf_counter()
                ingest.process_batch(b1, 1)
                samples.append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(out_dir, ignore_errors=True)
        times["ingest_batch"] = round(min(samples), 4)
        spread["ingest_batch"] = [round(min(samples), 4), round(max(samples), 4), 2]
        # wall only: fixed per-batch cost dominates at sf0.1 (a docs/sec
        # figure at 2k docs would misread as throughput)

    # End-to-end sink drain: the same ~450k-message pipeline pushed
    # through the full foreachBatch path — ordered Arrow transfer,
    # per-message put_message, KPL wire serialization, transport puts —
    # into InMemoryTransport. cdc_replay measures parse→format; this
    # measures parse→format→sink, the number a deployment actually sees.
    if selected("e2e_sink"):
        from pg2kinesis_spark.sinks.kinesis import InMemoryTransport, KinesisLikeWriter

        # eager xid carry: the drain re-executes the plan per micro-batch
        # (the STREAM shape), so the literal-map carry amortizes its two
        # build jobs — measured ~0.5 s/batch faster than the lazy plan
        # whose summary branch re-runs every drain
        sink_df = bench_cdc_replay(spark, sf_dir, xid_eager=True)
        # untimed warm pass (same policy as EXTRA_BENCHES): the cold
        # first drain is 2-3x steady state
        t0 = time.perf_counter()
        KinesisLikeWriter(InMemoryTransport()).process_batch(sink_df, 0)
        warm = time.perf_counter() - t0
        n_msgs = 0

        def run_sink():
            nonlocal n_msgs
            writer = KinesisLikeWriter(InMemoryTransport())
            writer.process_batch(sink_df, 0)
            n_msgs = writer.put_message_calls

        best, worst, reps = _time_reps(run_sink, warm)
        times["e2e_sink"] = round(best, 4)
        spread["e2e_sink"] = [round(best, 4), round(worst, 4), reps]
        times["e2e_sink_msgs_per_sec"] = round(n_msgs / times["e2e_sink"], 1)

    return times, spread


def _timed_count(df) -> float:
    t0 = time.perf_counter()
    df.count()
    return time.perf_counter() - t0


# stderr lines that indicate a JVM-side exception got logged (caught or
# not). The artifact must either be free of these or label them.
_TRACE_RE = re.compile(
    r"^(Traceback \(most recent call last\)|.*\b(\w*Exception|\w*Error)\b.*"
    r"|\tat [\w.$]+\(.*\))"
)


def _scan_stderr(text: str) -> list[str]:
    """First line of each exception-looking block in captured stderr.

    Labels are canonicalized (digit runs -> N) so instance-numbered
    repeats of the same exception — notably Spark's benign driver-side
    "attempted to access non-existent accumulator NNNN" race, where a
    GC'd SQL-metric accumulator is hit by a late executor heartbeat —
    collapse to ONE label the caller can count instead of 20+ lines
    that flood the artifact tail (VERDICT r9 "What's wrong" item 1).
    """
    labels: list[str] = []
    in_block = False
    for line in text.splitlines():
        if line.startswith("\tat ") or line.startswith("  File "):
            in_block = True
            continue
        if _TRACE_RE.match(line):
            if not in_block:
                labels.append(re.sub(r"\d+", "N", line.strip()[:160]))
            in_block = True
        else:
            in_block = False
    return labels


# At most this many DISTINCT exception labels appear in the artifact;
# anything beyond collapses into one overflow entry. Keeps the JSON tail
# window (the driver reads the last ~2,000 chars) on the timings.
_STDERR_LABEL_CAP = 8


def _fold_stderr_labels(labels: list[str]) -> dict[str, int]:
    """{canonical label: count}, capped to _STDERR_LABEL_CAP entries."""
    counts: dict[str, int] = {}
    for lbl in labels:
        counts[lbl] = counts.get(lbl, 0) + 1
    if len(counts) > _STDERR_LABEL_CAP:
        keep = sorted(counts, key=lambda k: -counts[k])[:_STDERR_LABEL_CAP]
        dropped = {k: v for k, v in counts.items() if k not in set(keep)}
        counts = {k: counts[k] for k in keep}
        counts[f"... +{len(dropped)} more distinct labels"] = sum(
            dropped.values()
        )
    return counts


# Controlled-box single-core probe reference (SCALING.md "Bench
# reconciliation"): the morning-idle state of this host. Normalized
# throughput twins scale raw rates by (group_probe / this), making a
# slow-box artifact comparable to a controlled one WITHOUT reading
# SCALING.md: rate_norm ≈ what the same code does at probe 0.45.
PROBE_REF_S = 0.45
# Probe above this (1.2x the reference) marks the group box-slow.
PROBE_SLOW_S = round(PROBE_REF_S * 1.2, 3)
# Entries that are rates (bigger = better) and scale ~inversely with
# single-core speed — the ones that get *_norm twins.
RATE_ENTRIES = (
    "cdc_replay_msgs_per_sec",
    "pgoutput_dml_rows_per_sec",
    "pgoutput_steady_rows_per_sec",
    "e2e_sink_msgs_per_sec",
)


def orchestrate(sf_dir: str, sf: float) -> None:
    """Run each BENCH_GROUP in a fresh subprocess JVM and merge."""
    times: dict[str, float] = {}
    spread: dict[str, list] = {}
    errors: dict[str, str] = {}
    stderr_labels: list[str] = []
    group_probes: dict[str, float] = {}
    probe_before = _box_probe()
    probe_mt_before = _box_probe_mt()
    t_all = time.perf_counter()
    for gname, entries in BENCH_GROUPS:
        # Per-group probe read IMMEDIATELY before launch: the box state
        # can drift inside one orchestration (hypervisor contention),
        # and the throughput normalization below must use the state the
        # group actually ran under, not the run-start snapshot.
        group_probes[gname] = _box_probe()
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(entries)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                env=env,
                timeout=1800,
            )
        except subprocess.TimeoutExpired:
            errors[gname] = "timeout after 1800s"
            continue
        line = next(
            (l for l in reversed(proc.stdout.splitlines()) if l.startswith("{")), None
        )
        if proc.returncode != 0 or line is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            errors[gname] = f"rc={proc.returncode}: {' | '.join(tail)[:300]}"
            continue
        child = json.loads(line)
        times.update(child.get("queries", {}))
        spread.update(child.get("spread", {}))
        for lbl in _scan_stderr(proc.stderr or ""):
            stderr_labels.append(f"{gname}: {lbl}")
        # Self-correcting throughput scoreboard: next to every raw rate
        # this group produced, a probe-normalized twin (what the rate
        # reads at the controlled-box reference probe). Raw stays the
        # ground truth; the twin makes cross-round comparison
        # probe-to-probe by construction.
        for k in child.get("queries", {}):
            if k in RATE_ENTRIES:
                times[f"{k}_norm"] = round(
                    times[k] * group_probes[gname] / PROBE_REF_S, 1
                )
    _emit(
        times,
        sf,
        spread=spread,
        extra={
            "bench_mode": "fresh-jvm-groups",
            "n_groups": len(BENCH_GROUPS),
            "orchestration_wall": round(time.perf_counter() - t_all, 1),
            # Box-speed context (see _box_probe): controlled-morning
            # state reads ~0.45 s, the documented 1.6x-slower shared-
            # hypervisor state reads ~0.7 s. Rates in this artifact
            # scale inversely with it — compare artifacts probe-to-
            # probe before calling anything a regression.
            "box_probe_s": {"before": probe_before, "after": _box_probe()},
            "box_probe_mt8_s": {"before": probe_mt_before, "after": _box_probe_mt()},
            # Probe read just before each group launched — the state
            # its numbers ran under. *_per_sec_norm twins in `queries`
            # are raw × (group probe / probe_norm_ref_s).
            "box_probe_by_group_s": group_probes,
            "probe_norm_ref_s": PROBE_REF_S,
            **(
                {
                    "box_slow_groups": sorted(
                        g for g, p in group_probes.items() if p > PROBE_SLOW_S
                    )
                }
                if any(p > PROBE_SLOW_S for p in group_probes.values())
                else {}
            ),
            # Any JVM stack trace logged by any child, folded to
            # {"group: label": count} with digit runs canonicalized and
            # the distinct-label list capped — {} means the run was
            # clean (VERDICT r5 item 2; cap/fold from VERDICT r9 item 1
            # where 22 instance-numbered repeats of the benign
            # accumulator-GC race flooded the artifact tail).
            "stderr_exceptions": _fold_stderr_labels(stderr_labels),
            **({"group_errors": errors} if errors else {}),
        },
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    # SPARK_GRAFT_BENCH_ONLY=a,b,c runs a subset inline in THIS process —
    # the controlled-conditions knob, and the orchestrator's child
    # protocol (each fresh-JVM group is one such invocation).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only is None:
        orchestrate(sf_dir, sf)
        return
    times, spread = run_inline(set(only.split(",")), sf_dir)
    _emit(times, sf, spread=spread)


def _emit(times: dict, sf: float, spread: dict | None = None, extra: dict | None = None) -> None:
    # *_per_sec are rates (and *_per_sec_norm their probe-normalized
    # twins), *_steady re-executes an already-timed plan: none of them
    # belongs in the wall-clock sum.
    total = round(
        sum(
            v
            for k, v in times.items()
            if not k.endswith("_per_sec")
            and not k.endswith("_per_sec_norm")
            and not k.endswith("_steady")
        ),
        4,
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    # Metric-direction contract (VERDICT r12 item 6): every key listed
    # here is a THROUGHPUT (higher is better, excluded from `value`);
    # everything else in `queries` is seconds (lower is better). A
    # prev/now comparison tool must invert the ratio for these instead
    # of branding an improved rate "regressed" (8 false regressions in
    # PERF_r12). Addition-only: names, values and `value` are unchanged.
    thr = sorted(
        k
        for k in times
        if k.endswith("_per_sec") or k.endswith("_per_sec_norm")
    )
    if thr:
        out["throughput"] = thr
    if spread:
        out["spread"] = spread  # per entry: [best, worst, reps]
    if extra:
        out.update(extra)
    blob = json.dumps(out)
    if extra is None:
        # child protocol / inline subset: one line, consumed in-process
        print(blob)
        return
    # Orchestrator (driver-facing) emission. The driver machine-reads
    # only the LAST ~2,000 chars of stdout; the full record (~3 KB with
    # spread + probes) overflows that window, which is why BENCH_r9/r10
    # recorded parsed:null. Emit the full record FIRST (and mirror it
    # to BENCH_FULL_latest.json for SCALING.md), then a compact
    # headline line LAST so a complete JSON object always sits inside
    # the driver's tail window.
    print(blob)
    try:
        side = os.environ.get(
            "SPARK_GRAFT_BENCH_FULL",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_latest.json"
            ),
        )
        with open(side, "w") as f:
            f.write(blob + "\n")
    except OSError:
        pass
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "queries": dict(times),
        "sf": sf,
        "box_probe_s": extra.get("box_probe_s"),
        "full_record": "line 1 of stdout / BENCH_FULL_latest.json",
    }
    if thr:
        compact["throughput"] = thr  # higher-is-better keys (see above)
    for opt in ("box_slow_groups", "group_errors"):
        if opt in extra:
            compact[opt] = extra[opt]
    line = json.dumps(compact)
    for drop in ("full_record", "box_probe_s", "box_slow_groups", "throughput"):
        if len(line) <= 1900:
            break
        compact.pop(drop, None)
        line = json.dumps(compact)
    if len(line) > 1900:  # last resort: shed the probe-normalized twins
        compact["queries"] = {
            k: v for k, v in times.items() if not k.endswith("_norm")
        }
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
