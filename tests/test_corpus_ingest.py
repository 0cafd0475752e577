"""Streaming corpus ingest: continuous curation with incremental dedup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pg2kinesis_spark.streaming.corpus_ingest import CorpusIngest, start_corpus_ingest

BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _write_batch(spark, src, rows, name):
    _docs(spark, rows).coalesce(1).write.mode("append").parquet(src)


def test_ingest_stream_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")

    b1 = [
        (1, BASE),
        (2, BASE),  # exact dup within batch -> dropped
        (3, "completely different text about spark clusters and shuffles here"),
    ]
    _write_batch(spark, src, b1, "b1")
    q = start_corpus_ingest(spark, src, out, ckpt, near_dup_jaccard=0.6)
    q.awaitTermination(120)

    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    got1 = {r["doc_id"] for r in accepted.select("doc_id").collect()}
    assert got1 == {1, 3}

    b2 = [
        (10, BASE),  # exact dup vs batch 1 -> dropped
        (11, BASE.replace("today", "tomorrow")),  # near-dup vs index -> dropped
        (12, "a fresh unique document mentioning entirely new material now"),
    ]
    _write_batch(spark, src, b2, "b2")
    q = start_corpus_ingest(spark, src, out, ckpt, near_dup_jaccard=0.6)
    q.awaitTermination(120)

    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    got2 = {r["doc_id"] for r in accepted.select("doc_id").collect()}
    assert got2 == {1, 3, 12}, got2

    # the signature index grew by exactly the accepted docs
    sig = spark.read.parquet(os.path.join(out, "sig_index"))
    assert {r["doc_id"] for r in sig.select("doc_id").collect()} == {1, 3, 12}
    # annotations present on accepted output
    assert {"n_tokens", "quality", "pred_lang"} <= set(accepted.columns)


def test_ingest_batch_replay_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "curated2")
    ingest = CorpusIngest(out, near_dup_jaccard=None)
    batch = _docs(spark, [(1, BASE), (2, "other words forming another unique document")])
    ingest.process_batch(batch, 7)
    ingest.process_batch(batch, 7)  # crash-replay of the same batch_id
    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    assert accepted.count() == 2  # no duplicates from the replay
    assert {r["batch_id"] for r in accepted.select("batch_id").collect()} == {7}


def test_ingest_replay_after_crash_between_index_writes(spark, tmp_path):
    """Crash window: accepted + hash_index written, sig_index NOT.
    The replayed batch must not gate itself out on its own hashes — it
    recomputes and rewrites every index, so the sig index ends up with
    the batch's signatures (previously it stayed permanently missing,
    silently disabling near-dup detection for those docs)."""
    import shutil

    out = str(tmp_path / "curated5")
    ingest = CorpusIngest(out, near_dup_jaccard=0.6)
    doc_rows = [(1, BASE), (2, "another entirely unrelated document about databases")]
    ingest.process_batch(_docs(spark, doc_rows), 3)

    # simulate the crash: wipe the batch's sig partition (the write that
    # never happened), keep accepted + hash_index
    shutil.rmtree(os.path.join(out, "sig_index", "batch_id=3"))

    ingest.process_batch(_docs(spark, doc_rows), 3)  # checkpoint replay
    sig = spark.read.parquet(os.path.join(out, "sig_index"))
    assert {r["doc_id"] for r in sig.select("doc_id").collect()} == {1, 2}
    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    assert accepted.count() == 2  # still no duplicates
    # and a near-dup arriving later is now actually caught
    ingest.process_batch(
        _docs(spark, [(9, BASE.replace("today", "tomorrow"))]), 4
    )
    got = {r["doc_id"] for r in spark.read.parquet(os.path.join(out, "accepted")).select("doc_id").collect()}
    assert got == {1, 2}


def test_ingest_empty_batch_noop(spark, tmp_path):
    out = str(tmp_path / "curated3")
    ingest = CorpusIngest(out, min_quality=2.0)  # nothing can pass
    ingest.process_batch(_docs(spark, [(1, BASE)]), 0)
    assert not os.path.exists(os.path.join(out, "accepted"))


def test_ingest_with_row_local_gates(spark, tmp_path):
    out = str(tmp_path / "curated4")
    good = (
        "the quick brown fox jumps over the lazy dog and runs back home to rest "
        "while the sun sets over the hills and the day slowly ends in quiet calm "
        "with a long and peaceful evening of reading and tea by the fire tonight"
    )
    pii_doc = good + " contact me at a.person@example.com for more"
    ingest = CorpusIngest(out, near_dup_jaccard=None, max_pii=0)
    ingest.process_batch(
        spark.createDataFrame([(1, good), (2, pii_doc)], ["doc_id", "text"]), 0
    )
    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    assert {r["doc_id"] for r in accepted.collect()} == {1}


def test_ingest_lm_perplexity_gate(spark, tmp_path):
    """The CCNet gate in streaming: a reference-corpus LM drops the
    gibberish doc while in-domain docs flow through to the indexes."""
    from pg2kinesis_spark.functions.lm import score_perplexity, train_ngram_lm
    from pg2kinesis_spark.io import load_table

    ref = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200).select(
        "doc_id", "text"
    )
    lm = train_ngram_lm(ref, max_vocab=500, max_bigrams=5000)

    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    indomain = [r["text"] for r in ref.limit(2).collect()]
    gibberish = "zqx vbnk wpfj ttyu qqas lkhg zzzp mmro xxyz qwpv"
    rows = [(1, indomain[0]), (2, indomain[1]), (3, gibberish)]
    _write_batch(spark, src, rows, "b1")

    # threshold between the in-domain docs and the gibberish
    ppl = {
        r["doc_id"]: r["perplexity"]
        for r in score_perplexity(_docs(spark, rows), lm).collect()
    }
    thresh = (max(ppl[1], ppl[2]) + ppl[3]) / 2
    q = start_corpus_ingest(
        spark, src, out, ckpt, near_dup_jaccard=0.6, lm_model=lm, max_perplexity=thresh
    )
    q.awaitTermination(120)

    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    assert {r["doc_id"] for r in accepted.select("doc_id").collect()} == {1, 2}


def test_ingest_url_and_dsir_gates(spark, tmp_path):
    """URL gates (badwords/blocklist/within-batch dedup) and the DSIR
    logw threshold run as stage-0 of the batch processor; results equal
    the standalone operators applied by hand."""
    from pg2kinesis_spark.functions.dsir import dsir_scores, fit_dsir_logratios

    rows = [
        (1, "spark shuffle partition broadcast arrow codegen text here", "https://good.example/a"),
        (2, "llama yak gnu ibex okapi tapir words only in this one", "https://good.example/b"),
        (3, "spark shuffle partition broadcast again fresh words too", "https://www.good.example/a?utm_source=x"),  # url dup of 1
        (4, "spark partition shuffle lines of reasonable target text", "https://blocked.example/x"),
        (5, "spark broadcast codegen arrow shuffle partition material", "https://good.example/casino-page"),
    ]
    batch = spark.createDataFrame(rows, ["doc_id", "text", "url"])
    target = spark.createDataFrame(
        [(100, "spark shuffle partition broadcast arrow codegen")], ["doc_id", "text"]
    )
    lr = fit_dsir_logratios(target, batch.select("doc_id", "text"))
    # with a tiny target, every logw is negative (importance weights
    # only rank docs); a real deployment calibrates the threshold from
    # a score quantile — do the same here: keep above the 1/2 gap
    scores = {r.doc_id: r.logw for r in dsir_scores(batch.select("doc_id", "text"), lr).collect()}
    assert scores[1] == max(scores.values())  # target-like doc ranks first
    ranked = sorted(scores.values(), reverse=True)
    thr = (ranked[0] + ranked[1]) / 2
    out = str(tmp_path / "out")
    ing = CorpusIngest(
        out,
        near_dup_jaccard=None,
        url_col="url",
        url_blocklist=["blocked.example"],
        url_badwords=("casino",),
        dsir_logratios=lr,
        min_dsir_logw=thr,
    )
    ing.process_batch(batch, 0)
    accepted = {r.doc_id for r in spark.read.parquet(os.path.join(out, "accepted")).collect()}
    # 3 dropped (url dup of 1), 4 blocked domain, 5 badword url,
    # 2 below the DSIR threshold — only the target-like doc survives
    assert accepted == {1}


def _emb_docs(spark, rows):
    # (doc_id, text, embedding) — unit-ish 4-d embeddings
    return spark.createDataFrame(rows, "doc_id long, text string, embedding array<double>")


def _ref_emb(spark):
    # reference embeddings spanning two well-separated directions
    rows = [
        (100 + i, [1.0, 0.01 * i, 0.0, 0.0]) for i in range(8)
    ] + [
        (200 + i, [0.0, 0.01 * i, 1.0, 0.0]) for i in range(8)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ingest_semdedup_drops_cross_batch_paraphrase(spark, tmp_path):
    """A batch-2 doc whose TEXT differs (no exact/MinHash dup) but whose
    EMBEDDING is a near-copy of an accepted batch-1 doc must be dropped
    by the streaming SemDeDup stage; crash-replay stays idempotent."""
    out = str(tmp_path / "curated_sd")
    ingest = CorpusIngest(
        out,
        near_dup_jaccard=None,  # isolate the semantic stage
        semdedup_eps=0.05,
        semdedup_ref_emb=_ref_emb(spark),
        semdedup_dim=4,
        semdedup_clusters=2,
    )
    b1 = _emb_docs(spark, [
        (1, "an article about foxes and dogs in the meadow", [1.0, 0.0, 0.0, 0.0]),
        (2, "spark shuffle tuning for very large clusters", [0.0, 0.0, 1.0, 0.0]),
        # within-batch semantic dup of doc 1 (cos ~ 1): paper keep order
        # (cent_sim asc, vec_id asc) decides which one survives
        (3, "a piece describing dogs and foxes in a meadow", [0.999, 0.001, 0.0, 0.0]),
    ])
    ingest.process_batch(b1, 0)
    acc1 = {r.doc_id for r in spark.read.parquet(os.path.join(out, "accepted")).collect()}
    assert len(acc1 & {1, 3}) == 1  # exactly one of the semantic twins
    assert 2 in acc1
    survivor = (acc1 & {1, 3}).pop()

    b2 = _emb_docs(spark, [
        # PARAPHRASE of the accepted doc: different words, same meaning
        # (embedding within eps) -> dropped against the emb index
        (10, "completely rephrased text on canines and vulpines afield", [0.9995, 0.0005, 0.0, 0.0]),
        (11, "an unrelated note on database checkpoint protocols", [0.0, 1.0, 0.0, 0.0]),
    ])
    ingest.process_batch(b2, 1)
    acc2 = {r.doc_id for r in spark.read.parquet(os.path.join(out, "accepted")).collect()}
    assert 10 not in acc2  # cross-batch semantic near-dup dropped
    assert acc2 == {survivor, 2, 11}

    # the embedding index grew by exactly the accepted docs
    emb_idx = spark.read.parquet(os.path.join(out, "emb_index"))
    assert {r.vec_id for r in emb_idx.collect()} == acc2

    # crash-replay of batch 1 (same batch_id): identical accepted set,
    # no duplicate index rows, batch-2 state untouched
    ingest.process_batch(b1, 0)
    acc3 = {r.doc_id for r in spark.read.parquet(os.path.join(out, "accepted")).collect()}
    assert acc3 == acc2
    emb_idx2 = spark.read.parquet(os.path.join(out, "emb_index"))
    assert emb_idx2.count() == len(acc2)


def _parquet_files(path):
    out = []
    for root, _dirs, files in os.walk(path):
        out += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    return out


def test_compact_indexes_preserves_dedup_and_shrinks_files(spark, tmp_path):
    """Three ingested batches -> compact(keep_last_batches=1) folds the
    first two index partitions into batch_id=-1: row content identical,
    file count down, blooms folded, and a FOURTH batch carrying an
    exact dup of batch 0 plus a near-dup of batch 1 still dedups."""
    from pg2kinesis_spark.streaming.corpus_ingest import (
        COMPACTED_BATCH_ID,
        compact_corpus_indexes,
        start_corpus_ingest,
    )

    base = "the quick brown fox jumps over the lazy dog again and again today"
    other = "completely different text about spark clusters and scale here"
    src, out = str(tmp_path / "landing"), str(tmp_path / "curated")
    batches = [
        [(1, base), (2, other)],
        [(11, "a second-batch document with its own unique words entirely")],
        [(21, "third batch text that shares nothing with the others at all")],
    ]
    ck = str(tmp_path / "ck")
    for rows in batches:
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_corpus_ingest(
            spark, src, out, ck,
            near_dup_jaccard=0.6, bloom_bits=1 << 16,
        )
        q.awaitTermination(120)

    hash_path = os.path.join(out, "hash_index")
    sig_path = os.path.join(out, "sig_index")
    before_rows = sorted(r._h for r in spark.read.parquet(hash_path).collect())
    before_sig = spark.read.parquet(sig_path).count()
    files_before = len(_parquet_files(hash_path))

    summary = compact_corpus_indexes(spark, out, keep_last_batches=1)
    assert summary["hash_index"]["folded"] == [0, 1]
    assert summary["hash_index"]["kept"] == [2]

    after = spark.read.parquet(hash_path)
    assert sorted(r._h for r in after.collect()) == before_rows
    assert {r.batch_id for r in after.select("batch_id").distinct().collect()} == {
        COMPACTED_BATCH_ID, 2,
    }
    assert spark.read.parquet(sig_path).count() == before_sig
    assert len(_parquet_files(hash_path)) < files_before
    blooms = sorted(os.listdir(os.path.join(out, "bloom")))
    assert blooms == ["bloom_-1.bin", "bloom_2.bin"]
    assert sorted(os.listdir(os.path.join(out, "bloom_bands"))) == [
        "bloom_-1.bin", "bloom_2.bin",
    ]

    # post-compaction ingest: exact dup of folded batch 0 + near-dup of
    # folded batch 1 must still be dropped; fresh doc accepted
    spark.createDataFrame(
        [
            (31, base),                                               # exact dup
            (32, "a second-batch document with its own unique words entirely!"),
            (33, "a brand new never seen document mentioning novel things"),
        ],
        ["doc_id", "text"],
    ).coalesce(1).write.mode("append").parquet(src)
    q = start_corpus_ingest(
        spark, src, out, ck,
        near_dup_jaccard=0.6, bloom_bits=1 << 16,
    )
    q.awaitTermination(120)
    got = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "accepted")).select("doc_id").collect()
    }
    assert got == {1, 2, 11, 21, 33}


def test_compact_crash_recovery_restores_live_dir(spark, tmp_path):
    """A crash between the two swap renames leaves <path>.compact_old
    and no live dir; recovery (compact re-run or the next micro-batch)
    must restore it."""
    from pg2kinesis_spark.streaming.corpus_ingest import (
        _recover_compaction,
        start_corpus_ingest,
    )

    src, out = str(tmp_path / "landing"), str(tmp_path / "curated")
    spark.createDataFrame(
        [(1, "some document text for the recovery test scenario here")],
        ["doc_id", "text"],
    ).coalesce(1).write.mode("append").parquet(src)
    q = start_corpus_ingest(spark, src, out, str(tmp_path / "ck"),
                            near_dup_jaccard=None, bloom_bits=None)
    q.awaitTermination(120)
    hash_path = os.path.join(out, "hash_index")
    n = spark.read.parquet(hash_path).count()
    os.replace(hash_path, hash_path + ".compact_old")  # simulated crash
    _recover_compaction(hash_path)
    assert spark.read.parquet(hash_path).count() == n


def test_ingest_decontamination_gate_drops_benchmark_leakage(spark, tmp_path):
    """A doc containing a verbatim 13-gram from the frozen eval set is
    dropped in whichever batch it arrives; clean docs pass. Mirrors the
    batch decontaminate() operator under the streaming contract."""
    from pg2kinesis_spark.streaming.corpus_ingest import start_corpus_ingest

    bench_q = (
        "what is the capital city of the country directly north of "
        "france in western europe"
    )  # 14 words -> contains 13-grams
    eval_df = spark.createDataFrame([(1, bench_q)], ["eval_id", "text"])
    src, out = str(tmp_path / "landing"), str(tmp_path / "curated")
    b1 = [(1, "a perfectly clean document with plenty of original words here")]
    b2 = [
        (11, f"quiz dump page: {bench_q} answer brussels obviously"),  # leaked
        (12, "another clean document mentioning entirely unrelated topics"),
    ]
    ck = str(tmp_path / "ck")
    for rows in (b1, b2):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_corpus_ingest(
            spark, src, out, ck,
            near_dup_jaccard=None, bloom_bits=None, eval_df=eval_df,
        )
        q.awaitTermination(120)
    got = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "accepted")).select("doc_id").collect()
    }
    assert got == {1, 12}


def test_ingest_url_cross_batch_dedup_collapses_recrawls(spark, tmp_path):
    """A recrawl with the SAME normalized URL but changed text (so the
    text-hash index cannot see it) is dropped by the url_index; new
    URLs and unparseable URLs pass."""
    from pg2kinesis_spark.streaming.corpus_ingest import start_corpus_ingest

    src, out, ck = (str(tmp_path / d) for d in ("landing", "curated", "ck"))
    b1 = [(1, "the original page text as first crawled with many words",
           "https://news.example.com/story?utm_source=feed")]
    b2 = [
        (11, "the SAME page recrawled with a different cookie banner text",
         "https://news.example.com/story"),          # same url_norm -> drop
        (12, "a different page entirely with fresh content here",
         "https://news.example.com/other"),           # new url -> keep
        (13, "doc whose url does not parse at all but text is fine",
         "::not a url::"),                            # NULL norm -> keep
    ]
    for rows in (b1, b2):
        spark.createDataFrame(rows, ["doc_id", "text", "url"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_corpus_ingest(
            spark, src, out, ck, near_dup_jaccard=None, bloom_bits=None,
            url_col="url", url_dedup_cross_batch=True,
        )
        q.awaitTermination(120)
    acc = spark.read.parquet(os.path.join(out, "accepted"))
    assert {r.doc_id for r in acc.select("doc_id").collect()} == {1, 12, 13}
    assert "url" in acc.columns  # provenance URL rides the accepted output


def test_ingest_domain_cap_is_a_whole_corpus_budget(spark, tmp_path):
    """domain_cap_k=2 across batches: once a registered domain has two
    accepted docs, later batches admit none from it — while other
    domains and unparseable URLs are unaffected. Duplicates never
    consume budget (cap runs after dedup)."""
    from pg2kinesis_spark.streaming.corpus_ingest import start_corpus_ingest

    src, out, ck = (str(tmp_path / d) for d in ("landing", "curated", "ck"))
    b1 = [
        (1, "first hot-domain page with words " * 3, "https://a.hot.example/1"),
        (2, "second hot-domain page different words " * 3, "https://b.hot.example/2"),
    ]
    b2 = [
        (11, "third hot-domain page more words " * 3, "https://c.hot.example/3"),
        (12, "first hot-domain page with words " * 3, "https://a.hot.example/1b"),  # exact text dup
        (13, "a calm-domain page with its own words " * 3, "https://calm.example/1"),
        (14, "unparseable url doc with plenty of words " * 3, "::nope::"),
    ]
    for rows in (b1, b2):
        spark.createDataFrame(rows, ["doc_id", "text", "url"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_corpus_ingest(
            spark, src, out, ck, near_dup_jaccard=None, bloom_bits=None,
            url_col="url", domain_cap_k=2,
        )
        q.awaitTermination(120)
    got = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "accepted")).select("doc_id").collect()
    }
    # 11 dropped (hot.example budget exhausted by batch 1); 12 dropped as
    # an exact dup BEFORE the cap (never consumed budget); 13/14 kept
    assert got == {1, 2, 13, 14}
    # count index accrued only accepted rows
    counts = {
        (r.domain, r.n)
        for r in spark.read.parquet(os.path.join(out, "domain_counts"))
        .groupBy("domain").sum("n")
        .withColumnRenamed("sum(n)", "n").collect()
    }
    assert ("hot.example", 2) in counts and ("calm.example", 1) in counts


def test_compact_folds_url_and_domain_indexes(spark, tmp_path):
    """Compaction folds the url/domain indexes too: the URL recrawl
    check and the whole-corpus domain budget survive the fold."""
    from pg2kinesis_spark.streaming.corpus_ingest import (
        compact_corpus_indexes,
        start_corpus_ingest,
    )

    src, out, ck = (str(tmp_path / d) for d in ("landing", "curated", "ck"))
    batches = [
        [(1, "page one text for the compaction scenario " * 3,
          "https://site.example/1")],
        [(11, "page two text all different for the test " * 3,
          "https://site.example/2")],
    ]
    kw = dict(near_dup_jaccard=None, bloom_bits=None, url_col="url",
              url_dedup_cross_batch=True, domain_cap_k=2)
    for rows in batches:
        spark.createDataFrame(rows, ["doc_id", "text", "url"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_corpus_ingest(spark, src, out, ck, **kw)
        q.awaitTermination(120)
    summary = compact_corpus_indexes(spark, out, keep_last_batches=1)
    assert summary["url_index"]["folded"] == [0]
    assert summary["domain_counts"]["folded"] == [0]
    # batch 3: recrawl of folded url dropped; domain budget (2) exhausted
    spark.createDataFrame(
        [
            (21, "recrawl of page one with new boilerplate attached " * 3,
             "https://site.example/1"),
            (22, "page three brand new never crawled before today " * 3,
             "https://site.example/3"),
            (23, "other domain page with its very own words here " * 3,
             "https://fresh.example/1"),
        ],
        ["doc_id", "text", "url"],
    ).coalesce(1).write.mode("append").parquet(src)
    q = start_corpus_ingest(spark, src, out, ck, **kw)
    q.awaitTermination(120)
    got = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "accepted")).select("doc_id").collect()
    }
    assert got == {1, 11, 23}


def test_ingest_stats_rows(spark, tmp_path):
    """stats=True writes one observability row per micro-batch with
    gate/dedup/accepted counts that reconcile with the accepted output."""
    from pg2kinesis_spark.streaming.corpus_ingest import start_corpus_ingest

    base = "the quick brown fox jumps over the lazy dog again and again today"
    src, out, ck = (str(tmp_path / d) for d in ("landing", "curated", "ck"))
    b1 = [(1, base), (2, base), (3, "a different document with other words")]
    b2 = [(11, base), (12, "an entirely fresh document in batch two")]
    for rows in (b1, b2):
        spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = start_corpus_ingest(spark, src, out, ck, near_dup_jaccard=None,
                                bloom_bits=None, stats=True)
        q.awaitTermination(120)
    stats = {
        r.batch_id: r
        for r in spark.read.parquet(os.path.join(out, "stats")).collect()
    }
    assert set(stats) == {0, 1}
    # batch 0: 3 in after gates, within-batch exact dup collapses 2->1
    assert stats[0].n_after_gates == 3
    assert stats[0].n_after_exact == 2
    assert stats[0].n_accepted == 2
    # batch 1: doc 11 is an exact dup of the index
    assert stats[1].n_after_gates == 2
    assert stats[1].n_after_exact == 1
    assert stats[1].n_accepted == 1
    assert all(s.wall_s > 0 for s in stats.values())
    n_acc = spark.read.parquet(os.path.join(out, "accepted")).count()
    assert n_acc == stats[0].n_accepted + stats[1].n_accepted


def test_compact_folds_emb_index_and_semdedup_survives(spark, tmp_path):
    """Compaction folds the embedding index too: a post-compaction
    batch's paraphrase of FOLDED history is still dropped by the
    streaming SemDeDup stage."""
    from pg2kinesis_spark.streaming.corpus_ingest import compact_corpus_indexes

    out = str(tmp_path / "curated_sdc")
    kw = dict(
        near_dup_jaccard=None,
        semdedup_eps=0.05,
        semdedup_ref_emb=_ref_emb(spark),
        semdedup_dim=4,
        semdedup_clusters=2,
    )
    ingest = CorpusIngest(out, **kw)
    ingest.process_batch(_emb_docs(spark, [
        (1, "an article about foxes and dogs in the meadow", [1.0, 0.0, 0.0, 0.0]),
    ]), 0)
    ingest.process_batch(_emb_docs(spark, [
        (11, "spark shuffle tuning for very large clusters", [0.0, 0.0, 1.0, 0.0]),
    ]), 1)
    summary = compact_corpus_indexes(spark, out, keep_last_batches=1)
    assert summary["emb_index"]["folded"] == [0]
    # a FRESH processor (post-maintenance restart) sees the folded index
    ingest2 = CorpusIngest(out, **kw)
    ingest2.process_batch(_emb_docs(spark, [
        (21, "rephrased canine and vulpine field report", [0.9995, 0.0005, 0.0, 0.0]),
        (22, "a note about entirely unrelated database internals", [0.0, 1.0, 0.0, 0.0]),
    ]), 2)
    acc = {r.doc_id for r in spark.read.parquet(os.path.join(out, "accepted")).collect()}
    assert 21 not in acc  # paraphrase of folded batch-0 doc still dropped
    assert acc == {1, 11, 22}


def test_ingest_null_text_rows_never_accepted(spark, tmp_path):
    """md5(NULL) is NULL: the old groupBy+semi-join dropped NULL-text
    rows (a join on a NULL key never matches); the window-dedup shape
    must preserve that, not keep rank 1 of the NULL partition."""
    out = str(tmp_path / "curated_null")
    ingest = CorpusIngest(out, near_dup_jaccard=None, bloom_bits=None)
    batch = spark.createDataFrame(
        [(1, "a real document with words"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    ingest.process_batch(batch, 0)
    acc = spark.read.parquet(os.path.join(out, "accepted"))
    assert {r.doc_id for r in acc.collect()} == {1}


def test_crash_after_bloom_before_hash_index_readmits(spark, tmp_path):
    """Crash window of the CONCURRENT hash-bloom sidecar (r12 opt round,
    VERDICT r12 item 8): bloom_<batch_id>.bin landed, the hash-INDEX
    write did not. The bloom then OVER-approximates — a recrawl probes
    'maybe seen', finds nothing in the index, and must be RE-ADMITTED.
    A bloom that could short-circuit the index probe would silently
    drop the doc instead (under-approximation — the unsafe direction)."""
    import shutil

    out = str(tmp_path / "curated_bloomwin")
    ingest = CorpusIngest(out, near_dup_jaccard=None, bloom_bits=1 << 16)
    rows = [(1, BASE), (2, "a second entirely distinct document about engines")]
    ingest.process_batch(_docs(spark, rows), 1)
    assert os.path.exists(os.path.join(out, "bloom", "bloom_1.bin"))

    # simulate the crash between the sidecar barrier and the hash write
    shutil.rmtree(os.path.join(out, "hash_index", "batch_id=1"))

    # verbatim recrawl in the NEXT batch: bloom says maybe, index has no
    # hash -> re-accepted (over-approximation is safe; a drop is not)
    ingest.process_batch(_docs(spark, [(9, BASE)]), 2)
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "accepted"))
        .select("doc_id")
        .collect()
    }
    assert 9 in got

    # and once the batch REPLAYS (index restored), dedup works again
    ingest2 = CorpusIngest(out, near_dup_jaccard=None, bloom_bits=1 << 16)
    ingest2.process_batch(_docs(spark, rows), 1)
    ingest2.process_batch(_docs(spark, [(10, BASE)]), 3)
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out, "accepted"))
        .select("doc_id")
        .collect()
    }
    assert 10 not in got


def test_sig_chain_failure_awaits_bloom_thread_and_replays(spark, tmp_path):
    """A raise inside the sig/url/domain write chain must (a) propagate,
    (b) await + shut down the concurrent hash-bloom thread (no orphan
    non-daemon thread racing a same-process replay), and (c) leave the
    state replayable (ADVICE r12 medium)."""
    import threading

    out = str(tmp_path / "curated_sigfail")
    ingest = CorpusIngest(out, near_dup_jaccard=0.6, bloom_bits=1 << 16)
    rows = [(1, BASE), (2, "yet another unrelated document about compilers")]

    boom = RuntimeError("injected sig-index write failure")
    orig_write = ingest.band_bloom.write

    def _fail(*a, **k):
        raise boom

    ingest.band_bloom.write = _fail
    with pytest.raises(RuntimeError, match="injected sig-index"):
        ingest.process_batch(_docs(spark, rows), 1)
    # the bloom pool thread was awaited and shut down on the error path
    # (shutdown(wait=True) in the finally — no orphan executor thread)
    assert not [
        t
        for t in threading.enumerate()
        if t.name.startswith("ThreadPoolExecutor") and t.is_alive()
    ]

    # same-process replay of the same batch_id completes and rebuilds
    # every index consistently
    ingest.band_bloom.write = orig_write
    ingest.process_batch(_docs(spark, rows), 1)
    sig = spark.read.parquet(os.path.join(out, "sig_index"))
    assert {r["doc_id"] for r in sig.select("doc_id").collect()} == {1, 2}
    acc = spark.read.parquet(os.path.join(out, "accepted"))
    assert acc.count() == 2


def test_band_bloom_without_sig_partition_overapproximates(spark, tmp_path):
    """Crash window of the CONCURRENT band-bloom build (r13 opt round:
    the band bloom overlaps the sig-index write, so it can land while
    the sig partition does not). The stray bloom file is EXTRA content
    load_union ORs in — over-approximation: a near-dup of the lost
    batch probes 'maybe', finds no sig-index row, and must be
    RE-ADMITTED, never silently dropped; near-dups of intact batches
    are still caught through the same union. The control scenario pins
    that both near-dups WOULD be caught without the crash."""
    import shutil

    doc1 = BASE
    doc2 = (
        "an entirely different second story about compilers and parsers "
        "with many more words that keep the shingle set wide today"
    )
    nd1 = doc1 + " tail edit"
    nd2 = doc2 + " tail edit"

    # control: no crash -> both near-dups dropped
    out_a = str(tmp_path / "curated_bandwin_ctl")
    ing_a = CorpusIngest(out_a, near_dup_jaccard=0.6, bloom_bits=1 << 16)
    ing_a.process_batch(_docs(spark, [(1, doc1)]), 1)
    ing_a.process_batch(_docs(spark, [(2, doc2)]), 2)
    ing_a.process_batch(_docs(spark, [(8, nd1), (9, nd2)]), 3)
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out_a, "accepted"))
        .select("doc_id")
        .collect()
    }
    assert got == {1, 2}

    # crash: batch 2's sig partition lost, its band bloom survived
    out_b = str(tmp_path / "curated_bandwin")
    ing_b = CorpusIngest(out_b, near_dup_jaccard=0.6, bloom_bits=1 << 16)
    ing_b.process_batch(_docs(spark, [(1, doc1)]), 1)
    ing_b.process_batch(_docs(spark, [(2, doc2)]), 2)
    shutil.rmtree(os.path.join(out_b, "sig_index", "batch_id=2"))
    assert os.path.exists(os.path.join(out_b, "bloom_bands", "bloom_2.bin"))
    ing_b.process_batch(_docs(spark, [(8, nd1), (9, nd2)]), 3)
    got = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out_b, "accepted"))
        .select("doc_id")
        .collect()
    }
    assert 8 not in got  # intact-batch near-dup still caught via the union
    assert 9 in got  # lost-partition near-dup re-admitted (over-approx, safe)
