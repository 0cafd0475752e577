"""Trained char-n-gram language ID: holdout accuracy on the fixture
languages, marker-disjointness (the model learns orthography, not the
marker list), short/NULL-text safety, and the curate_corpus wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from pg2kinesis_spark.fixtures import LANG_VOCAB, gen_lang_corpus
from pg2kinesis_spark.functions.langid import (
    add_char_ngrams,
    predict_lang,
    train_char_lang_id,
)


def _labeled(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _split(rows, mod=5):
    train = [r for r in rows if r[0] % mod != 0]
    test = [r for r in rows if r[0] % mod == 0]
    return train, test


def test_char_ngrams_expr_short_and_null_safe(spark):
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "ab"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.g for r in add_char_ngrams(df, out_col="g").collect()}
    assert out[1] == ["abc", "bcd", "abcd"]  # 3-grams then 4-grams (no 5)
    assert out[2] == [] and out[3] == [] and out[4] == []


def test_lang_id_holdout_accuracy(spark):
    """>= 95% on a held-out fifth of the fixture corpus (VERDICT r5
    task 7's gate); in practice the disjoint orthographies separate
    perfectly."""
    rows = gen_lang_corpus(n_per_lang=200, seed=13)
    train, test = _split(rows)
    model = train_char_lang_id(_labeled(spark, train))
    pred = predict_lang(model, _labeled(spark, test).drop("lang"))
    got = {r.doc_id: r.pred_lang for r in pred.collect()}
    truth = {r[0]: r[2] for r in test}
    acc = sum(got[d] == truth[d] for d in truth) / len(truth)
    assert acc >= 0.95, f"holdout accuracy {acc:.3f}"
    # every language is actually exercised
    assert set(truth.values()) == {"de", "en", "es", "fr"}


def test_lang_id_beats_markers_off_vocabulary(spark):
    """Sentences built from words OUTSIDE text.LANG_MARKERS still
    classify: the signal is character orthography, not a word list."""
    from pg2kinesis_spark.functions.text import LANG_MARKERS

    for lang, vocab in LANG_VOCAB.items():
        assert not set(vocab) & set(LANG_MARKERS[lang])
    rows = gen_lang_corpus(n_per_lang=150, seed=29)
    model = train_char_lang_id(_labeled(spark, rows))
    probes = _labeled(
        spark,
        [
            (0, "Die wissenschaft müsste natürlich größer sein.", "de"),
            (1, "The development of knowledge should grow through books.", "en"),
            (2, "El conocimiento debería crecer a través de los libros.", "es"),
            (3, "La connaissance devrait croître à travers les livres.", "fr"),
        ],
    )
    got = {r.doc_id: r.pred_lang for r in predict_lang(model, probes.drop("lang")).collect()}
    assert got == {0: "de", 1: "en", 2: "es", 3: "fr"}


def test_lang_id_deterministic_across_runs(spark):
    rows = gen_lang_corpus(n_per_lang=80, seed=5)
    docs = _labeled(spark, rows)
    m1 = train_char_lang_id(docs)
    m2 = train_char_lang_id(docs)
    p1 = {r.doc_id: r.pred_lang for r in predict_lang(m1, docs.drop("lang")).collect()}
    p2 = {r.doc_id: r.pred_lang for r in predict_lang(m2, docs.drop("lang")).collect()}
    assert p1 == p2


def test_curate_corpus_with_trained_lang_model(spark):
    """lang_model swaps the pred_lang column source; the langs filter
    then keeps exactly the trained-classifier-identified documents, and
    the output schema is unchanged."""
    from pg2kinesis_spark.functions.curate import curate_corpus

    rows = gen_lang_corpus(n_per_lang=120, seed=41)
    model = train_char_lang_id(_labeled(spark, rows))
    mixed = _labeled(spark, gen_lang_corpus(n_per_lang=25, seed=77)).drop("lang")
    out = curate_corpus(
        mixed, langs=("fr",), near_dup_jaccard=None, lang_model=model
    )
    got = out.select("doc_id", "pred_lang").collect()
    assert {r.pred_lang for r in got} == {"fr"}
    # the French fifth of the round-robin corpus (75..99 by construction)
    truth_fr = {r[0] for r in gen_lang_corpus(n_per_lang=25, seed=77) if r[2] == "fr"}
    assert {r.doc_id for r in got} == truth_fr
    assert set(out.columns) == {"doc_id", "text", "n_tokens", "quality", "pred_lang"}


def test_streaming_ingest_lang_gate(spark, tmp_path):
    """CorpusIngest(langs=..., lang_model=...) mirrors curate_corpus:
    the trained prediction gates rows inside the micro-batch."""
    import os

    from pg2kinesis_spark.streaming.corpus_ingest import CorpusIngest

    rows = gen_lang_corpus(n_per_lang=100, seed=3)
    model = train_char_lang_id(_labeled(spark, rows))
    out = str(tmp_path / "curated_lang")
    ingest = CorpusIngest(
        out, near_dup_jaccard=None, bloom_bits=None,
        langs=("en", "de"), lang_model=model,
    )
    batch = _labeled(spark, gen_lang_corpus(n_per_lang=10, seed=55)).drop("lang")
    ingest.process_batch(batch, 0)
    acc = spark.read.parquet(os.path.join(out, "accepted"))
    got = {r.doc_id: r.pred_lang for r in acc.collect()}
    truth = {r[0]: r[2] for r in gen_lang_corpus(n_per_lang=10, seed=55)}
    assert set(got.values()) == {"de", "en"}
    assert set(got) == {d for d, lang in truth.items() if lang in ("de", "en")}
    assert all(got[d] == truth[d] for d in got)
