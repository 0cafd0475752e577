"""Trained character-n-gram language ID (fasttext-style, MLlib-native).

The marker-word ``text.lang_id`` is deliberately oracle-checkable (a
fixed CASE expression DuckDB can mirror), but a real pipeline wants a
TRAINED identifier: hashed char-3..5-gram features into a multinomial
Naive Bayes — the classic compact lang-ID recipe (char n-grams carry
orthography: 'sch'/'ß' vs 'tion' vs 'ción' vs 'aux'), trainable on any
(text, lang) corpus via the same MLlib machinery as
``classifier.train_doc_classifier``.

Scale shape: the char-n-gram featurization is a single JVM expression
(``transform(sequence(...), i -> substring(...))`` — no Python, no
explode/shuffle), HashingTF is map-only, and NaiveBayesModel.transform
is a broadcast matrix multiply — scoring a 100 TB corpus is one
map-only pass. Training aggregates hashed counts per class: bounded by
(num_features × n_classes), never by corpus size.

No reference analogue (/root/reference is CDC plumbing) — this is the
LLM-pipeline tier's curation surface, next to classifier.py.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import NaiveBayes
from pyspark.ml.feature import HashingTF, StringIndexer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_char_ngrams(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "_cgrams",
    ns: tuple[int, ...] = (3, 4, 5),
    max_chars: int = 2000,
) -> DataFrame:
    """Adds ``out_col``: array<string> of lowercased character
    n-grams, pure JVM.

    The truncated-lowercased text is LET-BOUND as a real column first
    (the repetition.py discipline): inlining it into each of the |ns|
    gram expressions would make Catalyst evaluate the substring+lower
    once per n. ``max_chars`` caps per-document work — 2000 chars
    identify a language as well as 2 MB do — and bounds the feature
    array at ~|ns| × max_chars entries regardless of document size.
    CASE-guarded: ``sequence(1, 0)`` is DESCENDING in Spark, so short
    texts must produce an empty array, not a reversed one."""
    grams = [
        f"CASE WHEN length(_lt) >= {n} THEN "
        f"transform(sequence(1, length(_lt) - {n} + 1), i -> substring(_lt, i, {n})) "
        f"ELSE array() END"
        for n in ns
    ]
    return (
        df.withColumn(
            "_lt", F.expr(f"lower(substring(coalesce({text_col}, ''), 1, {max_chars}))")
        )
        .withColumn(out_col, F.expr(f"concat({', '.join(grams)})"))
        .drop("_lt")
    )


def build_lang_id_pipeline(
    num_features: int = 1 << 15,
    label_col: str = "lang",
    smoothing: float = 1.0,
) -> Pipeline:
    return Pipeline(
        stages=[
            HashingTF(
                inputCol="_cgrams", outputCol="_features", numFeatures=num_features
            ),
            # alphabetAsc: label order is deterministic across runs/engines
            StringIndexer(
                inputCol=label_col, outputCol="_label", stringOrderType="alphabetAsc"
            ),
            NaiveBayes(
                featuresCol="_features",
                labelCol="_label",
                modelType="multinomial",
                smoothing=smoothing,
            ),
        ]
    )


def train_char_lang_id(
    labeled_docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    num_features: int = 1 << 15,
    smoothing: float = 1.0,
) -> PipelineModel:
    """Fit the char-n-gram multinomial NB on (text, lang) rows."""
    df = add_char_ngrams(labeled_docs, text_col)
    return build_lang_id_pipeline(num_features, label_col, smoothing).fit(df)


def _labels(model: PipelineModel) -> list[str]:
    for st in model.stages:
        if hasattr(st, "labelsArray"):
            return list(st.labelsArray[0])
    raise ValueError("model has no StringIndexer stage")


def predict_lang(
    model: PipelineModel,
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "pred_lang",
) -> DataFrame:
    """Input columns + ``out_col`` (predicted language string) — a
    map-only broadcast scoring pass; replaces ``out_col`` if present.
    (StringIndexerModel skips itself when the label column is absent,
    the standard MLlib score-time behavior classifier.py relies on.)"""
    labels = _labels(model)
    out = model.transform(add_char_ngrams(docs, text_col))
    pred = F.element_at(
        F.array(*[F.lit(l) for l in labels]), F.col("prediction").cast("int") + 1
    )
    drop = [
        c
        for c in (
            # _label appears when the scored frame still carries the
            # training label column (StringIndexerModel only skips
            # itself when its INPUT column is absent)
            "_cgrams", "_features", "_label",
            "rawPrediction", "probability", "prediction",
        )
        if c in out.columns
    ]
    return out.withColumn(out_col, pred).drop(*drop)
