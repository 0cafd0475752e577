"""Document embeddings from text — the bridge from the documents table
to the ANN/similarity operators.

Classical sparse-to-dense semantic embedding, fully Spark-native: hashed
bag-of-words (bounded feature space) → IDF → PCA to ``dim`` → L2
normalization. The output column is ``array<double>`` compatible with
similarity.cosine_topk / SRP / IVF / PQ, so "semantic near-dup over raw
text" composes from verified parts: ``bow_embeddings`` then any ANN
operator.

Scale notes: HashingTF/IDF are map-side after one distributed doc-freq
aggregate; PCA's covariance accumulation is a distributed treeAggregate
over (num_features × num_features) — which is why ``num_features``
defaults to 1024 (a 1M-entry Gramian, driver-trivial), not 2^20. The
fitted basis broadcasts; embedding is then map-only. For corpora needing
bigger sparse spaces, swap PCA for SRP projection (similarity.srp_*),
which needs no fit at all.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import PCA, HashingTF, IDF, Normalizer, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_embedding_pipeline(num_features: int = 1024, dim: int = 64) -> Pipeline:
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol="text", outputCol="_words", pattern="[a-z0-9]+", gaps=False
            ).setToLowercase(True),
            HashingTF(inputCol="_words", outputCol="_tf", numFeatures=num_features),
            IDF(inputCol="_tf", outputCol="_tfidf"),
            PCA(k=dim, inputCol="_tfidf", outputCol="_pca"),
            Normalizer(inputCol="_pca", outputCol="_emb", p=2.0),
        ]
    )


def fit_embedder(
    docs: DataFrame, num_features: int = 1024, dim: int = 64
) -> PipelineModel:
    return build_embedding_pipeline(num_features, dim).fit(docs)


def embed_docs(model: PipelineModel, docs: DataFrame) -> DataFrame:
    """(doc_id, embedding array<double>): L2-normalized doc vectors."""
    from pyspark.ml.functions import vector_to_array

    return model.transform(docs).select(
        "doc_id", vector_to_array("_emb").alias("embedding")
    )


def semantic_neardup_pairs(
    docs: DataFrame,
    min_cos: float = 0.9,
    num_features: int = 1024,
    dim: int = 64,
    model: PipelineModel | None = None,
) -> DataFrame:
    """(id1, id2, cos) pairs of semantically near-duplicate documents —
    TF-IDF/PCA embedding + exact cosine over SRP-bucketed candidates
    (no all-pairs join; similarity.srp_neardup_pairs supplies the
    bucketed pair search)."""
    from .similarity import srp_neardup_pairs

    m = model or fit_embedder(docs, num_features, dim)
    emb = embed_docs(m, docs).select(F.col("doc_id").alias("vec_id"), "embedding")
    return srp_neardup_pairs(emb, dim=dim, min_cos=min_cos)
