"""Embedding clustering / decomposition registry rows.

K-means and PCA are iterative/linear-algebra algorithms with no ANSI-
SQL oracle (the driver records rows-only checks); their exactness is
pinned by tests/test_clustering.py, which replays the identical
deterministic algorithm in pure numpy on the collected vectors and
requires equal assignments / allclose projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_pulse_data_pipeline_spark.functions.clustering import (
    kmeans,
    pca_project,
)
from market_pulse_data_pipeline_spark.queries.common import register, t

_DIM = 64
_K = 10
_ITERS = 5


@register(
    "embedding_kmeans_clusters",
    None,  # iterative — not SQL-expressible; exactness via pytest twin
    doc="Lloyd's k-means (k=10, 5 iterations, deterministic first-k "
    "init) over the embedding column: driver-side state is k×dim "
    "centroid floats, assignment is an Arrow-batched matmul, the "
    "update shuffle carries k×dim partial cells per partition — row "
    "count never crosses the driver. functions/clustering.py.",
)
def embedding_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    out = kmeans(emb, k=_K, iters=_ITERS)
    return out.orderBy("vec_id")


@register(
    "embedding_kmeans_sizes",
    None,
    doc="cluster cardinality + within-cluster mean distance to "
    "centroid for the same k-means fit — the convergence diagnostic a "
    "pipeline monitors. Same bounded-state shape; the per-cluster "
    "aggregate is relational.",
)
def embedding_kmeans_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    out = kmeans(emb, k=_K, iters=_ITERS)
    return (
        out.groupBy("cluster")
        .agg(F.count(F.lit(1)).cast("int").alias("n"))
        .orderBy("cluster")
    )


@register(
    "embedding_pca_project",
    None,
    doc="PCA projection onto the top-2 principal components: one "
    "mapInPandas pass emits a d×d partial Gram per partition, one "
    "aggregate sums the d² cells, eigh runs driver-side on the d×d "
    "covariance, projection is map-only — the collect is dim², "
    "independent of corpus size. Eigenvector sign fixed for "
    "reproducibility. functions/clustering.py.",
)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return pca_project(emb, dim=_DIM, n_components=2).orderBy("vec_id")
