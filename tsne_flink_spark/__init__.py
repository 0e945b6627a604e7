"""tsne_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference Flink t-SNE engine
(ChristophAlt/tsne-flink), re-expressed Spark-first.

Public API mirrors the reference's ``TsneHelpers`` surface
(/root/reference/src/main/scala/de/tu_berlin/dima/impro3/TsneHelpers.scala:41-430),
snake_cased, plus a ``TSNE`` estimator facade and large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal) that the
reference does not have.

Cache lifetime: some operators (``tfidf_cosine_pairs``, ``minhash_lsh_dedup``,
``ngram_jaccard_pairs``, ``project_knn``) ``persist()`` an intermediate that
is consumed several times by the lazily returned DataFrame; there is no safe
in-function unpersist point, so the blocks live until LRU eviction.
Long-lived sessions issuing many such calls should run
``spark.catalog.clearCache()`` between batches of work.
"""

from tsne_flink_spark.operators.knn import (
    k_nearest_neighbors,
    partition_knn,
    project_knn,
)
from tsne_flink_spark.operators.affinities import (
    pairwise_affinities,
    joint_distribution,
)
from tsne_flink_spark.operators.embedding import (
    init_working_set,
    update_embedding,
    center_embedding,
    center_input,
)
from tsne_flink_spark.operators.gradient import gradient
from tsne_flink_spark.operators.optimize import iteration_computation, optimize
from tsne_flink_spark.tsne import TSNE

__all__ = [
    "k_nearest_neighbors",
    "partition_knn",
    "project_knn",
    "pairwise_affinities",
    "joint_distribution",
    "init_working_set",
    "update_embedding",
    "center_embedding",
    "center_input",
    "gradient",
    "iteration_computation",
    "optimize",
    "TSNE",
]

__version__ = "0.1.0"
