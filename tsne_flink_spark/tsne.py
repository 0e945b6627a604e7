"""Estimator-style facade over the full t-SNE pipeline.

Parameter set mirrors the reference CLI (README.md:13-38, defaults at
Tsne.scala:45-63).  ``fit`` accepts either assembled points
(id, features) or a precomputed distance matrix in COO form (the reference's
--inputDistanceMatrix entry point B, Tsne.scala:69-71).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from tsne_flink_spark.operators.affinities import (
    joint_distribution,
    pairwise_affinities,
)
from tsne_flink_spark.operators.embedding import init_working_set
from tsne_flink_spark.operators.knn import (
    k_nearest_neighbors,
    partition_knn,
    project_knn,
)
from tsne_flink_spark.operators.optimize import optimize


@dataclass
class TSNE:
    metric: str = "sqeuclidean"
    perplexity: float = 30.0
    n_components: int = 2
    early_exaggeration: float = 4.0
    learning_rate: float = 1000.0
    iterations: int = 300
    random_state: int = 0
    neighbors: int | None = None  # default 3 * floor(perplexity) (Tsne.scala:55)
    initial_momentum: float = 0.5
    final_momentum: float = 0.8
    theta: float = 0.25
    # "reference" replicates quirk Q2 (summary vs SQUARED distance — exact
    # O(N^2) on compressed embeddings); "scaled" is canonical Barnes-Hut
    bh_condition: str = "reference"
    # "auto" (default): full executor-built tree below a 64 MB broadcast
    # budget (reference parity), far-field summary above it (O(1)-in-N
    # broadcast — the 100-TB path, BASELINE.md B14); "distributed"/"driver"/
    # "summary" force a path
    tree_build: str = "auto"
    knn_method: str = "bruteforce"  # bruteforce | partition | project
    # 3 = reference parity (Tsne.scala:61 knnIterations default).  The bare
    # project_knn operator defaults to 4 passes (recall 0.853 at N=100k);
    # the facade's 3-pass point with the +-256 window is also measured:
    # recall 0.765 at the same scale (BASELINE.md B10b sweep).
    knn_iterations: int = 3
    knn_blocks: int | None = None
    # input dimensionality; when set, the kNN distance expression is built
    # without probing the data (keeps plan construction action-free)
    dimension: int | None = None
    loss_records: list = field(default_factory=list)

    @property
    def _k(self) -> int:
        return self.neighbors if self.neighbors is not None else 3 * int(self.perplexity)

    def _knn(self, points: DataFrame) -> DataFrame:
        if self.knn_method == "bruteforce":
            return k_nearest_neighbors(
                points, self._k, self.metric, dim=self.dimension
            )
        if self.knn_method == "partition":
            return partition_knn(points, self._k, self.metric, self.knn_blocks)
        if self.knn_method == "project":
            return project_knn(
                points,
                self._k,
                self.metric,
                dimension=self.dimension,
                iterations=self.knn_iterations,
                seed=self.random_state,
            )
        raise ValueError(f"unknown knn_method {self.knn_method!r}")

    def fit(
        self, points: DataFrame | None = None, distances: DataFrame | None = None
    ) -> DataFrame:
        """Run the pipeline; returns the final (id, y ARRAY<DOUBLE>) embedding.

        Exactly one of ``points`` (id, features) / ``distances`` (i, j, v COO)
        must be given.
        """
        if (points is None) == (distances is None):
            raise ValueError("provide exactly one of points= or distances=")

        knn = distances if distances is not None else self._knn(points)
        p_cond = pairwise_affinities(knn, self.perplexity)
        p_joint = joint_distribution(p_cond).persist(StorageLevel.MEMORY_AND_DISK)

        ids = (points if points is not None else p_joint.select(
            p_joint["i"].alias("id")).distinct())
        working_set = init_working_set(
            ids.select("id"), self.n_components, self.random_state
        )

        self.loss_records.clear()
        embedding = optimize(
            p_joint,
            working_set,
            learning_rate=self.learning_rate,
            iterations=self.iterations,
            metric=self.metric,
            early_exaggeration=self.early_exaggeration,
            initial_momentum=self.initial_momentum,
            final_momentum=self.final_momentum,
            theta=self.theta,
            n_components=self.n_components,
            loss_sink=self.loss_records,
            bh_condition=self.bh_condition,
            tree_build=self.tree_build,
        )
        p_joint.unpersist()
        return embedding

    def plan(
        self, points: DataFrame | None = None, distances: DataFrame | None = None
    ) -> DataFrame:
        """Assemble the ONE-ITERATION pipeline plan lazily — no job runs.

        The reference's ``--executionPlan`` dumps the lazily assembled Flink
        job graph without executing it (Tsne.scala:89-95); the Spark analogue
        is the physical plan of one kNN -> affinities -> joint -> gradient ->
        update -> center step.  The driver loop's per-iteration
        ``materialize()`` is deliberately absent, and the Barnes-Hut stage is
        planned against a stub broadcast tree, so nothing here triggers an
        action.  With ``dimension`` set, plan construction runs ZERO Spark
        jobs for every knn_method: ``"project"`` is planned in stub mode
        (placeholder quantization bounds and a lazy placeholder rank column
        standing in for the real global rank, whose materialized range
        shuffle and partition-count collect are inherently eager and so
        cannot appear in an unexecuted plan).
        """
        from tsne_flink_spark.operators.gradient import gradient
        from tsne_flink_spark.operators.embedding import (
            center_embedding,
            update_embedding,
        )

        if (points is None) == (distances is None):
            raise ValueError("provide exactly one of points= or distances=")

        if distances is not None:
            knn = distances
        elif self.knn_method == "project":
            knn = project_knn(
                points,
                self._k,
                self.metric,
                dimension=self.dimension,
                iterations=self.knn_iterations,
                seed=self.random_state,
                _plan_stub=True,
            )
        else:
            knn = self._knn(points)
        p_cond = pairwise_affinities(knn, self.perplexity)
        p_joint = joint_distribution(p_cond)
        ids = (points if points is not None else p_joint.select(
            p_joint["i"].alias("id")).distinct())
        ws = init_working_set(
            ids.select("id"), self.n_components, self.random_state
        )
        dy, _ = gradient(
            p_joint,
            ws.select("id", "y"),
            metric=self.metric,
            theta=self.theta,
            n_components=self.n_components,
            bh_condition=self.bh_condition,
            tree_build="stub" if self.theta > 0 else self.tree_build,
        )
        updated = update_embedding(
            dy, ws, momentum=self.initial_momentum,
            learning_rate=self.learning_rate,
        )
        return center_embedding(updated, n_components=self.n_components).select(
            "id", "y"
        )
