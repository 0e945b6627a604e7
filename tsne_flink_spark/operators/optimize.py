"""Driver-loop optimizer: the Spark substitute for Flink bulk iteration.

Flink iterates inside the cluster with superstep barriers
(TsneHelpers.scala:371-394); Spark's idiom is a driver-side loop with
per-iteration materialization.  ``localCheckpoint(eager=True)`` after each
step truncates lineage (without it the plan doubles per iteration) and plays
the role of the feedback edge.  Loss is a deterministic per-iteration
aggregate, replacing the reference's MapAccumulator side-channel
(MapAccumulator.java:27-77; accumulators double-count on task retry).

Three-phase schedule replicated exactly (quirk Q8, TsneHelpers.scala:403-427):
first min(n, 20) iterations at initial momentum with exaggerated P, next
min(n-20, 81) at final momentum with exaggerated P, remainder at final
momentum with plain P.  The loss on exaggerated phases is computed against
the exaggerated P, as the reference does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from tsne_flink_spark.operators.embedding import center_embedding, update_embedding
from tsne_flink_spark.operators.gradient import gradient

MIN_GAIN = 0.01
LOSS_EVERY = 10


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a DataFrame and truncate BOTH lineage and statistics.

    ``localCheckpoint(eager=True)`` truncates lineage but the resulting
    LogicalRDD *propagates the origin plan's estimated statistics*.  In an
    iterative loop the size estimate then compounds hyper-exponentially
    (measured: sizeInBytes bit-length x3 per iteration) until Catalyst's
    stats visitor grinds on million-digit BigInt multiplications.  Rebuilding
    the DataFrame from the checkpointed internal RDD resets stats to the
    session default.  Falls back to the plain checkpoint if the internal
    constructor is unavailable.
    """
    cp = df.localCheckpoint(eager=True)
    try:
        jdf = cp._jdf
        jrdd = jdf.queryExecution().toRdd()
        jspark = df.sparkSession._jsparkSession
        new_jdf = jspark.internalCreateDataFrame(jrdd, jdf.schema(), False)
        return DataFrame(new_jdf, df.sparkSession)
    except Exception:  # pragma: no cover - Connect / future-Spark fallback
        return cp


def iteration_computation(
    iterations: int,
    momentum: float,
    working_set: DataFrame,
    p_coo: DataFrame,
    metric: str = "sqeuclidean",
    learning_rate: float = 1000.0,
    theta: float = 0.0,
    n_components: int = 2,
    iter_offset: int = 0,
    loss_sink: list | None = None,
    bh_condition: str = "reference",
    tree_build: str = "auto",
    n_hint: int | None = None,
) -> DataFrame:
    """Run ``iterations`` gradient-descent steps from ``working_set``.

    Mirrors TsneHelpers.iterationComputation (TsneHelpers.scala:371-394);
    the superstep number is 1-based, so global iteration = iter_offset + step.
    Appends (iteration, loss) tuples to ``loss_sink`` every 10th iteration.

    ``n_hint``: the working-set row count, if the caller knows it.  Row
    count is loop-invariant (update/center are row-preserving id joins),
    so one count lets every iteration's Barnes-Hut auto dispatch skip its
    per-iteration bounds/count aggregate (r15, guide §2.4).
    """
    ws = working_set
    for step in range(1, iterations + 1):
        it = iter_offset + step
        embedding = ws.select("id", "y")
        want_loss = loss_sink is not None and it % LOSS_EVERY == 0
        dy, loss = gradient(
            p_coo,
            embedding,
            metric=metric,
            theta=theta,
            n_components=n_components,
            compute_loss=want_loss,
            bh_condition=bh_condition,
            tree_build=tree_build,
            n_hint=n_hint,
        )
        updated = update_embedding(
            dy, ws, min_gain=MIN_GAIN, momentum=momentum, learning_rate=learning_rate
        )
        ws = center_embedding(updated, n_components=n_components)
        # materialize + truncate lineage and stats; the returned DF is backed
        # by cached partitions, so the next iteration starts from a flat scan
        ws = materialize(ws)
        if want_loss:
            loss_sink.append((it, loss.head()["loss"]))
    return ws


def optimize(
    p_coo: DataFrame,
    initial_working_set: DataFrame,
    learning_rate: float = 1000.0,
    iterations: int = 300,
    metric: str = "sqeuclidean",
    early_exaggeration: float = 4.0,
    initial_momentum: float = 0.5,
    final_momentum: float = 0.8,
    theta: float = 0.0,
    n_components: int = 2,
    loss_sink: list | None = None,
    bh_condition: str = "reference",
    tree_build: str = "auto",
) -> DataFrame:
    """Full three-phase optimization; returns the final (id, y) embedding."""
    iter_init = min(iterations, 20)
    iter_exag = min(iterations - iter_init, 101 - 20)
    iter_plain = iterations - iter_exag - iter_init

    exaggerated = p_coo.select(
        "i", "j", (F.col("v") * F.lit(float(early_exaggeration))).alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    plain = p_coo.persist(StorageLevel.MEMORY_AND_DISK)

    # one count for the whole loop: lets the BH auto dispatch skip its
    # per-iteration bounds/count job (row count never changes mid-loop)
    n_hint = int(initial_working_set.count()) if theta != 0.0 else None

    # NOTE (r15, measured): a pagerank-style scale-adaptive LOOP shuffle
    # width (cap spark.sql.shuffle.partitions to ceil(rows/64k) for the
    # loop) was tried and REJECTED here.  Deterministic evidence: job/
    # stage/task counts per flagship run are IDENTICAL with and without
    # the cap (358/698/~5.5k) — AQE's partition coalescing already
    # collapses the loop's tiny reducers, so the cap has no mechanism;
    # and the interleaved A/B read the capped build 1.7-3x WORSE inside
    # a contended-host window (a width-1 stage serializes into whatever
    # stalls its one core, while the wide width rides out per-core
    # stalls).  The per-iteration cost is the AQE sub-job floor, not
    # task counts (see the broadcast-hint rejection below).

    ws = iteration_computation(
        iter_init, initial_momentum, initial_working_set, exaggerated,
        metric, learning_rate, theta, n_components, 0, loss_sink,
        bh_condition, tree_build, n_hint,
    )
    if iter_exag > 0:
        ws = iteration_computation(
            iter_exag, final_momentum, ws, exaggerated,
            metric, learning_rate, theta, n_components, iter_init, loss_sink,
            bh_condition, tree_build, n_hint,
        )
    if iter_plain > 0:
        ws = iteration_computation(
            iter_plain, final_momentum, ws, plain,
            metric, learning_rate, theta, n_components,
            iter_init + iter_exag, loss_sink, bh_condition, tree_build, n_hint,
        )
    exaggerated.unpersist()
    plain.unpersist()
    return ws.select("id", "y")
