"""Distributed connected components over an edge DataFrame.

The missing last stage of every near-dup pipeline: pair miners
(``ngram_jaccard_pairs``, LSH candidates, winnowing overlap) emit EDGES, but
canonicalization needs the transitive closure — "keep one document per
duplicate CLUSTER", not "per pair" (a~b, b~c must collapse a,b,c together
even when a,c were never compared).

Algorithm: min-label propagation with pointer jumping — each round every
node takes the minimum label over itself and its neighbors (one equi-join +
groupBy-min per round), then short-circuits chains by following its own
label's label (a second self-join: path halving).  Label propagation alone
converges in O(diameter) rounds; the pointer-jumping step cuts chains in
half each round, giving O(log diameter) — the same round complexity class
as the large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014) with a simpler invariant.

Scale: per round, the shuffle is O(|E|) rows keyed by node id (AQE handles
skewed high-degree nodes the same way it handles the LSH band joins — see
BASELINE.md B17); no step ever holds a partition-spanning structure, and
the driver sees only a 1-row convergence aggregate per round.  Labels only
ever decrease, so ``sum(label)`` is a strictly-decreasing potential — the
convergence test is one cheap global agg, not a change-count join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsne_flink_spark.operators.optimize import materialize


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``; ``component``
    is the minimum node id of the node's connected component.

    ``edges`` is treated as undirected; self-loops and duplicate edges are
    harmless (they propagate no new labels).  Nodes with no edges are not
    emitted — callers canonicalizing a full table left-join and coalesce
    with the node's own id (an isolated row is its own cluster).
    """
    # materialize the symmetrized edges ONCE: every round's message join
    # re-reads them, and without the checkpoint each round would re-execute
    # the caller's entire upstream pair-mining pipeline (measured 10x on
    # the ngram-Jaccard miner)
    sym = materialize(
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).union(
            edges.select(F.col(dst).alias("__s"), F.col(src).alias("__d"))
        )
    )

    labels = materialize(
        sym.select(F.col("__s").alias("id")).distinct()
        .select("id", F.col("id").alias("component"))
    )
    potential = labels.agg(F.sum("component")).first()[0]
    if potential is None:  # empty edge set
        return labels

    for _ in range(max_rounds):
        # neighbor messages: every edge endpoint offers its current label
        msgs = sym.join(
            labels.select(F.col("id").alias("__s"), "component"), "__s"
        ).select(F.col("__d").alias("id"), "component")
        relaxed = (
            labels.union(msgs).groupBy("id").agg(F.min("component").alias("component"))
        )
        # pointer jumping (path halving): follow the label's own label.
        # Labels are always node ids, so the lookup side is `relaxed` keyed
        # by id; component(component) <= component by the min invariant.
        hop = relaxed.select(
            F.col("id").alias("component"), F.col("component").alias("__c2")
        )
        labels = materialize(
            relaxed.join(hop, "component", "left").select(
                "id", F.coalesce("__c2", "component").alias("component")
            )
        )
        new_potential = labels.agg(F.sum("component")).first()[0]
        if new_potential == potential:
            return labels
        potential = new_potential
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(log2(diameter) rounds expected; is the edge set adversarial?)"
    )
