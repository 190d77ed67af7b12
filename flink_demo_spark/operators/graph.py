"""Distributed graph connectivity for near-duplicate clustering.

Near-dup detection (Jaccard / MinHash / SimHash / cosine) emits an
EDGE LIST of similar pairs; turning pairs into keep/drop decisions
needs the connected components of that graph so that transitive
duplicates (A~B, B~C but not A~C) land in one cluster with one
canonical survivor.

Beyond-reference surface (no graph operator exists in the reference;
SURVEY.md §7 phase 6 north star). Spark-first design: pure DataFrame
joins + partial-aggregating groupBy — no driver-side adjacency, no
RDDs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    Returns ``(node, comp)`` — ``comp`` is the cluster id (the smallest
    member), so ``node == comp`` marks the canonical representative.

    Algorithm: min-label propagation to a fixpoint. Each round is one
    hash join (edges ⋈ labels, both shuffled on the node key) and one
    groupBy-min (map-side partial combine), so per-round cost is two
    shuffles of O(|E|) rows. Rounds = graph diameter; near-dup graphs
    are dense and shallow (duplicate clusters have diameter 2-4), so
    this converges in a handful of rounds at any corpus size. For
    adversarial long-chain graphs switch to alternating
    large-star/small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — same per-round shuffle cost,
    O(log² n) rounds guaranteed.

    ``localCheckpoint(eager=True)`` after every round truncates the
    lineage so the plan does not grow with iteration count (re-planning
    an N-round lineage is quadratic work for Catalyst) and the
    convergence-check job does not recompute prior rounds.
    """
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias("node"))
            .union(edges.select(F.col(dst).alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.select(F.col(nodes.columns[0]).alias("node")).distinct()

    sym = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr")).union(
        edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    )
    labels = nodes.withColumn("comp", F.col("node")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = sym.join(labels, "node").select(F.col("nbr").alias("node"), "comp")
        new = (
            labels.union(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.withColumnRenamed("comp", "new_comp")
            .join(labels, "node")
            .where(F.col("new_comp") != F.col("comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels
