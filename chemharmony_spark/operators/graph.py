"""Distributed connected components — the pairs-to-clusters step every
near-dup pipeline needs (MinHash/SimHash/containment emit PAIRS; dedup
decisions need CLUSTERS with one keeper per component).

Algorithm: iterative minimum-label propagation over the undirected edge
set. Each round every node adopts the smallest label among itself and its
neighbors; convergence when no label changes. Rounds are plain
join+groupBy (shuffle on node id, map-side combinable); lineage is cut per
round with ``localCheckpoint`` so the plan does not grow with iterations.
Round count is bounded by the component diameter — near-dup clusters are
shallow (stars/cliques), so 3-5 rounds typical. For adversarial
long-chain graphs switch to the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014 — public paper), which converges in O(log n) rounds;
the per-round dataflow below is the same building block.

Deterministic by construction (min over labels), so the result is
oracle-checkable against a recursive-CTE transitive closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """-> (node, component) where component = min node id reachable.

    ``edges`` is undirected (direction ignored); isolated nodes absent from
    the edge set are absent from the output (join them back as their own
    singleton components if needed).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("label"))
        .select(F.col("a").alias("node"), "label")
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' current labels
        nbr = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
