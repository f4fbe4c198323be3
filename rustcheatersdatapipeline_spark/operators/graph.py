"""Distributed connected components (the dedup-clustering primitive).

Spark has no native CC operator; this is min-label propagation with
POINTER JUMPING expressed as DataFrame joins, the standard shape for
dup-family clustering at scale (cf. the large/small-star algorithm):

    label := min(label, label(label), min over neighbors of label)

The label-of-label term halves chain depth every round, so the loop
converges in O(log diameter) rounds instead of O(diameter); each round
is two equi-join shuffles on the node id. ``localCheckpoint`` truncates
lineage so round N's plan does not replay rounds 1..N-1 (and bounds the
DAG the scheduler must walk). State per round is one (node, label)
table — linear in nodes, uniform shuffle keys, no skew hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Labels every node appearing in ``edges`` with the minimum node id
    reachable from it: (node, component). Edges are treated as
    undirected; isolated nodes (absent from edges) are absent from the
    output — union them in with node==component if needed."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    while True:
        nbr = (
            und.join(labels, und.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_min"))
        )
        grand = labels.select(
            F.col("node").alias("g_id"), F.col("label").alias("g_label")
        )
        new_labels = (
            labels.join(grand, labels.label == grand.g_id, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("g_label"), F.col("label"))
                ).alias("label"),
            )
            .join(nbr, F.col("node") == nbr.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
