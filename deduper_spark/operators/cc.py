"""Connected components — iterative DataFrame min-label propagation.

Generalizes the reference's dupe group (Deduper.kt:225-240): under
exact equality, groups are trivially connected (same hash); under
fuzzy similarity the dup relation is a graph, and a cluster is a
connected component. cluster_id = min member id (union-find label),
which also IS the keep-first survivor (min image_id — the reference's
first-found-row generalized).

Algorithm: min-id label propagation to a fixpoint —
    label(v) <- min(label(v), min over neighbors u of label(u))
On clique-ish dup clusters this converges in 2-3 rounds; pathological
long chains converge in O(diameter) (large-star/small-star from the
Google CC-MR paper would give O(log d); plain propagation is chosen
for plan simplicity — dup graphs are short-diameter in practice).

Each round: one shuffle (groupBy node) over the edge list.
localCheckpoint() per round truncates lineage so the plan does not
grow superlinearly (SURVEY.md §7 hard part (c)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_iter: int = 25,
    id_type: str = "string",
) -> DataFrame:
    """edges: (id_l, id_r). nodes: (id) incl. singletons (optional).
    Returns (id, cluster_id) for every node in edges ∪ nodes."""
    sym = (
        edges.select(F.col("id_l").alias("src"), F.col("id_r").alias("dst"))
        .unionByName(
            edges.select(F.col("id_r").alias("src"), F.col("id_l").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )

    converged = False
    for _it in range(max_iter):
        # neighbor minimum in one agg, then elementwise min with own
        # label; the changed flag is computed IN the round so the
        # convergence probe is a cheap scan of the round's checkpoint,
        # not an extra join+shuffle
        if _it == 0:
            # label(v) == v initially, so round 0 needs NO label join:
            # min over neighbors' labels == min over neighbor ids
            neigh = (
                sym.groupBy("src").agg(F.min("dst").alias("nmin"))
                .withColumnRenamed("src", "id")
            )
        else:
            neigh = (
                sym.join(labels.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src")
                .agg(F.min("label").alias("nmin"))
                .withColumnRenamed("src", "id")
            )
        stepped = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nmin"), F.col("label")) < F.col("label"))
                .alias("__chg"),
            )
            .localCheckpoint()
        )
        labels = stepped.select("id", "label")
        if stepped.where(F.col("__chg")).limit(1).count() == 0:
            converged = True
            break

    if not converged:
        # silent truncation would split long-diameter components into
        # WRONG cluster ids and corrupt survivor selection — fail hard
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds (component diameter too large); raise "
            f"max_iter for chain-shaped dup graphs"
        )

    out = labels.withColumnRenamed("label", "cluster_id")
    if nodes is not None:
        singletons = (
            nodes.select(F.col(nodes.columns[0]).alias("id"))
            .join(out.select("id"), "id", "left_anti")
            .withColumn("cluster_id", F.col("id"))
        )
        out = out.unionByName(singletons)
    return out
