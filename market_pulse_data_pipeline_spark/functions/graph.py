"""Iterative DataFrame algorithms: connected components for dedup
clustering.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
representative per component of the similarity graph). Min-label
propagation converges in O(graph diameter) iterations — each iteration
is one join + groupBy, lineage truncated per round with localCheckpoint
so plans don't grow unboundedly (the standard Spark iterative-algorithm
hazard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every vertex; component = min vertex id in the
    connected component. Converges when no label changes."""
    bidir = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).union(edges.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
    verts = (
        bidir.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = (
            bidir.join(verts, bidir.dst == verts.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            verts.join(nbr, verts.id == nbr.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()  # truncate lineage every round
        )
        changed = (
            updated.alias("u")
            .join(verts.alias("v"), "id")
            .filter(F.col("u.component") != F.col("v.component"))
            .count()
        )
        verts = updated
        if changed == 0:
            break
    return verts


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, cluster_size, is_kept): one
    kept representative (min id) per similarity cluster — the final step
    of a fuzzy-dedup pipeline."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(F.broadcast(sizes), "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("component")).alias("is_kept"),
        )
    )
