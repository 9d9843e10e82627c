"""Iterative DataFrame algorithms: connected components for dedup
clustering.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep one
representative per component of the similarity graph). Min-label
propagation alone converges in O(graph diameter) rounds — fine for the
shallow star/tail clusters near-dup graphs usually produce, but a
copy-of-copy CHAIN has diameter ∝ length, and a fixed iteration cap
would then mislabel silently. Each round therefore also applies one
path-halving step (label ← label's label, the pointer-jumping half of
the classic Shiloach-Vishkin / hash-to-min family), which makes label
depth shrink geometrically: convergence in O(log diameter) rounds,
measured in tools/stress_check.py (winnow_cluster_chain stage: a
planted 1,600-hop chain converges inside the default cap). Each
iteration is one neighbor join + groupBy + one self-join, lineage
truncated per round with localCheckpoint so plans don't grow
unboundedly (the standard Spark iterative-algorithm hazard).
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
    connected component. Converges when no label changes.

    Per round: (1) min over neighbor labels, (2) path halving — jump
    every label to its label's own label. Labels only ever point to
    smaller ids inside the same component, so halving is safe, and it
    cuts label-chain depth geometrically: a diameter-D chain converges
    in O(log D) rounds instead of D (with the default ``max_iter=20``
    that covers diameters the pure propagation form would silently
    mislabel)."""
    # Materialize the edge list ONCE before iterating: edges often
    # arrive as the tail of an expensive pipeline (the n-gram Jaccard
    # near-dup join in dedup_cluster_assignment, winnowing fingerprint
    # joins), and every round's neighbor join would otherwise
    # re-execute that whole pipeline — the audited plan showed 160
    # document scans for a 20-round run before this checkpoint
    # (round 12). Checkpointing the ONE-directional list (not bidir)
    # runs the upstream pipeline exactly once; the symmetric view is a
    # map-only union over the materialized rows.
    ed = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint()
    bidir = ed.union(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
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
        stepped = verts.join(nbr, verts.id == nbr.src, "left").select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce("nbr_component", F.col("component")),
            ).alias("component"),
        )
        # path halving: component <- component's component. Every label
        # IS a vertex id of the same component with a <= id, so the
        # lookup always lands and never leaves the component.
        lbl = stepped.select(
            F.col("id").alias("l_id"), F.col("component").alias("l_comp")
        )
        updated = (
            stepped.join(lbl, stepped.component == lbl.l_id, "left")
            .select(
                "id",
                F.coalesce("l_comp", "component").alias("component"),
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


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 10**12,
) -> DataFrame:
    """PageRank (damping 0.85) in scaled-integer arithmetic.

    Ranks are BIGINTs scaled by ``scale``; every step is integer
    multiply/divide/sum, so the result is bit-identical on any engine —
    float PageRank is not (per-node in-neighbor sums reassociate).
    Requires every node to have >=1 out-edge (no dangling mass): make
    the graph symmetric first if needed.

    Per iteration: one join rank⋈edges (map-side if edges are
    pre-partitioned by src), one groupBy(dst) shuffle; lineage truncated
    per round with localCheckpoint like connected_components. Driver
    holds only the 1-row node count.
    """
    # materialize the edge list once: the degree aggregate, the node
    # count, the rank init, AND every iteration's join all consume it,
    # and edges may be the tail of an expensive upstream pipeline
    # (same hazard connected_components checkpoints its edges for) —
    # the lazy form re-ran that pipeline per consumer (14 source scans
    # in the audited pagerank plan before round 12)
    ed = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    ed = ed.localCheckpoint()
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    # the per-iteration join side is itself materialized so each round
    # reads it instead of redoing the degree join
    eo = ed.join(deg, "src").select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst"), "outdeg"
    ).localCheckpoint()
    ranks = (
        deg.select(F.col("src").alias("node"))
        .crossJoin(F.broadcast(n))
        .select("node", F.expr(f"{scale} div n_nodes").alias("pr"))
        .localCheckpoint()
    )
    for _ in range(iters):
        sums = (
            eo.join(ranks, eo.e_src == ranks.node)
            .select(F.col("e_dst").alias("node"), F.expr("pr div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            sums.crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    F.expr(f"(15 * ({scale} div n_nodes)) div 100")
                    + F.expr("(85 * s) div 100")
                ).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks


def dedup_clusters(pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b") -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id, cluster_size, is_kept): one
    kept representative (min id) per similarity cluster — the final step
    of a fuzzy-dedup pipeline."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    # Plain shuffle join, NOT a broadcast: `sizes` has one row per
    # connected component, which is unbounded in corpus size (a 100 TB
    # corpus of mostly-small clusters has ~N/2 components — tens of GB
    # broadcast). Both sides are already keyed on `component`, so the
    # sort-merge/shuffle-hash join reuses the groupBy's hash
    # partitioning on the build side; AQE picks broadcast at runtime
    # anyway when the component count is actually small.
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("id") == F.col("component")).alias("is_kept"),
        )
    )
