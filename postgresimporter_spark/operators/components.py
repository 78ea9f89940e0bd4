"""Connected components over near-duplicate pair graphs.

LSH/Jaccard produce *pairs*; production dedup needs *clusters* (merge
"A~B, B~C" into {A,B,C}, keep one canonical doc). This is iterative
min-label propagation to a fixpoint — the standard DataFrame formulation
of connected components (GraphX/Pregel-style, no graph library needed).

Scale: each iteration is one join + one grouped min on the edge list —
O(E) shuffle per round, O(log N) rounds on typical near-dup graphs
(chains are rare; most clusters are stars around a popular doc). The
driver-side loop is control flow only — per-iteration data never leaves
executors; convergence is detected with a 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, component) for every id in the pair graph; component = min
    id reachable. Deterministic regardless of partitioning."""
    if max_iterations < 1:
        # ADVICE r12: with max_iterations <= 0 the loop body never runs,
        # so the for/else non-convergence raise would hit an unbound
        # n_changed (NameError) — and the pre-r12 behavior (silently
        # returning the initial labels) is exactly the wrong-result mode
        # the raise exists to prevent.
        raise ValueError(
            f"max_iterations must be >= 1, got {max_iterations}"
        )
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(
                F.col(id_b).alias("src"), F.col(id_a).alias("dst")
            )
        )
        .distinct()
    )
    edges = edges.localCheckpoint()

    # initial label: min(self, direct neighbors)
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("id"),
            F.least("src", "nbr_min").alias("component"),
        )
        # truncate lineage every round: an iterative DataFrame loop
        # otherwise builds an exponentially nested plan (OOM at ~30
        # iterations just from plan-tree printing/codegen)
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        # neighbor propagation: min over adjacent labels
        nbr_labels = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"),
                    F.col("component").alias("dst_component"),
                ),
                on="dst",
            )
            .groupBy("src")
            .agg(F.min("dst_component").alias("nbr_component"))
        )
        # pointer halving: my component's own label (chains converge in
        # O(log n) instead of O(n))
        parents = labels.select(
            F.col("id").alias("component"),
            F.col("component").alias("parent_component"),
        )
        updated = (
            labels.join(
                nbr_labels, labels.id == nbr_labels.src, "left"
            )
            .drop("src")
            .join(parents, on="component", how="left")
            .select(
                "id",
                F.least(
                    "component",
                    F.coalesce("nbr_component", "component"),
                    F.coalesce("parent_component", "component"),
                ).alias("new_component"),
                F.col("component").alias("old_component"),
            )
        )
        updated = updated.localCheckpoint()
        n_changed = updated.where(
            F.col("new_component") < F.col("old_component")
        ).count()
        labels = updated.select(
            "id", F.col("new_component").alias("component")
        )
        if n_changed == 0:
            break
    else:
        # fixpoint NOT reached: the labels are wrong (some nodes still
        # carry a non-minimal component), and returning them silently
        # would merge/split dedup clusters incorrectly — the one
        # failure mode worse than failing. Unreachable in practice:
        # pointer halving converges in O(log diameter), so 50 rounds
        # cover any graph this engine can hold; hitting this means a
        # caller lowered max_iterations below log2(diameter).
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iterations} iterations ({n_changed} labels still "
            "changing); raise max_iterations — a silent partial "
            "result would be incorrect cluster labels"
        )
    return labels


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Cluster summary: (component, cluster_size, member ids are
    represented by min/max for a hash-stable scalar output)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.groupBy("component").agg(
        F.count("*").alias("cluster_size"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


__all__ = ["connected_components", "dedup_clusters"]
