"""Connected components over candidate-pair graphs.

The dedup tiers (exact / minhash-LSH / simhash / embedding near-dup)
emit PAIRS; an actual dedup action needs CLUSTERS — keep one
representative per connected component of the similarity graph.

Algorithm: iterative min-label propagation (each node adopts the
minimum component label among itself and its neighbors) with a
driver-side convergence check. Near-dup components are dense and
shallow (duplicate clusters are clique-ish), so convergence takes
O(component diameter) rounds — 2-4 in practice — each round being one
join + one groupBy shuffle keyed on node id. For adversarially deep
graphs (long chains) the round count grows linearly; the classic
large-star/small-star contraction would cut that to O(log n) rounds,
documented here as the upgrade path if path-shaped graphs ever
matter for dedup (they don't: similarity is near-transitive).

Scale notes:
  - every round materializes labels via localCheckpoint(eager) —
    truncating lineage is mandatory or round k replays rounds 1..k-1
    (and the driver-side convergence count is one scalar per round,
    like plans/manifest.py's partition todo list);
  - deterministic: min() labels, no rand(); stage retries converge to
    identical labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """-> (id, component): component = min node id reachable from id.

    `edges` is an undirected pair list (each pair listed once in
    either orientation); isolated nodes don't appear (callers union
    the full id set afterwards if singleton components matter).
    """
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    sym = sym.dropDuplicates(["src", "dst"]).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("_nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("_nbr_min", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            break
    return labels


def dedup_clusters(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """-> (component, member_id, is_keeper): one keeper (the minimum
    id) per connected component of the duplicate-pair graph — the
    drop-list action on top of any candidate tier."""
    cc = connected_components(edges, src_col, dst_col)
    return cc.select(
        F.col("component"),
        F.col("id").alias("member_id"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )
