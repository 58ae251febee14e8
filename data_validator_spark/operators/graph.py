"""Connected components over candidate-pair graphs.

The dedup tiers (exact / minhash-LSH / simhash / embedding near-dup)
emit PAIRS; an actual dedup action needs CLUSTERS — keep one
representative per connected component of the similarity graph.

Two algorithms behind one contract (-> (id, component), component =
min reachable node id):

  "star" (default): alternating large-star / small-star contraction
      (Kiveris et al., "Connected Components in MapReduce and
      Beyond", SoCC'14) — O(log n) rounds on ANY graph shape, each
      round two groupBy shuffles keyed on node id. The scale-safe
      choice: an adversarial duplicate chain of depth d costs
      O(log d) rounds, not O(d).
  "label": iterative min-label propagation (each node adopts the
      minimum label among itself and its neighbors) — one join + one
      groupBy per round, O(component diameter) rounds. Near-dup
      components are dense and shallow (duplicate clusters are
      clique-ish), so this converges in 2-4 rounds there and each
      round is cheaper than a star round; use it when the graph is
      known-shallow.

Both paths RAISE if max_iter rounds pass without convergence —
silently returning partially-propagated labels would make
dedup_clusters keep multiple "keepers" per true component.

Scale notes:
  - every round materializes state via localCheckpoint(eager) —
    truncating lineage is mandatory or round k replays rounds 1..k-1;
    the PREVIOUS round's checkpoint blocks are unpersisted as soon as
    the new round is materialized, so executor storage holds ~one
    round of state, not the whole history;
  - deterministic: min() labels, no rand(); stage retries converge to
    identical labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when a fixed-point loop exhausts max_iter while still
    changing — results would be silently wrong (split components)."""


def _symmetrize(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    return sym.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def _cc_label_propagation(sym: DataFrame, max_iter: int) -> DataFrame:
    labels = (
        sym.select(F.col("src").alias("id"))
        .dropDuplicates(["id"])
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    prev = labels
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
        prev.unpersist()
        prev = new_labels
        labels = new_labels.drop("_changed")
        if n_changed == 0:
            return labels
    raise ConvergenceError(
        f"label propagation did not converge in {max_iter} rounds — "
        "graph deeper than expected; use algorithm='star' (O(log n) rounds)"
    )


def _cc_star_contraction(sym: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star until the edge set is a fixed
    point (every node linked directly to its component minimum).

    large-star(u): every neighbor v > u re-links to m = min(N(u) u {u})
    small-star(u): u and its smaller neighbors all link to the minimum
                   of that set (edges oriented high -> low first)

    Convergence detection: the edge multiset is hashed each round
    (count + sum of xxhash64(src,dst)); two identical consecutive
    fingerprints = fixed point. Deterministic, one scalar per round on
    the driver.
    """
    nodes = sym.select(F.col("src").alias("id")).dropDuplicates(["id"])
    nodes = nodes.localCheckpoint(eager=True)
    # state between rounds: canonical undirected edge set (src > dst)
    edges = sym.filter(F.col("src") > F.col("dst"))
    prev = None
    prev_fp = None
    for _ in range(max_iter):
        # adjacency view (both orientations) — large-star needs every
        # node to see ALL its neighbors, not just the smaller ones
        adj = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        # ---- large-star: every larger neighbor v of u re-links to
        # m = min(N(u) + {u}); each undirected edge is emitted exactly
        # once, from its smaller endpoint's adjacency
        lmin = adj.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("_m")
        )
        stage = (
            adj.filter(F.col("dst") > F.col("src"))
            .join(lmin, "src")
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        # ---- small-star: all large-star outputs point downward, so
        # each u + its (smaller) neighbors re-link to their minimum
        smin = stage.groupBy("src").agg(F.min("dst").alias("_m"))
        relink = (
            stage.join(smin, "src")
            .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        self_link = smin.select("src", F.col("_m").alias("dst"))
        new_edges = (
            relink.unionByName(self_link)
            .select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=True)
        )
        fp_row = new_edges.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: int64 would overflow under ANSI mode
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        fp = (fp_row["n"], fp_row["h"])
        if prev is not None:
            prev.unpersist()
        prev = new_edges
        edges = new_edges
        if fp == prev_fp:
            # fixed point: every edge is (member, component_min)
            labels = edges.select(
                F.col("src").alias("id"), F.col("dst").alias("component")
            )
            roots = nodes.join(
                labels.select("id"), "id", "left_anti"
            ).select("id", F.col("id").alias("component"))
            out = labels.unionByName(roots).localCheckpoint(eager=True)
            prev.unpersist()
            nodes.unpersist()
            return out
        prev_fp = fp
    raise ConvergenceError(
        f"star contraction did not converge in {max_iter} rounds "
        "(expected O(log n)); the input graph is pathological"
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "star",
) -> DataFrame:
    """-> (id, component): component = min node id reachable from id.

    `edges` is an undirected pair list (each pair listed once in
    either orientation); isolated nodes don't appear (callers union
    the full id set afterwards if singleton components matter).

    algorithm: "star" (large-star/small-star, O(log n) rounds — the
    default, safe on any shape) or "label" (min-label propagation,
    O(diameter) rounds — cheaper per round on known-shallow graphs).
    Both raise ConvergenceError instead of returning split components.
    """
    sym = _symmetrize(edges, src_col, dst_col).localCheckpoint(eager=True)
    try:
        if algorithm == "label":
            return _cc_label_propagation(sym, max_iter)
        if algorithm == "star":
            return _cc_star_contraction(sym, max_iter)
    finally:
        sym.unpersist()
    raise ValueError(f"unknown algorithm {algorithm!r} (star|label)")


def dedup_clusters(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    algorithm: str = "star",
) -> DataFrame:
    """-> (component, member_id, is_keeper): one keeper (the minimum
    id) per connected component of the duplicate-pair graph — the
    drop-list action on top of any candidate tier."""
    cc = connected_components(edges, src_col, dst_col, algorithm=algorithm)
    return cc.select(
        F.col("component"),
        F.col("id").alias("member_id"),
        (F.col("id") == F.col("component")).alias("is_keeper"),
    )
