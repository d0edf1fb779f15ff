"""Duplicate-cluster resolution: near-dup PAIRS -> connected components.

Every dedup stack in this package (exact, minhash, simhash, jaccard,
embedding-LSH) emits candidate PAIRS; an actual training-data pipeline must
then pick ONE representative per duplicate *cluster* (pairs are transitive:
A~B, B~C means A,B,C are one group). This module closes that gap with
min-label propagation over the pair graph:

* every node starts labeled with its own id;
* each round, a node takes the min of its label and its neighbors' labels
  (one shuffle per round: edges join labels, groupBy dst);
* fixpoint = every node carries the min id of its component — the cluster
  representative (the same keep-min-id convention as ``docs_exact_dedup``).

Convergence: label propagation needs O(diameter) rounds. Near-dup clusters
are dense (near-cliques — members pairwise similar), so the diameter is
1-2 and the loop exits after 2-3 rounds. When ``max_iter`` rounds don't
reach a fixpoint (adversarial long-path graphs), the implementation
switches to the alternating large-star/small-star contraction of Kiveris
et al., "Connected Components in MapReduce and Beyond" (SoCC'14), which
converges in O(log^2 n) rounds using the same join+min-agg per-round
primitive — so high-diameter graphs resolve instead of erroring, and the
common dense case still pays only the cheap 2-3 propagation rounds.

Each round its label frame is ``localCheckpoint``-ed: persistence alone is
NOT enough for an iterative DataFrame loop — the logical plan still nests
one level per round and the planner itself blows up after ~15 rounds
(observed: OOM inside plan-tree stringification). Checkpointing truncates
lineage to the materialized result, keeping every round's plan flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_contraction(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Kiveris et al. SoCC'14 alternating large-star/small-star contraction.

    Input: symmetric distinct edge set ``(src, dst)``. Output: a forest of
    stars as directed edges ``(u, v)`` with ``u > v`` where every non-root
    node points at its component's minimum id. O(log^2 n) rounds; each
    round is two groupBy-min + join passes — the same shuffle primitive as
    the propagation loop, so the cost model is identical per round.

    * large-star (on the symmetric view): every node u computes
      m = min(neighbors + self) and re-points each STRICTLY LARGER
      neighbor v at m — halves long tails without breaking connectivity;
    * small-star (on the larger->smaller orientation): u re-points all its
      (smaller) neighbors and itself at its minimum neighbor.
    """
    cur = (
        edges.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        sym = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
        )
        large = (
            sym.join(lmins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.greatest("v", "m").alias("u"), F.least("v", "m").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .unionByName(smins.select(F.col("u").alias("a"), F.col("m").alias("b")))
            .select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        stable = (
            small.count() == cur.count()
            and small.exceptAll(cur).limit(1).count() == 0
        )
        cur = small
        if stable:
            return cur
    raise RuntimeError(
        f"star contraction did not converge in {max_rounds} rounds "
        "(theoretical bound is O(log^2 n) — this indicates a bug, not data)"
    )


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 15,
) -> DataFrame:
    """-> (id_col, cluster_id): min node id of each connected component.

    ``nodes``: one row per entity (singletons keep their own id as
    cluster_id). ``pairs``: undirected edges.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nlabel"))
        )
        # r6: the changed flag is computed inside the same projection (a
        # label only ever decreases, so changed == nlabel < label) and
        # counted off the checkpointed frame — the former convergence
        # check re-joined the old and new label frames every round, one
        # full extra exchange per iteration for a boolean.
        new_labels = (
            labels.join(neigh, labels.node == neigh.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
                (
                    F.col("nlabel").isNotNull()
                    & (F.col("nlabel") < F.col("label"))
                )
                .cast("int")
                .alias("__chg"),
            )
            # lazy: the ``changed`` aggregate right below is the round's
            # one job and materializes the checkpoint as it runs — eager
            # here would spend a second job per round on the same rows
            .localCheckpoint(eager=False)  # truncate lineage every round
        )
        changed = new_labels.agg(F.sum("__chg")).collect()[0][0] or 0
        labels = new_labels.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # High-diameter graph: propagation would need O(diameter) rounds.
        # Switch to star contraction (O(log^2 n)) on the original edges.
        stars = _star_contraction(edges)
        roots = stars.groupBy("u").agg(F.min("v").alias("slabel"))
        labels = (
            nodes.select(F.col(id_col).alias("node"))
            .join(roots.withColumnRenamed("u", "node"), "node", "left")
            .select(
                "node",
                F.coalesce(F.col("slabel"), F.col("node")).alias("label"),
            )
        )
    edges.unpersist()
    out = labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )
    return out


def cluster_representatives(components: DataFrame) -> DataFrame:
    """-> (cluster_id, representative, size): the keep-one side of dedup."""
    return components.groupBy("cluster_id").agg(
        F.min(components.columns[0]).alias("representative"),
        F.count(F.lit(1)).alias("size"),
    )
