"""Connected components over candidate-duplicate pairs.

Pairwise dedup (MinHash-LSH / SimHash / Jaccard — ``operators/dedup.py``)
emits *edges*; a training-data pipeline then needs duplicate **groups**
so it can keep one representative per group.  That grouping is
connected components on the pair graph.

Algorithm: min-label propagation with pointer jumping.  Every node
starts labelled with itself; each round a node takes the minimum label
among itself and its neighbours (one hash-join on node id), then labels
are *shortcut* through themselves (``label <- label[label]``, a self-join
on the label table) so chains collapse geometrically — O(log d) rounds
on diameter-d components instead of O(d).  Duplicate clusters are
near-cliques (diameter 1-2 in practice), so this converges in 2-3
rounds on real corpora while staying safe for adversarial chains.

Scale shape: every round shuffles only the (node, label) table — two
bigints per *distinct document that appears in some pair*, never the
documents themselves — plus the symmetrized edge list on node id.  Both
are equi-joins with key cardinality = node count; no windows, no
single-task funnels.  The driver-side loop holds only a changed-row
COUNT per round (bounded by the O(log n) round count), mirroring the
classic MapReduce CC formulations (Kiveris et al., "Connected
Components in MapReduce and Beyond" — the large-star/small-star family
this is a simplification of).

Reference scope note: the reference engine has no graph operator; this
extends its dedup surface the way its test corpus exercises pair
generation (reference ``tests/`` dedup fixtures), per the
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node incident to an edge; the
    component id is the smallest node id in the component.

    ``max_rounds`` is a safety rail: pointer jumping converges in
    O(log n) rounds, so 25 covers graphs far beyond any realistic
    corpus (2^25 -diameter chains).  Raises if the rail is hit.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    # init labels at min(node, min_neighbor): the groupBy costs the
    # same shuffle as the node-list distinct it replaces but performs
    # round 1's propagation for free — duplicate clusters are
    # near-cliques, so this converges them a full round (two joins +
    # one count job) earlier; the first loop round then verifies
    # stability and pointer jumping starts collapsing 2-hop chains
    # immediately
    labels = (
        sym.groupBy("a")
        .agg(F.min("b").alias("__mn"))
        .select(
            F.col("a").alias("node"),
            F.least(F.col("a"), F.col("__mn")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(max_rounds):
        # pull: min neighbour label per node (one shuffle on node id)
        nb = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nb_label"))
        )
        # the pre-round label rides along as __old so convergence is a
        # filter+count over the checkpointed result — no extra join
        stepped = (
            labels.join(nb, labels.node == nb.a, "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jumping: label <- label[label]; the label table is
        # (nodes x 2 ints), so this self-join is cheap and collapses
        # chains geometrically.
        lut = stepped.select(
            F.col("node").alias("l_node"), F.col("label").alias("l_label")
        )
        jumped = (
            stepped.join(lut, stepped.label == lut.l_node, "left")
            .select(
                "node",
                "__old",
                F.least(
                    F.col("label"), F.coalesce(F.col("l_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # cut lineage every round
        )
        changed = jumped.filter(F.col("label") != F.col("__old")).count()
        labels = jumped.drop("__old")
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")


def duplicate_clusters(
    edges: DataFrame, src: str = "d1", dst: str = "d2"
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every doc in a pair —
    the keep-one-per-cluster view a dedup pipeline consumes.  The size
    join is a broadcast-sized aggregate (clusters <= nodes)."""
    comp = connected_components(edges, src=src, dst=dst)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, on="component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
        )
    )
