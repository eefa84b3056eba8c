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

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..blockstore import CheckpointRotation, free_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_rounds: int = 25,
    edge_storage_level: StorageLevel = StorageLevel.DISK_ONLY,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """(node, component) for every node incident to an edge; the
    component id is the smallest node id in the component.

    ``max_rounds`` is a safety rail: pointer jumping converges in
    O(log n) rounds, so 25 covers graphs far beyond any realistic
    corpus (2^25 -diameter chains).  Raises if the rail is hit.

    Checkpoint residency splits by size class like
    :func:`pagerank_exact` (measured rationale there / BENCH.md
    round-13): the symmetrized EDGE list at ``edge_storage_level``
    (default DISK_ONLY — no deserialized unroll spike at 100x, one
    sequential read per round), the node-sized per-round label tables
    at ``storage_level`` (default MEMORY_AND_DISK — serialized +
    evictable from PySpark, keeps round latency at memory speed).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint(
        eager=True, storageLevel=edge_storage_level
    )

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
        .localCheckpoint(eager=True, storageLevel=storage_level)
    )

    # rotation: superseded label checkpoints are freed through a
    # bounded backlog (blockstore.CheckpointRotation — at most 2 live
    # beyond the current round, all drained at exit; see the r13
    # policy note there).  `sym` is read every round and freed before
    # returning: the returned frame reads only the final round's
    # checkpoint.
    # try/finally so error exits (the non-convergence raise, any
    # mid-loop failure) release the support checkpoints too instead of
    # silently reverting to the 30-min periodic-GC behavior (ADVICE
    # r12); on the SUCCESS path the final label checkpoint is what the
    # returned frame reads, so only error exits free prev_ckpt.
    # Superseded label checkpoints rotate through a BOUNDED BACKLOG
    # (not freed per round): the eager unpersist contends with the
    # next round's compute (~9% wall on the 10x pagerank A/B, BENCH.md
    # round-13), so short runs do no mid-loop frees at all while long
    # runs keep at most `backlog` node-sized superseded copies live
    rotation = CheckpointRotation(backlog=2)
    prev_ckpt = labels
    returned = False
    try:
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
                .localCheckpoint(eager=True, storageLevel=storage_level)  # cut lineage every round
            )
            changed = jumped.filter(F.col("label") != F.col("__old")).count()
            rotation.supersede(prev_ckpt)
            prev_ckpt = jumped
            labels = jumped.drop("__old")
            if changed == 0:
                returned = True
                return labels.select("node", F.col("label").alias("component"))
        raise RuntimeError(
            f"connected_components: no convergence in {max_rounds} rounds"
        )
    finally:
        rotation.drain()
        free_checkpoint(sym)
        if not returned:
            free_checkpoint(prev_ckpt)


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


def pagerank_exact(
    edges: DataFrame,
    iters: int = 10,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 1_000_000_000,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
    edge_storage_level: StorageLevel = StorageLevel.DISK_ONLY,
    storage_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    rotation_backlog: int = 2,
) -> DataFrame:
    """PageRank over a directed edge list in INTEGER-EXACT arithmetic
    — partition-independent and bit-identical across reruns, like the
    integer Lloyd's trainer: scores are bigints scaled by ``scale``,
    the damping factor is the rational ``damping_num/damping_den``
    (default 17/20 = 0.85), and every step is

        contrib(u)  = score(u) div outdeg(u)                (SQL div)
        score'(v)   = ((den-num)*scale + num*sum_in(v)) div den

    i.e. exact floor divisions and order-free integer sums — no float
    anywhere, so the result cannot depend on partitioning or
    aggregation order (pinned by test).

    Documented deviations from textbook PageRank, chosen for bounded
    distributed work: dangling-node mass is DROPPED rather than
    redistributed (redistribution needs a global scalar per round;
    rankings of connected regions are unaffected), and the loop runs a
    FIXED iteration count instead of an epsilon test (deterministic
    plan count; pass a bigger ``iters`` for deeper graphs).

    Scale shape: per round ONE edge-sized equi-join (the per-edge
    contribution share, against a node-sized (src, share) table built
    by a node-keyed ranks x outdeg join) and one dst-keyed integer sum
    — shuffles carry two bigints per node/edge, never payloads.
    Lineage is cut by localCheckpoint every ``checkpoint_every``
    rounds (default 3: bounded plan depth without paying a
    materialization job per round — measured 5.1 s -> 3.2 s for 6
    rounds on the 600k-edge bench graph; pass 1 for the
    round-per-round pattern of connected_components).  Superseded rank
    checkpoints are released through a backlog-2
    :class:`~ong_tsdb_spark.blockstore.CheckpointRotation` and a drain
    at the call boundary — NOT per supersession, which measured ~9%
    wall overhead at 10x from async block-removal contention (VERDICT
    r12 #3 A/B, BENCH.md round-13); at most 2 superseded node-sized
    copies are ever live and none survive the call.  Checkpoint
    residency is SPLIT by size class (measured, BENCH.md round-13):
    the EDGE table lives at ``edge_storage_level`` (default DISK_ONLY
    — the deserialized unroll of 60M edges across all tasks at once is
    what OOMed the 16 GiB local JVM on the 100x graph, and the edge
    scan is one sequential read per round), while the node-sized
    tables (nodes / degrees / rank rotations) stay at
    ``storage_level`` (default MEMORY_AND_DISK, which from PySpark is
    SERIALIZED + evictable — compact enough to never unroll-spike, and
    keeping ranks memory-resident is what preserves the small-scale
    latency that full DISK_ONLY cost ~1.3x at sf0.1).  Magnitudes:
    total mass <= n_nodes * scale, so stay under 2^63 / damping_num —
    the defaults allow ~5 * 10^8 nodes; lower ``scale`` for bigger
    graphs.

    Returns (node, pr_scaled bigint, pr double = pr_scaled/scale)."""
    # edge table and outdegrees are read EVERY round — checkpoint both
    # once so the iterations re-join stored partitions instead of
    # re-scanning the input and re-running the degree shuffle per round
    e = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).localCheckpoint(eager=True, storageLevel=edge_storage_level)
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True, storageLevel=storage_level)
    )
    deg = (
        e.groupBy("__s")
        .agg(F.count("*").alias("__outdeg"))
        .withColumnRenamed("__s", "node")
        .localCheckpoint(eager=True, storageLevel=storage_level)
    )
    ranks = nodes.withColumn("score", F.lit(int(scale)).cast("long"))
    num, den = int(damping_num), int(damping_den)
    base = (den - num) * int(scale)
    every = max(1, int(checkpoint_every))
    # superseded rank checkpoints rotate through a bounded backlog
    # (VERDICT r12 #3 A/B, BENCH.md round-13: per-supersession frees
    # cost ~9% wall at 10x via async block-removal contention; the
    # backlog removes mid-loop frees from short runs and bounds long
    # runs at `backlog` node-sized copies; drain() at exit keeps the
    # nothing-outlives-the-call contract; rotation_backlog=0 restores
    # strict per-supersession frees — the measurement tools use it to
    # A/B the policy on the live code path)
    rotation = CheckpointRotation(backlog=rotation_backlog)
    prev_ckpt = None
    try:
        for i in range(iters):
            # per-source share first (node-sized join), THEN the one
            # edge-sized join — the old shape joined deg edge-by-edge
            srcs = ranks.join(deg, on="node").select(
                F.col("node").alias("__s"),
                F.expr("score div __outdeg").alias("__c"),
            )
            incoming = (
                e.join(srcs, on="__s")
                .groupBy("__d")
                .agg(F.sum("__c").alias("__inc"))
                .withColumnRenamed("__d", "node")
            )
            ranks = nodes.join(incoming, on="node", how="left").select(
                "node",
                F.expr(
                    f"cast(({base} + {num} * coalesce(__inc, 0)) div {den} as long)"
                ).alias("score"),
            )
            if (i + 1) % every == 0 or i == iters - 1:
                ranks = ranks.localCheckpoint(eager=True, storageLevel=storage_level)
                if prev_ckpt is not None:
                    rotation.supersede(prev_ckpt)
                prev_ckpt = ranks
    except BaseException:
        # error exit: nothing is returned, so ALL support checkpoints
        # (and the newest rank rotation) can go — without this a
        # mid-loop failure leaks every checkpoint until the periodic
        # GC (ADVICE r12)
        rotation.drain()
        if prev_ckpt is not None:
            free_checkpoint(prev_ckpt)
        free_checkpoint(e)
        free_checkpoint(nodes)
        free_checkpoint(deg)
        raise
    if iters >= 1:
        # the returned frame reads only the final rank checkpoint; the
        # loop-support tables can go (with iters == 0 the result is a
        # view OVER `nodes`, whose blocks must then stay)
        rotation.drain()
        free_checkpoint(e)
        free_checkpoint(nodes)
        free_checkpoint(deg)
    return ranks.select(
        "node",
        F.col("score").cast("bigint").alias("pr_scaled"),
        (F.col("score").cast("double") / F.lit(float(scale))).alias("pr"),
    )
