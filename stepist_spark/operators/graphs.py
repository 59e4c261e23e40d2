"""Graph centrality over an edge list — fixed-iteration PageRank, the
web-graph quality signal a Common-Crawl-style curation pipeline ranks
hosts/documents with (CCNet and its descendants gate crawl quality on
link-graph centrality; Page et al. 1999 is the public algorithm).

Spark-first shape: each iteration is two shuffles — (1) join current
ranks onto the out-edge list keyed by src and aggregate per-edge
contributions by dst, (2) left-join the contribution table back onto
the node set. The edge list (with its out-degree pre-attached) is
checkpointed ONCE and reused every round; the per-iteration state is
one (node, rank) row per vertex — linear, and tiny next to the edges.

Portability (the oracle contract): all arithmetic is integer
fixed-point — ranks are bigints scaled by ``scale``, per-edge
contributions use floor division (``rank DIV outdeg``), and the damped
update is ``(den-num)*scale//den + num*contrib//den``. Summing bigints
is order-free, so Spark and DuckDB (recursive CTE) agree bit-for-bit;
float PageRank would diverge across engines in the last ulps.

Semantics notes:
- multigraph edges count once per row (dedupe upstream if unwanted);
- dangling nodes (no out-edges) leak their mass — the classic
  "lost mass" variant; every node still receives the (1-d) base;
- overflow bound (Spark 4 ANSI errors instead of wrapping): one node's
  damped in-flow is at most num * |V| * scale, so keep
  |V| * scale < 2**63 / num — at the default scale=1e9 that is
  ~1e8 vertices; drop ``scale`` to 1e6 for billion-node graphs.

Reference parity: the reference has no graph operators (SURVEY.md §2.2
'absent'); this is a BASELINE.json LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**9,
    prepartition: int | None = None,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    Returns ``node, rank`` (one row per distinct vertex; ``rank`` is a
    bigint scaled by ``scale`` — every node starts at ``scale`` and
    ranks stay comparable across engines because the update is pure
    integer arithmetic).
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    base = (damping_den - damping_num) * scale // damping_den

    # materialize the edge list ONCE — the upstream plan (often a join
    # pipeline) must not re-execute per iteration
    e = edges.select(
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    ).localCheckpoint(eager=True)

    # `prepartition=N` hash-partitions the two reused frames by their
    # join keys ONCE (N = executor-core count on a real cluster): ranks
    # (re)shuffle to the matching layout each round, but the big edge
    # table and the node set never move again — per iteration the only
    # full shuffle is the contribution aggregation. Left unset, AQE
    # plans each round independently, which measures faster on small
    # graphs where the pinned exchange's fixed cost dominates.
    nodes = (
        e.select("src")
        .unionByName(e.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # out-degree rides along with each edge so the per-iteration join
    # touches exactly one big table
    edeg = e.join(deg, "src")
    if prepartition:
        nodes = nodes.repartition(prepartition, "node")
        edeg = edeg.repartition(prepartition, "src")
    nodes = nodes.localCheckpoint(eager=False)
    edeg = edeg.localCheckpoint(eager=False)

    ranks = nodes.withColumn("rank", F.lit(scale).cast("bigint"))
    for i in range(iterations):
        contrib = (
            edeg.join(ranks, edeg["src"] == ranks["node"])
            .select("dst", F.expr("rank DIV outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damping_num} * coalesce(contrib, CAST(0 AS BIGINT)))"
                    f" DIV {damping_den}"
                )
            ).cast("bigint").alias("rank"),
        )
        # truncate lineage every few rounds: iterative joins otherwise
        # stack a plan that grows per round and re-executes on failure
        # (same discipline as operators/clusters.py). Not every round —
        # each materialized checkpoint is one whole job, and a 3-deep
        # join plan is still cheap for Catalyst (measured 4.3s -> 2.6s
        # for 5 iterations at sf0.1 moving from every-1 to every-3).
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def in_degrees(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """``node, in_deg`` for every vertex (zero-filled for sources that
    are never a destination) — the cheap companion signal to pagerank."""
    e = edges.select(
        F.col(src_col).cast("bigint").alias("src"),
        F.col(dst_col).cast("bigint").alias("dst"),
    )
    nodes = (
        e.select("src")
        .unionByName(e.select(F.col("dst").alias("src")))
        .distinct()
        .select(F.col("src").alias("node"))
    )
    ind = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return nodes.join(ind, "node", "left").select(
        "node", F.coalesce("in_deg", F.lit(0).cast("bigint")).alias("in_deg")
    )
