"""Graph analytics over similarity/dedup pair graphs.

``connected_components`` (operators/dedup.py) answers "which docs are
the same cluster"; PageRank here answers "which docs are the HUBS of
the near-dup graph" -- the doc every near-copy points at is usually
the canonical/boilerplate source, a useful curation survivor-choice
signal.

Scale shape: fixed-iteration power method as plain DataFrame rounds --
each iteration is one edge-keyed join plus one node-keyed aggregation
(both shuffles partial-aggregated), so an iteration costs O(|E|)
shuffle volume and the loop is a constant factor.  No driver-side
state beyond the node count (a single scalar).  Deterministic given
fixed iteration count, so an oracle can replay it as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    n_iter: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank after exactly ``n_iter`` power iterations on the
    UNDIRECTED graph induced by ``edges`` (each pair contributes both
    directions).  rank_0 = 1/N; rank_{t+1}(v) = (1-d)/N +
    d * sum over in-neighbors u of rank_t(u)/outdeg(u).

    Fixed iterations, not convergence detection, on purpose: the
    result is a pure function of the edge set, replayable by an
    external SQL oracle (chained CTEs, one per iteration), and the cost
    is exactly ``n_iter`` join+agg rounds.  Undirected graphs have no
    dangling nodes (every node has outdeg >= 1), so no sink-mass
    correction is needed.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    nodes = und.select(F.col("u").alias("node")).distinct()
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()  # single scalar to the driver; scale-invariant
    if n == 0:  # empty edge set: no nodes, not a 1/0 crash
        return nodes.select(
            "node", F.lit(None).cast("double").alias("rank")
        )

    rank = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            und.join(rank.withColumnRenamed("node", "u"), "u")
            .join(deg, "u")
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        rank = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit((1 - damping) / n)
                + damping * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
    return rank.select("node", F.round("rank", 6).alias("rank")).orderBy("node")
