"""Iterative graph operators on edge DataFrames (X-family, SURVEY.md §2).

Companion to the connected-components operators in :mod:`.dedup` (hash-min
and star-contraction): same design rules — the graph lives as a distributed
edge DataFrame, every iteration is joins + aggregations on the edge key,
and lineage is truncated periodically so 10+ rounds don't compound into a
mega-plan. Reference parity: the reference's root-cause / escalation
analysis over event graphs (reference README.md:60-63) needs a stationary
importance score; PageRank is the standard one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    num_iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration weighted PageRank over an edge DataFrame.

    ``weight`` names a pre-normalized transition weight column (rows from
    one ``src`` should sum to 1); when None, weights default to
    1/out-degree. Dangling mass is dropped (the common simplification:
    ranks then sum to < 1 in graphs with sinks) — documented so the oracle
    can mirror it exactly.

    Scale shape: per iteration one equi-join of the rank table (|V| rows)
    against the edge table on ``src`` and one aggregation on ``dst`` —
    both shuffle on graph keys, never materializing anything driver-side
    except the node COUNT (a scalar, computed once). The edge table is
    cached across iterations; ranks are localCheckpoint'ed every
    ``checkpoint_every`` rounds to truncate lineage, same policy as
    connected components (dedup.connected_components_star).
    """
    e = edges.select(
        F.col(src).alias("__s"),
        F.col(dst).alias("__d"),
        *([F.col(weight).cast("double").alias("__w")] if weight else []),
    )
    if weight is None:
        out_deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
        e = e.join(out_deg, "__s").select(
            "__s", "__d", (F.lit(1.0) / F.col("__deg")).alias("__w")
        )
    e = e.cache()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()  # scalar only; the rank/edge tables stay distributed
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    for i in range(num_iters):
        contrib = (
            ranks.join(e, ranks.node == e.__s)
            .groupBy("__d")
            .agg(F.sum(F.col("r") * F.col("__w")).alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.__d, "left"
        ).select(
            "node",
            (F.lit(base) + damping * F.coalesce("c", F.lit(0.0))).alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < num_iters:
            ranks = ranks.localCheckpoint(eager=False)
    # Materialize the final ranks, then release the iteration caches:
    # without this, every pagerank() call in a long-lived session pins a
    # fresh copy of the edge and node tables in executor storage. The eager
    # checkpoint severs the returned plan's dependency on them, so the
    # unpersist can't force a recompute for the caller's action.
    ranks = ranks.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return ranks
