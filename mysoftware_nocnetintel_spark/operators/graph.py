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

# Rank-table broadcast gate for the per-iteration join: |V| rows of
# (node, double) ≈ 40 B/row, so 2M nodes ≈ 80 MB — the conventional upper
# bound for a comfortable broadcast. Above this the iteration joins shuffle.
_BROADCAST_NODES = 2_000_000

# Single-task gate: an aggregated edge table at or under this many rows
# (~24 B/row ≈ 12 MB at the bound) iterates inside ONE Arrow task instead
# of a per-iteration join chain — same bounded-smallness argument as the
# IVF centroid collect (similarity.py) and the Bloom bitmap (queries_r4).
_LOCAL_EDGES = 500_000


def _pagerank_single_task(
    e: DataFrame, n: int, num_iters: int, damping: float
) -> DataFrame:
    """All-iterations-in-one-Arrow-batch strategy for small aggregated
    graphs: 1-partition mapInPandas; float64 accumulation matches the
    distributed path's double arithmetic up to summation order (validated
    by the randomized config differential in tests/test_property_r5.py)."""
    base = (1.0 - damping) / n

    def _iterate(it):
        import numpy as np
        import pandas as pd

        chunks = [pdf for pdf in it]
        if not chunks:
            return
        g = pd.concat(chunks, ignore_index=True)
        nodes_arr = pd.unique(
            pd.concat([g["__s"], g["__d"]], ignore_index=True)
        )
        idx = {v: i for i, v in enumerate(nodes_arr)}
        s_i = g["__s"].map(idx).to_numpy()
        d_i = g["__d"].map(idx).to_numpy()
        w = g["__w"].to_numpy(dtype=np.float64)
        r = np.full(len(nodes_arr), 1.0 / n, dtype=np.float64)
        for _ in range(num_iters):
            contrib = np.zeros(len(nodes_arr), dtype=np.float64)
            np.add.at(contrib, d_i, r[s_i] * w)
            has_in = np.zeros(len(nodes_arr), dtype=bool)
            has_in[d_i] = True
            r = np.where(has_in, base + damping * contrib, base)
        yield pd.DataFrame({"node": nodes_arr, "r": r})

    node_type = dict(e.dtypes)["__s"]
    return e.repartition(1).mapInPandas(
        _iterate, f"node {node_type}, r double"
    )


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

    Scale shape — three size-adaptive physical strategies for ONE logical
    algorithm (the analogue of Catalyst picking broadcast vs shuffle join):

    1. ``|E| ≤ _LOCAL_EDGES``: the aggregated edge table fits one task, so
       ALL iterations run inside a single Arrow batch (``mapInPandas`` on a
       1-partition copy). An iteration on a distributed plan costs ~2
       sequential stage barriers of pure scheduling; for a vocabulary-size
       graph (event types, hosts) that floor dwarfs the math. Measured at
       sf0.1 (10-node event-type graph): 2.0 s → ~0.6 s.
    2. small ``|V|`` (≤ ``_BROADCAST_NODES``), big ``|E|``: per-iteration
       join broadcasts the rank table; the edge table never moves.
    3. billion-node: per iteration one equi-join of the rank table against
       the edge table on ``src`` and one aggregation on ``dst`` — both
       shuffle on graph keys, never materializing anything driver-side
       except one two-scalar stats row (|V|, |E| in a single job). Ranks are localCheckpoint'ed every
       ``checkpoint_every`` rounds to truncate lineage, same policy as
       connected components (dedup.connected_components_star).
    """
    e = edges.select(
        F.col(src).alias("__s"),
        F.col(dst).alias("__d"),
        *([F.col(weight).cast("double").alias("__w")] if weight else []),
    )
    # NULL endpoints are dropped DELIBERATELY (round-6 advisor): a null
    # src/dst is not an addressable node — countDistinct already excluded
    # it from |V| while the join/agg keys silently grouped it, so the
    # teleport base and the rank mass disagreed. Now neither sees it.
    e = e.where(F.col("__s").isNotNull() & F.col("__d").isNotNull())
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
    )
    # |V| and |E| in ONE job (each edge explodes to its two endpoints, so
    # edges = rows/2): two separate counts cost two full scheduling waves
    # on a serving statement, and this also materializes the cache
    stats = (
        e.select(F.explode(F.array("__s", "__d")).alias("node"))
        .agg(
            F.countDistinct("node").alias("n"),
            (F.count(F.lit(1)) / 2).cast("long").alias("m"),
        )
        .first()
    )
    n, m = int(stats["n"]), int(stats["m"])
    base = (1.0 - damping) / n
    if m <= _LOCAL_EDGES:
        ranks = _pagerank_single_task(e, n, num_iters, damping)
        e.unpersist()
        return ranks

    # Iteration shape (round-4 rewrite; measured 2.17 s → see bench): the
    # rank table in the loop holds ONLY nodes with in-edges. A node without
    # in-edges has rank exactly `base` after the first update, so the edge
    # join defaults missing sources with coalesce(r, base) instead of
    # re-joining the full node table every round — one join per iteration
    # instead of two. Iteration 1 is closed-form (all ranks are 1/n, no
    # join at all). The full node set is restored once, after the loop.
    #
    # `_BROADCAST_NODES` gates a broadcast hint for the rank side of the
    # per-iteration join: the rank table is ≤ |V| rows, so for small
    # vocabulary graphs (event types, hosts) every iteration's join runs
    # map-side with no exchange on the (much larger) edge table. Above the
    # gate the hint is omitted and the join shuffles on graph keys — the
    # billion-node shape.
    small = n <= _BROADCAST_NODES
    contrib = e.groupBy("__d").agg(
        (F.sum("__w") * F.lit(1.0 / n)).alias("c")
    )
    ranks = contrib.select(
        F.col("__d").alias("node"),
        (F.lit(base) + damping * F.col("c")).alias("r"),
    )
    for i in range(1, num_iters):
        r_side = F.broadcast(ranks) if small else ranks
        contrib = (
            e.join(r_side, e.__s == ranks.node, "left")
            .groupBy("__d")
            .agg(
                F.sum(
                    F.coalesce("r", F.lit(base)) * F.col("__w")
                ).alias("c")
            )
        )
        ranks = contrib.select(
            F.col("__d").alias("node"),
            (F.lit(base) + damping * F.col("c")).alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < num_iters:
            ranks = ranks.localCheckpoint(eager=False)
    ranks = nodes.join(ranks, "node", "left").select(
        "node", F.coalesce("r", F.lit(base)).alias("r")
    )
    # Truncate the final lineage LAZILY, then release the iteration caches:
    # a pinned .cache() of the edge/node tables would otherwise accumulate
    # in executor storage across pagerank() calls in a long-lived session.
    # Non-eager on purpose — an eager checkpoint here would pre-compute the
    # result at BUILD time, which silently turns any caller that reuses
    # built plans (the serving-mode plan cache, bench repeats) into a
    # result-cache read instead of an honest recompute. The cost of the
    # unpersist is one uncached recompute of e inside the caller's
    # first action (their shuffle outputs are still reused across the
    # iteration stages within that job).
    ranks = ranks.localCheckpoint(eager=False)
    e.unpersist()
    return ranks
