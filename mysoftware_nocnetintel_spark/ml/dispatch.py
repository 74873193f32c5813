"""Field-engineer dispatch: urgency ranking → location clustering → greedy
team assignment.

Reference parity: the scheduling pipeline — "Ranks urgency, location
clustering", "Optimizes FME routing using heuristic or ML-based dispatch"
(reference README.md:60-63), emitting plans like "Team Alpha, report at
06:30 AM" (README.md:79). SURVEY.md §2.10 X3.

The test schema has no geo coordinates, so entity "locations" are a
deterministic 2-D stand-in derived from the entity id (documented fake —
the mechanism under test is ranking + clustering + per-cluster grouped-map
assignment, which is geometry-agnostic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TEAMS = ("Team Alpha", "Team Bravo", "Team Charlie")


def pseudo_locations(entities: DataFrame, id_col: str = "user_id") -> DataFrame:
    """Deterministic 2-D pseudo-coordinates from the entity id hash."""
    h = F.xxhash64(F.col(id_col).cast("string"))
    return entities.withColumn(
        "loc_x", (F.pmod(h, F.lit(1000)) / 1000.0)
    ).withColumn("loc_y", (F.pmod(F.shiftright(h, 10), F.lit(1000)) / 1000.0))


def rank_urgency(risk: DataFrame, score_col: str = "risk_score") -> DataFrame:
    """W4: global urgency ranking (README.md:61 'Ranks urgency')."""
    w = Window.orderBy(F.col(score_col).desc(), F.col("user_id"))
    return risk.withColumn("urgency_rank", F.row_number().over(w).cast("bigint"))


def cluster_locations(
    located: DataFrame, n_clusters: int = 4, seed: int = 42
) -> DataFrame:
    """README.md:61 'location clustering' — seeded MLlib KMeans on the 2-D
    coordinates; returns the input plus a cluster id."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(
        inputCols=["loc_x", "loc_y"], outputCol="features"
    ).transform(located)
    model = KMeans(k=n_clusters, seed=seed, maxIter=20).fit(assembled)
    return (
        model.transform(assembled)
        .withColumnRenamed("prediction", "cluster")
        .drop("features")
    )


def _team_bases(teams: list[str]) -> list[tuple[float, float]]:
    """Deterministic 2-D base location per team (hash of the team name),
    matching the pseudo-coordinate space of :func:`pseudo_locations`."""
    import hashlib

    bases = []
    for t in teams:
        h = int(hashlib.md5(t.encode()).hexdigest(), 16)
        bases.append(((h % 1000) / 1000.0, ((h >> 10) % 1000) / 1000.0))
    return bases


def euclidean_sq(x: float, y: float, bx: float, by: float) -> float:
    """Default travel cost: squared straight-line distance."""
    return (x - bx) ** 2 + (y - by) ** 2


def manhattan(x: float, y: float, bx: float, by: float) -> float:
    """Grid travel cost: L1 distance — the street-network approximation."""
    return abs(x - bx) + abs(y - by)


def matrix_travel(
    matrix: dict[tuple[int, int, int], float],
    grid: int = 10,
    fallback=euclidean_sq,
):
    """Travel-TIME objective from a precomputed matrix (the OSRM/routing-
    engine deployment shape): cost for team ``t`` at location (x, y) is
    ``matrix[(cell_x, cell_y, t)]`` where the plane is quantized into a
    ``grid``×``grid`` lattice. Missing cells fall back to ``fallback`` —
    a routing matrix is never complete. Returns a travel callable for
    :func:`assign_teams`; the matrix is driver-scale metadata captured by
    the grouped-map closure (broadcast with the task, like codebooks)."""

    def travel(x: float, y: float, bx: float, by: float, team_idx: int) -> float:
        key = (min(int(x * grid), grid - 1), min(int(y * grid), grid - 1), team_idx)
        if key in matrix:
            return matrix[key]
        return fallback(x, y, bx, by)

    return travel


def assign_teams(
    clustered: DataFrame,
    teams: tuple[str, ...] = TEAMS,
    capacity: int | None = None,
    travel=euclidean_sq,
) -> DataFrame:
    """README.md:62 heuristic dispatch: within each cluster, walk entities in
    urgency order and greedily assign each to a LEAST-LOADED team, breaking
    load ties by squared distance to the team's base, then team index —
    lexicographic (load, distance, index) cost. The load-first ordering
    makes the balance bound provable (per-cluster max−min load ≤ 1, asserted
    in tests/test_ml.py) while the distance term routes work to the nearest
    eligible team; fully deterministic. Grouped-map applyInPandas per
    cluster — clusters are the natural parallelism unit; each is small
    after clustering (the top-k risk input is driver-bounded upstream).

    ``capacity`` is a per-team, per-cluster SOFT bound: teams at capacity
    are skipped while any team has headroom; once every team is full the
    overflow falls back to the least-loaded team (work is never dropped —
    the bound shapes assignment, the dispatcher decides what to defer).

    ``travel`` is the tie-breaking cost objective: a callable
    ``(x, y, base_x, base_y) -> float`` (defaults: :func:`euclidean_sq`;
    :func:`manhattan` for street grids) or, for real travel TIMES, the
    closure from :func:`matrix_travel` (callable also receives the team
    index, so matrix lookups can be per-team)."""
    team_list = list(teams)
    bases = _team_bases(team_list)
    travel_takes_team = getattr(travel, "__code__", None) is not None and (
        travel.__code__.co_argcount >= 5
    )

    def deal(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("urgency_rank").reset_index(drop=True)
        loads = [0] * len(team_list)

        def cost(t: int, x: float, y: float) -> float:
            bx, by = bases[t]
            if travel_takes_team:
                return travel(x, y, bx, by, t)
            return travel(x, y, bx, by)

        chosen = []
        for i in range(len(pdf)):
            x, y = float(pdf.loc[i, "loc_x"]), float(pdf.loc[i, "loc_y"])
            pool = range(len(team_list))
            if capacity is not None:
                feasible = [t for t in pool if loads[t] < capacity]
                pool = feasible or range(len(team_list))
            best = min(pool, key=lambda t: (loads[t], cost(t, x, y), t))
            loads[best] += 1
            chosen.append(team_list[best])
        pdf["team"] = chosen
        pdf["dispatch_order"] = range(1, len(pdf) + 1)
        return pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in clustered.schema.fields
    ) + ", team STRING, dispatch_order INT"
    return clustered.groupBy("cluster").applyInPandas(deal, schema)


def dispatch_plan(risk: DataFrame, n_clusters: int = 4) -> DataFrame:
    """Full pipeline: rank → locate → cluster → assign → formatted report
    (README.md:79 style)."""
    ranked = rank_urgency(risk)
    located = pseudo_locations(ranked)
    clustered = cluster_locations(located, n_clusters)
    assigned = assign_teams(clustered)
    return assigned.select(
        "user_id",
        "urgency_rank",
        "cluster",
        "team",
        "dispatch_order",
        F.format_string(
            "%s: dispatch #%d in cluster %d for entity %d",
            F.col("team"),
            F.col("dispatch_order"),
            F.col("cluster"),
            F.col("user_id"),
        ).alias("plan"),
    )
