"""Unit tests for the forecast/dispatch layer (SURVEY.md X1-X4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.ml import dispatch as DP
from mysoftware_nocnetintel_spark.ml import forecast as FC
from mysoftware_nocnetintel_spark.plans.queries import q0_flagship_risk
from mysoftware_nocnetintel_spark.sources import load_table


def test_feature_pipeline_shapes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    feats = FC.build_features(ev)
    assert feats.count() == ev.count()
    row = feats.filter(F.col("f_lag1") != 0.0).first()
    assert row is not None  # lags populated past the first event per user


def test_logistic_scores_are_probabilities(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    feats = FC.build_features(ev)
    model = FC.fit_logistic(feats)
    scored = FC.score(model, feats)
    bad = scored.filter(
        (F.col("risk_prob") < 0) | (F.col("risk_prob") > 1)
    ).count()
    assert bad == 0
    a = FC.auc(scored)
    assert 0.0 <= a <= 1.0


def test_dispatch_plan_balanced(spark, sf_dir):
    risk = q0_flagship_risk(spark, sf_dir)
    plan = DP.dispatch_plan(risk, n_clusters=3)
    rows = plan.collect()
    assert len(rows) == risk.count()
    # round-robin within each cluster → team sizes differ by at most 1
    from collections import Counter

    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, Counter())[r.team] += 1
    for counts in by_cluster.values():
        assert max(counts.values()) - min(counts.values()) <= 1
    # report string formatted
    assert rows[0].plan.startswith("Team ")
    # distance cost: each cluster's most urgent entity (all loads 0) goes to
    # the team whose base is nearest to it
    bases = DP._team_bases(list(DP.TEAMS))
    first = {}
    for r in sorted(rows, key=lambda r: r.urgency_rank):
        first.setdefault(r.cluster, r)
    located = {r.user_id: (r.loc_x, r.loc_y) for r in DP.pseudo_locations(risk).collect()}
    for r in first.values():
        x, y = located[r.user_id]
        want = min(
            range(len(bases)),
            key=lambda t: ((x - bases[t][0]) ** 2 + (y - bases[t][1]) ** 2, t),
        )
        assert r.team == DP.TEAMS[want]


def test_dispatch_deterministic(spark, sf_dir):
    risk = q0_flagship_risk(spark, sf_dir)
    a = sorted(map(tuple, DP.dispatch_plan(risk).collect()))
    b = sorted(map(tuple, DP.dispatch_plan(risk).collect()))
    assert a == b


def test_q74_auc_equals_mllib_evaluator(spark, sf_dir):
    """The rank-statistic AUC (q74) must equal MLlib's trapezoidal
    BinaryClassificationEvaluator on the same binned score — the two
    formulations are mathematically identical under tie correction."""
    from mysoftware_nocnetintel_spark.plans.queries_ml import q74_auc

    got = q74_auc(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        (F.floor("value") / 1000.0).alias("risk_prob"),  # monotone in the bin
        F.when(F.col("event_type") == "error", 1.0).otherwise(0.0).alias("label"),
    )
    want = FC.auc(scored)
    assert abs(got["auc"] - want) < 1e-6, (got["auc"], want)


def test_dispatch_capacity_soft_bound(spark, sf_dir):
    """Teams at capacity are skipped while any has headroom; overflow falls
    back to least-loaded (work never dropped)."""
    from collections import Counter

    risk = q0_flagship_risk(spark, sf_dir)
    ranked = DP.rank_urgency(risk)
    located = DP.pseudo_locations(ranked)
    clustered = DP.cluster_locations(located, n_clusters=2)
    out = DP.assign_teams(clustered, capacity=2).collect()
    n_total = len(out)
    assert n_total == risk.count()  # nothing dropped
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster, Counter())[r.team] += 1
    for counts in by_cluster.values():
        n = sum(counts.values())
        if n <= 2 * len(DP.TEAMS):
            assert max(counts.values()) <= 2  # capacity respected
        else:
            assert max(counts.values()) - min(counts.values()) <= 1  # balanced overflow


def test_dispatch_travel_objectives(spark, sf_dir):
    """X3 travel objectives: manhattan and a travel-time matrix are valid
    tie-breaking costs — assignments stay balanced and deterministic, and a
    prohibitive matrix entry steers load-tied work away from that team."""
    risk = q0_flagship_risk(spark, sf_dir)
    clustered = DP.cluster_locations(
        DP.pseudo_locations(DP.rank_urgency(risk)), n_clusters=2
    )
    for travel in (DP.euclidean_sq, DP.manhattan):
        out = DP.assign_teams(clustered, travel=travel).collect()
        assert len(out) == risk.count()
        loads = {}
        for r in out:
            loads.setdefault(r.cluster, []).append(r.team)
        for teams in loads.values():
            from collections import Counter

            c = Counter(teams)
            assert max(c.values()) - min(c.values()) <= 1  # balance bound holds

    # prohibitive travel time for team 0 everywhere: with loads tied, the
    # greedy must prefer teams 1/2 — team 0 only takes every 3rd pick
    grid = 10
    bad = {
        (cx, cy, 0): 1e9 for cx in range(grid) for cy in range(grid)
    }
    out = DP.assign_teams(
        clustered, travel=DP.matrix_travel(bad, grid=grid)
    ).collect()
    per_cluster = {}
    for r in out:
        per_cluster.setdefault(r.cluster, []).append((r.dispatch_order, r.team))
    for picks in per_cluster.values():
        picks.sort()
        # first two picks in every cluster avoid the prohibitive team
        for _, team in picks[:2]:
            assert team != DP.TEAMS[0]
