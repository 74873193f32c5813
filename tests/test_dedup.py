"""Unit tests for the dedup operator tiers (SURVEY.md U3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.functions.text import word_shingles
from mysoftware_nocnetintel_spark.operators import dedup as DD
from mysoftware_nocnetintel_spark.sources import load_table


def test_word_shingles_short_doc_guard(spark):
    df = spark.createDataFrame(
        [("a b",), ("one two three four",), ("",)], ["text"]
    ).select(word_shingles("text", 3).alias("sh"))
    rows = [r.sh for r in df.collect()]
    assert rows[0] == []  # fewer tokens than k → empty, not garbage
    assert rows[1] == ["one two three", "two three four"]
    assert rows[2] == []


def test_exact_dedup_and_groups(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["id", "t"]
    )
    assert DD.exact_dedup(df, ["t"]).count() == 2
    groups = DD.dup_group_stats(df, F.col("t"), "id").collect()
    assert len(groups) == 1
    assert groups[0].member_ids == [1, 2]


def test_simhash_identical_and_near(spark):
    df = spark.createDataFrame(
        [
            (1, "spark join filter window group sort"),
            (2, "spark join filter window group sort"),  # identical
            (3, "spark join filter window group merge"),  # 1 token off
            (4, "completely different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    sig = df.select("doc_id", DD.simhash64("text").alias("s")).collect()
    sigs = {r.doc_id: r.s for r in sig}
    assert sigs[1] == sigs[2]
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in DD.simhash_near_dup_pairs(df, "doc_id", "text", 16).collect()
    }
    assert pairs.get((1, 2)) == 0
    if (1, 3) in pairs:
        assert pairs[(1, 3)] > 0


def test_minhash_recall_vs_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in DD.ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.7
        ).collect()
    }
    mh = {
        (r.id_a, r.id_b)
        for r in DD.minhash_near_dup_pairs(
            docs, "doc_id", "text", threshold=0.7, num_hashes=32, bands=8
        ).collect()
    }
    # verified-minhash pairs are exactly the exact pairs found among LSH
    # candidates → subset of exact; high-J pairs should essentially all land
    assert mh <= exact
    if exact:
        assert len(mh) >= 0.8 * len(exact)


def test_lsh_candidates_are_pairs_not_reflexive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    cands = DD.lsh_candidate_pairs(docs, "doc_id", "text").collect()
    for r in cands:
        assert r.id_a < r.id_b


@pytest.mark.parametrize("local_gate", [500_000, 0], ids=["single-task", "distributed"])
def test_star_contraction_equals_hashmin(spark, monkeypatch, local_gate):
    """connected_components_star must produce the identical clustering as
    hash-min label propagation on arbitrary graphs — exercised on seeded
    random graphs AND a 400-node chain (the diameter case star contraction
    exists for: hash-min would need ~400 rounds there and is capped, so the
    chain is checked against the closed-form answer instead). Both the
    single-task union-find gate and the distributed iteration paths are
    driven (gate forced via _LOCAL_EDGES_CC)."""
    import random

    from mysoftware_nocnetintel_spark.operators import dedup as DDm
    from mysoftware_nocnetintel_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    monkeypatch.setattr(DDm, "_LOCAL_EDGES_CC", local_gate)

    rng = random.Random(1234)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["src", "dst"])
        want = {
            (r.node, r.component) for r in connected_components(df).collect()
        }
        got = {
            (r.node, r.component)
            for r in connected_components_star(df).collect()
        }
        assert got == want, f"trial {trial}"

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(400)], ["src", "dst"]
    )
    got = {
        (r.node, r.component)
        for r in connected_components_star(chain, max_iter=20).collect()
    }
    assert got == {(i, 0) for i in range(401)}
