"""Edge-case units for the round-5 operators (decontamination grams,
packing bins, containment, Count-Min guarantees, sampling determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mysoftware_nocnetintel_spark.operators.dedup import (
    containment_pairs,
    shingle_rows,
)
from mysoftware_nocnetintel_spark.plans import QUERIES


def test_shingle_rows_short_docs_yield_nothing(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g"), (3, ""), (4, "x")],
        "doc_id bigint, text string",
    )
    got = shingle_rows(df, "doc_id", "text", 8).collect()
    # only doc 1 has >= 8 tokens: exactly one 8-gram
    assert len(got) == 1
    assert got[0].doc == 1
    assert got[0].s == "a b c d e f g h"


def test_containment_detects_subdocument(spark):
    sub = "alpha beta gamma delta epsilon zeta"
    big = sub + " eta theta iota kappa " + "x y z " * 20
    df = spark.createDataFrame(
        [(1, sub), (2, big), (3, "totally different words here entirely")],
        "doc_id bigint, text string",
    )
    rows = {
        (r.id_a, r.id_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in containment_pairs(
            df, "doc_id", "text", shingle_k=3, threshold=0.8
        ).collect()
    }
    assert (1, 2) in rows
    a_in_b, b_in_a = rows[(1, 2)]
    assert a_in_b == 1.0  # every shingle of the sub-document is in the big one
    assert b_in_a < 0.8   # but not vice versa
    assert (1, 3) not in rows and (2, 3) not in rows


def test_containment_identical_docs(spark):
    t = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id bigint, text string"
    )
    r = containment_pairs(df, "doc_id", "text").collect()
    assert len(r) == 1
    assert r[0].cont_a_in_b == 1.0 and r[0].cont_b_in_a == 1.0


def test_countmin_never_underestimates(spark, sf_dir):
    rows = QUERIES["q113_countmin"](spark, sf_dir).collect()
    assert rows, "top-20 must be non-empty"
    for r in rows:
        assert r.est_n >= r.exact_n, (r.token, r.est_n, r.exact_n)
        assert r.overestimate == r.est_n - r.exact_n


def test_packing_bins_cover_all_tokens(spark, sf_dir):
    from mysoftware_nocnetintel_spark.plans.queries_r5 import (
        q108_sequence_packing,
    )

    for cap in (64, 2048):
        for r in q108_sequence_packing(spark, sf_dir, context_len=cap).collect():
            # bins must cover the token stream: total fits in n_bins*cap,
            # and dropping one bin would not
            assert r.total_tokens <= r.n_bins * cap
            assert r.total_tokens > (r.n_bins - 1) * cap
            assert 0 < r.fill_ratio <= 1.0
            assert 0 <= r.n_straddling < r.n_docs


def test_weighted_sample_deterministic(spark, sf_dir):
    a = [tuple(r) for r in QUERIES["q111_weighted_sample"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["q111_weighted_sample"](spark, sf_dir).collect()]
    assert a == b
    assert len(a) == 50


def test_decontamination_rates_bounded(spark, sf_dir):
    for r in QUERIES["q107_decontamination"](spark, sf_dir).collect():
        assert 0 <= r.n_contaminated <= r.n_train_docs
        assert 0.0 <= r.contamination_rate <= 1.0
        if r.n_contaminated == 0:
            assert r.max_shared_ngrams == 0 and r.total_shared_ngrams == 0
        else:
            assert r.max_shared_ngrams >= 1
            assert r.total_shared_ngrams >= r.n_contaminated


def test_pagerank_self_loop_absorbs(spark):
    from mysoftware_nocnetintel_spark.operators.graph import pagerank

    # a -> a (self loop), b -> a: a keeps its mass plus b's contribution
    edges = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "src string, dst string"
    )
    got = {r.node: r.r for r in pagerank(edges, num_iters=15).collect()}
    assert got["a"] > got["b"]
    assert got["b"] == pytest.approx(0.15 / 2, rel=1e-9)  # no in-edges


def test_source_overlap_symmetric_bounds(spark, sf_dir):
    for r in QUERIES["q119_source_overlap"](spark, sf_dir).collect():
        assert 0.0 <= r.vocab_jaccard <= 1.0
        assert r.src_a < r.src_b


def test_novelty_first_batch_is_all_new(spark, sf_dir):
    rows = QUERIES["q120_ngram_novelty"](spark, sf_dir).collect()
    assert rows[0].novelty_rate == 1.0  # min source sees only new grams
    assert all(0.0 < r.novelty_rate <= 1.0 for r in rows)
