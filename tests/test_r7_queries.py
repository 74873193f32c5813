"""Round-7 corpus queries — edge-case differentials on a CRAFTED corpus.

The registry parity suite already differentials q127-q131 against DuckDB
on the driver testdata; this file re-runs the newest three on a corpus
built to hit the guard paths the synthetic data never does: empty text,
1/2/3-token documents (the ``sequence(1, 0)``-is-descending Spark trap in
the 3-gram builder), single-chunk documents, and a pathologically
repetitive document with a known duplicate fraction."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysoftware_nocnetintel_spark.plans.oracles_r7 import ORACLES_R7
from mysoftware_nocnetintel_spark.plans.queries_r7 import (
    q129_bpe_pairs,
    q130_repetition,
    q131_chunk_overlap,
)
from tests.oracle_harness import assert_matches_oracle

_DOCS = [
    # (doc_id, source, lang, text)
    (0, "srcA", "en", ""),                    # empty: 0 tokens, 0 grams
    (1, "srcA", "en", "x"),                   # 1 token (no pairs/grams)
    (2, "srcA", "en", "ab cd"),               # 2 tokens: pairs, no grams
    (3, "srcB", "en", "ab cd ef"),            # exactly one 3-gram
    (4, "srcB", "de", "a a a a a a a a"),     # max repetition: 6 grams, 1 distinct
    (5, "srcB", "de", " ".join(f"t{i % 7}" for i in range(200))),  # 3+ chunks
    (6, "srcA", "de", "ab  cd"),              # double space: empty token dropped
]


@pytest.fixture()
def crafted_dir(tmp_path):
    # the oracle harness registers EVERY table as a view; borrow the
    # sf0.001 parquet for the tables this corpus doesn't redefine
    import shutil

    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    for t in TABLES:
        if t != "documents":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    rows = list(zip(*[(d, s, la, len(t), t) for d, s, la, t in _DOCS]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(rows[0], pa.int64()),
                "source": pa.array(rows[1]),
                "lang": pa.array(rows[2]),
                "n_chars": pa.array(rows[3], pa.int64()),
                "text": pa.array(rows[4]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


import random

import pytest as _pytest


@_pytest.mark.parametrize("seed", [13, 37])
def test_q133_boundary_ties_randomized(spark, tmp_path, seed):
    """Adversarial quartile boundaries: draw per-customer metrics from
    TINY value sets so interpolated percentile boundaries frequently
    land EXACTLY ON repeated data values (the knife-edge the docstring
    claims is parity-robust) — Spark and DuckDB must bucket identically
    for every seed."""
    import shutil

    from mysoftware_nocnetintel_spark.plans.oracles_r7 import ORACLES_R7
    from mysoftware_nocnetintel_spark.plans.queries_r7 import (
        q133_rfm_segments,
    )
    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    rng = random.Random(seed)
    for t in TABLES:
        if t != "orders":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    from datetime import datetime

    n = 400
    days = [
        datetime(1995, rng.randint(1, 9), rng.randint(1, 9))
        for _ in range(4)
    ]
    prices = [round(rng.uniform(10, 50), 2) for _ in range(5)]
    rows = [
        (
            i,
            rng.randint(0, 60),  # skewed custkeys → tied freq values
            "O",
            rng.choice(prices),
            rng.choice(days),
            "1-URGENT",
        )
        for i in range(n)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array([r[2] for r in rows]),
                "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
                "o_orderdate": pa.array(
                    [r[4] for r in rows], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array([r[5] for r in rows]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    assert_matches_oracle(
        q133_rfm_segments(spark, str(tmp_path)),
        ORACLES_R7["q133_rfm_segments"],
        str(tmp_path),
    )


def test_q129_edge_differential(spark, crafted_dir):
    assert_matches_oracle(
        q129_bpe_pairs(spark, crafted_dir),
        ORACLES_R7["q129_bpe_pairs"],
        crafted_dir,
    )


def test_q130_edge_differential_and_known_value(spark, crafted_dir):
    df = q130_repetition(spark, crafted_dir)
    assert_matches_oracle(
        df, ORACLES_R7["q130_repetition"], crafted_dir
    )
    by_lang = {r.lang: r for r in df.collect()}
    # the 200-token doc cycles 7 tokens → 198 grams, 7 distinct →
    # dup_frac 191/198; 'a'×8 → 6 grams, 1 distinct → 5/6; both > 0.3
    assert by_lang["de"].max_dup_frac == round(191 / 198, 6)
    assert by_lang["de"].n_repetitive == 2
    # en docs: 0/1/2-token docs and one single-3-gram doc → all dup_frac 0
    assert by_lang["en"].avg_dup_frac == 0.0


def test_q131_edge_differential_and_known_geometry(spark, crafted_dir):
    df = q131_chunk_overlap(spark, crafted_dir)
    assert_matches_oracle(
        df, ORACLES_R7["q131_chunk_overlap"], crafted_dir
    )
    by_src = {r.source: r for r in df.collect()}
    # srcB: 3-token doc → 1 chunk of 3; 8-token doc → 1 chunk of 8;
    # 200-token doc → starts 1,49,97,145 (193 > 200-16), chunks
    # 64,64,64,56
    assert by_src["srcB"].n_chunks == 6
    assert by_src["srcB"].sum_chunk_tokens == 3 + 8 + 64 + 64 + 64 + 56
    assert by_src["srcB"].n_full == 3
    # srcA: empty doc still yields one (0-token) chunk row — the
    # degenerate-start guard (greatest(n_tok - overlap, 1))
    assert by_src["srcA"].n_chunks == 4


# --- q135 / q136: crafted corpus with hand-computable span geometry ---

_DOCS_135 = [
    # en: docs 10/11 share exactly their first 10 tokens → duplicated
    # 8-grams at s=1..3 in BOTH docs → one merged island [1, 10]
    (10, "mixA", "en", " ".join(f"w{i}" for i in range(20))),
    (11, "mixA", "en",
     " ".join(f"w{i}" for i in range(10))
     + " " + " ".join(f"z{i}" for i in range(10))),
    # de: doc 12 is one shared 8-gram (coverage 8/8), doc 13 contains it
    # plus a tail token (8/9), doc 14 is too short for any gram
    (12, "mixA", "de", " ".join(f"a{i}" for i in range(8))),
    (13, "mixB", "de", " ".join(f"a{i}" for i in range(8)) + " b0"),
    (14, "mixB", "de", " ".join(f"c{i}" for i in range(7))),
    (15, "mixB", "en", ""),  # zero tokens: the try_divide guard
]


@pytest.fixture()
def crafted_dir_135(tmp_path):
    import shutil

    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    for t in TABLES:
        if t != "documents":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    rows = list(zip(*[(d, s, la, len(t), t) for d, s, la, t in _DOCS_135]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(rows[0], pa.int64()),
                "source": pa.array(rows[1]),
                "lang": pa.array(rows[2]),
                "n_chars": pa.array(rows[3], pa.int64()),
                "text": pa.array(rows[4]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_q135_span_merge_known_geometry(spark, crafted_dir_135):
    from mysoftware_nocnetintel_spark.plans.queries_r7 import (
        q135_repeated_spans,
    )

    df = q135_repeated_spans(spark, crafted_dir_135)
    assert_matches_oracle(
        df, ORACLES_R7["q135_repeated_spans"], crafted_dir_135
    )
    by_lang = {r.lang: r for r in df.collect()}
    # en: three duplicated grams (s=1,2,3) merge into ONE [1,10] island
    # per doc — 10 covered tokens each, never 3×8=24 (the merge is the
    # point); the empty doc contributes frac 0
    assert by_lang["en"].covered_tokens == 20
    assert by_lang["en"].avg_cover_frac == round((0.5 + 0.5 + 0.0) / 3, 6)
    assert by_lang["en"].n_heavy_dup == 0
    # de: full-coverage doc (8/8) + contained-prefix doc (8/9) are both
    # heavy; the 7-token doc has no gram at all
    assert by_lang["de"].covered_tokens == 16
    assert by_lang["de"].avg_cover_frac == round((1.0 + 8 / 9 + 0.0) / 3, 6)
    assert by_lang["de"].n_heavy_dup == 2


def test_q136_temperature_math(spark, crafted_dir_135):
    import math

    from mysoftware_nocnetintel_spark.plans.queries_r7 import (
        q136_temperature_mix,
    )

    df = q136_temperature_mix(spark, crafted_dir_135)
    assert_matches_oracle(
        df, ORACLES_R7["q136_temperature_mix"], crafted_dir_135
    )
    by_src = {r.source: r for r in df.collect()}
    # mixA = 20+20+8 = 48 tokens, mixB = 9+7+0 = 16
    a, b = math.sqrt(48.0), math.sqrt(16.0)
    assert by_src["mixA"].n_tokens == 48 and by_src["mixB"].n_tokens == 16
    assert by_src["mixA"].p_natural == 0.75
    assert by_src["mixA"].q_temp == round(a / (a + b), 6)
    assert by_src["mixB"].budget_tokens == round(b / (a + b) * 1_000_000)
    # temperature flattening: the small source is OVERsampled (>1), the
    # big one under
    assert by_src["mixB"].oversample > 1.0 > by_src["mixA"].oversample


# --- q137: one crafted doc per rule, independent-counter semantics ---

_DOCS_137 = [
    # fails wordcount (n=3) AND stopword (0 hits)
    (20, "s", "en", "aa bb cc"),
    # fails meanlen (1.0) AND stopword
    (21, "s", "en", "x y z w v u"),
    # fails alpha only (2/8 alphabetic; 'the it' give the 2 stop hits)
    (22, "s", "en", "11 22 33 44 55 66 the it"),
    # fails stopword only (no exact-token stopword match)
    (23, "s", "en", "alpha beta gamma delta epsilon zeta"),
    # fails symbol only (3/10 tokens contain '#')
    (24, "s", "en", "the cat is on # ## ### mat now too"),
    # passes every rule
    (25, "s", "en", "the quick brown fox jumps over it today"),
    # empty: fails wordcount/meanlen/alpha/stopword; symbol vacuously ok
    (26, "s", "en", ""),
]


@pytest.fixture()
def crafted_dir_137(tmp_path):
    import shutil

    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    for t in TABLES:
        if t != "documents":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    rows = list(zip(*[(d, s, la, len(t), t) for d, s, la, t in _DOCS_137]))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(rows[0], pa.int64()),
                "source": pa.array(rows[1]),
                "lang": pa.array(rows[2]),
                "n_chars": pa.array(rows[3], pa.int64()),
                "text": pa.array(rows[4]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_q137_per_rule_funnel(spark, crafted_dir_137):
    from mysoftware_nocnetintel_spark.plans.queries_r7 import (
        q137_gopher_rules,
    )

    df = q137_gopher_rules(spark, crafted_dir_137)
    assert_matches_oracle(
        df, ORACLES_R7["q137_gopher_rules"], crafted_dir_137
    )
    row = {r.lang: r for r in df.collect()}["en"]
    # counters are per-rule INDEPENDENT (a doc can fail several), the
    # funnel keeps only the all-rules survivor
    assert row.n_docs == 7
    assert row.f_wordcount == 2   # 3-token doc + empty doc
    assert row.f_meanlen == 2     # 1-char-token doc + empty doc
    assert row.f_alpha == 2       # digit doc + empty doc
    assert row.f_stopword == 4    # docs 20/21/23/26
    assert row.f_symbol == 1      # the '#' doc; empty doc is vacuously ok
    assert row.n_kept == 1
    assert row.keep_rate == round(1 / 7, 6)


def test_q138_regression_vs_numpy(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as _pq

    from mysoftware_nocnetintel_spark.plans.queries_r7 import (
        q138_regression_aggs,
    )

    df = q138_regression_aggs(spark, sf_dir)
    assert_matches_oracle(df, ORACLES_R7["q138_regression_aggs"], sf_dir)
    # independent numpy differential for one group: guards against BOTH
    # engines agreeing on a wrong convention (e.g. regr_slope arg order
    # — slope must be d(price)/d(quantity), not the inverse)
    t = _pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"],
    ).to_pandas()
    g = t[(t.l_returnflag == "A") & (t.l_linestatus == "F")]
    slope, intercept = np.polyfit(
        g.l_quantity.astype(float), g.l_extendedprice.astype(float), 1
    )
    row = {
        (r.l_returnflag, r.l_linestatus): r for r in df.collect()
    }[("A", "F")]
    assert row.n_rows == len(g)
    assert abs(row.slope - slope) < 1e-2
    assert abs(row.intercept - intercept) < 1e-2
    c = np.corrcoef(g.l_quantity, g.l_extendedprice)[0, 1]
    assert abs(row.corr_price_qty - c) < 1e-6
    assert abs(row.r2 - c * c) < 1e-6


# --- q139 / q140: crafted events with hand-computable statistics ---


@pytest.fixture()
def crafted_dir_events(tmp_path):
    import shutil

    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    for t in TABLES:
        if t != "events":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    # type "a": values 1..4 (interpolating percentiles are exact
    # quarters); ids alternate parity so the two PSI halves see the SAME
    # distribution → PSI == 0 by symmetry of the smoothed formula.
    # type "b": even ids (baseline) at the bottom bin, odd ids (current)
    # at the top bin → maximally drifted.
    rows = []
    for i, v in enumerate([1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0] * 2):
        rows.append((i, "a", v))
    for i in range(16, 32):
        rows.append((i, "b", 1.0 if i % 2 == 0 else 4.0))
    import datetime

    ts = [datetime.datetime(2026, 1, 1, 0, 0, i % 60) for i in range(len(rows))]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([r[0] % 5 for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def test_q139_interpolation_known_values(spark, crafted_dir_events):
    from mysoftware_nocnetintel_spark.plans.queries_r7 import (
        q139_exact_percentiles,
    )

    df = q139_exact_percentiles(spark, crafted_dir_events)
    assert_matches_oracle(
        df, ORACLES_R7["q139_exact_percentiles"], crafted_dir_events
    )
    a = {r.event_type: r for r in df.collect()}["a"]
    # 16 values of {1,2,3,4}×4: PERCENTILE_CONT interpolates between
    # order statistics — p25 index = 0.25·15 = 3.75 → 1 + 0.75·(2−1)
    assert a.n_events == 16
    assert a.p25 == 1.75
    assert a.p50 == 2.5
    assert a.p75 == 3.25
    assert a.p90 == 4.0  # 0.9·15 = 13.5 lands between two 4.0s


def test_q140_psi_extremes(spark, crafted_dir_events):
    import math

    from mysoftware_nocnetintel_spark.plans.queries_r7 import (
        q140_psi_drift,
    )

    df = q140_psi_drift(spark, crafted_dir_events)
    assert_matches_oracle(
        df, ORACLES_R7["q140_psi_drift"], crafted_dir_events
    )
    by = {r.event_type: r for r in df.collect()}
    # identical halves → every bin count matches → PSI exactly 0
    assert by["a"].psi == 0.0
    assert by["a"].n_baseline == 8 and by["a"].n_current == 8
    # fully separated halves: global bins over [1,4] put baseline (all
    # 1.0) in bin 0 and current (all 4.0) in bin 9; smoothed
    # p=(8+1)/18 vs q=1/18 in bin 0 (mirrored in bin 9), 8 empty bins
    # contribute 0 → PSI = 2·(8/18)·ln(9)
    want = round(2 * (8 / 18) * math.log(9.0), 6)
    assert by["b"].psi == want
    assert by["b"].psi > 0.2  # "significant shift" per the scorecard rule
