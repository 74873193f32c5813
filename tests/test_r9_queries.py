"""Round-9 queries — known-value checks on CRAFTED inputs (the registry
parity suite differentials q144 against DuckDB on the driver testdata)."""

from __future__ import annotations

import hashlib
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from mysoftware_nocnetintel_spark.plans.oracles_r9 import ORACLES_R9
from mysoftware_nocnetintel_spark.plans.queries_r9 import q144_span_scrub
from tests.oracle_harness import assert_matches_oracle


def _write_docs(tmp_path, docs):
    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    for t in TABLES:
        if t != "documents":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _l, _t in docs], pa.int64()),
                "text": pa.array([t for _d, _l, t in docs]),
                "lang": pa.array([la for _d, la, _t in docs]),
                "source": pa.array(["src" for _ in docs]),
                "n_chars": pa.array(
                    [len(t) for _d, _l, t in docs], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


_RUN = "w1 w2 w3 w4 w5 w6 w7 w8"  # the shared 8-gram


def test_q144_scrubs_shared_run_keeps_rest(spark, tmp_path):
    """Docs A and B share exactly one 8-token run: both lose those 8
    tokens, the surrounding text survives in order; a doc with no
    cross-document gram is not emitted; a short doc (<8 tokens) can
    never be affected."""
    docs = [
        (1, "en", f"alpha beta {_RUN} gamma"),
        (2, "en", f"{_RUN} delta epsilon"),
        (3, "en", "zeta eta theta iota kappa lam mu nu xi"),
        (4, "en", "tiny doc"),
    ]
    sf = _write_docs(tmp_path, docs)
    got = {
        r["doc_id"]: r.asDict()
        for r in q144_span_scrub(spark, sf).collect()
    }
    assert set(got) == {1, 2}
    assert got[1]["n_removed"] == 8
    clean1 = "alpha beta gamma"
    assert got[1]["clean_len"] == len(clean1)
    assert got[1]["clean_fp"] == hashlib.md5(clean1.encode()).hexdigest()
    assert got[2]["n_removed"] == 8
    clean2 = "delta epsilon"
    assert got[2]["clean_fp"] == hashlib.md5(clean2.encode()).hexdigest()


def test_q144_overlapping_hits_merge_and_full_cover_empties_doc(
    spark, tmp_path
):
    """Overlapping hit windows remove the union of their positions (no
    double counting), and a fully-covered doc scrubs to the empty
    string (md5('') fingerprint) instead of disappearing."""
    nine = "w1 w2 w3 w4 w5 w6 w7 w8 w9"  # 9 tokens, two 8-gram starts
    docs = [
        (1, "en", nine),
        (2, "en", f"pre {nine} post"),
    ]
    sf = _write_docs(tmp_path, docs)
    got = {
        r["doc_id"]: r.asDict()
        for r in q144_span_scrub(spark, sf).collect()
    }
    assert got[1]["n_removed"] == 9
    assert got[1]["clean_len"] == 0
    assert (
        got[1]["clean_fp"] == hashlib.md5(b"").hexdigest()
    )
    assert got[2]["n_removed"] == 9
    assert got[2]["clean_fp"] == hashlib.md5(b"pre post").hexdigest()


def test_q144_crafted_matches_oracle(spark, tmp_path):
    """The crafted edge-case corpus (overlap, full cover, short doc,
    untouched doc) hash-matches the DuckDB twin — the same differential
    the driver runs on the synthetic corpus."""
    docs = [
        (1, "en", f"alpha beta {_RUN} gamma"),
        (2, "fr", f"{_RUN} delta epsilon"),
        (3, "en", "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
        (4, "en", "tiny doc"),
        (5, "de", "lone words that never repeat anywhere at all ok"),
    ]
    sf = _write_docs(tmp_path, docs)
    assert_matches_oracle(
        q144_span_scrub(spark, sf), ORACLES_R9["q144_span_scrub"], sf
    )


# ------------------------------------------------ q145 embedding decontam


def _write_embeddings(tmp_path, vecs):
    """vecs: list of (vec_id, [floats]). Copies other sf0.001 tables so
    the oracle harness can register every view."""
    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    for t in TABLES:
        if t != "embeddings":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v for v, _e in vecs], pa.int64()),
                "embedding": pa.array(
                    [e for _v, e in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0 for _ in vecs], pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    return str(tmp_path)


def test_q145_planted_leak_flagged_orthogonal_clean(spark, tmp_path):
    """A train vector nearly identical to an eval vector (md5 bucket of
    vec_id 4 is the eval split) is flagged with max_cos ≈ 1; orthogonal
    train vectors stay off the remove list."""
    from mysoftware_nocnetintel_spark.plans.queries_r9 import (
        q145_embedding_decontam,
    )

    d = 8
    leak_ev = [1.0] * d  # vec_id 4 → eval bucket 'a'
    leak_tr = [1.0] * (d - 1) + [0.9]  # vec_id 0 → train, cos ≈ 0.9998
    ortho = [1.0 if i == 0 else -1.0 if i == 1 else 0.0 for i in range(d)]
    sf = _write_embeddings(
        tmp_path,
        [(0, leak_tr), (1, ortho), (4, leak_ev)],
    )
    got = {
        r["vec_id"]: r.asDict()
        for r in q145_embedding_decontam(spark, sf).collect()
    }
    assert set(got) == {0}
    assert got[0]["n_eval_hits"] == 1
    assert got[0]["max_cos"] > 0.999


def test_q145_crafted_matches_oracle(spark, tmp_path):
    from mysoftware_nocnetintel_spark.plans.queries_r9 import (
        q145_embedding_decontam,
    )

    d = 8
    vecs = [
        (0, [1.0] * (d - 1) + [0.9]),
        (1, [1.0 if i == 0 else -1.0 if i == 1 else 0.0 for i in range(d)]),
        (2, [0.5] * d),
        (4, [1.0] * d),
        (14, [0.0] * (d - 1) + [2.0]),
    ]
    sf = _write_embeddings(tmp_path, vecs)
    assert_matches_oracle(
        q145_embedding_decontam(spark, sf),
        ORACLES_R9["q145_embedding_decontam"],
        sf,
    )
