"""Round-8 queries — known-value checks on CRAFTED inputs plus the same
edge-case differential pattern as the r7 suite (the registry parity suite
already differentials q141-q143 against DuckDB on the driver testdata)."""

from __future__ import annotations

import hashlib
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mysoftware_nocnetintel_spark.plans.oracles_r8 import ORACLES_R8
from mysoftware_nocnetintel_spark.plans.queries_r8 import (
    q141_doc_lm_score,
    q142_embedding_cohesion,
    q143_snapshot_diff,
)
from tests.oracle_harness import assert_matches_oracle


def _bucket(doc_id: int) -> str:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[:2]


def _ids_with(pred, n, start=0):
    out = []
    i = start
    while len(out) < n:
        if pred(_bucket(i)):
            out.append(i)
        i += 1
    return out


def _write_docs(tmp_path, docs):
    """docs: list of (doc_id, lang, text). Copies the other sf0.001 tables
    so the oracle harness can register every view."""
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


def test_q141_unseen_bigrams_get_smoothed_floor(spark, tmp_path):
    """A held-out doc made ENTIRELY of out-of-vocabulary tokens scores the
    add-one floor: every bigram maps to (<unk>, <unk>), unseen in train,
    so nll = -ln(1 / (0 + V)) = ln(501) with V = 501 — and the edge
    differential holds (empty/1-token docs yield no bigrams)."""
    import math

    train_ids = _ids_with(lambda b: b < "cd", 3)
    held_ids = _ids_with(lambda b: b >= "cd", 2)
    docs = [(i, "en", "the cat sat on the mat") for i in train_ids]
    docs.append((held_ids[0], "en", "zzq zzw zzr zzq"))  # all OOV
    docs.append((held_ids[1], "en", "solo"))  # 1 token: no bigrams
    sf = _write_docs(tmp_path, docs)
    got = {r.doc_id: r for r in q141_doc_lm_score(spark, sf).collect()}
    assert set(got) == {held_ids[0]}  # the 1-token doc produces no row
    assert got[held_ids[0]].n_bigrams == 3
    assert got[held_ids[0]].avg_nll == pytest.approx(
        round(math.log(501), 6), abs=1e-6
    )
    assert_matches_oracle(
        q141_doc_lm_score(spark, sf), ORACLES_R8["q141_doc_lm_score"], sf
    )


def test_q142_cohesion_known_geometry(spark, tmp_path):
    """label 0: identical vectors -> cohesion exactly 1; label 1: two
    orthogonal unit vectors -> each at cos 1/sqrt(2) to the centroid."""
    import math

    from mysoftware_nocnetintel_spark.sources.registry import TABLES

    for t in TABLES:
        if t != "embeddings":
            shutil.copy(
                f"/root/testdata/sf0.001/{t}.parquet",
                str(tmp_path / f"{t}.parquet"),
            )
    vecs = [
        (0, [1.0, 2.0, 2.0], 0),
        (1, [1.0, 2.0, 2.0], 0),
        (2, [1.0, 0.0, 0.0], 1),
        (3, [0.0, 1.0, 0.0], 1),
    ]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([v for v, _e, _l in vecs], pa.int64()),
                "embedding": pa.array(
                    [e for _v, e, _l in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([l for _v, _e, l in vecs], pa.int64()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    sf = str(tmp_path)
    got = {r.label: r for r in q142_embedding_cohesion(spark, sf).collect()}
    assert got[0].n_vecs == 2
    assert got[0].avg_cos == pytest.approx(1.0, abs=1e-6)
    assert got[0].centroid_norm == pytest.approx(3.0, abs=1e-6)
    assert got[1].avg_cos == pytest.approx(
        round(1 / math.sqrt(2), 6), abs=1e-6
    )
    assert got[1].min_cos == got[1].avg_cos
    assert got[1].centroid_norm == pytest.approx(
        round(math.sqrt(0.5), 6), abs=1e-6
    )
    assert_matches_oracle(
        q142_embedding_cohesion(spark, sf),
        ORACLES_R8["q142_embedding_cohesion"],
        sf,
    )


def test_q143_statuses_exact(spark, tmp_path):
    """One doc per diff class, ids picked by their md5 bucket so each
    lands in exactly the intended snapshot slice."""
    removed = _ids_with(lambda b: b < "08", 1)[0]
    added = _ids_with(lambda b: b >= "f0", 1)[0]
    changed = _ids_with(lambda b: "40" <= b < "48", 1)[0]
    unchanged = _ids_with(lambda b: "50" <= b < "f0", 1)[0]
    docs = [
        (removed, "en", "old only doc"),
        (added, "en", "new only doc"),
        (changed, "en", "will be rewritten"),
        (unchanged, "en", "stable doc"),
    ]
    sf = _write_docs(tmp_path, docs)
    got = {
        (r.lang, r.status): (r.n_docs, r.new_chars)
        for r in q143_snapshot_diff(spark, sf).collect()
    }
    assert got == {
        ("en", "added"): (1, len("new only doc")),
        ("en", "removed"): (1, 0),
        ("en", "changed"): (1, len("will be rewritten")),
        ("en", "unchanged"): (1, len("stable doc")),
    }
    assert_matches_oracle(
        q143_snapshot_diff(spark, sf), ORACLES_R8["q143_snapshot_diff"], sf
    )


def test_q143_palindromic_change_is_detected_as_unchanged(spark, tmp_path):
    """reverse(text) == text for palindromes — the diff keys on CONTENT
    fingerprints, so a rewrite that produces identical bytes is
    'unchanged' (documents the fingerprint contract)."""
    changed = _ids_with(lambda b: "40" <= b < "48", 1)[0]
    sf = _write_docs(tmp_path, [(changed, "en", "aba")])
    got = {r.status for r in q143_snapshot_diff(spark, sf).collect()}
    assert got == {"unchanged"}
