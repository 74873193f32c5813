"""q126 edit-distance near-dup: band-boundary recall + candidate dedup.

The (lang, length-band) blocking joins on buckets {band, band+1} per doc,
so pairs straddling a 50-char band boundary (e.g. 49 vs 51 chars) are
still compared — an equality-only band join silently never compares them
(the round-4 verdict's recall gap). Same-band pairs share two buckets and
must surface exactly ONCE. Verified against DuckDB running the q126
oracle SQL on the same fixture."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from mysoftware_nocnetintel_spark.plans.oracles_r6 import ORACLES_R6
from mysoftware_nocnetintel_spark.plans.queries_r6 import (
    q126_edit_distance_pairs,
)


def _mk_docs(tmp_path):
    rows = [
        # boundary pair: 49 vs 51 chars → bands 0 and 1 (adjacent);
        # identical 40-char prefixes → dist 0. The old equality-band
        # join NEVER compared these two.
        (1, "a" * 49, "en", "web"),
        (2, "a" * 40 + "b" * 11, "en", "web"),
        # same-band pair (both band 1): must appear exactly once despite
        # sharing BOTH buckets {1, 2}
        (3, "c" * 60, "en", "web"),
        (4, "c" * 40 + "d" * 21, "en", "web"),
        # ≥2 bands away (band 3) with a near-identical prefix: by the
        # operator's blocking contract it is never compared to doc 1
        (5, "a" * 150, "en", "web"),
        # different language: never joins with the en docs
        (6, "a" * 49, "de", "web"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": [r[1] for r in rows],
            "lang": [r[2] for r in rows],
            "source": [r[3] for r in rows],
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_band_boundary_pair_found_and_deduped(spark, tmp_path):
    sf_dir = _mk_docs(tmp_path)
    got = {
        (r.lang, r.id_a, r.id_b, r.dist)
        for r in q126_edit_distance_pairs(spark, sf_dir).collect()
    }
    assert ("en", 1, 2, 0) in got, "49/51-char boundary pair missed"
    assert ("en", 3, 4, 0) in got
    # exactly one row per pair (the doubled buckets are deduplicated)
    assert len(got) == len(
        {(lang, a, b) for lang, a, b, _d in got}
    )
    # blocking contract: ≥2 bands apart is never compared
    assert not any(a == 1 and b == 5 for _l, a, b, _d in got)
    # cross-language never joins
    assert not any(6 in (a, b) for _l, a, b, _d in got)


def test_q126_matches_oracle_on_boundary_fixture(spark, tmp_path):
    sf_dir = _mk_docs(tmp_path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = con.execute(ORACLES_R6["q126_edit_distance_pairs"]).fetchall()
    con.close()
    got = [
        (r.lang, r.id_a, r.id_b, r.dist)
        for r in q126_edit_distance_pairs(spark, sf_dir).collect()
    ]
    assert got == [tuple(w) for w in want]
