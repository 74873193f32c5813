"""Round-10 gate, round-11 narrowing: a v3 table is no longer refused
wholesale — deletion vectors read natively (tests/test_iceberg_v3_dv.py)
— but every v3 feature that would change row-level results if ignored
(row lineage, default values, new types) still FAILS FAST, and v4 is
refused outright. docs/iceberg_v3_scope.md tracks the intake.
"""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources.iceberg import write_iceberg_append
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def test_v3_gate_is_per_feature_not_wholesale(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg_append(
        spark.createDataFrame([(1, "a")], "id bigint, val string"), root
    )
    assert read_iceberg_snapshot(spark, root).count() == 1  # v2 reads
    meta_dir = os.path.join(root, "metadata")
    versions = sorted(
        p for p in os.listdir(meta_dir) if p.endswith(".metadata.json")
    )
    with open(os.path.join(meta_dir, versions[-1])) as fh:
        meta = json.load(fh)
    v = int(versions[-1][1:].split(".")[0])

    def _bump(m):
        nonlocal v
        v += 1
        with open(os.path.join(meta_dir, f"v{v}.metadata.json"), "w") as fh:
            json.dump(m, fh)

    # plain v3 (nothing beyond what this reader handles) READS
    _bump(dict(meta, **{"format-version": 3}))
    assert read_iceberg_snapshot(spark, root).count() == 1

    # a lineage-bearing v3 table is refused loudly, not misread
    _bump(dict(meta, **{"format-version": 3, "next-row-id": 5}))
    with pytest.raises(NotImplementedError, match="row lineage"):
        read_iceberg_snapshot(spark, root).count()

    # v4 (unknown future) is refused outright
    _bump(dict(meta, **{"format-version": 4}))
    with pytest.raises(NotImplementedError, match="format-version 4"):
        read_iceberg_snapshot(spark, root).count()
