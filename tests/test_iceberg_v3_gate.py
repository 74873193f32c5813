"""Round-10: Iceberg format-version gate — a v3 table must FAIL FAST,
never misread (v3 deletion vectors / row lineage / default values all
change row-level results; docs/iceberg_v3_scope.md scopes the intake).
"""

from __future__ import annotations

import json
import os

import pytest

from mysoftware_nocnetintel_spark.sources.iceberg import write_iceberg_append
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def test_v3_metadata_is_refused_loudly(spark, tmp_path):
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
    meta["format-version"] = 3
    nxt = f"v{int(versions[-1][1:].split('.')[0]) + 1}.metadata.json"
    with open(os.path.join(meta_dir, nxt), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(NotImplementedError, match="format-version 3"):
        read_iceberg_snapshot(spark, root).count()
