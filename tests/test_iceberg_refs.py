"""Iceberg snapshot references (spec "Snapshot References"): tags pin a
snapshot by name, survive expiration until dropped, and resolve on the
read path — the dataset-reproducibility primitive ("the corpus snapshot
model X trained on")."""

from __future__ import annotations

import pytest

from mysoftware_nocnetintel_spark.sources.iceberg import (
    drop_iceberg_ref,
    expire_iceberg_snapshots,
    iceberg_refs,
    resolve_iceberg_ref,
    tag_iceberg_snapshot,
    write_iceberg_append,
)
from mysoftware_nocnetintel_spark.sources.readers import read_iceberg_snapshot


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id bigint, val string")


def _rows(df):
    return {(r.id, r.val) for r in df.collect()}


def test_tag_resolve_read_and_drop(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = write_iceberg_append(_mk(spark, [(1, "a")]), path)
    s2 = write_iceberg_append(_mk(spark, [(2, "b")]), path)
    tag_iceberg_snapshot(path, "train-v1", s1)
    assert resolve_iceberg_ref(path, "train-v1") == s1
    assert resolve_iceberg_ref(path, "main") == s2
    assert _rows(read_iceberg_snapshot(spark, path, ref="train-v1")) == {
        (1, "a")
    }
    assert _rows(read_iceberg_snapshot(spark, path, ref="main")) == {
        (1, "a"),
        (2, "b"),
    }
    refs = {
        r.name: (r.type, r.snapshot_id)
        for r in iceberg_refs(spark, path).collect()
    }
    assert refs == {
        "train-v1": ("tag", s1),
        "main": ("branch", s2),
    }
    assert drop_iceberg_ref(path, "train-v1") == s1
    with pytest.raises(ValueError, match="does not exist"):
        resolve_iceberg_ref(path, "train-v1")


def test_tag_defaults_to_current_and_refuses_dup_or_missing(spark, tmp_path):
    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    s2 = write_iceberg_append(_mk(spark, [(2, "b")]), path)
    assert tag_iceberg_snapshot(path, "head") == s2
    with pytest.raises(ValueError, match="already exists"):
        tag_iceberg_snapshot(path, "head")
    with pytest.raises(ValueError, match="does not exist"):
        tag_iceberg_snapshot(path, "ghost", 12345)
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_iceberg_snapshot(spark, path, snapshot_id=s2, ref="head")


def test_tagged_snapshot_survives_expiration_until_dropped(spark, tmp_path):
    path = str(tmp_path / "t")
    s1 = write_iceberg_append(_mk(spark, [(1, "a")]), path)
    s2 = write_iceberg_append(_mk(spark, [(2, "x")]), path)
    for i in range(3, 6):
        write_iceberg_append(_mk(spark, [(i, "x")]), path)
    tag_iceberg_snapshot(path, "pin", s1)
    expire_iceberg_snapshots(path, keep_last=2)
    # the pinned snapshot is still fully readable (files kept on disk)
    assert _rows(read_iceberg_snapshot(spark, path, ref="pin")) == {(1, "a")}
    # an unpinned old snapshot in the same range was expired
    with pytest.raises(Exception, match="not found|does not exist"):
        read_iceberg_snapshot(spark, path, snapshot_id=s2).collect()
    drop_iceberg_ref(path, "pin")
    removed = expire_iceberg_snapshots(path, keep_last=2)
    assert removed > 0  # the un-pinned snapshot's files now clean up
    with pytest.raises(Exception):
        read_iceberg_snapshot(spark, path, ref="pin")


def test_refs_survive_later_appends_and_maintenance(spark, tmp_path):
    """The append path rebuilds table metadata — refs must be carried
    verbatim (a dropped refs map would silently un-pin datasets)."""
    path = str(tmp_path / "t")
    s1 = write_iceberg_append(_mk(spark, [(1, "a")]), path)
    tag_iceberg_snapshot(path, "pin", s1)
    write_iceberg_append(_mk(spark, [(2, "b")]), path)
    assert resolve_iceberg_ref(path, "pin") == s1
    assert _rows(read_iceberg_snapshot(spark, path, ref="pin")) == {(1, "a")}


# ------------------------------------------------- write-audit-publish


def test_wap_branch_stage_audit_publish(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        publish_iceberg_branch,
    )

    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    write_iceberg_append(_mk(spark, [(2, "b")]), path, branch="audit")
    write_iceberg_append(_mk(spark, [(3, "c")]), path, branch="audit")
    # staged commits are INVISIBLE to main readers...
    assert _rows(read_iceberg_snapshot(spark, path)) == {(1, "a")}
    # ...but the audit query sees the full staged state
    assert _rows(read_iceberg_snapshot(spark, path, ref="audit")) == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    publish_iceberg_branch(path, "audit")
    assert _rows(read_iceberg_snapshot(spark, path)) == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    with pytest.raises(ValueError, match="does not exist"):
        publish_iceberg_branch(path, "audit")  # dropped at publish


def test_wap_diverged_main_refuses_fast_forward(spark, tmp_path):
    from mysoftware_nocnetintel_spark.sources.iceberg import (
        publish_iceberg_branch,
    )

    path = str(tmp_path / "t")
    write_iceberg_append(_mk(spark, [(1, "a")]), path)
    write_iceberg_append(_mk(spark, [(2, "b")]), path, branch="audit")
    write_iceberg_append(_mk(spark, [(9, "z")]), path)  # main advances
    with pytest.raises(ValueError, match="does not descend"):
        publish_iceberg_branch(path, "audit")
    # the staged branch is still readable for inspection
    assert _rows(read_iceberg_snapshot(spark, path, ref="audit")) == {
        (1, "a"),
        (2, "b"),
    }


def test_wap_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    with pytest.raises(ValueError, match="existing table"):
        write_iceberg_append(_mk(spark, [(1, "a")]), path, branch="audit")
    s1 = write_iceberg_append(_mk(spark, [(1, "a")]), path)
    tag_iceberg_snapshot(path, "pin", s1)
    with pytest.raises(ValueError, match="tag, not a branch"):
        write_iceberg_append(_mk(spark, [(2, "b")]), path, branch="pin")
    with pytest.raises(ValueError, match="append without branch"):
        write_iceberg_append(_mk(spark, [(2, "b")]), path, branch="main")


# -------------------------------------------- randomized lifecycle fuzz


@pytest.mark.parametrize("seed", [11, 29])
def test_random_refs_wap_lifecycle(spark, tmp_path, seed):
    """Random interleavings of main appends, branch appends, tag/drop,
    publish, and expiration against a plain-Python model. Invariants
    after every op: main state == model main; every live branch reads
    its staged state; every tag still resolves and reads its pinned
    state (expiration must never break a pin)."""
    import random

    from mysoftware_nocnetintel_spark.sources.iceberg import (
        expire_iceberg_snapshots,
        publish_iceberg_branch,
    )

    rng = random.Random(seed)
    root = str(tmp_path / f"t{seed}")
    next_id = 0

    def _append(rows, **kw):
        return write_iceberg_append(
            spark.createDataFrame(rows, "id bigint, val string"), root, **kw
        )

    def _batch(n):
        nonlocal next_id
        rows = [
            (next_id + i, chr(97 + (next_id + i) % 26)) for i in range(n)
        ]
        next_id += n
        return rows

    main: set = set(_batch(2))
    _append(sorted(main))
    branch: set | None = None  # staged rows beyond main (single branch)
    branch_base: set = set()
    tags: dict[str, set] = {}
    n_tag = 0

    for _step in range(10):
        op = rng.choice(
            ["append", "branch_append", "tag", "publish", "expire"]
        )
        if op == "append":
            rows = _batch(rng.randint(1, 3))
            _append(rows)
            main |= set(rows)
        elif op == "branch_append":
            if branch is None:
                branch, branch_base = set(), set(main)
            rows = _batch(rng.randint(1, 3))
            _append(rows, branch="wap")
            branch |= set(rows)
        elif op == "tag":
            name = f"tag{n_tag}"
            n_tag += 1
            tag_iceberg_snapshot(root, name)
            tags[name] = set(main)
        elif op == "publish":
            if branch is None:
                continue
            if branch_base == main:
                publish_iceberg_branch(root, "wap")
                main |= branch
            else:  # main advanced since the fork — must refuse
                with pytest.raises(ValueError, match="does not descend"):
                    publish_iceberg_branch(root, "wap")
                drop_iceberg_ref(root, "wap")
            branch = None
        else:
            expire_iceberg_snapshots(root, keep_last=2)

        assert _rows(read_iceberg_snapshot(spark, root)) == main
        if branch is not None:
            assert (
                _rows(read_iceberg_snapshot(spark, root, ref="wap"))
                == branch_base | branch
            )
        for name, pinned in tags.items():
            assert _rows(
                read_iceberg_snapshot(spark, root, ref=name)
            ) == pinned
