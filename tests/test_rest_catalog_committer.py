"""Iceberg REST-catalog dialect on the commit seam (round 9 — verdict
task 3): the version CAS of BOTH lakehouse formats maps onto the public
REST catalog commit shape — ``POST /v1[/{prefix}]/namespaces/{ns}/
tables/{table}`` with requirements/updates, spec error model, bearer
auth — against an in-process REST-shaped server that enforces the CAS
server-side. The two-format CAS fuzzes also run under this committer
via their committer matrices (test_delta_cas.py / test_iceberg_cas.py).
"""

from __future__ import annotations

import threading

import pytest

from mysoftware_nocnetintel_spark.sources.catalog import (
    CatalogCommitConflict,
    IcebergRestCatalogCommitter,
    use_committer,
)
from mysoftware_nocnetintel_spark.sources.delta import (
    delete_delta_rows,
    write_delta_append,
)
from mysoftware_nocnetintel_spark.sources.iceberg import (
    write_iceberg_append,
    write_iceberg_position_deletes,
)
from mysoftware_nocnetintel_spark.sources.readers import (
    read_delta_snapshot,
    read_iceberg_snapshot,
)

from .rest_catalog_server import rest_catalog_server


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id bigint, val string"
    )


# ------------------------------------------------------------ wire shape


def test_wire_shape_first_and_subsequent_commits(tmp_path):
    """Capture the exact requests: route (prefix + %1F-joined namespace),
    bearer header, identifier, assert-create on v1 /
    assert-current-version after, and the publish-metadata carrier."""
    with rest_catalog_server(token="sekrit", prefix="warehouse") as (
        endpoint,
        stats,
    ):
        c = IcebergRestCatalogCommitter(
            endpoint,
            namespace=("prod", "corpora"),
            prefix="warehouse",
            token="sekrit",
        )
        meta = str(tmp_path / "tbl" / "metadata")
        import os

        os.makedirs(meta)
        c.put_if_absent(f"{meta}/v1.metadata.json", b'{"v": 1}')
        c.put_if_absent(f"{meta}/v2.metadata.json", b'{"v": 2}')
        r1, r2 = stats["requests"][0], stats["requests"][1]
        assert r1["path"] == (
            "/v1/warehouse/namespaces/prod%1Fcorpora/tables/tbl"
        )
        assert r1["auth"] == "Bearer sekrit"
        assert r1["body"]["identifier"] == {
            "namespace": ["prod", "corpora"],
            "name": "tbl",
        }
        assert r1["body"]["requirements"] == [{"type": "assert-create"}]
        assert r2["body"]["requirements"] == [
            {"type": "assert-current-version", "version": 1}
        ]
        (upd,) = r2["body"]["updates"]
        assert upd["action"] == "publish-metadata"
        assert upd["format"] == "iceberg" and upd["version"] == 2
        # the server owned the durable write
        assert open(f"{meta}/v2.metadata.json", "rb").read() == b'{"v": 2}'


def test_delta_paths_map_onto_the_same_route(tmp_path):
    import os

    with rest_catalog_server() as (endpoint, stats):
        c = IcebergRestCatalogCommitter(endpoint)
        log = str(tmp_path / "dtbl" / "_delta_log")
        os.makedirs(log)
        c.put_if_absent(f"{log}/{0:020d}.json", b"{}\n")
        c.put_if_absent(f"{log}/{1:020d}.json", b"{}\n")
        r1, r2 = stats["requests"][0], stats["requests"][1]
        assert r1["path"].endswith("/namespaces/nocnetintel/tables/dtbl")
        assert r1["body"]["requirements"] == [{"type": "assert-create"}]
        assert r1["body"]["updates"][0]["format"] == "delta"
        assert r2["body"]["requirements"] == [
            {"type": "assert-current-version", "version": 0}
        ]


def test_non_lakehouse_path_is_refused():
    c = IcebergRestCatalogCommitter("http://127.0.0.1:1")
    with pytest.raises(ValueError, match="versioned lakehouse artifact"):
        c.put_if_absent("/tmp/random/file.json", b"x")


# --------------------------------------------------------- error taxonomy


def test_conflict_statuses_and_types_map_to_conflict(tmp_path):
    import os

    meta = str(tmp_path / "t" / "metadata")
    os.makedirs(meta)
    with rest_catalog_server() as (endpoint, stats):
        c = IcebergRestCatalogCommitter(endpoint)
        c.put_if_absent(f"{meta}/v1.metadata.json", b"a")
        # same version again: requirement fails server-side -> conflict
        with pytest.raises(CatalogCommitConflict, match="another writer"):
            c.put_if_absent(f"{meta}/v1.metadata.json", b"b")
        assert open(f"{meta}/v1.metadata.json", "rb").read() == b"a"
        # spec conflict type with a 409 from a forced path
        stats["force_status"] = (409, "CommitFailedException")
        with pytest.raises(CatalogCommitConflict):
            c.put_if_absent(f"{meta}/v2.metadata.json", b"c")


def test_outage_is_fate_unknown_not_conflict(tmp_path):
    import os

    meta = str(tmp_path / "t2" / "metadata")
    os.makedirs(meta)
    with rest_catalog_server() as (endpoint, stats):
        c = IcebergRestCatalogCommitter(endpoint)
        stats["force_status"] = (503, "ServiceUnavailableException")
        with pytest.raises(RuntimeError, match="fate unknown"):
            c.put_if_absent(f"{meta}/v1.metadata.json", b"a")
        stats["force_status"] = (500, "CommitStateUnknownException")
        with pytest.raises(RuntimeError, match="fate unknown"):
            c.put_if_absent(f"{meta}/v1.metadata.json", b"a")
    # unreachable endpoint: transport error, still fate-unknown
    dead = IcebergRestCatalogCommitter("http://127.0.0.1:1", timeout_s=0.5)
    with pytest.raises(RuntimeError, match="fate unknown|unreachable"):
        dead.put_if_absent(f"{meta}/v1.metadata.json", b"a")


def test_auth_failures_surface_clearly(tmp_path):
    import os

    meta = str(tmp_path / "t3" / "metadata")
    os.makedirs(meta)
    with rest_catalog_server(token="right") as (endpoint, _stats):
        wrong = IcebergRestCatalogCommitter(endpoint, token="wrong")
        with pytest.raises(RuntimeError, match="credentials"):
            wrong.put_if_absent(f"{meta}/v1.metadata.json", b"a")
        missing = IcebergRestCatalogCommitter(endpoint)
        with pytest.raises(RuntimeError, match="credentials"):
            missing.put_if_absent(f"{meta}/v1.metadata.json", b"a")


def test_unknown_table_without_prior_artifact_is_404(tmp_path):
    import os

    meta = str(tmp_path / "t4" / "metadata")
    os.makedirs(meta)
    with rest_catalog_server() as (endpoint, _stats):
        c = IcebergRestCatalogCommitter(endpoint)
        # v3 asserted but the catalog never saw the table and v2 is not
        # on storage: NoSuchTableException, surfaced as config error
        with pytest.raises(RuntimeError, match="no such table"):
            c.put_if_absent(f"{meta}/v3.metadata.json", b"a")


def test_registry_bootstrap_from_existing_storage(tmp_path):
    """A table created OUTSIDE the catalog (filesystem committer) keeps
    committing when the REST committer is installed: the server
    bootstraps its registry from the asserted prior artifact."""
    import os

    from mysoftware_nocnetintel_spark.sources.catalog import (
        FilesystemCommitter,
    )

    meta = str(tmp_path / "t5" / "metadata")
    os.makedirs(meta)
    FilesystemCommitter().put_if_absent(f"{meta}/v1.metadata.json", b"a")
    with rest_catalog_server() as (endpoint, _stats):
        c = IcebergRestCatalogCommitter(endpoint)
        c.put_if_absent(f"{meta}/v2.metadata.json", b"b")
        with pytest.raises(CatalogCommitConflict):
            c.put_if_absent(f"{meta}/v2.metadata.json", b"c")


# ------------------------------------------------- verb flow + race


def test_rest_catalog_runs_both_formats_verb_flow(spark, tmp_path):
    """The drop-in proof: create, append, MOR delete, and read-back for
    BOTH formats with every version swap riding the REST commit shape."""
    from pyspark.sql import functions as F

    import os

    with rest_catalog_server(token="tok") as (endpoint, stats):
        with use_committer(
            IcebergRestCatalogCommitter(endpoint, token="tok")
        ):
            droot = str(tmp_path / "rest_d")
            write_delta_append(_df(spark, 0, 3), droot)
            write_delta_append(_df(spark, 3, 6), droot)
            delete_delta_rows(spark, droot, "id = 0")
            iroot = str(tmp_path / "rest_i")
            write_iceberg_append(_df(spark, 0, 4).coalesce(1), iroot)
            write_iceberg_position_deletes(spark, iroot, F.col("id") == 3)
        assert stats["commits"] >= 5  # every version over the wire
        got = sorted(r.id for r in read_delta_snapshot(spark, droot).collect())
        assert got == [1, 2, 3, 4, 5]
        got_i = sorted(
            r.id for r in read_iceberg_snapshot(spark, iroot).collect()
        )
        assert got_i == [0, 1, 2]
        # the hint traveled as a publish-hint update
        assert os.path.exists(
            os.path.join(iroot, "metadata", "version-hint.text")
        )


def test_rest_catalog_two_writer_race_one_winner(spark, tmp_path):
    """Two threads race Delta appends THROUGH the REST catalog: its
    server-side requirement check serializes them; the losers' retry
    paths re-resolve and land. No lost updates."""
    with rest_catalog_server() as (endpoint, stats):
        root = str(tmp_path / "rest_race")
        errs: list = []
        with use_committer(IcebergRestCatalogCommitter(endpoint)):
            write_delta_append(_df(spark, 0, 2), root)

            def work(lo):
                try:
                    write_delta_append(_df(spark, lo, lo + 3), root)
                except Exception as e:  # pragma: no cover
                    errs.append(e)

            threads = [
                threading.Thread(target=work, args=(lo,)) for lo in (10, 20)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        assert not errs
        got = sorted(r.id for r in read_delta_snapshot(spark, root).collect())
        assert got == [0, 1, 10, 11, 12, 20, 21, 22]
        assert stats.get("errors", 0) >= 0  # conflicts allowed, not required


# ------------------------------------------ deployment spec / env wiring


def test_committer_from_spec_parses_all_shapes(monkeypatch):
    from mysoftware_nocnetintel_spark.sources.catalog import (
        FilesystemCommitter,
        HttpCommitServiceCommitter,
        committer_from_spec,
    )

    assert isinstance(committer_from_spec("filesystem"), FilesystemCommitter)
    c = committer_from_spec("commit-service+http://h:9")
    assert isinstance(c, HttpCommitServiceCommitter)
    assert c.endpoint == "http://h:9"
    r = committer_from_spec(
        "rest+http://h:9?ns=prod.corpora&prefix=w&token=t1&timeout=3"
    )
    assert isinstance(r, IcebergRestCatalogCommitter)
    assert r.endpoint == "http://h:9"
    assert r.namespace == ("prod", "corpora")
    assert r.prefix == "w" and r.token == "t1" and r.timeout_s == 3.0
    # token prefers the env injection path when the spec omits it
    monkeypatch.setenv("SPARK_GRAFT_CATALOG_TOKEN", "from-env")
    assert committer_from_spec("rest+http://h:9").token == "from-env"
    with pytest.raises(ValueError, match="catalog spec"):
        committer_from_spec("bogus")
    with pytest.raises(ValueError, match="unknown catalog kind"):
        committer_from_spec("glue+http://h:9")


def test_env_spec_installs_rest_committer_end_to_end(
    spark, tmp_path, monkeypatch
):
    """SPARK_GRAFT_CATALOG=rest+... is the entire deployment surface:
    with only the env var set (fresh process simulated by resetting the
    module's first-use latch), a Delta append commits through the
    REST-shaped server."""
    from mysoftware_nocnetintel_spark.sources import catalog as C

    with rest_catalog_server(token="envtok") as (endpoint, stats):
        monkeypatch.setenv("SPARK_GRAFT_CATALOG", f"rest+{endpoint}")
        monkeypatch.setenv("SPARK_GRAFT_CATALOG_TOKEN", "envtok")
        monkeypatch.setattr(C, "_env_applied", False)
        monkeypatch.setattr(C, "_env_committer", None)
        monkeypatch.setattr(C, "_current", C._DEFAULT)
        try:
            root = str(tmp_path / "env_d")
            write_delta_append(_df(spark, 0, 3), root)
            assert stats.get("commits", 0) >= 1, "commit never hit the wire"
            assert stats["requests"][0]["auth"] == "Bearer envtok"
            got = sorted(
                r.id for r in read_delta_snapshot(spark, root).collect()
            )
            assert got == [0, 1, 2]
        finally:
            C.set_committer(None)


def test_explicit_set_committer_wins_over_env(monkeypatch, tmp_path):
    from mysoftware_nocnetintel_spark.sources import catalog as C

    monkeypatch.setenv("SPARK_GRAFT_CATALOG", "rest+http://127.0.0.1:1")
    monkeypatch.setattr(C, "_env_applied", False)
    monkeypatch.setattr(C, "_env_committer", None)
    explicit = C.FilesystemCommitter()
    prev = C.set_committer(explicit)
    try:
        assert C.get_committer() is explicit  # override wins while active
    finally:
        C.set_committer(prev)
    # round-9 review fix: a first get_committer() landing INSIDE an
    # override window must not permanently discard the env spec — once
    # the override lifts, the ENVIRONMENT's committer applies
    monkeypatch.setattr(C, "_current", C._DEFAULT)
    got = C.get_committer()
    assert isinstance(got, C.IcebergRestCatalogCommitter)
    monkeypatch.setattr(C, "_env_applied", False)
    monkeypatch.setattr(C, "_env_committer", None)


def test_malformed_env_spec_fails_closed_on_every_call(monkeypatch):
    """Round-10 advisor: a malformed SPARK_GRAFT_CATALOG must raise on
    EVERY get_committer() call — never latch and silently hand writers
    the filesystem committer, which would bypass the deployment catalog
    after one swallowed error."""
    from mysoftware_nocnetintel_spark.sources import catalog as C

    monkeypatch.setenv("SPARK_GRAFT_CATALOG", "glue+http://h:9")
    monkeypatch.setattr(C, "_env_applied", False)
    monkeypatch.setattr(C, "_env_committer", None)
    monkeypatch.setattr(C, "_current", C._DEFAULT)
    with pytest.raises(ValueError, match="unknown catalog kind"):
        C.get_committer()
    with pytest.raises(ValueError, match="unknown catalog kind"):
        C.get_committer()  # second call: still closed, not filesystem
    # fixing the env heals the process without a restart
    monkeypatch.delenv("SPARK_GRAFT_CATALOG")
    assert C.get_committer() is C._DEFAULT
