"""Pluggable catalog COMMIT seam (round 8 — verdict task 2).

Both lakehouse writers funnel every commit through ONE compare-and-swap
primitive: "publish these bytes as version N+1 iff nobody else has" —
Delta's ``_delta_log/<v>.json`` log-store contract (PROTOCOL.md:
"the creation of <v>.json must be mutually exclusive") and Iceberg's
``v<N>.metadata.json`` HadoopTableOperations swap. This module extracts
that primitive behind :class:`CatalogCommitter` so the production
commit endpoint — an Iceberg REST catalog's ``POST /v1/.../tables``
commit, a Hive Metastore ``alter_table`` CAS, a Glue
``UpdateTable(VersionId=...)``, or a Delta LogStore for object stores
without atomic rename — is a drop-in subclass. Everything above the
seam (action staging, validation, retry policy) is committer-agnostic.

Two implementations ship:

- :class:`FilesystemCommitter` (default): write-temp + fsync +
  ``os.link`` — hard-linking is put-if-absent on POSIX, so a lost race
  raises :class:`CatalogCommitConflict` instead of clobbering the
  winner. Exactly the behavior both writers had inline before the
  extraction; every existing CAS/fuzz test runs on it unchanged.
- :class:`FaultInjectingCommitter` (test double): wraps another
  committer and injects the failure modes a REMOTE catalog adds —
  latency around the swap (widening race windows so two-writer fuzz
  actually interleaves) and spurious conflict responses (a transient
  catalog error where the commit did NOT land; the caller's retry path
  must re-resolve the head and re-commit). Stats counters prove the
  faults fired.

Scope note: ``put_if_absent`` is deliberately the WHOLE interface.
Reads stay plain filesystem/object-store GETs in both formats (Iceberg
readers list ``v*.metadata.json``; Delta readers list the log dir) —
real catalogs serve reads too, but the commit endpoint is the only
operation whose atomicity the engine's correctness depends on, so it is
the only one worth abstracting. A catalog-backed implementation would
also override :meth:`publish_hint` (Iceberg's ``version-hint.text``
convenience) to update its table pointer."""

from __future__ import annotations

import glob
import os
import re
import threading
import uuid


class CatalogCommitConflict(RuntimeError):
    """Another writer holds the contested version (or the catalog
    reported a conflict). The format layers translate this into their
    own conflict types (``DeltaCommitConflict`` /
    ``IcebergCommitConflict``) so caller-facing semantics are
    unchanged by the seam."""


class CatalogCommitter:
    """Commit endpoint: atomically publish a version artifact.

    ``coordinator_name`` (round 10) is the endpoint's identity for the
    Delta coordinated-commits handshake: a table whose metadata declares
    ``delta.coordinatedCommits.commitCoordinator-preview`` is writable
    only through a committer declaring the SAME name (the writers'
    fail-closed gate, ``delta._check_commit_coordinator``). None — the
    filesystem default — means "not a coordinator"."""

    coordinator_name: "str | None" = None

    def put_if_absent(self, final_path: str, payload: bytes) -> None:
        """Publish ``payload`` at ``final_path`` iff nothing exists
        there; raise :class:`CatalogCommitConflict` otherwise. Must be
        atomic: no reader may ever observe a partial payload, and of N
        concurrent writers exactly one succeeds."""
        raise NotImplementedError

    def publish_hint(self, hint_path: str, value: str) -> None:
        """Best-effort non-CAS pointer update (Iceberg's
        ``version-hint.text``). Last writer wins by design."""
        raise NotImplementedError


class FilesystemCommitter(CatalogCommitter):
    """POSIX hard-link put-if-absent (the HadoopTableOperations /
    delta LogStore recipe for filesystems with atomic link)."""

    def put_if_absent(self, final_path: str, payload: bytes) -> None:
        tmp = final_path + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, final_path)
        except FileExistsError:
            raise CatalogCommitConflict(
                f"{os.path.basename(final_path)} was committed by "
                "another writer while this commit was staged"
            ) from None
        finally:
            os.remove(tmp)

    def publish_hint(self, hint_path: str, value: str) -> None:
        # best-effort by contract: the commit already landed, so a hint
        # failure must not surface as a failed commit
        try:
            tmp = hint_path + f".{uuid.uuid4().hex[:8]}.tmp"
            with open(tmp, "w") as fh:
                fh.write(value)
            os.replace(tmp, hint_path)
        except OSError:
            pass


class InProcessCommitCoordinator(CatalogCommitter):
    """Reference implementation of the Delta COORDINATED-COMMITS
    coordinator contract (delta.io PROTOCOL.md "Coordinated Commits";
    the public delta-spark CommitCoordinatorClient shape: ``commit`` /
    ``getCommits`` / ``backfillToVersion``) — the Delta twin of the
    role tests/rest_catalog_server.py plays for Iceberg, usable as an
    in-process coordinator double in conformance tests and as the
    template a real REST coordinator maps onto.

    Behavior:

    - ``put_if_absent`` on a ``_delta_log/<v>.json`` path IS
      ``commit(v)``: the version CAS runs against
      max(backfilled files, un-backfilled tail); an accepted commit
      lands in the coordinator's UN-BACKFILLED tail (process memory),
      NOT as a ``<v>.json`` file — plain filesystem readers cannot see
      it until backfill. Every ``backfill_every``-th version triggers a
      synchronous backfill of the whole tail (delta-spark's
      batch-backfill discipline; ``backfill_every=1`` is the
      synchronous-backfill mode docs/delta_coordinated_commits.md
      requires of coordinators serving merge-less readers).
    - ``get_commits(log_dir)`` → ``{version: payload bytes}`` of the
      un-backfilled tail — what coordinated readers/writers merge over
      the backfilled prefix (delta.py ``_coordinator_tail``).
    - ``backfill(log_dir, to_version=None)`` materializes tail commits
      as ``<v>.json`` through the inner committer's put-if-absent (a
      race with another backfiller is benign: identical payloads, the
      loser's conflict is swallowed per the spec's idempotent-backfill
      rule).
    - non-Delta-log paths delegate to ``inner`` untouched.

    Process memory is the tail's only home — a crash loses accepted
    but un-backfilled commits, which is exactly the durability contract
    a REAL coordinator must improve on (and why this class is the test
    double, not a production endpoint)."""

    def __init__(
        self,
        coordinator_name: str = "in-process",
        inner: "CatalogCommitter | None" = None,
        backfill_every: int = 1,
    ) -> None:
        if backfill_every < 1:
            raise ValueError("backfill_every must be >= 1")
        self.coordinator_name = coordinator_name
        self.inner = inner or FilesystemCommitter()
        self.backfill_every = backfill_every
        # {log_dir: {version: payload}}
        self._tails: dict[str, dict[int, bytes]] = {}
        self.stats = {"commits": 0, "backfills": 0}
        self._lock = threading.Lock()

    @staticmethod
    def _parse_commit(final_path: str) -> "tuple[str, int] | None":
        d, base = os.path.split(os.path.abspath(final_path))
        if os.path.basename(d) != "_delta_log" or not base.endswith(".json"):
            return None
        stem = base[:-5]
        if not stem.isdigit():
            return None  # checkpoints/CRCs/hints are not commits
        return d, int(stem)

    def _backfilled_version(self, log_dir: str) -> int:
        vs = [
            int(os.path.basename(p).split(".")[0])
            for p in glob.glob(os.path.join(log_dir, "[0-9]*.json"))
            if "checkpoint" not in os.path.basename(p)
        ]
        head = max(vs) if vs else -1
        # a checkpointed-then-cleaned log has NO <v>.json at the head:
        # the checkpoint version is the durable floor (without this, the
        # strict head+1 CAS would refuse every commit after cleanup)
        try:
            import json as _json

            with open(os.path.join(log_dir, "_last_checkpoint")) as fh:
                cp = _json.loads(fh.read() or "{}").get("version")
            if cp is not None:
                head = max(head, int(cp))
        except (OSError, ValueError):
            # ValueError covers corrupt _last_checkpoint JSON (r11
            # advisor: JSONDecodeError escaping here surfaced as an
            # unexpected exception type out of the CAS path)
            pass
        return head

    def put_if_absent(self, final_path: str, payload: bytes) -> None:
        parsed = self._parse_commit(final_path)
        if parsed is None:
            return self.inner.put_if_absent(final_path, payload)
        log_dir, v = parsed
        with self._lock:
            tail = self._tails.setdefault(log_dir, {})
            head = max(
                self._backfilled_version(log_dir),
                max(tail) if tail else -1,
            )
            if v <= head or os.path.exists(final_path):
                raise CatalogCommitConflict(
                    f"{os.path.basename(final_path)} was committed by "
                    "another writer while this commit was staged"
                )
            if v != head + 1:
                # Delta versions are dense: accepting a gapped commit
                # would later fold over missing versions silently — a
                # coordinator must CAS on exactly head+1
                raise CatalogCommitConflict(
                    f"version {v} does not follow the head ({head}): "
                    "Delta commits are strictly sequential"
                )
            tail[v] = payload
            self.stats["commits"] += 1
            do_backfill = v % self.backfill_every == 0
        if do_backfill:
            self.backfill(log_dir)

    def get_commits(
        self, log_dir: str, start_version: int | None = None
    ) -> dict[int, bytes]:
        with self._lock:
            tail = dict(self._tails.get(os.path.abspath(log_dir), {}))
        if start_version is not None:
            tail = {v: p for v, p in tail.items() if v >= start_version}
        return tail

    def backfill(self, log_dir: str, to_version: int | None = None) -> int:
        """Materialize the tail ≤ ``to_version`` (default: all) as
        ``<v>.json`` files; returns the number backfilled."""
        log_dir = os.path.abspath(log_dir)
        with self._lock:
            versions = sorted(
                v
                for v in self._tails.get(log_dir, {})
                if to_version is None or v <= to_version
            )
            payloads = {v: self._tails[log_dir][v] for v in versions}
        n = 0
        for v in versions:
            final = os.path.join(log_dir, f"{v:020d}.json")
            try:
                self.inner.put_if_absent(final, payloads[v])
            except CatalogCommitConflict:
                pass  # another backfiller won with the identical payload
            n += 1
            with self._lock:
                self._tails[log_dir].pop(v, None)
                self.stats["backfills"] += 1
        return n

    def publish_hint(self, hint_path: str, value: str) -> None:
        self.inner.publish_hint(hint_path, value)


class FaultInjectingCommitter(CatalogCommitter):
    """Test double for remote-catalog failure modes. Wraps ``inner``
    (default: a fresh :class:`FilesystemCommitter`) and injects, per
    call, seeded-deterministically:

    - ``max_delay_s``: uniform sleep before AND after the inner swap —
      the remote round-trip that widens two-writer race windows;
    - ``spurious_conflict_rate``: probability of raising
      :class:`CatalogCommitConflict` WITHOUT attempting the commit (a
      transient catalog rejection; the commit provably did not land, so
      a correct caller re-resolves the head — sees its version still
      free — and re-commits).

    ``stats`` counts attempts / delays / injected conflicts so tests
    can assert the faults actually fired."""

    def __init__(
        self,
        inner: CatalogCommitter | None = None,
        spurious_conflict_rate: float = 0.0,
        max_delay_s: float = 0.0,
        seed: int = 0,
    ) -> None:
        import random

        self.inner = inner or FilesystemCommitter()
        self.rate = float(spurious_conflict_rate)
        self.max_delay = float(max_delay_s)
        self._rng = random.Random(seed)
        self._lock = threading.Lock()
        self.stats = {"attempts": 0, "injected_conflicts": 0, "delays": 0}

    def _maybe_delay(self) -> None:
        if self.max_delay > 0:
            import time

            with self._lock:
                d = self._rng.uniform(0, self.max_delay)
                self.stats["delays"] += 1
            time.sleep(d)

    def put_if_absent(self, final_path: str, payload: bytes) -> None:
        with self._lock:
            self.stats["attempts"] += 1
            inject = self.rate > 0 and self._rng.random() < self.rate
            if inject:
                self.stats["injected_conflicts"] += 1
        if inject:
            raise CatalogCommitConflict(
                f"catalog transiently rejected "
                f"{os.path.basename(final_path)} (injected)"
            )
        self._maybe_delay()
        try:
            self.inner.put_if_absent(final_path, payload)
        finally:
            self._maybe_delay()

    def publish_hint(self, hint_path: str, value: str) -> None:
        self.inner.publish_hint(hint_path, value)


class HttpCommitServiceCommitter(CatalogCommitter):
    """Commit endpoint over HTTP — the wire shape of a catalog / log
    service doing the atomic swap server-side (an Iceberg REST catalog
    commit, a Delta commit-coordinator, an S3 conditional-put proxy).
    The writer ships ``(path, payload)``; the SERVICE owns atomicity and
    durability of the version artifact on shared storage. Protocol
    (deliberately minimal — one verb, stdlib-only):

    - ``PUT {endpoint}/commit`` body ``{"path": ..., "payload_b64": ...}``
      → ``201`` committed; ``409``/``412`` someone else holds the
      version (raised as :class:`CatalogCommitConflict`); anything else
      propagates (an outage is NOT a conflict — retrying a commit whose
      fate is unknown could double-apply, so the caller must decide).
    - ``PUT {endpoint}/hint`` body ``{"path": ..., "value": ...}`` —
      best-effort pointer update; failures are swallowed (hints are a
      convenience, never a correctness input).

    ``tests/test_catalog_committer.py`` runs the full writer verb flow
    and a two-writer thread race through an in-process stdlib HTTP
    server backed by the filesystem swap — the drop-in proof for the
    seam. A production REST catalog maps onto the same class with a
    token header and its own conflict codes."""

    def __init__(self, endpoint: str, timeout_s: float = 10.0) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.timeout_s = float(timeout_s)

    def _put(self, route: str, body: dict) -> int:
        import json as _json
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            f"{self.endpoint}/{route}",
            data=_json.dumps(body).encode(),
            method="PUT",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                return r.status
        except urllib.error.HTTPError as e:
            return e.code

    def put_if_absent(self, final_path: str, payload: bytes) -> None:
        import base64

        status = self._put(
            "commit",
            {
                "path": final_path,
                "payload_b64": base64.b64encode(payload).decode(),
            },
        )
        if status in (409, 412):
            raise CatalogCommitConflict(
                f"commit service holds {os.path.basename(final_path)} "
                f"for another writer (HTTP {status})"
            )
        if status not in (200, 201):
            raise RuntimeError(
                f"commit service error HTTP {status} for {final_path} — "
                "commit fate unknown; re-resolve the table head before "
                "retrying"
            )

    def publish_hint(self, hint_path: str, value: str) -> None:
        try:
            self._put("hint", {"path": hint_path, "value": value})
        except Exception:
            pass  # hints are best-effort by contract


class IcebergRestCatalogCommitter(CatalogCommitter):
    """Commit endpoint speaking the PUBLIC Iceberg REST catalog commit
    shape (round 9 — verdict task 3): every version swap becomes

        ``POST {endpoint}/v1/{prefix}/namespaces/{ns}/tables/{table}``

    with a ``CommitTableRequest``-shaped body — ``identifier`` +
    ``requirements`` list + ``updates`` list — and the spec's error
    model on the way back (JSON ``{"error": {"message", "type",
    "code"}}``; ``409 CommitFailedException`` → retryable conflict;
    ``5xx / CommitStateUnknownException`` → commit fate UNKNOWN, never
    retried blindly; ``401/403/419`` → auth, surfaced verbatim).
    Multipart namespaces join with the spec's ``0x1F`` unit separator
    (URL-encoded ``%1F``); a bearer ``token`` rides the standard
    ``Authorization`` header.

    TWO REQUEST MODES, chosen per commit:

    - **SPEC-NATIVE** (default for Iceberg artifacts,
      ``spec_native=True``): the staged metadata is parsed, the prior
      artifact is read from storage, and the request carries REAL spec
      requirements (``assert-table-uuid`` + ``assert-ref-snapshot-id``
      per modified ref, ``assert-create`` for new tables) and REAL spec
      update actions describing the transition (``add-snapshot``,
      ``set-snapshot-ref``, ``remove-snapshots``, ``add-schema``,
      ``set-properties``, ... — :mod:`.rest_spec`). The in-process test
      server replays the update actions onto its own prior state and
      rejects any commit whose replayed result is not congruent with
      the published artifact, so EVERY engine verb is proved to fully
      describe its transition in spec actions
      (tests/test_rest_spec_native.py's verb-matrix conformance test).
    - **version-addressed fallback** (Delta payloads, foreign or
      unparseable metadata): ``assert-create`` for a table's first
      version, ``{"type": "assert-current-version", "version": N-1}``
      after — the version-addressed twin of ``assert-ref-snapshot-id``,
      enforced server-side the same way.

    In both modes the staged artifact additionally travels as one
    documented update action, ``{"action": "publish-metadata", ...,
    "metadata-b64": ...}`` — the server owns the durable write (what
    production REST catalogs do for metadata), so readers' plain
    file/object GETs are unchanged. Path → identity mapping: the table
    name defaults to the table directory's basename; pass
    ``table_name_for`` to override. tests/test_rest_catalog_committer.py
    drives the full verb flow of BOTH formats, a two-writer race,
    wire-shape capture, and the error taxonomy against the in-process
    REST-shaped server; the two-format CAS fuzzes run under it via
    their committer matrix (the Iceberg fuzz rides spec-native)."""

    _PATTERNS = (
        (
            "iceberg",
            re.compile(
                r"^(?P<table>.+)/metadata/v(?P<ver>\d+)\.metadata\.json$"
            ),
            1,
        ),
        (
            "delta",
            re.compile(r"^(?P<table>.+)/_delta_log/(?P<ver>\d{20})\.json$"),
            0,
        ),
    )

    def __init__(
        self,
        endpoint: str,
        namespace: tuple[str, ...] = ("nocnetintel",),
        prefix: str = "",
        token: str | None = None,
        timeout_s: float = 10.0,
        table_name_for=None,
        spec_native: bool = True,
    ) -> None:
        self.endpoint = endpoint.rstrip("/")
        self.namespace = tuple(namespace)
        self.prefix = prefix.strip("/")
        self.token = token
        self.timeout_s = float(timeout_s)
        self.spec_native = spec_native
        # OBSERVABILITY (round-10 verdict task 3): a deployment must be
        # able to see which conflict-detection mode it is actually
        # getting — every commit that wanted spec-native requirements but
        # fell back to the version-addressed dialect increments this, and
        # the first fallback logs a warning with the reason.
        self.stats: dict[str, int] = {"spec_native_fallbacks": 0}
        self._fallback_warned = False
        self._table_name_for = table_name_for or (
            lambda table_location: os.path.basename(
                table_location.rstrip("/")
            )
        )

    # ---------------------------------------------------------- wire

    def _table_route(self, name: str) -> str:
        import urllib.parse

        ns = urllib.parse.quote("\x1f".join(self.namespace), safe="")
        parts = [self.endpoint, "v1"]
        if self.prefix:
            parts.append(self.prefix)
        parts += ["namespaces", ns, "tables", urllib.parse.quote(name, safe="")]
        return "/".join(parts)

    def _post(self, url: str, body: dict) -> tuple[int, dict | None]:
        """POST ``body``; return (status, parsed error-model dict or
        None). Transport-level failures (DNS, refused, timeout) raise —
        the commit's fate is unknown and the caller must re-resolve."""
        import json as _json
        import urllib.error
        import urllib.request

        headers = {"Content-Type": "application/json"}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        req = urllib.request.Request(
            url, data=_json.dumps(body).encode(), method="POST",
            headers=headers,
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                return r.status, None
        except urllib.error.HTTPError as e:
            try:
                err = _json.loads(e.read().decode()).get("error")
            except Exception:
                err = None
            return e.code, err
        except urllib.error.URLError as e:
            raise RuntimeError(
                f"REST catalog unreachable ({e.reason}) — commit fate "
                "unknown; re-resolve the table head before retrying"
            ) from None

    # ------------------------------------------------------- protocol

    def _parse(self, final_path: str):
        p = final_path.replace(os.sep, "/")
        for fmt, rx, first_ver in self._PATTERNS:
            m = rx.match(p)
            if m:
                ver = int(m.group("ver"))
                return (
                    m.group("table"),
                    self._table_name_for(m.group("table")),
                    fmt,
                    ver,
                    ver == first_ver,
                )
        raise ValueError(
            f"not a versioned lakehouse artifact path: {final_path} — the "
            "REST dialect maps <table>/metadata/v<N>.metadata.json and "
            "<table>/_delta_log/<N>.json commits only"
        )

    def _spec_native_request(
        self, final_path: str, payload: bytes, ver: int, first: bool
    ):
        """SPEC-NATIVE mode (round 9): when the staged artifact parses as
        Iceberg table metadata, generate the real CommitTableRequest —
        requirements asserted from the PRIOR artifact (assert-table-uuid
        + assert-ref-snapshot-id per modified ref) and update actions
        describing the transition (rest_spec.diff_iceberg_metadata). The
        prior artifact is read from storage the same way every reader
        resolves it. Returns (requirements, updates) or (None, None) to
        fall back to the version-addressed dialect (Delta payloads,
        foreign/unparseable metadata, missing prior)."""
        import json as _json

        try:
            new_meta = _json.loads(payload)
        except Exception:
            return self._fallback("staged artifact is not JSON")
        if not isinstance(new_meta, dict) or "table-uuid" not in new_meta:
            return self._fallback(
                "staged artifact is not Iceberg table metadata"
            )
        prior = None
        if not first:
            prior_path = re.sub(
                r"v\d+\.metadata\.json$",
                f"v{ver - 1}.metadata.json",
                final_path,
            )
            try:
                with open(prior_path, "rb") as fh:
                    prior = _json.loads(fh.read())
            except Exception:
                return self._fallback(
                    f"prior artifact unreadable ({prior_path})"
                )
        from .rest_spec import diff_iceberg_metadata

        try:
            return diff_iceberg_metadata(prior, new_meta)
        except Exception as e:
            return self._fallback(f"diff_iceberg_metadata failed ({e})")

    def _fallback(self, reason: str):
        """Record a spec-native → version-addressed fallback so the
        weaker conflict-detection mode is observable, not silent."""
        self.stats["spec_native_fallbacks"] += 1
        if not self._fallback_warned:
            self._fallback_warned = True
            import logging

            logging.getLogger(__name__).warning(
                "REST catalog commit fell back from spec-native "
                "requirements to the version-addressed dialect: %s "
                "(further fallbacks counted in "
                "stats['spec_native_fallbacks'] without logging)",
                reason,
            )
        return None, None

    def put_if_absent(self, final_path: str, payload: bytes) -> None:
        import base64

        _loc, name, fmt, ver, first = self._parse(final_path)
        reqs = upds = None
        if self.spec_native and fmt == "iceberg":
            reqs, upds = self._spec_native_request(
                final_path, payload, ver, first
            )
        if reqs is None:
            reqs = (
                [{"type": "assert-create"}]
                if first
                else [{"type": "assert-current-version", "version": ver - 1}]
            )
            upds = []
        body = {
            "identifier": {
                "namespace": list(self.namespace),
                "name": name,
            },
            "requirements": reqs,
            "updates": list(upds)
            + [
                {
                    "action": "publish-metadata",
                    "format": fmt,
                    "version": ver,
                    "metadata-location": final_path,
                    "metadata-b64": base64.b64encode(payload).decode(),
                }
            ],
        }
        status, err = self._post(self._table_route(name), body)
        etype = (err or {}).get("type", "")
        if status in (409, 412) or etype in (
            "CommitFailedException",
            "AlreadyExistsException",
        ):
            raise CatalogCommitConflict(
                f"REST catalog holds {os.path.basename(final_path)} for "
                f"another writer (HTTP {status}"
                + (f", {etype}" if etype else "")
                + ")"
            )
        if status in (200, 201, 204):
            return
        if status in (401, 403, 419):
            raise RuntimeError(
                f"REST catalog rejected credentials (HTTP {status}"
                + (f", {etype}" if etype else "")
                + f") for {final_path}"
            )
        if status == 404:
            raise RuntimeError(
                f"REST catalog: no such table/namespace for {final_path} "
                f"(HTTP 404"
                + (f", {etype}" if etype else "")
                + ") — register the table or fix the namespace mapping"
            )
        raise RuntimeError(
            f"REST catalog error HTTP {status}"
            + (f" ({etype})" if etype else "")
            + f" for {final_path} — commit fate unknown; re-resolve the "
            "table head before retrying"
        )

    def load_table(self, name: str) -> dict:
        """Table DISCOVERY — the read half of the catalog protocol:
        ``GET /v1[/{prefix}]/namespaces/{ns}/tables/{table}`` returns the
        spec's LoadTableResult; the caller hands
        ``metadata-location``'s table root to ``read_iceberg_snapshot``
        (or any reader) and never needs to know storage layout a
        priori. 404 → ``KeyError`` (no such table), auth/availability
        errors surface as ``RuntimeError``."""
        import json as _json
        import urllib.error
        import urllib.request

        headers = {}
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        req = urllib.request.Request(
            self._table_route(name), headers=headers, method="GET"
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                return _json.loads(r.read().decode())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise KeyError(
                    f"no table {name!r} in namespace "
                    f"{'.'.join(self.namespace)}"
                ) from None
            raise RuntimeError(
                f"REST catalog loadTable error HTTP {e.code} for {name!r}"
            ) from None
        except urllib.error.URLError as e:
            raise RuntimeError(
                f"REST catalog unreachable ({e.reason}) for loadTable"
            ) from None

    def publish_hint(self, hint_path: str, value: str) -> None:
        # hints are a HadoopCatalog convenience with no spec twin; ship
        # them as a best-effort update action and swallow every failure
        try:
            name = self._table_name_for(
                os.path.dirname(os.path.dirname(hint_path))
            )
            self._post(
                self._table_route(name),
                {
                    "identifier": {
                        "namespace": list(self.namespace),
                        "name": name,
                    },
                    "requirements": [],
                    "updates": [
                        {
                            "action": "publish-hint",
                            "hint-location": hint_path,
                            "value": value,
                        }
                    ],
                },
            )
        except Exception:
            pass


def committer_from_spec(spec: str) -> CatalogCommitter:
    """Build a committer from a deployment spec string — the
    configuration face of the seam, so installing a remote catalog is
    an environment change, not a code change. Shapes:

    - ``filesystem`` — the POSIX hard-link default;
    - ``commit-service+http://host:port`` — the minimal
      :class:`HttpCommitServiceCommitter` wire shape;
    - ``rest+http://host:port[?ns=a.b&prefix=w&token=t&timeout=10]`` —
      the Iceberg REST-catalog dialect; ``ns`` is dot-separated
      (multipart namespaces), ``token`` is the bearer credential
      (prefer injecting it via the ``SPARK_GRAFT_CATALOG_TOKEN``
      environment variable so the spec itself can be logged).
    """
    spec = spec.strip()
    if spec in ("", "filesystem"):
        return FilesystemCommitter()
    kind, sep, rest = spec.partition("+")
    if not sep:
        raise ValueError(
            f"catalog spec {spec!r} is not 'filesystem', "
            "'commit-service+<url>' or 'rest+<url>[?...]'"
        )
    if kind == "commit-service":
        return HttpCommitServiceCommitter(rest)
    if kind == "rest":
        import urllib.parse

        parts = urllib.parse.urlsplit(rest)
        q = dict(urllib.parse.parse_qsl(parts.query))
        endpoint = urllib.parse.urlunsplit(
            (parts.scheme, parts.netloc, parts.path, "", "")
        )
        token = q.get("token") or os.environ.get(
            "SPARK_GRAFT_CATALOG_TOKEN"
        )
        c = IcebergRestCatalogCommitter(
            endpoint,
            namespace=tuple(q["ns"].split(".")) if q.get("ns") else (
                "nocnetintel",
            ),
            prefix=q.get("prefix", ""),
            token=token,
            timeout_s=float(q.get("timeout", "10")),
        )
        # `coordinator=<name>` declares this endpoint as a Delta commit
        # coordinator (the coordinated-commits handshake identity)
        if q.get("coordinator"):
            c.coordinator_name = q["coordinator"]
        return c
    raise ValueError(f"unknown catalog kind {kind!r} in spec {spec!r}")


_DEFAULT = FilesystemCommitter()
_current: CatalogCommitter = _DEFAULT
_env_applied = False
_env_committer: CatalogCommitter | None = None


def get_committer() -> CatalogCommitter:
    """The process-wide commit endpoint. Honors the
    ``SPARK_GRAFT_CATALOG`` environment spec (resolved once, on first
    use — see :func:`committer_from_spec`) so a deployment points every
    writer at its catalog without touching code. An explicit
    ``set_committer``/``use_committer`` override always wins while
    active; restoring the default restores the ENVIRONMENT's committer,
    not the filesystem fallback — a first call that happens to land
    inside a test's override window must not permanently discard the
    deployment's catalog."""
    global _env_applied, _env_committer
    if not _env_applied:
        spec = os.environ.get("SPARK_GRAFT_CATALOG")
        if spec:
            # build BEFORE latching: a malformed spec must fail CLOSED on
            # every call (writers must never silently fall back to the
            # filesystem committer and bypass the deployment catalog after
            # one swallowed error — round-10 advisor). A raise here leaves
            # _env_applied False so the next call re-raises.
            _env_committer = committer_from_spec(spec)
        _env_applied = True
    if _current is not _DEFAULT:
        return _current
    return _env_committer if _env_committer is not None else _DEFAULT


def set_committer(c: CatalogCommitter | None) -> CatalogCommitter:
    """Install ``c`` as the process-wide commit endpoint (None restores
    the filesystem default). Returns the PREVIOUS committer so tests
    can restore it. Process-wide by design: a catalog is per-deployment
    infrastructure, not per-table state."""
    global _current
    prev = _current
    _current = c if c is not None else _DEFAULT
    return prev


class use_committer:
    """Context manager for tests: ``with use_committer(double): ...``"""

    def __init__(self, c: CatalogCommitter) -> None:
        self._c = c
        self._prev: CatalogCommitter | None = None

    def __enter__(self) -> CatalogCommitter:
        self._prev = set_committer(self._c)
        return self._c

    def __exit__(self, *exc) -> None:
        set_committer(self._prev)
