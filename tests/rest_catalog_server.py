"""In-process Iceberg-REST-shaped catalog server (round 9 — verdict
task 3). Enforces the commit CAS server-side the way a production REST
catalog does, speaking the dialect documented on
``IcebergRestCatalogCommitter``:

- route: ``POST /v1[/{prefix}]/namespaces/{ns}/tables/{table}``
- requirements: ``assert-create`` (table must not exist) and
  ``assert-current-version`` (version-addressed optimistic concurrency);
  a failed requirement returns the spec error model
  ``{"error": {"message", "type": "CommitFailedException"|"AlreadyExistsException", "code": 409}}``
- updates: ``publish-metadata`` (the server owns the durable artifact
  write — storage-level put-if-absent backstops the registry) and
  best-effort ``publish-hint``
- auth: when constructed with ``token``, requests without the matching
  ``Authorization: Bearer`` header get 401.

Shared by the wire-shape/verb-flow/race tests and the two formats' CAS
fuzz matrices. Not a pytest file — no ``test_`` names here.
"""

from __future__ import annotations

import base64
import contextlib
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from mysoftware_nocnetintel_spark.sources.catalog import (
    CatalogCommitConflict,
    FilesystemCommitter,
)


def _make_handler(stats: dict, token: str | None, prefix: str):
    fs = FilesystemCommitter()
    lock = threading.Lock()
    tables: dict = stats.setdefault("tables", {})  # key -> current version

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: dict | None = None) -> None:
            body = json.dumps(obj or {}).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, etype: str, msg: str) -> None:
            stats["errors"] = stats.get("errors", 0) + 1
            self._reply(
                code, {"error": {"message": msg, "type": etype, "code": code}}
            )

        def do_POST(self):  # noqa: N802 (http.server API)
            stats.setdefault("requests", []).append(
                {
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                }
            )
            forced = stats.get("force_status")
            if forced is not None:
                code, etype = forced
                return self._error(code, etype, "forced by test")
            if token is not None and (
                self.headers.get("Authorization") != f"Bearer {token}"
            ):
                return self._error(
                    401, "NotAuthorizedException", "missing/invalid token"
                )
            parts = [unquote(p) for p in self.path.strip("/").split("/")]
            want = ["v1"] + ([prefix] if prefix else [])
            if (
                parts[: len(want)] != want
                or len(parts) != len(want) + 4
                or parts[len(want)] != "namespaces"
                or parts[len(want) + 2] != "tables"
            ):
                return self._error(404, "NoSuchRouteException", self.path)
            ns, table = parts[len(want) + 1], parts[len(want) + 3]
            key = (ns, table)
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n))
            stats["requests"][-1]["body"] = body

            pub = next(
                (
                    u
                    for u in body.get("updates", [])
                    if u.get("action") == "publish-metadata"
                ),
                None,
            )
            hint = next(
                (
                    u
                    for u in body.get("updates", [])
                    if u.get("action") == "publish-hint"
                ),
                None,
            )
            if hint is not None and pub is None:
                fs.publish_hint(hint["hint-location"], hint["value"])
                return self._reply(200)

            if pub is None:
                return self._error(
                    400, "BadRequestException", "no publish-metadata"
                )
            published_meta = None
            if pub.get("format") == "iceberg":
                try:
                    published_meta = json.loads(
                        base64.b64decode(pub["metadata-b64"])
                    )
                except Exception:
                    published_meta = None
            spec_upds = [
                u
                for u in body.get("updates", [])
                if u.get("action")
                not in ("publish-metadata", "publish-hint")
            ]

            with lock:
                state = tables.get(key)
                reqs = body.get("requirements", [])
                if state is None and not any(
                    r["type"] == "assert-create" for r in reqs
                ):
                    # registry bootstrap: accept a table created outside
                    # this catalog iff the prior artifact is on storage;
                    # for Iceberg, its parsed metadata seeds ref state
                    import os

                    prior_ver = pub["version"] - 1
                    prior_path = _prior_artifact(
                        pub["metadata-location"], prior_ver
                    )
                    if prior_path and os.path.exists(prior_path):
                        prior_meta = None
                        if pub.get("format") == "iceberg":
                            try:
                                prior_meta = json.loads(
                                    open(prior_path, "rb").read()
                                )
                            except Exception:
                                prior_meta = None
                        state = tables[key] = {
                            "version": prior_ver,
                            "meta": prior_meta,
                        }
                    else:
                        return self._error(
                            404,
                            "NoSuchTableException",
                            f"unknown table {key}",
                        )
                for req in reqs:
                    if req["type"] == "assert-create":
                        if state is not None:
                            return self._error(
                                409,
                                "AlreadyExistsException",
                                f"table {key} already exists",
                            )
                    elif req["type"] == "assert-current-version":
                        if state["version"] != req["version"]:
                            return self._error(
                                409,
                                "CommitFailedException",
                                f"requirement failed: current version is "
                                f"{state['version']}, not {req['version']}",
                            )
                    elif req["type"] == "assert-table-uuid":
                        known = (state.get("meta") or {}).get("table-uuid")
                        if known is not None and known != req["uuid"]:
                            return self._error(
                                409,
                                "CommitFailedException",
                                f"table uuid is {known}, not {req['uuid']}",
                            )
                    elif req["type"] == "assert-ref-snapshot-id":
                        from mysoftware_nocnetintel_spark.sources.rest_spec import (  # noqa: E501
                            _refs_view,
                        )

                        have = _refs_view(state.get("meta")) if state else {}
                        cur = have.get(req["ref"])
                        cur_id = cur["snapshot-id"] if cur else None
                        if cur_id != req["snapshot-id"]:
                            return self._error(
                                409,
                                "CommitFailedException",
                                f"ref {req['ref']} is at {cur_id}, "
                                f"not {req['snapshot-id']}",
                            )
                    else:
                        return self._error(
                            400,
                            "BadRequestException",
                            f"unsupported requirement {req['type']}",
                        )
                # SPEC-NATIVE conformance: replay the update actions onto
                # the server's prior state and require the result to be
                # congruent with the published artifact — the property a
                # catalog that materializes metadata itself depends on
                derived = None
                prior_meta = state.get("meta") if state else None
                if spec_upds and (
                    published_meta is not None
                    and (state is None or prior_meta is not None)
                ):
                    from mysoftware_nocnetintel_spark.sources.rest_spec import (  # noqa: E501
                        apply_table_updates,
                        congruence_mismatches,
                    )

                    try:
                        derived = apply_table_updates(prior_meta, spec_upds)
                    except ValueError as e:
                        return self._error(
                            400, "ValidationException", str(e)
                        )
                    mism = congruence_mismatches(derived, published_meta)
                    if mism:
                        return self._error(
                            400,
                            "BadRequestException",
                            "updates do not describe the published "
                            f"transition (mismatched: {mism})",
                        )
                    stats["spec_commits"] = stats.get("spec_commits", 0) + 1
                try:
                    fs.put_if_absent(
                        pub["metadata-location"],
                        base64.b64decode(pub["metadata-b64"]),
                    )
                except CatalogCommitConflict:
                    # storage-level backstop: artifact raced past the
                    # registry (e.g. a non-catalog writer) — still a
                    # commit conflict to the client
                    return self._error(
                        409,
                        "CommitFailedException",
                        f"version {pub['version']} already on storage",
                    )
                tables[key] = {
                    "version": pub["version"],
                    "meta": published_meta,
                    "location": pub["metadata-location"],
                }
                stats["commits"] = stats.get("commits", 0) + 1
            self._reply(
                200, {"metadata-location": pub["metadata-location"]}
            )

        def do_GET(self):  # noqa: N802 — loadTable (spec LoadTableResult)
            stats.setdefault("requests", []).append(
                {
                    "path": self.path,
                    "auth": self.headers.get("Authorization"),
                    "method": "GET",
                }
            )
            if token is not None and (
                self.headers.get("Authorization") != f"Bearer {token}"
            ):
                return self._error(
                    401, "NotAuthorizedException", "missing/invalid token"
                )
            parts = [unquote(p) for p in self.path.strip("/").split("/")]
            want = ["v1"] + ([prefix] if prefix else [])
            if (
                parts[: len(want)] != want
                or len(parts) != len(want) + 4
                or parts[len(want)] != "namespaces"
                or parts[len(want) + 2] != "tables"
            ):
                return self._error(404, "NoSuchRouteException", self.path)
            key = (parts[len(want) + 1], parts[len(want) + 3])
            with lock:
                state = tables.get(key)
            if state is None or not state.get("location"):
                return self._error(
                    404, "NoSuchTableException", f"unknown table {key}"
                )
            out = {"metadata-location": state["location"]}
            if state.get("meta") is not None:
                out["metadata"] = state["meta"]
            self._reply(200, out)

        def log_message(self, *a):  # quiet
            pass

    return Handler


def _prior_artifact(location: str, version: int) -> str | None:
    """Storage path of the asserted prior version, derived from the
    incoming artifact's path shape."""
    import re

    m = re.match(r"^(.+/metadata/)v\d+(\.metadata\.json)$", location)
    if m:
        return f"{m.group(1)}v{version}{m.group(2)}"
    m = re.match(r"^(.+/_delta_log/)\d{20}(\.json)$", location)
    if m:
        return f"{m.group(1)}{version:020d}{m.group(2)}"
    return None


@contextlib.contextmanager
def rest_catalog_server(token: str | None = None, prefix: str = ""):
    """Yield ``(endpoint, stats)`` for a live REST-shaped catalog.
    ``stats['requests']`` records every wire request (path/auth/body);
    set ``stats['force_status'] = (code, etype)`` to force the error
    taxonomy."""
    stats: dict = {}
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), _make_handler(stats, token, prefix.strip("/"))
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", stats
    finally:
        srv.shutdown()
