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

            with lock:
                for req in body.get("requirements", []):
                    if req["type"] == "assert-create":
                        if key in tables:
                            return self._error(
                                409,
                                "AlreadyExistsException",
                                f"table {key} already exists",
                            )
                    elif req["type"] == "assert-current-version":
                        if key not in tables:
                            # registry bootstrap: accept a table created
                            # outside this catalog iff the asserted prior
                            # artifact is actually on storage
                            import os

                            loc = pub["metadata-location"] if pub else ""
                            prior = _prior_artifact(loc, req["version"])
                            if prior and os.path.exists(prior):
                                tables[key] = req["version"]
                            else:
                                return self._error(
                                    404,
                                    "NoSuchTableException",
                                    f"unknown table {key}",
                                )
                        if tables[key] != req["version"]:
                            return self._error(
                                409,
                                "CommitFailedException",
                                f"requirement failed: current version is "
                                f"{tables[key]}, not {req['version']}",
                            )
                    else:
                        return self._error(
                            400,
                            "BadRequestException",
                            f"unsupported requirement {req['type']}",
                        )
                if pub is None:
                    return self._error(
                        400, "BadRequestException", "no publish-metadata"
                    )
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
                tables[key] = pub["version"]
                stats["commits"] = stats.get("commits", 0) + 1
            self._reply(
                200, {"metadata-location": pub["metadata-location"]}
            )

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
