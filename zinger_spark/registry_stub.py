"""In-process Confluent Schema Registry HTTP stub.

The same move that closed the Kafka seam (kafka_stub.StubBroker):
``codecs.avro.SchemaRegistry`` speaks the public Confluent REST API
(docs.confluent.io/platform/current/schema-registry/develop/api.html)
via urllib, but without a registry process the Avro paths were only
exercised against the in-process ``FakeSchemaRegistry`` object.  This
stub is a real threaded HTTP server implementing the REST subset the
client (and the reference's zavro/decoder.go:54-72 +
zavro/encoder.go:29-51 boundary) uses:

  POST /subjects/{subject}/versions   register; {"id": N}; identical
                                      schemas (canonical JSON) dedupe
                                      to one global ID, per registry
                                      semantics
  GET  /schemas/ids/{id}              {"schema": "<escaped json>"}
  GET  /subjects                      ["subject", ...]
  GET  /subjects/{subject}/versions   [1, ...] (version list)
  GET  /subjects/{subject}/versions/latest
                                      {"subject","version","id","schema"}
  GET  /config[/{subject}]            {"compatibilityLevel": "..."}
                                      (40408 when no subject override)
  PUT  /config[/{subject}]            set the compatibility mode

Basic auth (``auth=(user, password)``) gates every route with 401 —
the managed-registry deployment the reference's schema_registry.json
user/password fields pair with (cli/flags.go:34-46).

Errors use the registry's JSON shape: 404 + {"error_code": 40403}
(schema not found) / 40401 (subject not found).

Every request is recorded in ``self.requests`` so tests can assert the
client's schema-ID cache (one GET per distinct ID, ever).

Usage:
    with RegistryStub() as reg:
        client = SchemaRegistry(reg.url)
        ...
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class RegistryStub:
    """Threaded single-process Confluent-registry double over HTTP.

    ``auth=(user, password)``: require HTTP basic auth on every route
    (401 + WWW-Authenticate otherwise) — the managed-registry setup the
    reference's schema_registry.json credentials exist for.
    ``compatibility``: the global mode served by GET /config."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        auth: tuple[str, str] | None = None,
        compatibility: str = "BACKWARD",
    ):
        self._lock = threading.RLock()
        self._by_id: dict[int, str] = {}  # id -> canonical schema json
        self._canon_to_id: dict[str, int] = {}
        self._subjects: dict[str, list[int]] = {}  # subject -> [id per version]
        self._subject_compat: dict[str, str] = {}
        self._next = 1
        self.compatibility = compatibility
        self.requests: list[tuple[str, str]] = []
        stub = self
        if auth is not None:
            import base64

            expect_auth = "Basic " + base64.b64encode(
                f"{auth[0]}:{auth[1]}".encode()
            ).decode()
        else:
            expect_auth = None

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence default stderr access log
                pass

            def _reply(self, code: int, body) -> None:
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", _CONTENT_TYPE)
                if code == 401:
                    self.send_header(
                        "WWW-Authenticate", 'Basic realm="registry"'
                    )
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _error(self, http_code: int, error_code: int, msg: str) -> None:
                self._reply(http_code, {"error_code": error_code, "message": msg})

            def _authorized(self) -> bool:
                if expect_auth is None:
                    return True
                if self.headers.get("Authorization") == expect_auth:
                    return True
                self._error(401, 401, "Unauthorized")
                return False

            def do_GET(self):
                with stub._lock:
                    stub.requests.append(("GET", self.path))
                    if not self._authorized():
                        return None
                    parts = [p for p in self.path.split("/") if p]
                    if parts == ["config"]:
                        return self._reply(
                            200, {"compatibilityLevel": stub.compatibility}
                        )
                    if len(parts) == 2 and parts[0] == "config":
                        level = stub._subject_compat.get(parts[1])
                        if level is None:
                            # per the API: no subject-level override
                            return self._error(
                                404, 40408,
                                "Subject compatibility not configured",
                            )
                        return self._reply(
                            200, {"compatibilityLevel": level}
                        )
                    if parts == ["subjects"]:
                        return self._reply(200, sorted(stub._subjects))
                    if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                        try:
                            sid = int(parts[2])
                        except ValueError:
                            return self._error(404, 40403, "Schema not found")
                        schema = stub._by_id.get(sid)
                        if schema is None:
                            return self._error(404, 40403, "Schema not found")
                        return self._reply(200, {"schema": schema})
                    if len(parts) >= 3 and parts[0] == "subjects" and parts[2] == "versions":
                        subject = parts[1]
                        versions = stub._subjects.get(subject)
                        if versions is None:
                            return self._error(404, 40401, "Subject not found")
                        if len(parts) == 3:
                            return self._reply(
                                200, list(range(1, len(versions) + 1))
                            )
                        want = parts[3]
                        v = (
                            len(versions)
                            if want == "latest"
                            else int(want)
                        )
                        if not 1 <= v <= len(versions):
                            return self._error(404, 40402, "Version not found")
                        sid = versions[v - 1]
                        return self._reply(
                            200,
                            {
                                "subject": subject,
                                "version": v,
                                "id": sid,
                                "schema": stub._by_id[sid],
                            },
                        )
                    return self._error(404, 404, f"no route {self.path}")

            def do_PUT(self):
                with stub._lock:
                    stub.requests.append(("PUT", self.path))
                    if not self._authorized():
                        return None
                    parts = [p for p in self.path.split("/") if p]
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n)) if n else {}
                    level = body.get("compatibility", "BACKWARD")
                    if parts == ["config"]:
                        stub.compatibility = level
                        return self._reply(200, {"compatibility": level})
                    if len(parts) == 2 and parts[0] == "config":
                        stub._subject_compat[parts[1]] = level
                        return self._reply(200, {"compatibility": level})
                    return self._error(404, 404, f"no route {self.path}")

            def do_POST(self):
                with stub._lock:
                    stub.requests.append(("POST", self.path))
                    if not self._authorized():
                        return None
                    parts = [p for p in self.path.split("/") if p]
                    if (
                        len(parts) == 3
                        and parts[0] == "subjects"
                        and parts[2] == "versions"
                    ):
                        n = int(self.headers.get("Content-Length", "0"))
                        body = json.loads(self.rfile.read(n))
                        # canonicalize so byte-identical semantics dedupe
                        # to ONE global id (registry semantics)
                        canon = json.dumps(
                            json.loads(body["schema"]), sort_keys=True
                        )
                        sid = stub._canon_to_id.get(canon)
                        if sid is None:
                            sid = stub._next
                            stub._next += 1
                            stub._canon_to_id[canon] = sid
                            stub._by_id[sid] = canon
                        versions = stub._subjects.setdefault(parts[1], [])
                        if sid not in versions:
                            versions.append(sid)
                        return self._reply(200, {"id": sid})
                    return self._error(404, 404, f"no route {self.path}")

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="registry-stub", daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "RegistryStub":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- test conveniences --------------------------------------------------

    def get_count(self, path_prefix: str = "/schemas/ids/") -> int:
        """How many GETs hit ``path_prefix`` — cache-behavior probe."""
        return sum(
            1
            for m, p in self.requests
            if m == "GET" and p.startswith(path_prefix)
        )
