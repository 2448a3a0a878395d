"""HTTP schema registry: Confluent-REST-subset server + client (extension).

The reference's ``--schema-registry`` flag takes a URL
(kafka/consumer.go:103) and never dials it. This gives the URL something
real to mean, from the PUBLIC registry REST surface only — the three
routes the decode path needs:

- ``GET  /schemas/ids/{id}``                 → ``{"schema": <raw json>}``
- ``POST /subjects/{subject}/versions``      → ``{"id": <int>}``
- ``GET  /subjects/{subject}/versions/latest``
  → ``{"id", "version", "subject", "schema"}``

Server: a thread-serving façade over ``SchemaRegistryLite`` following the
repo's lifecycle contract (start returns only once the socket serves,
shutdown joins). Client: ``HttpSchemaRegistry`` — the same ``register`` /
``latest`` / ``by_id`` surface as the in-memory registry, plus
``schemas_by_id()`` returning a PICKLABLE lazy mapping so
``avro_converter`` can resolve writer ids from executors (each worker
keeps its own id→schema cache; ids are immutable in a registry, so the
cache never invalidates). Against a real Confluent registry the same
routes resolve. Schema types: AVRO (default, type field omitted upstream)
and PROTOBUF (``schemaType`` carried on register and returned on fetch,
parsed by ``proto_lite``); JSON-Schema is not implemented.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from roar_spark.avro_lite import AvroSchema, SchemaRegistryLite, parse_schema


def _parse_by_type(payload: dict):
    """Registry response → parsed schema (Confluent omits schemaType for
    AVRO; PROTOBUF responses carry it explicitly)."""
    if payload.get("schemaType", "AVRO") == "PROTOBUF":
        from roar_spark.proto_lite import parse_proto

        return parse_proto(payload["schema"])
    return parse_schema(payload["schema"])


class RegistryHttpServer:
    """Threaded HTTP façade over a SchemaRegistryLite instance."""

    def __init__(self, registry: SchemaRegistryLite, port: int = 0) -> None:
        self.registry = registry
        reg = registry

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args) -> None:  # quiet test output
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header(
                    "Content-Type", "application/vnd.schemaregistry.v1+json"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:
                parts = [p for p in self.path.split("/") if p]
                try:
                    if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                        sid = int(parts[2])
                        payload = {"schema": reg._raw_by_id[sid]}
                        if reg.type_of(sid) != "AVRO":  # upstream omits AVRO
                            payload["schemaType"] = reg.type_of(sid)
                        self._reply(200, payload)
                    elif (
                        len(parts) == 4
                        and parts[0] == "subjects"
                        and parts[2] == "versions"
                        and parts[3] == "latest"
                    ):
                        subject = parts[1]
                        sid, _ = reg.latest(subject)
                        payload = {
                            "id": sid,
                            "version": len(reg._subjects[subject]),
                            "subject": subject,
                            "schema": reg._raw_by_id[sid],
                        }
                        if reg.type_of(sid) != "AVRO":
                            payload["schemaType"] = reg.type_of(sid)
                        self._reply(200, payload)
                    else:
                        self._reply(404, {"error_code": 404, "message": "not found"})
                except KeyError:
                    # the public registry's not-found codes: 40403 schema,
                    # 40401 subject
                    code = 40403 if parts[:2] == ["schemas", "ids"] else 40401
                    self._reply(404, {"error_code": code, "message": "not found"})

            def do_POST(self) -> None:
                parts = [p for p in self.path.split("/") if p]
                if not (
                    len(parts) == 3
                    and parts[0] == "subjects"
                    and parts[2] == "versions"
                ):
                    self._reply(404, {"error_code": 404, "message": "not found"})
                    return
                length = int(self.headers.get("Content-Length", "0"))
                try:
                    payload = json.loads(self.rfile.read(length))
                    sid = reg.register(
                        parts[1],
                        payload["schema"],
                        payload.get("schemaType", "AVRO"),
                    )
                except (ValueError, KeyError) as exc:
                    self._reply(
                        422, {"error_code": 42201, "message": f"invalid schema: {exc}"}
                    )
                    return
                self._reply(200, {"id": sid})

        self._server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="schema-registry", daemon=True
        )

    @property
    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}"

    def start(self) -> "RegistryHttpServer":
        self._thread.start()
        # readiness: one real round-trip (the flight_facade lifecycle rule)
        req = urllib.request.Request(f"{self.url}/schemas/ids/0")
        try:
            urllib.request.urlopen(req, timeout=5)
        except urllib.error.HTTPError:
            pass  # 404 is a served response — the socket is up
        return self

    def shutdown(self) -> None:
        self._server.shutdown()
        self._thread.join(timeout=10.0)
        self._server.server_close()

    def __enter__(self) -> "RegistryHttpServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.shutdown()


class _LazySchemasById:
    """Picklable id→AvroSchema mapping backed by the registry REST API.
    Ids are immutable upstream, so the per-process cache never expires;
    each executor resolves an id at most once per converter lifetime."""

    def __init__(self, base_url: str) -> None:
        self._base_url = base_url.rstrip("/")
        self._cache: dict[int, AvroSchema] = {}

    def __getstate__(self):
        return {"_base_url": self._base_url}  # cache stays process-local

    def __setstate__(self, state):
        self._base_url = state["_base_url"]
        self._cache = {}

    def get(self, schema_id: int):
        if schema_id in self._cache:
            return self._cache[schema_id]
        try:
            with urllib.request.urlopen(
                f"{self._base_url}/schemas/ids/{int(schema_id)}", timeout=10
            ) as resp:
                payload = json.loads(resp.read())
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                return None
            raise
        parsed = _parse_by_type(payload)
        self._cache[schema_id] = parsed
        return parsed

    def __getitem__(self, schema_id: int) -> AvroSchema:
        out = self.get(schema_id)
        if out is None:
            raise KeyError(schema_id)
        return out


class HttpSchemaRegistry:
    """Client with the same surface the converter and tests use on
    SchemaRegistryLite: register / latest / by_id / schemas_by_id."""

    def __init__(self, base_url: str) -> None:
        self._base_url = base_url.rstrip("/")
        self._lazy = _LazySchemasById(self._base_url)

    def register(
        self, subject: str, schema: str | dict, schema_type: str = "AVRO"
    ) -> int:
        raw = schema if isinstance(schema, str) else json.dumps(schema)
        body: dict = {"schema": raw}
        if schema_type != "AVRO":
            body["schemaType"] = schema_type
        req = urllib.request.Request(
            f"{self._base_url}/subjects/{subject}/versions",
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            return int(json.loads(resp.read())["id"])

    def latest(self, subject: str):
        with urllib.request.urlopen(
            f"{self._base_url}/subjects/{subject}/versions/latest", timeout=10
        ) as resp:
            payload = json.loads(resp.read())
        return int(payload["id"]), _parse_by_type(payload)

    def by_id(self, schema_id: int):
        return self._lazy[schema_id]

    def schemas_by_id(self) -> _LazySchemasById:
        return self._lazy
