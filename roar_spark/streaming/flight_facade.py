"""Arrow Flight serving facade over the StreamEngine — wire-protocol
parity with the reference's Flight server (flight/server.go).

Surface parity (SURVEY.md §2 A22-A26):

- ListFlights  → one FlightInfo per schema-bearing stream: descriptor
  path=[topic], ticket=topic, total_records/bytes = -1 (unbounded stream,
  flight/server.go:120-121)
- GetFlightInfo(topic) → same info; unknown topic → gRPC NOT_FOUND, same
  code as the reference (flight/server.go:156-160): the engine's KeyError
  propagates and pyarrow maps it to NOT_FOUND on the wire (clients see
  ArrowKeyError). We do NOT create-on-probe — §2.3.7.
- metadata RPCs (ListFlights/GetFlightInfo/GetSchema) resolve schemas
  WITHOUT touching stream state: no TTL refresh, no request-counter bump
  (the reference bumps LastUpdated only on data reads, GetBatches —
  stream/manager.go:376-386); DoGet keeps the refresh semantics
- GetSchema    → the stream's Arrow schema (flight/server.go:211-230)
- DoGet        → snapshot of the buffered batches as a record stream;
  empty stream OK (flight/server.go:171-208)
- DoAction     → "health" → "OK"; "listTopics" → comma-joined names;
  anything else → NOT_IMPLEMENTED (flight/server.go:233-245)

The data path is Arrow end-to-end: store snapshot → ``df.toArrow()`` →
Flight IPC — the same columnar hand-off the reference does from its
buffered RecordBatches. Optional component: the engine is fully usable
without it (Spark Connect / temp views are the Spark-native serving path);
this exists so a reference Flight CLIENT can point at this engine instead.
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as flight

from roar_spark.streaming.manager import StreamEngine


class RoarFlightServer(flight.FlightServerBase):
    def __init__(self, engine: StreamEngine, location: str = "grpc://0.0.0.0:0") -> None:
        super().__init__(location)
        self._engine = engine
        self._location = location

    # -- helpers -----------------------------------------------------------

    def _arrow_schema(self, topic: str) -> pa.Schema:
        # straight StructType→Arrow conversion: metadata-only, NO engine
        # fetch — listing/describing a stream must not refresh its TTL or
        # bump roar_flight_stream_requests_total (the reference only bumps
        # LastUpdated on data reads, stream/manager.go:376-386)
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self._engine.get_schema(topic))

    def _info(self, topic: str) -> flight.FlightInfo:
        descriptor = flight.FlightDescriptor.for_path(topic)
        endpoint = flight.FlightEndpoint(topic.encode(), [f"grpc://localhost:{self.port}"])
        return flight.FlightInfo(
            self._arrow_schema(topic), descriptor, [endpoint],
            total_records=-1, total_bytes=-1,  # unbounded (server.go:120-121)
        )

    # -- RPC surface -------------------------------------------------------

    def list_flights(self, context, criteria):  # A22
        for topic in self._engine.list_streams():
            try:
                yield self._info(topic)
            except KeyError:
                # expired between the listing and the schema lookup (TTL
                # janitor runs concurrently) — list the survivors instead
                # of failing the whole RPC
                continue

    # Unknown topics: the engine's KeyError propagates UNCAUGHT — pyarrow
    # maps a Python KeyError raised in a server handler to gRPC NOT_FOUND
    # on the wire (clients see ArrowKeyError), matching the reference's
    # codes.NotFound (flight/server.go:156-160). Wrapping it in a
    # FlightError subclass would DOWNGRADE parity: pyarrow exposes no
    # NOT_FOUND FlightError class, only UNAVAILABLE et al.

    @staticmethod
    def _path_topic(descriptor) -> str:
        # CMD descriptors carry path=None — surface the same NOT_FOUND a
        # wrong path gets, not a TypeError-turned-internal-error
        if not descriptor.path:
            raise KeyError("descriptor has no path (command descriptors unsupported)")
        return descriptor.path[0].decode()

    def get_flight_info(self, context, descriptor):  # A23
        return self._info(self._path_topic(descriptor))

    def get_schema(self, context, descriptor):  # A24
        return flight.SchemaResult(self._arrow_schema(self._path_topic(descriptor)))

    def do_get(self, context, ticket):  # A25
        table = self._engine.fetch(ticket.ticket.decode(), limit=-1).toArrow()
        return flight.RecordBatchStream(table)

    def do_action(self, context, action):  # A26
        if action.type == "health":
            return [b"OK"]
        if action.type == "listTopics":
            return [",".join(self._engine.list_streams()).encode()]
        raise NotImplementedError(f"action {action.type!r}")


def serve_in_thread(engine: StreamEngine, port: int = 0) -> RoarFlightServer:
    """Start the facade on a daemon thread; returns the running server
    (``server.port`` carries the bound port)."""
    server = RoarFlightServer(engine, f"grpc://0.0.0.0:{port}")
    thread = threading.Thread(target=server.serve, daemon=True)
    thread.start()
    return server


# -- thin client (cmd/client.go parity: list topics, fetch with limit) -----


def list_topics(location: str) -> list[str]:
    client = flight.connect(location)
    return [info.descriptor.path[0].decode() for info in client.list_flights()]


def read_topic(location: str, topic: str) -> pa.Table:
    """GetFlightInfo → DoGet → read_all, connection closed — the reference
    client's exact read path (cmd/client.go:121-171), shared by the CLI
    client below and the streaming source (sources/flight.py) so the two
    copies cannot drift (r8 review: the facade copy leaked the channel)."""
    client = flight.connect(location)
    try:
        info = client.get_flight_info(flight.FlightDescriptor.for_path(topic))
        return client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()


def fetch_topic(location: str, topic: str, limit: int = 10) -> pa.Table:
    """read_topic + client-side row limit (the reference applies the limit
    client-side too, cmd/client.go:193)."""
    table = read_topic(location, topic)
    return table.slice(0, limit) if limit is not None and limit >= 0 else table
