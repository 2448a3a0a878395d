"""Arrow-Flight STREAMING SOURCE — feeds a roar-style Flight server's DoGet
stream into Structured Streaming (the "Structured Streaming with Arrow
Flight source" leg of the north-star design; BASELINE.json).

The read path is the reference client's exact sequence — connect →
GetFlightInfo(path) → DoGet(ticket) → Arrow table (cmd/client.go:121-171) —
wrapped in Spark's Python streaming data-source API so each micro-batch
polls the server once and appends only the rows past the last checkpointed
high-water mark:

    spark.dataSource.register(FlightStreamDataSource)
    (spark.readStream.format("roar_flight")
          .option("location", "grpc://host:port")
          .option("topic", "events").load())

Offset model: the server's DoGet returns the buffered snapshot in append
order, so the offset is the ROW HIGH-WATER MARK ``{"rows": n}`` — batch k
delivers ``snapshot[rows_k-1:]`` and advances to ``{"rows": len(snapshot)}``.
``maxRowsPerBatch`` rate-limits a batch exactly like Kafka's
maxOffsetsPerTrigger (the residue stays buffered server-side and the next
poll resumes from the mark). The roar buffer is drop-oldest under a byte
cap (stream/manager.go AddBatch), so a snapshot can SHRINK between polls;
when ``len(snapshot) < rows`` the source re-delivers the whole snapshot —
at-least-once under eviction, exactly-once while the buffer holds (the
same contract a reference client polling DoGet gets).

Scale path: ``SimpleDataSourceStreamReader`` polls on the driver — correct
for the facade's single-endpoint servers and exactly the reference
client's single-connection behavior. A sharded Flight service advertises
one endpoint per shard in FlightInfo; the 1000-executor variant of this
source is the full ``DataSourceStreamReader`` with one InputPartition per
endpoint (each executor DoGets its own shard) — same offset model per
endpoint, no other change. Not needed against the single-endpoint facade.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Tuple  # noqa: F401

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa

    from roar_spark.streaming.manager import StreamEngine, StreamHandle


def _fetch_snapshot(location: str, topic: str) -> "pa.Table":
    """GetFlightInfo → DoGet, the reference client's read path
    (cmd/client.go:121-171). A fresh connection per poll: polls are
    seconds apart and a cached gRPC channel would hold a socket open
    across micro-batches for no measured gain."""
    import pyarrow.flight as flight

    client = flight.connect(location)
    try:
        info = client.get_flight_info(flight.FlightDescriptor.for_path(topic))
        return client.do_get(info.endpoints[0].ticket).read_all()
    finally:
        client.close()


def remote_spark_schema(location: str, topic: str) -> StructType:
    """The served stream's schema as a Spark StructType (GetSchema RPC →
    Arrow schema → StructType) — what a consumer registers its local
    stream with so the typed rows pass through unconverted."""
    import pyarrow.flight as flight

    from pyspark.sql.pandas.types import from_arrow_schema

    client = flight.connect(location)
    try:
        result = client.get_schema(flight.FlightDescriptor.for_path(topic))
        schema = from_arrow_schema(result.schema)
    finally:
        client.close()
    # ALL-NULLABLE on the consumer side: the server's frozen schema marks
    # payload fields non-nullable, but JSON parsing yields NULL for any
    # payload that omitted a field — nullability is a hint the data can
    # violate, and declaring it through the source makes Spark's codegen
    # NPE on the first such row (UnsafeWriter.write on a null UTF8String)
    return StructType(
        [StructField(f.name, f.dataType, True, f.metadata) for f in schema.fields]
    )


class FlightSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._location = options["location"]
        self._topic = options["topic"]
        self._fields = schema.fieldNames()
        self._max_rows = int(options.get("maxrowsperbatch", 0)) or None
        self._starting = options.get("startingoffsets", "earliest").lower()

    def initialOffset(self) -> dict:
        if self._starting == "latest":
            # one bootstrap poll pins the mark at the current buffer end —
            # Kafka's startingOffsets=latest semantics
            return {"rows": _fetch_snapshot(self._location, self._topic).num_rows}
        return {"rows": 0}

    def _rows(self, table: "pa.Table") -> Iterator[Tuple]:
        # a LIST iterator, not a generator: the engine copy.copy()s the
        # prefetched iterator when serving the cached batch and pickles it
        # to ship driver→executor — list iterators support both, generators
        # neither (datasource_internal.py getCache)
        fields = self._fields
        return iter([tuple(rec[name] for name in fields) for rec in table.to_pylist()])

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        table = _fetch_snapshot(self._location, self._topic)
        mark = start["rows"]
        if table.num_rows < mark:
            mark = 0  # buffer evicted/reset past our mark: re-deliver (see module doc)
        sliced = table.slice(mark)
        if self._max_rows is not None and sliced.num_rows > self._max_rows:
            sliced = sliced.slice(0, self._max_rows)
        return self._rows(sliced), {"rows": mark + sliced.num_rows}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # failure replay: re-poll and re-slice the checkpointed range.
        # Exact while the buffer still holds those rows; under eviction the
        # replay is best-effort (at-least-once, same as the live path).
        table = _fetch_snapshot(self._location, self._topic)
        lo = min(start["rows"], table.num_rows)
        hi = min(end["rows"], table.num_rows)
        return self._rows(table.slice(lo, max(hi - lo, 0)))

    def commit(self, end: dict) -> None:
        pass  # nothing to release server-side: DoGet is a stateless snapshot


class FlightStreamDataSource(DataSource):
    """``format("roar_flight")`` — options: ``location`` (grpc://host:port),
    ``topic`` (served stream name), ``maxRowsPerBatch`` (rate limit),
    ``startingOffsets`` (earliest|latest, default earliest)."""

    @classmethod
    def name(cls) -> str:
        return "roar_flight"

    def schema(self) -> StructType:
        return remote_spark_schema(self.options["location"], self.options["topic"])

    def simpleStreamReader(self, schema: StructType) -> FlightSimpleStreamReader:
        return FlightSimpleStreamReader(schema, self.options)


def flight_envelope_stream(spark, location: str, topic: str, **options: str):
    """Streaming DataFrame of the remote stream's TYPED rows (registers the
    data source on this session idempotently)."""
    spark.dataSource.register(FlightStreamDataSource)
    reader = (
        spark.readStream.format("roar_flight")
        .option("location", location)
        .option("topic", topic)
    )
    for key, value in options.items():
        reader = reader.option(key, value)
    return reader.load()


def ingest_from_flight(
    engine: "StreamEngine",
    topic: str,
    location: str,
    remote_topic: str | None = None,
    **options: str,
) -> "StreamHandle":
    """Engine-to-engine replication: consume another engine's served stream
    through the Flight source into THIS engine's store. The rows arrive
    already typed (the remote schema via GetSchema), so the local stream
    registers an identity converter with that schema — no payload
    re-serialization, no re-inference drift between the two engines."""
    remote_topic = remote_topic or topic
    schema = remote_spark_schema(location, remote_topic)
    engine.register_converter(
        topic, lambda env, s=schema: env.select(*s.fieldNames()), schema
    )
    engine.register_stream(topic, [])  # converter schema; sample ignored
    envelope = flight_envelope_stream(engine._spark, location, remote_topic, **options)
    engine.ingest(topic, envelope)
    return engine._handle(topic)
