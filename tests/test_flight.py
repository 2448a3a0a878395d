"""Wire-protocol tests for the Arrow Flight facade (A22-A28 parity)."""

from __future__ import annotations

import json

import pyarrow.flight as flight
import pytest

from roar_spark.config import EngineConfig
from roar_spark.sources.files import read_envelope_batch, write_envelope_file
from roar_spark.streaming.flight_facade import fetch_topic, list_topics, serve_in_thread
from roar_spark.streaming.manager import StreamEngine


@pytest.fixture()
def served_engine(spark, tmp_path):
    engine = StreamEngine(spark, EngineConfig())
    engine.register_stream("clicks", [json.dumps({"n": 1, "kind": "view"})])
    path = str(tmp_path / "data")
    write_envelope_file(
        path,
        [
            {
                "key": f"k{i}",
                "value": json.dumps({"n": i, "kind": "view" if i % 2 else "click"}),
                "timestamp": f"2026-08-13T10:00:{i:02d}Z",
                "offset": i,
                "partition": 0,
            }
            for i in range(20)
        ],
    )
    engine.append_batch("clicks", read_envelope_batch(spark, path))
    server = serve_in_thread(engine)
    yield engine, f"grpc://localhost:{server.port}"
    server.shutdown()
    engine.stop()


def test_list_flights_and_fetch(served_engine):
    _, location = served_engine
    assert list_topics(location) == ["clicks"]
    table = fetch_topic(location, "clicks", limit=5)
    assert table.num_rows == 5
    names = table.schema.names
    assert names[:4] == ["kafka_key", "kafka_timestamp", "kafka_offset", "kafka_partition"]
    assert set(names[4:]) == {"n", "kind"}


def test_fetch_unlimited_and_schema(served_engine):
    _, location = served_engine
    table = fetch_topic(location, "clicks", limit=-1)
    assert table.num_rows == 20
    client = flight.connect(location)
    schema = client.get_schema(flight.FlightDescriptor.for_path("clicks")).schema
    assert "kafka_offset" in schema.names


def test_flight_info_unbounded_totals(served_engine):
    _, location = served_engine
    client = flight.connect(location)
    info = client.get_flight_info(flight.FlightDescriptor.for_path("clicks"))
    assert info.total_records == -1 and info.total_bytes == -1  # server.go:120-121


def test_unknown_topic_not_found_and_no_create_on_probe(served_engine):
    engine, location = served_engine
    client = flight.connect(location)
    # the engine's KeyError crosses the wire as gRPC NOT_FOUND (pyarrow
    # surfaces it as ArrowKeyError) — the reference's exact status code
    # (flight/server.go:156-160), not UNAVAILABLE/UNKNOWN
    import pyarrow as pa

    with pytest.raises(pa.lib.ArrowKeyError):
        client.get_flight_info(flight.FlightDescriptor.for_path("ghost"))
    with pytest.raises(pa.lib.ArrowKeyError):
        client.do_get(flight.Ticket(b"ghost"))
    # reference quirk NOT replicated: the probe must not create a stream
    assert engine.list_streams() == ["clicks"]


def test_actions(served_engine):
    _, location = served_engine
    client = flight.connect(location)
    assert next(iter(client.do_action(flight.Action("health", b"")))).body.to_pybytes() == b"OK"
    topics = next(iter(client.do_action(flight.Action("listTopics", b"")))).body.to_pybytes()
    assert topics == b"clicks"


def test_metadata_rpcs_do_not_touch_stream_state(served_engine):
    """Listing/describing must not refresh the TTL clock or bump the data-
    request counter — the reference bumps LastUpdated only on data reads
    (GetBatches, stream/manager.go:376-386). Only DoGet refreshes."""
    from roar_spark.metrics import REGISTRY

    engine, location = served_engine
    handle = engine._handle("clicks")
    before_ts = handle.last_updated
    before_ctr = REGISTRY.get("roar_flight_stream_requests_total", topic="clicks")

    client = flight.connect(location)
    list(client.list_flights())
    client.get_flight_info(flight.FlightDescriptor.for_path("clicks"))
    client.get_schema(flight.FlightDescriptor.for_path("clicks"))
    assert handle.last_updated == before_ts
    assert REGISTRY.get("roar_flight_stream_requests_total", topic="clicks") == before_ctr

    fetch_topic(location, "clicks", limit=1)  # a data read DOES refresh
    assert handle.last_updated >= before_ts
    assert (
        REGISTRY.get("roar_flight_stream_requests_total", topic="clicks")
        == before_ctr + 1
    )
