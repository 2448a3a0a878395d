"""HTTP schema registry (Confluent REST subset): server/client roundtrip
and the distributed decode path — executors resolving writer schemas over
HTTP. Gives the reference's ``--schema-registry`` URL flag
(kafka/consumer.go:103, never dialed there) a working meaning."""

from __future__ import annotations

import json
import pickle
import urllib.error
import urllib.request

import pytest

from roar_spark.avro_lite import SchemaRegistryLite
from roar_spark.schema_registry_http import (
    HttpSchemaRegistry,
    RegistryHttpServer,
    _LazySchemasById,
)

V1 = {"type": "record", "name": "Ev", "fields": [{"name": "n", "type": "int"}]}
V2 = {
    "type": "record",
    "name": "Ev",
    "fields": [
        {"name": "n", "type": "long"},
        {"name": "s", "type": ["null", "string"], "default": None},
    ],
}


def test_rest_roundtrip_register_latest_by_id():
    with RegistryHttpServer(SchemaRegistryLite()) as server:
        client = HttpSchemaRegistry(server.url)
        i1 = client.register("ev-value", V1)
        i2 = client.register("ev-value", V2)
        assert i1 != i2
        assert client.register("ev-value", V1) == i1  # idempotent, like upstream
        latest_id, reader = client.latest("ev-value")
        assert latest_id == i2
        assert [f[0] for f in reader.fields] == ["n", "s"]
        assert client.by_id(i1).fields[0][0] == "n"


def test_rest_not_found_codes_and_invalid_schema():
    with RegistryHttpServer(SchemaRegistryLite()) as server:
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(f"{server.url}/schemas/ids/99", timeout=5)
        assert err.value.code == 404
        assert json.loads(err.value.read())["error_code"] == 40403
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(
                f"{server.url}/subjects/nope/versions/latest", timeout=5
            )
        assert json.loads(err.value.read())["error_code"] == 40401
        req = urllib.request.Request(
            f"{server.url}/subjects/s/versions",
            data=json.dumps({"schema": '{"type": "nonsense"}'}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=5)
        assert err.value.code == 422


def test_lazy_mapping_survives_pickle_and_caches():
    with RegistryHttpServer(SchemaRegistryLite()) as server:
        client = HttpSchemaRegistry(server.url)
        sid = client.register("p-value", V1)
        lazy = client.schemas_by_id()
        assert lazy[sid].fields[0][0] == "n"
        clone = pickle.loads(pickle.dumps(lazy))  # executor-shipping path
        assert clone._cache == {}  # cache is process-local by design
        assert clone.get(sid).fields[0][0] == "n"
        assert clone.get(999_999) is None
        with pytest.raises(KeyError):
            clone[999_999]


def test_distributed_decode_resolves_writer_ids_over_http(spark, tmp_path):
    """The full --schema-registry story: wire-protocol topic carrying two
    writer versions, converter built from the HTTP registry's latest
    schema, executors resolving each frame's writer id over HTTP."""
    from roar_spark.config import EngineConfig
    from roar_spark.sources.kafka_broker import KafkaBroker
    from roar_spark.sources.kafka_python import kafka_python_envelope_stream
    from roar_spark.sources.kafka_wire import KafkaRecord, KafkaWireClient
    from roar_spark.streaming.avro import avro_converter, encode_framed
    from roar_spark.streaming.manager import StreamEngine

    with RegistryHttpServer(SchemaRegistryLite()) as reg_server:
        registry = HttpSchemaRegistry(reg_server.url)
        id1 = registry.register("regtop-value", V1)
        id2 = registry.register("regtop-value", V2)
        _, reader = registry.latest("regtop-value")

        with KafkaBroker(default_partitions=1) as broker:
            with KafkaWireClient(broker.bootstrap) as client:
                msgs = []
                for i in range(6):
                    if i % 2 == 0:
                        body = encode_framed({"n": i}, registry.by_id(id1), id1)
                    else:
                        body = encode_framed(
                            {"n": i, "s": f"v{i}"}, registry.by_id(id2), id2
                        )
                    msgs.append(
                        KafkaRecord(i, 1_770_000_000_000 + i, f"k{i}".encode(), body)
                    )
                client.produce("regtop", 0, msgs)

            config = EngineConfig(
                brokers=broker.bootstrap,
                topics=("regtop",),
                starting_offsets="earliest",
                flush_interval_seconds=1,
                checkpoint_path=str(tmp_path / "ckpt"),
            )
            engine = StreamEngine(spark, config, store_base=str(tmp_path / "store"))
            conv, schema = avro_converter(registry.schemas_by_id(), reader)
            engine.register_converter("regtop", conv, schema)
            engine.register_stream("regtop", [])
            env = kafka_python_envelope_stream(spark, config, ("regtop",)).drop("topic")
            engine.ingest("regtop", env)
            try:
                engine._handle("regtop").query.processAllAvailable()
                rows = {
                    r.kafka_offset: r
                    for r in engine.fetch("regtop", limit=-1).collect()
                }
                assert len(rows) == 6
                assert rows[0].n == 0 and rows[0].s is None  # v1 → default fills
                assert rows[3].n == 3 and rows[3].s == "v3"  # v2 passthrough
            finally:
                engine.stop()


def test_cli_serve_converter_block_uses_subject_convention():
    """The cmd_serve wiring resolves '<topic>-value' latest and registers
    the converter for exactly the --avro-topics ∩ --topics set."""
    from roar_spark.streaming.avro import avro_converter

    with RegistryHttpServer(SchemaRegistryLite()) as server:
        registry = HttpSchemaRegistry(server.url)
        registry.register("events-value", V2)
        _, reader = registry.latest("events-value")
        conv, schema = avro_converter(registry.schemas_by_id(), reader)
        names = [f.name for f in schema.fields]
        assert names[:4] == [
            "kafka_key",
            "kafka_timestamp",
            "kafka_offset",
            "kafka_partition",
        ]
        assert names[4:] == ["n", "s"]
