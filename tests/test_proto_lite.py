"""Protobuf payload decode (extension): .proto parser, wire codec,
framing, registry schemaType plumbing, and the wire-source e2e — the
protobuf half of the payload-decode pair (see tests/test_avro_lite.py)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from roar_spark.proto_lite import (
    decode,
    encode,
    frame,
    message_struct,
    parse_proto,
    unframe,
)

EVENT_PROTO = '''
syntax = "proto3";
package demo;

// registry-style event payload
message Event {
  int64 id = 1;
  string name = 2;
  double score = 3;
  float ratio = 4;
  bool ok = 5;
  bytes blob = 6;
  repeated int32 nums = 7 [packed = true];
  repeated string tags = 8;
  Kind kind = 9;
  Inner inner = 10;
  repeated Inner inners = 11;
  sint64 delta = 12;
  fixed32 f32 = 13;
  sfixed64 sf64 = 14;
  uint64 big = 15;
  oneof choice {
    string s_choice = 16;
    int32 i_choice = 17;
  }

  message Inner {
    int32 x = 1;
  }
}

enum Kind {
  KIND_UNSPECIFIED = 0;
  ALPHA = 1;
  BETA = 2;
}
'''


def _event_file():
    return parse_proto(EVENT_PROTO)


def test_parser_structure_and_scope_resolution():
    pf = _event_file()
    assert pf.package == "demo"
    assert pf.messages == ("demo.Event",)
    ev = pf.root([0])
    by_name = {f.name: f for f in ev.fields}
    assert by_name["inner"].type_name == "demo.Event.Inner"  # innermost scope
    assert by_name["kind"].type_name == "demo.Kind"  # package scope
    assert by_name["nums"].repeated and by_name["nums"].type == "int32"
    assert by_name["s_choice"].type == "string"  # oneof members are fields


def test_parser_rejects_unsupported_constructs():
    with pytest.raises(ValueError, match="map"):
        parse_proto('syntax="proto3"; message M { map<string, int32> m = 1; }')
    with pytest.raises(ValueError, match="import"):
        parse_proto('syntax="proto3"; import "other.proto"; message M {}')
    with pytest.raises(ValueError, match="proto3"):
        parse_proto('syntax="proto2"; message M {}')


def test_full_roundtrip_every_field_kind():
    pf = _event_file()
    ev = pf.root([0])
    rec = {
        "id": -5,
        "name": "héllo",
        "score": 2.5,
        "ratio": 0.25,
        "ok": True,
        "blob": b"\x00\x01",
        "nums": [1, -2, 300000],
        "tags": ["a", "b"],
        "kind": "BETA",
        "inner": {"x": 7},
        "inners": [{"x": 1}, {"x": 2}],
        "delta": -12_345_678_901,
        "f32": 4_000_000_000,
        "sf64": -9,
        "big": 2**63 - 1,
        "s_choice": "pick-me",
        "i_choice": 0,
    }
    out = decode(encode(rec, ev, pf.types), ev, pf.types)
    assert out == rec


def test_proto3_defaults_fill_absent_fields():
    pf = _event_file()
    ev = pf.root([0])
    out = decode(encode({"id": 1}, ev, pf.types), ev, pf.types)
    assert out["name"] == "" and out["score"] == 0.0 and out["ok"] is False
    assert out["nums"] == [] and out["inner"] is None
    assert out["kind"] == "KIND_UNSPECIFIED"  # zero symbol by name


def test_unknown_field_numbers_skipped_reader_evolution():
    """Proto evolution is field-number-based: a writer with MORE fields
    decodes under an older reader (unknowns skipped), a writer with FEWER
    fields under a newer reader (defaults fill) — no registry lookup
    needed, which is why proto_converter decodes with the reader alone."""
    writer = parse_proto(
        'syntax="proto3"; message E { int32 a = 1; string extra = 9; double d = 3; }'
    )
    reader = parse_proto(
        'syntax="proto3"; message E { int32 a = 1; double d = 3; bool added = 4; }'
    )
    body = encode(
        {"a": 5, "extra": "dropped", "d": 1.5}, writer.root([0]), writer.types
    )
    out = decode(body, reader.root([0]), reader.types)
    assert out == {"a": 5, "d": 1.5, "added": False}


def test_expanded_repeated_accepted_alongside_packed():
    pf = _event_file()
    ev = pf.root([0])
    expanded = bytearray()
    for v in (3, 4):  # field 7 in the non-packed (expanded) form
        expanded += bytes([(7 << 3) | 0, v])
    assert decode(bytes(expanded), ev, pf.types)["nums"] == [3, 4]


def test_uint64_wraps_into_signed_long():
    pf = parse_proto('syntax="proto3"; message U { uint64 v = 1; fixed64 f = 2; }')
    msg = pf.root([0])
    body = encode({"v": 2**64 - 1, "f": 2**64 - 2}, msg, pf.types)
    out = decode(body, msg, pf.types)
    assert out == {"v": -1, "f": -2}  # documented long-mode wrap


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=40),
    st.floats(allow_nan=False, allow_infinity=False),
    st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=8),
    st.booleans(),
)
def test_roundtrip_property(n, s, f, arr, ok):
    pf = parse_proto(
        'syntax="proto3"; message P { int64 n = 1; string s = 2; double f = 3;'
        " repeated sint32 arr = 4; bool ok = 5; }"
    )
    msg = pf.root([0])
    rec = {"n": n, "s": s, "f": f, "arr": arr, "ok": ok}
    assert decode(encode(rec, msg, pf.types), msg, pf.types) == rec


# --- framing ------------------------------------------------------------------


def test_confluent_framing_with_message_indexes():
    assert unframe(frame(42, b"xx")) == (42, [0], b"xx")
    assert unframe(frame(7, b"yy", [1, 2])) == (7, [1, 2], b"yy")
    with pytest.raises(ValueError, match="framed"):
        unframe(b"\x01\x00\x00\x00\x07\x00zz")


def test_root_rejects_nested_index_paths():
    with pytest.raises(ValueError, match="unsupported"):
        _event_file().root([0, 1])


# --- Spark mapping --------------------------------------------------------------


def test_spark_schema_mapping():
    pf = _event_file()
    assert message_struct(pf.root([0]), pf.types).simpleString() == (
        "struct<id:bigint,name:string,score:double,ratio:float,ok:boolean,"
        "blob:binary,nums:array<int>,tags:array<string>,kind:string,"
        "inner:struct<x:int>,inners:array<struct<x:int>>,delta:bigint,"
        "f32:bigint,sf64:bigint,big:bigint,s_choice:string,i_choice:int>"
    )


# --- registry schemaType plumbing ------------------------------------------------


def test_registry_carries_protobuf_schema_type():
    from roar_spark.avro_lite import SchemaRegistryLite
    from roar_spark.schema_registry_http import HttpSchemaRegistry, RegistryHttpServer
    from roar_spark.proto_lite import ProtoFile

    with RegistryHttpServer(SchemaRegistryLite()) as server:
        client = HttpSchemaRegistry(server.url)
        sid = client.register("ev-value", EVENT_PROTO, schema_type="PROTOBUF")
        latest_id, parsed = client.latest("ev-value")
        assert latest_id == sid
        assert isinstance(parsed, ProtoFile)
        assert isinstance(client.schemas_by_id().get(sid), ProtoFile)


# --- e2e: wire source → proto converter → served table ----------------------------


def test_proto_topic_end_to_end_over_wire_source(spark, tmp_path):
    from roar_spark.avro_lite import SchemaRegistryLite
    from roar_spark.config import EngineConfig
    from roar_spark.schema_registry_http import HttpSchemaRegistry, RegistryHttpServer
    from roar_spark.sources.kafka_broker import KafkaBroker
    from roar_spark.sources.kafka_python import kafka_python_envelope_stream
    from roar_spark.sources.kafka_wire import KafkaRecord, KafkaWireClient
    from roar_spark.streaming.manager import StreamEngine
    from roar_spark.streaming.proto import encode_framed, proto_converter

    with RegistryHttpServer(SchemaRegistryLite()) as reg_server:
        registry = HttpSchemaRegistry(reg_server.url)
        sid = registry.register("prototop-value", EVENT_PROTO, schema_type="PROTOBUF")
        _, reader_file = registry.latest("prototop-value")

        with KafkaBroker(default_partitions=1) as broker:
            with KafkaWireClient(broker.bootstrap) as client:
                msgs = [
                    KafkaRecord(
                        i,
                        1_770_000_000_000 + i,
                        f"k{i}".encode(),
                        encode_framed(
                            {
                                "id": i,
                                "name": f"n{i}",
                                "score": i * 0.5,
                                "nums": [i, i + 1],
                                "kind": "ALPHA" if i % 2 else "BETA",
                                "inner": {"x": i * 10},
                            },
                            reader_file,
                            sid,
                        ),
                    )
                    for i in range(5)
                ]
                client.produce("prototop", 0, msgs)

            config = EngineConfig(
                brokers=broker.bootstrap,
                topics=("prototop",),
                starting_offsets="earliest",
                flush_interval_seconds=1,
                checkpoint_path=str(tmp_path / "ckpt"),
            )
            engine = StreamEngine(spark, config, store_base=str(tmp_path / "store"))
            conv, schema = proto_converter(reader_file, known_ids={sid})
            engine.register_converter("prototop", conv, schema)
            engine.register_stream("prototop", [])
            env = kafka_python_envelope_stream(spark, config, ("prototop",)).drop(
                "topic"
            )
            engine.ingest("prototop", env)
            try:
                engine._handle("prototop").query.processAllAvailable()
                rows = {
                    r.kafka_offset: r
                    for r in engine.fetch("prototop", limit=-1).collect()
                }
                assert len(rows) == 5
                assert rows[3].name == "n3" and rows[3].kind == "ALPHA"
                assert rows[2].score == 1.0 and list(rows[2].nums) == [2, 3]
                assert rows[4].inner.x == 40
                assert rows[0].ok is False and rows[0].inner.x == 0
            finally:
                engine.stop()
