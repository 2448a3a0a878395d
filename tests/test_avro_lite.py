"""Avro payload decode (extension): codec, framing, registry, evolution,
and the full wire e2e — completes the reference's dead schema-registry
path (``--schema-registry`` stored at kafka/consumer.go:103, decode TODO
at kafka/consumer.go:660-661) through the A13 converter seam."""

from __future__ import annotations

import datetime as dt
import io

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from roar_spark.avro_lite import (
    SchemaRegistryLite,
    _zigzag,
    decode,
    encode,
    frame,
    parse_schema,
    project_to_reader,
    record_struct,
    unframe,
)

UTC = dt.timezone.utc

RICH_SCHEMA = {
    "type": "record",
    "name": "Ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "score", "type": "double"},
        {"name": "ratio", "type": "float"},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "attrs", "type": {"type": "map", "values": "int"}},
        {"name": "kind", "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]}},
        {"name": "blob", "type": "bytes"},
        {"name": "fx", "type": {"type": "fixed", "name": "F3", "size": 3}},
        {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-millis"}},
        {"name": "tsu", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "nested",
            "type": {"type": "record", "name": "N", "fields": [{"name": "x", "type": "int"}]},
        },
    ],
}


def _rich_record(i=0):
    return {
        "id": -12_345_678_901 + i,
        "name": None if i % 2 else f"name{i}",
        "score": 2.5 + i,
        "ratio": 0.5,
        "ok": i % 2 == 0,
        "tags": [f"t{j}" for j in range(i % 3)],
        "attrs": {"k1": 7, "k2": -3},
        "kind": "B",
        "blob": bytes([0, 1, i % 256]),
        "fx": b"abc",
        "ts": dt.datetime(2026, 8, 16, 12, 0, i % 60, tzinfo=UTC),
        "tsu": dt.datetime(2026, 8, 16, 12, 0, 0, 123456, tzinfo=UTC),
        "d": dt.date(2026, 8, 16),
        "nested": {"x": 42 + i},
    }


# --- codec ------------------------------------------------------------------


def test_rich_record_roundtrip():
    sch = parse_schema(RICH_SCHEMA)
    for i in range(4):
        rec = _rich_record(i)
        assert decode(encode(rec, sch), sch) == rec


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),
    st.floats(allow_nan=False, allow_infinity=False),
    st.binary(max_size=60),
    st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=8),
)
def test_primitive_roundtrip_property(n, s, f, b, arr):
    sch = parse_schema(
        {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": "n", "type": "long"},
                {"name": "s", "type": ["null", "string"], "default": None},
                {"name": "f", "type": "double"},
                {"name": "b", "type": "bytes"},
                {"name": "arr", "type": {"type": "array", "items": "int"}},
            ],
        }
    )
    rec = {"n": n, "s": s, "f": f, "b": b, "arr": arr}
    assert decode(encode(rec, sch), sch) == rec


def test_negative_block_count_array_decodes():
    """The spec's skippable block form: negative item count followed by the
    block's byte size. Writers like the Java library emit it for large
    blocks; a decoder that ignores it mis-parses the stream."""
    buf = io.BytesIO()
    _zigzag(buf, -2)
    inner = io.BytesIO()
    _zigzag(inner, 5)
    _zigzag(inner, 6)
    _zigzag(buf, len(inner.getvalue()))
    buf.write(inner.getvalue())
    _zigzag(buf, 0)
    assert decode(buf.getvalue(), parse_schema({"type": "array", "items": "int"})) == [5, 6]


def test_trailing_bytes_rejected():
    sch = parse_schema({"type": "record", "name": "R", "fields": [{"name": "a", "type": "int"}]})
    with pytest.raises(ValueError, match="trailing"):
        decode(encode({"a": 1}, sch) + b"\x00", sch)


def test_recursive_record_reference():
    sch = parse_schema(
        {
            "type": "record",
            "name": "Node",
            "fields": [
                {"name": "v", "type": "int"},
                {"name": "next", "type": ["null", "Node"], "default": None},
            ],
        }
    )
    rec = {"v": 1, "next": {"v": 2, "next": None}}
    assert decode(encode(rec, sch), sch) == rec


# --- evolution ---------------------------------------------------------------


def test_projection_fills_defaults_drops_unknown_promotes():
    w = parse_schema(
        {
            "type": "record",
            "name": "E",
            "fields": [
                {"name": "a", "type": "int"},
                {"name": "r", "type": "float"},
                {"name": "gone", "type": "string"},
            ],
        }
    )
    r = parse_schema(
        {
            "type": "record",
            "name": "E",
            "fields": [
                {"name": "a", "type": "long"},
                {"name": "r", "type": "double"},
                {"name": "b", "type": ["null", "string"], "default": None},
                {"name": "c", "type": "int", "default": 9},
            ],
        }
    )
    out = project_to_reader(decode(encode({"a": 3, "r": 0.5, "gone": "x"}, w), w), w, r)
    assert out == {"a": 3, "r": 0.5, "b": None, "c": 9}
    assert isinstance(out["a"], int) and isinstance(out["r"], float)


def test_projection_missing_field_without_default_fails():
    w = parse_schema({"type": "record", "name": "E", "fields": []})
    r = parse_schema(
        {"type": "record", "name": "E", "fields": [{"name": "must", "type": "int"}]}
    )
    with pytest.raises(ValueError, match="no default"):
        project_to_reader({}, w, r)


# --- framing + registry -------------------------------------------------------


def test_frame_unframe_and_magic_check():
    sid, body = 7, b"\x02\x04"
    assert unframe(frame(sid, body)) == (sid, body)
    with pytest.raises(ValueError, match="framed"):
        unframe(b"\x01\x00\x00\x00\x07xx")
    with pytest.raises(ValueError, match="framed"):
        unframe(b"\x00\x00")


def test_registry_versions_and_idempotent_register():
    reg = SchemaRegistryLite()
    v1 = {"type": "record", "name": "E", "fields": [{"name": "a", "type": "int"}]}
    v2 = {
        "type": "record",
        "name": "E",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "int", "default": 0}],
    }
    i1, i2 = reg.register("s-value", v1), reg.register("s-value", v2)
    assert i1 != i2
    assert reg.latest("s-value")[0] == i2
    assert reg.register("s-value", v1) == i1  # same raw schema → same id
    assert reg.by_id(i1).fields[0][0] == "a"
    assert set(reg.schemas_by_id()) == {i1, i2}


# --- Spark mapping -------------------------------------------------------------


def test_spark_schema_mapping():
    st_ = record_struct(parse_schema(RICH_SCHEMA))
    assert st_.simpleString() == (
        "struct<id:bigint,name:string,score:double,ratio:float,ok:boolean,"
        "tags:array<string>,attrs:map<string,int>,kind:string,blob:binary,"
        "fx:binary,ts:timestamp,tsu:timestamp,d:date,nested:struct<x:int>>"
    )
    with pytest.raises(ValueError, match="union"):
        record_struct(
            parse_schema(
                {
                    "type": "record",
                    "name": "U",
                    "fields": [{"name": "u", "type": ["int", "string"]}],
                }
            )
        )


# --- e2e: wire source → avro converter → served table ---------------------------


def test_avro_topic_end_to_end_with_mixed_writer_versions(spark, tmp_path):
    """Avro topic over the wire-protocol source, mixed v1/v2 writers in one
    micro-batch, served table committed to the reader schema: defaults
    fill v1 rows, v2's extra column flows through — the pipeline the
    reference's --schema-registry flag promises but never runs."""
    from roar_spark.config import EngineConfig
    from roar_spark.sources.kafka_broker import KafkaBroker
    from roar_spark.sources.kafka_python import kafka_python_envelope_stream
    from roar_spark.sources.kafka_wire import KafkaRecord, KafkaWireClient
    from roar_spark.streaming.avro import avro_converter, encode_framed
    from roar_spark.streaming.manager import StreamEngine

    reg = SchemaRegistryLite()
    id1 = reg.register(
        "avrotop-value",
        {
            "type": "record",
            "name": "Ev",
            "fields": [{"name": "n", "type": "int"}, {"name": "s", "type": "string"}],
        },
    )
    id2 = reg.register(
        "avrotop-value",
        {
            "type": "record",
            "name": "Ev",
            "fields": [
                {"name": "n", "type": "long"},
                {"name": "s", "type": "string"},
                {"name": "extra", "type": ["null", "double"], "default": None},
            ],
        },
    )
    _, reader = reg.latest("avrotop-value")

    with KafkaBroker(default_partitions=1) as broker:
        with KafkaWireClient(broker.bootstrap) as client:
            msgs = []
            for i in range(6):
                if i % 2 == 0:
                    body = encode_framed({"n": i, "s": f"v{i}"}, reg.by_id(id1), id1)
                else:
                    body = encode_framed(
                        {"n": i, "s": f"v{i}", "extra": i + 0.5}, reg.by_id(id2), id2
                    )
                msgs.append(
                    KafkaRecord(i, 1_770_000_000_000 + i * 1000, f"k{i}".encode(), body)
                )
            client.produce("avrotop", 0, msgs)

        config = EngineConfig(
            brokers=broker.bootstrap,
            topics=("avrotop",),
            starting_offsets="earliest",
            flush_interval_seconds=1,
            checkpoint_path=str(tmp_path / "ckpt"),
        )
        engine = StreamEngine(spark, config, store_base=str(tmp_path / "store"))
        conv, schema = avro_converter(reg.schemas_by_id(), reader)
        engine.register_converter("avrotop", conv, schema)
        handle = engine.register_stream("avrotop", [])
        assert handle.schema == schema
        env = kafka_python_envelope_stream(spark, config, ("avrotop",)).drop("topic")
        engine.ingest("avrotop", env)
        try:
            engine._handle("avrotop").query.processAllAvailable()
            rows = {
                r.kafka_offset: r for r in engine.fetch("avrotop", limit=-1).collect()
            }
            assert len(rows) == 6
            assert rows[2].n == 2 and rows[2].extra is None  # v1 writer
            assert rows[3].extra == 3.5 and rows[3].s == "v3"  # v2 writer
            assert rows[5].kafka_key == "k5" and rows[5].kafka_partition == 0
        finally:
            engine.stop()


def test_avro_converter_on_error_null_keeps_poison_offset_visible(spark):
    from roar_spark.sources.files import write_envelope_file, read_envelope_batch
    from roar_spark.streaming.avro import avro_converter, encode_framed
    import base64

    reg = SchemaRegistryLite()
    sid = reg.register(
        "p-value",
        {"type": "record", "name": "P", "fields": [{"name": "n", "type": "int"}]},
    )
    _, reader = reg.latest("p-value")
    conv, schema = avro_converter(reg.schemas_by_id(), reader, on_error="null")
    good = encode_framed({"n": 5}, reg.by_id(sid), sid)

    import tempfile, os

    path = tempfile.mkdtemp()
    write_envelope_file(
        path,
        [
            {"key": "a", "value": good, "timestamp": "2026-08-16T10:00:00Z", "offset": 0, "partition": 0},
            {"key": "b", "value": b"\x99not-avro", "timestamp": "2026-08-16T10:00:01Z", "offset": 1, "partition": 0},
        ],
    )
    out = conv(read_envelope_batch(spark, path), schema)
    rows = {r.kafka_offset: r for r in out.collect()}
    assert rows[0].n == 5
    assert rows[1].n is None and rows[1].kafka_key == "b"  # metadata survives
