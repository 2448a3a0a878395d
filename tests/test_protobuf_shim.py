"""Wire-format pinning for the vendored pure-Python protobuf shim
(roar_spark/vendor/README.md).

The e2e conformance check is the TWS state-server exchange in
test_streaming_native.py (the JVM parses with REAL protobuf); these
tests pin the encoder against hand-computed wire bytes from the public
proto3 spec so a shim regression fails in milliseconds, not minutes.
"""

from __future__ import annotations

import pytest

from roar_spark.session import _ensure_protobuf_shim

_ensure_protobuf_shim()

gp = pytest.importorskip("google.protobuf")
if "roar_spark/vendor" not in (getattr(gp, "__file__", "") or ""):
    pytest.skip(
        "real protobuf installed — shim inert, nothing to pin", allow_module_level=True
    )

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

from google.protobuf.internal import wire  # noqa: E402  (the shim's)


def test_varint_edges():
    for v in (0, 1, 127, 128, 300, 2**31 - 1, 2**63 - 1, -1, -2**31, -2**63):
        buf = bytearray()
        wire.write_varint(buf, v)
        got, pos = wire.read_varint(bytes(buf), 0)
        assert pos == len(buf)
        assert wire.to_signed64(got) == v
    # negative values are 10-byte two's-complement varints per the spec
    buf = bytearray()
    wire.write_varint(buf, -1)
    assert bytes(buf) == b"\xff" * 9 + b"\x01"


def test_exact_wire_bytes_hand_computed():
    # StateCallCommand{stateName:"s1"(f1 str), ttl{durationMs:5000}(f4 msg)}
    #   f1: tag 0x0a len 2 "s1"           → 0a 02 73 31
    #   f4: tag 0x22 len 3 (f1: 08 + varint(5000)=88 27) → 22 03 08 88 27
    cmd = sm.StateCallCommand()
    cmd.stateName = "s1"
    cmd.ttl.durationMs = 5000
    assert cmd.SerializeToString() == bytes.fromhex("0a02733122 03088827".replace(" ", ""))

    # oneof message field: StateRequest{statefulProcessorCall(f2)={
    #   setHandleState(f1)={state: INITIALIZED=2}}}
    #   inner SetHandleState: 08 02; SPC: 0a 02 08 02; request: 12 04 ...
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert req.SerializeToString() == bytes.fromhex("12040a020802")

    # implicit-presence default stays OFF the wire (state=PRE_INIT=0), but
    # the oneof/message chain keeps zero-length presence bytes
    req0 = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.PRE_INIT)
        )
    )
    assert req0.SerializeToString() == bytes.fromhex("12020a00")


def test_lazy_nested_read_does_not_set_presence():
    cmd = sm.StateCallCommand()
    cmd.stateName = "x"
    assert cmd.ttl.durationMs == 0  # read-only touch
    assert cmd.SerializeToString() == b"\x0a\x01x"  # no ttl{} fabricated
    cmd.ttl.durationMs = 1  # first WRITE attaches
    assert cmd.SerializeToString() == b"\x0a\x01x\x22\x02\x08\x01"


def test_oneof_exclusivity():
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand())
    assert call.WhichOneof("method") == "getValueState"
    parsed = sm.StatefulProcessorCall()
    # setting the sibling replaces the oneof member
    call2 = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand())
    call2._set_field(call2.DESCRIPTOR.fields_by_name["deleteIfExists"], sm.StateCallCommand())
    assert call2.WhichOneof("method") == "deleteIfExists"
    parsed.ParseFromString(call2.SerializeToString())
    assert parsed.WhichOneof("method") == "deleteIfExists"


def test_repeated_message_and_bool_roundtrip():
    resp = sm.StateResponseWithTimer(
        statusCode=-7,
        errorMessage="bad",
        requireNextFetch=True,
        timer=[sm.TimerInfo(timestampMs=123), sm.TimerInfo(key=b"k", timestampMs=-1)],
    )
    r2 = sm.StateResponseWithTimer()
    r2.ParseFromString(resp.SerializeToString())
    assert r2.statusCode == -7 and r2.errorMessage == "bad"
    assert r2.requireNextFetch is True
    assert [(t.timestampMs, t.key) for t in r2.timer] == [(123, b""), (-1, b"k")]
    # proto3_optional presence survives the round-trip
    assert not r2.timer[0].HasField("key") and r2.timer[1].HasField("key")


def test_unknown_fields_skipped():
    base = sm.StateResponse(statusCode=3, value=b"v").SerializeToString()
    # append unknown field 15 varint + unknown field 14 length-delimited
    crafted = base + bytes.fromhex("7805") + bytes.fromhex("720268 69")
    r = sm.StateResponse()
    r.ParseFromString(crafted)
    assert r.statusCode == 3 and r.value == b"v"


def test_repeated_bytes_field():
    put = sm.ListStatePut(value=[b"a", b"bb"], fetchWithArrow=False)
    # f1 ×2 (0a 01 61, 0a 02 62 62); fetchWithArrow=False is default → off wire
    assert put.SerializeToString() == bytes.fromhex("0a01610a026262")
    p2 = sm.ListStatePut()
    p2.ParseFromString(put.SerializeToString())
    assert list(p2.value) == [b"a", b"bb"] and p2.fetchWithArrow is False


def test_repeated_append_on_lazy_child_attaches():
    # the standard generated-code idiom: append into a repeated field of a
    # lazily-read nested message — the child must attach to its parent on
    # the MUTATION (upstream's listener mechanism), so the data reaches the
    # wire (r5 review: the old shim stored the list on the detached child
    # and serialized b"" with WhichOneof None)
    c = sm.ListStateCall()
    c.stateName = "s"
    c.listStatePut.value.append(b"x")
    # f1 "s" → 0a 01 73; listStatePut(f4)={value(f1)=b"x"} → 22 03 0a 01 78
    assert c.SerializeToString() == bytes.fromhex("0a017322030a0178")
    assert c.WhichOneof("method") == "listStatePut"
    # reading a repeated field alone must NOT set presence (proto3)
    c2 = sm.ListStateCall()
    c2.stateName = "s"
    _ = list(c2.listStatePut.value)
    assert c2.SerializeToString() == bytes.fromhex("0a0173")
    assert c2.WhichOneof("method") is None


def test_repeated_container_stale_after_clear():
    c = sm.ListStatePut()
    handle = c.value
    handle.append(b"a")
    assert c.SerializeToString() == bytes.fromhex("0a0161")
    c.Clear()
    handle.append(b"b")  # released handle: must not re-attach stale data
    assert c.SerializeToString() == b""


def test_repeated_add_idiom():
    r = sm.StateResponseWithTimer()
    r.timer.add(timestampMs=5)
    t = r.timer.add()
    t.timestampMs = 7
    assert [x.timestampMs for x in r.timer] == [5, 7]
    r2 = sm.StateResponseWithTimer()
    r2.ParseFromString(r.SerializeToString())
    assert [x.timestampMs for x in r2.timer] == [5, 7]


def test_truncated_descriptor_raises():
    # a short serialized FileDescriptorProto must fail AddSerializedFile
    # loudly, not build a descriptor with silently-missing fields
    from google.protobuf import descriptor_pool

    import pyspark.sql.streaming.proto.StateMessage_pb2 as mod

    serialized = mod.DESCRIPTOR.serialized_pb
    pool = descriptor_pool.DescriptorPool()
    with pytest.raises(ValueError, match="truncated"):
        pool.AddSerializedFile(serialized[: len(serialized) // 2])


def test_parse_into_lazy_child_with_repeated_only_payload_attaches():
    # r5 review (repro'd): CopyFrom/ParseFromString into a lazily-read
    # child whose payload holds ONLY repeated fields went through
    # _store_parsed's repeated branch, which never attached the child —
    # the bytes silently vanished from the parent's wire.
    c = sm.ListStateCall()
    c.stateName = "s"
    c.listStatePut.CopyFrom(sm.ListStatePut(value=[b"x"]))
    data = c.SerializeToString()
    r = sm.ListStateCall()
    r.ParseFromString(data)
    assert r.WhichOneof("method") == "listStatePut"
    assert list(r.listStatePut.value) == [b"x"]
    # and the ParseFromString-into-lazy-child form of the same idiom
    c2 = sm.ListStateCall()
    c2.stateName = "s"
    c2.listStatePut.ParseFromString(sm.ListStatePut(value=[b"y"]).SerializeToString())
    r2 = sm.ListStateCall()
    r2.ParseFromString(c2.SerializeToString())
    assert list(r2.listStatePut.value) == [b"y"]


def test_truncated_fixed_width_unknown_field_raises():
    # unknown fixed64 tag (field 99, wire type 1) followed by only 3 bytes:
    # must raise, not parse "successfully" with the field missing
    base = sm.StateResponse(statusCode=3).SerializeToString()
    bad = base + bytes([0x99, 0x06, 0x01]) + b"\x01\x02\x03"  # tag 99<<3|1
    r = sm.StateResponse()
    with pytest.raises(Exception):
        r.ParseFromString(bad)


def test_out_of_range_int_assignment_raises():
    # int32 field: a 2**40 assignment would encode as a 64-bit varint the
    # JVM peer silently truncates — real protobuf raises at assignment
    r = sm.StateResponse()
    with pytest.raises(ValueError, match="out of range"):
        r.statusCode = 1 << 40
    r.statusCode = (1 << 31) - 1  # boundary still fine
    assert r.statusCode == (1 << 31) - 1
