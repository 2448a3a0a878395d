"""Unit + property tests for roar_spark.inference — every branch of the
reference's typing rules (kafka/consumer.go:651-982) per SURVEY.md §5.1-5.2."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

settings.register_profile("roar", deadline=None)
settings.load_profile("roar")
from pyspark.sql import types as T

from roar_spark.inference import (
    KAFKA_METADATA_FIELDS,
    common_super_type,
    detect_format,
    infer_json_field_type,
    infer_json_fields,
    infer_schema,
    is_rfc3339,
    stringify_json_value,
)

# --- detect_format (kafka/consumer.go:651-665) ---------------------------


def test_detect_format_json_object():
    assert detect_format(b'{"a": 1}') == "json"


def test_detect_format_json_array():
    assert detect_format(b"[1, 2]") == "json"


def test_detect_format_invalid_json_with_brace_prefix():
    assert detect_format(b"{not json") == "binary"


def test_detect_format_valid_json_without_brace_prefix_is_binary():
    # Reference only sniffs '{'/'[' first bytes: bare scalars are binary.
    assert detect_format(b"123") == "binary"
    assert detect_format(b'"str"') == "binary"


def test_detect_format_empty_and_random():
    assert detect_format(b"") == "binary"
    assert detect_format(b"\x00\x01\x02") == "binary"


# --- RFC3339 (kafka/consumer.go:927-931) ---------------------------------


def test_rfc3339_accepts():
    assert is_rfc3339("2026-08-13T10:00:00Z")
    assert is_rfc3339("2026-08-13T10:00:00z")  # Go accepts lowercase zone
    assert is_rfc3339("2026-08-13T10:00:00.123456789Z")
    assert is_rfc3339("2026-08-13T10:00:00+02:00")
    assert is_rfc3339("2026-08-13T10:00:00-05:30")


def test_rfc3339_rejects():
    assert not is_rfc3339("2026-08-13 10:00:00Z")  # space separator
    assert not is_rfc3339("2026-08-13T10:00:00")  # missing zone
    assert not is_rfc3339("2026-08-13")  # date only
    assert not is_rfc3339("2026-08-13t10:00:00Z")  # lowercase t
    assert not is_rfc3339("2026-13-01T10:00:00Z")  # month 13
    assert not is_rfc3339("2026-02-30T10:00:00Z")  # Feb 30
    assert not is_rfc3339("2026-08-13T24:00:00Z")  # hour 24
    assert not is_rfc3339("2026-08-13T10:00:60Z")  # leap second
    assert not is_rfc3339("not a timestamp")


# --- per-value typing (kafka/consumer.go:913-943) ------------------------


def test_field_type_integral_numbers_are_long():
    assert infer_json_field_type(1) == (T.LongType(), False)
    # 1.0 is integral-as-float64 → long (Go decodes all numbers to float64)
    assert infer_json_field_type(1.0) == (T.LongType(), False)
    assert infer_json_field_type(-42) == (T.LongType(), False)


def test_field_type_fractional_is_double():
    assert infer_json_field_type(0.5) == (T.DoubleType(), False)
    assert infer_json_field_type(-3.14) == (T.DoubleType(), False)


def test_field_type_huge_float_is_double():
    assert infer_json_field_type(1e300) == (T.DoubleType(), False)


def test_field_type_strings():
    assert infer_json_field_type("hello") == (T.StringType(), False)
    assert infer_json_field_type("2026-08-13T10:00:00Z") == (T.TimestampType(), False)
    assert infer_json_field_type("2026-08-13 10:00") == (T.StringType(), False)


def test_field_type_bool_not_long():
    assert infer_json_field_type(True) == (T.BooleanType(), False)


def test_field_type_nested_stringified():
    assert infer_json_field_type({"a": 1}) == (T.StringType(), False)
    assert infer_json_field_type([1, 2]) == (T.StringType(), False)


def test_field_type_null():
    assert infer_json_field_type(None) == (T.StringType(), True)


# --- promotion lattice (kafka/consumer.go:946-982) -----------------------

_INTS = [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType()]
_FLOATS = [T.FloatType(), T.DoubleType()]
_ALL = _INTS + _FLOATS + [T.StringType(), T.BooleanType(), T.TimestampType()]


def test_lattice_int_widening():
    assert common_super_type(T.ByteType(), T.LongType()) == T.LongType()
    assert common_super_type(T.IntegerType(), T.ShortType()) == T.IntegerType()


def test_lattice_float_widening():
    assert common_super_type(T.FloatType(), T.DoubleType()) == T.DoubleType()


def test_lattice_int_float():
    assert common_super_type(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert common_super_type(T.FloatType(), T.ByteType()) == T.FloatType()


def test_lattice_mixed_to_string():
    assert common_super_type(T.LongType(), T.StringType()) == T.StringType()
    assert common_super_type(T.BooleanType(), T.DoubleType()) == T.StringType()
    assert common_super_type(T.TimestampType(), T.LongType()) == T.StringType()


def test_lattice_same():
    for t in _ALL:
        assert common_super_type(t, t) == t


@given(st.sampled_from(_ALL), st.sampled_from(_ALL))
def test_lattice_commutative(a, b):
    assert common_super_type(a, b) == common_super_type(b, a)


@given(st.sampled_from(_ALL), st.sampled_from(_ALL), st.sampled_from(_ALL))
@settings(max_examples=200)
def test_lattice_associative(a, b, c):
    left = common_super_type(common_super_type(a, b), c)
    right = common_super_type(a, common_super_type(b, c))
    assert left == right


@given(st.sampled_from(_ALL), st.sampled_from(_ALL))
def test_lattice_idempotent_upper_bound(a, b):
    j = common_super_type(a, b)
    assert common_super_type(j, a) == j
    assert common_super_type(j, b) == j


# --- schema inference (kafka/consumer.go:828-910) ------------------------


def _js(**kw) -> bytes:
    return json.dumps(kw).encode()


def test_infer_schema_metadata_columns_always_present():
    schema = infer_schema([_js(a=1)])
    names = [f.name for f in schema.fields]
    assert names[:4] == [n for n, _, _ in KAFKA_METADATA_FIELDS]
    meta = {f.name: (f.dataType, f.nullable) for f in schema.fields[:4]}
    assert meta["kafka_key"] == (T.StringType(), True)
    assert meta["kafka_timestamp"] == (T.TimestampType(), False)
    assert meta["kafka_offset"] == (T.LongType(), False)
    assert meta["kafka_partition"] == (T.IntegerType(), False)


def test_infer_schema_binary_payload():
    schema = infer_schema([b"\x01\x02"])
    assert schema.fields[-1].name == "value"
    assert schema.fields[-1].dataType == T.BinaryType()


def test_infer_schema_format_from_first_message():
    # First message binary → whole stream is binary-shaped even if later
    # sampled messages are JSON (format = sample[0], consumer.go:846).
    schema = infer_schema([b"\x00", _js(a=1)])
    assert [f.name for f in schema.fields][4:] == ["value"]


def test_infer_schema_sample_boundary():
    # Field appearing only from the 11th message is absent (sample ≤ 10).
    msgs = [_js(a=1) for _ in range(10)] + [_js(a=1, late=2)]
    schema = infer_schema(msgs)
    assert "late" not in schema.fieldNames()
    # ...but with a larger sample_size it appears (extension knob).
    schema2 = infer_schema(msgs, sample_size=11)
    assert "late" in schema2.fieldNames()


def test_infer_schema_promotion_across_messages():
    msgs = [_js(x=1), _js(x=2.5), _js(y="s"), _js(y=7)]
    fields = {f.name: f.dataType for f in infer_schema(msgs).fields}
    assert fields["x"] == T.DoubleType()
    assert fields["y"] == T.StringType()


def test_infer_schema_nullability_or():
    msgs = [_js(a=None), _js(a="v"), _js(b="w")]
    by_name = {f.name: f for f in infer_schema(msgs).fields}
    assert by_name["a"].nullable is True
    assert by_name["b"].nullable is False  # missing ≠ null (parity quirk)


def test_infer_fields_skips_invalid_json():
    fields = infer_json_fields([b"{bad", _js(a=1)])
    assert [f.name for f in fields] == ["a"]


def test_infer_fields_fixture2_matrix():
    """FIXTURES.md §2 logs_json matrix, end to end."""
    rows = [
        dict(level="INFO", count=1, ratio=0.5, mixed_num=1, mixed_any=3,
             created_at="2026-08-13T10:00:00Z", almost_ts="2026-08-13 10:00",
             enabled=True, meta={"a": 1}, tags=["x", "y"], maybe_null=None),
        dict(level="WARN", count=42, ratio=0.25, mixed_num=2.5, mixed_any="s",
             created_at="2026-08-13T11:00:00Z", almost_ts="2026-08-13 11:00",
             enabled=False, meta={"a": 2}, tags=["z"], maybe_null="present"),
    ]
    schema = infer_schema([json.dumps(r).encode() for r in rows])
    by = {f.name: f for f in schema.fields}
    assert by["level"].dataType == T.StringType()
    assert by["count"].dataType == T.LongType()
    assert by["ratio"].dataType == T.DoubleType()
    assert by["mixed_num"].dataType == T.DoubleType()
    assert by["mixed_any"].dataType == T.StringType()
    assert by["created_at"].dataType == T.TimestampType()
    assert by["almost_ts"].dataType == T.StringType()
    assert by["enabled"].dataType == T.BooleanType()
    assert by["meta"].dataType == T.StringType()
    assert by["tags"].dataType == T.StringType()
    assert by["maybe_null"].dataType == T.StringType()
    assert by["maybe_null"].nullable is True


# --- property tests (SURVEY.md §5.2) -------------------------------------

_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)


@given(st.lists(st.dictionaries(st.sampled_from("abcde"), _json_scalars, max_size=5),
                min_size=1, max_size=10))
@settings(max_examples=100)
def test_inference_order_insensitive_up_to_lattice(docs):
    """Shuffling the sample never changes the inferred type set (lattice
    join is commutative/associative) — field ORDER may differ."""
    payloads = [json.dumps(d).encode() for d in docs]
    fwd = {f.name: (f.dtype, f.nullable) for f in infer_json_fields(payloads)}
    rev = {f.name: (f.dtype, f.nullable) for f in infer_json_fields(payloads[::-1])}
    assert fwd == rev


def test_stringify_scalars_and_nested():
    assert stringify_json_value(None) is None
    assert stringify_json_value(True) == "true"
    assert stringify_json_value(1.0) == "1"  # Go %v of float64(1) → "1"
    assert stringify_json_value(1.5) == "1.5"
    assert stringify_json_value({"a": 1}) == '{"a":1}'
    assert stringify_json_value([1, "x"]) == '[1,"x"]'


# --- infer_nested extension (beyond the reference, SURVEY.md §1.3) --------


def test_nested_inference_struct_and_array():
    from roar_spark.inference import infer_json_field_type

    dt, nullable = infer_json_field_type({"a": 1, "b": [1.5, 2]}, infer_nested=True)
    assert isinstance(dt, T.StructType)
    by = {f.name: f.dataType for f in dt.fields}
    assert by["a"] == T.LongType()
    assert by["b"] == T.ArrayType(T.DoubleType(), False)


def test_nested_lattice_merges_struct_fields():
    a = T.StructType([T.StructField("x", T.LongType(), False)])
    b = T.StructType(
        [T.StructField("x", T.DoubleType(), False), T.StructField("y", T.StringType(), False)]
    )
    j = common_super_type(a, b)
    by = {f.name: (f.dataType, f.nullable) for f in j.fields}
    assert by["x"] == (T.DoubleType(), False)
    assert by["y"] == (T.StringType(), True)  # one-sided field → nullable


def test_nested_schema_end_to_end():
    msgs = [_js(meta={"a": 1}, tags=["x", "y"]), _js(meta={"a": 2.5, "b": "s"})]
    flat = infer_schema(msgs)
    nested = infer_schema(msgs, infer_nested=True)
    assert flat["meta"].dataType == T.StringType()  # reference parity default
    meta = nested["meta"].dataType
    assert isinstance(meta, T.StructType)
    assert {f.name: f.dataType for f in meta.fields} == {
        "a": T.DoubleType(),
        "b": T.StringType(),
    }
    assert nested["tags"].dataType == T.ArrayType(T.StringType(), False)


def test_inference_survives_nonfinite_and_huge_numbers():
    """Non-finite values reaching the type lattice directly must type, not
    crash; stringification renders them as Go's %v would. (The PARSE layer
    never produces them any more — see the strict-JSON test below — but a
    converter or the nested extension could.)"""
    from roar_spark.inference import infer_json_field_type, stringify_json_value

    import pyspark.sql.types as T

    assert infer_json_field_type(float("inf")) == (T.DoubleType(), False)
    assert infer_json_field_type(float("nan")) == (T.DoubleType(), False)
    assert infer_json_field_type(10**400) == (T.DoubleType(), False)
    assert stringify_json_value(float("inf")) == "+Inf"  # Go %v


def test_infer_schema_with_nonfinite_sample():
    """Go's encoding/json REJECTS Infinity/NaN literals, so a first payload
    carrying one is invalid JSON → the stream classifies BINARY (r8 review:
    Python's lax json.loads previously classified it JSON and froze the
    wrong pipeline for the stream's lifetime)."""
    import json

    from roar_spark.inference import infer_schema

    schema = infer_schema([json.dumps({"a": 1}).replace('1', 'Infinity')])
    names = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert "a" not in names
    assert names["value"] == "binary"


def test_infer_schema_drops_metadata_shadowed_payload_fields():
    """A payload field named kafka_offset cannot coexist with the metadata
    column: the frozen schema must not carry duplicate names (r8 review —
    ParquetStore could never read a duplicate-name schema back)."""
    import json

    from roar_spark.inference import infer_schema

    schema = infer_schema([json.dumps({"kafka_offset": 1, "x": 2})])
    names = [f.name for f in schema.fields]
    assert names.count("kafka_offset") == 1 and "x" in names


def test_go_float_formatting_thresholds():
    """stringify_json_value renders numbers as Go %v of float64: exponent
    form at decimal exponent >= 6 or < -4 (strconv shortest-'g'), plain
    decimal between (r8 review: Python stayed plain until 1e16)."""
    from roar_spark.inference import stringify_json_value as sv

    assert sv(1000000.0) == "1e+06"
    assert sv(1234567.5) == "1.2345675e+06"
    assert sv(123456.5) == "123456.5"
    assert sv(100000.0) == "100000"
    assert sv(0.0001) == "0.0001"
    assert sv(0.00001) == "1e-05"
    assert sv(123456789) == "1.23456789e+08"  # JSON ints ride float64 in Go
    assert sv(7) == "7" and sv(-55.25) == "-55.25"
