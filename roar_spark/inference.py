"""Schema inference + type-promotion parity module.

Re-implements (in pure Python, over Spark types) the reference's dynamic
schema machinery — the part of TFMV/roar that is genuinely its own IP:

- payload format detection            (kafka/consumer.go:651-665)
- per-value JSON field typing         (kafka/consumer.go:913-943)
- type-promotion ("supertype") lattice(kafka/consumer.go:946-982)
- sampled schema inference with the 4 Kafka metadata columns
                                      (kafka/consumer.go:828-910)

Semantics matched exactly (and unit-tested in tests/test_inference.py):

- JSON number → long when integral *as a float64* (``1.0`` infers long,
  because Go json.Unmarshal decodes every number to float64 and the
  reference tests ``v == float64(int64(v))``, kafka/consumer.go:919-924);
  otherwise double.
- string parsing as RFC3339 (Go ``time.Parse(time.RFC3339, …)``) → timestamp
  (kafka/consumer.go:927-931). Go accepts an uppercase 'T' separator,
  optional fractional seconds, and 'Z'/'z' or ±hh:mm offsets; everything
  else (dates without time, space separators, missing zone) is a string.
- bool → boolean; nested object/array → *stringified* string
  (kafka/consumer.go:932-939); JSON null → nullable string
  (kafka/consumer.go:914-916).
- promotion lattice: int widening byte<short<int<long, float widening
  float<double, int ⊔ float → the float, anything else → string
  (kafka/consumer.go:946-982); nullability OR-ed across the sample
  (kafka/consumer.go:893-894).
- sample size ≤ 10 messages (kafka/consumer.go:841-843); schema is decided
  once from the first batch's sample and then frozen (stream/manager.go:282-284).
- every stream carries ``kafka_key string, kafka_timestamp timestamp,
  kafka_offset long, kafka_partition int`` (kafka/consumer.go:834-839).
- non-JSON payloads → metadata columns + ``value binary``
  (kafka/consumer.go:858-861).

Documented divergences (SURVEY.md §2.3):
- Arrow ``timestamp[ns]`` maps to Spark ``TimestampType`` (µs precision).
- Field order: the reference iterates a Go map (random order,
  kafka/consumer.go:896-905); we use deterministic first-seen order.
- Nested values stringify as canonical JSON, not Go's ``fmt.Sprintf("%v")``
  rendering (``map[a:1]``) — the Go form is an artifact, not a contract.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import types as T

__all__ = [
    "KAFKA_METADATA_FIELDS",
    "InferredField",
    "detect_format",
    "is_rfc3339",
    "infer_json_field_type",
    "common_super_type",
    "infer_json_fields",
    "infer_schema",
    "stringify_json_value",
]

# The 4 metadata columns every stream carries (kafka/consumer.go:834-839).
KAFKA_METADATA_FIELDS: tuple[tuple[str, T.DataType, bool], ...] = (
    ("kafka_key", T.StringType(), True),
    ("kafka_timestamp", T.TimestampType(), False),
    ("kafka_offset", T.LongType(), False),
    ("kafka_partition", T.IntegerType(), False),
)

_INT_ORDER = {T.ByteType(): 0, T.ShortType(): 1, T.IntegerType(): 2, T.LongType(): 3}
_FLOAT_ORDER = {T.FloatType(): 0, T.DoubleType(): 1}

# Go time.RFC3339: 'T' literal (case-sensitive), seconds required, optional
# '.fraction', zone 'Z'/'z' or ±hh:mm (Go's parse accepts lowercase z for the
# zone but not lowercase t for the separator).
_RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(?:[Zz]|[+-](\d{2}):(\d{2}))$"
)


def _reject_json_constant(_s: str) -> float:
    """Go's encoding/json rejects NaN/Infinity/-Infinity literals; Python's
    json.loads accepts them by default, which would classify a payload Go
    calls INVALID as JSON and freeze the wrong pipeline for the stream's
    lifetime (r8 review)."""
    raise ValueError("non-standard JSON constant")


def _loads_strict(data):
    return json.loads(data, parse_constant=_reject_json_constant)


@dataclass(frozen=True)
class InferredField:
    """One inferred payload field. ``nullable`` follows the reference's
    OR-across-sample rule (kafka/consumer.go:893-894): only an explicit JSON
    null marks a field nullable; a field merely *missing* from some sampled
    messages does not (quirk preserved for parity — missing values still
    materialize as nulls at append time, kafka/consumer.go:630-634)."""

    name: str
    dtype: T.DataType
    nullable: bool


def detect_format(data: bytes | str) -> str:
    """Classify a payload as ``"json"`` or ``"binary"``.

    Parity with detectMessageFormat (kafka/consumer.go:651-665): first byte
    must be ``{`` or ``[`` AND the whole payload must parse as JSON.
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    if data and data[:1] in (b"{", b"["):
        try:
            _loads_strict(data)  # Go-strict: NaN/Infinity literals = invalid
            return "json"
        except (ValueError, UnicodeDecodeError):
            pass
    return "binary"


def is_rfc3339(value: str) -> bool:
    """True iff Go's ``time.Parse(time.RFC3339, value)`` would succeed
    (kafka/consumer.go:928): strict grammar + real calendar validation."""
    m = _RFC3339_RE.match(value)
    if not m:
        return False
    year, month, day, hour, minute, sec = (int(m.group(i)) for i in range(1, 7))
    if not (1 <= month <= 12 and 0 <= hour <= 23 and 0 <= minute <= 59 and 0 <= sec <= 59):
        return False
    # the UTC offset is range-checked too: Go's parseRFC3339 caps it at
    # 23:59, so '+99:99' must type as STRING (the old regex-only check
    # typed it timestamp and the coercion layer then nulled every value —
    # whole-column loss; r8 review)
    if m.group(8) is not None and not (int(m.group(8)) <= 23 and int(m.group(9)) <= 59):
        return False
    try:
        # Go accepts year 0000 (proleptic, a leap year); Python datetime
        # starts at year 1 — validate the calendar against 2000, which has
        # identical month/day lengths (also a leap year)
        datetime(year if year > 0 else 2000, month, day)
    except ValueError:
        return False
    return True


def _is_integral_number(v: float) -> bool:
    """Go: ``v == float64(int64(v))`` (kafka/consumer.go:921). Out-of-int64-
    range floats are not integral (Go's conversion would be undefined).

    Python's json.loads is laxer than Go's encoding/json: it admits
    Infinity/NaN literals and arbitrary-precision ints (a 400-digit int
    overflows float()). Guard both so a hostile sample types as float/
    string instead of crashing schema inference mid-stream."""
    import math

    try:
        f = float(v)
    except (OverflowError, ValueError):
        return False
    if not math.isfinite(f):
        return False
    return f == f.__floor__() and -(2.0**63) <= f < 2.0**63 and f == float(int(f))


def infer_json_field_type(value: object, infer_nested: bool = False) -> tuple[T.DataType, bool]:
    """Type a single JSON value. Parity: inferJsonFieldType
    (kafka/consumer.go:913-943). Returns (dtype, nullable).

    ``infer_nested=True`` is the extension knob (SURVEY.md §1.3): objects
    and arrays get real Struct/Array types (recursively) instead of the
    reference's stringification."""
    if value is None:
        return T.StringType(), True
    if isinstance(value, bool):  # bool before int: Python bool subclasses int
        return T.BooleanType(), False
    if isinstance(value, (int, float)):
        # Go decodes every JSON number as float64 first; mirror that.
        # (value passes through unconverted: float() of a 400-digit int
        # raises OverflowError — _is_integral_number guards internally)
        if _is_integral_number(value):
            return T.LongType(), False
        return T.DoubleType(), False
    if isinstance(value, str):
        if is_rfc3339(value):
            return T.TimestampType(), False
        return T.StringType(), False
    if isinstance(value, dict):
        if infer_nested:
            fields = []
            for k, v in value.items():
                dt, nullable = infer_json_field_type(v, infer_nested=True)
                fields.append(T.StructField(k, dt, nullable))
            return T.StructType(fields), False
        return T.StringType(), False
    if isinstance(value, list):
        if infer_nested:
            elem: T.DataType | None = None
            nullable_elem = False
            for v in value:
                dt, nv = infer_json_field_type(v, infer_nested=True)
                nullable_elem = nullable_elem or nv or v is None
                elem = dt if elem is None else common_super_type(elem, dt)
            return T.ArrayType(elem or T.StringType(), nullable_elem), False
        return T.StringType(), False
    return T.StringType(), False


def common_super_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """Promotion lattice, parity with commonSuperType
    (kafka/consumer.go:946-982): same→same, int-widening, float-widening,
    int⊔float→float, everything else→string.

    EXTENSION beyond the reference (only reachable with ``infer_nested``):
    struct⊔struct joins field-wise (union of fields, nullable OR), array⊔
    array joins element types — so the lattice stays a join-semilattice
    over nested types too. Mixed nested/scalar still collapses to string.
    """
    if a == b:
        return a
    if a in _INT_ORDER and b in _INT_ORDER:
        return a if _INT_ORDER[a] > _INT_ORDER[b] else b
    if a in _FLOAT_ORDER and b in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[a] > _FLOAT_ORDER[b] else b
    if a in _INT_ORDER and b in _FLOAT_ORDER:
        return b
    if b in _INT_ORDER and a in _FLOAT_ORDER:
        return a
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        by_a = {f.name: f for f in a.fields}
        by_b = {f.name: f for f in b.fields}
        order = [f.name for f in a.fields] + [f.name for f in b.fields if f.name not in by_a]
        merged = []
        for name in order:
            fa, fb = by_a.get(name), by_b.get(name)
            if fa is not None and fb is not None:
                merged.append(
                    T.StructField(
                        name, common_super_type(fa.dataType, fb.dataType),
                        fa.nullable or fb.nullable,
                    )
                )
            else:
                f = fa or fb  # missing on one side → nullable
                merged.append(T.StructField(name, f.dataType, True))
        return T.StructType(merged)
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(
            common_super_type(a.elementType, b.elementType),
            a.containsNull or b.containsNull,
        )
    return T.StringType()


def infer_json_fields(
    payloads: list[bytes | str], infer_nested: bool = False
) -> list[InferredField]:
    """Merge field types across a sample of JSON payloads. Parity:
    inferJsonSchema (kafka/consumer.go:867-910) — invalid JSON is skipped,
    conflicting types join through the lattice, nullability ORs. Field
    order is deterministic first-seen (divergence note in module doc)."""
    field_types: dict[str, T.DataType] = {}
    field_nullable: dict[str, bool] = {}
    order: list[str] = []
    for payload in payloads:
        try:
            data = _loads_strict(payload)  # Go skips invalid JSON (NaN incl.)
        except (ValueError, UnicodeDecodeError):
            continue
        if not isinstance(data, dict):
            continue  # top-level arrays carry no named fields
        for key, value in data.items():
            dtype, nullable = infer_json_field_type(value, infer_nested=infer_nested)
            if key not in field_types:
                field_types[key] = dtype
                field_nullable[key] = nullable
                order.append(key)
            else:
                field_types[key] = common_super_type(field_types[key], dtype)
                field_nullable[key] = field_nullable[key] or nullable
    return [InferredField(k, field_types[k], field_nullable[k]) for k in order]


def infer_schema(
    payloads: list[bytes | str], sample_size: int = 10, infer_nested: bool = False
) -> T.StructType:
    """Full stream schema from a batch of payloads. Parity: inferSchema
    (kafka/consumer.go:828-864) — 4 metadata columns always; format decided
    by the FIRST sampled message; JSON → inferred fields, else → ``value
    binary``. ``sample_size`` defaults to the reference's 10."""
    if not payloads:
        raise ValueError("no messages to infer schema from")
    sample = payloads[: min(len(payloads), sample_size)]
    fields = [T.StructField(n, t, nullable) for n, t, nullable in KAFKA_METADATA_FIELDS]
    if detect_format(sample[0]) == "json":
        inferred = infer_json_fields(sample, infer_nested=infer_nested)
        # payload fields SHADOWED by the four kafka_* metadata names are
        # dropped from the frozen schema: keeping them froze a
        # duplicate-name StructType that parse_envelope could never emit
        # and ParquetStore could never read back (r8 review). The parse
        # layer filters them by the same names; with rescue_columns on
        # they land in _rescued instead of vanishing.
        meta_names = {n for n, _, _ in KAFKA_METADATA_FIELDS}
        fields.extend(
            T.StructField(f.name, f.dtype, f.nullable)
            for f in inferred
            if f.name not in meta_names
        )
    else:
        fields.append(T.StructField("value", T.BinaryType(), True))
    return T.StructType(fields)


def _go_float_str(v: float) -> str:
    """Go's ``fmt.Sprintf("%v", float64)`` = strconv 'g' with shortest
    digits: exponent form when the decimal exponent is < -4 or >= 6 (the
    shortest-'g' eprec), plain decimal otherwise. Python's repr shares the
    lower threshold but stays plain until 1e16 — so "1000000.0" rendered
    "1000000" where Go says "1e+06" (r8 review; this function exists FOR
    byte-level Go parity, see coerce.py module doc)."""
    if v != v or v in (float("inf"), float("-inf")):
        return {float("inf"): "+Inf", float("-inf"): "-Inf"}.get(v, "NaN")
    if v == 0:
        return "-0" if str(v).startswith("-") else "0"
    neg = v < 0
    r = repr(abs(v))  # shortest round-trip digits
    if "e" in r:
        mant, e = r.split("e")
        exp = int(e) + (len(mant.split(".")[0]) - 1)
        digits = mant.replace(".", "")
    else:
        int_part, _, frac = r.partition(".")
        alld = int_part + frac
        stripped = alld.lstrip("0")
        exp = len(int_part) - 1 - (len(alld) - len(stripped))
        digits = stripped
    digits = digits.rstrip("0") or "0"
    sign = "-" if neg else ""
    if exp < -4 or exp >= 6:
        mant = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        return f"{sign}{mant}e{'+' if exp >= 0 else '-'}{abs(exp):02d}"
    if exp >= len(digits) - 1:
        return sign + digits + "0" * (exp - len(digits) + 1)
    if exp >= 0:
        return f"{sign}{digits[: exp + 1]}.{digits[exp + 1:]}"
    return f"{sign}0.{'0' * (-exp - 1)}{digits}"


def stringify_json_value(value: object) -> str | None:
    """Render a JSON value for a string-typed column. Scalars render as
    Go's ``%v`` of the json.Unmarshal value — NUMBERS through float64
    shortest-'g' (_go_float_str: "1.0" → "1", "1000000.0" → "1e+06",
    matching Go's exponent threshold; r8 review fixed the ≥1e6 range);
    nested values render as canonical JSON (divergence from Go's map %v,
    documented above). Ints too large for float64 (Go's parser errors on
    them — the whole message is invalid there) fall back to full digits."""
    if value is None:
        return None
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        try:
            return _go_float_str(float(value))
        except OverflowError:
            return str(value)
    if isinstance(value, (dict, list)):
        return json.dumps(value, separators=(",", ":"), ensure_ascii=False)
    return str(value)
