"""Scalar coercion layer: the reference's append-time cast rules as Spark
column expressions.

The reference coerces every JSON value into the frozen stream schema at
Arrow-append time (appendValue kafka/consumer.go:698-798, appendTimestamp
kafka/consumer.go:801-825). The rules, per target type:

- string   : any scalar → its text form; nested → stringified  (go:705-711)
- int8..64 : JSON number → truncate toward zero; anything else → null
             (go:713-766 — float64→intN is Go conversion = truncation)
- float    : JSON number → float; anything else → null          (go:768-786)
- boolean  : JSON bool only; anything else → null               (go:788-793)
- timestamp: RFC3339 string / epoch-ns number → timestamp; else null
             (go:801-825 — int64/float64 interpreted as NANOSECONDS)
- binary   : bytes/string → raw bytes (string carrier + binary cast);
             a JSON number's text becomes its bytes — documented residual
             divergence (reference nulls non-strings)        (go:795-798)
- JSON null / missing field → null                              (go:700-703, 630-634)

Spark design: we parse payloads ONCE with `from_json` against a "carrier"
schema (each field at its lossless wire type: numbers→double, strings→string,
bools→boolean, nested→string), then apply these deterministic cast
expressions to reach the target schema. Both stages are built-in Catalyst
expressions — whole-stage-codegen'd, no Python in the hot path — and the
two-step keeps Spark's own (different) JSON coercion rules out of the
semantics. Precision note: like the reference (Go json → float64), integers
beyond 2^53 lose precision; parity preserved by construction.

Documented divergence (timestamp targets): the carrier for a timestamp
field is StringType, and ``from_json`` renders the JSON number ``12345``
and the JSON *string* ``"12345"`` identically — so a numeric-looking
string in a timestamp field coerces through the epoch arm (the reference
would RFC3339-parse the string, fail, and null it). The carrier cannot
distinguish the two tokens after parsing; feeds that mix quoted and bare
numbers in one timestamp field are outside this layer's parity contract.

Documented divergence (string targets): a JSON *number* coerced into a
string column renders via Java's ``Double.toString`` / ``Long.toString``
(integer tokens → "5"; float tokens → "0.0", "1.5", "2.2E-311"), while
Go's ``fmt.Sprintf("%v", float64)`` renders the shortest Go form ("0",
"1.5", "2.2e-311"). Same parsed value, different text for integral floats
and scientific notation. The pure-Python ``inference.stringify_json_value``
models the Go behavior where byte-level parity matters;
tests/test_coerce_property.py models the Java behavior the engine emits.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from roar_spark.inference import KAFKA_METADATA_FIELDS

__all__ = ["carrier_type", "carrier_schema", "coerce_expr", "coerce_to_schema"]

# Matches inference.is_rfc3339 (Go time.RFC3339) as a SQL-side regex; range
# validation beyond the pattern is delegated to to_timestamp's parser.
RFC3339_SQL_RE = (
    r"^\d{4}-\d{2}-\d{2}T([01]\d|2[0-3]):[0-5]\d:[0-5]\d(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)

_METADATA_NAMES = {name for name, _, _ in KAFKA_METADATA_FIELDS}


def carrier_type(target: T.DataType) -> T.DataType:
    """Wire-side type used to parse a payload field before coercion.

    Numbers ride as double (Go json.Unmarshal decodes all numbers to
    float64 — same carrier, kafka/consumer.go:919), timestamps as the raw
    string/number, everything non-scalar as its JSON text.
    """
    if isinstance(target, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                           T.FloatType, T.DoubleType)):
        return T.DoubleType()
    if isinstance(target, (T.StructType, T.ArrayType, T.MapType)):
        # infer_nested extension: nested targets parse directly at their
        # typed shape, so NESTED timestamp fields use from_json's own
        # parser: RFC3339-style strings parse fine, but a bare NUMBER in a
        # nested timestamp position is read as epoch-SECONDS (Jackson
        # semantics), not the top-level contract's epoch-NANOSECONDS.
        # Documented divergence of the nested extension — mixed
        # string/number feeds for one nested timestamp field are outside
        # its contract (r5 review; routing nested fields through the
        # carrier layer would require recursive per-field re-parsing).
        return target
    if isinstance(target, T.BooleanType):
        return T.BooleanType()
    if isinstance(target, T.TimestampType):
        return T.StringType()
    if isinstance(target, T.BinaryType):
        # STRING carrier, cast to binary in coerce_expr (raw UTF-8 bytes =
        # the Go rule). A BinaryType carrier made from_json BASE64-decode
        # the value — and an invalid-base64 string marked the whole record
        # malformed, nulling every OTHER field of the row too (r8 review).
        # Residual divergence (same class as the timestamp-number note): a
        # JSON number in a binary field arrives as its text and stores as
        # those bytes, where the reference nulls a non-string value.
        return T.StringType()
    return T.StringType()


def carrier_schema(target: T.StructType) -> T.StructType:
    """Carrier StructType for `from_json` over the payload fields (metadata
    columns come from the Kafka source itself, not the payload)."""
    return T.StructType(
        [
            T.StructField(f.name, carrier_type(f.dataType), True)
            for f in target.fields
            if f.name not in _METADATA_NAMES
        ]
    )


def coerce_expr(col: Column, target: T.DataType) -> Column:
    """Cast a carrier column to its target type with reference semantics."""
    if isinstance(target, (T.StructType, T.ArrayType, T.MapType)):
        return col  # nested extension: already parsed at the target shape
    if isinstance(target, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        # Go intN(float64) truncates toward zero; Spark double→integral cast
        # does the same. Out-of-range → Spark nulls (try_cast), reference
        # wraps (Go conversion) — documented divergence, null is saner.
        return col.try_cast(target)
    if isinstance(target, (T.FloatType, T.DoubleType)):
        # NaN/±Inf → NULL: valid JSON numbers can never produce them, so
        # any that appear came from the non-standard NaN/Infinity literals
        # or their quoted forms (Jackson special-cases both on a double
        # carrier) or from overflow like 1e999 — the reference nulls a
        # non-number float value (go:768-786) and its parser rejects the
        # bare literals outright (r8 review; we null the FIELD where Go's
        # parse error nulls the whole row — the closer reachable shape).
        v = col.try_cast(target)
        return F.when(
            F.isnan(v) | (F.abs(v) == F.lit(float("inf"))), F.lit(None).cast(target)
        ).otherwise(v)
    if isinstance(target, T.BooleanType):
        return col.try_cast(T.BooleanType())
    if isinstance(target, T.TimestampType):
        # RFC3339 string → timestamp; bare number → epoch NANOSECONDS
        # (appendTimestamp kafka/consumer.go:816-821). ns→µs truncation is
        # the documented divergence from the reference's ns timestamps.
        # ANSI-safe (Spark 4 default): a regex-passing-but-invalid value
        # ('2024-13-01…') must coerce to NULL like the reference's failed
        # parse — try_to_timestamp, not to_timestamp, or one bad message
        # kills the streaming query. Same for the epoch arm: 1e300/1000
        # overflows the long cast → try_cast nulls it.
        # Lowercase 'z' zone: RFC3339 is case-insensitive there and Go's
        # parser accepts it (so does inference.is_rfc3339) — Spark's
        # parser does not, so normalize the suffix before parsing instead
        # of silently nulling a value the reference parses (r5 review).
        as_num = col.try_cast(T.DoubleType())
        # floor (not truncate-toward-zero) to match catalog.load_table's
        # `div 1000` ns normalization and DuckDB's ns→µs cast for
        # pre-1970 instants: if the truncated quotient overshoots the true
        # one (negative, non-multiple-of-1000), step down one µs.
        q = (as_num / F.lit(1000.0)).try_cast(T.LongType())
        micros = F.when(
            q.isNotNull() & (q.cast(T.DoubleType()) * 1000.0 > as_num), q - 1
        ).otherwise(q)
        return (
            F.when(
                col.rlike(RFC3339_SQL_RE),
                F.try_to_timestamp(F.regexp_replace(col, "z$", "Z")),
            )
            .when(as_num.isNotNull(), F.timestamp_micros(micros))
            .otherwise(F.lit(None).cast(T.TimestampType()))
        )
    if isinstance(target, T.BinaryType):
        return col.cast(T.BinaryType())
    return col.cast(T.StringType())


def coerce_to_schema(struct_col: str, target: T.StructType) -> list[Column]:
    """Expand a parsed carrier struct column into target-typed payload
    columns (the Spark analog of the per-builder appendValue loop,
    kafka/consumer.go:583-648)."""
    return [
        # getField, not F.col(f"{struct}.{name}"): a dotted path string
        # would resolve a legal JSON key like "user.name" as nested struct
        # navigation and crash analysis; getField takes the name as a
        # literal (r5 review)
        coerce_expr(F.col(struct_col).getField(f.name), f.dataType).alias(f.name)
        for f in target.fields
        if f.name not in _METADATA_NAMES
    ]
