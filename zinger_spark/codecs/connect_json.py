"""Kafka Connect JSON codec: {"schema": {...}, "payload": {...}} envelope.

Mirrors connectjson/connectjson.go of the reference:
  - type mapping encode: connectjson.go:102-135 (int8..int64, float,
    double, boolean, bytes=base64, string; everything Optional)
  - decode: connectjson.go:230-273 (payload shaped to the schema-declared
    type — here `from_json` with the converted StructType does the
    cast+field-order normalization the reference's ConstShaper does)
  - schema cache keyed by schema JSON: connectjson.go:19,212-227 ->
    plan-time conversion; per-topic constant schema (strategy (a) of
    SURVEY §1.1)

Extensions beyond the reference (which panics on these,
connectjson.go:146-153): array and map schemas, which real Kafka
Connect supports.

Timestamps ride as int64 epoch-micros (the reference emits Zed time as
raw int64, connectjson.go:119-120; Spark's native resolution is µs).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

_PRIMITIVE_TO_CONNECT: list[tuple[type, str]] = [
    (T.ByteType, "int8"),
    (T.ShortType, "int16"),
    (T.IntegerType, "int32"),
    (T.LongType, "int64"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BooleanType, "boolean"),
    (T.BinaryType, "bytes"),
    (T.StringType, "string"),
    (T.TimestampType, "int64"),
    (T.DateType, "int32"),
]

_CONNECT_TO_SPARK: dict[str, T.DataType] = {
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


class ConnectSchemaError(Exception):
    pass


def connect_schema_of(dt: T.DataType, field: str | None = None, name: str | None = None) -> dict:
    """Spark type -> Connect schema dict (marshalSchema,
    connectjson.go:98-160; every node Optional like the reference's
    all-fields-optional stance, zavro/schema.go:45-51)."""
    out: dict = {"optional": True}
    if name:
        out["name"] = name
    if field is not None:
        out["field"] = field
    if isinstance(dt, T.StructType):
        out["type"] = "struct"
        out["fields"] = [connect_schema_of(f.dataType, field=f.name) for f in dt.fields]
        return out
    if isinstance(dt, T.ArrayType):
        out["type"] = "array"
        out["items"] = connect_schema_of(dt.elementType)
        return out
    if isinstance(dt, T.MapType):
        out["type"] = "map"
        out["keys"] = connect_schema_of(dt.keyType)
        out["values"] = connect_schema_of(dt.valueType)
        return out
    for klass, cname in _PRIMITIVE_TO_CONNECT:
        if isinstance(dt, klass):
            out["type"] = cname
            return out
    if isinstance(dt, T.NullType):
        raise ConnectSchemaError("null type unsupported by Connect")
    raise ConnectSchemaError(f"{dt.simpleString()} unsupported by Connect")


def spark_type_of(schema: dict) -> T.DataType:
    """Connect schema dict -> Spark type (decodeSchema,
    connectjson.go:230-273)."""
    ctype = schema.get("type")
    if ctype == "struct":
        return T.StructType(
            [
                T.StructField(f["field"], spark_type_of(f), True)
                for f in schema.get("fields", [])
            ]
        )
    if ctype == "array":
        return T.ArrayType(spark_type_of(schema["items"]), True)
    if ctype == "map":
        return T.MapType(
            spark_type_of(schema["keys"]), spark_type_of(schema["values"]), True
        )
    if ctype in _CONNECT_TO_SPARK:
        return _CONNECT_TO_SPARK[ctype]
    raise ConnectSchemaError(f"unknown type {ctype!r} in Connect schema")


def _wire_cast(col: Column, dt: T.DataType) -> tuple[Column, T.DataType]:
    """Rewrite timestamps/dates to their integer wire form, recursively."""
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(col), T.LongType()
    if isinstance(dt, T.DateType):
        return F.datediff(col, F.lit("1970-01-01").cast("date")), T.IntegerType()
    if isinstance(dt, T.StructType):
        parts, fields = [], []
        for f in dt.fields:
            c, t = _wire_cast(col.getField(f.name), f.dataType)
            parts.append(c.alias(f.name))
            fields.append(T.StructField(f.name, t, True))
        wired = F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts))
        return wired, T.StructType(fields)
    if isinstance(dt, T.ArrayType):
        elem_c, elem_t = _wire_cast(F.lit(None), dt.elementType)
        if elem_t == dt.elementType:
            return col, dt
        return (
            F.transform(col, lambda x: _wire_cast(x, dt.elementType)[0]),
            T.ArrayType(elem_t, True),
        )
    if isinstance(dt, T.MapType):
        # mirror the ArrayType handling for both sides of the map so a
        # temporal key/value is declared int64/int32 AND serialized as
        # one (to_json would otherwise emit ISO-8601 strings while the
        # schema said int64 — schema/payload disagreement)
        _, key_t = _wire_cast(F.lit(None), dt.keyType)
        _, val_t = _wire_cast(F.lit(None), dt.valueType)
        if key_t == dt.keyType and val_t == dt.valueType:
            return col, dt
        out = col
        if key_t != dt.keyType:
            out = F.transform_keys(out, lambda k, v: _wire_cast(k, dt.keyType)[0])
        if val_t != dt.valueType:
            out = F.transform_values(out, lambda k, v: _wire_cast(v, dt.valueType)[0])
        return out, T.MapType(key_t, val_t, True)
    return col, dt


def encode(col: Column, dt: T.DataType, name: str | None = None) -> Column:
    """Value struct -> Connect-JSON envelope string (Encode,
    connectjson.go:29-43). The schema part is a plan-time constant
    (one schema per topic); payload via to_json (binary -> base64,
    matching connectjson.go:127-128)."""
    wired, wire_dt = _wire_cast(col, dt)
    schema_json = json.dumps(connect_schema_of(wire_dt, name=name), separators=(",", ":"))
    if isinstance(wire_dt, (T.StructType, T.ArrayType, T.MapType)):
        payload = F.to_json(wired)
    else:
        # Scalar payload (schema-less string topics etc.): serialize via
        # a one-element array and strip the brackets, which keeps JSON
        # quoting/escaping intact — get_json_object would return strings
        # UNQUOTED and corrupt the envelope ({"payload":hello}).
        arr = F.to_json(F.array(wired))
        payload = arr.substr(F.lit(2), F.length(arr) - 2)
    return F.concat(
        F.lit('{"schema":' + schema_json + ',"payload":'),
        F.coalesce(payload, F.lit("null")),
        F.lit("}"),
    )


def decode(col: Column, connect_schema: dict | str) -> Column:
    """Connect-JSON envelope string -> typed struct column (Decode,
    connectjson.go:185-228). from_json against the schema-declared type
    performs the cast + field-order shaping."""
    if isinstance(connect_schema, str):
        connect_schema = json.loads(connect_schema)
    dt = spark_type_of(connect_schema)
    payload = F.get_json_object(col, "$.payload")
    if isinstance(dt, (T.StructType, T.ArrayType, T.MapType)):
        return F.from_json(payload, dt)
    # Scalar top-level payload: get_json_object already unquotes string
    # scalars; bytes ride base64 (connectjson.go:288-294), numbers/bools
    # cast from their literal text.
    if isinstance(dt, T.BinaryType):
        return F.unbase64(payload)
    return payload.cast(dt)


def schema_of_message(message: str) -> dict:
    """Plan-time helper: pull the embedded schema from one sampled
    message (what the reference's per-message shaper cache does at
    runtime, amortized to once per topic)."""
    return json.loads(message)["schema"]
