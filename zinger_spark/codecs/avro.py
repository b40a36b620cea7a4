"""Confluent Avro wire format + schema generation + registry client.

Reference behavior (/root/reference/zavro):
  - wire framing: 1 magic byte 0x00 + 4-byte big-endian schema ID +
    Avro body (encoder.go:59-66, decoder.go:35-52)
  - schema generation: every record field wrapped in a [null, T] union
    (schema.go:35-71); record name = "zng_" + md5 of the type string
    (schema.go:59-62); default namespace io.brimdata.zync
    (cli/flags.go:30-32)
  - registry: RecordNameStrategy subjects (namespace + record name) so
    many schemas share one topic (encoder.go:45-51); decoder caches
    schemas by ID (decoder.go:19,54-72)

The Avro body encode/decode itself rides on Spark's built-in
``from_avro``/``to_avro`` (pyspark.sql.avro.functions, JVM-side) —
gated because the spark-avro jar may be absent in some deployments.
"""

from __future__ import annotations

import hashlib
import json
import struct
import urllib.request

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

MAGIC = b"\x00"
DEFAULT_NAMESPACE = "io.zinger.spark"  # reference default: cli/flags.go:30-32


# ---------------------------------------------------------------------------
# wire framing


def frame(body: Column, schema_id: int) -> Column:
    """Prepend the Confluent header (encoder.go:59-66). schema_id is a
    plan-time constant, so the 5-byte header is a literal."""
    header = MAGIC + struct.pack(">I", schema_id)
    return F.concat(F.lit(header), body)


def unframe(col: Column) -> Column:
    """Strip the 5-byte Confluent header (decoder.go:35-52)."""
    return F.expr(f"substring({_sql(col)}, 6, length({_sql(col)}) - 5)")


def wire_schema_id(col: Column) -> Column:
    """Extract the big-endian schema ID from bytes 2-5 — used to group a
    mixed-schema topic by registry ID (SURVEY §1.1 strategy (b))."""
    return F.conv(F.hex(F.expr(f"substring({_sql(col)}, 2, 4)")), 16, 10).cast("int")


def _sql(col: Column) -> str:
    # Column -> SQL fragment for expr-based byte slicing.
    return col._jc.toString()  # noqa: SLF001 - pyspark lacks binary slice API


# ---------------------------------------------------------------------------
# Avro schema generation (zavro/schema.go:13-172)

_SPARK_TO_AVRO: list[tuple[type, str]] = [
    (T.ByteType, "int"),
    (T.ShortType, "int"),
    (T.IntegerType, "int"),
    (T.LongType, "long"),
    (T.FloatType, "float"),
    (T.DoubleType, "double"),
    (T.BooleanType, "boolean"),
    (T.BinaryType, "bytes"),
    (T.StringType, "string"),
]


def avro_schema_of(dt: T.DataType, namespace: str = DEFAULT_NAMESPACE):
    """Spark type -> Avro schema, following the reference's mapping:
    records named zng_<md5(type-string)> with all fields optional
    ([null, T]); timestamps as timestamp-micros logical type
    (encoder.go:153-156, microtime.go:15,42); arrays as items."""
    if isinstance(dt, T.StructType):
        type_string = dt.simpleString()
        name = "zng_" + hashlib.md5(type_string.encode()).hexdigest()
        fields = []
        for f in dt.fields:
            fields.append(
                {
                    "name": f.name,
                    "type": ["null", avro_schema_of(f.dataType, namespace)],
                    "default": None,
                }
            )
        return {
            "type": "record",
            "name": name,
            "namespace": namespace,
            "fields": fields,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": avro_schema_of(dt.elementType, namespace)}
    if isinstance(dt, T.MapType):
        return {"type": "map", "values": avro_schema_of(dt.valueType, namespace)}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    for klass, avro in _SPARK_TO_AVRO:
        if isinstance(dt, klass):
            return avro
    if isinstance(dt, T.NullType):
        return "null"
    raise ValueError(f"{dt.simpleString()}: no Avro mapping")


def spark_type_of_avro(schema) -> T.DataType:
    """Avro schema -> Spark type (decoder side, zavro/schema.go:174-269):
    2-branch [null, T] unions smash to nullable T (schema.go:199-201);
    wider unions are unsupported (would need a tagged struct)."""
    if isinstance(schema, str):
        prim = {
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "boolean": T.BooleanType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
            "null": T.NullType(),
        }
        if schema in prim:
            return prim[schema]
        raise ValueError(f"unknown Avro primitive {schema!r}")
    if isinstance(schema, list):
        branches = [s for s in schema if s != "null"]
        if len(branches) == 1:
            return spark_type_of_avro(branches[0])
        raise ValueError("general Avro unions unsupported (use [null, T])")
    t = schema.get("type")
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], spark_type_of_avro(f["type"]), True)
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(spark_type_of_avro(schema["items"]), True)
    if t == "map":
        return T.MapType(T.StringType(), spark_type_of_avro(schema["values"]), True)
    if t == "enum":
        return T.StringType()
    if t == "long" and schema.get("logicalType") in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType()
    if t == "int" and schema.get("logicalType") == "date":
        return T.DateType()
    if isinstance(t, str):
        return spark_type_of_avro(t)
    raise ValueError(f"unsupported Avro schema {schema!r}")


def subject_of(dt: T.StructType, namespace: str = DEFAULT_NAMESPACE) -> str:
    """RecordNameStrategy subject (encoder.go:45-51): namespace +
    md5-derived record name, so multiple schemas share a topic."""
    return f"{namespace}.zng_{hashlib.md5(dt.simpleString().encode()).hexdigest()}"


# ---------------------------------------------------------------------------
# body codec (gated on spark-avro availability)


def to_avro_body(col: Column, dt: T.DataType, namespace: str = DEFAULT_NAMESPACE) -> Column:
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("spark-avro not available in this deployment") from e
    return to_avro(col, json.dumps(avro_schema_of(dt, namespace)))


def from_avro_body(col: Column, avro_schema: dict | str) -> Column:
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("spark-avro not available in this deployment") from e
    if not isinstance(avro_schema, str):
        avro_schema = json.dumps(avro_schema)
    return from_avro(col, avro_schema)


# ---------------------------------------------------------------------------
# schema registry client (decoder.go:19,54-72; encoder.go:29-51)


class SchemaRegistry:
    """Minimal Confluent registry client with the reference's ID cache.
    Driver-side only: schema lookup happens at plan time, never per row."""

    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self._by_id: dict[int, dict] = {}

    def _get(self, path: str) -> dict:
        with urllib.request.urlopen(self.url + path) as resp:  # noqa: S310
            return json.loads(resp.read())

    def _post(self, path: str, body: dict) -> dict:
        req = urllib.request.Request(
            self.url + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            return json.loads(resp.read())

    def schema_by_id(self, schema_id: int) -> dict:
        if schema_id not in self._by_id:
            raw = self._get(f"/schemas/ids/{schema_id}")
            self._by_id[schema_id] = json.loads(raw["schema"])
        return self._by_id[schema_id]

    def register(self, subject: str, schema: dict) -> int:
        resp = self._post(
            f"/subjects/{subject}/versions", {"schema": json.dumps(schema)}
        )
        return int(resp["id"])

    def subjects(self) -> list[str]:
        return self._get("/subjects")
