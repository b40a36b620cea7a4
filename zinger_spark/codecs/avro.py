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

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

# NOTE: pandas must be a MODULE-level import: the pandas-UDF type hints
# below are strings (future annotations) that pyspark resolves against
# the module globals — a function-local `import pandas as pd` leaves
# 'pd.DataFrame' unresolvable and the UDF definition fails.

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
    a general union (the reference maps it to a Zed union type,
    schema.go:234-244) becomes the tagged struct of SURVEY §1.2 —
    ``struct<tag int, b<i> T_i ...>`` with one nullable field per
    non-null branch, ``tag`` = the Avro branch index."""
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
        if len(schema) == 2 and "null" in schema:
            return spark_type_of_avro(next(s for s in schema if s != "null"))
        fields = [T.StructField("tag", T.IntegerType(), True)]
        for i, b in enumerate(schema):
            if b != "null":
                fields.append(T.StructField(f"b{i}", spark_type_of_avro(b), True))
        return T.StructType(fields)
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


def avro_encoder(registry, namespace: str = DEFAULT_NAMESPACE):
    """Producer-side codec ``encode(col, datatype) -> Column`` for the
    produce/to-kafka projections (fifo/producer.go:23-45: register the
    schema per RecordNameStrategy, then emit the Confluent frame).
    Registration happens once per distinct type at plan-build time —
    the same memoization point as the reference's ``Producer.encode``."""

    def encode(col: Column, dt: T.DataType) -> Column:
        schema_id = registry.register(subject_of(dt, namespace), avro_schema_of(dt, namespace))
        return frame(to_avro_body(col, dt, namespace), schema_id)

    return encode


# ---------------------------------------------------------------------------
# body codec: JVM spark-avro when the connector jar is loaded, else an
# Arrow-batched pandas UDF over the pure-Python codec (codecs.avro_py) —
# ~10-100x slower than the JVM path but correct everywhere; the probe
# runs once per process.

_SPARK_AVRO_OK: bool | None = None


def spark_avro_usable() -> bool:
    global _SPARK_AVRO_OK
    if _SPARK_AVRO_OK is None:
        try:
            from pyspark.sql import SparkSession
            from pyspark.sql.avro.functions import to_avro

            spark = SparkSession.getActiveSession()
            if spark is None:
                return False  # don't cache a session-less probe
            spark.range(1).select(
                to_avro(F.struct(F.lit(1).alias("a")))
            ).collect()
            _SPARK_AVRO_OK = True
        except Exception:  # noqa: BLE001 - AVRO_NOT_LOADED and friends
            _SPARK_AVRO_OK = False
    return _SPARK_AVRO_OK


def _sanitize_row(row: dict, dt: T.StructType) -> dict:
    """pandas null sentinels -> None: NaN in numeric columns (pandas
    nulls numerics with NaN, float/double included — a true-NaN payload
    is indistinguishable from a null there, and the JVM to_avro path
    encodes the null union branch) and NaT in temporal columns — both
    are self-unequal scalars, which is the test used (container types
    are skipped: lists/dicts never take the sentinel forms)."""
    out = {}
    for f in dt.fields:
        v = row.get(f.name)
        if (
            v is not None
            and not isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            )
            and v != v  # NaN or NaT
        ):
            v = None
        if isinstance(f.dataType, T.StructType) and isinstance(v, dict):
            v = _sanitize_row(v, f.dataType)
        out[f.name] = v
    return out


def _has_general_union(schema) -> bool:
    """True if any union in ``schema`` is not the smashable [null, T]
    form.  The JVM spark-avro connector maps those to ``member0/
    member1`` structs with no tag — a different convention from the
    reference-parity tagged struct — so such schemas always take the
    pure-Python codec path."""
    if isinstance(schema, list):
        if not (len(schema) == 2 and "null" in schema):
            return True
        return any(_has_general_union(s) for s in schema)
    if isinstance(schema, dict):
        t = schema.get("type")
        if t == "record":
            return any(_has_general_union(f["type"]) for f in schema["fields"])
        if t == "array":
            return _has_general_union(schema["items"])
        if t == "map":
            return _has_general_union(schema["values"])
    return False


def to_avro_body(col: Column, dt: T.DataType, namespace: str = DEFAULT_NAMESPACE) -> Column:
    """Struct column -> Avro body bytes (zavro/encoder.go:59-66 minus
    the wire header, which ``frame`` adds)."""
    schema = avro_schema_of(dt, namespace)
    if spark_avro_usable():
        from pyspark.sql.avro.functions import to_avro

        return to_avro(col, json.dumps(schema))

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    from . import avro_py  # noqa: PLC0415

    @pandas_udf("binary")
    def _enc(s: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [
                avro_py.encode_value(schema, _sanitize_row(r, dt))
                for r in s.to_dict("records")
            ]
        )

    return _enc(col)


def to_avro_body_of_schema(col: Column, avro_schema: dict | str) -> Column:
    """Struct column -> Avro body bytes for an EXPLICIT Avro schema
    (the general-union round-trip path: the column's Spark type is the
    tagged-struct mapping of ``avro_schema``, which ``avro_schema_of``
    cannot derive from a Spark type).  Always the pure-Python codec —
    see _has_general_union for why the JVM connector can't serve it."""
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    schema = avro_schema
    dt = spark_type_of_avro(avro_schema)

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    from . import avro_py  # noqa: PLC0415

    @pandas_udf("binary")
    def _enc(s: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [
                avro_py.encode_value(schema, _sanitize_row(r, dt))
                for r in s.to_dict("records")
            ]
        )

    return _enc(col)


def from_avro_body(col: Column, avro_schema: dict | str) -> Column:
    """Avro body bytes -> typed struct column (zavro/decoder.go:85-221)."""
    if isinstance(avro_schema, str):
        avro_schema = json.loads(avro_schema)
    if spark_avro_usable() and not _has_general_union(avro_schema):
        from pyspark.sql.avro.functions import from_avro

        return from_avro(col, json.dumps(avro_schema))

    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    from . import avro_py  # noqa: PLC0415

    dt = spark_type_of_avro(avro_schema)
    names = [f.name for f in dt.fields]

    @pandas_udf(dt)
    def _dec(s: pd.Series) -> pd.DataFrame:
        vals = [
            None if b is None else avro_py.decode_value(avro_schema, bytes(b))
            for b in s
        ]
        return pd.DataFrame(
            [({} if v is None else v) for v in vals], columns=names
        )

    # a NULL body must decode to a NULL struct (as the JVM from_avro
    # does), not a struct of all-null fields — pandas DataFrames can't
    # express a null struct row, so gate the UDF with a when()
    return F.when(col.isNotNull(), _dec(col))


# ---------------------------------------------------------------------------
# schema registry client (decoder.go:19,54-72; encoder.go:29-51)


class SchemaRegistry:
    """Minimal Confluent registry client with the reference's ID cache.
    Driver-side only: schema lookup happens at plan time, never per row.

    ``user``/``password``: HTTP basic auth on every request — the
    reference reads the same credentials from schema_registry.json and
    sets them on srclient (cli/flags.go:34-46, consume/command.go:83)."""

    def __init__(self, url: str, user: str | None = None,
                 password: str | None = None):
        self.url = url.rstrip("/")
        self._by_id: dict[int, dict] = {}
        self._auth: str | None = None
        if user or password:
            import base64  # noqa: PLC0415

            token = base64.b64encode(
                f"{user or ''}:{password or ''}".encode()
            ).decode()
            self._auth = f"Basic {token}"

    def _headers(self) -> dict[str, str]:
        h = {"Content-Type": "application/vnd.schemaregistry.v1+json"}
        if self._auth:
            h["Authorization"] = self._auth
        return h

    def _get(self, path: str) -> dict:
        req = urllib.request.Request(self.url + path, headers=self._headers())
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            return json.loads(resp.read())

    def _post(self, path: str, body: dict) -> dict:
        req = urllib.request.Request(
            self.url + path,
            data=json.dumps(body).encode(),
            headers=self._headers(),
        )
        with urllib.request.urlopen(req) as resp:  # noqa: S310
            return json.loads(resp.read())

    def compatibility(self, subject: str | None = None) -> str:
        """Global (or per-subject) compatibility mode — GET /config
        (Confluent API; the knob next to the credentials in a managed
        registry)."""
        path = "/config" if subject is None else f"/config/{subject}"
        return self._get(path)["compatibilityLevel"]

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


class FakeSchemaRegistry:
    """In-process registry double with the same surface as
    SchemaRegistry — the broker-free seam for Avro-path tests (the
    reference's ztests mock their registry the same way)."""

    def __init__(self):
        self._by_id: dict[int, dict] = {}
        self._subjects: dict[str, int] = {}
        self._next = 1

    def schema_by_id(self, schema_id: int) -> dict:
        return self._by_id[schema_id]

    def register(self, subject: str, schema: dict) -> int:
        key = json.dumps(schema, sort_keys=True)
        for sid, s in self._by_id.items():
            if json.dumps(s, sort_keys=True) == key:
                self._subjects[subject] = sid
                return sid
        sid = self._next
        self._next += 1
        self._by_id[sid] = schema
        self._subjects[subject] = sid
        return sid

    def subjects(self) -> list[str]:
        return sorted(self._subjects)


# ---------------------------------------------------------------------------
# mixed-schema topics: decode per registry ID (SURVEY §1.1 strategy (b))


def decode_by_schema_id(df, value_col: str, registry, namespace: str = DEFAULT_NAMESPACE):
    """Decode a batch whose ``value_col`` holds Confluent-framed Avro
    messages of MULTIPLE schemas: group rows by the wire schema ID,
    decode each group against its registry schema, fuse the legs
    (zavro/decoder.go:19,54-72 — the per-ID schema cache — combined
    with the fuse-union the heterogeneous-topic golden expects).

    The distinct-ID probe is a tiny driver action (one row per schema
    version present in the batch — a handful); each leg is a filtered
    scan + one decode column, so the whole thing stays one fused plan
    per schema with no per-row Python beyond the body codec itself.
    """
    from ..datamodel import fuse  # noqa: PLC0415 - avoid import cycle

    sid_col = wire_schema_id(F.col(value_col))
    ids = sorted(
        r["sid"]
        for r in df.filter(F.col(value_col).isNotNull())
        .select(sid_col.alias("sid"))
        .distinct()
        .collect()
    )
    legs = []
    for sid in ids:
        schema = registry.schema_by_id(sid)
        body = unframe(F.col(value_col))
        legs.append(
            df.filter(F.col(value_col).isNotNull() & (sid_col == sid)).withColumn(
                value_col, from_avro_body(body, schema)
            )
        )
    # Tombstones (compacted-topic deletes, value=NULL) carry no schema
    # ID; keep them as null-valued rows so the delete marker survives
    # into the pool (fuse widens struct<> into the union schema).
    tombstones = df.filter(F.col(value_col).isNull()).withColumn(
        value_col, F.lit(None).cast(T.StructType([]))
    )
    legs.append(tombstones)
    return fuse(*legs)
