"""Codec round-trip tests mirroring the reference's test corpus
(connectjson/connectjson_test.go:12-54) and Avro schema goldens
(zavro/schema_test.go:12-117)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zinger_spark.codecs import avro as zavro
from zinger_spark.codecs import connect_json as cj

def _debezium_value() -> T.StructType:
    return T.StructType.fromDDL("""
    before struct<id:int,customer_id:int,street:string,city:string,
                  state:string,zip:string,type:string>,
    after  struct<id:int,customer_id:int,street:string,city:string,
                  state:string,zip:string,type:string>,
    source struct<version:string,connector:string,name:string,ts_ms:bigint,
                  snapshot:string,db:string,sequence:string,`table`:string,
                  server_id:bigint,gtid:string,file:string,pos:bigint,
                  row:int,thread:bigint,query:string>,
    op string, ts_ms bigint,
    transaction struct<id:string,total_order:bigint,data_collection_order:bigint>
    """)

DEBEZIUM_ROW = (
    None,  # before: typed null
    (10, 1001, "3183 Moore Avenue", "Euless", "Texas", "76036", "SHIPPING"),
    ("1.7.2.Final", "mysql", "mysqlserver1", 1644503374812, "true", "inventory",
     None, "addresses", 0, None, "mysql-bin.000003", 157, 0, None, None),
    "r",
    1644503374813,
    None,  # transaction: typed null
)


# Round-trip corpus: (schema DDL, row tuple) — the connectjson_test.go
# value cases expressible in a static schema.
CASES = [
    ("v boolean", (True,)),
    ("v tinyint", (8,)),
    ("v smallint", (16,)),
    ("v int", (32,)),
    ("v bigint", (64,)),
    ("v float", (32.0,)),
    ("v double", (64.0,)),
    ("v binary", (bytes.fromhex("0123456789"),)),
    ("v string", ("abcd",)),
    ("a bigint", (1,)),
    ("a struct<>", (None,)),  # {a:null({})}
    ("key struct<id:int>", ((10,),)),
]


@pytest.mark.parametrize("ddl,row", CASES, ids=[c[0] for c in CASES])
def test_connect_json_roundtrip_scalar(spark, ddl, row):
    schema = T.StructType.fromDDL(ddl)
    df = spark.createDataFrame([row], schema)
    enc = df.select(
        cj.encode(F.struct(*[F.col(f.name) for f in schema.fields]), schema).alias("j")
    )
    wire = enc.collect()[0]["j"]
    env = json.loads(wire)
    assert set(env) == {"schema", "payload"}
    dec = enc.select(cj.decode(F.col("j"), env["schema"]).alias("v")).collect()[0]["v"]
    expected = df.collect()[0]
    assert tuple(dec) == tuple(expected)


def test_connect_json_roundtrip_debezium(spark):
    """The full Debezium MySQL event (connectjson_test.go:34): nested
    structs, int32 vs int64, typed nulls."""
    DEBEZIUM_VALUE = _debezium_value()
    df = spark.createDataFrame([DEBEZIUM_ROW], DEBEZIUM_VALUE)
    enc = df.select(
        cj.encode(F.struct(*[F.col(f.name) for f in DEBEZIUM_VALUE.fields]), DEBEZIUM_VALUE).alias("j")
    )
    wire = enc.collect()[0]["j"]
    env = json.loads(wire)
    dec_df = enc.select(cj.decode(F.col("j"), env["schema"]).alias("v")).select("v.*")
    assert dec_df.schema == df.schema
    assert dec_df.collect() == df.collect()


@pytest.mark.parametrize(
    "ddl,value,wire_payload",
    [
        ("string", "hello", "hello"),
        ("string", 'quote " and \\ backslash', 'quote " and \\ backslash'),
        ("bigint", 42, 42),
        ("binary", b"\x01\x02\xff", "AQL/"),
        ("string", None, None),
    ],
    ids=["plain-string", "escaped-string", "int", "bytes", "null"],
)
def test_connect_json_scalar_toplevel_payload(spark, ddl, value, wire_payload):
    """A NON-struct top-level payload (schema-less string topics hit
    this via cmd_to_kafka) must still be a VALID JSON envelope — strings
    quoted/escaped, bytes base64-quoted (the old get_json_object path
    emitted them raw: {"payload":hello})."""
    dt = T.StructType.fromDDL(f"v {ddl}")[0].dataType
    df = spark.createDataFrame([(value,)], T.StructType([T.StructField("v", dt)]))
    wire = df.select(cj.encode(F.col("v"), dt).alias("j")).collect()[0]["j"]
    env = json.loads(wire)  # raises if the envelope is invalid JSON
    assert env["payload"] == wire_payload
    dec = df.select(
        cj.encode(F.col("v"), dt).alias("j")
    ).select(cj.decode(F.col("j"), json.loads(wire)["schema"]).alias("v"))
    got = dec.collect()[0]["v"]
    if ddl == "binary":
        # scalar decode of bytes comes back base64 through from_json's
        # string passage; compare through the base64 form
        assert got == value
    else:
        assert got == value


def test_connect_map_temporal_values_wire_int(spark):
    """Map values/keys with temporal types must be serialized in their
    integer wire form, matching the declared int64/int32 schema (the
    struct/array branches already did this; maps went out as ISO-8601
    strings while the schema said int64)."""
    dt = T.MapType(T.StringType(), T.TimestampType())
    df = spark.createDataFrame(
        [({"a": "2022-02-10 13:49:34.812"},)], "m map<string,string>"
    ).select(F.transform_values("m", lambda k, v: v.cast("timestamp")).alias("m"))
    wire = df.select(cj.encode(F.col("m"), dt).alias("j")).collect()[0]["j"]
    env = json.loads(wire)
    assert env["schema"]["values"]["type"] == "int64"
    assert env["payload"] == {"a": 1644500974812000}
    # date keys too (transform_keys branch)
    dt2 = T.MapType(T.DateType(), T.LongType())
    df2 = spark.createDataFrame([({"2022-02-10": 1},)], "m map<string,bigint>").select(
        F.transform_keys("m", lambda k, v: k.cast("date")).alias("m")
    )
    wire2 = df2.select(cj.encode(F.col("m"), dt2).alias("j")).collect()[0]["j"]
    env2 = json.loads(wire2)
    assert env2["schema"]["keys"]["type"] == "int32"
    assert env2["payload"] == {"19033": 1}


def test_connect_schema_bytes_base64(spark):
    """bytes ride base64 (connectjson.go:127-128, decode :288-294)."""
    schema = T.StructType.fromDDL("b binary")
    df = spark.createDataFrame([(b"\x01\x02\xff",)], schema)
    wire = df.select(cj.encode(F.struct("b"), schema).alias("j")).collect()[0]["j"]
    assert json.loads(wire)["payload"]["b"] == "AQL/"


def test_connect_schema_field_order(spark):
    """Schema JSON declares fields in struct order with optional flags."""
    dt = T.StructType.fromDDL("a bigint, b struct<c:string>")
    s = cj.connect_schema_of(dt)
    assert s["type"] == "struct"
    assert [f["field"] for f in s["fields"]] == ["a", "b"]
    assert all(f["optional"] for f in s["fields"])
    rt = cj.spark_type_of(s)
    assert rt == T.StructType.fromDDL("a bigint, b struct<c:string>")


def test_connect_timestamp_wire_int64(spark):
    """time -> int64 epoch micros on the wire (reference maps Zed time
    to int64, connectjson.go:119-120)."""
    schema = T.StructType.fromDDL("ts timestamp")
    df = spark.createDataFrame([("2022-02-10 13:49:34.812",)], "ts string").select(
        F.col("ts").cast("timestamp")
    )
    wire = df.select(cj.encode(F.struct("ts"), schema).alias("j")).collect()[0]["j"]
    env = json.loads(wire)
    assert env["schema"]["fields"][0]["type"] == "int64"
    assert env["payload"]["ts"] == 1644500974812000


# ---------------------------------------------------------------------------
# Avro


def test_avro_wire_framing(spark):
    """magic 0 + 4-byte BE schema ID + body (zavro/encoder.go:59-66)."""
    df = spark.createDataFrame([(b"avrobody",)], "body binary")
    framed = df.select(zavro.frame(F.col("body"), 0x01020304).alias("w"))
    w = framed.collect()[0]["w"]
    assert w == b"\x00\x01\x02\x03\x04avrobody"
    back = framed.select(
        zavro.unframe(F.col("w")).alias("b"), zavro.wire_schema_id(F.col("w")).alias("id")
    ).collect()[0]
    assert back["b"] == b"avrobody"
    assert back["id"] == 0x01020304


def test_avro_schema_nullable_union_and_md5_name(spark):
    """Every field becomes [null, T] and records get md5-derived names
    (zavro/schema.go:35-71, :59-62)."""
    dt = T.StructType.fromDDL("s string, r struct<a:bigint>")
    s = zavro.avro_schema_of(dt)
    assert s["type"] == "record"
    assert s["name"].startswith("zng_") and len(s["name"]) == 4 + 32
    assert s["fields"][0]["type"] == ["null", "string"]
    inner = s["fields"][1]["type"][1]
    assert inner["type"] == "record"
    assert inner["fields"][0]["type"] == ["null", "long"]
    # decode side smashes [null, T] back to nullable T (schema.go:199-201)
    rt = zavro.spark_type_of_avro(s)
    assert rt == T.StructType.fromDDL("s string, r struct<a:bigint>")


def test_avro_timestamp_micros(spark):
    """time <-> timestamp-micros logical type (zavro/encoder.go:153-156,
    microtime.go:15,42)."""
    dt = T.StructType.fromDDL("t timestamp")
    s = zavro.avro_schema_of(dt)
    assert s["fields"][0]["type"][1] == {"type": "long", "logicalType": "timestamp-micros"}
    assert zavro.spark_type_of_avro(s) == dt


def test_avro_subject_record_name_strategy(spark):
    a = T.StructType.fromDDL("a bigint")
    b = T.StructType.fromDDL("b bigint")
    sa, sb = zavro.subject_of(a), zavro.subject_of(b)
    assert sa != sb and sa.startswith(zavro.DEFAULT_NAMESPACE + ".zng_")


def test_avro_body_roundtrip(spark):
    """from_avro_body(to_avro_body(x)) == x — via spark-avro when the
    connector jar is loaded, else via the Arrow/pandas fallback over the
    pure-Python codec (codecs.avro_py), so the body path is exercised in
    every deployment (zavro/encoder.go:59-66, decoder.go:85-221)."""
    dt = T.StructType.fromDDL("a bigint, s string, nested struct<x:double>")
    df = spark.createDataFrame([(1, "x", (2.5,)), (2, None, None)], dt)
    enc = df.select(
        zavro.to_avro_body(F.struct("a", "s", "nested"), dt).alias("body")
    )
    dec = enc.select(
        zavro.from_avro_body(F.col("body"), zavro.avro_schema_of(dt)).alias("v")
    ).select("v.*")
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, df.collect()))


AVRO_PY_CASES = [
    ("boolean", True),
    ("int", -3),
    ("long", 1 << 40),
    ("float", 32.5),
    ("double", -64.25),
    ("string", "héllo"),
    ("bytes", b"\x00\x01\xff"),
    ({"type": "array", "items": "long"}, [1, -2, 3]),
    ({"type": "map", "values": "string"}, {"k1": "v1", "k2": "v2"}),
    ({"type": "enum", "name": "e", "symbols": ["A", "B"]}, "B"),
    ({"type": "long", "logicalType": "timestamp-micros"},
     __import__("datetime").datetime(2022, 2, 10, 13, 49, 34, 812000)),
    ({"type": "int", "logicalType": "date"}, __import__("datetime").date(2022, 2, 10)),
    (["null", "string"], None),
    (["null", "string"], "x"),
]


@pytest.mark.parametrize("schema,value", AVRO_PY_CASES,
                         ids=[str(c[0])[:30] for c in AVRO_PY_CASES])
def test_avro_py_primitive_roundtrip(schema, value):
    """Pure-Python binary codec against the Avro spec, value by value."""
    from zinger_spark.codecs import avro_py

    body = avro_py.encode_value(schema, value)
    back = avro_py.decode_value(schema, body)
    if schema == "float":
        assert abs(back - value) < 1e-6
    else:
        assert back == value


def test_avro_py_record_matches_reference_shape():
    """All-optional record ([null,T] per field, zavro/schema.go:35-71)
    with nested record, null field, and a known byte prefix: a null
    union branch encodes as just the branch index varint."""
    from zinger_spark.codecs import avro_py

    dt = T.StructType.fromDDL("a bigint, s string, r struct<b:boolean>")
    schema = zavro.avro_schema_of(dt)
    val = {"a": 5, "s": None, "r": {"b": True}}
    body = avro_py.encode_value(schema, val)
    # field a: union idx 1 (=long) then zigzag(5)=10; field s: union idx 0 (null)
    assert body[:3] == bytes([2, 10, 0])
    assert avro_py.decode_value(schema, body) == val


def test_avro_mixed_schema_topic_decode(spark):
    """Two schema IDs interleaved in one topic batch: group by the wire
    ID, decode each group with its cached registry schema, fuse
    (zavro/decoder.go:19,54-72 + SURVEY §1.1 strategy (b))."""
    from zinger_spark.codecs import avro_py
    from zinger_spark.codecs.avro import FakeSchemaRegistry, decode_by_schema_id

    dt_a = T.StructType.fromDDL("id bigint, name string")
    dt_b = T.StructType.fromDDL("id bigint, score double")
    reg = FakeSchemaRegistry()
    sid_a = reg.register(zavro.subject_of(dt_a), zavro.avro_schema_of(dt_a))
    sid_b = reg.register(zavro.subject_of(dt_b), zavro.avro_schema_of(dt_b))
    assert sid_a != sid_b

    def wire(sid, schema, val):
        import struct as _s

        return b"\x00" + _s.pack(">I", sid) + avro_py.encode_value(schema, val)

    rows = [
        (0, wire(sid_a, reg.schema_by_id(sid_a), {"id": 1, "name": "x"})),
        (1, wire(sid_b, reg.schema_by_id(sid_b), {"id": 2, "score": 0.5})),
        (2, wire(sid_a, reg.schema_by_id(sid_a), {"id": 3, "name": "y"})),
        (3, None),  # tombstone (compacted-topic delete marker)
    ]
    df = spark.createDataFrame(rows, "offset long, value binary")
    out = decode_by_schema_id(df, "value", reg)
    got = {r["offset"]: (r["value"].asDict() if r["value"] is not None else None)
           for r in out.collect()}
    # fused schema carries the union of fields; absent ones are null
    assert got[0] == {"id": 1, "name": "x", "score": None}
    assert got[1] == {"id": 2, "name": None, "score": 0.5}
    assert got[2] == {"id": 3, "name": "y", "score": None}
    # the tombstone survives as a null-valued row, not a crash/drop
    assert 3 in got and got[3] is None


def test_avro_body_null_timestamp_roundtrip(spark):
    """Null temporal fields ride the [null,T] union: pandas hands the
    fallback encoder NaT, which must become a real Avro null (not an
    int(NaN) crash)."""
    dt = T.StructType.fromDDL("a bigint, t timestamp")
    df = spark.createDataFrame(
        [(1, "2022-02-10 13:49:34.812"), (2, None)], "a bigint, t string"
    ).select("a", F.col("t").cast("timestamp").alias("t"))
    enc = df.select(zavro.to_avro_body(F.struct("a", "t"), dt).alias("body"))
    dec = enc.select(
        zavro.from_avro_body(F.col("body"), zavro.avro_schema_of(dt)).alias("v")
    ).select("v.*")
    got = {r["a"]: r["t"] for r in dec.collect()}
    assert got[2] is None
    assert str(got[1]).startswith("2022-02-10 13:49:34.812")


def test_avro_body_null_double_roundtrip(spark):
    """A NULL double rides the [null,T] union in the fallback codec too:
    pandas hands the encoder NaN (its null sentinel for float columns),
    which must encode the null branch — matching the JVM to_avro path —
    not a NaN payload."""
    dt = T.StructType.fromDDL("a bigint, x double")
    df = spark.createDataFrame([(1, 2.5), (2, None)], dt)
    enc = df.select(zavro.to_avro_body(F.struct("a", "x"), dt).alias("body"))
    dec = enc.select(
        zavro.from_avro_body(F.col("body"), zavro.avro_schema_of(dt)).alias("v")
    ).select("v.*")
    got = {r["a"]: r["x"] for r in dec.collect()}
    assert got[1] == 2.5
    assert got[2] is None  # not NaN


def test_avro_null_body_decodes_to_null_struct(spark):
    """A NULL body (e.g. a compacted-topic tombstone) must decode to a
    NULL struct, not a struct of all-null fields — matching from_avro."""
    dt = T.StructType.fromDDL("a bigint, s string")
    schema = zavro.avro_schema_of(dt)
    from zinger_spark.codecs import avro_py

    body = avro_py.encode_value(schema, {"a": 7, "s": "x"})
    df = spark.createDataFrame([(0, body), (1, None)], "off long, body binary")
    out = df.select(
        "off", zavro.from_avro_body(F.col("body"), schema).alias("v")
    ).collect()
    got = {r["off"]: r["v"] for r in out}
    assert got[0] is not None and got[0]["a"] == 7 and got[0]["s"] == "x"
    assert got[1] is None  # whole struct NULL, not Row(a=None, s=None)


# ---------------------------------------------------------------------------
# general (multi-branch) Avro unions — the reference decodes them to a
# Zed union type (zavro/schema.go:234-244); the Spark mapping is the
# SURVEY §1.2 tagged struct: struct<tag int, b<i> T_i ...>.


def test_avro_general_union_type_mapping():
    """[null, long, string] -> struct<tag int, b1 bigint, b2 string>;
    plain [null, T] still smashes to nullable T (schema.go:199-201)."""
    dt = zavro.spark_type_of_avro(["null", "long", "string"])
    assert [f.name for f in dt.fields] == ["tag", "b1", "b2"]
    assert dt["b1"].dataType == T.LongType()
    assert dt["b2"].dataType == T.StringType()
    assert zavro.spark_type_of_avro(["null", "long"]) == T.LongType()
    # no-null 2-branch unions are general, not optional
    dt2 = zavro.spark_type_of_avro(["long", "string"])
    assert [f.name for f in dt2.fields] == ["tag", "b0", "b1"]


def test_avro_general_union_wire_roundtrip():
    """Each branch (including the null branch) round-trips through the
    binary codec, and the branch index rides the wire as a zigzag
    varint (Avro 1.11 spec)."""
    from zinger_spark.codecs import avro_py

    sch = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "payload", "type": ["null", "long", "string"]},
        ],
    }
    cases = [
        {"id": 1, "payload": {"tag": 0, "b1": None, "b2": None}},
        {"id": 2, "payload": {"tag": 1, "b1": 42, "b2": None}},
        {"id": 3, "payload": {"tag": 2, "b1": None, "b2": "hi"}},
    ]
    for v in cases:
        assert avro_py.decode_value(sch, avro_py.encode_value(sch, v)) == v
    # wire check: id=3 -> 06; tag=2 -> 04; len("hi")=2 -> 04
    assert avro_py.encode_value(sch, cases[2]) == b"\x06\x04\x04hi"


def test_avro_general_union_errors():
    from zinger_spark.codecs import avro_py

    with pytest.raises(avro_py.AvroCodecError, match="tagged value"):
        avro_py.encode_value(["null", "long", "string"], 42)
    with pytest.raises(avro_py.AvroCodecError, match="out of range"):
        avro_py.encode_value(["null", "long", "string"], {"tag": 9})
    with pytest.raises(avro_py.AvroCodecError, match="out of range"):
        avro_py.decode_value(["null", "long"], b"\x08")


def test_avro_general_union_spark_roundtrip(spark):
    """End-to-end through the pandas-UDF codec path: Spark tagged
    structs -> Avro body bytes -> tagged structs.  Always the Python
    codec (the JVM connector's member0/member1 convention differs)."""
    sch = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "payload", "type": ["null", "long", "string"]},
        ],
    }
    dt = zavro.spark_type_of_avro(sch)
    df = spark.createDataFrame(
        [
            (1, (0, None, None)),
            (2, (1, 42, None)),
            (3, (2, None, "hi")),
        ],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("payload", dt["payload"].dataType),
            ]
        ),
    )
    enc = df.select(
        zavro.to_avro_body_of_schema(F.struct("id", "payload"), sch).alias("body")
    )
    dec = enc.select(zavro.from_avro_body(F.col("body"), sch).alias("v")).select("v.*")
    got = {r["id"]: r["payload"] for r in dec.collect()}
    assert got[1]["tag"] == 0 and got[1]["b1"] is None and got[1]["b2"] is None
    assert got[2]["tag"] == 1 and got[2]["b1"] == 42
    assert got[3]["tag"] == 2 and got[3]["b2"] == "hi"


def test_avro_registry_decode_with_general_union(spark):
    """The full consumer decode path (Confluent frame -> registry
    schema -> body) on a REGISTRY schema containing a multi-branch
    union: the tagged-struct mapping flows through decode_by_schema_id
    exactly like any other registry schema (zavro/schema.go:234-244 —
    the reference's union decode — through SURVEY §1.1 strategy (b))."""
    from zinger_spark.codecs import avro_py
    from zinger_spark.codecs.avro import FakeSchemaRegistry, decode_by_schema_id

    union_schema = {
        "type": "record",
        "name": "evt",
        "namespace": zavro.DEFAULT_NAMESPACE,
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "payload", "type": ["null", "long", "string"]},
        ],
    }
    reg = FakeSchemaRegistry()
    sid = reg.register(f"{zavro.DEFAULT_NAMESPACE}.evt", union_schema)

    def wire(val):
        import struct as _s

        return b"\x00" + _s.pack(">I", sid) + avro_py.encode_value(union_schema, val)

    rows = [
        (0, wire({"id": 1, "payload": {"tag": 0, "b1": None, "b2": None}})),
        (1, wire({"id": 2, "payload": {"tag": 1, "b1": 42, "b2": None}})),
        (2, wire({"id": 3, "payload": {"tag": 2, "b1": None, "b2": "hi"}})),
    ]
    df = spark.createDataFrame(rows, "offset long, value binary")
    out = decode_by_schema_id(df, "value", reg)
    got = {r["offset"]: r["value"]["payload"] for r in out.collect()}
    assert got[0]["tag"] == 0 and got[0]["b1"] is None and got[0]["b2"] is None
    assert got[1]["tag"] == 1 and got[1]["b1"] == 42
    assert got[2]["tag"] == 2 and got[2]["b2"] == "hi"
