"""Schema Registry over REAL HTTP: the SchemaRegistry client
(codecs/avro.py — the zavro/decoder.go:54-72 / encoder.go:29-51
boundary) exercised against the in-process RegistryStub HTTP server,
closing the seam that was previously fake-object-only (the same move
kafka_stub made for the broker seam).

Covers: REST subset conformance, register dedupe to one global ID,
RecordNameStrategy subjects, the client's schema-ID cache (exactly one
GET per distinct ID, ever), and full replays of the mixed-schema-topic
and general-union decode paths through the socket."""

from __future__ import annotations

import json
import struct
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zinger_spark.codecs import avro as zavro
from zinger_spark.codecs import avro_py
from zinger_spark.codecs.avro import SchemaRegistry, decode_by_schema_id
from zinger_spark.registry_stub import RegistryStub


@pytest.fixture()
def stub():
    with RegistryStub() as s:
        yield s


def _wire(sid: int, schema: dict, val: dict) -> bytes:
    return b"\x00" + struct.pack(">I", sid) + avro_py.encode_value(schema, val)


def test_rest_conformance(spark, stub):  # spark: fromDDL needs a session
    reg = SchemaRegistry(stub.url)
    dt = T.StructType.fromDDL("a bigint, s string")
    schema = zavro.avro_schema_of(dt)
    subject = zavro.subject_of(dt)
    sid = reg.register(subject, schema)
    assert sid == 1
    # identical schema (any subject) dedupes to the same global id
    assert reg.register("other-subject", schema) == sid
    # different schema gets a new id
    dt2 = T.StructType.fromDDL("a bigint, x double")
    sid2 = reg.register(subject, zavro.avro_schema_of(dt2))
    assert sid2 != sid
    assert reg.schema_by_id(sid) == schema
    assert reg.subjects() == sorted([subject, "other-subject"])
    # versions endpoints (registry API surface beyond the client's use)
    with urllib.request.urlopen(f"{stub.url}/subjects/{subject}/versions") as r:
        assert json.loads(r.read()) == [1, 2]
    with urllib.request.urlopen(
        f"{stub.url}/subjects/{subject}/versions/latest"
    ) as r:
        latest = json.loads(r.read())
    assert latest["id"] == sid2 and latest["version"] == 2
    # error shapes: 404 + registry error codes
    with pytest.raises(urllib.error.HTTPError) as ei:
        reg.schema_by_id(99)
    assert ei.value.code == 404
    assert json.loads(ei.value.read())["error_code"] == 40403
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{stub.url}/subjects/nope/versions")
    assert json.loads(ei.value.read())["error_code"] == 40401


def test_mixed_schema_topic_decode_over_http(spark, stub):
    """The heterogeneous-topic decode (two schema IDs interleaved, plus
    a tombstone) running registry-over-real-HTTP, with the ID cache
    asserted: one GET per distinct schema ID even across repeated
    decodes."""
    reg = SchemaRegistry(stub.url)
    dt_a = T.StructType.fromDDL("id bigint, name string")
    dt_b = T.StructType.fromDDL("id bigint, score double")
    sid_a = reg.register(zavro.subject_of(dt_a), zavro.avro_schema_of(dt_a))
    sid_b = reg.register(zavro.subject_of(dt_b), zavro.avro_schema_of(dt_b))
    assert sid_a != sid_b

    # a FRESH client (empty cache), as the consumer process would be
    consumer = SchemaRegistry(stub.url)
    rows = [
        (0, _wire(sid_a, zavro.avro_schema_of(dt_a), {"id": 1, "name": "x"})),
        (1, _wire(sid_b, zavro.avro_schema_of(dt_b), {"id": 2, "score": 0.5})),
        (2, _wire(sid_a, zavro.avro_schema_of(dt_a), {"id": 3, "name": "y"})),
        (3, None),  # tombstone
    ]
    df = spark.createDataFrame(rows, "offset long, value binary")
    out = decode_by_schema_id(df, "value", consumer)
    got = {
        r["offset"]: (r["value"].asDict() if r["value"] is not None else None)
        for r in out.collect()
    }
    assert got[0] == {"id": 1, "name": "x", "score": None}
    assert got[1] == {"id": 2, "name": None, "score": 0.5}
    assert got[2] == {"id": 3, "name": "y", "score": None}
    assert got[3] is None
    assert stub.get_count() == 2  # one GET per distinct schema ID
    # decode again: the cache absorbs every lookup — still 2
    decode_by_schema_id(df, "value", consumer).collect()
    assert stub.get_count() == 2


def test_encoder_roundtrip_over_http(spark, stub):
    """Producer-side: avro_encoder registers per RecordNameStrategy
    over HTTP (once per distinct type at plan time) and the framed
    bytes decode back through a fresh consumer client."""
    from zinger_spark.codecs.avro import avro_encoder

    producer = SchemaRegistry(stub.url)
    encode = avro_encoder(producer)
    dt = T.StructType.fromDDL("id bigint, name string")
    df = spark.createDataFrame([(1, "a"), (2, "b")], dt).select(
        F.struct("id", "name").alias("value")
    )
    framed = df.select(encode(F.col("value"), dt).alias("value"))
    # RecordNameStrategy subject (namespace + md5 record name) registered
    assert SchemaRegistry(stub.url).subjects() == [zavro.subject_of(dt)]

    consumer = SchemaRegistry(stub.url)
    out = decode_by_schema_id(framed, "value", consumer)
    got = sorted(
        (r["value"].asDict() for r in out.collect()), key=lambda d: d["id"]
    )
    assert got == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    assert stub.get_count() == 1


def test_cli_avro_produce_consume_over_both_stubs(
    spark, stub, tmp_path, capsys, monkeypatch
):
    """The full broker-facing Avro flow with NO fakes: `produce
    --format avro` registers schemas against the HTTP registry stub
    and writes Confluent-framed records through the wire-protocol
    Kafka stub; `consume --format avro` reads them back, resolving the
    wire schema IDs over HTTP, and prints JSON."""
    from zinger_spark import cli as climod
    from zinger_spark.kafka_stub import StubBroker

    monkeypatch.setattr(climod, "_spark", lambda a: spark)
    src = tmp_path / "in.jsonl"
    src.write_text('{"id": 1, "name": "a"}\n{"id": 2, "name": "b"}\n')
    with StubBroker() as broker:
        rc = climod.main(
            ["produce", str(src), "--brokers", broker.bootstrap,
             "--topic", "AvroWire", "--format", "avro",
             "--registry", stub.url, "--transport", "wire"]
        )
        assert rc == 0
        assert len(broker.log("AvroWire")) == 2
        capsys.readouterr()

        # `ls --registry` over HTTP: the RecordNameStrategy subject
        rc = climod.main(["ls", "--registry", stub.url])
        assert rc == 0
        subjects = capsys.readouterr().out.strip().splitlines()
        assert len(subjects) == 1 and ".zng_" in subjects[0]

        rc = climod.main(
            ["consume", "--brokers", broker.bootstrap, "--topic", "AvroWire",
             "--offset", "-2", "--format", "avro",
             "--registry", stub.url, "--transport", "wire"]
        )
        out = capsys.readouterr().out
        assert rc == 0
        lines = [json.loads(line) for line in out.strip().splitlines() if line]
        assert [json.loads(li["value"]) for li in lines] == [
            {"id": 1, "name": "a"},
            {"id": 2, "name": "b"},
        ]


def test_union_roundtrip_over_http(spark, stub):
    """avro_union_roundtrip's registry leg through the HTTP stub: a
    general [null,long,string] union registered, framed, and decoded
    to the tagged-struct mapping via a fresh client."""
    union_schema = {
        "type": "record",
        "name": "evt",
        "namespace": zavro.DEFAULT_NAMESPACE,
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "payload", "type": ["null", "long", "string"]},
        ],
    }
    producer = SchemaRegistry(stub.url)
    sid = producer.register(f"{zavro.DEFAULT_NAMESPACE}.evt", union_schema)
    rows = [
        (0, _wire(sid, union_schema, {"id": 1, "payload": {"tag": 0, "b1": None, "b2": None}})),
        (1, _wire(sid, union_schema, {"id": 2, "payload": {"tag": 1, "b1": 42, "b2": None}})),
        (2, _wire(sid, union_schema, {"id": 3, "payload": {"tag": 2, "b1": None, "b2": "hi"}})),
    ]
    df = spark.createDataFrame(rows, "offset long, value binary")
    out = decode_by_schema_id(df, "value", SchemaRegistry(stub.url))
    got = {r["offset"]: r["value"]["payload"] for r in out.collect()}
    assert got[0]["tag"] == 0 and got[0]["b1"] is None and got[0]["b2"] is None
    assert got[1]["tag"] == 1 and got[1]["b1"] == 42
    assert got[2]["tag"] == 2 and got[2]["b2"] == "hi"
    assert stub.get_count() == 1


# ---------------------------------------------------------------------------
# r12: basic auth + /config (the managed-registry deployment the
# reference's schema_registry.json user/password fields pair with,
# cli/flags.go:34-46)


def test_registry_basic_auth_round_trip():
    from zinger_spark.codecs.avro import SchemaRegistry

    schema = {"type": "record", "name": "R",
              "fields": [{"name": "a", "type": "long"}]}
    with RegistryStub(auth=("svc", "hunter2")) as stub:
        client = SchemaRegistry(stub.url, user="svc", password="hunter2")
        sid = client.register("r-value", schema)
        assert client.schema_by_id(sid)["name"] == "R"
        assert client.subjects() == ["r-value"]


def test_registry_rejects_missing_or_wrong_credentials():
    import urllib.error

    from zinger_spark.codecs.avro import SchemaRegistry

    with RegistryStub(auth=("svc", "hunter2")) as stub:
        for client in (
            SchemaRegistry(stub.url),  # no credentials
            SchemaRegistry(stub.url, user="svc", password="wrong"),
        ):
            try:
                client.subjects()
                raise AssertionError("expected HTTP 401")
            except urllib.error.HTTPError as e:
                assert e.code == 401
                assert e.headers.get("WWW-Authenticate", "").startswith("Basic")


def test_registry_config_endpoints():
    import urllib.error
    import urllib.request

    from zinger_spark.codecs.avro import SchemaRegistry

    with RegistryStub(compatibility="FULL") as stub:
        client = SchemaRegistry(stub.url)
        assert client.compatibility() == "FULL"
        # subject-level: 40408 until a PUT sets an override
        try:
            client.compatibility("orders-value")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        req = urllib.request.Request(
            stub.url + "/config/orders-value",
            data=json.dumps({"compatibility": "NONE"}).encode(),
            method="PUT",
        )
        with urllib.request.urlopen(req) as resp:
            assert json.loads(resp.read())["compatibility"] == "NONE"
        assert client.compatibility("orders-value") == "NONE"
        # global PUT
        req = urllib.request.Request(
            stub.url + "/config",
            data=json.dumps({"compatibility": "FORWARD"}).encode(),
            method="PUT",
        )
        urllib.request.urlopen(req).read()
        assert client.compatibility() == "FORWARD"


def test_cli_registry_credentials_from_config(tmp_path, monkeypatch):
    """_registry() pulls url + basic-auth creds from
    $ZYNC_CONFIG_DIR/schema_registry.json; the --registry flag
    overrides the URL but keeps the creds."""
    import argparse

    from zinger_spark.cli import _registry

    monkeypatch.setenv("ZYNC_CONFIG_DIR", str(tmp_path))
    (tmp_path / "schema_registry.json").write_text(json.dumps(
        {"url": "http://cfg:8081", "user": "svc", "password": "pw"}
    ))
    args = argparse.Namespace(registry=None)
    client = _registry(args)
    assert client.url == "http://cfg:8081"
    assert client._auth is not None
    args = argparse.Namespace(registry="http://flag:8081")
    assert _registry(args).url == "http://flag:8081"
    # neither flag nor config: loud error
    monkeypatch.setenv("ZYNC_CONFIG_DIR", str(tmp_path / "missing"))
    import pytest as _pytest
    with _pytest.raises(SystemExit, match="registry"):
        _registry(argparse.Namespace(registry=None))


def test_registry_auth_end_to_end_register_and_fetch():
    """Authed stub + authed client through the register/decode cache
    path (one GET per distinct ID even with auth headers)."""
    from zinger_spark.codecs.avro import SchemaRegistry

    schema = {"type": "record", "name": "E",
              "fields": [{"name": "x", "type": "string"}]}
    with RegistryStub(auth=("u", "p")) as stub:
        client = SchemaRegistry(stub.url, user="u", password="p")
        sid = client.register("e-value", schema)
        for _ in range(5):
            client.schema_by_id(sid)
        assert stub.get_count() == 1  # ID cache intact under auth
