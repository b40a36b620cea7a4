"""TLS + SASL PLAIN on the dependency-free wire transport.

Reference parity: cli/flags.go:64-117 — LoadKafkaConfig maps kafka.json
security_protocol {PLAINTEXT, SSL, SASL_PLAINTEXT, SASL_SSL} and
sasl_mechanisms PLAIN onto a TLS dialer + SASL mechanism (franz-go);
unknown values error.  Here the same kafka.json drives
config.wire_security(), and the wire client runs the public-protocol
SASL handshake (SaslHandshake key 17 v0/v1, SaslAuthenticate key 36)
against the stub broker over a real socket — with and without TLS
(self-signed cert generated per test session via the openssl CLI).
"""

from __future__ import annotations

import ssl
import subprocess

import pytest

from zinger_spark.config import wire_security
from zinger_spark.kafka_stub import StubBroker
from zinger_spark.kafka_wire import (
    API_SASL_HANDSHAKE,
    EARLIEST,
    ERR_SASL_AUTHENTICATION_FAILED,
    ERR_UNSUPPORTED_SASL_MECHANISM,
    KafkaWireClient,
    KafkaWireError,
)

CREDS = {"alice": "s3cret"}


@pytest.fixture(scope="session")
def tls_pair(tmp_path_factory):
    """Self-signed localhost cert (server ctx, client ctx, cafile)."""
    d = tmp_path_factory.mktemp("tls")
    key, cert = d / "key.pem", d / "cert.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", str(key), "-out", str(cert), "-days", "2",
            "-subj", "/CN=localhost",
            "-addext", "subjectAltName=IP:127.0.0.1,DNS:localhost",
        ],
        check=True,
        capture_output=True,
    )
    server = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    server.load_cert_chain(str(cert), str(key))
    client = ssl.create_default_context(cafile=str(cert))
    return server, client, str(cert)


def _round_trip(client: KafkaWireClient) -> None:
    client.create_topic("t", partitions=1)
    client.produce("t", 0, [(b"k", b"v1"), (None, b"v2")])
    _, msgs = client.fetch("t", 0, 0)
    assert [m.value for m in msgs] == [b"v1", b"v2"]
    assert client.watermarks("t", 0) == (0, 2)


# ---------------------------------------------------------------------------
# TLS


def test_tls_round_trip(tls_pair):
    server_ctx, client_ctx, _ = tls_pair
    with StubBroker(ssl_context=server_ctx) as b:
        with KafkaWireClient(b.bootstrap, ssl_context=client_ctx) as c:
            _round_trip(c)


def test_tls_client_rejects_untrusted_cert(tls_pair):
    server_ctx, _, _ = tls_pair
    with StubBroker(ssl_context=server_ctx) as b:
        # default trust store does not contain the throwaway cert
        with KafkaWireClient(
            b.bootstrap, ssl_context=ssl.create_default_context()
        ) as c:
            with pytest.raises(ssl.SSLError):
                c.api_versions()


def test_plaintext_client_against_tls_listener_fails(tls_pair):
    # the TLS listener parses the plaintext frame as a garbage record
    # and stalls/errors; short client timeout keeps the test fast
    server_ctx, _, _ = tls_pair
    with StubBroker(ssl_context=server_ctx) as b:
        with KafkaWireClient(b.bootstrap, timeout=3.0) as c:
            with pytest.raises((KafkaWireError, OSError)):
                c.api_versions()


# ---------------------------------------------------------------------------
# SASL PLAIN (handshake v1: token in SaslAuthenticate, KIP-152)


def test_sasl_plain_accept():
    with StubBroker(sasl_plain=CREDS) as b:
        with KafkaWireClient(
            b.bootstrap, sasl_plain=("alice", "s3cret")
        ) as c:
            _round_trip(c)


def test_sasl_plain_reject_bad_password():
    with StubBroker(sasl_plain=CREDS) as b:
        with KafkaWireClient(b.bootstrap, sasl_plain=("alice", "wrong")) as c:
            with pytest.raises(KafkaWireError) as ei:
                c.api_versions()
            assert ei.value.code == ERR_SASL_AUTHENTICATION_FAILED


def test_sasl_plain_reject_unknown_user():
    with StubBroker(sasl_plain=CREDS) as b:
        with KafkaWireClient(b.bootstrap, sasl_plain=("mallory", "x")) as c:
            with pytest.raises(KafkaWireError) as ei:
                c.api_versions()
            assert ei.value.code == ERR_SASL_AUTHENTICATION_FAILED


def test_unauthenticated_client_is_cut_off():
    """Pre-auth gate: anything but ApiVersions/Sasl* before auth kills
    the connection, like a real SASL listener."""
    with StubBroker(sasl_plain=CREDS) as b:
        with KafkaWireClient(b.bootstrap) as c:  # no sasl_plain
            c.api_versions()  # allowed pre-auth
            with pytest.raises(KafkaWireError):
                c.metadata(["t"])


def test_sasl_handshake_unsupported_mechanism():
    """A non-PLAIN mechanism gets error 33 + the supported list."""
    import socket

    from zinger_spark.kafka_wire import _Writer

    with StubBroker(sasl_plain=CREDS) as b:
        c = KafkaWireClient(b.bootstrap)
        with socket.create_connection((b.host, b.port)) as sock:
            r = c._raw_roundtrip(
                sock, API_SASL_HANDSHAKE, 1,
                _Writer().string("SCRAM-SHA-256").done(),
            )
            assert r.int16() == ERR_UNSUPPORTED_SASL_MECHANISM
            assert r.array(lambda rr: rr.string()) == ["PLAIN"]


def test_sasl_v0_legacy_raw_token(monkeypatch):
    """Brokers that only speak SaslHandshake v0 get the bare
    length-prefixed token (no SaslAuthenticate wrapping)."""
    from zinger_spark import kafka_stub

    monkeypatch.setitem(kafka_stub._SUPPORTED, API_SASL_HANDSHAKE, (0, 0))
    with StubBroker(sasl_plain=CREDS) as b:
        with KafkaWireClient(
            b.bootstrap, sasl_plain=("alice", "s3cret")
        ) as c:
            _round_trip(c)


def test_sasl_v0_legacy_reject(monkeypatch):
    from zinger_spark import kafka_stub

    monkeypatch.setitem(kafka_stub._SUPPORTED, API_SASL_HANDSHAKE, (0, 0))
    with StubBroker(sasl_plain=CREDS) as b:
        with KafkaWireClient(b.bootstrap, sasl_plain=("alice", "nope")) as c:
            with pytest.raises(KafkaWireError):
                c.api_versions()


# ---------------------------------------------------------------------------
# SASL_SSL: both layers together (the managed-Kafka default)


def test_sasl_over_tls(tls_pair):
    server_ctx, client_ctx, _ = tls_pair
    with StubBroker(ssl_context=server_ctx, sasl_plain=CREDS) as b:
        with KafkaWireClient(
            b.bootstrap, ssl_context=client_ctx, sasl_plain=("alice", "s3cret")
        ) as c:
            _round_trip(c)


def test_wire_read_topic_with_security(tls_pair, spark):
    from zinger_spark.kafka_wire import wire_read_topic

    server_ctx, client_ctx, cafile = tls_pair
    with StubBroker(ssl_context=server_ctx, sasl_plain=CREDS) as b:
        with KafkaWireClient(
            b.bootstrap, ssl_context=client_ctx, sasl_plain=("alice", "s3cret")
        ) as c:
            c.create_topic("docs", partitions=1)
            c.produce("docs", 0, [(None, b'{"a":1}')])
        cfg = {
            "bootstrap_servers": b.bootstrap,
            "security_protocol": "SASL_SSL",
            "sasl_mechanisms": "PLAIN",
            "sasl_username": "alice",
            "sasl_password": "s3cret",
            "ssl_cafile": cafile,
        }
        df = wire_read_topic(
            spark, b.bootstrap, "docs",
            starting_offset=EARLIEST, security=wire_security(cfg),
        )
        assert df.count() == 1


# ---------------------------------------------------------------------------
# kafka.json -> security kwargs mapping (cli/flags.go:86-113 semantics)


def test_wire_security_plaintext_variants():
    assert wire_security({"bootstrap_servers": "x:1"}) == {}
    assert wire_security({"security_protocol": "PLAINTEXT"}) == {}


def test_wire_security_ssl():
    out = wire_security({"security_protocol": "SSL"})
    assert isinstance(out["ssl_context"], ssl.SSLContext)
    assert "sasl_plain" not in out


def test_wire_security_sasl_plaintext():
    out = wire_security(
        {
            "security_protocol": "SASL_PLAINTEXT",
            "sasl_mechanisms": "PLAIN",
            "sasl_username": "u",
            "sasl_password": "p",
        }
    )
    assert "ssl_context" not in out
    assert out["sasl_plain"] == ("u", "p")


def test_wire_security_sasl_ssl(tls_pair):
    _, _, cafile = tls_pair
    out = wire_security(
        {
            "security_protocol": "SASL_SSL",
            "sasl_mechanisms": "PLAIN",
            "sasl_username": "u",
            "sasl_password": "p",
            "ssl_cafile": cafile,
        }
    )
    assert isinstance(out["ssl_context"], ssl.SSLContext)
    assert out["sasl_plain"] == ("u", "p")


def test_wire_security_unknown_protocol_errors():
    with pytest.raises(ValueError, match="security_protocol"):
        wire_security({"security_protocol": "KERBEROS"})


def test_wire_security_unknown_mechanism_errors():
    with pytest.raises(ValueError, match="sasl_mechanisms"):
        wire_security(
            {"security_protocol": "SASL_SSL", "sasl_mechanisms": "GSSAPI"}
        )


def test_cli_wire_security_reads_config_dir(tmp_path, monkeypatch):
    """--transport wire honors ~/.zync/kafka.json (the r11 gap: the
    wire path was plaintext-only regardless of config)."""
    import json

    from zinger_spark.cli import _wire_security

    monkeypatch.setenv("ZYNC_CONFIG_DIR", str(tmp_path))
    assert _wire_security() == {}  # no kafka.json: plaintext
    (tmp_path / "kafka.json").write_text(
        json.dumps(
            {
                "bootstrap_servers": "b:9092",
                "security_protocol": "SASL_PLAINTEXT",
                "sasl_mechanisms": "PLAIN",
                "sasl_username": "u",
                "sasl_password": "p",
            }
        )
    )
    assert _wire_security()["sasl_plain"] == ("u", "p")


# ---------------------------------------------------------------------------
# wire hardening (r11 advice): malformed varint lengths fail loudly


def test_reader_take_rejects_negative_length():
    from zinger_spark.kafka_wire import _Reader

    r = _Reader(b"\x01\x02\x03")
    with pytest.raises(KafkaWireError, match="negative length"):
        r._take(-2)


def test_compressed_v1_fetch_keeps_per_message_timestamps():
    """r11 advice: the stub's compressed Fetch<=v3 path stamped every
    inner message with the first message's timestamp."""
    with StubBroker(fetch_compression="gzip") as b:
        b.seed("t", 1)
        with KafkaWireClient(b.bootstrap) as c:
            c.produce("t", 0, [(None, b"a")], timestamp_ms=111)
            c.produce("t", 0, [(None, b"b")], timestamp_ms=222)
        # force the MessageSet v1 leg (Fetch v2 < 4)
        with KafkaWireClient(b.bootstrap) as c:
            c._FETCH_VERSIONS = (2,)
            _, msgs = c.fetch("t", 0, 0)
        assert [e[2] for e in b.log("t", 0)] == [111, 222]
        assert [m.timestamp_ms for m in msgs] == [111, 222]
