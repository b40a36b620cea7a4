"""KIP-482 flexible protocol versions on the wire client + stub.

The r11 gap: the client negotiated only non-flexible encodings
(Produce <= 3, Fetch <= 4), locking newer API features out.  Now the
stub advertises the flexible generations (Produce v9, Fetch v12,
Metadata v9, ApiVersions v3 — public protocol shapes) and the client
negotiates them by default: compact strings/arrays (uvarint n+1),
request header v2 / response header v1 tagged-field sections, and the
KIP-511 ApiVersions header-v0 pin.  Mixed-generation logs still decode
(records stay RecordBatch v2 / MessageSet v1 inside compact bytes).
"""

from __future__ import annotations

import pytest

from zinger_spark.kafka_stub import StubBroker
from zinger_spark.kafka_wire import (
    API_API_VERSIONS,
    API_FETCH,
    API_METADATA,
    API_PRODUCE,
    ERR_UNKNOWN_TOPIC_OR_PARTITION,
    KafkaWireClient,
    _Reader,
    _Writer,
    is_flexible,
)


@pytest.fixture()
def broker():
    with StubBroker() as b:
        yield b


@pytest.fixture()
def client(broker):
    with KafkaWireClient(broker.bootstrap) as c:
        yield c


# ---------------------------------------------------------------------------
# primitives


def test_compact_primitives_round_trip():
    w = (
        _Writer()
        .compact_string("hello")
        .compact_string(None)
        .compact_string("")
        .compact_bytes(b"\x00\x01")
        .compact_array([1, 2, 3], lambda ww, v: ww.int32(v))
        .compact_array(None, lambda ww, v: ww.int32(v))
        .tags()
    )
    r = _Reader(w.done())
    assert r.compact_string() == "hello"
    assert r.compact_string() is None
    assert r.compact_string() == ""
    assert r.compact_bytes() == b"\x00\x01"
    assert r.compact_array(lambda rr: rr.int32()) == [1, 2, 3]
    assert r.compact_array(lambda rr: rr.int32()) == []
    r.tags()
    assert r.pos == len(r.data)


def test_tagged_fields_are_skipped():
    # one tagged field: tag 5, 3 payload bytes — unknown tags must be
    # ignorable (KIP-482)
    w = _Writer().uvarint(1).uvarint(5).uvarint(3).raw(b"abc").int32(42)
    r = _Reader(w.done())
    r.tags()
    assert r.int32() == 42


def test_flexible_from_table():
    assert not is_flexible(API_PRODUCE, 3)
    assert is_flexible(API_PRODUCE, 9)
    assert not is_flexible(API_FETCH, 4)
    assert is_flexible(API_FETCH, 12)
    assert is_flexible(API_METADATA, 9)
    assert is_flexible(API_API_VERSIONS, 3)
    assert not is_flexible(17, 1)  # SaslHandshake never went flexible


# ---------------------------------------------------------------------------
# negotiation: the flexible generations are now the defaults


def test_negotiation_picks_flexible(client):
    assert client._negotiate(API_PRODUCE, client._PRODUCE_VERSIONS) == 9
    assert client._negotiate(API_FETCH, client._FETCH_VERSIONS) == 12
    assert client._negotiate(API_METADATA, client._METADATA_VERSIONS) == 9


def test_produce_fetch_flexible_round_trip(client):
    client.create_topic("flex", partitions=1)
    msgs = [
        (b"k1", b"v1", (("h", b"x"),)),
        (None, b"v2"),
    ]
    base = client.produce("flex", 0, msgs)  # negotiates v9
    assert base == 0
    hw, got = client.fetch("flex", 0, 0)  # negotiates v12
    assert hw == 2
    assert [(m.key, m.value) for m in got] == [(b"k1", b"v1"), (None, b"v2")]
    assert got[0].headers == (("h", b"x"),)
    assert [m.offset for m in got] == [0, 1]


def test_produce_flexible_compressed(client):
    client.create_topic("flexgz", partitions=1)
    msgs = [(None, b"z" * 1000) for _ in range(10)]
    assert client.produce("flexgz", 0, msgs, compression="gzip") == 0
    _, got = client.fetch("flexgz", 0, 0)
    assert [m.value for m in got] == [b"z" * 1000] * 10


def test_produce_flexible_unknown_topic_error(client):
    from zinger_spark.kafka_wire import KafkaWireError

    with pytest.raises(KafkaWireError) as ei:
        client.produce("nope", 0, [(None, b"v")])
    assert ei.value.code == ERR_UNKNOWN_TOPIC_OR_PARTITION


def test_fetch_flexible_offset_out_of_range(client):
    from zinger_spark.kafka_wire import ERR_OFFSET_OUT_OF_RANGE, KafkaWireError

    client.create_topic("flexoor", partitions=1)
    client.produce("flexoor", 0, [(None, b"v")])
    with pytest.raises(KafkaWireError) as ei:
        client.fetch("flexoor", 0, 99)
    assert ei.value.code == ERR_OFFSET_OUT_OF_RANGE


def test_metadata_flexible_multi_topic(client):
    client.create_topic("fm1", partitions=2)
    client.create_topic("fm2", partitions=1)
    metas = client.metadata(["fm1", "fm2", "missing"])
    by_name = {m.name: m for m in metas}
    assert [p.partition for p in by_name["fm1"].partitions] == [0, 1]
    assert len(by_name["fm2"].partitions) == 1
    assert by_name["missing"].error == ERR_UNKNOWN_TOPIC_OR_PARTITION
    # all-topics form (null compact array)
    names = {m.name for m in client.metadata(None)}
    assert {"fm1", "fm2"} <= names


def test_api_versions_v3_explicit(client):
    """ApiVersions v3 (flexible body, header pinned at v0, KIP-511)."""
    r = client._request(API_API_VERSIONS, 3, _Writer()
                        .compact_string("zinger")  # client_software_name
                        .compact_string("1.0")  # client_software_version
                        .tags().done())
    assert r.int16() == 0  # error_code
    keys = {}
    for _ in range(max(r.uvarint() - 1, 0)):
        k, mn, mx = r.int16(), r.int16(), r.int16()
        r.tags()
        keys[k] = (mn, mx)
    assert keys[API_PRODUCE] == (0, 9)
    assert keys[API_FETCH] == (0, 12)
    r.int32()  # throttle
    r.tags()


def test_mixed_generations_one_log(client):
    """Legacy MessageSet v1 (Produce v2), RecordBatch v2 (Produce v3),
    and flexible Produce v9 all land in one log; every fetch
    generation returns the full log."""
    client.create_topic("mix", partitions=1)
    client.produce("mix", 0, [(None, b"a")], api_version=2)
    client.produce("mix", 0, [(None, b"b")], api_version=3)
    client.produce("mix", 0, [(None, b"c")], api_version=9)
    for v in (2, 4, 12):
        _, got = client.fetch("mix", 0, 0, api_version=v)
        assert [m.value for m in got] == [b"a", b"b", b"c"], f"fetch v{v}"


def test_unimplemented_gap_version_rejected(client):
    """The stub advertises (0,9)/(0,12) but implements the generations
    like a broker that skipped the middle — a gap version gets a clean
    error, not a mis-parse."""
    from zinger_spark.kafka_wire import KafkaWireError

    client.create_topic("gap", partitions=1)
    with pytest.raises(KafkaWireError):
        client.produce("gap", 0, [(None, b"v")], api_version=5)


def test_list_offsets_flexible(client):
    """ListOffsets v6 (flexible) is the negotiated default; watermarks
    resolve through it end-to-end."""
    from zinger_spark.kafka_wire import API_LIST_OFFSETS

    assert client._negotiate(
        API_LIST_OFFSETS, client._LIST_OFFSETS_VERSIONS
    ) == 6
    client.create_topic("flexlo", partitions=1)
    client.produce("flexlo", 0, [(None, b"a"), (None, b"b")])
    assert client.watermarks("flexlo", 0) == (0, 2)
    from zinger_spark.kafka_wire import KafkaWireError
    with pytest.raises(KafkaWireError):
        client.list_offset("missing-topic", 0, -1)
