"""Minimal pure-Python Kafka wire-protocol client (public protocol,
https://kafka.apache.org/protocol).

Why this exists: the Kafka-facing legs (A1 consume, A5 produce, A23
admin — fifo/consumer.go, fifo/producer.go, fifo/admin.go) adapt
kafka-python / Spark's JVM Kafka source, neither of which is available
in every deployment (nor in this test container).  This module speaks
the broker's actual TCP protocol directly, so the admin/produce/consume
seams can run end-to-end against ANY broker — including the in-process
stub broker (kafka_stub.StubBroker) used by the tests, which implements
the same public wire format.

Pinned API versions — deliberately old, non-"flexible" (pre-KIP-482)
encodings, the simplest stable wire shapes:

  ApiVersions v0 (key 18)   handshake / capability probe
  Metadata    v1 (key  3)   brokers + topics + partitions
  CreateTopics v0 (key 19)  fifo/admin.go:12-31 parity
  ListOffsets v1 (key  2)   watermarks (fifo/consumer.go:184-196)
  Produce     v2 (key  0)   MessageSet v1 (magic 1, CRC32, no varints)
  Fetch       v2 (key  1)   MessageSet v1 decode

MessageSet v1 (magic 1) rather than RecordBatch v2: CRC is plain
CRC-32 (zlib.crc32) over [magic..value], no varint/zigzag encoding, and
every Kafka broker through the 3.x line accepts it.  Brokers that have
dropped pre-v3 Produce (Kafka 4.0, KIP-896) need the kafka-python /
JVM adapters instead — this client raises a clear UnsupportedVersion
in that case (the ApiVersions handshake reveals it).

No external dependencies: sockets + struct + zlib only.
"""

from __future__ import annotations

import socket
import struct
import threading
import zlib
from dataclasses import dataclass

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_API_VERSIONS = 18
API_CREATE_TOPICS = 19

# error codes (subset; kafka.apache.org/protocol#protocol_error_codes)
ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_NOT_LEADER = 6
ERR_TOPIC_ALREADY_EXISTS = 36
ERR_INVALID_REQUEST = 42
ERR_UNSUPPORTED_VERSION = 35

EARLIEST = -2
LATEST = -1


class KafkaWireError(Exception):
    """Protocol-level failure (connection, malformed frame, error code)."""

    def __init__(self, msg: str, code: int | None = None):
        super().__init__(msg)
        self.code = code


class UnsupportedVersion(KafkaWireError):
    pass


# ---------------------------------------------------------------------------
# primitive encoders/decoders (big-endian, per the protocol spec)


class _Writer:
    def __init__(self):
        self._parts: list[bytes] = []

    def raw(self, b: bytes) -> "_Writer":
        self._parts.append(b)
        return self

    def int8(self, v: int) -> "_Writer":
        return self.raw(struct.pack(">b", v))

    def int16(self, v: int) -> "_Writer":
        return self.raw(struct.pack(">h", v))

    def int32(self, v: int) -> "_Writer":
        return self.raw(struct.pack(">i", v))

    def int64(self, v: int) -> "_Writer":
        return self.raw(struct.pack(">q", v))

    def string(self, s: str | None) -> "_Writer":
        if s is None:
            return self.int16(-1)
        b = s.encode("utf-8")
        return self.int16(len(b)).raw(b)

    def bytes_(self, b: bytes | None) -> "_Writer":
        if b is None:
            return self.int32(-1)
        return self.int32(len(b)).raw(b)

    def array(self, items, enc) -> "_Writer":
        self.int32(len(items))
        for it in items:
            enc(self, it)
        return self

    def done(self) -> bytes:
        return b"".join(self._parts)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise KafkaWireError(
                f"truncated frame: need {n} bytes at {self.pos}, "
                f"have {len(self.data)}"
            )
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def int8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def int16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def int32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def int64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str | None:
        n = self.int16()
        if n < 0:
            return None
        return self._take(n).decode("utf-8")

    def bytes_(self) -> bytes | None:
        n = self.int32()
        if n < 0:
            return None
        return self._take(n)

    def array(self, dec) -> list:
        n = self.int32()
        if n < 0:
            return []
        return [dec(self) for _ in range(n)]

    def remaining(self) -> int:
        return len(self.data) - self.pos


# ---------------------------------------------------------------------------
# MessageSet v1 (magic 1): the on-wire record encoding for Produce
# v0-v2 / Fetch v0-v3.  Per message:
#   offset int64 | size int32 | crc uint32 | magic int8=1 | attrs int8
#   | timestamp int64 | key bytes | value bytes
# crc = CRC-32 (IEEE, zlib.crc32) over everything after the crc field.


def encode_message_set(
    messages: list[tuple[bytes | None, bytes | None]],
    timestamp_ms: int = 0,
) -> bytes:
    out = _Writer()
    for i, (key, value) in enumerate(messages):
        body = (
            _Writer()
            .int8(1)  # magic
            .int8(0)  # attributes: no compression, CreateTime
            .int64(timestamp_ms)
            .bytes_(key)
            .bytes_(value)
            .done()
        )
        crc = zlib.crc32(body) & 0xFFFFFFFF
        msg = struct.pack(">I", crc) + body
        # producer-side offsets are placeholders (0,1,2,...); the broker
        # assigns real ones and returns base_offset
        out.int64(i).int32(len(msg)).raw(msg)
    return out.done()


@dataclass
class FetchedMessage:
    offset: int
    timestamp_ms: int
    key: bytes | None
    value: bytes | None


def decode_message_set(data: bytes, check_crc: bool = True) -> list[FetchedMessage]:
    """Decode a MessageSet; a trailing partial message (the broker may
    cut at max_bytes mid-message) is dropped, per the protocol."""
    out: list[FetchedMessage] = []
    r = _Reader(data)
    while r.remaining() >= 12:
        offset = r.int64()
        size = r.int32()
        if size < 0 or r.remaining() < size:
            break  # trailing partial message
        msg = _Reader(r._take(size))
        crc = msg.int32() & 0xFFFFFFFF
        body_start = msg.pos
        magic = msg.int8()
        if magic not in (0, 1):
            raise KafkaWireError(f"unsupported message magic {magic}")
        attrs = msg.int8()
        if attrs & 0x07:
            # a compressed wrapper message would silently parse as
            # garbage bytes — fail loud (this client produces
            # uncompressed sets; point compressed topics at the
            # kafka-python / JVM adapters)
            raise KafkaWireError(
                f"compressed message set (codec {attrs & 0x07}) not "
                f"supported by the wire client"
            )
        ts = msg.int64() if magic == 1 else -1
        key = msg.bytes_()
        value = msg.bytes_()
        if check_crc:
            actual = zlib.crc32(msg.data[body_start:]) & 0xFFFFFFFF
            if actual != crc:
                raise KafkaWireError(
                    f"message at offset {offset}: CRC mismatch "
                    f"(wire {crc:#x}, computed {actual:#x})"
                )
        out.append(FetchedMessage(offset, ts, key, value))
    return out


# ---------------------------------------------------------------------------
# client


@dataclass
class PartitionMeta:
    partition: int
    leader: int
    error: int


@dataclass
class TopicMeta:
    name: str
    error: int
    partitions: list[PartitionMeta]


class KafkaWireClient:
    """One broker connection, synchronous request/response.

    The stub broker (and any single-node broker) leads every partition,
    so no metadata-driven connection routing is needed; against a real
    cluster, connect this client to the partition leader (metadata()
    reports it).  Thread-safe: one in-flight request at a time.
    """

    def __init__(self, bootstrap: str, client_id: str = "zinger-wire", timeout: float = 30.0):
        host, _, port = bootstrap.rpartition(":")
        self._addr = (host or "localhost", int(port))
        self._client_id = client_id
        self._timeout = timeout
        self._sock: socket.socket | None = None
        self._corr = 0
        self._lock = threading.Lock()

    # -- plumbing --

    def _connect(self) -> socket.socket:
        if self._sock is None:
            s = socket.create_connection(self._addr, timeout=self._timeout)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self._sock = s
        return self._sock

    def close(self) -> None:
        with self._lock:
            if self._sock is not None:
                try:
                    self._sock.close()
                finally:
                    self._sock = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _recv_exact(self, sock: socket.socket, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise KafkaWireError("connection closed by broker")
            buf.extend(chunk)
        return bytes(buf)

    def _request(self, api_key: int, api_version: int, body: bytes) -> _Reader:
        with self._lock:
            self._corr += 1
            corr = self._corr
            header = (
                _Writer()
                .int16(api_key)
                .int16(api_version)
                .int32(corr)
                .string(self._client_id)
                .done()
            )
            frame = header + body
            sock = self._connect()
            try:
                sock.sendall(struct.pack(">i", len(frame)) + frame)
                size = struct.unpack(">i", self._recv_exact(sock, 4))[0]
                payload = self._recv_exact(sock, size)
            except (OSError, KafkaWireError):
                self.close()
                raise
            r = _Reader(payload)
            got_corr = r.int32()
            if got_corr != corr:
                self.close()
                raise KafkaWireError(
                    f"correlation id mismatch: sent {corr}, got {got_corr}"
                )
            return r

    # -- APIs --

    def api_versions(self) -> dict[int, tuple[int, int]]:
        """{api_key: (min_version, max_version)} — the capability probe."""
        r = self._request(API_API_VERSIONS, 0, b"")
        err = r.int16()
        if err:
            raise KafkaWireError(f"ApiVersions error {err}", err)
        out = {}
        for _ in range(r.int32()):
            key, mn, mx = r.int16(), r.int16(), r.int16()
            out[key] = (mn, mx)
        return out

    def metadata(self, topics: list[str] | None = None) -> list[TopicMeta]:
        body = _Writer()
        if topics is None:
            body.int32(-1)  # all topics
        else:
            body.array(topics, lambda w, t: w.string(t))
        r = self._request(API_METADATA, 1, body.done())
        # brokers
        for _ in range(r.int32()):
            r.int32()  # node_id
            r.string()  # host
            r.int32()  # port
            r.string()  # rack
        r.int32()  # controller_id
        out: list[TopicMeta] = []
        for _ in range(r.int32()):
            terr = r.int16()
            name = r.string() or ""
            r.int8()  # is_internal
            parts: list[PartitionMeta] = []
            for _ in range(r.int32()):
                perr = r.int16()
                pid = r.int32()
                leader = r.int32()
                r.array(lambda rr: rr.int32())  # replicas
                r.array(lambda rr: rr.int32())  # isr
                parts.append(PartitionMeta(pid, leader, perr))
            out.append(TopicMeta(name, terr, sorted(parts, key=lambda p: p.partition)))
        return out

    def create_topic(
        self,
        topic: str,
        partitions: int = 1,
        replication: int = 1,
        configs: dict[str, str] | None = None,
        timeout_ms: int = 30_000,
    ) -> None:
        body = _Writer()
        body.int32(1)  # one create_topic_request
        body.string(topic).int32(partitions).int16(replication)
        body.int32(0)  # no manual replica assignments
        body.array(
            sorted((configs or {}).items()),
            lambda w, kv: w.string(kv[0]).string(kv[1]),
        )
        body.int32(timeout_ms)
        r = self._request(API_CREATE_TOPICS, 0, body.done())
        for _ in range(r.int32()):
            name = r.string()
            err = r.int16()
            if name == topic and err:
                raise KafkaWireError(f"CreateTopics {topic!r}: error {err}", err)

    def list_offset(self, topic: str, partition: int, timestamp: int) -> int:
        """ListOffsets v1: timestamp LATEST (-1) -> end offset,
        EARLIEST (-2) -> start offset."""
        body = (
            _Writer()
            .int32(-1)  # replica_id: ordinary client
            .int32(1)
            .string(topic)
            .int32(1)
            .int32(partition)
            .int64(timestamp)
            .done()
        )
        r = self._request(API_LIST_OFFSETS, 1, body)
        for _ in range(r.int32()):
            r.string()
            for _ in range(r.int32()):
                r.int32()  # partition
                err = r.int16()
                r.int64()  # timestamp
                off = r.int64()
                if err:
                    raise KafkaWireError(
                        f"ListOffsets {topic}[{partition}]: error {err}", err
                    )
                return off
        raise KafkaWireError(f"ListOffsets: no result for {topic}[{partition}]")

    def watermarks(self, topic: str, partition: int = 0) -> tuple[int, int]:
        return (
            self.list_offset(topic, partition, EARLIEST),
            self.list_offset(topic, partition, LATEST),
        )

    def produce(
        self,
        topic: str,
        partition: int,
        messages: list[tuple[bytes | None, bytes | None]],
        acks: int = -1,
        timeout_ms: int = 30_000,
        timestamp_ms: int = 0,
    ) -> int:
        """Append messages; returns the base offset the broker assigned."""
        ms = encode_message_set(messages, timestamp_ms=timestamp_ms)
        body = (
            _Writer()
            .int16(acks)
            .int32(timeout_ms)
            .int32(1)
            .string(topic)
            .int32(1)
            .int32(partition)
            .bytes_(ms)
            .done()
        )
        r = self._request(API_PRODUCE, 2, body)
        base = -1
        for _ in range(r.int32()):
            r.string()
            for _ in range(r.int32()):
                r.int32()  # partition
                err = r.int16()
                base = r.int64()
                r.int64()  # log_append_time (v2)
                if err:
                    raise KafkaWireError(
                        f"Produce {topic}[{partition}]: error {err}", err
                    )
        r.int32()  # throttle_time_ms
        return base

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_bytes: int = 4 * 1024 * 1024,
        max_wait_ms: int = 100,
        min_bytes: int = 0,
    ) -> tuple[int, list[FetchedMessage]]:
        """One Fetch round trip: (high_watermark, messages from offset).
        Messages below the requested offset (the broker may return a
        whole stored batch) are filtered out, per client convention."""
        body = (
            _Writer()
            .int32(-1)  # replica_id
            .int32(max_wait_ms)
            .int32(min_bytes)
            .int32(1)
            .string(topic)
            .int32(1)
            .int32(partition)
            .int64(offset)
            .int32(max_bytes)
            .done()
        )
        r = self._request(API_FETCH, 2, body)
        r.int32()  # throttle_time_ms
        hw, msgs = -1, []
        for _ in range(r.int32()):
            r.string()
            for _ in range(r.int32()):
                r.int32()  # partition
                err = r.int16()
                hw = r.int64()
                data = r.bytes_() or b""
                if err:
                    raise KafkaWireError(
                        f"Fetch {topic}[{partition}]@{offset}: error {err}", err
                    )
                msgs = [m for m in decode_message_set(data) if m.offset >= offset]
        return hw, msgs

    def fetch_all(
        self, topic: str, partition: int, start: int, end: int | None = None
    ) -> list[FetchedMessage]:
        """Drain [start, end) with repeated Fetches (end=None -> current
        high watermark at call time)."""
        if end is None:
            end = self.list_offset(topic, partition, LATEST)
        out: list[FetchedMessage] = []
        offset = start
        while offset < end:
            _, msgs = self.fetch(topic, partition, offset)
            msgs = [m for m in msgs if m.offset < end]
            if not msgs:
                break  # no progress (compacted gap at the tail)
            out.extend(msgs)
            offset = msgs[-1].offset + 1
        return out


# ---------------------------------------------------------------------------
# Spark bridges: bounded batch read / produce through the wire client,
# shaped exactly like Spark's JVM Kafka source so envelope_stream and
# the to-kafka projections compose unchanged.  This is the no-JVM-jar
# fallback for BOUNDED syncs (the reference's to-kafka sync loop is
# bounded too, fifo/to.go:29-53); continuous streaming still wants the
# JVM source.


def wire_read_topic(
    spark,
    brokers: str,
    topic: str,
    starting_offset: int = EARLIEST,
    ending_offset: int | None = None,
    partitions: list[int] | None = None,
):
    """Bounded read -> DataFrame with the Spark Kafka source's columns
    (key/value binary, topic, partition, offset, timestamp ms).  The
    fetch itself is driver-side (the wire client is one connection);
    bounded use only — backfills at scale go through the JVM source."""
    from pyspark.sql import types as T  # noqa: PLC0415

    schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp_ms", T.LongType()),
        ]
    )
    with KafkaWireClient(brokers) as c:
        if partitions is None:
            metas = c.metadata([topic])
            if not metas or metas[0].error:
                raise KafkaWireError(f"unknown topic {topic!r}")
            partitions = [p.partition for p in metas[0].partitions]
        rows = []
        for p in partitions:
            start = (
                c.list_offset(topic, p, starting_offset)
                if starting_offset < 0
                else starting_offset
            )
            for m in c.fetch_all(topic, p, start, ending_offset):
                rows.append((m.key, m.value, topic, p, m.offset, m.timestamp_ms))
    return spark.createDataFrame(rows, schema)


def wire_produce_df(
    df,
    brokers: str,
    topic: str,
    partition: int = 0,
    batch_size: int = 200,
) -> int:
    """Produce a (key binary/string, value binary/string) DataFrame —
    the kafka_sink_projection shape — through the wire client in
    batches of ``batch_size`` (the reference's to-kafka produce loop
    batches 200, fifo/to.go:63-81).  Returns the record count.

    Driver-side by design: the bounded to-kafka sync is a tail read of
    the pool (ordered_batch), not a corpus scan.
    """

    def _b(v) -> bytes | None:
        if v is None:
            return None
        return v.encode("utf-8") if isinstance(v, str) else bytes(v)

    from pyspark.sql import functions as F  # noqa: PLC0415

    key_col = (
        F.col("key") if "key" in df.columns
        else F.lit(None).cast("binary").alias("key")
    )
    n = 0
    with KafkaWireClient(brokers) as c:
        buf: list[tuple[bytes | None, bytes | None]] = []
        # toLocalIterator: one partition at a time on the driver
        for row in df.select(key_col, "value").toLocalIterator():
            buf.append((_b(row["key"]), _b(row["value"])))
            if len(buf) >= batch_size:
                c.produce(topic, partition, buf)
                n += len(buf)
                buf = []
        if buf:
            c.produce(topic, partition, buf)
            n += len(buf)
    return n
