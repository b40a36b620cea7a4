"""In-process Kafka broker stub speaking the public wire protocol.

Closes the only untested leg of the Kafka seams: the sandbox has no
broker (the reference gates the same tests behind a ``kafka`` build
tag, ztests/from-kafka.yaml), so the admin/produce/consume adapters
were exercised against in-memory fakes only.  This stub is a real TCP
server implementing the same frozen protocol surface the wire client
pins (kafka_wire module docstring):

  ApiVersions v0-v0, Metadata v0-v1, ListOffsets v0-v1,
  Produce v0-v2 (MessageSet v0/v1), Fetch v0-v2, CreateTopics v0

so any client of those versions — kafka_wire.KafkaWireClient here,
kafka-python on hosts that have it — can create topics, produce,
fetch, and probe watermarks against it end-to-end over a socket.

Both record generations are spoken (like a 3.x broker): Produce v0-v2
carries magic 0/1 MessageSets, v3 a magic-2 RecordBatch; Fetch v0-v3
responses re-encode as MessageSet v1, v4 as RecordBatch v2.
gzip-compressed producer payloads of either generation are accepted
(decode_records handles the codec bits), and ``fetch_compression=
'gzip'`` makes Fetch responses compressed too, so the client's
decompress paths can be driven over the socket.  Produce with acks=0
gets NO response frame, per the protocol.

Single node, node_id 0, leads every partition.  The log is in-memory:
{(topic, partition): [(key, value, timestamp_ms, headers), ...]}, list
index == offset (no compaction, so offsets are dense — fine for a test
double; the engine itself never assumes density, see planner cursor
notes).

Usage:
    with StubBroker() as broker:           # binds 127.0.0.1, free port
        client = KafkaWireClient(broker.bootstrap)
        ...
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from .kafka_wire import (
    API_API_VERSIONS,
    API_CREATE_TOPICS,
    API_FETCH,
    API_LIST_OFFSETS,
    API_METADATA,
    API_PRODUCE,
    API_SASL_AUTHENTICATE,
    API_SASL_HANDSHAKE,
    EARLIEST,
    ERR_ILLEGAL_SASL_STATE,
    ERR_NONE,
    ERR_OFFSET_OUT_OF_RANGE,
    ERR_SASL_AUTHENTICATION_FAILED,
    ERR_TOPIC_ALREADY_EXISTS,
    ERR_UNKNOWN_TOPIC_OR_PARTITION,
    ERR_UNSUPPORTED_SASL_MECHANISM,
    ERR_UNSUPPORTED_VERSION,
    _Reader,
    _Writer,
    decode_records,
    encode_message_set,
    encode_record_batch,
    is_flexible,
)

#: (min, max) supported per api key — what ApiVersions advertises and
#: the dispatcher enforces.  The gaps are real (like a broker that
#: skipped generations): Produce 4-8 / Fetch 5-11 / Metadata 2-8 are
#: NOT served; clients negotiate either the legacy or the flexible
#: (KIP-482) generation.
_SUPPORTED = {
    API_PRODUCE: (0, 9),
    API_FETCH: (0, 12),
    API_LIST_OFFSETS: (0, 6),
    API_METADATA: (0, 9),
    API_SASL_HANDSHAKE: (0, 1),
    API_API_VERSIONS: (0, 3),
    API_CREATE_TOPICS: (0, 0),
    API_SASL_AUTHENTICATE: (0, 0),
}

#: versions the stub actually implements per api (see gap note above)
_IMPLEMENTED = {
    API_PRODUCE: (0, 1, 2, 3, 9),
    API_FETCH: (0, 1, 2, 3, 4, 12),
    API_LIST_OFFSETS: (0, 1, 6),
    API_METADATA: (0, 1, 9),
    API_API_VERSIONS: (0, 3),
}


class StubBroker:
    """Threaded single-node broker double over a real socket."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        fetch_compression: str = "none",
        ssl_context=None,
        sasl_plain: dict[str, str] | None = None,
    ):
        """``ssl_context``: a server-side ``ssl.SSLContext`` (cert+key
        loaded) — every connection is TLS-wrapped, like a broker
        listener on SSL:// .  ``sasl_plain``: {username: password} of
        accepted credentials; when set, connections must complete
        SaslHandshake(+Authenticate) before any other API (the broker's
        pre-auth gate; ApiVersions alone is allowed first, per the
        protocol)."""
        self._lock = threading.RLock()
        self.fetch_compression = fetch_compression
        self.sasl_plain = sasl_plain
        # topic -> {"partitions": n, "configs": {...}}
        self.topics: dict[str, dict] = {}
        # (topic, partition) -> [(key, value, ts_ms, headers)]
        self.logs: dict[tuple[str, int], list[tuple]] = {}
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                # per-connection SASL session state
                state = {
                    "authed": broker.sasl_plain is None,
                    "handshook": False,
                    "raw_token": False,  # v0 handshake: next frame is bare
                }
                try:
                    while True:
                        hdr = self._recv_exact(4)
                        if hdr is None:
                            return
                        size = struct.unpack(">i", hdr)[0]
                        frame = self._recv_exact(size)
                        if frame is None:
                            return
                        if state["raw_token"]:
                            # legacy SaslHandshake v0 token: no request
                            # header; success = empty response frame,
                            # failure = close (what a real broker does)
                            state["raw_token"] = False
                            if broker._check_token(frame):
                                state["authed"] = True
                                self.request.sendall(struct.pack(">i", 0))
                                continue
                            return
                        resp, keep = broker._handle_frame(frame, state)
                        if resp is not None:
                            self.request.sendall(
                                struct.pack(">i", len(resp)) + resp
                            )
                        if not keep:
                            return
                except (ConnectionError, OSError):
                    return

            def _recv_exact(self, n: int) -> bytes | None:
                buf = bytearray()
                while len(buf) < n:
                    try:
                        chunk = self.request.recv(n - len(buf))
                    except OSError:
                        return None
                    if not chunk:
                        return None
                    buf.extend(chunk)
                return bytes(buf)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

            def get_request(self):
                sock, addr = super().get_request()
                if ssl_context is not None:
                    sock = ssl_context.wrap_socket(sock, server_side=True)
                return sock, addr

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="kafka-stub", daemon=True
        )
        self._thread.start()

    @property
    def bootstrap(self) -> str:
        return f"{self.host}:{self.port}"

    def close(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def __enter__(self) -> "StubBroker":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- test conveniences -------------------------------------------------

    def seed(self, topic: str, partitions: int = 1) -> None:
        """Create a topic directly (no wire round trip)."""
        with self._lock:
            self._create(topic, partitions, {})

    def log(self, topic: str, partition: int = 0):
        return list(self.logs.get((topic, partition), []))

    # -- request dispatch ----------------------------------------------------

    def _handle_frame(
        self, frame: bytes, state: dict | None = None
    ) -> tuple[bytes | None, bool]:
        """-> (response bytes | None, keep_connection)."""
        state = state if state is not None else {"authed": True}
        r = _Reader(frame)
        api_key = r.int16()
        api_version = r.int16()
        corr = r.int32()
        r.string()  # client_id (legacy string even in header v2)
        flexible = is_flexible(api_key, api_version)
        if flexible:
            r.tags()  # request header v2 trailing tagged fields
        out = _Writer().int32(corr)
        if flexible and api_key != API_API_VERSIONS:
            out.tags()  # response header v1 (ApiVersions pins v0, KIP-511)
        lo_hi = _SUPPORTED.get(api_key)
        impl = _IMPLEMENTED.get(api_key)
        if (
            lo_hi is None
            or not (lo_hi[0] <= api_version <= lo_hi[1])
            or (impl is not None and api_version not in impl)
        ):
            # minimal well-formed error response per API so a modern
            # client fails with a clear code instead of a parse error
            return self._unsupported(out, api_key, api_version), True
        if not state["authed"] and api_key not in (
            API_API_VERSIONS,
            API_SASL_HANDSHAKE,
            API_SASL_AUTHENTICATE,
        ):
            # pre-auth gate: a real broker kills the connection on any
            # other API before SASL completes
            return None, False
        with self._lock:
            if api_key == API_API_VERSIONS:
                return self._api_versions(out, api_version), True
            if api_key == API_SASL_HANDSHAKE:
                return self._sasl_handshake(out, r, api_version, state)
            if api_key == API_SASL_AUTHENTICATE:
                return self._sasl_authenticate(out, r, state)
            if api_key == API_METADATA:
                return self._metadata(out, r, api_version), True
            if api_key == API_CREATE_TOPICS:
                return self._create_topics(out, r), True
            if api_key == API_LIST_OFFSETS:
                return self._list_offsets(out, r, api_version), True
            if api_key == API_PRODUCE:
                return self._produce(out, r, api_version), True
            return self._fetch(out, r, api_version), True

    # -- SASL ---------------------------------------------------------------

    def _check_token(self, token: bytes) -> bool:
        """RFC 4616 PLAIN: [authzid] NUL authcid NUL passwd."""
        parts = token.split(b"\x00")
        if len(parts) != 3 or self.sasl_plain is None:
            return False
        user = parts[1].decode("utf-8", "replace")
        pw = parts[2].decode("utf-8", "replace")
        return self.sasl_plain.get(user) == pw

    def _sasl_handshake(
        self, out: _Writer, r: _Reader, version: int, state: dict
    ) -> tuple[bytes, bool]:
        mech = r.string() or ""
        if self.sasl_plain is None:
            # SASL not enabled on this listener
            return out.int16(ERR_ILLEGAL_SASL_STATE).int32(0).done(), True
        if mech != "PLAIN":
            return (
                out.int16(ERR_UNSUPPORTED_SASL_MECHANISM)
                .int32(1)
                .string("PLAIN")
                .done(),
                True,
            )
        state["handshook"] = True
        if version == 0:
            state["raw_token"] = True  # next frame: bare token
        return out.int16(ERR_NONE).int32(1).string("PLAIN").done(), True

    def _sasl_authenticate(
        self, out: _Writer, r: _Reader, state: dict
    ) -> tuple[bytes, bool]:
        if self.sasl_plain is None or not state.get("handshook"):
            out.int16(ERR_ILLEGAL_SASL_STATE)
            out.string("SaslAuthenticate before SaslHandshake")
            return out.bytes_(b"").done(), False
        token = r.bytes_() or b""
        if self._check_token(token):
            state["authed"] = True
            return out.int16(ERR_NONE).string(None).bytes_(b"").done(), True
        out.int16(ERR_SASL_AUTHENTICATION_FAILED)
        out.string("Authentication failed: Invalid username or password")
        # a real broker closes the connection after a failed auth
        return out.bytes_(b"").done(), False

    def _unsupported(self, out: _Writer, api_key: int, _v: int) -> bytes:
        if api_key == API_API_VERSIONS:
            return out.int16(ERR_UNSUPPORTED_VERSION).int32(0).done()
        # all the others: empty arrays after an error is not expressible
        # uniformly pre-flexible; close enough for a double — top-level
        # empty body (clients surface it as a protocol error)
        return out.int16(ERR_UNSUPPORTED_VERSION).done()

    def _api_versions(self, out: _Writer, version: int = 0) -> bytes:
        if version >= 3:
            # flexible response BODY (header stays v0, KIP-511)
            out.int16(ERR_NONE)
            out.compact_array(
                sorted(_SUPPORTED.items()),
                lambda w, kv: w.int16(kv[0])
                .int16(kv[1][0])
                .int16(kv[1][1])
                .tags(),
            )
            out.int32(0)  # throttle_time_ms
            return out.tags().done()
        out.int16(ERR_NONE).int32(len(_SUPPORTED))
        for key, (mn, mx) in sorted(_SUPPORTED.items()):
            out.int16(key).int16(mn).int16(mx)
        return out.done()

    def _metadata(self, out: _Writer, r: _Reader, version: int = 1) -> bytes:
        if version >= 9:
            return self._metadata_flexible(out, r)
        n = r.int32()
        names = (
            sorted(self.topics)
            if n < 0
            else [r.string() or "" for _ in range(n)] or sorted(self.topics)
        )
        # brokers: just this node
        out.int32(1).int32(0).string(self.host).int32(self.port).string(None)
        out.int32(0)  # controller_id
        out.int32(len(names))
        for name in names:
            meta = self.topics.get(name)
            if meta is None:
                out.int16(ERR_UNKNOWN_TOPIC_OR_PARTITION).string(name).int8(0).int32(0)
                continue
            out.int16(ERR_NONE).string(name).int8(0)
            out.int32(meta["partitions"])
            for p in range(meta["partitions"]):
                out.int16(ERR_NONE).int32(p).int32(0)  # leader node 0
                out.int32(1).int32(0)  # replicas [0]
                out.int32(1).int32(0)  # isr [0]
        return out.done()

    def _metadata_flexible(self, out: _Writer, r: _Reader) -> bytes:
        """Metadata v9 (flexible): compact request/response shapes."""
        n = r.uvarint()
        if n == 0:
            names = sorted(self.topics)  # null = all topics
        else:
            names = []
            for _ in range(n - 1):
                names.append(r.compact_string() or "")
                r.tags()
            names = names or sorted(self.topics)
        r.int8()  # allow_auto_topic_creation
        r.int8()  # include_cluster_authorized_operations
        r.int8()  # include_topic_authorized_operations
        r.tags()
        out.int32(0)  # throttle_time_ms
        out.compact_array(
            [(0, self.host, self.port)],
            lambda w, b: w.int32(b[0])
            .compact_string(b[1])
            .int32(b[2])
            .compact_string(None)  # rack
            .tags(),
        )
        out.compact_string("zinger-stub")  # cluster_id
        out.int32(0)  # controller_id
        out.uvarint(len(names) + 1)
        for name in names:
            meta = self.topics.get(name)
            if meta is None:
                out.int16(ERR_UNKNOWN_TOPIC_OR_PARTITION)
                out.compact_string(name).int8(0)
                out.uvarint(1)  # no partitions
                out.int32(-2147483648)  # topic_authorized_operations
                out.tags()
                continue
            out.int16(ERR_NONE).compact_string(name).int8(0)
            out.uvarint(meta["partitions"] + 1)
            for p in range(meta["partitions"]):
                out.int16(ERR_NONE).int32(p).int32(0).int32(0)
                out.compact_array([0], lambda w, nid: w.int32(nid))  # replicas
                out.compact_array([0], lambda w, nid: w.int32(nid))  # isr
                out.compact_array([], lambda w, nid: w.int32(nid))  # offline
                out.tags()
            out.int32(-2147483648)  # topic_authorized_operations
            out.tags()
        out.int32(-2147483648)  # cluster_authorized_operations
        return out.tags().done()

    def _create(self, topic: str, partitions: int, configs: dict) -> int:
        if topic in self.topics:
            return ERR_TOPIC_ALREADY_EXISTS
        self.topics[topic] = {"partitions": partitions, "configs": configs}
        for p in range(partitions):
            self.logs[(topic, p)] = []
        return ERR_NONE

    def _create_topics(self, out: _Writer, r: _Reader) -> bytes:
        results: list[tuple[str, int]] = []
        for _ in range(r.int32()):
            topic = r.string() or ""
            partitions = r.int32()
            r.int16()  # replication_factor (single node: recorded only)
            for _ in range(r.int32()):  # replica assignments
                r.int32()
                r.array(lambda rr: rr.int32())
            configs = {}
            for _ in range(r.int32()):
                k, v = r.string(), r.string()
                configs[k] = v
            results.append((topic, self._create(topic, max(partitions, 1), configs)))
        r.int32()  # timeout_ms
        out.int32(len(results))
        for topic, err in results:
            out.string(topic).int16(err)
        return out.done()

    def _list_offsets(self, out: _Writer, r: _Reader, version: int) -> bytes:
        r.int32()  # replica_id
        if version >= 6:
            r.int8()  # isolation_level
            topics = []
            for _ in range(max(r.uvarint() - 1, 0)):
                topic = r.compact_string() or ""
                parts = []
                for _ in range(max(r.uvarint() - 1, 0)):
                    partition = r.int32()
                    r.int32()  # current_leader_epoch
                    ts = r.int64()
                    r.tags()
                    parts.append((partition, ts))
                r.tags()
                topics.append((topic, parts))
            r.tags()
        else:
            topics = []
            for _ in range(r.int32()):
                topic = r.string() or ""
                parts = []
                for _ in range(r.int32()):
                    partition = r.int32()
                    ts = r.int64()
                    if version == 0:
                        r.int32()  # max_num_offsets (v0 only)
                    parts.append((partition, ts))
                topics.append((topic, parts))

        def _resolve(topic: str, partition: int, ts: int) -> tuple[int, int]:
            log = self.logs.get((topic, partition))
            if log is None:
                return ERR_UNKNOWN_TOPIC_OR_PARTITION, -1
            return ERR_NONE, (0 if ts == EARLIEST else len(log))

        if version >= 6:
            out.int32(0)  # throttle_time_ms
            out.uvarint(len(topics) + 1)
            for topic, parts in topics:
                out.compact_string(topic).uvarint(len(parts) + 1)
                for partition, ts in parts:
                    err, off = _resolve(topic, partition, ts)
                    out.int32(partition).int16(err)
                    out.int64(-1).int64(off)  # timestamp, offset
                    out.int32(-1)  # leader_epoch
                    out.tags()
                out.tags()
            return out.tags().done()
        out.int32(len(topics))
        for topic, parts in topics:
            out.string(topic).int32(len(parts))
            for partition, ts in parts:
                err, off = _resolve(topic, partition, ts)
                out.int32(partition).int16(err)
                if version == 0:
                    out.int32(1).int64(max(off, 0))
                else:
                    out.int64(-1).int64(off)  # timestamp, offset
        return out.done()

    def _produce(self, out: _Writer, r: _Reader, version: int) -> bytes | None:
        # request parse: flexible (v9+) vs legacy shapes
        if version >= 9:
            r.compact_string()  # transactional_id
            acks = r.int16()
            r.int32()  # timeout
            topics = []
            for _ in range(max(r.uvarint() - 1, 0)):
                topic = r.compact_string() or ""
                parts = []
                for _ in range(max(r.uvarint() - 1, 0)):
                    partition = r.int32()
                    data = r.compact_bytes() or b""
                    r.tags()
                    parts.append((partition, data))
                r.tags()
                topics.append((topic, parts))
            r.tags()
        else:
            if version >= 3:
                r.string()  # transactional_id (ignored: no txn support)
            acks = r.int16()
            r.int32()  # timeout
            topics = []
            for _ in range(r.int32()):
                topic = r.string() or ""
                parts = []
                for _ in range(r.int32()):
                    partition = r.int32()
                    data = r.bytes_() or b""
                    parts.append((partition, data))
                topics.append((topic, parts))

        def _append(topic: str, partition: int, data: bytes) -> int | None:
            """-> base offset, or None for unknown topic/partition."""
            log = self.logs.get((topic, partition))
            if log is None:
                return None
            # either generation, compressed or not (a real broker
            # accepts magic <= its produce version's maximum)
            msgs = decode_records(data)
            base = len(log)
            for m in msgs:
                log.append((m.key, m.value, m.timestamp_ms, m.headers))
            return base

        if version >= 9:
            out.uvarint(len(topics) + 1)
            for topic, parts in topics:
                out.compact_string(topic).uvarint(len(parts) + 1)
                for partition, data in parts:
                    base = _append(topic, partition, data)
                    out.int32(partition)
                    if base is None:
                        out.int16(ERR_UNKNOWN_TOPIC_OR_PARTITION).int64(-1)
                    else:
                        out.int16(ERR_NONE).int64(base)
                    out.int64(-1)  # log_append_time: CreateTime batches
                    out.int64(0)  # log_start_offset
                    out.uvarint(1)  # record_errors: none
                    out.compact_string(None)  # error_message
                    out.tags()
                out.tags()
            if acks == 0:
                return None
            out.int32(0)  # throttle_time_ms
            return out.tags().done()
        out.int32(len(topics))
        for topic, parts in topics:
            out.string(topic).int32(len(parts))
            for partition, data in parts:
                base = _append(topic, partition, data)
                if base is None:
                    out.int32(partition).int16(ERR_UNKNOWN_TOPIC_OR_PARTITION)
                    out.int64(-1)
                    if version >= 2:
                        out.int64(-1)
                    continue
                out.int32(partition).int16(ERR_NONE).int64(base)
                if version >= 2:
                    out.int64(-1)  # log_append_time: CreateTime batches
        if acks == 0:
            return None  # fire-and-forget: the protocol sends no response
        if version >= 1:
            out.int32(0)  # throttle_time_ms
        return out.done()

    def _fetch_respond_flexible(self, out: _Writer, topics: list) -> bytes:
        """Fetch v12 response: flexible shapes, RecordBatch v2 records."""
        out.int32(0)  # throttle_time_ms
        out.int16(ERR_NONE)  # top-level error
        out.int32(0)  # session_id (sessionless)
        out.uvarint(len(topics) + 1)
        for topic, parts in topics:
            out.compact_string(topic).uvarint(len(parts) + 1)
            for partition, offset, max_bytes in parts:
                log = self.logs.get((topic, partition))
                if log is None:
                    err, hw, ms = ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, b""
                elif offset > len(log) or offset < 0:
                    err, hw, ms = ERR_OFFSET_OUT_OF_RANGE, len(log), b""
                else:
                    err, hw = ERR_NONE, len(log)
                    batch, size = [], 0
                    for i in range(offset, hw):
                        key, value, _ts, headers = log[i]
                        entry = (
                            34
                            + (len(key) if key else 0)
                            + (len(value) if value else 0)
                            + sum(
                                len(h[0]) + len(h[1] or b"") + 8
                                for h in headers
                            )
                        )
                        if batch and size + entry > max_bytes:
                            break
                        batch.append((key, value, headers))
                        size += entry
                    ms = _encode_v2_with_offsets(
                        batch, offset, log, self.fetch_compression
                    )
                out.int32(partition).int16(err).int64(hw)
                out.int64(hw)  # last_stable_offset
                out.int64(0)  # log_start_offset
                out.uvarint(1)  # aborted_transactions: none
                out.int32(-1)  # preferred_read_replica
                out.compact_bytes(ms)
                out.tags()
            out.tags()
        return out.tags().done()

    def _fetch(self, out: _Writer, r: _Reader, version: int) -> bytes:
        r.int32()  # replica_id
        r.int32()  # max_wait_ms (in-memory log: never blocks)
        r.int32()  # min_bytes
        if version >= 3:
            r.int32()  # top-level max_bytes (per-partition cap suffices here)
        if version >= 4:
            r.int8()  # isolation_level (no transactions: all committed)
        if version >= 12:
            r.int32()  # session_id (sessionless: 0)
            r.int32()  # session_epoch (-1)
            topics = []
            for _ in range(max(r.uvarint() - 1, 0)):
                topic = r.compact_string() or ""
                parts = []
                for _ in range(max(r.uvarint() - 1, 0)):
                    partition = r.int32()
                    r.int32()  # current_leader_epoch
                    offset = r.int64()
                    r.int32()  # last_fetched_epoch
                    r.int64()  # log_start_offset
                    max_bytes = r.int32()
                    r.tags()
                    parts.append((partition, offset, max_bytes))
                r.tags()
                topics.append((topic, parts))
            for _ in range(max(r.uvarint() - 1, 0)):  # forgotten topics
                r.compact_string()
                r.compact_array(lambda rr: rr.int32())
                r.tags()
            r.compact_string()  # rack_id
            r.tags()
            return self._fetch_respond_flexible(out, topics)
        topics = []
        for _ in range(r.int32()):
            topic = r.string() or ""
            parts = []
            for _ in range(r.int32()):
                partition = r.int32()
                offset = r.int64()
                max_bytes = r.int32()
                parts.append((partition, offset, max_bytes))
            topics.append((topic, parts))
        if version >= 1:
            out.int32(0)  # throttle_time_ms
        out.int32(len(topics))
        for topic, parts in topics:
            out.string(topic).int32(len(parts))
            for partition, offset, max_bytes in parts:
                log = self.logs.get((topic, partition))
                if log is None:
                    out.int32(partition).int16(ERR_UNKNOWN_TOPIC_OR_PARTITION)
                    out.int64(-1)
                    if version >= 4:
                        out.int64(-1).int32(0)
                    out.bytes_(b"")
                    continue
                hw = len(log)
                if offset > hw or offset < 0:
                    out.int32(partition).int16(ERR_OFFSET_OUT_OF_RANGE)
                    out.int64(hw)
                    if version >= 4:
                        out.int64(hw).int32(0)
                    out.bytes_(b"")
                    continue
                # re-encode the stored slice; honor max_bytes by cutting
                # whole messages (a real broker may cut mid-message;
                # clients must cope — the decoders drop partials)
                batch: list[tuple] = []
                size = 0
                for i in range(offset, hw):
                    key, value, _ts, headers = log[i]
                    # conservative per-entry framing estimate (v1 shape;
                    # v2 is denser so the cap still holds)
                    entry = (
                        34
                        + (len(key) if key else 0)
                        + (len(value) if value else 0)
                        + sum(len(h[0]) + len(h[1] or b"") + 8 for h in headers)
                    )
                    if batch and size + entry > max_bytes:
                        break
                    batch.append((key, value, headers))
                    size += entry
                # Fetch >= v4 clients understand RecordBatch v2 (that is
                # the version that introduced it); older ones get
                # MessageSet v1, like a real mixed-era broker
                if version >= 4:
                    ms = _encode_v2_with_offsets(
                        batch, offset, log, self.fetch_compression
                    )
                else:
                    ms = _encode_v1_with_offsets(
                        batch, offset, log, self.fetch_compression
                    )
                out.int32(partition).int16(ERR_NONE).int64(hw)
                if version >= 4:
                    out.int64(hw).int32(0)  # last_stable_offset, no aborted txns
                out.bytes_(ms)
        return out.done()


def _encode_v1_with_offsets(batch, base_offset: int, log, compression: str) -> bytes:
    """MessageSet v1 where each message carries its REAL log offset and
    stored timestamp (encode_message_set writes producer placeholders).
    Headers are dropped — magic 1 cannot carry them."""
    if compression != "none" and batch:
        # compressed serving: ONE wrapper whose inner offsets are
        # relative, wrapper offset = last absolute (magic-1 convention);
        # each inner message keeps its own stored CreateTime
        inner = encode_message_set(
            [(k, v) for k, v, _h in batch],
            compression=compression,
            timestamps=[log[base_offset + i][2] for i in range(len(batch))],
        )
        return struct.pack(">q", base_offset + len(batch) - 1) + inner[8:]
    out = b""
    for i, (key, value, _headers) in enumerate(batch):
        ts = log[base_offset + i][2]
        one = encode_message_set([(key, value)], timestamp_ms=ts)
        # patch the leading placeholder offset (int64 at byte 0)
        out += struct.pack(">q", base_offset + i) + one[8:]
    return out


def _encode_v2_with_offsets(batch, base_offset: int, log, compression: str) -> bytes:
    """One RecordBatch v2 for the slice, baseOffset = first real log
    offset (offset deltas are 0..n-1 by construction), headers intact."""
    if not batch:
        return b""
    return encode_record_batch(
        batch,
        base_offset=base_offset,
        compression=compression,
        timestamps=[log[base_offset + i][2] for i in range(len(batch))],
    )
