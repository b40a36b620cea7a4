"""Pure-Python Avro binary body codec (the subset zync emits).

The reference round-trips Avro bodies natively (zavro/encoder.go:59-66
encode, zavro/decoder.go:85-221 decode).  Spark's JVM-side
``from_avro``/``to_avro`` is the preferred path, but the spark-avro
connector jar is optional in deployments; this module implements the
same wire encoding per the public Avro 1.11 binary spec so the body
codec works (and is TESTED) everywhere — driver-side for unit tests,
executor-side via the Arrow-batched pandas UDFs in codecs.avro.

Schema dialect: the JSON dicts produced by ``avro.avro_schema_of`` —
records whose every field is a ``[null, T]`` union (zavro/schema.go:
35-71), primitives, arrays, maps, enums, timestamp-micros and date
logical types.

Unions: a 2-branch ``[null, T]`` smashes to nullable T exactly like
the reference decoder (zavro/schema.go:194-201, 211-224).  A GENERAL
union (3+ branches, or 2 branches with no null) decodes to the tagged
struct the reference's union type maps to (zavro/schema.go:234-244
builds a Zed union; Spark has no union type, so per SURVEY §1.2 the
mapping is struct-of-nullable-branches + tag): ``{"tag": <branch
index>, "b<i>": <value>}`` with one ``b<i>`` field per non-null
branch, only the selected branch non-null.  Encode accepts the same
tagged dict, so general unions round-trip.
"""

from __future__ import annotations

import datetime
import struct

_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_TS = datetime.datetime(1970, 1, 1)


class AvroCodecError(Exception):
    pass


# ---------------------------------------------------------------------------
# primitives (Avro spec: zigzag varint longs, little-endian IEEE floats)


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


# ---------------------------------------------------------------------------
# encode


def encode_value(schema, value) -> bytes:
    """Python value -> Avro binary body bytes for ``schema``."""
    out = bytearray()
    _encode(schema, value, out)
    return bytes(out)


def _logical(schema) -> str | None:
    return schema.get("logicalType") if isinstance(schema, dict) else None


def _is_optional_union(schema) -> bool:
    """The reference's smashable form: exactly [null, T] (schema.go:211-224)."""
    return isinstance(schema, list) and len(schema) == 2 and "null" in schema


def _encode(schema, value, out: bytearray) -> None:
    if isinstance(schema, list):  # union
        if _is_optional_union(schema):
            null_idx = schema.index("null")
            if value is None:
                out += _zigzag_encode(null_idx)
                return
            out += _zigzag_encode(1 - null_idx)
            _encode(schema[1 - null_idx], value, out)
            return
        # general union: tagged-struct value {"tag": i, "b<i>": v}
        if not isinstance(value, dict) or value.get("tag") is None:
            raise AvroCodecError(
                f"general union requires a tagged value dict with 'tag', got {value!r}"
            )
        idx = int(value["tag"])
        if not 0 <= idx < len(schema):
            raise AvroCodecError(f"union tag {idx} out of range for {len(schema)} branches")
        out += _zigzag_encode(idx)
        if schema[idx] != "null":
            _encode(schema[idx], value.get(f"b{idx}"), out)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], None if value is None else value.get(f["name"]), out)
            return
        if t == "array":
            items = [] if value is None else list(value)
            if items:
                out += _zigzag_encode(len(items))
                for it in items:
                    _encode(schema["items"], it, out)
            out += _zigzag_encode(0)
            return
        if t == "map":
            entries = {} if value is None else dict(value)
            if entries:
                out += _zigzag_encode(len(entries))
                for k, v in entries.items():
                    _encode("string", k, out)
                    _encode(schema["values"], v, out)
            out += _zigzag_encode(0)
            return
        if t == "enum":
            out += _zigzag_encode(schema["symbols"].index(value))
            return
        if t == "long" and _logical(schema) in ("timestamp-micros", "timestamp-millis"):
            if isinstance(value, datetime.datetime):
                div = 1 if _logical(schema) == "timestamp-micros" else 1000
                value = (
                    (value.replace(tzinfo=None) - _EPOCH_TS)
                    // datetime.timedelta(microseconds=1)
                ) // div
            out += _zigzag_encode(int(value))
            return
        if t == "int" and _logical(schema) == "date":
            if isinstance(value, datetime.date):
                value = (value - _EPOCH_DATE).days
            out += _zigzag_encode(int(value))
            return
        schema = t  # {"type": "string"} style wrapper
    if schema in ("int", "long"):
        out += _zigzag_encode(int(value))
    elif schema == "float":
        out += struct.pack("<f", float(value))
    elif schema == "double":
        out += struct.pack("<d", float(value))
    elif schema == "boolean":
        out += b"\x01" if value else b"\x00"
    elif schema == "string":
        raw = str(value).encode("utf-8")
        out += _zigzag_encode(len(raw)) + raw
    elif schema == "bytes":
        raw = bytes(value)
        out += _zigzag_encode(len(raw)) + raw
    elif schema == "null":
        pass
    else:
        raise AvroCodecError(f"unsupported Avro schema {schema!r}")


# ---------------------------------------------------------------------------
# decode


def decode_value(schema, buf: bytes):
    """Avro binary body -> Python value (dicts for records)."""
    value, pos = _decode(schema, buf, 0)
    if pos != len(buf):
        raise AvroCodecError(f"trailing bytes: {len(buf) - pos}")
    return value


def _decode(schema, buf: bytes, pos: int):
    if isinstance(schema, list):
        idx, pos = _zigzag_decode(buf, pos)
        if not 0 <= idx < len(schema):
            raise AvroCodecError(f"union tag {idx} out of range for {len(schema)} branches")
        branch = schema[idx]
        if _is_optional_union(schema):
            if branch == "null":
                return None, pos
            return _decode(branch, buf, pos)
        # general union -> tagged struct (all non-null branches present,
        # only the selected one populated)
        rec = {"tag": idx}
        for i, b in enumerate(schema):
            if b != "null":
                rec[f"b{i}"] = None
        if branch != "null":
            rec[f"b{idx}"], pos = _decode(branch, buf, pos)
        return rec, pos
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _decode(f["type"], buf, pos)
            return rec, pos
        if t == "array":
            out = []
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block-size form (spec): skip the byte size
                    n = -n
                    _, pos = _zigzag_decode(buf, pos)
                for _ in range(n):
                    v, pos = _decode(schema["items"], buf, pos)
                    out.append(v)
        if t == "map":
            out = {}
            while True:
                n, pos = _zigzag_decode(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    n = -n
                    _, pos = _zigzag_decode(buf, pos)
                for _ in range(n):
                    k, pos = _decode("string", buf, pos)
                    out[k], pos = _decode(schema["values"], buf, pos)
        if t == "enum":
            idx, pos = _zigzag_decode(buf, pos)
            return schema["symbols"][idx], pos
        if t == "long" and _logical(schema) in ("timestamp-micros", "timestamp-millis"):
            n, pos = _zigzag_decode(buf, pos)
            mult = 1 if _logical(schema) == "timestamp-micros" else 1000
            return _EPOCH_TS + datetime.timedelta(microseconds=n * mult), pos
        if t == "int" and _logical(schema) == "date":
            n, pos = _zigzag_decode(buf, pos)
            return _EPOCH_DATE + datetime.timedelta(days=n), pos
        schema = t
    if schema in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if schema == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema == "boolean":
        return buf[pos] != 0, pos + 1
    if schema == "string":
        n, pos = _zigzag_decode(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if schema == "bytes":
        n, pos = _zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if schema == "null":
        return None, pos
    raise AvroCodecError(f"unsupported Avro schema {schema!r}")
