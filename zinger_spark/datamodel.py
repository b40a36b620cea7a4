"""Data model: the Kafka envelope, marker records, and `fuse` merge.

Reference semantics (citations into /root/reference):
  - Every synced record is wrapped as
    ``{kafka:{topic,partition,offset}, key, value}``
    (README.md:123-132, fifo/consumer.go:124-147).
  - Marker records live in the *same* pool as data: ``done`` markers
    ``{kafka:{topic,offset}}(=done)`` and ``cursor`` records
    ``{seqno}(=cursor)`` (etl/pipeline.go:29, design.md:117-128).
    Spark rows in one DataFrame share a schema, so markers are tagged
    with a ``_type`` column ('data' | 'done' | 'cursor').
  - Heterogeneous record types in one topic are unified by Zed's
    ``fuse`` (README.md:486); here: recursive nullable schema widening
    + unionByName(allowMissingColumns=True).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Envelope

KAFKA_META_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.LongType()),
        T.StructField("offset", T.LongType()),
    ]
)

TYPE_DATA = "data"
TYPE_DONE = "done"
TYPE_CURSOR = "cursor"


def envelope_schema(key_schema: T.DataType, value_schema: T.DataType) -> T.StructType:
    """Schema of a synced record: {kafka, key, value, _type}."""
    return T.StructType(
        [
            T.StructField("kafka", KAFKA_META_SCHEMA),
            T.StructField("key", key_schema),
            T.StructField("value", value_schema),
            T.StructField("_type", T.StringType()),
        ]
    )


def wrap_envelope(
    df: DataFrame,
    topic: Column | str,
    offset: Column,
    key: Column,
    value: Column,
    partition: Column | None = None,
) -> DataFrame:
    """Build envelope rows from arbitrary input (fifo/consumer.go:124-147).

    ``partition`` defaults to 0: the reference consumes partition 0 only
    (fifo/consumer.go:59-63) to preserve Debezium total order.
    """
    topic_col = F.lit(topic) if isinstance(topic, str) else topic
    part_col = partition if partition is not None else F.lit(0).cast("long")
    return df.select(
        F.struct(
            topic_col.cast("string").alias("topic"),
            part_col.cast("long").alias("partition"),
            offset.cast("long").alias("offset"),
        ).alias("kafka"),
        key.alias("key"),
        value.alias("value"),
        F.lit(TYPE_DATA).alias("_type"),
    )


def done_marker(df: DataFrame, topic_col: str = "kafka.topic", offset_col: str = "kafka.offset") -> DataFrame:
    """Project rows into done markers {kafka:{topic,offset}} (etl/build.go:90,
    etl/pipeline.go:29). Null key/value, _type='done'."""
    return df.select(
        F.struct(
            F.col(topic_col).alias("topic"),
            F.lit(None).cast("long").alias("partition"),
            F.col(offset_col).alias("offset"),
        ).alias("kafka"),
        F.lit(TYPE_DONE).alias("_type"),
    )


# ---------------------------------------------------------------------------
# fuse — heterogeneous schema merge


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Recursively merge two Spark types the way Zed `fuse` widens record
    types: union of fields, everything nullable; numeric widening follows
    the reference's own lossy ladder (zavro/schema.go:145-172)."""
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if a == b:
        return a
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields: dict[str, T.DataType] = {}
        order: list[str] = []
        for f in list(a.fields) + list(b.fields):
            if f.name in fields:
                fields[f.name] = _widen(fields[f.name], f.dataType)
            else:
                fields[f.name] = f.dataType
                order.append(f.name)
        return T.StructType([T.StructField(n, fields[n], True) for n in order])
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_widen(a.elementType, b.elementType), True)
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return T.MapType(
            _widen(a.keyType, b.keyType), _widen(a.valueType, b.valueType), True
        )
    ladder = [
        T.ByteType(),
        T.ShortType(),
        T.IntegerType(),
        T.LongType(),
        T.FloatType(),
        T.DoubleType(),
    ]
    if a in ladder and b in ladder:
        return ladder[max(ladder.index(a), ladder.index(b))]
    # Incompatible scalars: fall back to string, the reference's own
    # catch-all for ip/net/type values (zavro/encoder.go:175-183).
    return T.StringType()


def fuse_type(*types: T.DataType) -> T.DataType:
    """Widened union type of the inputs."""
    return reduce(_widen, types)


def _conform(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    if src == dst:
        return col
    if isinstance(dst, T.StructType):
        src_fields = {f.name: f.dataType for f in src.fields} if isinstance(src, T.StructType) else {}
        parts = []
        for f in dst.fields:
            if f.name in src_fields:
                parts.append(
                    _conform(col.getField(f.name), src_fields[f.name], f.dataType).alias(f.name)
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        # Preserve null-ness of the parent struct.
        return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts)).cast(dst)
    return col.cast(dst)


def fuse(*dfs: DataFrame) -> DataFrame:
    """Union DataFrames of heterogeneous schemas into one fused schema
    (Zed `fuse`, README.md:486).

    Top-level columns are merged by unionByName(allowMissingColumns);
    same-named columns whose types differ (incl. nested structs) are
    conformed to the widened type first — this is what lets one topic
    carry {a:1}, {b:2}, {c:3} records (ztests/from-kafka.yaml).
    """
    if len(dfs) == 1:
        return dfs[0]
    merged: dict[str, T.DataType] = {}
    order: list[str] = []
    for df in dfs:
        for f in df.schema.fields:
            if f.name in merged:
                merged[f.name] = _widen(merged[f.name], f.dataType)
            else:
                merged[f.name] = f.dataType
                order.append(f.name)
    outs = []
    for df in dfs:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for name in order:
            if name in have:
                cols.append(_conform(F.col(name), have[name], merged[name]).alias(name))
            else:
                cols.append(F.lit(None).cast(merged[name]).alias(name))
        outs.append(df.select(*cols))
    return reduce(lambda x, y: x.unionByName(y), outs)


# -- Zed shaping functions (fill / crop / order / shape) ---------------------
# Zed language docs, shaping section: four orthogonal primitives over a
# value + target type.  All column-level and recursive over structs, so
# they compile to pure JVM struct rebuilds (no UDFs):
#   fill   add target fields missing from the value (typed nulls);
#          existing fields keep their types and order, fills append
#   crop   drop value fields absent from the target; types unchanged
#   order  reorder fields to the target's order; extras keep their
#          relative order after the typed fields; types unchanged
#   shape  fill + order + cast: the full conform, but unlike a named
#          cast it KEEPS extra fields (crop is the one that removes)


def _is_struct(t: T.DataType) -> bool:
    return isinstance(t, T.StructType)


def fill_type(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    if not (_is_struct(src) and _is_struct(dst)):
        return col
    have = {f.name: f.dataType for f in src.fields}
    parts = [
        fill_type(col.getField(f.name), f.dataType, _dst_field(dst, f.name))
        .alias(f.name)
        for f in src.fields
    ]
    for f in dst.fields:
        if f.name not in have:
            parts.append(F.lit(None).cast(f.dataType).alias(f.name))
    return F.when(col.isNull(), F.lit(None).cast(_fill_schema(src, dst))).otherwise(
        F.struct(*parts)
    )


def _dst_field(dst: T.StructType, name: str) -> T.DataType:
    for f in dst.fields:
        if f.name == name:
            return f.dataType
    return T.NullType()


def _fill_schema(src: T.StructType, dst: T.StructType) -> T.StructType:
    have = {f.name for f in src.fields}
    out = [
        T.StructField(
            f.name,
            _fill_schema(f.dataType, d)
            if _is_struct(f.dataType) and _is_struct(d := _dst_field(dst, f.name))
            else f.dataType,
        )
        for f in src.fields
    ]
    out += [T.StructField(f.name, f.dataType) for f in dst.fields if f.name not in have]
    return T.StructType(out)


def crop_type(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    if not (_is_struct(src) and _is_struct(dst)):
        return col
    want = {f.name: f.dataType for f in dst.fields}
    parts = [
        crop_type(col.getField(f.name), f.dataType, want[f.name]).alias(f.name)
        for f in src.fields
        if f.name in want
    ]
    if not parts:
        return F.lit(None).cast("struct<>")
    return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts)).cast(
        _crop_schema(src, dst)
    )


def _crop_schema(src: T.StructType, dst: T.StructType) -> T.StructType:
    want = {f.name: f.dataType for f in dst.fields}
    return T.StructType(
        [
            T.StructField(
                f.name,
                _crop_schema(f.dataType, w)
                if _is_struct(f.dataType) and _is_struct(w := want[f.name])
                else f.dataType,
            )
            for f in src.fields
            if f.name in want
        ]
    )


def order_type(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    if not (_is_struct(src) and _is_struct(dst)):
        return col
    have = {f.name: f.dataType for f in src.fields}
    parts = []
    for f in dst.fields:
        if f.name in have:
            parts.append(
                order_type(col.getField(f.name), have[f.name], f.dataType)
                .alias(f.name)
            )
    dst_names = {f.name for f in dst.fields}
    for f in src.fields:
        if f.name not in dst_names:
            parts.append(col.getField(f.name).alias(f.name))
    return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts)).cast(
        _order_schema(src, dst)
    )


def _order_schema(src: T.StructType, dst: T.StructType) -> T.StructType:
    have = {f.name: f.dataType for f in src.fields}
    out = []
    for f in dst.fields:
        if f.name in have:
            t = have[f.name]
            out.append(
                T.StructField(
                    f.name,
                    _order_schema(t, f.dataType)
                    if _is_struct(t) and _is_struct(f.dataType)
                    else t,
                )
            )
    dst_names = {f.name for f in dst.fields}
    out += [
        T.StructField(f.name, f.dataType)
        for f in src.fields
        if f.name not in dst_names
    ]
    return T.StructType(out)


def shape_type(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    """fill + order + cast, extras preserved after the typed fields."""
    if not (_is_struct(src) and _is_struct(dst)):
        return col.cast(dst) if not _is_struct(src) and not _is_struct(dst) else col
    have = {f.name: f.dataType for f in src.fields}
    parts = []
    for f in dst.fields:
        if f.name in have:
            parts.append(
                shape_type(col.getField(f.name), have[f.name], f.dataType)
                .alias(f.name)
            )
        else:
            parts.append(F.lit(None).cast(f.dataType).alias(f.name))
    dst_names = {f.name for f in dst.fields}
    for f in src.fields:
        if f.name not in dst_names:
            parts.append(col.getField(f.name).alias(f.name))
    return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts)).cast(
        _shape_schema(src, dst)
    )


def _shape_schema(src: T.StructType, dst: T.StructType) -> T.StructType:
    have = {f.name: f.dataType for f in src.fields}
    out = []
    for f in dst.fields:
        t = have.get(f.name)
        if t is not None and _is_struct(t) and _is_struct(f.dataType):
            out.append(T.StructField(f.name, _shape_schema(t, f.dataType)))
        else:
            out.append(T.StructField(f.name, f.dataType))
    dst_names = {f.name for f in dst.fields}
    out += [
        T.StructField(f.name, f.dataType)
        for f in src.fields
        if f.name not in dst_names
    ]
    return T.StructType(out)


def flatten_record(col: Column, src: T.DataType) -> Column:
    """Zed `flatten(r)`: a record becomes an array of
    ``{key: array<string>, value}`` leaves, depth-first in field order
    (Zed func docs `flatten.md`).

    Zed's value side is a union of the leaf types; on Spark the array
    element type must be uniform, so the values widen through the same
    `fuse` ladder the engine already uses (identical types stay
    themselves, mixed numerics widen, anything else becomes string —
    _widen above).  Pure column algebra: one F.array of pre-built
    structs, no UDF, no shuffle.
    """
    if not isinstance(src, T.StructType):
        raise TypeError(f"flatten() needs a record, got {src.simpleString()}")
    leaves: list[tuple[list[str], T.DataType, Column]] = []

    def walk(c: Column, t: T.DataType, path: list[str]) -> None:
        if isinstance(t, T.StructType):
            for f in t.fields:
                walk(c.getField(f.name), f.dataType, path + [f.name])
        else:
            leaves.append((path, t, c))

    walk(col, src, [])
    if not leaves:
        return F.array().cast(
            "array<struct<key:array<string>,value:string>>"
        )
    common = reduce(_widen, [t for _, t, _ in leaves])
    return F.array(
        *[
            F.struct(
                F.array(*[F.lit(p) for p in path]).alias("key"),
                _conform(c, t, common).alias("value"),
            )
            for path, t, c in leaves
        ]
    )
