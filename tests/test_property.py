"""Property-based tests (hypothesis): codec round-trips and fuse laws.
The reference has no randomized tests (SURVEY §5 'not present'); these
go beyond its corpus."""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zinger_spark.codecs import connect_json as cj
from zinger_spark.datamodel import fuse_type

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# -- Connect schema round trip ------------------------------------------------

prims = st.sampled_from(
    [T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(), T.FloatType(),
     T.DoubleType(), T.BooleanType(), T.BinaryType(), T.StringType()]
)


def _types(depth: int = 2):
    if depth == 0:
        return prims
    sub = _types(depth - 1)
    return st.one_of(
        prims,
        st.lists(
            st.tuples(st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True), sub),
            min_size=1, max_size=4,
            unique_by=lambda t: t[0],
        ).map(lambda fs: T.StructType([T.StructField(n, t, True) for n, t in fs])),
        sub.map(lambda t: T.ArrayType(t, True)),
    )


@given(dt=_types())
@settings(**SETTINGS)
def test_connect_schema_roundtrip_any_type(spark, dt):
    """spark_type_of(connect_schema_of(t)) == t for all supported types
    (modulo the documented timestamp->int64 wire mapping, excluded)."""
    s = cj.connect_schema_of(dt)
    json.dumps(s)  # serializable
    assert cj.spark_type_of(s) == dt


# -- fuse laws ---------------------------------------------------------------

@given(a=_types(1), b=_types(1), c=_types(1))
@settings(**SETTINGS)
def test_fuse_type_total_and_associative_shapewise(spark, a, b, c):
    """fuse_type never raises, is idempotent, and (a+b)+c == a+(b+c)
    whenever the chain stays in the widening lattice."""
    ab = fuse_type(a, b)
    assert fuse_type(a, a) == a
    left = fuse_type(ab, c)
    right = fuse_type(a, fuse_type(b, c))
    assert left == right


@given(
    rows=st.lists(
        st.tuples(st.integers(-10**9, 10**9), st.text(max_size=8)), min_size=1, max_size=5
    )
)
@settings(**SETTINGS)
def test_connect_json_value_roundtrip(spark, rows):
    """encode -> decode is identity over (bigint, string) rows incl.
    empty strings and negative values."""
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("s", T.StringType())]
    )
    df = spark.createDataFrame(rows, schema)
    enc = df.select(cj.encode(F.struct("a", "s"), schema).alias("j"))
    sch = json.loads(enc.collect()[0]["j"])["schema"]
    dec = enc.select(cj.decode(F.col("j"), sch).alias("v")).select("v.*")
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, df.collect()))
