"""JVM spark-avro <-> pure-Python codec parity harness.

This environment has no spark-avro jar, so ``to_avro_body``/
``from_avro_body`` auto-select the Arrow-batched pure-Python fallback
(codecs/avro_py.py) and the production-preferred JVM path never runs.
These tests close that gap STRUCTURALLY: the moment a deployment loads
the connector jar (``--packages org.apache.spark:spark-avro_2.13:...``),
the same body-codec corpus runs through BOTH paths and parity is
proven, not assumed (zavro/encoder.go:59-66, decoder.go:85-221 are the
reference semantics both must match).  Here they skip-marker, exactly
like the live-Kafka tests.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zinger_spark.codecs import avro as zavro

# records only (Avro bodies are records on the wire); deterministic
# encodings — no map fields in the byte-compare corpus because Avro
# leaves map entry order unspecified, so byte equality is not promised
# across encoders for maps (value equality still is, tested separately)
PARITY_DDL = (
    "a bigint, b int, c double, d float, e boolean, s string, "
    "raw binary, arr array<bigint>, nested struct<x:double,y:string>, "
    "ts timestamp"
)
PARITY_ROWS = [
    (1, 2, 2.5, 32.5, True, "héllo", b"\x00\xff", [1, -2], (9.5, "n"),
     datetime.datetime(2022, 2, 10, 13, 49, 34, 812000)),
    (-(1 << 40), None, None, None, False, None, None, None, None, None),
    (0, 0, -0.0, 0.0, True, "", b"", [], (0.0, ""), None),
]


def _require_jvm_avro(spark):
    if not zavro.spark_avro_usable():
        pytest.skip(
            "spark-avro jar not on the classpath — parity harness is "
            "live only in jar-present deployments"
        )


@pytest.fixture()
def forced_paths(spark):
    """(jvm_encode, py_encode) column factories for the same corpus:
    the module's cached capability probe is flipped to force each path
    explicitly, then restored."""
    _require_jvm_avro(spark)
    yield
    zavro._SPARK_AVRO_OK = True  # restore after any flip below


def test_jvm_vs_python_encode_bytes_identical(spark, forced_paths):
    """Same schema, same rows -> byte-identical Avro bodies from the
    JVM encoder and the pure-Python encoder.  Byte equality (not just
    round-trip) matters because bodies are framed and written to Kafka:
    a consumer may decode either producer's output with either codec."""
    dt = T.StructType.fromDDL(PARITY_DDL)
    df = spark.createDataFrame(PARITY_ROWS, dt)
    cols = [f.name for f in dt.fields]

    zavro._SPARK_AVRO_OK = True
    jvm = df.select(zavro.to_avro_body(F.struct(*cols), dt).alias("body"),
                    "a").orderBy("a").collect()
    zavro._SPARK_AVRO_OK = False
    py = df.select(zavro.to_avro_body(F.struct(*cols), dt).alias("body"),
                   "a").orderBy("a").collect()

    assert [bytes(r.body) for r in jvm] == [bytes(r.body) for r in py]


def test_cross_decode_both_directions(spark, forced_paths):
    """JVM-encoded bodies decode correctly through the Python decoder
    and vice versa — the mixed-fleet scenario (a jar-present producer,
    a jar-less consumer, and the reverse)."""
    dt = T.StructType.fromDDL(PARITY_DDL)
    schema = zavro.avro_schema_of(dt)
    df = spark.createDataFrame(PARITY_ROWS, dt)
    cols = [f.name for f in dt.fields]
    want = sorted(map(tuple, df.collect()))

    for enc_jvm, dec_jvm in ((True, False), (False, True)):
        zavro._SPARK_AVRO_OK = enc_jvm
        enc = df.select(zavro.to_avro_body(F.struct(*cols), dt).alias("body"))
        enc = enc.localCheckpoint()  # freeze bytes before flipping the path
        zavro._SPARK_AVRO_OK = dec_jvm
        back = enc.select(
            zavro.from_avro_body(F.col("body"), schema).alias("v")
        ).select("v.*")
        assert sorted(map(tuple, back.collect())) == want, (
            f"enc_jvm={enc_jvm} dec_jvm={dec_jvm}"
        )


def test_map_values_cross_decode(spark, forced_paths):
    """Map fields: entry ORDER is encoder-specific (byte equality not
    promised), but decoded VALUES must agree across codecs."""
    dt = T.StructType.fromDDL("k bigint, m map<string,string>")
    schema = zavro.avro_schema_of(dt)
    df = spark.createDataFrame(
        [(1, {"k1": "v1", "k2": "v2"}), (2, None), (3, {})], dt
    )
    want = sorted((r.k, r.m) for r in df.collect())
    for enc_jvm in (True, False):
        zavro._SPARK_AVRO_OK = enc_jvm
        enc = df.select(
            zavro.to_avro_body(F.struct("k", "m"), dt).alias("body")
        ).localCheckpoint()
        zavro._SPARK_AVRO_OK = not enc_jvm
        back = enc.select(
            zavro.from_avro_body(F.col("body"), schema).alias("v")
        ).select("v.*")
        assert sorted((r.k, r.m) for r in back.collect()) == want
