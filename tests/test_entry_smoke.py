"""Smoke-run EVERY __spark_entry__ registry key at sf0.001.

Round-4 lesson: the pytest suite was 140-green while five registry
queries could not even *analyze* (Spark 4.x TIMESTAMP_NTZ read of
events.parquet) — because the tests built their own timestamps and the
driver-facing entry path was never imported.  This module closes that
gap: if any registry key raises at sf0.001, the suite goes red, no
matter what the driver's 50-key verification window covers this round.
"""

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} missing"
)

_KEYS = sorted(entrymod.queries().keys())


@pytest.fixture(scope="module", autouse=True)
def _driver_like_ntz(spark):
    """Run this whole module with Spark 4's NTZ inference ON, like the
    DRIVER's vanilla session (our get_spark turns it off) — so a query
    that only works when session.py pre-set the conf fails HERE, not in
    the driver's correctness gate (the r4 failure mode)."""
    old = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    yield
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old)


@pytest.mark.parametrize("key", _KEYS)
def test_registry_query_runs(spark, key):
    df = entrymod.queries()[key](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
    # Registry lint (round-12, from the r11 verdict): the DRIVER's
    # canonicalizer pandas-sorts every output column and can only hash
    # scalars — an array/map/struct column errors the key before any
    # comparison happens (r11: zq_over_sort_collect / zq_over_topk).
    # Serialize complex values (array_join / concat_ws, the
    # collect_bundle convention) before returning them from queries().
    from pyspark.sql import types as T

    complex_cols = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{key} returns non-scalar columns the driver cannot hash: "
        f"{complex_cols}"
    )


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0


def test_oracle_keys_subset_of_queries():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    extra = oracles - qs
    assert not extra, f"oracle_sql keys without queries(): {sorted(extra)}"
    # every registry key has a hash-exact oracle — since r7 including
    # the binary-decode ops: image/audio dedup split at the fingerprint
    # boundary, with oracle-side fingerprints materialized to parquet
    # by _materialize_media_fps() and the pair join done in SQL
    missing = qs - oracles
    assert not missing, f"queries() keys without an oracle: {sorted(missing)}"


def test_events_helpers_survive_ntz_session(spark):
    """Replicate the DRIVER's session: Spark 4.x default NTZ inference
    ON at read time.  The helpers must still hand back usable types
    (TIMESTAMP for _events, bigint ns for _events_ns) via the
    defensive cast, because the driver builds its own session where
    our session.py conf never runs."""
    old = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        raw = spark.read.parquet(f"{SF_DIR}/events.parquet")
        raw_t = dict(raw.dtypes).get("ts")
        ev = entrymod._events(spark, SF_DIR)
        assert dict(ev.dtypes)["ts"] in ("timestamp",), dict(ev.dtypes)
        ns = entrymod._events_ns(spark, SF_DIR)
        assert dict(ns.dtypes)["ts"] == "bigint", dict(ns.dtypes)
        # the cast branch itself must execute cleanly end-to-end
        assert ev.limit(5).count() >= 0
        assert ns.limit(5).count() >= 0
        # document which read path this environment exercised
        assert raw_t in ("timestamp", "timestamp_ntz", "bigint")
        if raw_t == "timestamp_ntz":
            # the defensive cast must be VALUE-preserving under the UTC
            # session tz: min/max epoch-µs must agree between the
            # NTZ-read-then-cast path and the LTZ (conf-off) read path
            from pyspark.sql import functions as F

            cast_row = (
                raw.select(F.col("ts").cast("timestamp").alias("ts"))
                .agg(
                    F.min(F.unix_micros("ts")).alias("lo"),
                    F.max(F.unix_micros("ts")).alias("hi"),
                )
                .collect()[0]
            )
            ltz_row = ev.agg(
                F.min(F.unix_micros("ts")).alias("lo"),
                F.max(F.unix_micros("ts")).alias("hi"),
            ).collect()[0]
            assert (cast_row.lo, cast_row.hi) == (ltz_row.lo, ltz_row.hi)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old)
