"""Event-time windows, watermarks, streaming dedup, custom stateful
operator, and salted aggregation — beyond-reference streaming surface,
driven through real streaming queries on a file source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zinger_spark.operators.skew import salted_agg
from zinger_spark.streaming import windows as zw

EVENTS_JSON = (
    '{"user_id":1,"ts":"2024-01-01T10:05:00Z","value":10.0}\n'
    '{"user_id":1,"ts":"2024-01-01T10:20:00Z","value":5.0}\n'
    '{"user_id":2,"ts":"2024-01-01T10:40:00Z","value":2.0}\n'
    '{"user_id":1,"ts":"2024-01-01T11:10:00Z","value":1.0}\n'
    '{"user_id":1,"ts":"2024-01-01T10:05:00Z","value":10.0}\n'  # dup row
)

SCHEMA = "user_id bigint, ts timestamp, value double"


@pytest.fixture()
def stream_src(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(EVENTS_JSON)
    return str(src)


def _run(df, tmp_path, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName("winq")
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_agg_streaming(spark, tmp_path, stream_src):
    stream = spark.readStream.schema(SCHEMA).json(stream_src)
    out = zw.windowed_agg(
        stream, "ts", window="1 hour", watermark="15 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")],
    )
    # complete mode: append would hold windows until a LATER batch moves
    # the watermark past them (none arrives in an availableNow drain)
    _run(out, tmp_path, mode="complete")
    rows = {
        (str(r["window_start"])[:16], r["user_id"]): (r["n"], r["total"])
        for r in spark.sql("select * from winq").collect()
    }
    assert rows[("2024-01-01 10:00", 1)] == (3, 25.0)  # dup kept here
    assert rows[("2024-01-01 10:00", 2)] == (1, 2.0)
    assert rows[("2024-01-01 11:00", 1)] == (1, 1.0)


def test_streaming_dedup(spark, tmp_path, stream_src):
    stream = spark.readStream.schema(SCHEMA).json(stream_src)
    out = zw.streaming_dedup(stream, ["user_id", "ts"], "ts")
    _run(out, tmp_path)
    assert spark.sql("select count(*) n from winq").collect()[0]["n"] == 4  # 5 - 1 dup


def test_streaming_dedup_within_watermark(spark, tmp_path, stream_src):
    # business keys only (no ts in the key set): bounded-state variant —
    # user 1 has 4 rows inside one watermark horizon, user 2 has 1
    stream = spark.readStream.schema(SCHEMA).json(stream_src)
    out = zw.streaming_dedup(
        stream, ["user_id"], "ts", watermark="4 hours", within_watermark=True
    )
    _run(out, tmp_path)
    rows = spark.sql("select user_id from winq").collect()
    assert sorted(r["user_id"] for r in rows) == [1, 2]


def test_session_agg_batch_parity(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 10:10:00", 1.0),
         (1, "2024-01-01 12:00:00", 1.0)],
        "user_id bigint, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = zw.session_agg(df, "ts", gap="30 minutes", keys=["user_id"])
    rows = sorted((str(r["session_start"]), r["n_events"]) for r in out.collect())
    assert [n for _, n in rows] == [2, 1]  # two sessions


def test_running_totals_stateful(spark, tmp_path, stream_src):
    stream = spark.readStream.schema(SCHEMA).json(stream_src)
    out = zw.running_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("statq")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: (r["n"], r["total"]) for r in spark.sql("select * from statq").collect()}
    assert rows[1] == (4, 26.0) and rows[2] == (1, 2.0)


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)], "k bigint, v double"
    )
    salted = salted_agg(
        df, ["k"], {"n": ("count", "v"), "total": ("sum", "v"), "mx": ("max", "v")}
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_count_null_semantics(spark):
    """SQL count semantics under salting: ('count', col) skips nulls in
    col, ('count', None) / ('count', '*') counts rows — both must match
    the plain groupBy exactly (r9 advice, formalized)."""
    rows = [(i % 3, float(i) if i % 4 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint, v double")
    salted = salted_agg(
        df,
        ["k"],
        {"nv": ("count", "v"), "nrows": ("count", None), "nstar": ("count", "*")},
        salt=8,
    )
    plain = df.groupBy("k").agg(
        F.count("v").alias("nv"),
        F.count(F.lit(1)).alias("nrows"),
        F.count(F.lit(1)).alias("nstar"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # the two spellings really differ on nullable input
    got = {r["k"]: (r["nv"], r["nrows"]) for r in salted.collect()}
    assert all(nv < nrows for nv, nrows in got.values())


def test_salted_join_matches_plain(spark):
    """salted_join == plain join on a skewed key distribution (90% of
    big rows share one key), for inner and left, incl. unmatched left
    rows."""
    from zinger_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(0 if i % 10 else i % 7, i) for i in range(2000)], "k bigint, v bigint"
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k bigint, name string")
    for how in ("inner", "left"):
        got = salted_join(big, small, ["k"], how=how, salt=8)
        want = big.join(small, ["k"], how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect())), how
    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="right")


def test_streaming_sessionize_gap_and_timeout(spark, tmp_path):
    """Both close paths: a later in-stream event past the gap closes a
    session inline ("gap"); the watermark passing last+gap with no new
    event fires the EventTimeTimeout ("timeout"). maxFilesPerTrigger=1
    forces one micro-batch per file so the watermark advances between
    them."""
    import time

    src = tmp_path / "sessrc"
    src.mkdir()
    (src / "a.json").write_text(
        '{"user_id":1,"ts":"2024-01-01T10:00:00Z","value":1.0}\n'
        '{"user_id":1,"ts":"2024-01-01T10:10:00Z","value":1.0}\n'
        '{"user_id":2,"ts":"2024-01-01T10:05:00Z","value":1.0}\n'
    )
    time.sleep(0.05)
    (src / "b.json").write_text('{"user_id":1,"ts":"2024-01-01T13:00:00Z","value":1.0}\n')
    time.sleep(0.05)
    (src / "c.json").write_text('{"user_id":3,"ts":"2024-01-01T13:30:00Z","value":1.0}\n')

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = zw.streaming_sessionize(stream, gap="30 minutes", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sessckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["user_id"], r["closed_by"]): (r["start_ms"], r["end_ms"], r["n_events"])
        for r in spark.sql("select * from sessq").collect()
    }
    h10 = 1704103200000  # 2024-01-01T10:00:00Z in epoch ms
    # user 1: first session closed by the 13:00 event arriving past the gap
    assert rows[(1, "gap")] == (h10, h10 + 10 * 60_000, 2)
    # user 2: closed by event-time timeout once the watermark passed 10:35
    assert rows[(2, "timeout")] == (h10 + 5 * 60_000, h10 + 5 * 60_000, 1)
    # users 1 (13:00) and 3 (13:30): sessions still open -> not emitted
    assert len(rows) == 2


IMPRESSIONS_JSON = (
    '{"ad_id":1,"lts":"2024-01-01T10:00:00Z"}\n'
    '{"ad_id":2,"lts":"2024-01-01T10:10:00Z"}\n'
    '{"ad_id":3,"lts":"2024-01-01T10:00:00Z"}\n'
)
CLICKS_JSON = (
    '{"ad_id":1,"rts":"2024-01-01T10:05:00Z"}\n'   # within 30m -> match
    '{"ad_id":2,"rts":"2024-01-01T11:30:00Z"}\n'   # 80m later -> no match
    '{"ad_id":9,"rts":"2024-01-01T10:06:00Z"}\n'   # unknown ad -> no match
)


def test_stream_stream_join_inner(spark, tmp_path):
    imp_dir = tmp_path / "imp"
    clk_dir = tmp_path / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "a.json").write_text(IMPRESSIONS_JSON)
    (clk_dir / "a.json").write_text(CLICKS_JSON)
    imp = spark.readStream.schema("ad_id bigint, lts timestamp").json(str(imp_dir))
    clk = spark.readStream.schema("ad_id bigint, rts timestamp").json(str(clk_dir))
    out = zw.stream_stream_join(imp, clk, "ad_id", "lts", "rts", within="30 minutes")
    q = (
        out.select(imp["ad_id"], "lts", "rts")
        .writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [(r.ad_id,) for r in spark.sql("select * from ssj").collect()]
    assert rows == [(1,)]


def test_stream_stream_join_batch_parity(spark):
    # Same operator on batch frames: leftOuter keeps unmatched left rows.
    imp = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:10:00")],
        "ad_id bigint, lts string",
    ).withColumn("lts", F.to_timestamp("lts"))
    clk = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00"), (2, "2024-01-01 11:30:00")],
        "ad_id bigint, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))
    out = zw.stream_stream_join(imp, clk, "ad_id", "lts", "rts", how="leftOuter")
    got = {(r[0], r.rts is not None) for r in out.select(imp["ad_id"], "rts").collect()}
    assert got == {(1, True), (2, False)}


def test_stream_static_enrich(spark, tmp_path, stream_src):
    dim = spark.createDataFrame([(1, "gold"), (2, "free")], "user_id bigint, tier string")
    stream = spark.readStream.schema(SCHEMA).json(stream_src)
    out = zw.stream_static_enrich(stream, dim, "user_id")
    q = (
        out.writeStream.format("memory")
        .queryName("enrich")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    tiers = {(r.user_id, r.tier) for r in spark.sql("select * from enrich").collect()}
    assert tiers == {(1, "gold"), (2, "free")}


class _FakeGroupState:
    """Minimal stand-in for pyspark GroupState, driving the sessionize
    kernel directly (the watermark-clamp path is hard to reach through a
    real query deterministically)."""

    def __init__(self, watermark_ms, existing=None, timed_out=False):
        self._wm = watermark_ms
        self._state = existing
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._state is not None

    @property
    def get(self):
        if self._state is None:
            raise ValueError("no state")
        return self._state

    def update(self, v):
        self._state = v

    def remove(self):
        self._state = None
        self.removed = True

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        if ts <= self._wm:
            raise ValueError(
                f"timeout {ts} must be > watermark {self._wm}"  # Spark's rule
            )
        self.timeout_set = ts


def _run_kernel(gap_ms, state, ts_us_lists):
    import pandas as pd

    kernel = zw._sessionize_kernel(gap_ms)
    pdfs = [pd.DataFrame({"ts": pd.Series(ts, dtype="int64") * 1000})
            for ts in ts_us_lists]  # kernel reads int64 ns / 1e6 -> ms
    out = list(kernel((1,), pdfs, state))
    return pd.concat(out) if out else None


def test_sessionize_kernel_emits_when_behind_watermark():
    """Events whose session already expired relative to the watermark
    must be emitted immediately, not registered as an (illegal) timeout
    at or before the watermark."""
    gap = 30 * 60 * 1000
    wm = 10_000_000_000
    state = _FakeGroupState(watermark_ms=wm)
    old = wm - gap - 5_000  # last + gap == wm - 5s <= wm
    out = _run_kernel(gap, state, [[old * 1000, (old - 60_000) * 1000]])
    assert state.removed and state.timeout_set is None
    assert len(out) == 1 and out.iloc[0]["closed_by"] == "timeout"
    assert out.iloc[0]["n_events"] == 2 and out.iloc[0]["end_ms"] == old


def test_sessionize_kernel_clamps_timeout_above_watermark():
    """last + gap barely behind the watermark edge -> timeout clamps to
    watermark + 1 rather than raising."""
    gap = 30 * 60 * 1000
    wm = 10_000_000_000
    state = _FakeGroupState(watermark_ms=wm)
    last = wm - gap + 1  # last + gap == wm + 1 > wm: keep, clamp applies
    _run_kernel(gap, state, [[last * 1000]])
    assert not state.removed
    assert state.timeout_set == wm + 1


def test_sessionize_kernel_normal_timeout_unclamped():
    gap = 30 * 60 * 1000
    state = _FakeGroupState(watermark_ms=1_000)
    _run_kernel(gap, state, [[5_000_000 * 1000]])
    assert state.timeout_set == 5_000_000 + gap


def test_streaming_heavy_hitters(spark, tmp_path):
    """CM+heap sketch as GroupState: counts accumulate ACROSS
    micro-batches (maxFilesPerTrigger=1 forces two), estimates never
    undercount, and state stays fixed-size per shard."""
    src = tmp_path / "hhsrc"
    src.mkdir()
    # batch 1: a x3, b x2, c x1 — batch 2: a x2, c x2, d x1
    (src / "a.json").write_text(
        "\n".join(['{"tok":"%s"}' % t for t in ["a", "a", "a", "b", "b", "c"]])
    )
    (src / "b.json").write_text(
        "\n".join(['{"tok":"%s"}' % t for t in ["a", "a", "c", "c", "d"]])
    )
    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = zw.streaming_heavy_hitters(stream, "tok", d=4, w=64, k=5, shards=4)
    q = (
        out.writeStream.format("memory")
        .queryName("hhq")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "hhckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # memory sink in update mode appends per-trigger emissions; the
    # LAST emission per token carries the accumulated estimate
    rows = spark.sql("select * from hhq").collect()
    latest = {}
    for r in rows:
        latest[r["token"]] = max(latest.get(r["token"], 0), r["cm_estimate"])
    # true totals: a=5, b=2, c=3, d=1; CM never underestimates and at
    # this tiny cardinality never collides either
    assert latest == {"a": 5, "b": 2, "c": 3, "d": 1}


def test_streaming_dedup_within_watermark_rejects_batch(spark):
    df = spark.createDataFrame([(1, "2024-01-01 00:00:00", 1.0)],
                               "user_id bigint, ts string, value double")
    with pytest.raises(ValueError, match="batch"):
        zw.streaming_dedup(df, ["user_id"], "ts", within_watermark=True)
