"""Cascaded rollups (operators/rollup.py): each tier computed from the
tier below's PARTIALS must equal the same tier computed directly from
raw rows — the mergeability property the 100 TB ladder rests on."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from zinger_spark.operators.rollup import (
    cents,
    rollup_base,
    rollup_cascade,
    rollup_merge,
)


@pytest.fixture(scope="module")
def ev(spark):
    rng = random.Random(11)
    base = dt.datetime(2024, 3, 1)
    rows = [
        (
            base + dt.timedelta(minutes=rng.randint(0, 60 * 24 * 70)),
            rng.choice(["a", "b"]),
            round(rng.uniform(-50, 50), 2),
        )
        for _ in range(800)
    ]
    return spark.createDataFrame(rows, ["ts", "k", "value"])


def _direct(df, unit, spark):
    return (
        df.select(
            F.date_trunc(unit, "ts").alias("bucket"),
            "k",
            cents(F.col("value")).alias("v"),
        )
        .groupBy("bucket", "k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("v").cast("long").alias("sum_v"),
            F.min("v").cast("long").alias("min_v"),
            F.max("v").cast("long").alias("max_v"),
        )
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("bucket", "k").collect()]


@pytest.mark.parametrize("units", [("hour", "day", "month"), ("day", "week"), ("hour", "day", "year")])
def test_cascade_equals_direct_at_every_tier(spark, ev, units):
    tiers = rollup_cascade(ev, "ts", cents(F.col("value")), units, keys=["k"])
    for u in units:
        assert _sorted_rows(tiers[u]) == _sorted_rows(_direct(ev, u, spark)), u


def test_merge_is_partitioning_invariant(spark, ev):
    hour = rollup_base(ev, "ts", cents(F.col("value")), "hour", ["k"])
    a = _sorted_rows(rollup_merge(hour.coalesce(1), "day", ["k"]))
    b = _sorted_rows(rollup_merge(hour.repartition(13), "day", ["k"]))
    assert a == b


def test_units_must_be_ordered_and_known(spark, ev):
    with pytest.raises(ValueError):
        rollup_cascade(ev, "ts", cents(F.col("value")), ("day", "hour"))
    with pytest.raises(ValueError):
        rollup_cascade(ev, "ts", cents(F.col("value")), ("hour", "fortnight"))


def test_calendar_fill_gaps_and_forward_fill(spark):
    from zinger_spark.operators.rollup import calendar_fill

    rows = [
        (dt.datetime(2024, 1, 1, 0, 30), "a", 5.0),
        (dt.datetime(2024, 1, 1, 3, 10), "a", 7.0),   # 2-hour gap
        (dt.datetime(2024, 1, 1, 1, 0), "b", 2.0),
    ]
    df = spark.createDataFrame(rows, ["ts", "k", "value"])
    hourly = rollup_base(df, "ts", cents(F.col("value")), "hour", ["k"])
    out = calendar_fill(hourly, "hour", ["k"])
    got = {
        (r["bucket"].hour, r["k"]): (r["cnt"], r["sum_v"], r["filled"])
        for r in out.collect()
    }
    # full 0..3 calendar for BOTH keys
    assert set(got) == {(h, k) for h in range(4) for k in ("a", "b")}
    assert got[(0, "a")] == (1, 500, 500)
    assert got[(1, "a")] == (0, 0, 500)   # gap: zero cnt, fwd-filled value
    assert got[(2, "a")] == (0, 0, 500)
    assert got[(3, "a")] == (1, 700, 700)
    assert got[(0, "b")] == (0, 0, 0)     # before first sighting: 0
    assert got[(1, "b")] == (1, 200, 200)
    assert got[(3, "b")] == (0, 0, 200)


def test_cents_half_up(spark):
    df = spark.createDataFrame(
        [(1.005,), (2.675,), (-1.005,), (0.0,), (6.55,)], ["v"]
    )
    got = [r["c"] for r in df.select(cents(F.col("v")).alias("c")).collect()]
    # floor(v*100 + 0.5) on the IEEE doubles these literals parse to
    import math

    want = [math.floor(v * 100 + 0.5) for v in [1.005, 2.675, -1.005, 0.0, 6.55]]
    assert got == want


def test_week_cannot_cascade_coarser(spark, ev):
    # ISO weeks straddle month/year boundaries: 2024-07-30 and
    # 2024-08-01 share a week (Mon Jul 29), so week->month would
    # misassign the August row to July.  The cascade must refuse.
    with pytest.raises(ValueError, match="week"):
        rollup_cascade(ev, "ts", cents(F.col("value")), ("day", "week", "month"))
    with pytest.raises(ValueError, match="week"):
        rollup_cascade(ev, "ts", cents(F.col("value")), ("week", "year"))
    # week as the last unit stays fine
    tiers = rollup_cascade(ev, "ts", cents(F.col("value")), ("day", "week"))
    assert set(tiers) == {"day", "week"}
