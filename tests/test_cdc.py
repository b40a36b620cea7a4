"""SCD2 CDC materialization (operators/cdc.py)."""

from pyspark.sql import functions as F

from zinger_spark.operators.cdc import (
    scd2_apply_batch,
    scd2_as_of,
    scd2_history,
)


def _hist(spark):
    rows = [
        # key, ts, value — key 1 changes three times; key 2 once
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "x"),
        # same-ts tie broken by the tiebreak column (seq)
        (3, 5, "t1"), (3, 5, "t2"),
    ]
    df = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(rows)],
        "k bigint, ts bigint, v string, seq bigint",
    )
    return scd2_history(df, ["k"], "ts", tiebreak_cols=["seq"])


def test_scd2_intervals(spark):
    got = {
        (r["k"], r["v"]): (r["valid_from"], r["valid_to"], r["is_current"])
        for r in _hist(spark).collect()
    }
    assert got[(1, "a")] == (10, 20, False)
    assert got[(1, "b")] == (20, 30, False)
    assert got[(1, "c")] == (30, None, True)
    assert got[(2, "x")] == (15, None, True)
    # tie: t1 (seq 4) precedes t2 (seq 5); both share ts=5
    assert got[(3, "t1")] == (5, 5, False)
    assert got[(3, "t2")] == (5, None, True)


def test_scd2_as_of_slices(spark):
    hist = _hist(spark)
    at25 = {
        (r["k"]): r["v"] for r in scd2_as_of(hist, 25).collect()
    }
    assert at25 == {1: "b", 2: "x", 3: "t2"}
    # before key 1 existed
    at12 = {r["k"]: r["v"] for r in scd2_as_of(hist, 12).collect()}
    assert at12 == {1: "a", 3: "t2"}
    # exactly one current version per key at the open end
    cur = scd2_as_of(hist, 10**9).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_partitioning_invariant(spark):
    a = sorted(map(tuple, _hist(spark).collect()))
    df2 = _hist(spark)  # rebuild; also check under a repartition
    b = sorted(
        map(
            tuple,
            scd2_history(
                spark.createDataFrame(
                    [(1, 10, "a", 0), (1, 20, "b", 1), (1, 30, "c", 2),
                     (2, 15, "x", 3), (3, 5, "t1", 4), (3, 5, "t2", 5)],
                    "k bigint, ts bigint, v string, seq bigint",
                ).repartition(7, "v"),
                ["k"], "ts", tiebreak_cols=["seq"],
            ).collect(),
        )
    )
    assert a == b


def test_scd2_apply_batch_equals_full_rebuild(spark):
    """Incremental maintenance == full recompute from the whole event
    log, including: closing a previously-open version, batch-internal
    chains, a brand-new key, and untouched keys passing through."""
    import random

    rng = random.Random(17)
    log = [
        (rng.randint(1, 6), rng.randint(1, 100), f"v{i}", i)
        for i in range(60)
    ]
    cols = "k bigint, ts bigint, v string, seq bigint"
    first, second = log[:40], log[40:] + [(99, 1, "new-key", 999)]
    h1 = scd2_history(spark.createDataFrame(first, cols), ["k"], "ts", ["seq"])
    inc = scd2_apply_batch(
        h1, spark.createDataFrame(second, cols), ["k"], "ts", ["seq"]
    )
    full = scd2_history(
        spark.createDataFrame(first + second, cols), ["k"], "ts", ["seq"]
    )
    assert sorted(map(tuple, inc.orderBy("k", "ts", "seq").collect())) == sorted(
        map(tuple, full.orderBy("k", "ts", "seq").collect())
    )
    # exactly one current version per key on the incremental side
    cur = inc.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)
