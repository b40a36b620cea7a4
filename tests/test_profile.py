"""Table profiler (operators/profile.py)."""

import datetime as dt

from pyspark.sql import functions as F

from zinger_spark.operators.profile import profile


def test_profile_mixed_types(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, dt.datetime(2024, 1, 2, 3, 4, 5)),
            (2, None, -0.5, dt.datetime(2024, 2, 1)),
            (2, "b", None, None),
        ],
        ["i", "s", "d", "t"],
    )
    rows = {r["column_name"]: r for r in profile(df).collect()}
    assert set(rows) == {"i", "s", "d", "t"}
    i = rows["i"]
    assert (i["n_rows"], i["n_null"], i["n_distinct"]) == (3, 0, 2)
    assert (i["min_num"], i["max_num"]) == (1.0, 2.0)
    assert i["min_str"] is None
    s = rows["s"]
    assert (s["n_null"], s["n_distinct"], s["min_str"], s["max_str"]) == (1, 2, "a", "b")
    d = rows["d"]
    assert (d["n_null"], d["min_num"], d["max_num"]) == (1, -0.5, 1.5)
    t = rows["t"]
    assert t["min_str"] == "2024-01-02 03:04:05"
    assert t["max_str"] == "2024-02-01 00:00:00"
    assert t["n_null"] == 1


def test_profile_column_subset(spark):
    df = spark.createDataFrame([(1, "x")], ["a", "b"])
    out = profile(df, cols=["b"]).collect()
    assert len(out) == 1 and out[0]["column_name"] == "b"


def test_profile_decimal_is_numeric(spark):
    from decimal import Decimal

    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("999.99"),)],
        T.StructType([T.StructField("p", T.DecimalType(12, 2))]),
    )
    row = profile(df).collect()[0]
    assert row["min_num"] == 1.5 and row["max_num"] == 999.99
    assert row["min_str"] is None
