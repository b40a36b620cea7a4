"""The design.md cursor/txn-bundle incremental model, replayed with the
reference's own demo data (demo/consume-1.zson, consume-2.zson,
staging-1.zson golden, demo/etl.zed transform)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zinger_spark.operators import txn_bundle as tb
from zinger_spark.sources.pool import Pool

def _raw_schema() -> T.StructType:
    # lazy: fromDDL needs an active session
    return T.StructType.fromDDL(
        "seqno bigint, "
        "kafka struct<topic:string,offset:bigint>, "
        "value struct<txn:bigint,done:boolean,"
        "row:struct<customer:string,product:string,qty:bigint,price:double>>"
    )

# demo/consume-1.zson: order jane/taco (txn 10000), order bob/burrito
# (txn 10001), menu taco 1.99 (txn 10000, done)
CONSUME_1 = [
    (1, ("order", 1), (10000, False, ("jane", "taco", 2, None))),
    (2, ("order", 2), (10001, False, ("bob", "burrito", 1, None))),
    (3, ("menu", 1), (10000, True, (None, "taco", None, 1.99))),
]
# demo/consume-2.zson: menu burrito 5.99 (txn 10001, done)
CONSUME_2 = [(4, ("menu", 2), (10001, True, (None, "burrito", None, 5.99)))]

CUSTOMER_IDS = {"jane": 1, "bob": 2, "sarah": 3}
MENU_IDS = {"burrito": 100, "taco": 200, "chips": 300}


def etl_zed(ready):
    """demo/etl.zed: map-literal lookups + records[i] field access."""
    cust_map = F.create_map(*[F.lit(x) for kv in CUSTOMER_IDS.items() for x in kv])
    menu_map = F.create_map(*[F.lit(x) for kv in MENU_IDS.items() for x in kv])
    r0 = F.col("records").getItem(0)
    r1 = F.col("records").getItem(1)
    return ready.select(
        "txn",
        "seqno",
        r0.getField("kafka").alias("kafka"),
        F.struct(
            cust_map.getItem(r0.getField("value").getField("row").getField("customer"))
            .cast("bigint").alias("customerID"),
            menu_map.getItem(r0.getField("value").getField("row").getField("product"))
            .cast("bigint").alias("menuID"),
            r0.getField("value").getField("row").getField("qty").alias("qty"),
            (
                r0.getField("value").getField("row").getField("qty")
                * r1.getField("value").getField("row").getField("price")
            ).alias("total"),
        ).alias("row"),
    )


@pytest.fixture()
def pools(spark, tmp_path):
    raw = Pool.create(spark, str(tmp_path / "raw"), key="seqno")
    staging = Pool.create(spark, str(tmp_path / "staging"), key="seqno")
    return raw, staging


def test_bundle_transactions(spark):
    df = spark.createDataFrame(CONSUME_1, _raw_schema())
    b = {r["txn"]: r for r in tb.bundle_transactions(df).collect()}
    assert b[10000]["done"] is True and b[10000]["seqno"] == 3
    assert b[10001]["done"] is False and b[10001]["seqno"] == 2
    # records sorted by seqno: order first, then menu
    assert [r["kafka"]["topic"] for r in b[10000]["records"]] == ["order", "menu"]


def test_incremental_two_batches(spark, pools):
    raw, staging = pools
    etl = tb.IncrementalEtl(raw, staging)

    # batch 1: txn 10000 completes -> staging-1.zson golden
    raw.load_batch(spark.createDataFrame(CONSUME_1, _raw_schema()))
    assert etl.run(etl_zed) == 1
    assert etl.cursor() == 2  # pending seqno 2 (design.md:304-306)
    data = staging.df().filter(F.col("_type") == "data").collect()
    assert len(data) == 1
    row = data[0]
    assert row["seqno"] == 3 and row["kafka"]["topic"] == "order"
    assert tuple(row["row"]) == (1, 200, 2, pytest.approx(3.98))

    # batch 2: txn 10001 completes; seqno 3 must NOT be reprocessed
    raw.load_batch(spark.createDataFrame(CONSUME_2, _raw_schema()))
    assert etl.run(etl_zed) == 1
    rows = {r["txn"]: r for r in staging.df().filter(F.col("_type") == "data").collect()}
    assert set(rows) == {10000, 10001}
    assert tuple(rows[10001]["row"]) == (2, 100, 1, pytest.approx(5.99))
    assert etl.cursor() == 5  # everything processed: max seqno + 1

    # idempotent re-run: nothing new
    assert etl.run(etl_zed) == 0


def test_restart_replays_nothing(spark, pools):
    """Restart mid-stream (the design's recovery story): a fresh
    IncrementalEtl over the same pools sees the cursor and committed
    txns and does nothing."""
    raw, staging = pools
    raw.load_batch(spark.createDataFrame(CONSUME_1 + CONSUME_2, _raw_schema()))
    assert tb.IncrementalEtl(raw, staging).run(etl_zed) == 2
    assert tb.IncrementalEtl(raw, staging).run(etl_zed) == 0
    assert staging.df().filter(F.col("_type") == "data").count() == 2
