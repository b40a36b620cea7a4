"""Offset bookkeeping: the pool-side state machine of the reference.

The pool key ``kafka.offset`` is monotonic per topic; consumers resume
from max(stored)+1 and the ETL assigns dense sequential output offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def next_consumer_offset(pool: DataFrame, topic: str) -> int:
    """Largest stored offset for topic, +1 (fifo/lake.go:62-82:
    `kafka.topic=='T' | tail 1 | yield kafka`). 0 when empty.

    Aggregate max() instead of sort+limit: parquet min/max column stats
    answer this with a metadata-mostly scan, and it parallelizes.
    """
    row = (
        pool.filter(F.col("kafka.topic") == topic)
        .agg(F.max("kafka.offset").alias("mx"))
        .collect()[0]
    )
    return 0 if row["mx"] is None else int(row["mx"]) + 1


def next_producer_offsets(pool: DataFrame) -> dict[str, int]:
    """`offset:=max(kafka.offset) by topic:=kafka.topic` then +1 per topic
    (etl/pool.go:60-81). Returns {} for an empty pool."""
    rows = (
        pool.groupBy(F.col("kafka.topic").alias("topic"))
        .agg(F.max("kafka.offset").alias("offset"))
        .collect()
    )
    return {r["topic"]: int(r["offset"]) + 1 for r in rows if r["topic"] is not None}


def assign_offsets(
    df: DataFrame,
    base_offsets: dict[str, int],
    topic_col: str = "kafka.topic",
    order_col: str | list = "__in_offset",
    via_prefix_sum: bool = True,
) -> DataFrame:
    """Dense per-topic sequential output offsets (insertOffsets,
    etl/pipeline.go:127-164): per-topic rank over the input order +
    the topic's current high-water mark.

    The DEFAULT is the two-level distributed prefix sum
    (operators/packing.prefix_sum): parallelism = #partitions, so a
    backfill-scale batch where one topic's slice outgrows a task never
    funnels through a single per-topic sort reducer.  The ranks are
    bit-identical to the window form (exclusive prefix sum of 1s ==
    row_number - 1) at the cost of the prefix sum's one-materialization
    barrier.  ``via_prefix_sum=False`` keeps the single-shuffle window
    form — marginally cheaper for a tiny bounded micro-batch, and the
    only form that groups NULL topics (the prefix sum's equi-join drops
    them; every producer in this repo assigns topics from declared
    routes, so nulls cannot occur there)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if base_offsets:
        base = F.create_map(
            *[x for kv in base_offsets.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        )
        start = F.coalesce(base.getItem(F.col(topic_col)), F.lit(0))
    else:
        start = F.lit(0)
    if via_prefix_sum:
        from .packing import prefix_sum  # noqa: PLC0415

        ranked = prefix_sum(
            df.withColumn("__topic", F.col(topic_col)).withColumn("__one", F.lit(1)),
            "__topic",
            order_cols,
            "__one",
            out_col="__rk0",
        )
        new_off = F.coalesce(
            base.getItem(F.col("__topic")) if base_offsets else F.lit(0), F.lit(0)
        ) + F.col("__rk0")
        return ranked.withColumn(
            "kafka",
            F.col("kafka").withField("offset", new_off.cast("long")),
        ).drop("__topic", "__one", "__rk0")
    w = Window.partitionBy(topic_col).orderBy(*order_cols)
    new_off = start + F.row_number().over(w) - 1
    return df.withColumn(
        "kafka",
        F.col("kafka").withField("offset", new_off.cast("long")),
    )
