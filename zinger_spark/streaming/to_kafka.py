"""to-kafka: pool -> Kafka egress.

Reference flow (fifo/to.go:29-53, SURVEY §3.3): producer high-water
mark -> repeated ReadBatch(200) from the pool, encode, produce, until
drained (sync-point).

Spark mapping: batch mode mirrors the loop with ordered limit-batches;
continuous mode (the reference's stated future direction,
README.md:175-177) is a file-source readStream over the pool's commit
dirs -> Kafka sink.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.pool import Pool

BATCH_SIZE = 200  # records per ReadBatch (fifo/to.go:29)


def kafka_sink_projection(
    df: DataFrame,
    value_encoder: Callable[[DataFrame], Column],
    key_encoder: Callable[[DataFrame], Column] | None = None,
    topic: str | None = None,
) -> DataFrame:
    """Project envelope records into the Kafka sink contract
    (key, value[, topic]) — A5. Encoders produce string or binary
    columns (codecs.connect_json.encode / codecs.avro.frame∘to_avro)."""
    cols = []
    if key_encoder is not None:
        cols.append(key_encoder(df).alias("key"))
    cols.append(value_encoder(df).alias("value"))
    if topic is not None:
        cols.append(F.lit(topic).alias("topic"))
    else:
        cols.append(F.col("kafka.topic").alias("topic"))
    return df.select(*cols)


def produce_projection(df: DataFrame, encode) -> DataFrame:
    """The `zync produce` record contract (fifo/producer.go:82-99):
    key = record's ``key`` field (missing -> null), value = record's
    ``value`` field if present else the WHOLE record; both run through
    the same codec ``encode(col, datatype) -> Column``.

    Broker-free by construction: returns the (key, value) frame the
    Kafka batch writer sends — tests collect it, cmd_produce writes it.
    """
    if "value" in df.columns:
        val_col, val_dt = F.col("value"), df.schema["value"].dataType
    else:
        val_col = F.struct(*[F.col(c) for c in df.columns])
        val_dt = df.select(val_col.alias("v")).schema["v"].dataType
    cols = []
    if "key" in df.columns:
        cols.append(encode(F.col("key"), df.schema["key"].dataType).alias("key"))
    else:
        cols.append(F.lit(None).cast("string").alias("key"))
    cols.append(encode(val_col, val_dt).alias("value"))
    return df.select(*cols)


def sync_batches(
    pool: Pool,
    topic: str,
    start_offset: int,
    produce: Callable[[DataFrame], None],
    batch_size: int = BATCH_SIZE,
    transform=None,
) -> int:
    """The To.Sync loop (fifo/to.go:31-53): read ordered batches from
    the pool starting at the producer high-water mark and hand each to
    ``produce`` until drained. Returns records produced.

    ``produce`` is the broker boundary: df.write.format("kafka") in
    production; a collector in tests."""
    total = 0
    offset = start_offset
    while True:
        batch = pool.read_batch(topic, offset, batch_size, transform=transform)
        rows = batch.count()
        if rows == 0:
            return total
        produce(batch)
        total += rows
        # next offset = max offset in batch + 1 (ordered, monotonic)
        offset = (
            batch.agg(F.max("kafka.offset").alias("mx")).collect()[0]["mx"] + 1
        )


def sync_once(
    pool: Pool,
    topic: str,
    start_offset: int,
    produce: Callable[[DataFrame], None],
    transform=None,
) -> int:
    """Single-pass egress: ONE plan over the pool (filter >= start,
    sort by offset) handed to ``produce`` whole, instead of the
    reference's 200-row loop that re-scans the pool per batch
    (fifo/to.go:29-53). The Spark-native choice for bulk catch-up: the
    scan happens once, ordering is preserved by a single-partition
    sort (the reference's topics are single-partition by contract,
    fifo/consumer.go:59-63). Use sync_batches for reference-exact
    batch semantics, continuous_sink for ongoing egress."""
    from pyspark.sql import Observation  # noqa: PLC0415

    df = (
        pool.df()
        .filter((F.col("kafka.topic") == topic) & (F.col("kafka.offset") >= start_offset))
        .repartition(1)
        .sortWithinPartitions("kafka.offset")
    )
    if transform is not None:
        df = transform(df)
    # count rides on the produce action itself (same single-execution
    # discipline as EtlPipeline.run)
    obs = Observation()
    produce(df.observe(obs, F.count(F.lit(1)).alias("rows")))
    return int(obs.get["rows"])


def continuous_sink(
    spark: SparkSession,
    pool: Pool,
    schema,
    checkpoint: str,
    sink_builder: Callable[[DataFrame], DataFrame],
    brokers: str | None = None,
    available_now: bool = False,
    topic: str | None = None,
    start_offset: int = 0,
    max_files_per_trigger: int | None = None,
    query_name: str = "to_kafka_test",
):
    """Continuous pool->Kafka (the reference's stated future direction,
    README.md:175-177): a file-source readStream over the pool's commit
    dirs — each new atomic commit is a new set of files, discovered and
    produced as a micro-batch — projected via ``sink_builder`` into the
    Kafka sink contract.

    Resume contract, matching the batch loop (fifo/to.go:29-53):
    bootstrap with ``start_offset`` = the producer high-water mark
    probed from the broker (kafka_admin), so already-produced records
    are skipped; from then on the streaming CHECKPOINT tracks which
    commit files were produced, surviving restarts without re-probing.
    ``topic`` restricts to one output topic's data records (done/cursor
    markers share the pool and must not reach the broker).

    ``max_files_per_trigger`` bounds a micro-batch during bulk catch-up
    (a year-old pool is thousands of commit files; unbounded, the first
    trigger would try to produce all of it in one transaction)."""
    reader = spark.readStream.schema(schema).option("mergeSchema", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    # Partitioned pools nest files one level deeper (commit-N/_topic=T/);
    # the glob must reach the partition dirs, and a topic restriction
    # becomes path-level pruning — the stream never lists other topics.
    if pool.meta.get("partitioned"):
        leaf = f"_topic={topic}" if topic is not None else "_topic=*"
        stream = reader.parquet(f"{pool.path}/commit-*/{leaf}")
    else:
        stream = reader.parquet(f"{pool.path}/commit-*")
    if topic is not None:
        stream = stream.filter(F.col("kafka.topic") == topic)
        if "_type" in stream.columns:
            stream = stream.filter(F.col("_type") == "data")
    if start_offset:
        stream = stream.filter(F.col("kafka.offset") >= start_offset)
    out = sink_builder(stream)
    writer = out.writeStream.option("checkpointLocation", checkpoint)
    if brokers:
        writer = writer.format("kafka").option("kafka.bootstrap.servers", brokers)
    else:
        writer = writer.format("memory").queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
