"""Live-broker smoke tests for the Kafka-facing seams (A1/A4/A5/A23).

This container ships neither a Kafka broker nor kafka-python, so these
tests SKIP here with an explicit reason; on any host with both (set
``KAFKA_BOOTSTRAP=host:9092``), they exercise the same flow as the
reference's ztests/from-kafka.yaml against a real broker:

  1. admin creates the topic (fifo/admin.go:12-31)
  2. produce JSON records (cmd/zync/produce)
  3. from-kafka ingests them into a pool as envelopes
     (fifo/consumer.go:124-182)
  4. to-kafka replays the pool back out from the high-water mark
     (fifo/to.go:29-53)

Everything below the broker boundary is covered broker-free elsewhere
(fake admin, projection tests, ETL goldens); this file is only the
last-mile wire check.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

kafka = pytest.importorskip(
    "kafka", reason="kafka-python not installed in this container"
)

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="no live broker: set KAFKA_BOOTSTRAP=host:9092 to run",
)


@pytest.fixture()
def topic():
    return f"zinger-live-{uuid.uuid4().hex[:8]}"


def test_admin_create_and_watermarks(topic):
    from zinger_spark.kafka_admin import KafkaTopicAdmin, TopicExists

    admin = KafkaTopicAdmin(BOOTSTRAP)
    admin.create_topic(topic, partitions=1)
    with pytest.raises(TopicExists):
        admin.create_topic(topic, partitions=1)
    lo, hi = admin.watermarks(topic)
    assert (lo, hi) == (0, 0)


def test_produce_ingest_replay_round_trip(spark, tmp_path, topic):
    """ztests/from-kafka.yaml shape: produce -> pool -> replay."""
    from kafka import KafkaConsumer, KafkaProducer

    from zinger_spark.kafka_admin import KafkaTopicAdmin
    from zinger_spark.sources.pool import Pool
    from zinger_spark.streaming import to_kafka as tk

    admin = KafkaTopicAdmin(BOOTSTRAP)
    admin.create_topic(topic, partitions=1)
    out_topic = f"{topic}-out"
    admin.create_topic(out_topic, partitions=1)

    producer = KafkaProducer(bootstrap_servers=BOOTSTRAP)
    for i in range(5):
        producer.send(topic, json.dumps({"id": i, "v": i * 10}).encode())
    producer.flush()
    lo, hi = admin.watermarks(topic)
    assert (lo, hi) == (0, 5)

    # batch ingest via the Kafka batch source -> envelope -> pool
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .load()
    )
    from pyspark.sql import functions as F

    env = raw.select(
        F.struct(
            F.col("topic"),
            F.col("partition").cast("long").alias("partition"),
            F.col("offset"),
        ).alias("kafka"),
        F.col("key").cast("string").alias("key"),
        F.from_json(
            F.col("value").cast("string"), "id bigint, v bigint"
        ).alias("value"),
        F.lit("data").alias("_type"),
    )
    pool = Pool.create(spark, str(tmp_path / "live"))
    pool.load_batch(env)
    assert pool.df().count() == 5
    assert pool.next_consumer_offset(topic) == 5

    # replay pool -> out_topic from offset 0
    n = tk.sync_once(
        pool,
        topic,
        0,
        lambda df: df.select(
            F.col("key"), F.to_json(F.col("value")).alias("value")
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", out_topic)
        .save(),
    )
    assert n == 5
    consumer = KafkaConsumer(
        out_topic,
        bootstrap_servers=BOOTSTRAP,
        auto_offset_reset="earliest",
        consumer_timeout_ms=10_000,
    )
    got = [json.loads(m.value) for m in consumer]
    assert sorted(r["id"] for r in got) == [0, 1, 2, 3, 4]
