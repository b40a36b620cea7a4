"""Full-chain e2e: Kafka-shaped messages -> from-kafka ingest into Raw
pool -> zync ETL (denorm + stateless) into Staging pool -> to-kafka
egress with Connect-JSON encoding. The complete sync topology of the
reference (README.md architecture diagram), broker stood in by
DataFrames/collectors at both ends."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from zinger_spark.codecs import connect_json as cj
from zinger_spark.datamodel import fuse
from zinger_spark.etl.config import Route, Rule, Transform
from zinger_spark.etl.planner import EtlPipeline
from zinger_spark.sources.pool import Pool
from zinger_spark.streaming import from_kafka as fk
from zinger_spark.streaming import to_kafka as tk

KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)

USER_SCHEMA = {
    "type": "struct", "optional": True,
    "fields": [
        {"type": "int64", "optional": True, "field": "uid"},
        {"type": "string", "optional": True, "field": "name"},
    ],
}
CLICK_SCHEMA = {
    "type": "struct", "optional": True,
    "fields": [
        {"type": "int64", "optional": True, "field": "uid"},
        {"type": "string", "optional": True, "field": "page"},
    ],
}


def wire(payload, schema):
    return json.dumps({"schema": schema, "payload": payload}).encode()


def test_full_sync_chain(spark, tmp_path):
    raw = Pool.create(spark, str(tmp_path / "Raw"))
    staging = Pool.create(spark, str(tmp_path / "Staging"))

    # 1) from-kafka: two topics, Connect-JSON values
    users = [(None, wire({"uid": i, "name": f"user{i}"}, USER_SCHEMA), "users", 0, i, None, 0) for i in range(3)]
    clicks = [(None, wire({"uid": i % 3, "page": f"/p{i}"}, CLICK_SCHEMA), "clicks", 0, i, None, 0) for i in range(6)]
    env_u = fk.envelope_stream(
        spark.createDataFrame(users, KAFKA_SOURCE_SCHEMA),
        value_decoder=lambda c: cj.decode(c.cast("string"), USER_SCHEMA),
    )
    env_c = fk.envelope_stream(
        spark.createDataFrame(clicks, KAFKA_SOURCE_SCHEMA),
        value_decoder=lambda c: cj.decode(c.cast("string"), CLICK_SCHEMA),
    )
    raw.load_batch(fuse(env_u, env_c))
    assert raw.next_consumer_offset("users") == 3
    assert raw.next_consumer_offset("clicks") == 6

    # 2) ETL: denorm clicks x users into enriched_clicks
    transform = Transform(
        inputs=[Route("users", "Raw"), Route("clicks", "Raw")],
        output=Route("enriched_clicks", "Staging"),
        etls=[
            Rule(
                type="denorm",
                left="clicks",
                right="users",
                join_on="left.value.uid=right.value.uid",
                out="enriched_clicks",
                zed="""named_struct(
                    'key', named_struct('uid', `left`.value.uid),
                    'value', named_struct(
                        'uid', `left`.value.uid,
                        'page', `left`.value.page,
                        'name', `right`.value.name))""",
            ),
        ],
    )
    pipeline = EtlPipeline(
        spark, transform, lambda n: {"Raw": raw, "Staging": staging}[n]
    )
    assert pipeline.run() == 12  # 6 data rows + 6 marker pairs
    assert pipeline.run() == 0   # idempotent

    data = staging.df().filter(F.col("_type") == "data")
    assert data.count() == 6
    assert data.filter(F.col("value.name").isNull()).count() == 0

    # 3) to-kafka: drain Staging to the broker in ordered batches
    produced = []

    def produce(df):
        value_dt = df.schema["value"].dataType
        out = tk.kafka_sink_projection(
            df.filter(F.col("_type") == "data"),
            value_encoder=lambda d: cj.encode(F.col("value"), value_dt),
        )
        produced.extend(json.loads(r["value"])["payload"] for r in out.collect())

    n = tk.sync_batches(staging, "enriched_clicks", 0, produce, batch_size=4)
    assert n == 6
    assert {p["page"] for p in produced} == {f"/p{i}" for i in range(6)}
    assert all(p["name"] == f"user{p['uid']}" for p in produced)
