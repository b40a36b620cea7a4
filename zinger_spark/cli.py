"""CLI parity with the reference's zync subcommands (cmd/zync/*):

  consume     Kafka -> stdout            (cmd/zync/consume/command.go)
  produce     files -> Kafka             (cmd/zync/produce/command.go)
  from-kafka  Kafka -> pool sync         (cmd/zync/from-kafka/command.go)
  to-kafka    pool -> Kafka sync         (cmd/zync/to-kafka/command.go)
  etl         pool -> pool transform     (cmd/zync/etl/command.go)
  ls          registry subjects          (cmd/zync/ls/command.go)
  info        topic low/high watermarks  (cmd/zync/info/command.go)
  create-pool pool init (zed create analog)

Broker/registry-facing commands need -b/--brokers (and fail with a
clear error when unreachable); pool-facing commands run fully local.

Usage: python -m zinger_spark.cli <subcommand> [...]
"""

from __future__ import annotations

import argparse
import json
import sys

from .session import get_spark


def _spark(args):
    return get_spark(f"zync-{args.cmd}")


def cmd_etl(args) -> int:
    from .etl.config import load_transform
    from .etl.planner import EtlPipeline, explain
    from .sources.pool import Pool

    transform = load_transform(args.config)
    if args.explain:
        # the `zync etl -zed` analog (cmd/zync/etl/command.go:64-71)
        print(explain(transform))
        return 0
    spark = _spark(args)
    pipeline = EtlPipeline(
        spark, transform, lambda name: Pool(spark, f"{args.lake}/{name}")
    )
    n = pipeline.run()
    if n == 0:
        print("nothing new found to ETL")  # cmd/zync/etl/command.go:88-90
    else:
        print(f"ETL'd {n} record{'s' if n != 1 else ''}")
    return 0


def cmd_create_pool(args) -> int:
    from .sources.pool import Pool

    Pool.create(_spark(args), f"{args.lake}/{args.name}")
    print(f"pool: {args.name} created")
    return 0


def cmd_info(args) -> int:
    """Watermarks. With --pool: offset range stored per topic (local).
    With --brokers: Kafka low/high via admin API (A4)."""
    if args.pool:
        from pyspark.sql import functions as F

        from .sources.pool import Pool

        pool = Pool(_spark(args), f"{args.lake}/{args.pool}")
        if pool.is_empty():
            print("{}")
            return 0
        rows = (
            pool.df()
            .groupBy(F.col("kafka.topic").alias("topic"))
            .agg(
                F.min("kafka.offset").alias("low"),
                F.max("kafka.offset").alias("high"),
                F.count(F.lit(1)).alias("rows"),
            )
            .orderBy("topic")
            .collect()
        )
        for r in rows:
            print(json.dumps({"topic": r["topic"], "low": r["low"], "high": r["high"], "rows": r["rows"]}))
        return 0
    print("kafka watermarks require --brokers and a reachable broker", file=sys.stderr)
    return 1


def cmd_ls(args) -> int:
    from .codecs.avro import SchemaRegistry

    try:
        for s in SchemaRegistry(args.registry).subjects():
            print(s)
        return 0
    except Exception as e:  # noqa: BLE001
        print(f"registry unreachable at {args.registry}: {e}", file=sys.stderr)
        return 1


def cmd_from_kafka(args) -> int:
    from .codecs import connect_json as cj
    from .sources.pool import Pool
    from .streaming import from_kafka as fk

    spark = _spark(args)
    pool = Pool(spark, f"{args.lake}/{args.pool}")
    topics = args.topics.split(",")
    offsets = fk.starting_offsets_from_pool(pool, topics)
    src = fk.kafka_source(spark, args.brokers, topics, offsets, args.thresh)
    schema = json.load(open(args.value_schema)) if args.value_schema else None
    decoder = (
        (lambda c: cj.decode(c.cast("string"), schema))
        if schema
        else (lambda c: c.cast("string"))
    )
    env = fk.envelope_stream(src, value_decoder=decoder)
    q = fk.run_ingest(
        env,
        pool,
        checkpoint=f"{args.lake}/.checkpoints/{args.pool}",
        interval=args.interval,
        available_now=args.exitafter,
    )
    q.awaitTermination()
    return 0


def cmd_to_kafka(args) -> int:
    from pyspark.sql import functions as F

    from .codecs import connect_json as cj
    from .sources.pool import Pool
    from .streaming import to_kafka as tk

    spark = _spark(args)
    pool = Pool(spark, f"{args.lake}/{args.pool}")

    def produce(df):
        value_dt = df.schema["value"].dataType
        out = tk.kafka_sink_projection(
            df, value_encoder=lambda d: cj.encode(F.col("value"), value_dt)
        )
        (
            out.write.format("kafka")
            .option("kafka.bootstrap.servers", args.brokers)
            .option("topic", args.topic)
            .save()
        )

    start = pool.next_consumer_offset(args.topic) if args.resume else 0
    n = tk.sync_batches(pool, args.topic, start, produce, batch_size=args.batch_size)
    print(f"produced {n} records")
    return 0


def cmd_consume(args) -> int:
    from .streaming import from_kafka as fk

    spark = _spark(args)
    df = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", args.brokers)
        .option("subscribe", args.topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    for r in df.select(
        "topic", "partition", "offset", df.value.cast("string").alias("value")
    ).collect():
        print(json.dumps(r.asDict()))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="zync-spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    etl = sub.add_parser("etl", help="run a transform YAML against pools")
    etl.add_argument("config")
    etl.add_argument("--lake", default=".", help="directory holding pools")
    etl.add_argument("--explain", action="store_true", help="print plan, don't run")

    cp = sub.add_parser("create-pool")
    cp.add_argument("name")
    cp.add_argument("--lake", default=".")

    info = sub.add_parser("info", help="watermarks per topic")
    info.add_argument("--pool")
    info.add_argument("--lake", default=".")
    info.add_argument("--brokers")

    ls = sub.add_parser("ls", help="list schema-registry subjects")
    ls.add_argument("--registry", required=True)

    fkp = sub.add_parser("from-kafka")
    fkp.add_argument("--brokers", required=True)
    fkp.add_argument("--topics", required=True)
    fkp.add_argument("--pool", required=True)
    fkp.add_argument("--lake", default=".")
    fkp.add_argument("--value-schema", help="Connect schema JSON file")
    fkp.add_argument("--thresh", type=int, default=1_048_576)
    fkp.add_argument("--interval", default="5 seconds")
    fkp.add_argument("--exitafter", action="store_true", help="drain then exit")

    tkp = sub.add_parser("to-kafka")
    tkp.add_argument("--brokers", required=True)
    tkp.add_argument("--topic", required=True)
    tkp.add_argument("--pool", required=True)
    tkp.add_argument("--lake", default=".")
    tkp.add_argument("--batch-size", type=int, default=200)
    tkp.add_argument("--resume", action="store_true")

    cons = sub.add_parser("consume")
    cons.add_argument("--brokers", required=True)
    cons.add_argument("--topic", required=True)

    args = p.parse_args(argv)
    handler = {
        "etl": cmd_etl,
        "create-pool": cmd_create_pool,
        "info": cmd_info,
        "ls": cmd_ls,
        "from-kafka": cmd_from_kafka,
        "to-kafka": cmd_to_kafka,
        "consume": cmd_consume,
    }[args.cmd]
    return handler(args)


if __name__ == "__main__":
    raise SystemExit(main())
