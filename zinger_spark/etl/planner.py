"""ETL planner: Transform config -> DataFrame pipeline -> atomic commit.

The reference compiles Zed query text per output topic
(etl/build.go:67-109) and post-processes results in Go
(etl/pipeline.go:92-164).  Here the whole thing is ONE Catalyst plan:

    per-input-topic anti-join prelude      (etl/build.go:111-137)
    -> first-match switch over rules       (etl/build.go:92-107)
         stateless: {in:this} -> user expr -> out.kafka:=in.kafka
                    (etl/build.go:163-185)
         denorm:    {left:this} x {right:this} inner join -> user expr
                    -> out.kafka:=left.kafka (etl/build.go:187-216)
    -> fuse-union of branches + trailing sort kafka.offset
    -> per-topic sequential offset assignment (etl/pipeline.go:127-164)
    -> single atomic commit of data + done markers (etl/pipeline.go:92-125)

User ``zed`` blocks are Spark SQL expressions over the ``in`` /
``left`` / ``right`` struct columns producing the ``out`` struct — the
reference's shaper contract (README.md:303-315) with Zed replaced by
Spark SQL.  A ``typeof(<path>)`` pseudo-function resolves to the
field's DDL at plan time (typed-null tombstones, demo/invoices.yaml).

Scale: every scan is cursor-bounded.  A per-(output-topic, input-topic)
low-water cursor — the max offset below which EVERY input record is
already marked done — is persisted in an atomic sidecar under the
output pool and advanced after every run.  Both the raw input scan and
the done-marker scan carry ``kafka.offset > cursor``, which reaches the
parquet scan as a pushed filter (file skipping on offset min/max), so
steady-state cost is O(new window), not O(pool) — this implements the
incremental model the reference documents but never built
(etl/build.go:9-18 "brute force", design.md:117-128 cursor records;
ours lives in a sidecar file, not pool rows, because data/done rows are
the pool's public golden contract).  The anti-join right side is the
done markers ABOVE the cursor (bounded by the in-flight window); no
broadcast hint is forced — AQE picks broadcast vs shuffle-hash from the
actual size, so a backfill can't OOM the executors.  The offset
assignment is one window shuffle on the output topic key — the same
per-topic serialization point the reference has, but parallel across
topics.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import Column, DataFrame, Observation, SparkSession, Window, functions as F
from pyspark.sql import types as T

from ..datamodel import TYPE_DATA, TYPE_DONE, fuse
from .config import ConfigError, Rule, Transform

_ORIG_OFFSET = "__orig_offset"
_ORIG_TOPIC = "__orig_topic"


# ---------------------------------------------------------------------------
# typeof() resolution


def _lookup_type(schema: T.StructType, path: list[str]) -> T.DataType:
    cur: T.DataType = schema
    for part in path:
        if not isinstance(cur, T.StructType):
            raise ConfigError(f"typeof path {'.'.join(path)}: {part} is not a struct")
        match = next((f for f in cur.fields if f.name == part), None)
        if match is None:
            raise ConfigError(f"typeof path {'.'.join(path)}: no field {part!r}")
        cur = match.dataType
    return cur


def resolve_typeof(expr: str, schema: T.StructType) -> str:
    """Replace typeof(<path>) with the field's DDL type string."""

    def _sub(m: re.Match) -> str:
        path = [p for p in m.group(1).replace("`", "").strip().split(".") if p]
        return _lookup_type(schema, path).simpleString()

    return re.sub(r"typeof\(([^)]*)\)", _sub, expr)


# ---------------------------------------------------------------------------
# plan builder


def _where(rule: Rule) -> Column:
    return F.expr(rule.where) if rule.where else F.lit(True)


def _case_predicate(rule: Rule) -> Column:
    """The switch-case predicate (etl/build.go:92-107): stateless cases
    add the input-topic equality; denorm cases filter topics inside."""
    pred = _where(rule)
    if rule.type == "stateless":
        pred = pred & (F.col("kafka.topic") == rule.in_topic)
    return pred


def _done_of(kafka_col: str) -> list[Column]:
    return [
        F.struct(
            F.col(f"{kafka_col}.topic").alias("topic"),
            F.lit(None).cast("long").alias("partition"),
            F.col(f"{kafka_col}.offset").alias("offset"),
        ).alias("kafka"),
        F.lit(TYPE_DONE).alias("_type"),
    ]


class EtlPipeline:
    """One runnable ETL (single output topic, like the reference —
    etl/pipeline.go:66-68 panics on multiple)."""

    def __init__(self, spark: SparkSession, transform: Transform, open_pool):
        """``open_pool(name) -> Pool`` keeps this module storage-agnostic."""
        self.spark = spark
        self.transform = transform
        outputs = transform.routes.output_topics()
        if len(outputs) != 1:
            raise ConfigError(f"exactly one output topic supported, got {outputs}")
        self.output_topic = outputs[0]
        self.output_pool = open_pool(transform.output.pool)
        self.input_pools = {}
        for route in transform.inputs:
            if route.pool not in self.input_pools:
                self.input_pools[route.pool] = open_pool(route.pool)

    # -- cursor bookkeeping --------------------------------------------------

    def _cursor_path(self) -> str:
        return os.path.join(self.output_pool.path, "_etl_cursors.json")

    def _read_cursors(self) -> dict[str, int]:
        """{input topic: low-water offset} for this output topic.  Every
        offset <= cursor is already done; -1 (absent) = nothing done."""
        try:
            with open(self._cursor_path()) as f:
                return json.load(f).get(self.output_topic, {})
        except FileNotFoundError:
            return {}

    def _write_cursors(self, cursors: dict[str, int]) -> None:
        """Atomic sidecar swap (tmp + rename), like the pool manifest."""
        try:
            with open(self._cursor_path()) as f:
                allc = json.load(f)
        except FileNotFoundError:
            allc = {}
        allc[self.output_topic] = cursors
        tmp = self._cursor_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(allc, f)
        os.replace(tmp, self._cursor_path())

    def _advance_cursors(self) -> None:
        """Advance each topic's cursor to the max CONTIGUOUS done offset.

        first gap g = min candidate not in done, over candidates
        {cursor+1} + {done.offset+1}; new cursor = g - 1.  Distributed
        (one bounded equi-join per topic, the done side already pruned
        to offset > cursor), no sorted driver-side walk.  Lagging is
        always safe: rows above the cursor still pass the anti-join, so
        a crash between commit and sidecar write self-heals on the next
        run instead of rescanning forever.
        """
        if self.output_pool.is_empty():
            return
        cursors = dict(self._read_cursors())
        changed = False
        for topic in self.transform.routes.inputs_of(self.output_topic):
            cur = cursors.get(topic, -1)
            done = (
                self.output_pool.df(topic=topic)
                .filter((F.col("_type") == TYPE_DONE) & (F.col("kafka.offset") > cur))
                .select(F.col("kafka.offset").alias("__o"))
            )
            cand = done.select((F.col("__o") + 1).alias("__c")).unionAll(
                self.spark.range(cur + 1, cur + 2).select(F.col("id").alias("__c"))
            )
            row = (
                cand.join(done, cand["__c"] == done["__o"], "left_anti")
                .agg(F.min("__c").alias("g"))
                .collect()[0]
            )
            new_cur = int(row["g"]) - 1
            if new_cur > cur:
                cursors[topic] = new_cur
                changed = True
        if changed:
            self._write_cursors(cursors)

    # -- plan ---------------------------------------------------------------

    def _fresh_inputs(self) -> DataFrame | None:
        """Cursor-bounded anti-join prelude: per input topic, scan only
        offsets above the low-water cursor, then drop records whose
        offset is already marked done in the output pool
        (etl/build.go:111-137; incremental model per design.md:80-85).

        Both sides carry ``kafka.offset > cursor`` so the parquet scans
        file-skip on offset min/max stats; the done side is the bounded
        in-flight window, and AQE (no forced hint) chooses broadcast vs
        shuffle-hash by its actual size.
        """
        routes = self.transform.routes
        cursors = self._read_cursors()
        legs = []
        for topic in routes.inputs_of(self.output_topic):
            pool = self.input_pools[routes.lookup_pool(topic)]
            if pool.is_empty():
                continue
            cur = cursors.get(topic, -1)
            raw = pool.df(topic=topic).filter(F.col("_type") == TYPE_DATA)
            if cur >= 0:
                raw = raw.filter(F.col("kafka.offset") > cur)
            if not self.output_pool.is_empty():
                done = self.output_pool.df(topic=topic).filter(
                    F.col("_type") == TYPE_DONE
                )
                if cur >= 0:
                    done = done.filter(F.col("kafka.offset") > cur)
                raw = raw.join(
                    done.select(F.col("kafka.offset").alias("__d_offset")),
                    F.col("kafka.offset") == F.col("__d_offset"),
                    "left_anti",
                )
            legs.append(raw)
        if not legs:
            return None
        return fuse(*legs)

    def _apply_stateless(self, subset: DataFrame, rule: Rule):
        wrapped = subset.select(F.struct("*").alias("in"))
        zed = resolve_typeof(rule.zed.strip(), wrapped.schema)
        out = wrapped.select(
            F.expr(zed).alias("out"), F.col("in.kafka").alias("__in_kafka")
        )
        data = out.select(
            F.col("out.*"),
            F.struct(
                F.lit(rule.out).alias("topic"),
                F.lit(None).cast("long").alias("partition"),
                F.col("__in_kafka.offset").alias("offset"),
            ).alias("kafka"),
            F.lit(TYPE_DATA).alias("_type"),
            F.col("__in_kafka.offset").alias(_ORIG_OFFSET),
            F.col("__in_kafka.topic").alias(_ORIG_TOPIC),
        )
        markers = subset.select(*_done_of("kafka"))
        return data, markers

    def _apply_denorm(self, subset: DataFrame, rule: Rule):
        if "=" not in rule.join_on:
            raise ConfigError(
                f"join-on syntax error: {rule.join_on!r}"
                if rule.join_on
                else "no join-on expression provided in denorm rule"
            )
        left_key, right_key = (s.strip() for s in rule.join_on.split("=", 1))
        left = subset.filter(F.col("kafka.topic") == rule.left).select(
            F.struct("*").alias("left")
        )
        right = subset.filter(F.col("kafka.topic") == rule.right).select(
            F.struct("*").alias("right")
        )
        joined = left.join(
            right, F.expr(f"`left`.{_strip(left_key)} = `right`.{_strip(right_key)}"), "inner"
        )
        zed = resolve_typeof(rule.zed.strip(), joined.schema)
        out = joined.select(
            F.expr(zed).alias("out"),
            F.col("left.kafka").alias("__l_kafka"),
            F.col("right.kafka").alias("__r_kafka"),
        )
        data = out.select(
            F.col("out.*"),
            F.struct(
                F.lit(rule.out).alias("topic"),
                F.lit(None).cast("long").alias("partition"),
                F.col("__l_kafka.offset").alias("offset"),
            ).alias("kafka"),
            F.lit(TYPE_DATA).alias("_type"),
            F.col("__l_kafka.offset").alias(_ORIG_OFFSET),
            F.col("__l_kafka.topic").alias(_ORIG_TOPIC),
        )
        markers = fuse(
            out.select(*_done_of("__l_kafka")),
            out.select(*_done_of("__r_kafka")),
        )
        return data, markers

    def build(self) -> tuple[DataFrame | None, DataFrame | None]:
        """Returns (data rows with assigned offsets, done markers)."""
        fresh = self._fresh_inputs()
        if fresh is None:
            return None, None
        # Every rule's data AND marker branch re-derives from this one
        # incremental window; without a persist Spark recomputes the
        # anti-join prelude once per branch inside the commit write
        # (2 x rules executions). The window is one batch (bounded by
        # the incremental semantics), so MEMORY_AND_DISK is safe at any
        # corpus size; run() unpersists after the commit.
        from pyspark import StorageLevel  # noqa: PLC0415

        fresh = fresh.persist(StorageLevel.MEMORY_AND_DISK)
        self._persisted = fresh
        remaining = fresh
        prior: Column | None = None
        data_parts, marker_parts = [], []
        for rule in self.transform.etls:
            pred = _case_predicate(rule)
            cond = pred if prior is None else pred & ~prior
            subset = remaining.filter(cond)
            if rule.type == "stateless":
                d, m = self._apply_stateless(subset, rule)
            else:
                d, m = self._apply_denorm(subset, rule)
            data_parts.append(d)
            marker_parts.append(m)
            masked = F.coalesce(pred, F.lit(False))
            prior = masked if prior is None else (prior | masked)
        data = fuse(*data_parts)
        markers = fuse(*marker_parts)
        data = self._assign_offsets(data)
        return data, markers

    def _assign_offsets(self, data: DataFrame) -> DataFrame:
        """Sequential per-output-topic offsets continuing from the pool's
        high-water mark (etl/pipeline.go:127-164), ordered by original
        input offset (the trailing `sort kafka.offset`, etl/build.go:107)."""
        base = self.output_pool.next_producer_offsets()
        w = Window.partitionBy("kafka.topic").orderBy(_ORIG_OFFSET, _ORIG_TOPIC)
        if base:
            bmap = F.create_map(
                *[x for kv in base.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
            )
            start = F.coalesce(bmap.getItem(F.col("kafka.topic")), F.lit(0))
        else:
            start = F.lit(0)
        return (
            data.withColumn(
                "kafka",
                F.col("kafka").withField(
                    "offset", (start + F.row_number().over(w) - 1).cast("long")
                ),
            )
            .drop(_ORIG_OFFSET, _ORIG_TOPIC)
        )

    # -- run ----------------------------------------------------------------

    def run(self) -> int:
        """Build, then atomically commit data + markers together
        (etl/pipeline.go:92-125). Returns the ETL'd record count
        (0 = nothing new found to ETL, cmd/zync/etl/command.go:88-90).

        The count rides on an ``Observation`` attached to the data
        branch, collected during the commit write itself — one run is
        ONE execution of the plan (no pre-count actions; per-rule
        ``count()`` calls used to re-run the anti-join prelude and
        denorm joins once per rule before the write).  The reference's
        "ETL'd n" counts 1 data row + 1 done marker (stateless) or
        marker-pair (denorm) per output row, i.e. n = 2 * data rows.
        """
        data, markers = self.build()
        if data is None:
            self._advance_cursors()
            return 0
        try:
            obs = Observation()
            batch = fuse(data.observe(obs, F.count(F.lit(1)).alias("rows")), markers)
            commit_id = self.output_pool.load_batch(batch)
            n = 2 * int(obs.get["rows"])
        finally:
            persisted = getattr(self, "_persisted", None)
            if persisted is not None:
                persisted.unpersist()
                self._persisted = None
        if n == 0:
            # nothing matched: retract the empty commit so repeated
            # polls don't litter the pool (reference never commits an
            # empty batch either, etl/pipeline.go:92-99)
            self.output_pool.drop_commit(commit_id)
        # Advance the low-water cursors AFTER the commit is durable (and
        # after a retraction): the next run's scans start above them.
        self._advance_cursors()
        return n


def _strip(path: str) -> str:
    return path.replace("`", "").split(".", 1)[1] if path.split(".", 1)[0] in ("left", "right") else path


def explain(transform: Transform) -> str:
    """Deterministic plan text (the `zync etl -zed` analog,
    cmd/zync/etl/command.go:64-71) for golden tests."""
    lines = [f"output topic: {transform.output.topic} (pool {transform.output.pool})"]
    routes = transform.routes
    for topic in routes.inputs_of(transform.output.topic):
        lines.append(
            f"from pool {routes.lookup_pool(topic)}: topic=={topic!r}"
            f" offset>cursor ANTI JOIN done({topic!r}, offset>cursor)"
            f" ON kafka.offset"
        )
    lines.append("switch (first match):")
    for i, rule in enumerate(transform.etls):
        head = f"  case {i}: {rule.type}"
        if rule.where:
            head += f" where ({rule.where})"
        lines.append(head)
        if rule.type == "stateless":
            lines.append(f"    in: {rule.in_topic}")
        else:
            lines.append(f"    left: {rule.left} right: {rule.right} on {rule.join_on}")
        zed = " ".join(rule.zed.split())
        lines.append(f"    out := {zed}")
        lines.append(f"    + done marker(s)")
        lines.append(f"    -> kafka.topic := {rule.out!r}")
    lines.append("| sort kafka.offset; assign per-topic sequential offsets")
    lines.append("| atomic commit (data + markers)")
    return "\n".join(lines)
