"""Generalized incremental ETL: the dormant cursor/txn-bundle model of
the reference's design.md (lines 40-360), implemented as a first-class
operator.

Model (design.md):
  - raw pool keyed by monotonic ``seqno``; each record belongs to a
    transaction (``value.txn``) and carries a ``value.done`` flag on its
    final record
  - bundles re-aggregated per txn: ``records:=collect(this),
    seqno:=max(seqno), done:=or(value.done) by txn`` (demo/etl.zed)
  - staging pool holds ETL output (one record per completed bundle,
    carrying the bundle's max seqno) plus a ``cursor`` marker: scans
    resume at ``seqno >= cursor`` (design.md:117-128, demo/update.zed)

Robustness note: the design sketch dedups replays by anti-joining the
output record's single max-seqno (demo/update.zed), which loses records
of committed bundles that straddle the cursor.  We keep the txn id on
every output record and anti-join on **txn** instead — same intent,
correct for bundles with arbitrary seqno gaps.  Cursor definition is
the sketch's: the smallest seqno still belonging to an uncommitted
transaction (batch-1 golden: cursor 2 while seqno 2 is pending,
demo/staging-1.zson).

Scale: bundle re-aggregation is one groupBy(txn) shuffle with partial
aggregation; the cursor bounds every scan to the unprocessed suffix of
the raw pool (range scan on the sorted pool key — the fix for the
reference's "brute force ... scan the entire range" note,
etl/build.go:9-18).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from ..sources.pool import Pool

TYPE_CURSOR = "cursor"


def bundle_transactions(
    df: DataFrame,
    txn: str = "value.txn",
    seqno: str = "seqno",
    done: str = "value.done",
) -> DataFrame:
    """Re-aggregate disaggregated transactions:
    records:=collect(this), seqno:=max(seqno), done:=or(done) by txn
    (demo/etl.zed, design.md:262,279).

    ``records`` is sorted by seqno (structs sort lexicographically and
    seqno leads) so records[0], records[1], ... index in arrival order —
    the contract the user transform relies on.
    """
    rec = F.struct(F.col(seqno).alias("seqno"), F.struct("*").alias("rec"))
    return (
        df.groupBy(F.col(txn).alias("txn"))
        .agg(
            F.sort_array(F.collect_list(rec)).alias("__recs"),
            F.max(seqno).alias("seqno"),
            F.max(F.col(done).cast("boolean")).alias("done"),
        )
        .select(
            "txn",
            F.transform(F.col("__recs"), lambda r: r.getField("rec")).alias("records"),
            "seqno",
            "done",
        )
    )


def ready_bundles(bundles: DataFrame) -> DataFrame:
    """done==true (demo/etl.zed's post-aggregation filter)."""
    return bundles.filter(F.col("done"))


class IncrementalEtl:
    """The cursor-driven raw->staging loop (design.md Example, :250-360)."""

    def __init__(self, raw: Pool, staging: Pool):
        self.raw = raw
        self.staging = staging

    # -- state --------------------------------------------------------------

    def cursor(self) -> int:
        """Largest committed cursor: is(<cursor>) | max(seqno)
        (design.md:126-128, :330-334). 0 when none."""
        if self.staging.is_empty():
            return 0
        row = (
            self.staging.df()
            .filter(F.col("_type") == TYPE_CURSOR)
            .agg(F.max("seqno").alias("mx"))
            .collect()[0]
        )
        return 0 if row["mx"] is None else int(row["mx"])

    def committed_txns(self, cursor: int) -> DataFrame | None:
        """Txns already in staging past the cursor (the corrected
        analog of `not is(<cursor>) | seqno >= $cursor | cut seqno`,
        demo/update.zed — see module docstring)."""
        if self.staging.is_empty():
            return None
        return (
            self.staging.df()
            .filter((F.col("_type") != TYPE_CURSOR) & (F.col("seqno") >= cursor))
            .select(F.col("txn").alias("__committed_txn"))
            .distinct()
        )

    # -- one incremental step ----------------------------------------------

    def run(
        self,
        transform: Callable[[DataFrame], DataFrame],
        out_topic_col: str = "kafka.topic",
    ) -> int:
        """Scan raw from the cursor, drop committed txns, bundle, apply
        ``transform`` to ready bundles, commit output + new cursor
        atomically. Returns bundles committed this step.

        ``transform`` maps the ready-bundles DataFrame (txn, records,
        seqno, done) to output rows; txn/seqno are re-attached if the
        transform drops them."""
        if self.raw.is_empty():
            return 0
        cursor = self.cursor()
        fresh = self.raw.df().filter(F.col("seqno") >= cursor)
        committed = self.committed_txns(cursor)
        if committed is not None:
            fresh = fresh.join(
                F.broadcast(committed),
                F.col("value.txn") == F.col("__committed_txn"),
                "left_anti",
            )
        bundles = bundle_transactions(fresh)
        ready = ready_bundles(bundles)
        out = transform(ready)
        if "txn" not in out.columns:
            raise ValueError("transform must preserve the txn column")
        n = out.count()
        # New cursor: smallest seqno still uncommitted; max+1 when done.
        pending = bundles.filter(~F.col("done")).select(
            F.explode(F.transform("records", lambda r: r.getField("seqno"))).alias("s")
        )
        pend_min = pending.agg(F.min("s").alias("mn")).collect()[0]["mn"]
        if pend_min is not None:
            new_cursor = int(pend_min)
        else:
            mx = self.raw.df().agg(F.max("seqno").alias("mx")).collect()[0]["mx"]
            new_cursor = int(mx) + 1 if mx is not None else cursor
        if n == 0 and new_cursor <= cursor:
            return 0
        cursor_row = self.raw.spark.createDataFrame(
            [(new_cursor, TYPE_CURSOR)], "seqno bigint, _type string"
        )
        from ..datamodel import fuse

        batch = fuse(out.withColumn("_type", F.lit("data")), cursor_row) if n else cursor_row
        self.staging.load_batch(batch)
        return n
