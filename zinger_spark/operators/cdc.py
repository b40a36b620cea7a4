"""CDC materialization: change streams -> queryable tables.

The natural downstream of the Debezium/Connect-JSON decode path
(codecs/connect_json.py; reference parity: zinger syncs Debezium
topics into the lake, `connectjson/decoder.go`): once change events
land in a pool, consumers want them as TABLES — either the current
snapshot (latest row per business key) or the full slowly-changing-
dimension type-2 history (one row per change with a validity
interval).

Both shapes are single-window, partitioned BY BUSINESS KEY — the sort
is per-key-sized, never global, so the plan holds at any corpus size;
a skewed hot key is one partition's sort and AQE splits it.  The
current-snapshot form is operators/relational.top1_per_group (already
shipped); this module adds the SCD2 interval builder.

Determinism: callers supply a total order (ts plus a tiebreak column)
so interval boundaries are engine- and partitioning-exact — which is
what lets the oracle replay the history bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 history: every change row gains ``valid_from`` (its own
    timestamp), ``valid_to`` (the NEXT change's timestamp for the same
    key, null while current) and ``is_current``.  One ``lead`` window
    per business key; all other columns pass through."""
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def scd2_apply_batch(
    history: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold a NEW batch of change events
    into an existing history without recomputing it.

    Cost is bounded by the AFFECTED keys (the batch's key set), the
    same incremental contract as the dedup/index maintainers: rows for
    untouched keys pass through verbatim (one broadcast-able anti
    join); rows for affected keys — their existing versions plus the
    batch — are re-intervaled with the per-key lead window, which
    correctly closes the previously-open version and orders any
    batch-internal chains.  Equal to rebuilding from the full event
    log (property-tested), because ``valid_from`` preserves each
    version's original event time.

    ``history`` must be a :func:`scd2_history` output (or a prior
    ``scd2_apply_batch`` result); ``batch`` carries raw change rows
    with the same key/ts/payload columns."""
    keys = batch.select(*key_cols).distinct()
    untouched = history.join(F.broadcast(keys), key_cols, "left_anti")
    payload_cols = [
        c for c in history.columns
        if c not in ("valid_from", "valid_to", "is_current")
    ]
    affected_old = history.join(F.broadcast(keys), key_cols).select(*payload_cols)
    merged = affected_old.unionByName(batch.select(*payload_cols))
    redone = scd2_history(merged, key_cols, ts_col, tiebreak_cols)
    return untouched.unionByName(redone)


def scd2_as_of(history: DataFrame, at) -> DataFrame:
    """Point-in-time slice of an SCD2 history: the row version live at
    ``at`` (valid_from <= at < valid_to, with null valid_to = open).
    A pure filter — pushes into the scan, prunes on valid_from/...to
    zone maps when the history is clustered on them."""
    col = F.lit(at)
    return history.where(
        (F.col("valid_from") <= col)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > col))
    )
