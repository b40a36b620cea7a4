"""Scalable sequence packing: per-group running token offsets via a
two-level (distributed) prefix sum.

The naive formulation — ``sum(weight) OVER (PARTITION BY group ORDER BY
order)`` — is correct but its parallelism is capped at the number of
groups: one training-data *source* = one Spark task, so a 100 TB corpus
with 20 sources saturates 20 cores no matter the cluster size.

``pack_offsets`` keeps the exact same semantics with parallelism equal
to the number of *partitions*:

1. range-repartition on (group, order) so every partition holds a
   contiguous, sorted slice of each group (Spark's RangePartitioner
   samples boundaries; equal keys never split);
2. local prefix sum within (partition, group) — the window keys include
   the partition id, so no partition processes more than its own slice;
3. per-(partition, group) totals form a TINY side table (≤ partitions +
   groups rows, since a group spans only adjacent range partitions); a
   window over THAT table turns totals into cross-partition offsets;
4. broadcast-join the offsets back and add.

Step 3's window is per-group again, but over ~#partitions rows, not the
corpus. The result is invariant to the sampled partition boundaries:
offset(partition, group) + local_cumsum is an exact decomposition of
the global cumsum.

Packing semantics follow the greedy offset chop used by pretraining
pipelines: ``start_off`` is the token offset of the doc within its
group's concatenated stream, ``pack_id = start_off div budget``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    group_col: str,
    order_col: str | list[str],
    weight_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive per-group prefix sum of ``weight_col`` in ``order_col``
    order (a column name or list of names for a composite sort key),
    computed with a two-level decomposition so parallelism scales
    with partitions rather than groups. Output adds ``out_col`` (bigint);
    all input columns pass through."""
    spark = df.sparkSession
    order_cols = [order_col] if isinstance(order_col, (str, Column)) else list(order_col)
    # accept Column sort expressions (incl. .desc()) as well as names;
    # repartitionByRange and Window.orderBy both honor the SortOrder,
    # so descending keys need no negation trick
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))

    ranged = df.repartitionByRange(
        num_partitions, F.col(group_col), *order_cols
    ).withColumn("_pid", F.spark_partition_id())
    # CORRECTNESS: materialize the ranged frame.  It feeds two
    # consumers (the per-partition totals and the final join-back), and
    # Catalyst prunes their columns differently, which can compile TWO
    # separate range exchanges — RangePartitioner SAMPLES its
    # boundaries per execution, so two exchanges can disagree on where
    # partitions split and `_pid` stops being one consistent labeling
    # (observed as duplicated + skipped ranks when the input carries
    # pass-through columns).  A localCheckpoint pins ONE evaluation;
    # eager=False defers it to the first action.  ReusedExchange would
    # make this free, but it is an optimization Spark may not apply —
    # never a correctness guarantee.
    ranged = ranged.localCheckpoint(eager=False)

    w_local = (
        Window.partitionBy("_pid", group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn(
        "_local_end", F.sum(F.col(weight_col).cast("long")).over(w_local)
    )

    # tiny: one row per (partition, group) pair; a group covers only
    # adjacent range partitions, so this is <= num_partitions + n_groups.
    # Summed straight off the checkpointed ranged frame — the per-group
    # partition total is sum(weight), identically max(_local_end), and
    # deriving it from `local` would re-run the full-frame hash
    # exchange + sort + window a second time (the window has two
    # consumers and Catalyst inlines it into each); a partial-aggregated
    # groupBy ships only the tiny (pid, group) totals.
    partials = ranged.groupBy("_pid", group_col).agg(
        F.sum(F.col(weight_col).cast("long")).alias("_part_total")
    )
    w_prior = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = partials.select(
        "_pid",
        group_col,
        F.coalesce(F.sum("_part_total").over(w_prior), F.lit(0)).alias("_grp_off"),
    )

    return (
        local.join(F.broadcast(offsets), ["_pid", group_col])
        .withColumn(
            out_col,
            (F.col("_grp_off") + F.col("_local_end") - F.col(weight_col)).cast("long"),
        )
        .drop("_pid", "_local_end", "_grp_off")
    )


def global_row_number(
    df: DataFrame,
    order_by: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global row number over a total order, computed with
    the two-level prefix sum — no unpartitioned ``Window.orderBy`` (a
    one-reducer sort of the whole input), so parallelism scales with
    partitions.  ``order_by`` is a list of column names or Column sort
    expressions (``F.col("x").desc()`` works) that must form a TOTAL
    order: with no ties, row_number == rank == dense_rank, so this also
    serves percent_rank/cume_dist/ntile computed from the row number.

    The corpus-wide stages are the range exchange and a window keyed by
    (_pid, constant); the only per-key window runs over the per-partition
    totals table (<= num_partitions rows)."""
    tmp_g, tmp_w, tmp_rn = "_grn_g", "_grn_w", "_grn0"
    out = prefix_sum(
        df.withColumn(tmp_g, F.lit(0)).withColumn(tmp_w, F.lit(1)),
        tmp_g,
        order_by,
        tmp_w,
        out_col=tmp_rn,
        num_partitions=num_partitions,
    )
    return (
        out.withColumn(out_col, (F.col(tmp_rn) + F.lit(1)).cast("long"))
        .drop(tmp_g, tmp_w, tmp_rn)
    )


def pack_offsets(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
    start_col: str = "start_off",
    pack_col: str = "pack_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy offset-chop sequence packing: concatenate rows per group in
    ``order_col`` order and cut packs every ``budget`` tokens.  Adds
    ``start_col`` (the row's first token offset in its group stream) and
    ``pack_col`` (= start div budget)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    out = prefix_sum(
        df, group_col, order_col, weight_col,
        out_col=start_col, num_partitions=num_partitions,
    )
    return out.withColumn(
        pack_col, F.floor(F.col(start_col) / F.lit(budget)).cast("long")
    )
