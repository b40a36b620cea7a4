"""Cascaded time-granularity rollups from mergeable partials.

The hypertable/continuous-aggregate pattern (TimescaleDB's rollup,
Druid's granularity ladder): maintain hourly aggregates, derive daily
from the HOURLY PARTIALS and monthly from the daily — the raw corpus
is scanned exactly once, at the finest granularity.  At 100 TB the
difference is decisive: a direct monthly groupBy re-reads the full
fact table per tier, while the cascade aggregates a partial table
that is smaller by the bucketing factor (24x, then ~30x) at each
step; the coarser tiers are driver-trivial.

Correctness rests on the aggregate state being MERGEABLE: we carry
(cnt, sum, min, max) — count merges by sum, sum by sum, min/max by
min/max.  Values are integer (fixed-point cents), so the cascade is
bit-identical to the direct aggregation regardless of merge order —
the property the oracle (__spark_entry__) checks by computing the
monthly tier DIRECTLY from raw events and hash-comparing.

Non-mergeable aggregates (exact medians) don't cascade; mergeable
sketches do — see operators/sketches.hll_merge for the distinct-count
ladder (`hll_merge_rollup` registry key), the same pattern one level
up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# granularity ladder: each unit must nest exactly into the next
# (date_trunc is idempotent across the ladder: truncating an
# hour-bucket to day == truncating the raw timestamp to day).
# 'week' is special: hours/days nest into ISO weeks, but weeks nest
# into NOTHING coarser — a week straddles month and year boundaries,
# so date_trunc('month', week_monday) silently misassigns the
# straddling rows.  Week must therefore be the LAST unit of a cascade.
_UNITS = ("hour", "day", "week", "month", "year")


def rollup_base(
    df: DataFrame,
    ts_col: str,
    value: Column,
    unit: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Finest-tier partials from raw rows: (bucket, *keys, cnt, sum_v,
    min_v, max_v).  One partial-aggregated shuffle of the fact table —
    the only corpus-wide pass in the cascade."""
    keys = list(keys or [])
    return (
        df.select(
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
            *keys,
            value.alias("v"),
        )
        .groupBy("bucket", *keys)
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("v").cast("long").alias("sum_v"),
            F.min("v").cast("long").alias("min_v"),
            F.max("v").cast("long").alias("max_v"),
        )
    )


def rollup_merge(
    partials: DataFrame,
    unit: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Coarser tier from a finer tier's PARTIALS — never re-reads raw
    data.  cnt/sum merge by sum, min/max by min/max; exact because the
    states are mergeable (module docstring)."""
    keys = list(keys or [])
    return (
        partials.select(
            F.date_trunc(unit, F.col("bucket")).alias("bucket"),
            *keys,
            "cnt",
            "sum_v",
            "min_v",
            "max_v",
        )
        .groupBy("bucket", *keys)
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("sum_v").cast("long").alias("sum_v"),
            F.min("min_v").cast("long").alias("min_v"),
            F.max("max_v").cast("long").alias("max_v"),
        )
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    value: Column,
    units: tuple[str, ...] = ("hour", "day", "month"),
    keys: list[str] | None = None,
) -> dict[str, DataFrame]:
    """The full ladder: units[0] from raw, every further tier from the
    previous tier's partials.  Returns {unit: partials_df}."""
    for u in units:
        if u not in _UNITS:
            raise ValueError(f"unknown unit {u!r}")
    if [u for u in _UNITS if u in units] != list(units):
        raise ValueError("units must be ordered fine -> coarse")
    if "week" in units and units.index("week") != len(units) - 1:
        raise ValueError(
            "week does not nest into coarser units (ISO weeks straddle "
            "month/year boundaries) — it must be the cascade's last unit"
        )
    tiers: dict[str, DataFrame] = {}
    cur = rollup_base(df, ts_col, value, units[0], keys)
    tiers[units[0]] = cur
    for u in units[1:]:
        cur = rollup_merge(cur, u, keys)
        tiers[u] = cur
    return tiers


def calendar_fill(
    partials: DataFrame,
    unit: str,
    keys: list[str] | None = None,
    fill_col: str = "sum_v",
) -> DataFrame:
    """Dense the sparse rollup: emit EVERY bucket on the [min, max]
    calendar for every key combination, zero-filling counts/sums and
    forward-filling ``fill_col`` (last non-null per key, in bucket
    order) — the gap-filling step every time-series chart/model needs.

    Scale shape: the calendar comes from a 1-row min/max agg exploded
    via ``sequence()`` (no driver collect) and is bounded by the TIME
    RANGE, not the corpus — cross-joined (broadcast) with the distinct
    key set.  The forward-fill window partitions by key, so the sort is
    per-key-sized; there is no global window anywhere."""
    keys = list(keys or [])
    lo_hi = partials.agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    cal = lo_hi.select(
        F.explode(
            F.expr(f"sequence(_lo, _hi, interval 1 {unit})")
        ).alias("bucket")
    )
    grid = cal
    if keys:
        ks = partials.select(*keys).distinct()
        grid = cal.crossJoin(F.broadcast(ks))
    j = grid.join(partials, ["bucket", *keys], "left").select(
        "bucket",
        *keys,
        F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
        F.coalesce(F.col(fill_col), F.lit(0)).cast("long").alias(fill_col),
        F.col(fill_col).alias("_raw"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.withColumn(
        "filled",
        F.coalesce(F.last("_raw", ignorenulls=True).over(w), F.lit(0)).cast("long"),
    ).drop("_raw")


def cents(value: Column) -> Column:
    """Fixed-point 2-decimal quantization: floor(v * 100 + 0.5).
    floor after the +0.5 shift gives half-up rounding from a formula
    whose IEEE-754 evaluation is identical in every engine — unlike
    round(), whose half-way convention differs between Spark
    (HALF_UP) and other engines' bankers'/away-from-zero variants."""
    return F.floor(value * F.lit(100) + F.lit(0.5)).cast("long")
