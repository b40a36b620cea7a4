"""Relational operators mirroring the Zed query surface zync generates.

Each function is a plan *builder*: it composes stock DataFrame ops so
Catalyst keeps predicate pushdown / column pruning / join selection.
Citations are to /root/reference.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def anti_join(
    raw: DataFrame,
    done: DataFrame,
    on: Sequence[str] = ("kafka.topic", "kafka.offset"),
) -> DataFrame:
    """The exactly-once/dedup core: drop raw records whose key appears in
    the done set (`anti join on kafka.offset`, etl/build.go:115,
    demo/update.zed, README.md:507-513).

    Plain left_anti — Catalyst broadcasts the done side when small, which
    it almost always is (markers of one incremental run).
    """
    left_keys = [F.col(c) for c in on]
    right = done.select(*[F.col(c).alias(f"__aj_{i}") for i, c in enumerate(on)])
    cond = reduce(
        lambda a, b: a & b,
        [lk.eqNullSafe(F.col(f"__aj_{i}")) for i, lk in enumerate(left_keys)],
    )
    return raw.join(right, cond, "left_anti")


def switch_route(
    df: DataFrame,
    cases: Sequence[tuple[Column | None, Callable[[DataFrame], DataFrame]]],
    first_match: bool = True,
) -> list[DataFrame]:
    """`switch ( case <expr> => ... )` (etl/build.go:92-107): route each
    record to its (first-)matching case pipeline; returns the per-case
    outputs (concatenate with fuse/unionByName as the caller needs).

    A ``None`` predicate is the default case. With ``first_match`` each
    case additionally excludes all earlier predicates, matching Zed's
    first-match routing.
    """
    outs: list[DataFrame] = []
    prior: Column | None = None
    for pred, body in cases:
        if pred is None:
            cond = ~prior if prior is not None else F.lit(True)
        elif first_match and prior is not None:
            cond = pred & ~prior
        else:
            cond = pred
        outs.append(body(df.filter(cond)))
        if pred is not None:
            masked = pred if not first_match else F.coalesce(pred, F.lit(False))
            prior = masked if prior is None else (prior | masked)
    return outs


def fork(
    df: DataFrame, branches: Sequence[Callable[[DataFrame], DataFrame]]
) -> list[DataFrame]:
    """`fork ( => ... => ... )` (etl/build.go:129-137): run branches off
    one parent. Caller unions the results; cache the parent upstream if
    the branches are expensive."""
    return [b(df) for b in branches]


def ordered_batch(
    df: DataFrame,
    topic: str,
    offset: int,
    size: int,
    topic_col: str = "kafka.topic",
    offset_col: str = "kafka.offset",
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> DataFrame:
    """ReadBatch (fifo/lake.go:84-92): `kafka.topic=='T' kafka.offset>=O
    | head N [| shaper] | sort kafka.offset`.

    filter + limit push into the parquet scan; the final sort is tiny
    (≤ size rows)."""
    out = df.filter((F.col(topic_col) == topic) & (F.col(offset_col) >= offset))
    out = out.orderBy(offset_col).limit(size)
    if transform is not None:
        out = transform(out)
    return out.orderBy(offset_col)


def tail1(df: DataFrame, key: str) -> DataFrame:
    """`tail 1` on the monotonic pool key (fifo/lake.go:63-65): the
    reference exploits sortedness; with parquet min/max file stats the
    same effect is a desc sort + limit 1 (TakeOrderedAndProject — no
    full shuffle)."""
    return df.orderBy(F.col(key).desc()).limit(1)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tie_break: str | None = None,
) -> DataFrame:
    """As-of (backward, inclusive) join: for each left row, attach the
    most recent right row with right_ts <= left_ts, per key.

    Spark has no native as-of join; the scalable construction is the
    union-and-carry-forward trick: tag both sides, sort by (key, ts,
    side) with right rows first on ties, and carry the last non-null
    right payload forward with a running window.  ONE shuffle on the
    key — no range cross-join, no per-group pandas; works at any key
    cardinality and scales with the union size.
    """
    lcols = [F.col(c) for c in on]
    l_tag = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_cols) + ">"
        ).alias("__r"),
    )
    r_tag = right.select(
        *lcols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    order = [F.col("__ts"), F.col("__side")]
    if tie_break:
        order.append(F.coalesce(F.col(f"__l.{tie_break}"), F.col(f"__r.{tie_break}")))
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__match.{c}").alias(f"right_{c}") for c in right_cols],
    )
    return out


def top1_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column],
) -> DataFrame:
    """Per-group top-1 (README.md:359-365, design.md:143-159 — planned
    `head 1` per switch leg). Window row_number: one shuffle on the
    group key, no global sort."""
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
