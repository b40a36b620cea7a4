"""Beyond-reference streaming surface: event-time windows, watermarks,
session windows, streaming dedup, and a custom stateful operator.

The reference has NO time-based semantics (correctness is offset-based;
SURVEY §2.B "streaming-only semantics") — these are the Structured
Streaming capabilities a Spark-first engine adds on top, per the
project north star.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time aggregation with late-data watermark.
    Works identically on batch DataFrames (window() is just a grouping
    expression there)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    group_cols = [win.alias("win"), *[F.col(k) for k in (keys or [])]]
    agg_cols = aggs or [F.count(F.lit(1)).alias("n")]
    return (
        df.groupBy(*group_cols)
        .agg(*agg_cols)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
) -> DataFrame:
    """Session windows (gap-based), the streaming analog of the batch
    sessionize query."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *(keys or []))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("session_start", F.col("win.start"))
        .withColumn("session_end", F.col("win.end"))
        .drop("win")
    )


def streaming_dedup(df: DataFrame, keys: list[str], ts_col: str, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-style streaming dedup on business keys within the
    watermark horizon (state bounded by the watermark)."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df.dropDuplicates(keys)


RUNNING_STATE_SCHEMA = "user_id BIGINT, n BIGINT, total DOUBLE"
RUNNING_OUT_SCHEMA = "user_id BIGINT, n BIGINT, total DOUBLE"


def running_totals_kernel(key, pdfs, state):
    """applyInPandasWithState kernel: per-user running event count and
    value total — the custom-stateful-operator template
    (GroupState keeps (n, total) across micro-batches)."""
    import pandas as pd

    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame([{"user_id": key[0], "n": n, "total": round(total, 2)}])


def running_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        running_totals_kernel,
        outputStructType=RUNNING_OUT_SCHEMA,
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
