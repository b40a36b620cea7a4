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


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "1 hour",
    within_watermark: bool = False,
) -> DataFrame:
    """Exactly-once-style streaming dedup on business keys.

    Default (``within_watermark=False``): ``dropDuplicates`` — state
    is evicted by the watermark ONLY when ``keys`` includes the
    event-time column; with business keys alone the state store grows
    with every distinct key forever, the classic unbounded-state bug.

    ``within_watermark=True`` switches to
    ``dropDuplicatesWithinWatermark``: state per key is dropped once
    the watermark passes its first sighting, so memory is bounded by
    keys-per-horizon even when ``keys`` carries no timestamp — the
    right call for "suppress retransmits of the same business key" at
    ingest scale.  Semantics differ accordingly: a key recurring AFTER
    the horizon is emitted again (it is a new occurrence, not a
    retransmit) — which also means there is NO batch equivalent: a
    global dropDuplicates keeps one row per key across all time, so a
    batch "parity" replay would return fewer rows than the stream.
    Rather than silently diverge, the flag on a batch frame raises."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
        if within_watermark:
            return df.dropDuplicatesWithinWatermark(keys)
    elif within_watermark:
        raise ValueError(
            "within_watermark=True has no batch equivalent (a key "
            "recurring after the horizon re-emits in the stream; a "
            "global dropDuplicates would not) — run it on a stream, or "
            "use the default form for batch parity checks"
        )
    return df.dropDuplicates(keys)


SESSION_OUT_SCHEMA = (
    "user_id BIGINT, start_ms BIGINT, end_ms BIGINT, n_events BIGINT, closed_by STRING"
)


def _sessionize_kernel(gap_ms: int):
    def kernel(key, pdfs, state):
        import pandas as pd

        out = []
        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: the
            # session is definitively over — emit and drop the state
            start, last, n = state.get
            state.remove()
            out.append(
                {"user_id": key[0], "start_ms": start, "end_ms": last,
                 "n_events": n, "closed_by": "timeout"}
            )
        else:
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            ts = []
            for pdf in pdfs:
                ts.extend(int(v) // 1_000_000 for v in pdf["ts"].astype("int64"))
            for t in sorted(ts):
                if last is None:
                    start = last = t
                    n = 1
                elif t - last > gap_ms:
                    out.append(
                        {"user_id": key[0], "start_ms": start, "end_ms": last,
                         "n_events": n, "closed_by": "gap"}
                    )
                    start = last = t
                    n = 1
                else:
                    last = max(last, t)
                    n += 1
            # Spark requires an event-time timeout strictly greater than
            # the current watermark: a batch whose events for this key
            # are all older than watermark - gap would otherwise raise.
            # If the watermark already passed last + gap the session is
            # definitively over — emit it now instead of registering an
            # unreachable timeout.
            wm = state.getCurrentWatermarkMs()
            if last is None:
                pass  # no events and no prior state: nothing to track
            elif last + gap_ms <= wm:
                state.remove()
                out.append(
                    {"user_id": key[0], "start_ms": start, "end_ms": last,
                     "n_events": n, "closed_by": "timeout"}
                )
            else:
                state.update((start, last, n))
                state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        yield pd.DataFrame(
            out, columns=["user_id", "start_ms", "end_ms", "n_events", "closed_by"]
        )

    return kernel


def streaming_sessionize(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Custom stateful sessionizer with EVENT-TIME TIMEOUT: sessions
    close either when a later event arrives past the gap ("gap") or
    when the watermark passes last_ts + gap with no event at all
    ("timeout" — the case session_window's emit also waits for, but
    here with explicit per-key state you can attach arbitrary session
    payload). State is one (start, last, n) tuple per active key —
    bounded by active users, not events; the watermark bounds how long
    a key stays resident. The streaming analog of the batch sessionize
    oracle query."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    unit_ms = {
        "millisecond": 1, "milliseconds": 1, "ms": 1,
        "second": 1000, "seconds": 1000, "sec": 1000, "secs": 1000, "s": 1000,
        "minute": 60_000, "minutes": 60_000, "min": 60_000, "mins": 60_000, "m": 60_000,
        "hour": 3_600_000, "hours": 3_600_000, "h": 3_600_000,
        "day": 86_400_000, "days": 86_400_000, "d": 86_400_000,
        "week": 604_800_000, "weeks": 604_800_000,
    }
    parts = gap.split()
    if len(parts) != 2 or not parts[0].lstrip("-").isdigit() or parts[1].lower() not in unit_ms:
        raise ValueError(
            f"gap {gap!r}: expected '<n> <unit>' with unit in "
            f"{sorted(set(unit_ms))} (interval arithmetic here is fixed-"
            "length ms; calendar units like 'month' are not meaningful)"
        )
    gap_ms = int(parts[0]) * unit_ms[parts[1].lower()]
    if gap_ms <= 0:
        raise ValueError(f"gap {gap!r} must be positive")
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            _sessionize_kernel(gap_ms),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType="start_ms BIGINT, last_ms BIGINT, n BIGINT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


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


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join with an event-time interval
    condition (the impressions-to-clicks attribution shape).

    Both inputs get a watermark and the join carries a time-range
    constraint (``left_ts <= right_ts <= left_ts + within``), so the
    state store can evict rows once the watermark passes
    ``ts + watermark + within`` — without the range constraint a
    stream-stream join buffers both sides FOREVER, which is the
    classic unbounded-state bug at 100 TB/day ingest. Works on batch
    DataFrames too (same plan minus state), which is how the parity
    test checks values. ``how`` may be inner / leftOuter / fullOuter
    (outer rows emit only after the watermark passes their window).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + interval {within}"))
    )
    return lw.join(rw, cond, how)


def stream_static_enrich(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Enrich a stream with a static dimension via broadcast join —
    per micro-batch the dim is re-resolved, so slowly-changing lookup
    tables refresh on each trigger without restarting the query. The
    broadcast keeps the join shuffle-free on the (unbounded) stream
    side."""
    return stream.join(F.broadcast(dim), key, how)


def _heavy_hitters_kernel(col: str, d: int, w: int, k: int):
    def kernel(key, pdfs, state):
        import hashlib

        import pandas as pd

        if state.exists:
            grid_t, toks, cnts = state.get
            grid = list(grid_t)
            cand = dict(zip(toks, cnts))
        else:
            grid, cand = [0] * (d * w), {}

        def bucket(i: int, s: str) -> int:
            return int(hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:15], 16) % w

        for pdf in pdfs:
            for tok, n in pdf[col].value_counts().items():
                idxs = [i * w + bucket(i, str(tok)) for i in range(d)]
                for ix in idxs:
                    grid[ix] += int(n)
                # the grid carries the token's FULL history, so a
                # candidate that was pruned and reappears comes back
                # with its true (over-)estimate, not a reset count
                cand[str(tok)] = min(grid[ix] for ix in idxs)
        top = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        state.update((grid, [t for t, _ in top], [c for _, c in top]))
        yield pd.DataFrame(
            [{"shard": int(key[0]), "token": t, "cm_estimate": c} for t, c in top]
        )

    return kernel


def streaming_heavy_hitters(
    stream: DataFrame,
    col: str,
    d: int = 4,
    w: int = 256,
    k: int = 10,
    shards: int = 8,
) -> DataFrame:
    """Streaming Count-Min heavy hitters: per-shard CM grid + candidate
    heap maintained in GroupState across micro-batches (the classic
    CM+heap sketch, kept as state instead of a table).

    Tokens hash onto ``shards`` state groups, so (a) state parallelizes
    across executors and (b) each token's counts live wholly in one
    shard's grid — per-shard top-k is globally correct for that shard's
    tokens, and the global top-k is a bounded k*shards-row sort
    downstream.  State size is d*w longs + k candidates per shard, FIXED
    for the life of the stream no matter the token cardinality — the
    whole point of sketching the stream instead of groupBy-counting it.
    Estimates are CM overestimates (never under), exact while a shard's
    distinct tokens <= w collisions-free.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.text import md5_hash60

    sharded = stream.withColumn("_shard", md5_hash60(F.col(col)) % shards)
    return sharded.groupBy("_shard").applyInPandasWithState(
        _heavy_hitters_kernel(col, d, w, k),
        outputStructType="shard INT, token STRING, cm_estimate BIGINT",
        stateStructType="grid ARRAY<BIGINT>, toks ARRAY<STRING>, cnts ARRAY<BIGINT>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
