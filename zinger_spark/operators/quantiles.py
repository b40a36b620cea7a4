"""Scalable per-group quantile filtering and decile bucketing.

The exact formulations — ``percent_rank() OVER (PARTITION BY group
ORDER BY score)`` and ``ntile(n) OVER (ORDER BY score)`` — are correct
but funnel each group (or, for the global ntile, the ENTIRE dataset)
through a single task: parallelism is capped at the number of groups
and the last stage sorts a whole partition in one reducer. Fine at
small scale factors; a non-starter on a 100 TB corpus.

The scale paths here replace the rank window with a two-step
aggregate-then-filter shape that Catalyst keeps fully parallel:

* ``group_quantile_filter``: one partial-aggregated ``approx_percentile``
  per group (GK sketch, mergeable, map-side combined) produces a tiny
  per-group threshold table (#groups rows) that is broadcast back and
  applied as a per-row filter. No window, no per-group serialization;
  the error is the sketch's rank epsilon = 1/accuracy.
* ``bucket_by_quantiles``: one global ``approx_percentile`` over the
  score column yields the n-1 internal cut points as a single array
  row; a broadcast join plus an O(n) boundary scan assigns each row its
  bucket. Replaces ``ntile(n)`` OVER an unpartitioned window (one
  reducer sorting everything) with a per-row expression.

Boundary semantics differ from the rank-exact forms only at ties and
within sketch epsilon of the cut points — document the tolerance, keep
the rank-exact form where hash-exact oracle parity is required (see
``__spark_entry__._q_quality_quantile_filter``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantile_filter(
    df: DataFrame,
    group_col: str,
    score_col: str,
    q: float,
    mode: str = "approx",
    accuracy: int = 10_000,
    keep: str = "top",
) -> DataFrame:
    """Keep each group's top (1-q) fraction of rows by ``score_col``.

    ``mode="approx"`` (the 100x path): per-group GK-sketch threshold,
    broadcast back, per-row ``score >= threshold`` filter. Rows within
    rank-epsilon (= 1/accuracy) of the boundary, and ties ON the
    boundary value, may differ from the rank-exact result.

    ``mode="exact"``: the percent_rank window form — exact, but each
    group flows through one task; use only at oracle/test scale.
    ``keep="bottom"`` flips the filter direction.
    """
    if keep not in ("top", "bottom"):
        raise ValueError(f"keep must be 'top' or 'bottom', got {keep!r}")
    if mode == "exact":
        w = Window.partitionBy(group_col).orderBy(F.col(score_col))
        pr = F.percent_rank().over(w)
        cond = F.col("_pr") >= q if keep == "top" else F.col("_pr") <= q
        return df.withColumn("_pr", pr).filter(cond).drop("_pr")
    if mode != "approx":
        raise ValueError(f"mode must be 'approx' or 'exact', got {mode!r}")
    thresholds = df.groupBy(group_col).agg(
        F.percentile_approx(score_col, F.lit(q), F.lit(accuracy)).alias("_thr")
    )
    cond = (
        F.col(score_col) >= F.col("_thr")
        if keep == "top"
        else F.col(score_col) <= F.col("_thr")
    )
    return df.join(F.broadcast(thresholds), group_col).filter(cond).drop("_thr")


def bucket_by_quantiles(
    df: DataFrame,
    score_col: str,
    n: int,
    bucket_col: str = "bucket",
    mode: str = "approx",
    accuracy: int = 10_000,
) -> DataFrame:
    """Assign each row a 1..n quantile bucket of ``score_col``.

    ``mode="approx"``: global approx-percentile cut points (one
    mergeable aggregate -> a single broadcast row), then a per-row
    count of boundaries <= score. Unlike ``ntile``, bucket populations
    are equal only within sketch epsilon and ties land in one bucket.

    ``mode="exact"``: ``ntile(n)`` over an unpartitioned window — the
    one-reducer form, for oracle parity at small scale only.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if mode == "exact":
        w = Window.orderBy(F.col(score_col))
        return df.withColumn(bucket_col, F.ntile(n).over(w))
    if mode != "approx":
        raise ValueError(f"mode must be 'approx' or 'exact', got {mode!r}")
    qs = [i / n for i in range(1, n)]
    cuts = df.agg(
        F.percentile_approx(
            score_col, F.array(*[F.lit(x) for x in qs]), F.lit(accuracy)
        ).alias("_cuts")
    )
    scored = df.join(F.broadcast(cuts))
    # bucket = 1 + number of internal cut points strictly below score
    # (<= keeps boundary ties in the lower bucket, matching ntile's
    # "earlier rows first" only up to ties; 9 elements -> trivial scan)
    bucket = F.size(
        F.filter("_cuts", lambda c: c < F.col(score_col))
    ) + F.lit(1)
    return scored.withColumn(bucket_col, bucket.cast("int")).drop("_cuts")
