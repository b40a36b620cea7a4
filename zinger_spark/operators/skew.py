"""Skew handling: salted two-phase aggregation.

AQE's skew-join splitting (enabled in session defaults) covers joins;
for aggregations over pathologically hot keys (one key = 30% of 100 TB)
the classic fix is salting: shard each key into ``salt`` sub-keys,
partially aggregate, then merge.  Two shuffles, but each is balanced.

Only algebraic aggregates decompose this way; the helpers cover the
count/sum/min/max family (avg = sum/count at the merge step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """``aggs``: output name -> (function, column), function in
    {sum, count, min, max}.

    Phase 1 groups by (keys, random salt) — hot keys spread over
    ``salt`` reducers; phase 2 merges partials by key alone.
    """
    for fn, _ in aggs.values():
        if fn not in _MERGE:
            raise ValueError(f"{fn}: not decomposable (use sum/count/min/max)")
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )
