"""Skew handling: salted two-phase aggregation + salted replicate join.

AQE's skew-join splitting (enabled in session defaults) covers most
joins; for aggregations over pathologically hot keys (one key = 30% of
100 TB) the classic fix is salting: shard each key into ``salt``
sub-keys, partially aggregate, then merge.  Two shuffles, but each is
balanced.  ``salted_join`` is the join-side analog for when AQE can't
help (e.g. the skew only materializes after upstream filters AQE
statistics don't see): salt the big side, replicate the small side
``salt`` times, equi-join on (key, salt).

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

    ``count`` follows SQL semantics: ``("count", col)`` skips nulls in
    ``col`` (count(col)); pass ``None`` or ``"*"`` as the column for a
    row count (count(*)).
    """
    for fn, _ in aggs.values():
        if fn not in _MERGE:
            raise ValueError(f"{fn}: not decomposable (use sum/count/min/max)")
    salted = df.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))

    def _partial(fn: str, col):
        if fn == "count":
            return F.count(F.lit(1)) if col in (None, "*") else F.count(col)
        return getattr(F, fn)(col)

    partial = salted.groupBy(*keys, "__salt").agg(
        *[_partial(fn, col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the BIG side's rows randomly into
    ``salt`` shards and replicate the SMALL side once per shard, then
    join on (keys..., salt).  A key holding 30% of the big side spreads
    over ``salt`` reducers instead of melting one; the price is
    ``salt``x duplication of the small side through the shuffle — use
    when the small side is modest but too big (or too dynamic) to
    broadcast and AQE's split isn't kicking in.

    Supports inner and left joins (semantics preserved: each big row
    carries exactly one salt value, so no duplicates are introduced).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    big_s = big.withColumn("__salt", (F.rand(seed=0) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")
