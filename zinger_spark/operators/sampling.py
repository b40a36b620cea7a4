"""Deterministic sampling operators for training-data mixtures.

No RNG anywhere: keep/drop decisions hash the document id, so samples
are reproducible across runs, engines, and partitionings — and the
DuckDB oracle can re-derive them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import md5_hash60


def mixture_sample(
    df: DataFrame,
    target_total: int,
    temperature: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-weighted source mixture: sample ~``target_total``
    docs with per-source budgets ∝ n_i^temperature (the standard
    pretraining rebalance — T=1 keeps natural proportions, T→0
    equalizes sources, T<1 upweights small sources, e.g. the
    multilingual T=0.3-0.7 range).

    Per-source keep rate = min(1, target_total * w_i / n_i) with
    w_i = n_i^T / Σ n_j^T; a doc is kept when
    md5(id) % 10000 < thr_i — a pure per-row hash compare.

    The threshold is INTEGER fixed point end-to-end:
    W_i = floor(n_i^T · 2^20) as int64, thr_i = ((total·W_i·10000)
    div ΣW) div n_i (nested int-div == one exact floor-div, no int128
    needed).  The r9 sf3 sweep caught the double form flipping a whole
    hash bucket (~n/10000 docs) against the oracle: with round-number
    corpus sizes the exact threshold lands ON an integer, and
    `a*(b/c)/d` vs `a*b/c/d` rounding puts the two engines on opposite
    sides of it — a boundary no small-SF test can see, because there a
    hash value is shared by <1 doc on average.  Only n^T itself stays
    floating: for T=0.5 it is sqrt(), correctly rounded by IEEE 754 in
    both engines, hence bit-identical; other T go through pow() where
    libms may differ by 1 ulp — a ~2^-20-relative wobble on ONE
    source's integer weight at worst, random rather than systematic.

    Scale shape: one partial-agg groupBy for source sizes (tiny — one
    row per source at any corpus size), broadcast back, then a
    scan-pipelined filter; zero wide shuffles, no RNG, no sort.
    """
    if target_total <= 0:
        raise ValueError("target_total must be > 0")
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    sizes = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    nT = (
        F.sqrt(F.col("__n").cast("double"))
        if temperature == 0.5
        else F.pow(F.col("__n").cast("double"), F.lit(float(temperature)))
    )
    weights = sizes.withColumn(
        "__w", F.floor(nT * F.lit(float(1 << 20))).cast("long")
    )
    total_wt = weights.agg(F.sum("__w").alias("__tw"))
    rates = weights.crossJoin(F.broadcast(total_wt)).select(
        source_col,
        F.least(
            F.lit(10000).cast("long"),
            F.expr(
                f"(CAST({int(target_total)} AS BIGINT) * __w * 10000L) "
                "div __tw div __n"
            ),
        ).alias("__thr"),
    )
    h = md5_hash60(F.col(id_col).cast("string"))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter((h % 10000) < F.col("__thr"))
        .drop("__thr")
    )


def quota_sample(
    docs: DataFrame,
    per_group: int,
    group_col: str = "source",
    order_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hard per-group quota: keep at most ``per_group`` rows per
    ``group_col``, best-first by ``order_col`` (descending; ties and
    the default order break by ascending id, so the pick is fully
    deterministic).  The domain-balancing step that caps a dominant
    source before mixing — the hard-cap complement to the
    proportional/temperature samplers above.

    Ranking runs on the two-level distributed prefix sum
    (packing.prefix_sum), not a Window.partitionBy(group) — the window
    form serializes each group into one sort task, and the dominant
    source this operator EXISTS to cap is exactly the group that would
    pin a task at corpus scale.  The order key ends in the unique id,
    so rank == row_number and the kept set is identical.
    """
    from .packing import prefix_sum

    order = (
        [F.col(order_col).desc(), F.col(id_col).asc()]
        if order_col
        else [F.col(id_col).asc()]
    )
    ranked = prefix_sum(
        docs.withColumn("__one", F.lit(1)), group_col, order, "__one",
        out_col="__rk0",
    )
    return (
        ranked.filter(F.col("__rk0") < per_group)
        # prefix_sum's join-back hoists the group column to the front;
        # restore the caller's column order (public-API stability for
        # positional consumers)
        .select(*docs.columns)
    )
