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
    md5(id) % 10000 < rate * 10000 — a pure per-row hash compare.

    Scale shape: one partial-agg groupBy for source sizes (tiny — one
    row per source at any corpus size), broadcast back, then a
    scan-pipelined filter; zero wide shuffles, no RNG, no sort.
    """
    if target_total <= 0:
        raise ValueError("target_total must be > 0")
    if temperature < 0:
        raise ValueError("temperature must be >= 0")
    sizes = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    weights = sizes.withColumn("__wt", F.pow(F.col("__n").cast("double"), F.lit(float(temperature))))
    total_wt = weights.agg(F.sum("__wt").alias("__tw"))
    rates = weights.crossJoin(F.broadcast(total_wt)).select(
        source_col,
        F.least(
            F.lit(1.0),
            F.lit(float(target_total)) * (F.col("__wt") / F.col("__tw")) / F.col("__n"),
        ).alias("__rate"),
    )
    h = md5_hash60(F.col(id_col).cast("string"))
    return (
        df.join(F.broadcast(rates), source_col)
        .filter((h % 10000).cast("double") < F.col("__rate") * 10000)
        .drop("__rate")
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
