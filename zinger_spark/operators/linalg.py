"""Distributed exact linear algebra over embedding columns.

The missing prep step between raw embeddings and the ANN / semantic-
dedup / probe-training suite: PCA whitening, random-projection choice,
and drift monitoring all start from the Gram (second-moment) matrix
``G = X^T X``.  At 100 TB the right shape is classic: each partition
computes its LOCAL d x d partial with one vectorized integer matmul
(Arrow batch -> numpy int64), and only d(d+1)/2 cells per partition
cross the exchange — corpus size never appears in the shuffle.  This
is the one place Python belongs: a 2080-term per-row JVM expression
can't beat a BLAS-shaped ``X.T @ X``.

Exactness: vectors are quantized ``floor(double(x) * 2^s_bits)`` (a
power-of-two scale only shifts the IEEE exponent, so quantization is
bit-exact in every engine), and all accumulation is int64 — the oracle
(__spark_entry__) reproduces G cell-for-cell with a long-format
self-join.  Overflow headroom: |x_q| <= 2^10 * |x| and int64 carries
~9.2e18, so ~1e9 rows of unit-norm 64-dim vectors stay far inside.

The d x d result is driver-small (64-dim -> 2080 upper-triangle
cells): eigen-decomposition for PCA happens wherever you like; the
distributed part — the only part that sees the corpus — is here.

Incremental maintenance comes free from linearity: G is a sum of
per-batch partials, so persist each ingest batch's (i, j, s) frame
and ADD — a deletion batch subtracts.  No re-scan of the corpus,
ever; the same property the rollup cascade and HLL sidecar exploit.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


GRAM_SCHEMA = "i INT, j INT, s LONG"


def gram_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 1024,
) -> DataFrame:
    """Upper-triangle of the quantized Gram matrix: rows (i, j, s) with
    0 <= i <= j < dims and ``s = sum over rows of xq_i * xq_j``."""
    if scale & (scale - 1) != 0:
        raise ValueError("scale must be a power of two (exact quantization)")

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        acc = np.zeros((dims, dims), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.floor(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            if X.shape[1] != dims:
                raise ValueError(f"expected {dims}-dim vectors, got {X.shape[1]}")
            acc += X.T @ X
            seen = True
        if not seen:
            return
        iu, ju = np.triu_indices(dims)
        yield pd.DataFrame(
            {"i": iu.astype("int32"), "j": ju.astype("int32"), "s": acc[iu, ju]}
        )

    partials = df.select(vec_col).mapInPandas(kernel, schema=GRAM_SCHEMA)
    from pyspark.sql import functions as F

    return partials.groupBy("i", "j").agg(F.sum("s").cast("long").alias("s"))


def power_iteration(
    gram: DataFrame,
    dims: int,
    iterations: int = 6,
    scale: int = 1024,
) -> DataFrame:
    """Dominant eigenvector of the Gram matrix by fixed-point power
    iteration — the PCA top component, fully declarative and
    integer-exact (bit-identical across engines/partitionings, like
    pagerank_fixed_point).

    ``gram`` is the upper-triangle (i, j, s) frame from
    :func:`gram_matrix`.  The matrix is symmetrized, then normalized
    ONCE to cells in [-scale, scale] via ``(s * scale) div max|s|`` —
    that bound makes every later product ≤ dims * scale^2 (~6.7e7 at
    d=64), so the iteration never overflows int64 whatever the corpus
    size.  Per round: one matvec (join + partial-agged groupBy on the
    d^2-row frame) and a trunc-div rescale of the d-row vector by its
    max magnitude (Spark's integral ``div`` and DuckDB's ``//`` both
    truncate, so the oracle replays exactly).  All frames are d- or
    d^2-row: driver-trivial, but expressed declaratively so the same
    code runs wherever the Gram frame lives.

    Returns (i, v) with |v| <= scale; the direction converges to the
    top eigenvector (up to sign, fixed by the all-ones start).

    r12: the iteration runs ON THE DRIVER over the collected
    upper-triangle cells.  The Gram frame is d(d+1)/2 rows by SCHEMA
    (2,080 at d=64) whatever the corpus size — the module docstring's
    contract is exactly that only :func:`gram_matrix` sees the corpus —
    so the collect is bounded, and the previous declarative loop spent
    ~3 scheduler round-trips per round (matvec job + checkpoint +
    broadcast build) on d- and d^2-row frames.  The arithmetic is a
    cell-for-cell replay of the old plan: int64-exact sums (Python ints
    don't overflow at all) and trunc-toward-zero division matching
    Spark's non-ANSI ``div`` / DuckDB's ``//`` — greatest(max, 1)
    guards the all-zero matrix and all-zero rounds, both yielding the
    zero vector deterministically on every engine.

    Sparse-gram edge case (r12 advice #4): a gram frame MISSING cells
    (fewer than d(d+1)/2 rows — an empty corpus, or a hand-built
    partial matrix) is treated as zeros here, and the result always
    carries all ``dims`` rows; the pre-r12 declarative loop instead
    DROPPED dims that never appeared in the frame.  For gram_matrix
    output on a non-empty corpus the two behaviors coincide (the frame
    is dense by construction); callers feeding hand-built sparse
    matrices get the missing-cells-are-zero reading, which is the
    mathematically standard one."""

    def _trunc_div(a: int, b: int) -> int:
        # Spark `div` truncates toward zero; Python // floors.  b > 0
        # always here (greatest(max, 1)).
        return -((-a) // b) if a < 0 else a // b

    cells = gram.collect()  # bounded: d(d+1)/2 rows by schema
    g: dict[tuple[int, int], int] = {}
    for r in cells:
        g[(r["i"], r["j"])] = r["s"]
        if r["i"] != r["j"]:
            g[(r["j"], r["i"])] = r["s"]
    gmax = max((abs(s) for s in g.values()), default=0) or 1
    gn = {ij: _trunc_div(s * scale, gmax) for ij, s in g.items()}
    v = [scale] * dims
    for _ in range(iterations):
        w = [
            sum(gn.get((i, j), 0) * v[j] for j in range(dims))
            for i in range(dims)
        ]
        wmax = max((abs(x) for x in w), default=0) or 1
        v = [_trunc_div(x * scale, wmax) for x in w]
    spark = gram.sparkSession
    return spark.createDataFrame(
        [(i, v[i]) for i in range(dims)], schema="i int, v long"
    )
