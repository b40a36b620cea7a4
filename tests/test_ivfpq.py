"""IVF-PQ: product-quantization training/encoding/ADC in fixed-point
integers (Jégou'11), the persisted compressed index, and exact
re-ranking.  Determinism is the contract: same input -> bit-identical
codebooks, codes, and ADC distances whatever the partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zinger_spark.operators.similarity import (
    brute_force_topk,
    build_ivfpq_index,
    ivfpq_index_topk,
    ivfpq_rerank_topk,
    pq_adc_table,
    pq_adc_topk,
    pq_encode,
    pq_train,
)

DIMS, M, KSUB = 8, 2, 4


def _vecs(spark, n=64, parts=1):
    df = spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {DIMS - 1}), "
        "j -> CAST(sin(id * 7 + j * 13) AS DOUBLE)) AS embedding",
    )
    return df.repartition(parts) if parts > 1 else df


def test_pq_train_deterministic_across_partitionings(spark):
    a = pq_train(_vecs(spark, parts=1), m=M, ksub=KSUB, iterations=2, dims=DIMS)
    b = pq_train(_vecs(spark, parts=7), m=M, ksub=KSUB, iterations=2, dims=DIMS)
    rows = lambda df: sorted(tuple(r) for r in df.collect())
    assert rows(a) == rows(b)
    # shape: m * ksub * subdim centroid entries at most (empty clusters may drop)
    assert len(rows(a)) <= M * KSUB * (DIMS // M)


def test_pq_encode_and_adc_self_distance(spark):
    """A vector's ADC distance when IT IS the query must be <= any
    other vector's (the lookup table is exact per sub-centroid): check
    the query vector itself ranks first."""
    df = _vecs(spark)
    books = pq_train(df, m=M, ksub=KSUB, iterations=2, dims=DIMS)
    codes = pq_encode(df, books, m=M, dims=DIMS)
    assert codes.count() == 64 * M
    qv = [r["embedding"] for r in df.filter(F.col("vec_id") == 5).collect()][0]
    adc = pq_adc_table(spark, books, qv, m=M, dims=DIMS)
    assert adc.count() <= M * KSUB
    top = pq_adc_topk(codes, adc, k=64)
    ranked = [r["vec_id"] for r in top.collect()]
    dists = {r["vec_id"]: r["adc_dist"] for r in top.collect()}
    assert dists[5] == min(dists.values())
    assert all(isinstance(d, int) for d in dists.values())  # exact ints


def test_ivfpq_index_round_trip_and_pruning(spark, tmp_path):
    df = _vecs(spark)
    cents = [r["embedding"] for r in df.filter(F.col("vec_id") < 4).collect()]
    books = pq_train(df, m=M, ksub=KSUB, iterations=2, dims=DIMS)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(df, cents, books, idx, m=M, dims=DIMS)
    out = ivfpq_index_topk(spark, idx, cents[1], k=5, n_probe=2, m=M, dims=DIMS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ivf_cell" in plan  # probed cells only
    got = out.collect()
    assert len(got) == 5
    # querying WITH a centroid: its own cell is probed first, and the
    # centroid vector itself (vec_id 1) must surface
    assert 1 in {r["vec_id"] for r in got}


def test_ivfpq_rerank_matches_exact_on_candidates(spark, tmp_path):
    """With n_candidates = corpus size and all cells probed, the
    re-ranked answer must equal the exact brute-force top-k — the
    compression drops out entirely."""
    df = _vecs(spark)
    cents = [r["embedding"] for r in df.filter(F.col("vec_id") < 4).collect()]
    books = pq_train(df, m=M, ksub=KSUB, iterations=2, dims=DIMS)
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(df, cents, books, idx, m=M, dims=DIMS)
    qv = [r["embedding"] for r in df.filter(F.col("vec_id") == 9).collect()][0]
    rer = ivfpq_rerank_topk(
        spark, idx, df, qv, k=10, n_candidates=64, n_probe=4, m=M, dims=DIMS
    )
    exact = brute_force_topk(df, qv, k=10)
    assert [tuple(r) for r in rer.collect()] == [tuple(r) for r in exact.collect()]


def test_pq_train_rejects_indivisible_dims(spark):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(_vecs(spark), m=3, dims=DIMS)
