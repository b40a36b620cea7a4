"""Distributed Gram matrix (operators/linalg.py) vs single-machine
numpy — must be EQUAL (int64 accumulation), any partitioning."""

import numpy as np
import pytest

from zinger_spark.operators.linalg import gram_matrix


def _vecs(rng, n, d):
    return [[float(rng.uniform(-1, 1)) for _ in range(d)] for _ in range(n)]


def _ref(vecs, d, scale):
    X = np.floor(np.array(vecs, dtype=np.float64) * scale).astype(np.int64)
    G = X.T @ X
    iu, ju = np.triu_indices(d)
    return {(int(i), int(j)): int(G[i, j]) for i, j in zip(iu, ju)}


def test_gram_equals_numpy_any_partitioning(spark):
    import random

    rng = random.Random(5)
    d = 8
    vecs = _vecs(rng, 200, d)
    df = spark.createDataFrame([(v,) for v in vecs], ["embedding"])
    want = _ref(vecs, d, 1024)
    for frame in (df.coalesce(1), df.repartition(7)):
        got = {
            (r["i"], r["j"]): r["s"]
            for r in gram_matrix(frame, dims=d, scale=1024).collect()
        }
        assert got == want


def test_gram_rejects_bad_scale_and_dims(spark):
    df = spark.createDataFrame([([0.1, 0.2],)], ["embedding"])
    with pytest.raises(ValueError):
        gram_matrix(df, dims=2, scale=1000)
    with pytest.raises(Exception):
        gram_matrix(df, dims=3).collect()


def test_power_iteration_finds_top_component(spark):
    import random

    from zinger_spark.operators.linalg import power_iteration

    rng = random.Random(21)
    d = 6
    # dominant direction e0 - e2
    vecs = [
        [a, rng.gauss(0, 0.02), -a, rng.gauss(0, 0.02),
         rng.gauss(0, 0.02), rng.gauss(0, 0.02)]
        for a in (rng.uniform(-1, 1) for _ in range(250))
    ]
    df = spark.createDataFrame([(v,) for v in vecs], ["embedding"])
    g = gram_matrix(df, dims=d, scale=1024)
    got = {r["i"]: r["v"] for r in power_iteration(g, dims=d, iterations=8).collect()}
    v = np.array([got[i] for i in range(d)], dtype=np.float64)
    v = v / np.linalg.norm(v)
    want = np.zeros(d)
    want[0], want[2] = 1 / np.sqrt(2), -1 / np.sqrt(2)
    align = abs(float(v @ want))
    assert align > 0.99, (v, align)

    # engine-determinism: same integers from a different partitioning
    g2 = gram_matrix(df.repartition(5), dims=d, scale=1024)
    got2 = {r["i"]: r["v"] for r in power_iteration(g2, dims=d, iterations=8).collect()}
    assert got == got2


def test_gram_drives_pca(spark):
    # the intended composition: distributed G, driver-side eigen
    import random

    rng = random.Random(9)
    d = 4
    # anisotropic cloud: dominant direction e0+e1
    vecs = [
        [a + rng.gauss(0, 0.01), a + rng.gauss(0, 0.01),
         rng.gauss(0, 0.01), rng.gauss(0, 0.01)]
        for a in (rng.uniform(-1, 1) for _ in range(300))
    ]
    df = spark.createDataFrame([(v,) for v in vecs], ["embedding"])
    rows = gram_matrix(df, dims=d, scale=1024).collect()
    G = np.zeros((d, d))
    for r in rows:
        G[r["i"], r["j"]] = r["s"]
        G[r["j"], r["i"]] = r["s"]
    w, v = np.linalg.eigh(G)
    top = v[:, -1]
    top = top / np.sign(top[0])
    assert abs(top[0]) > 0.6 and abs(top[1]) > 0.6  # ~ (1,1)/sqrt(2)
    assert abs(top[2]) < 0.1 and abs(top[3]) < 0.1


def test_power_iteration_zero_matrix_yields_zero_vector(spark):
    from zinger_spark.operators.linalg import power_iteration

    df = spark.createDataFrame([([0.0, 0.0, 0.0],)] * 5, ["embedding"])
    g = gram_matrix(df, dims=3, scale=1024)
    got = {r["i"]: r["v"] for r in power_iteration(g, dims=3, iterations=2).collect()}
    # degenerate input: deterministic zero vector, never NULLs (Spark
    # div-by-zero NULLs) or an engine error (DuckDB raises)
    assert got == {0: 0, 1: 0, 2: 0}
