"""mixture_sample: deterministic temperature-weighted source mixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zinger_spark.operators.sampling import mixture_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def by_source(df):
    return {r.source: r.n for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()}


def test_t1_is_proportional(docs):
    got = by_source(mixture_sample(docs, target_total=200, temperature=1.0))
    # budgets 180/20; hash keep is approximate but unbiased
    assert 150 <= got["big"] <= 210
    assert 10 <= got.get("small", 0) <= 32


def test_t0_equalizes(docs):
    got = by_source(mixture_sample(docs, target_total=200, temperature=0.0))
    # equal budgets: 100 each; small source is fully kept (rate 1)
    assert got["small"] == 100
    assert 75 <= got["big"] <= 125


def test_deterministic(docs):
    a = {r.doc_id for r in mixture_sample(docs, 150, 0.5).collect()}
    b = {r.doc_id for r in mixture_sample(docs, 150, 0.5).collect()}
    assert a == b and a


def test_validation(docs):
    with pytest.raises(ValueError):
        mixture_sample(docs, 0)
    with pytest.raises(ValueError):
        mixture_sample(docs, 10, temperature=-1)
