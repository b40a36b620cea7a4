"""Vector math over array<float|double> embedding columns.

All JVM-side higher-order functions (zip_with / aggregate) — sequential
left-fold in double precision, which matches DuckDB's list functions
operation-for-operation so oracle comparisons are exact.

Scale note: per-row O(d) work, no shuffle; a 100-TB embedding table
streams through these inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(vec: Column, dims: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7)) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: the sign bits of the
    chosen dimensions packed into one string key. Deterministic and
    SQL-expressible; for production use seeded gaussian hyperplanes."""
    bits = [
        F.when(F.element_at(as_double(vec), d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)
