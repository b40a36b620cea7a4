"""Vector math over array<float|double> embedding columns.

All JVM-side higher-order functions (zip_with / aggregate) — sequential
left-fold in double precision, which matches DuckDB's list functions
operation-for-operation so oracle comparisons are exact.

Scale note: per-row O(d) work, no shuffle; a 100-TB embedding table
streams through these inside whole-stage codegen.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

from pyspark.sql import Column, functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def let(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Bind ``col`` once and evaluate ``fn(bound)`` — a let-expression
    via a single-element-array ``transform`` (Spark SQL has no native
    let).  Higher-order subtrees are interpreted, outside codegen
    common-subexpression elimination, so an expression referenced k
    times is otherwise EVALUATED k times (r12: the ivf argmax paid
    3k O(d) folds per row instead of k+1)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def fold_norm(vec: Sequence[float]) -> float:
    """Python replay of ``norm()`` over a literal vector: the same
    sequential left fold in IEEE double (0.0 + x0*x0 + x1*x1 ...,
    then a correctly-rounded sqrt), so the value is bit-identical to
    evaluating the JVM expression — but computed once at plan time
    instead of per row."""
    acc = 0.0
    for x in vec:
        x = float(x)
        acc = acc + x * x
    return math.sqrt(acc)


def cosine_lit(vec: Column, query_vec: Sequence[float]) -> Column:
    """cosine(vec, literal query) with the two plan-knowable savings:
    the query norm is folded at plan time (``fold_norm``, bit-identical)
    and the vec cast is let-bound so it runs once instead of twice
    (dot + norm).  Float semantics are exactly ``cosine()``'s: same
    ops, same order."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = F.lit(fold_norm(query_vec))
    return let(
        as_double(vec),
        lambda v: F.aggregate(
            F.zip_with(v, q, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
            * qn
        ),
    )


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
