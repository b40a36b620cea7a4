"""Z-order (Morton) interleaved sort keys for multi-dimensional
clustering.

`compact --sort-by col` clusters a pool on ONE column: file-level
min/max zone maps prune reads on that column only, and a second
filter column's ranges stay full-width in every file.  The Z-order
curve fixes this the way Delta's OPTIMIZE ZORDER BY does: scale each
dimension to a small fixed-width integer, interleave the bits, sort
by the result — points close on the curve are close in EVERY
dimension, so per-file min/max ranges narrow on all participating
columns at once and multi-predicate scans prune multiplicatively.

Everything here is a pure JVM integer expression (shift/mask/sum —
whole-stage codegen, no Python, no shuffle beyond the clustering
range-exchange the caller already pays), and deterministic: the same
rows produce the same key on any engine, which is what lets the
registry oracle replay the key bit-for-bit in DuckDB.

Scaling is linear min/max to ``2^bits`` buckets with trunc division —
coarse on skewed data (quantile scaling would equalize bucket
populations) but zone maps only need MONOTONIC bucketing to work, and
min/max scaling keeps the key a closed-form expression both engines
evaluate identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def scaled_expr(col: str, vmin: str, vmax: str, bits: int) -> str:
    """SQL text: ``col`` linearly scaled to [0, 2^bits) using the
    (column-expression) bounds ``vmin``/``vmax``; constant columns
    (vmax == vmin) collapse to bucket 0.  All-integer trunc division.
    Headroom: the intermediate ``(v - min) * (2^bits - 1)`` needs
    ``range * 255 < 2^63`` at the default bits=8 — i.e. a value RANGE
    under ~3.6e16, far above any realistic clustering key (ids,
    cents, epochs); pre-bucket wider domains first."""
    top = (1 << bits) - 1
    return (
        f"CASE WHEN ({vmax}) = ({vmin}) THEN CAST(0 AS BIGINT) "
        f"ELSE CAST((({col}) - ({vmin})) * {top} AS BIGINT) "
        f"div CAST(({vmax}) - ({vmin}) AS BIGINT) END"
    )


def interleave_sql(scaled: list[str], bits: int, dialect: str = "spark") -> str:
    """Bit-interleave ``n`` pre-scaled bigint expressions (each in
    [0, 2^bits)) into one Morton key: output bit ``b*n + c`` is bit
    ``b`` of column ``n-1-c`` — column 0 gets the most significant
    position within each group, the conventional z-curve layout."""
    n = len(scaled)
    terms = []
    for b in range(bits):
        for c, e in enumerate(scaled):
            pos = b * n + (n - 1 - c)
            if dialect == "spark":
                terms.append(f"shiftleft(shiftright({e}, {b}) & 1, {pos})")
            else:
                # fully parenthesized: SQL `<<` binds LOOSER than `+`,
                # so a bare `x << p + y` would parse as `x << (p + y)`
                terms.append(f"(((({e}) >> {b}) & 1) << {pos})")
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    key_col: str = "_zkey",
) -> DataFrame:
    """Append the Morton key over ``cols`` (numeric).  One aggregate
    pass computes the per-column bounds, broadcast back as a 1-row
    cross join — fully declarative, no driver collect."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns (use a plain sort for 1)")
    bounds = df.agg(
        *[F.min(c).cast("long").alias(f"_mn{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"_mx{i}") for i, c in enumerate(cols)],
    )
    out = df.crossJoin(F.broadcast(bounds))
    # project the scaled buckets ONCE, then interleave the small
    # references — inlining the CASE into every bit term multiplies
    # the expression tree by bits * n
    for i, c in enumerate(cols):
        # c is a column EXPRESSION (nested paths like value.a work)
        out = out.withColumn(
            f"_zs{i}",
            F.expr(scaled_expr(f"CAST({c} AS BIGINT)", f"_mn{i}", f"_mx{i}", bits)),
        )
    z = interleave_sql([f"_zs{i}" for i in range(len(cols))], bits, "spark")
    return out.withColumn(key_col, F.expr(f"CAST({z} AS BIGINT)")).drop(
        *[f"_mn{i}" for i in range(len(cols))],
        *[f"_mx{i}" for i in range(len(cols))],
        *[f"_zs{i}" for i in range(len(cols))],
    )


# (cross-engine parity note: a consumer replaying the key in another
# SQL dialect should mirror with_zorder_key's two-step shape — compute
# the per-column bounds once, project the scaled buckets with
# `scaled_expr`-equivalent arithmetic, then `interleave_sql` the small
# projected references.  Inlining bounds subqueries into the scaled
# CASE would get repeated `bits` times by the interleave.  The
# registry oracle __spark_entry__._sql_zorder_key is the worked
# example.)
