"""Similarity search over embedding columns (array<float>).

  brute_force_topk   exact cosine top-k against a query vector —
                     narrow map + TakeOrderedAndProject (no shuffle of
                     the corpus; driver receives only k rows)
  lsh_topk           sign-bucket LSH: restrict the scan to the query's
                     bucket — at scale, bucket becomes a partition/
                     cluster key so the scan prunes to ~1/2^b of files
  embedding_dup_pairs  near-duplicate vector pairs via bucketed join

Cosine is a sequential double-precision fold (functions/vector.py), so
DuckDB's list functions reproduce scores exactly; rank outputs avoid
float comparison entirely.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import as_double, cosine, sign_bucket


def _query_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vec])


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine. orderBy+limit compiles to a per-partition
    top-k + single merge (TakeOrderedAndProject) — the right plan at any
    corpus size. Ties broken by id for determinism."""
    q = _query_lit(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 8).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6, 7),
) -> DataFrame:
    """Approximate top-k: search only the query's sign-LSH bucket.

    The bucket predicate is a plain column filter — when the table is
    written partitioned/clustered by bucket, this prunes the scan to
    one bucket (the IVF-style scale path)."""
    qbits = "".join("1" if float(query_vec[d]) >= 0 else "0" for d in dims)
    q = _query_lit(query_vec)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).filter(F.col("bucket") == qbits)
    scored = bucketed.select(
        F.col(id_col), F.round(cosine(F.col(vec_col), q), 8).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dims: tuple[int, ...] = (0, 1, 2, 3),
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold).

    Candidates come from an equi-join on the sign-LSH bucket, never a
    cross join. Note the recall caveat: true near-dups split across a
    sign boundary are missed — standard multi-probe mitigates; kept
    single-probe here for determinism."""
    b = df.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("v"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    left = b.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    right = b.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("score", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("score") >= threshold)
        .select("a", "b")
    )
