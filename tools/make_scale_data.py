"""Generate a scaled-up copy of a driver testdata dir for scale-stress runs.

VERDICT r5 ask #5: the 100-TB claims rested on plan shapes alone — this
tool manufactures a ~Nx dataset (default 10x sf0.1 ~= sf1) so bench.py
can measure per-query scaling exponents, not just absolute times.

Construction: each large table is replicated ``--copies`` times with all
surrogate/foreign keys offset by ``copy * (max_key + 1)`` so every join
relationship (orders->lineitem, part/supplier->lineitem,
customer->orders) is preserved copy-locally; the tiny dims
``region``/``nation`` are kept single-copy and referenced unchanged.
Copy 0 is byte-identical to the source, so sf0.1 results are a strict
subset of the scaled corpus.

Two tables need more than key offsets, because exact cross-copy clones
would make pairwise workloads (near-dup, ANN buckets) grow O(copies^2)
by construction rather than exposing the engine's scaling:

- ``documents``: for copy > 0 every whitespace token is replaced by a
  deterministic copy-salted hash token.  Token equality WITHIN a copy is
  preserved bijectively (same token -> same hash), so shingle sets,
  exact-dup groups, jaccard similarities, and token-frequency shapes are
  all isometric to the original corpus — while copies share no tokens,
  so cross-copy candidate pairs are (correctly) zero.
- ``embeddings``: for copy > 0 each vector is multiplied element-wise by
  a copy-dependent +-1 sign pattern (a diagonal orthogonal transform).
  Inner products within a copy are exactly preserved (<Sx,Sy> = <x,y>),
  so per-copy cluster/dup structure matches the source, while cross-copy
  vectors decorrelate to ~0 cosine.

Everything is plain Spark SQL expressions — no UDFs, one shuffle-free
pass per table.  Output goes OUTSIDE the repo (default /tmp/scale/sf1);
testdata itself is never touched.

Usage:
    python tools/make_scale_data.py [--src /root/testdata/sf0.1] \
        [--out /tmp/scale/sf1] [--copies 10]
    SPARK_GRAFT_SF_DIR=/tmp/scale/sf1 SPARK_GRAFT_BENCH_REPS=1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from zinger_spark.session import get_spark  # noqa: E402

# table -> (key columns to offset, target output partitions at 10x)
OFFSET_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
PARTS = {"lineitem": 32, "orders": 16, "events": 8}


def _replicate(df: DataFrame, spans: dict[str, int], copies: int) -> DataFrame:
    """Cross the table with copy ids 0..copies-1 and offset its keys."""
    reps = F.broadcast(
        df.sparkSession.range(copies).select(F.col("id").cast("int").alias("_copy"))
    )
    out = df.crossJoin(reps)
    for col, span in spans.items():
        dtype = dict(df.dtypes)[col]
        out = out.withColumn(
            col, (F.col(col) + F.col("_copy").cast("long") * span).cast(dtype)
        )
    return out


def _salt_documents(df: DataFrame) -> DataFrame:
    """Copy-salted token hashing for copy > 0 (see module docstring)."""
    salted = (
        "array_join(transform(split(text, ' '), t -> "
        "conv(substr(md5(concat(t, '#', CAST(_copy AS STRING))), 1, 12), 16, 36)"
        "), ' ')"
    )
    return df.withColumn(
        "text", F.when(F.col("_copy") == 0, F.col("text")).otherwise(F.expr(salted))
    ).withColumn("n_chars", F.length("text").cast("long"))


def _flip_embeddings(df: DataFrame) -> DataFrame:
    """Diagonal +-1 transform per copy: isometric within, decorrelated across."""
    flipped = (
        "transform(embedding, (x, j) -> CAST(x * CAST("
        "CASE WHEN pmod(hash(_copy, j), 2) = 0 THEN 1 ELSE -1 END AS FLOAT"
        ") AS FLOAT))"
    )
    return df.withColumn(
        "embedding",
        F.when(F.col("_copy") == 0, F.col("embedding")).otherwise(F.expr(flipped)),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("make_scale_data")
    t_start = time.time()
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ):
        src = spark.read.parquet(f"{args.src}/{name}.parquet")
        cols = src.columns
        if name in OFFSET_KEYS:
            spans = {
                c: int(src.agg(F.max(c)).first()[0]) + 1 for c in OFFSET_KEYS[name]
            }
            out = _replicate(src, spans, args.copies)
            if name == "documents":
                out = _salt_documents(out)
            elif name == "embeddings":
                out = _flip_embeddings(out)
            out = out.select(*cols).repartition(PARTS.get(name, 4))
        else:
            out = src  # tiny dims stay single-copy
        dest = f"{args.out}/{name}.parquet"
        out.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{name}: {n} rows -> {dest}", file=sys.stderr)
    print(
        f"done in {time.time() - t_start:.1f}s: {args.out} "
        f"({args.copies}x {args.src})",
        file=sys.stderr,
    )
    spark.stop()


if __name__ == "__main__":
    main()
