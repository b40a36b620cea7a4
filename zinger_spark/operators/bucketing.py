"""Bucketed-table co-located joins: the zero-shuffle join path at scale.

The reference's pools are single-sorted streams consumed serially
(fifo/lake.go:22,36-39), so it never needs distributed join placement.
At 100 TB, repeated equi-joins on the same key (orders ⋈ lineitem on
orderkey every ETL run; pool ⋈ done-markers on offset) should not
re-shuffle both sides each run: writing both tables bucketed (and
sorted) by the join key lets Spark's bucketed scan feed a SortMergeJoin
with NO Exchange on either side — the join cost collapses to a
streaming merge of co-located files.

Pattern notes (100 TB):
  - bucket counts must MATCH (or divide evenly with
    spark.sql.bucketing.coalesceBucketsInJoin.enabled) across tables
  - choose buckets so each bucket file lands in the 100-500 MB range
    after compression: ~100 TB / 256 MB ≈ 400k buckets is too many
    for one table — bucket per partition (e.g. by day) instead
  - sortBy(key) upgrades the merge to skip the per-bucket sort
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) table in the
    session catalog. Bucketing metadata only survives saveAsTable —
    plain .parquet(path) writes lose it."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the plan contains no Exchange (verified by
    test_bucketed_join_has_no_shuffle)."""
    return spark.table(left_table).join(
        spark.table(right_table), [on] if isinstance(on, str) else list(on), how
    )
