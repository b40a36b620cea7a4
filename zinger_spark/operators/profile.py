"""Table profiling: per-column stats in one declarative pass.

The data-quality readout every ingest pipeline runs before training:
row/null/distinct counts and min/max per column.  Shape: ONE union of
per-column aggregate subtrees — each subtree's parquet scan is pruned
to its single column (total IO = every column read once, the same as
one full-width scan, but each leg shuffles only its own partial-agg
row plus its distinct keys) and the legs run in parallel.  No Python,
no collect; the result is |columns| rows.

Exact ``countDistinct`` is deliberate: per-column distinct shuffles
that column's key set, the honest cost of an exact answer.  For the
sketch path at 100 TB — bounded 4096-register exchanges instead —
compose with operators/sketches.hll_estimate per column (the
`hll_distinct` registry key shows the shape); the stats legs here are
bounded-shuffle regardless.

Output schema (uniform across column types):
  column_name, n_rows, n_null, n_distinct  — bigint
  min_num, max_num                    — double (numeric columns)
  min_str, max_str                    — string (string columns;
                                        timestamps formatted
                                        'yyyy-MM-dd HH:mm:ss')
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")
_TEMPORAL = ("timestamp", "timestamp_ntz", "date")
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One profile row per column (see module docstring)."""
    dtypes = dict(df.dtypes)
    cols = list(cols or df.columns)
    legs = []
    for c in cols:
        t = dtypes[c]
        base = t.split("(")[0]
        if base in _NUMERIC:
            mn = F.min(c).cast("double")
            mx = F.max(c).cast("double")
            ms = F.lit(None).cast("string")
            leg_minmax = [mn.alias("min_num"), mx.alias("max_num"),
                          ms.alias("min_str"), ms.alias("max_str")]
        elif base in _TEMPORAL:
            nn = F.lit(None).cast("double")
            leg_minmax = [
                nn.alias("min_num"), nn.alias("max_num"),
                F.date_format(F.min(c), _TS_FMT).alias("min_str"),
                F.date_format(F.max(c), _TS_FMT).alias("max_str"),
            ]
        else:
            nn = F.lit(None).cast("double")
            leg_minmax = [
                nn.alias("min_num"), nn.alias("max_num"),
                F.min(c).cast("string").alias("min_str"),
                F.max(c).cast("string").alias("max_str"),
            ]
        legs.append(
            df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_null"),
                F.countDistinct(c).cast("long").alias("n_distinct"),
                *leg_minmax,
            ).select(F.lit(c).alias("column_name"), "*")
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
