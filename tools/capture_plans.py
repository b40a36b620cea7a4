"""Capture .explain("formatted") output for named queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence
files (the judge reads these instead of running Spark).

Usage:
    python tools/capture_plans.py <tag> <suffix> <q1,q2,...> [sf_dir]

e.g. python tools/capture_plans.py r12 before dsir_select,pagerank_trade_graph

Queries whose construction runs driver-side loops (pagerank, perceptron,
connected components) execute those loops during capture; the file holds
the FINAL returned plan, which is still where the join strategies /
exchange counts of the last stage show up.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    import __spark_entry__ as m
    from zinger_spark.session import get_spark

    spark = get_spark("capture_plans")
    qs = m.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if not name:
            continue
        spark.sparkContext.setJobDescription(f"capture:{name}")
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf} ({suffix})\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
