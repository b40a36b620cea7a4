"""Compute per-query scaling exponents from bench.py runs at several
scale factors.

Usage:
    python tools/scaling_report.py sf0.1=/tmp/bench_sf0.1.json \
        sf0.2=/tmp/bench_sf0.2.json sf0.5=/tmp/bench_sf0.5.json \
        sf1=/tmp/bench_sf1.json

For each query, fits log(t) = a + b*log(sf) by least squares over the
provided points and prints the exponent b (1.0 = linear scaling, the
ideal for scan-bound work; <1 = fixed overhead still dominating; >>1 =
superlinear — a pairwise blowup or a shuffle that stopped fitting).
Markdown table to stdout.
"""

from __future__ import annotations

import json
import math
import sys


def main(argv: list[str]) -> int:
    runs: list[tuple[float, dict]] = []
    for arg in argv:
        name, path = arg.split("=", 1)
        sf = float(name.replace("sf", ""))
        with open(path) as f:
            runs.append((sf, json.load(f)))
    runs.sort()
    if len(runs) < 2:
        print("need >= 2 runs", file=sys.stderr)
        return 1
    keys = [k for k in runs[0][1]["queries"] if all(k in r[1]["queries"] for r in runs)]
    print("| query | " + " | ".join(f"t(sf{r[0]:g})" for r in runs) + " | exponent |")
    print("|---|" + "---|" * (len(runs) + 1))
    rows = []
    for k in keys:
        xs = [math.log(r[0]) for r in runs]
        ys = [math.log(max(r[1]["queries"][k], 1e-3)) for r in runs]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        rows.append((b, k, [r[1]["queries"][k] for r in runs]))
    for b, k, ts in sorted(rows, reverse=True):
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| {k} | {cells} | {b:+.2f} |")
    tot = [(r[0], r[1]["value"]) for r in runs]
    xs = [math.log(s) for s, _ in tot]
    ys = [math.log(t) for _, t in tot]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum((x - mx) ** 2 for x in xs)
    cells = " | ".join(f"{t:.2f}" for _, t in tot)
    print(f"| **total** | {cells} | {b:+.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
