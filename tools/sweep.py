"""Full-registry oracle sweep at an arbitrary SF, chunked for robustness.

VERDICT r8 ask #1: the hash-exact gate runs at sf0.01; every
cap-parameterized operator (``max_bucket``, ``max_df``, hot-fp caps) is
exactly where a larger SF can silently diverge from a brute-force
oracle.  This tool replays EVERY ``queries()``/``oracle_sql()`` pair at
a bigger SF (default the /tmp/scale/sf1 corpus from
``tools/make_scale_data.py``) and records a machine-readable result per
key.

Why chunked subprocesses instead of one long compare.py run: a single
JVM accumulating 170+ heavy queries' worth of checkpoint/broadcast
blocks at sf1 is exactly the leak class that OOMed the sf3 bench
(bench.py::_release_leaked_blocks); fresh processes every N keys make
the sweep restartable and leak-immune.  Progress is checkpointed to the
output JSON after every chunk, so a re-run resumes where it stopped.

Usage:
    python tools/sweep.py [--sf-dir /tmp/scale/sf1] \
        [--out SWEEP_SF1.json] [--chunk 12] [--only k1,k2] [--retry-fails]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(r"^(PASS|FAIL|SKIP) (\S+?):? (.*)$")


def registry_keys():
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    return list(entrymod.queries()), getattr(entrymod, "ORACLE_SF_PINNED", {})


def run_chunk(sf_dir, keys, timeout, log_path=None):
    """Run one compare.py subprocess; stdout streams to ``log_path`` so
    a long-running heavy chunk is observable mid-flight."""
    cmd = [sys.executable, "-u",
           os.path.join(REPO, "tools", "compare.py"), sf_dir, *keys]
    t0 = time.time()
    log_path = log_path or os.path.join("/tmp", "sweep_chunk.log")
    with open(log_path, "w") as lf:
        try:
            subprocess.run(
                cmd, stdout=lf, stderr=subprocess.STDOUT, text=True,
                timeout=timeout, cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            lf.write("\n# CHUNK TIMEOUT")
    with open(log_path) as lf:
        out = lf.read()
    results = {}
    for line in out.splitlines():
        m = LINE.match(line)
        if not m:
            continue
        status, name, detail = m.groups()
        if name in keys:
            results[name] = {"status": status, "detail": detail.strip()}
    for k in keys:
        results.setdefault(
            k, {"status": "CRASH", "detail": f"no result line (chunk {time.time()-t0:.0f}s)"}
        )
    return results, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/scale/sf1")
    ap.add_argument("--out", default=os.path.join(REPO, "SWEEP_SF1.json"))
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="",
                    help="comma-separated keys to leave out of this run "
                         "(e.g. the quadratic-oracle pair keys swept at a "
                         "smaller SF instead)")
    ap.add_argument("--retry-fails", action="store_true",
                    help="re-run keys whose recorded status is not PASS/SKIP")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    keys, pinned = registry_keys()
    if args.only:
        keys = [k for k in keys if k in set(args.only.split(","))]
    if args.skip:
        skip = set(args.skip.split(","))
        keys = [k for k in keys if k not in skip]

    state = {"sf_dir": args.sf_dir, "results": {}, "started": time.time()}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("sf_dir") == args.sf_dir:
            state["results"] = prev.get("results", {})

    todo = []
    for k in keys:
        got = state["results"].get(k)
        if got is None:
            todo.append(k)
        elif args.retry_fails and got["status"] not in ("PASS", "SKIP"):
            todo.append(k)
    print(f"{len(keys)} keys, {len(todo)} to run, {len(pinned)} sf-pinned")

    for i in range(0, len(todo), args.chunk):
        chunk = todo[i : i + args.chunk]
        print(f"--- chunk {i//args.chunk + 1}: {chunk[0]}..{chunk[-1]}", flush=True)
        results, raw = run_chunk(
            args.sf_dir, chunk, args.timeout,
            log_path=args.out + f".chunk{i//args.chunk + 1}.log",
        )
        state["results"].update(results)
        for k in chunk:
            r = state["results"][k]
            print(f"  {r['status']} {k}: {r['detail'][:120]}", flush=True)
        counts = {}
        for r in state["results"].values():
            counts[r["status"]] = counts.get(r["status"], 0) + 1
        state["counts"] = counts
        state["updated"] = time.time()
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1, sort_keys=True)
        os.replace(tmp, args.out)
    print(json.dumps(state.get("counts", {})))


if __name__ == "__main__":
    main()
