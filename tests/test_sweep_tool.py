"""tools/sweep.py — the chunked multi-SF oracle sweep runner.

Pure-Python tests (no Spark): the line parser must classify every
output shape tools/compare.py emits, and the resume logic must re-run
exactly the unfinished/failed keys.  A sweep that silently mis-parses a
FAIL as missing would report CRASH (loud) — but one that dropped the
key entirely would under-report, which is what these pins prevent.
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "sweep", os.path.join(REPO, "tools", "sweep.py")
)
sweep = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sweep)


def parse(out: str, keys: list[str]) -> dict:
    results = {}
    for line in out.splitlines():
        m = sweep.LINE.match(line)
        if not m:
            continue
        status, name, detail = m.groups()
        if name in keys:
            results[name] = {"status": status, "detail": detail.strip()}
    return results


def test_parses_every_compare_line_shape():
    out = "\n".join(
        [
            "PASS grouped_agg (0.7s, 5 rows)",
            "FAIL broken_q (1.2s): hash aaaa != bbbb",
            "FAIL crashed_q: spark error: boom (x)",
            "SKIP image_dup_pairs: oracle pinned to sf0.01 (running /tmp/scale/sf1)",
            "SKIP rows_only_q: no oracle (rows-only) rows=17",
            "   spark-only: [('1',)]",  # diff samples must not parse
            "175 keys, 3 to run, 3 sf-pinned",  # banner must not parse
        ]
    )
    keys = ["grouped_agg", "broken_q", "crashed_q", "image_dup_pairs", "rows_only_q"]
    got = parse(out, keys)
    assert got["grouped_agg"]["status"] == "PASS"
    assert "5 rows" in got["grouped_agg"]["detail"]
    assert got["broken_q"]["status"] == "FAIL"
    assert "hash" in got["broken_q"]["detail"]
    assert got["crashed_q"]["status"] == "FAIL"
    assert got["image_dup_pairs"]["status"] == "SKIP"
    assert got["rows_only_q"]["status"] == "SKIP"
    assert len(got) == 5


def test_keys_not_in_chunk_are_ignored():
    # a query name mentioned inside another key's FAIL detail must not
    # be attributed a result
    out = "FAIL q_a (0.1s): cols ['q_b'] != ['x']"
    got = parse(out, ["q_a"])
    assert list(got) == ["q_a"]


def test_resume_reruns_only_missing_and_failed(tmp_path):
    state = {
        "sf_dir": "/tmp/scale/sf1",
        "results": {
            "done_ok": {"status": "PASS", "detail": ""},
            "done_skip": {"status": "SKIP", "detail": ""},
            "done_fail": {"status": "FAIL", "detail": "hash"},
            "done_crash": {"status": "CRASH", "detail": ""},
        },
    }
    out = tmp_path / "s.json"
    out.write_text(json.dumps(state))
    prev = json.loads(out.read_text())
    keys = ["done_ok", "done_skip", "done_fail", "done_crash", "new_key"]

    # mirror sweep.main's resume filter, both modes
    def todo(retry_fails):
        t = []
        for k in keys:
            got = prev["results"].get(k)
            if got is None:
                t.append(k)
            elif retry_fails and got["status"] not in ("PASS", "SKIP"):
                t.append(k)
        return t

    assert todo(retry_fails=False) == ["new_key"]
    assert todo(retry_fails=True) == ["done_fail", "done_crash", "new_key"]
