"""Transaction-log table format for pools (the Delta/Iceberg seam).

The default pool layout publishes whole COMMIT DIRECTORIES through a
manifest; readers hand Spark directory paths and rely on parquet
row-group stats for pruning only after file listing.  A 100-TB
deployment uses a log of per-FILE actions instead (Delta's
``_delta_log/N.json``, Iceberg's manifests): each committed data file
is recorded with its row count and column min/max stats, so

  - visibility is one atomic log append (no rename of data bytes —
    object-store native, same win as the ``rename_is_copy`` path),
  - an offset- or topic-scoped read prunes FILES driver-side from the
    log's stats before Spark lists or opens anything,
  - compaction/vacuum are log operations (add+remove actions) with the
    same read-isolation the manifest gives commit dirs.

Format: ``_log/<20-digit version>.json``, one JSON object per entry:

    {"version": N, "commit": "commit-<ms>-<rand>", "ts": <epoch>,
     "add": [{"path": "<pool-relative>", "records": n,
              "stats": {"kafka.offset": [lo, hi],
                        "kafka.topic":  [lo, hi], ...}}],
     "remove": ["<pool-relative>", ...],
     "floor": "commit-..."}        # optional: as-of floor (compaction)

Entries replay in version order; a file is live if added and not later
removed.  Stats come from the parquet FOOTERS (pyarrow, driver-side —
footer-only reads, no data IO; at real scale the executors that wrote
the files report the same stats back through the commit service, which
is exactly Delta's protocol).  Reference parity: the pool surface
(LoadBatch / ordered reads / offset bookkeeping, fifo/lake.go:58-92)
is unchanged — this module only swaps HOW bytes become visible.
"""

from __future__ import annotations

import os
import time
import uuid

LOG_DIR = "_log"

# stats columns recorded per file: the pool key (offset-range reads)
# and the topic (topic-scoped reads).  Nested parquet paths.
STATS_COLUMNS = ("kafka.offset", "kafka.topic")


def collect_file_stats(root: str, rel_paths: list[str]) -> list[dict]:
    """Footer-only stats for each parquet file: row count + min/max of
    STATS_COLUMNS (missing/statless columns simply absent)."""
    import pyarrow.parquet as pq  # noqa: PLC0415

    out = []
    for rel in rel_paths:
        full = os.path.join(root, rel)
        md = pq.ParquetFile(full).metadata
        stats: dict[str, list] = {}
        # a column missing min/max in ANY row group has no whole-file
        # bound — poison it so later row groups can't resurrect it
        bad: set[str] = set()
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in STATS_COLUMNS or name in bad:
                    continue
                s = col.statistics
                if s is None or not s.has_min_max:
                    stats.pop(name, None)
                    bad.add(name)
                    continue
                lo, hi = s.min, s.max
                if isinstance(lo, bytes):
                    lo, hi = lo.decode("utf-8", "replace"), hi.decode("utf-8", "replace")
                if name in stats:
                    stats[name] = [min(stats[name][0], lo), max(stats[name][1], hi)]
                else:
                    stats[name] = [lo, hi]
        out.append(
            {
                "path": rel,
                "records": md.num_rows,
                "size": os.path.getsize(full),
                "stats": stats,
            }
        )
    return out


def list_parquet_files(fs, root: str, rel_dir: str) -> list[str]:
    """Pool-relative paths of the parquet files under ``rel_dir``."""
    full = os.path.join(root, rel_dir)
    return sorted(
        os.path.join(rel_dir, f)
        for f in fs.listdir(full)
        if f.endswith(".parquet")
    )


class TxLog:
    """Reader/writer for a pool's ``_log/`` directory.

    All IO goes through the pool's storage backend; appends must run
    under the pool's writer lock (version = last + 1 read-modify-write,
    same critical section as the manifest swap)."""

    def __init__(self, fs, pool_path: str):
        self._fs = fs
        self.path = os.path.join(pool_path, LOG_DIR)

    def _entry_path(self, version: int) -> str:
        return os.path.join(self.path, f"{version:020d}.json")

    def versions(self) -> list[int]:
        if not self._fs.isdir(self.path):
            return []
        return sorted(
            int(f[:-5])
            for f in self._fs.listdir(self.path)
            if f.endswith(".json") and f[:-5].isdigit()
        )

    def entries(self) -> list[dict]:
        return [
            e
            for v in self.versions()
            if (e := self._fs.read_json(self._entry_path(v))) is not None
        ]

    def append(
        self,
        commit: str | None,
        add: list[dict] | None = None,
        remove: list[str] | None = None,
        floor: str | None = None,
        retract: str | None = None,
    ) -> int:
        """Write the next log entry (caller holds the writer lock).

        Uses the backend's conditional PUT (``create_exclusive`` — S3
        If-None-Match / GCS generation-0) so the version claim is a
        linearizable server op, exactly Delta's putIfAbsent commit
        protocol: even if two writers somehow shared the lock (broken
        clock on a stale-break, operator error), one of them LOSES the
        version slot and retries onto the next, instead of both
        thinking they wrote version N."""
        import json as _json  # noqa: PLC0415

        self._fs.makedirs(self.path)
        vs = self.versions()
        version = (vs[-1] + 1) if vs else 0
        while True:
            entry = {
                "version": version,
                "commit": commit,
                "ts": time.time(),
                "add": add or [],
                "remove": remove or [],
            }
            if floor is not None:
                entry["floor"] = floor
            if retract is not None:
                entry["retract"] = retract
            payload = _json.dumps(entry, sort_keys=True).encode()
            if self._fs.create_exclusive(self._entry_path(version), payload):
                return version
            version += 1  # lost the slot to a racer: claim the next one

    # -- snapshot ----------------------------------------------------------

    def snapshot(self, as_of_commit: str | None = None) -> dict:
        """Replay the log: live file actions (per-file dicts with stats)
        plus bookkeeping.  ``as_of_commit`` stops replay after the entry
        carrying that commit name (time travel)."""
        live: dict[str, dict] = {}
        commits: list[str] = []
        floor: str | None = None
        removed_ts: dict[str, float] = {}
        retracted: set[str] = set()
        seen_asof = False
        for e in self.entries():
            for a in e.get("add", []):
                live[a["path"]] = a
                removed_ts.pop(a["path"], None)
            for r in e.get("remove", []):
                live.pop(r, None)
                removed_ts[r] = e.get("ts", 0.0)
            if e.get("commit"):
                commits.append(e["commit"])
            if e.get("retract"):
                # a retracted commit is no longer part of pool history:
                # it must leave the commit list (matching the manifest
                # format, which deletes it) and never serve as an as-of
                # target — its files are gone once vacuum runs
                retracted.add(e["retract"])
                commits = [c for c in commits if c != e["retract"]]
            if e.get("floor"):
                floor = max(floor, e["floor"]) if floor else e["floor"]
            if as_of_commit is not None and e.get("commit") == as_of_commit:
                seen_asof = True
                break
        return {
            "files": live,
            "commits": commits,
            "floor": floor,
            "removed_ts": removed_ts,
            "retracted": retracted,
            "asof_found": seen_asof,
        }


def prune_files(
    files: list[dict],
    topic: str | None = None,
    offset_lo: int | None = None,
    offset_hi: int | None = None,
) -> list[dict]:
    """File skipping on recorded min/max stats — the whole point of the
    log format: a scoped read never hands Spark a file whose stats rule
    it out.  A file with no stats for a column is conservatively kept.
    ``offset_hi`` is EXCLUSIVE (read_batch semantics)."""
    out = []
    for f in files:
        st = f.get("stats", {})
        if topic is not None and "kafka.topic" in st:
            lo, hi = st["kafka.topic"]
            if not (lo <= topic <= hi):
                continue
        if offset_lo is not None and "kafka.offset" in st and st["kafka.offset"][1] < offset_lo:
            continue
        if (
            offset_hi is not None
            and "kafka.offset" in st
            and st["kafka.offset"][0] >= offset_hi
        ):
            continue
        out.append(f)
    return out


def fresh_commit_id() -> str:
    return f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
