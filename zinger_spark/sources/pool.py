"""Pool: the Zed-lake data pool re-expressed as an ordered parquet table.

Reference semantics (/root/reference):
  - a pool is an append-only table whose pool key is ``kafka.offset``
    ascending; opening any other keying is refused (fifo/lake.go:31-46,
    etl/pool.go:32-46)
  - append is an atomic commit (fifo/lake.go:58-60)
  - data records and marker records (done/cursor) share the pool
    (etl/pipeline.go:29, design.md:117-128)

Spark mapping: a directory of parquet commit files.  One commit = one
atomically-renamed subdirectory write, so concurrent readers never see
a partial batch (the poor-man's Delta transaction — swap in Delta Lake
`format("delta")` when the runtime ships it).  Readers use
``mergeSchema`` so commits carrying different (fused-compatible) value
schemas coexist, mirroring Zed's per-record typing.

Scale notes: at 100 TB a pool is partitioned by ``kafka.topic`` and
sorted/z-ordered by ``kafka.offset`` within partitions, so topic
filters prune partitions and offset ranges prune files on min/max
stats.  ``write_partitioned=True`` enables the layout; the tiny test
pools keep flat files.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import threading
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..datamodel import TYPE_DONE
from ..operators.relational import ordered_batch as _ordered_batch

POOL_KEY = "kafka.offset"
_META = "_pool.json"


class PoolError(Exception):
    pass


class Pool:
    """An ordered pool backed by parquet commit dirs under ``path``."""

    def __init__(self, spark: SparkSession, path: str, expected_key: str = POOL_KEY):
        self.spark = spark
        self.path = path
        meta_path = os.path.join(path, _META)
        if not os.path.exists(meta_path):
            raise PoolError(f"{path}: not a pool (missing {_META})")
        meta = json.load(open(meta_path))
        # Pool-key validation, as in fifo/lake.go:36-39: refuse pools
        # whose key differs from the expected one (kafka.offset asc for
        # zync pools; seqno asc for the design.md txn-bundle pools).
        if meta.get("key") != expected_key or meta.get("order", "asc") != "asc":
            raise PoolError(
                f"pool {path} does not have {expected_key} asc pool key"
            )
        self.meta = meta
        self.lock_timeout = self.DEFAULT_LOCK_TIMEOUT
        self._local_lock = threading.RLock()
        self._lock_depth = 0

    # -- lifecycle ----------------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        key: str = POOL_KEY,
        order: str = "asc",
        partition_by_topic: bool = False,
    ) -> "Pool":
        """``partition_by_topic`` is the 100-TB layout (SCALE.md):
        commits are hive-partitioned on kafka.topic so topic filters
        prune directories before any file is opened."""
        if order != "asc":
            raise PoolError(f"pool order must be asc (got {order})")
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _META), "w") as f:
            json.dump({"key": key, "order": order, "partitioned": partition_by_topic}, f)
        return Pool(spark, path, expected_key=key)

    # -- read ---------------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_manifest.json")

    def _read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _live_commits(self) -> list[str] | None:
        """Commit names listed in the manifest, or None when the pool
        predates manifests (then directory listing is the truth)."""
        m = self._read_manifest()
        return None if m is None else m["commits"]

    def _write_manifest(self, commits: list[str], orphaned: dict[str, float] | None = None) -> None:
        """Atomic manifest swap (tmp + rename), single-writer like the
        reference's sync processes. ``orphaned`` records WHEN each
        no-longer-live commit left the manifest — vacuum's grace clock
        starts there, not at the dir's (much older) write mtime."""
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"commits": commits, "orphaned": orphaned or {}}, f)
        os.replace(tmp, self._manifest_path())

    def _commit_dirs(self) -> list[str]:
        live = self._live_commits()
        if live is not None:
            return [os.path.join(self.path, d) for d in sorted(live)]
        return sorted(
            os.path.join(self.path, d)
            for d in os.listdir(self.path)
            if d.startswith("commit-") and os.path.isdir(os.path.join(self.path, d))
        )

    def is_empty(self) -> bool:
        return not self._commit_dirs()

    # -- writer lock --------------------------------------------------------

    #: Default writer-lock acquire timeout.  Generous on purpose: an
    #: ETL run or compact() legitimately HOLDS the lock across a whole
    #: Spark job (minutes at scale), and a contending writer — e.g. a
    #: streaming ingest foreachBatch — must wait out a healthy holder,
    #: not error after 2 minutes with its tmp dir already written.
    #: Override per-pool (``pool.lock_timeout = ...``) or per-call.
    DEFAULT_LOCK_TIMEOUT = 1800.0

    @contextlib.contextmanager
    def writer_lock(self, timeout: float | None = None, stale: float | None = None):
        """Serialize pool writers across threads AND processes.

        The reference inherits single-commit atomicity from the Zed lake
        service (fifo/lake.go:58-60); a filesystem pool has no service,
        so writers contend on an O_CREAT|O_EXCL lock file — exactly one
        creator wins, everyone else polls until ``timeout`` (default
        ``self.lock_timeout``, class default DEFAULT_LOCK_TIMEOUT).
        Reentrant within a Pool instance (RLock + depth counter), so
        ``load_batch`` inside an already-locked ETL run does not
        self-deadlock.

        ``stale`` (seconds) optionally breaks a lock whose mtime is that
        old — for operators recovering from a crashed writer.  Default
        None: never break a lock automatically, because a long Spark job
        legitimately holds it for minutes and breaking it would re-open
        the duplicate-commit race this exists to close.

        An object-storage backend overrides this with its native
        conditional-put (S3 If-None-Match, GCS if-generation-match).
        """
        if timeout is None:
            timeout = self.lock_timeout
        if not self._local_lock.acquire(timeout=timeout):
            raise PoolError(f"pool {self.path}: writer-lock timeout ({timeout}s)")
        try:
            if self._lock_depth == 0:
                self._acquire_file_lock(timeout, stale)
            self._lock_depth += 1
            try:
                yield
            finally:
                self._lock_depth -= 1
                if self._lock_depth == 0:
                    self._release_file_lock()
        finally:
            self._local_lock.release()

    def _file_lock_path(self) -> str:
        return os.path.join(self.path, "_writer.lock")

    def _acquire_file_lock(self, timeout: float, stale: float | None) -> None:
        deadline = time.time() + timeout
        while True:
            try:
                fd = os.open(
                    self._file_lock_path(), os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                os.write(
                    fd,
                    json.dumps({"pid": os.getpid(), "ts": time.time()}).encode(),
                )
                os.close(fd)
                return
            except FileExistsError:
                try:
                    st = os.stat(self._file_lock_path())
                    if stale is not None and time.time() - st.st_mtime > stale:
                        self._break_stale_lock(st)
                        continue
                except FileNotFoundError:
                    continue
                if time.time() > deadline:
                    raise PoolError(
                        f"pool {self.path}: writer-lock timeout ({timeout}s); "
                        f"remove {self._file_lock_path()} if the holder crashed"
                    )
                time.sleep(0.05)

    def _break_stale_lock(self, judged: os.stat_result) -> None:
        """Remove a lock judged stale WITHOUT the naive remove-by-path
        TOCTOU: two waiters can both judge the same lock stale; after A
        removes it and creates its own fresh lock, B's remove-by-path
        would delete A's fresh lock and reopen the two-holders race.
        Instead, take the lock ASIDE with an atomic rename to a private
        name — exactly one renamer wins the race (the loser gets
        FileNotFoundError) — then verify by (inode, mtime_ns) that what
        we renamed IS the file we judged stale (inode alone is not
        identity: ext4 recycles a removed file's inode for the next
        create; a FRESH lock always has a recent mtime or staleness
        judgment itself is meaningless).  If a racer's fresh lock
        slipped in between the stat and our rename, put it straight
        back.  The put-back itself could only clobber a third
        writer's lock if two independent sub-50ms races line up AND the
        judged-stale inode was recycled in between; with the
        stale-break path already being a crash-recovery escape hatch
        (stale=None by default), that residual window is accepted and
        documented rather than closed with fcntl (which NFS/overlay
        mounts break)."""
        aside = self._file_lock_path() + f".break-{uuid.uuid4().hex[:8]}"
        try:
            os.rename(self._file_lock_path(), aside)
        except FileNotFoundError:
            return  # another waiter broke it first
        got = os.stat(aside)
        if (got.st_ino, got.st_mtime_ns) != (judged.st_ino, judged.st_mtime_ns):
            os.rename(aside, self._file_lock_path())  # stole a fresh lock: undo
            return
        os.remove(aside)

    def _release_file_lock(self) -> None:
        try:
            os.remove(self._file_lock_path())
        except FileNotFoundError:
            pass

    # -- sidecars -----------------------------------------------------------

    def read_sidecar(self, name: str) -> dict | None:
        """Small JSON sidecar stored next to the commits (ETL cursors
        etc.).  ALL sidecar IO goes through this pair so an
        object-storage Pool backend only overrides two methods — the
        planner never touches ``pool.path`` with raw file IO."""
        try:
            with open(os.path.join(self.path, name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def write_sidecar(self, name: str, obj: dict) -> None:
        """Atomic swap (tmp + rename), same pattern as the manifest."""
        tmp = os.path.join(self.path, f".{name}.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, os.path.join(self.path, name))

    def df(self, topic: str | None = None, as_of: str | None = None) -> DataFrame:
        """The whole pool as a DataFrame (schema-merged across commits).

        ``topic`` matters for partitioned pools: the hive partition
        column is ``_topic`` (a copy of kafka.topic), and a filter on
        the NESTED kafka.topic never reaches partition pruning — so the
        topic restriction must be applied to ``_topic`` BEFORE the
        column is dropped. With it, a topic-scoped read lists only that
        topic's directories (PartitionFilters in the scan, verified by
        test_partitioned_pool_prunes_by_topic).

        ``as_of`` is time travel (the Delta ``versionAsOf`` analog):
        pass a commit id previously returned by ``load_batch`` and the
        read sees only commits up to and including it — commit ids are
        millisecond-prefixed, so lexicographic order IS commit order.
        Commits orphaned by ``compact()`` leave the manifest and age
        out via ``vacuum(grace)``, so time travel reaches exactly the
        commits vacuum hasn't reclaimed (same contract as Delta
        VACUUM limiting its time travel)."""
        dirs = self._commit_dirs()
        if as_of is not None:
            cut = f"commit-{as_of}"
            dirs = [d for d in dirs if os.path.basename(d) <= cut]
            if not dirs:
                raise PoolError(f"pool {self.path}: no commits at or before {as_of}")
        if not dirs:
            raise PoolError(f"pool {self.path} is empty")
        reader = self.spark.read.option("mergeSchema", "true")
        if self.meta.get("partitioned"):
            # Partition discovery cannot span multiple commit dirs with
            # one basePath (the commit-N path fragment is not key=value:
            # CONFLICTING_DIRECTORY_STRUCTURES).  Topic-scoped reads —
            # the hot path — list the topic's `_topic=T` subdirs
            # DIRECTLY, which is stronger than a partition filter: only
            # that topic's directories are ever opened.  Full reads go
            # per-commit (discovery works inside one commit) and fuse.
            if topic is not None:
                tdirs = [
                    os.path.join(d, f"_topic={topic}")
                    for d in dirs
                    if os.path.isdir(os.path.join(d, f"_topic={topic}"))
                ]
                if tdirs:
                    return reader.parquet(*tdirs)
                # topic absent in every commit: empty frame, pool schema
                return self._fused_partitioned(dirs).filter(
                    F.col("kafka.topic") == topic
                )
            return self._fused_partitioned(dirs)
        out = reader.parquet(*dirs)
        if topic is not None:
            out = out.filter(F.col("kafka.topic") == topic)
        return out

    def _fused_partitioned(self, dirs: list[str]) -> DataFrame:
        """Full read of a partitioned pool: one scan per commit dir
        (partition discovery is valid inside a commit), schema-fused.
        O(commits) scan nodes — run ``compact()`` periodically; the
        planner's reads are topic-scoped and never take this path."""
        from ..datamodel import fuse  # noqa: PLC0415

        parts = [
            self.spark.read.option("mergeSchema", "true").parquet(d).drop("_topic")
            for d in dirs
        ]
        return parts[0] if len(parts) == 1 else fuse(*parts)

    def query(self, fn) -> DataFrame:
        """Run a DataFrame transform over the pool (Lake.Query analog,
        fifo/lake.go:50-56 — ours takes a plan builder, not query text)."""
        return fn(self.df())

    # -- write --------------------------------------------------------------

    def load_batch(self, df: DataFrame) -> str:
        """Atomic commit: write to a temp dir, rename into place
        (LoadBatch, fifo/lake.go:58-60). Returns the commit id."""
        commit_id = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        final = os.path.join(self.path, f"commit-{commit_id}")
        tmp = os.path.join(self.path, f".tmp-{commit_id}")
        writer = df.write.mode("overwrite")
        if self.meta.get("partitioned"):
            df = df.withColumn("_topic", F.col("kafka.topic")).sortWithinPartitions(
                "kafka.offset"
            )
            writer = df.write.mode("overwrite").partitionBy("_topic")
        writer.parquet(tmp)
        # drop spark's _SUCCESS etc? keep; parquet reader ignores non-parquet
        # Data write happens unlocked (it is slow and conflict-free: the
        # tmp dir is writer-unique); only the rename + manifest
        # read-modify-write is the critical section — without the lock
        # two concurrent load_batch calls can each read the same
        # manifest and one commit silently vanishes from the list.
        with self.writer_lock():
            os.rename(tmp, final)
            m = self._read_manifest()
            if m is not None:
                self._write_manifest(
                    m["commits"] + [f"commit-{commit_id}"], m.get("orphaned")
                )
        return commit_id

    def drop_commit(self, commit_id: str) -> None:
        """Retract a just-written commit (used to take back an empty
        ETL batch).  Only safe for the most recent commit written by
        this process — not a general rollback."""
        with self.writer_lock():
            m = self._read_manifest()
            if m is not None:
                self._write_manifest(
                    [c for c in m["commits"] if c != f"commit-{commit_id}"],
                    m.get("orphaned"),
                )
            d = os.path.join(self.path, f"commit-{commit_id}")
            if os.path.isdir(d):
                shutil.rmtree(d)

    # -- offset bookkeeping (A9-A11) ----------------------------------------

    def next_consumer_offset(self, topic: str) -> int:
        """max stored offset for topic + 1 (fifo/lake.go:62-82)."""
        if self.is_empty():
            return 0
        row = (
            self.df()
            .filter(F.col("kafka.topic") == topic)
            .agg(F.max("kafka.offset").alias("mx"))
            .collect()[0]
        )
        return 0 if row["mx"] is None else int(row["mx"]) + 1

    def next_producer_offsets(self) -> dict[str, int]:
        """{topic: max offset + 1} over the pool (etl/pool.go:60-81)."""
        if self.is_empty():
            return {}
        rows = (
            self.df()
            .groupBy(F.col("kafka.topic").alias("topic"))
            .agg(F.max("kafka.offset").alias("offset"))
            .collect()
        )
        return {r["topic"]: int(r["offset"]) + 1 for r in rows if r["topic"] is not None}

    def read_batch(self, topic: str, offset: int, size: int, transform=None) -> DataFrame:
        """Ordered batch scan (fifo/lake.go:84-92). Topic-scoped read so
        partitioned pools prune to the topic's directories."""
        return _ordered_batch(self.df(topic=topic), topic, offset, size, transform=transform)

    def done_offsets(self, topic: str) -> DataFrame:
        """done-marker offsets for a topic (the anti-join right side)."""
        return (
            self.df()
            .filter((F.col("_type") == TYPE_DONE) & (F.col("kafka.topic") == topic))
            .select(F.col("kafka.topic").alias("topic"), F.col("kafka.offset").alias("offset"))
        )

    def compact(self) -> int:
        """Merge all commit dirs into one (the Delta OPTIMIZE analog).

        Many small commits are the expected write pattern (one per
        micro-batch); reads pay per-file open cost and the driver pays
        listing cost. Compaction rewrites the pool as one sorted commit
        and atomically swaps the MANIFEST to it — the old commit dirs
        stay on disk so concurrent readers mid-scan (who listed files
        before the swap) never hit vanished parquet files.  ``vacuum``
        reclaims them after a grace window (the Delta log + VACUUM
        pattern). Returns commits merged.

        Holds the writer lock for the WHOLE operation: a load_batch
        landing between the dir snapshot and the manifest swap would
        otherwise be silently orphaned (its commit never in the new
        manifest) — lost data, not just a lost listing.
        """
        with self.writer_lock():
            return self._compact_locked()

    def _compact_locked(self) -> int:
        dirs = self._commit_dirs()
        if len(dirs) <= 1:
            return len(dirs)
        old_names = [os.path.basename(d) for d in dirs]
        if self._read_manifest() is None:
            # Bootstrap the manifest to the CURRENT commit set BEFORE
            # the new dir appears: from here on the manifest (not
            # directory listing) is the truth, so the rename below can
            # never double-count — a crash in any window leaves either
            # the old list (new dir invisible, orphaned on disk) or the
            # swapped list, both consistent.
            self._write_manifest(old_names)
        snapshot = self.df().sortWithinPartitions("kafka.offset")
        commit_id = f"{int(time.time() * 1000):013d}-{uuid.uuid4().hex[:8]}"
        tmp = os.path.join(self.path, f".tmp-{commit_id}")
        writer = snapshot.write.mode("overwrite")
        if self.meta.get("partitioned"):
            writer = snapshot.withColumn(
                "_topic", F.col("kafka.topic")
            ).write.mode("overwrite").partitionBy("_topic")
        writer.parquet(tmp)
        final = os.path.join(self.path, f"commit-{commit_id}")
        os.rename(tmp, final)
        now = time.time()
        prior = (self._read_manifest() or {}).get("orphaned", {})
        self._write_manifest(
            [f"commit-{commit_id}"], {**prior, **{n: now for n in old_names}}
        )
        return len(dirs)

    def vacuum(self, grace_seconds: float = 3600.0) -> int:
        """Delete commit dirs that left the manifest more than
        ``grace_seconds`` ago (grace measured from ORPHANING time, not
        the dir's write mtime — a 2-hour-old commit compacted away one
        second ago is still protected). Dirs on disk but absent from
        both the live list and the orphan record were never visible to
        manifest readers (crashed half-writes); those fall back to the
        mtime clock. No-op for manifest-less pools. Returns dirs
        removed."""
        removed = 0
        now = time.time()
        # '.tmp-*' dirs are writes that crashed between the Spark write
        # and os.rename — never referenced by the manifest or visible to
        # any reader (manifest-less pools list only commit-* dirs), so
        # reclaim them on the mtime clock in every pool mode.
        for d in os.listdir(self.path):
            full = os.path.join(self.path, d)
            if not (d.startswith(".tmp-") and os.path.isdir(full)):
                continue
            if now - os.path.getmtime(full) >= grace_seconds:
                shutil.rmtree(full)
                removed += 1
        with self.writer_lock():
            m = self._read_manifest()
            if m is None:
                return removed
            keep = set(m["commits"])
            orphaned = m.get("orphaned", {})
            orphan_removed = 0
            remaining_orphans = dict(orphaned)
            for d in os.listdir(self.path):
                full = os.path.join(self.path, d)
                if not (
                    d.startswith("commit-") and d not in keep and os.path.isdir(full)
                ):
                    continue
                since = orphaned.get(d, os.path.getmtime(full))
                if now - since >= grace_seconds:
                    shutil.rmtree(full)
                    remaining_orphans.pop(d, None)
                    orphan_removed += 1
            if orphan_removed:
                self._write_manifest(m["commits"], remaining_orphans)
            return removed + orphan_removed

    def delete(self) -> None:
        shutil.rmtree(self.path)
