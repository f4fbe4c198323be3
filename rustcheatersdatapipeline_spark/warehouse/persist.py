"""Gold warehouse persistence (SURVEY.md §1.1 gold zone).

Storage layout designed for the 100 TB read patterns:

- facts carrying ``date_sk`` are partitioned by it — every insight query
  and incremental load prunes to the dates it touches (the Spark
  equivalent of the reference's YYYY/MM/DD S3 layout, §4.1);
- dims are small, written unpartitioned (they broadcast anyway);
- everything is Parquet: columnar pruning + predicate pushdown, unlike
  the reference's CSV text round-trips (§4.4).

``overwrite`` mode keeps batch writes idempotent at the file level: a
re-run of the same batch rewrites the same content (the upsert writers
already guarantee value-level idempotency).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

PARTITIONED_FACTS = {
    "achievement_fact",
    "badges_fact",
    "bans_fact",
    "friends_fact",
    "game_playing_banned_fact",
    "game_playtime_fact",
    "groups_fact",
    "stats_fact",
}

#: Bucketing key for the table-catalog layout: every fact joins
#: player_dim on player_sk, and cross-fact correlation queries join
#: fact-to-fact on it — the one key whose co-location removes a shuffle
#: from every repeated big-big join. (date_sk handles pruning via
#: partitioning; the bounded dims broadcast, needing neither.)
GOLD_BUCKET_KEY = "player_sk"
GOLD_BUCKETS = 8


def write_gold(gold: dict[str, DataFrame], path: str) -> None:
    for name, df in gold.items():
        w = df.write.mode("overwrite")
        if name in PARTITIONED_FACTS and "date_sk" in df.columns:
            w = w.partitionBy("date_sk")
        w.parquet(os.path.join(path, name))


def write_gold_tables(
    spark: SparkSession,
    gold: dict[str, DataFrame],
    database: str,
    path: str,
    buckets: int = GOLD_BUCKETS,
) -> None:
    """Catalog-table variant of ``write_gold``: same date_sk partition
    layout, plus facts bucketed (and sort-ordered) on ``player_sk`` so
    repeated fact⋈fact / fact⋈player joins scan co-located buckets with
    NO exchange on either side (pinned by
    tests/test_skew_and_bucketing.py). Bucketing requires the table
    catalog — plain ``.parquet(path)`` writes cannot record bucket
    metadata.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{path}'")
    for name, df in gold.items():
        w = df.write.mode("overwrite").format("parquet")
        if name in PARTITIONED_FACTS and "date_sk" in df.columns:
            w = w.partitionBy("date_sk")
        if name.endswith("_fact") and GOLD_BUCKET_KEY in df.columns:
            w = w.bucketBy(buckets, GOLD_BUCKET_KEY).sortBy(GOLD_BUCKET_KEY)
        w.saveAsTable(f"{database}.{name}")


def read_gold(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    out: dict[str, DataFrame] = {}
    for name in os.listdir(path):
        out[name] = spark.read.parquet(os.path.join(path, name))
    return out


# --------------------------------------------------------------------------
# transactional gold publishing (SURVEY.md §7.3 hard part 2)
# --------------------------------------------------------------------------


class ConcurrentWriteError(RuntimeError):
    """Raised when a publish's base version is no longer current —
    another writer committed first. Callers re-read and retry
    (``publish_with_retry``), which serializes read-modify-write batches
    exactly like the reference's Postgres ``ON CONFLICT`` upserts
    (dags/custom_operators/LoadDimsOperator.py:25-28) serialize via the
    database's row locks."""


class GoldStore:
    """Write-audit-publish gold storage with optimistic concurrency.

    Plain ``write_gold``'s whole-table ``overwrite`` is last-writer-wins:
    two concurrent batches silently drop one batch's rows. The store
    fixes that with the standard table-format commit protocol (the shape
    Iceberg/Delta use — public designs):

    - **write**: each publish lands its tables in an immutable
      ``_data/<txn>/`` directory; nothing references it yet, so a crashed
      or rejected publish leaves gold untouched (orphans are vacuumed).
    - **audit**: staged tables are read back (schema + row count) before
      they can be referenced — a torn write can never become visible.
    - **publish**: a root ``_manifest.json`` names the exact directory of
      every table version. Commit = fsync a new manifest + atomic
      ``os.replace``, performed under a compare-and-swap on the base
      version: if another writer advanced the manifest since this batch
      read it, the publish is REJECTED (``ConcurrentWriteError``), never
      merged blindly. On a local/NFS filesystem the CAS critical section
      is an ``O_EXCL`` lock file; on an object store the identical
      protocol maps to a conditional put (ETag/If-Match) or a catalog
      transaction — the caller-facing semantics do not change.

    Readers always open the manifest's directories directly: a reader
    mid-scan of version N is unaffected by version N+1 landing
    (snapshot isolation for free, since data dirs are immutable).
    """

    MANIFEST = "_manifest.json"
    LOCK = "_manifest.lock"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _manifest_file(self) -> str:
        return os.path.join(self.path, self.MANIFEST)

    def current_manifest(self) -> dict:
        try:
            with open(self._manifest_file(), encoding="utf-8") as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": 0, "tables": {}}

    def current_version(self) -> int:
        return int(self.current_manifest()["version"])

    # -- read --------------------------------------------------------------

    @staticmethod
    def _dirs(entry: dict) -> list[str]:
        """A table entry names one data dir (replace-published) or a
        list (append-published); readers union them."""
        return entry["dirs"] if "dirs" in entry else [entry["dir"]]

    def read_all(self) -> dict[str, DataFrame]:
        m = self.current_manifest()
        return {name: self._read_entry(entry) for name, entry in m["tables"].items()}

    def _read_entry(self, entry: dict) -> DataFrame:
        return self.spark.read.parquet(
            *[os.path.join(self.path, d) for d in self._dirs(entry)]
        )

    def read(self, name: str) -> DataFrame:
        return self._read_entry(self.current_manifest()["tables"][name])

    # -- time travel -------------------------------------------------------

    def versions(self) -> list[int]:
        """Committed versions with a retained manifest, ascending."""
        d = os.path.join(self.path, "_manifests")
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
        )

    def manifest_at(self, version: int) -> dict:
        with open(
            os.path.join(self.path, "_manifests", f"v{version}.json"), encoding="utf-8"
        ) as f:
            return json.load(f)

    def read_at(self, name: str, version: int) -> DataFrame:
        """Snapshot read of ``name`` as of ``version`` — free time travel
        because data dirs are immutable (the Iceberg/Delta property).
        Valid until ``vacuum`` reclaims dirs the CURRENT manifest no
        longer references; after that a stale snapshot read fails fast
        on the missing path rather than returning partial data."""
        return self._read_entry(self.manifest_at(version)["tables"][name])

    def pruned_files(self, name: str, col: str, lo, hi) -> list[str] | None:
        """Data files of ``name`` whose manifest [min, max] for ``col``
        intersects [lo, hi] — Iceberg-style metadata pruning: the
        planner touches ONLY the manifest, never a parquet footer.
        Returns None when the manifest carries no stats (legacy entry),
        meaning "cannot prune, read everything". Files without stats for
        ``col`` are kept (conservative)."""
        entry = self.current_manifest()["tables"][name]
        files = entry.get("files")
        if files is None:
            return None
        # partitioned layouts (…/date_sk=X/part-*.parquet) encode a column
        # in the DIRECTORY name; an explicit-file read would silently drop
        # it from the schema. Spark already dir-prunes those on a normal
        # read, so fall back to the full-table path.
        if any("=" in os.path.basename(os.path.dirname(f["path"])) for f in files):
            return None
        keep = []
        for f in files:
            rng = f.get("stats", {}).get(col)
            if rng is None or (rng[1] >= lo and rng[0] <= hi):
                keep.append(os.path.join(self.path, f["path"]))
        return keep

    def read_pruned(self, name: str, col: str, lo, hi) -> DataFrame:
        """``read(name).filter(lo <= col <= hi)`` but scanning only the
        manifest-pruned file set. Combine with a Z-ordered layout
        (operators/layout.py) and the pruned set shrinks on EVERY
        indexed column; the residual filter still applies (stats prune
        files, not rows)."""
        from pyspark.sql import functions as F

        files = self.pruned_files(name, col, lo, hi)
        base = (
            self.read(name)
            if files is None
            else self.spark.read.parquet(*files)
            if files
            else self.spark.createDataFrame([], self.read(name).schema)
        )
        return base.filter((F.col(col) >= lo) & (F.col(col) <= hi))

    @staticmethod
    def _file_stats(target: str, base: str) -> list[dict]:
        """Per-file (min, max) of every JSON-portable primitive column,
        from parquet footers at stage time. One footer read per staged
        file — metadata-only, proportional to file count not bytes (the
        same cost Iceberg pays to build its manifests); readers then
        prune without opening any footer."""
        import glob as _glob

        import pyarrow.parquet as pq

        out = []
        root = target.rstrip(os.sep)
        for fp in sorted(_glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)):
            md = pq.ParquetFile(fp).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            stats: dict[str, list] = {}
            for ci, cname in enumerate(names):
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        mins = []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins and all(isinstance(v, (int, float, str, bool)) for v in (min(mins), max(maxs))):
                    stats[cname] = [min(mins), max(maxs)]
            out.append({"path": os.path.relpath(fp, base), "stats": stats})
        return out

    # -- write + audit + publish ------------------------------------------

    def publish(
        self, gold: dict[str, DataFrame], base_version: int, lock_timeout: float = 30.0
    ) -> int:
        """Stage ``gold``, audit it, and commit it as the next version iff
        the store is still at ``base_version``. Tables not named in
        ``gold`` carry forward from the base manifest (metadata-only).
        Returns the committed version."""
        txn = uuid.uuid4().hex[:12]
        staged: dict[str, dict] = {}
        for name, df in gold.items():
            rel = os.path.join("_data", txn, name)
            target = os.path.join(self.path, rel)
            w = df.write.mode("error")
            if name in PARTITIONED_FACTS and "date_sk" in df.columns:
                w = w.partitionBy("date_sk")
            w.parquet(target)
            # audit: reread what actually landed — a table that cannot be
            # scanned (torn file, schema corruption) must never publish
            back = self.spark.read.parquet(target)
            staged[name] = {
                "dir": rel,
                "rows": back.count(),
                "files": self._file_stats(target, self.path),
            }

        def replace_tables(tables: dict) -> None:
            tables.update(staged)

        return self._commit(replace_tables, base_version, txn, lock_timeout)

    def publish_append(
        self, deltas: dict[str, DataFrame], base_version: int, lock_timeout: float = 30.0
    ) -> int:
        """Append-only publish: stage each delta and commit a manifest
        whose entries reference the prior data dirs PLUS the delta dir.

        This is the 100 TB ingest shape — a micro-batch appending to a
        petabyte table stages only its own rows; nothing existing is
        rewritten or even read. Same write-audit-CAS protocol as
        ``publish``; readers union the entry's dirs (snapshot-isolated,
        since every dir is immutable). Periodic ``compact`` folds the
        dir list back to one.
        """
        txn = uuid.uuid4().hex[:12]
        staged: dict[str, dict] = {}
        for name, df in deltas.items():
            rel = os.path.join("_data", txn, name)
            target = os.path.join(self.path, rel)
            df.write.mode("error").parquet(target)
            back = self.spark.read.parquet(target)
            staged[name] = {
                "dir": rel,
                "rows": back.count(),
                "files": self._file_stats(target, self.path),
            }

        def append_tables(tables: dict) -> None:
            for name, delta in staged.items():
                prior = tables.get(name)
                if prior is None:
                    tables[name] = {
                        "dirs": [delta["dir"]],
                        "rows": delta["rows"],
                        "files": delta["files"],
                    }
                else:
                    tables[name] = {
                        "dirs": self._dirs(prior) + [delta["dir"]],
                        "rows": int(prior.get("rows", 0)) + delta["rows"],
                        "files": (prior.get("files") or []) + delta["files"],
                    }

        return self._commit(append_tables, base_version, txn, lock_timeout)

    def compact(self, name: str, lock_timeout: float = 30.0) -> int:
        """Rewrite a (possibly multi-dir) table into one fresh dir and
        publish the replacement — the maintenance pass that bounds an
        append-published table's dir/file count. Runs as an ordinary
        CAS publish, so it serializes against concurrent appenders and
        loses gracefully (retry later) instead of dropping their rows."""
        base = self.current_version()
        return self.publish({name: self.read(name)}, base, lock_timeout)

    def _commit(self, update_tables, base_version: int, txn: str, lock_timeout: float) -> int:
        lock = os.path.join(self.path, self.LOCK)
        deadline = time.monotonic() + lock_timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(f"gold manifest lock busy: {lock}")
                time.sleep(0.05)
        try:
            current = self.current_manifest()
            if int(current["version"]) != int(base_version):
                raise ConcurrentWriteError(
                    f"base version {base_version} is stale; "
                    f"store is at {current['version']}"
                )
            tables = dict(current["tables"])
            update_tables(tables)
            new = {"version": int(base_version) + 1, "tables": tables}
            tmp = self._manifest_file() + f".{txn}.tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(new, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._manifest_file())
            # fsync the directory so the rename itself survives a crash
            dfd = os.open(self.path, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
            # retain a per-version manifest copy for snapshot reads
            # (read_at); valid until vacuum reclaims unreferenced dirs
            hist = os.path.join(self.path, "_manifests")
            os.makedirs(hist, exist_ok=True)
            # same tmp+atomic-replace protocol as the main manifest: a
            # crash mid-write must not leave truncated JSON that breaks
            # versions()/read_at afterward (fsync skipped — history is
            # best-effort, the main manifest is the durability anchor)
            hist_final = os.path.join(hist, f"v{new['version']}.json")
            hist_tmp = hist_final + f".{txn}.tmp"
            with open(hist_tmp, "w", encoding="utf-8") as f:
                json.dump(new, f)
            os.replace(hist_tmp, hist_final)
            return new["version"]
        finally:
            os.close(fd)
            os.unlink(lock)

    def vacuum(self) -> list[str]:
        """Delete ``_data/<txn>`` dirs no current table references —
        leftovers of rejected or superseded publishes. Safe because
        publishes only ever reference directories they created."""
        import shutil

        live = {
            d.split(os.sep)[1]
            for entry in self.current_manifest()["tables"].values()
            for d in self._dirs(entry)
        }
        data_root = os.path.join(self.path, "_data")
        removed = []
        for txn in os.listdir(data_root) if os.path.isdir(data_root) else []:
            if txn not in live:
                shutil.rmtree(os.path.join(data_root, txn))
                removed.append(txn)
        return removed


def publish_with_retry(store: GoldStore, build_fn, max_attempts: int = 5) -> int:
    """Serialized read-modify-write: ``build_fn(current_tables)`` returns
    the tables to publish; on a lost race the batch is REBUILT on the
    winner's state and retried — the distributed equivalent of the
    reference's ``ON CONFLICT DO UPDATE`` retry-on-lock semantics. The
    upsert builders (insert_if_absent / upsert_latest_wins) are
    idempotent and commutative on keys, so any interleaving converges to
    the same final table."""
    last: ConcurrentWriteError | None = None
    for _ in range(max_attempts):
        base = store.current_manifest()
        gold = build_fn(store.read_all())
        try:
            return store.publish(gold, base["version"])
        except ConcurrentWriteError as e:
            last = e
    raise last  # type: ignore[misc]
