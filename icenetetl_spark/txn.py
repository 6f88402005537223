"""Optimistic-concurrency table commits over plain Parquet — the public
Delta/Iceberg transaction-log idea, jar-free.

:class:`ParquetCatalog` reproduces the reference's Postgres merge semantics
(processor.py:249-256, 326-333, 395-401) for a SINGLE writer: its atomic
directory swap loses one side when two writers race. This module closes that
gap the way lakehouse formats do publicly:

- A table is a ``data/`` directory of immutable write sets plus a
  ``_manifests/`` log. Manifest ``v{N}.json`` lists the data directories
  visible at version N; readers resolve the latest manifest and read
  exactly those files — never a raw directory listing.
- A commit WRITES ITS DATA FIRST (invisible until referenced), then
  attempts to create ``v{N+1}.json`` with ``O_CREAT | O_EXCL`` — the
  filesystem's compare-and-swap: exactly one contender can create a given
  name. The loser deletes its orphaned write set and RETRIES against the
  new snapshot, re-running its anti-join/merge so its decision is always
  based on the state it serialized after. (On HDFS the same CAS is atomic
  rename-without-overwrite; on S3, put-if-absent.)

This gives serializable append_missing/upsert under concurrent writers:
every committed version is derived from the immediately preceding one, so
the history is a linear chain and ``ON CONFLICT`` semantics hold exactly.

Scale notes: the manifest holds directory names, not rows — O(commits)
metadata, independent of data size; readers cost one small JSON read.
``compact``/``vacuum`` bound file-count growth the way OPTIMIZE/VACUUM do.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from icenetetl_spark.operators.relational import insert_missing, upsert as upsert_plan


class CommitConflict(Exception):
    """Another writer committed the version this transaction targeted."""


import datetime as _dt  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from icenetetl_spark.operators.relational import PRED_OPS as _PRED_OPS  # noqa: E402


def _json_stat(v):
    """JSON-safe manifest statistic. Temporal values become ISO strings
    (ISO ordering == temporal ordering, so range pruning stays valid);
    anything else non-primitive becomes None = "no statistic" (pruning
    falls back to keeping the write set)."""
    if isinstance(v, bool) or v is None:
        return v if v is None else bool(v)
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    return None


def _may_match(minmax, op: str, value) -> bool:
    """Can ``col op value`` hold for any row of a write set with the given
    [min, max]? Unknown stats, all-null bounds, or cross-type comparisons
    all answer True — pruning is only ever an optimization."""
    if not minmax:
        return True
    lo, hi = minmax
    if lo is None or hi is None:
        return True
    if isinstance(value, (_dt.datetime, _dt.date)):
        value = value.isoformat()
    try:
        if op == "==":
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
    except TypeError:
        return True
    raise ValueError(f"unsupported predicate op {op!r}")


class TxnParquetCatalog:
    """Manifest-logged catalog with optimistic concurrency.

    API-compatible with :class:`icenetetl_spark.catalog.ParquetCatalog`
    for read/append_missing/upsert/overwrite, safe for concurrent writers
    within and across processes sharing a filesystem.
    """

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        max_retries: int = 20,
        default_stats: dict[str, Sequence[str]] | None = None,
    ):
        """``default_stats`` maps table name -> columns whose min/max go
        into every write set's manifest entry unless the call site passes
        its own ``stats_cols`` — the seam that lets generic callers (the
        ingest pipeline writes through the ParquetCatalog-shaped API,
        which has no stats parameter) still get manifest-level data
        skipping on their layout keys."""
        self.spark = spark
        self.warehouse = warehouse
        self.max_retries = max_retries
        self.default_stats = {
            k: list(v) for k, v in (default_stats or {}).items()
        }
        os.makedirs(warehouse, exist_ok=True)

    def _stats_for(self, name: str, stats_cols: Sequence[str]) -> Sequence[str]:
        return stats_cols or self.default_stats.get(name, ())

    # -- layout -----------------------------------------------------------

    def path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _manifest_dir(self, name: str) -> str:
        return os.path.join(self.path(name), "_manifests")

    def _data_dir(self, name: str) -> str:
        return os.path.join(self.path(name), "data")

    @staticmethod
    def _vname(version: int) -> str:
        return f"v{version:016d}.json"

    def current_version(self, name: str) -> int:
        """Latest committed version, -1 for an absent/empty table."""
        mdir = self._manifest_dir(name)
        if not os.path.isdir(mdir):
            return -1
        versions = [
            int(f[1:-5])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions, default=-1)

    def _load_manifest(self, name: str, version: int) -> dict:
        with open(os.path.join(self._manifest_dir(name), self._vname(version))) as f:
            return json.load(f)

    def exists(self, name: str) -> bool:
        return self.current_version(name) >= 0

    # -- snapshot reads ---------------------------------------------------

    def version_at(self, name: str, ts: float) -> int:
        """Latest committed version whose commit timestamp is <= ``ts``
        (timestamp-based time travel, resolved from the manifest log's own
        ``ts`` fields — O(retained versions) small-JSON reads)."""
        latest = self.current_version(name)
        if latest < 0:
            raise FileNotFoundError(f"table {name!r} has no committed version")
        best = -1
        for v in range(latest + 1):
            try:
                m = self._load_manifest(name, v)
            except FileNotFoundError:  # vacuumed away
                continue
            if m.get("ts", float("inf")) <= ts:
                best = v
        if best < 0:
            raise FileNotFoundError(
                f"table {name!r} has no version at or before ts={ts}"
            )
        return best

    def read(
        self,
        name: str,
        version: int | None = None,
        where: Sequence[tuple[str, str, object]] | None = None,
        as_of_ts: float | None = None,
    ) -> DataFrame:
        """DataFrame over exactly the write sets the manifest references —
        uncommitted/orphaned data is invisible by construction. Passing
        ``version`` time-travels to an older snapshot (manifests are
        immutable, so old versions stay readable until vacuumed).

        ``where`` is a conjunction of simple predicates ``(col, op, value)``
        with op in {'==','<','<=','>','>='}. Write sets whose manifest
        min/max statistics prove the predicate can't match are never
        listed, never opened, never scanned — manifest-level data skipping,
        the public Iceberg idea. The same predicates are re-applied as a
        residual row filter, so pruning is purely an optimization: the
        result equals ``read(name).filter(...)`` whether or not any write
        set carries statistics. At cluster scale this turns a point/range
        lookup over a long-appended table into an O(matching write sets)
        scan driven by O(commits) JSON metadata.

        ``as_of_ts`` time-travels by commit timestamp instead of version
        number (mutually exclusive with ``version``)."""
        if as_of_ts is not None:
            if version is not None:
                raise ValueError("pass either version or as_of_ts, not both")
            version = self.version_at(name, as_of_ts)
        v = self.current_version(name) if version is None else version
        if v < 0:
            raise FileNotFoundError(f"table {name!r} has no committed version")
        manifest = self._load_manifest(name, v)
        dirs = manifest["dirs"]
        if not dirs:
            raise FileNotFoundError(f"table {name!r} v{v} is empty")
        for _, op, _ in where or []:
            if op not in _PRED_OPS:
                raise ValueError(
                    f"unsupported predicate op {op!r}; use one of "
                    f"{sorted(_PRED_OPS)}"
                )
        if where:
            dirs = self._prune_dirs(manifest, where)
        base = self._data_dir(name)
        if not dirs:
            # every write set pruned: empty frame with the table's schema
            df = (
                self.spark.read.option("mergeSchema", "true")
                .parquet(*[os.path.join(base, d) for d in manifest["dirs"]])
                .limit(0)
            )
        else:
            # mergeSchema: write sets appended after a column was added
            # union cleanly (older sets read the new column as NULL) —
            # Delta-style additive schema evolution
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(base, d) for d in dirs]
            )
        for col, op, value in where or []:
            df = df.filter(_PRED_OPS[op](F.col(col), F.lit(value)))
        return df

    def read_pruned(
        self, name: str, branches: Sequence[Sequence[tuple[str, str, object]]]
    ) -> DataFrame:
        """Read restricted to an OR of predicate conjunctions: each branch
        runs through ``read(..., where=branch)`` (manifest-level write-set
        skipping per branch) and the branches union. Callers must pass
        DISJOINT branches (e.g. per-hemisphere conjunctions) — the union
        would duplicate rows matching two branches. The ParquetCatalog twin
        pushes the same disjunction into one hive-partitioned scan; both
        sides of the seam return an EMPTY frame for an empty disjunction
        (OR of nothing is false)."""
        if not branches:
            return self.read(name).filter(F.lit(False))
        dfs = [self.read(name, where=list(b)) for b in branches]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    @staticmethod
    def _prune_dirs(
        manifest: dict, where: Sequence[tuple[str, str, object]]
    ) -> list[str]:
        """Write-set names that MAY satisfy every conjunct. A dir without
        statistics for a predicate's column is always kept (pruning must
        never change results)."""
        stats = manifest.get("stats", {})
        kept = []
        for d in manifest["dirs"]:
            dstats = stats.get(d, {})
            if all(
                _may_match(dstats.get(col), op, value)
                for col, op, value in where
            ):
                kept.append(d)
        return kept

    # -- commit machinery -------------------------------------------------

    def _write_set(
        self, name: str, df: DataFrame, stats_cols: Sequence[str] = ()
    ) -> tuple[str, int, dict]:
        """Materialize ``df`` as a new immutable write set; returns
        (dir-name, row-count, {col: [min, max]}). Invisible until a
        manifest references it. Count and statistics come from ONE agg job
        over the written files — stats collection adds no extra pass."""
        d = f"ws-{uuid.uuid4().hex}"
        full = os.path.join(self._data_dir(name), d)
        df.write.parquet(full)
        back = self.spark.read.parquet(full)
        cols = [c for c in stats_cols if c in back.columns]
        aggs = [F.count(F.lit(1))]
        for c in cols:
            aggs += [F.min(c), F.max(c)]
        row = back.agg(*aggs).collect()[0]
        stats = {
            c: [_json_stat(row[1 + 2 * i]), _json_stat(row[2 + 2 * i])]
            for i, c in enumerate(cols)
        }
        return d, row[0], stats

    def _drop_write_set(self, name: str, d: str) -> None:
        shutil.rmtree(os.path.join(self._data_dir(name), d), ignore_errors=True)

    def _try_commit(
        self,
        name: str,
        base_version: int,
        dirs: list[str],
        op: str,
        stats: dict[str, dict] | None = None,
    ) -> None:
        """CAS: publish v{base+1} if and only if nobody else has. The body
        is fully written (and fsynced) to a hidden temp file first, then
        hard-linked to the version name — ``link(2)`` fails with EEXIST if
        any other writer claimed it, and on success the manifest appears
        atomically with its complete content (no partially-written-JSON
        window for readers). HDFS maps this to rename-without-overwrite,
        S3 to put-if-absent."""
        mdir = self._manifest_dir(name)
        os.makedirs(mdir, exist_ok=True)
        target = os.path.join(mdir, self._vname(base_version + 1))
        body = json.dumps(
            {
                "version": base_version + 1,
                "dirs": dirs,
                "op": op,
                "ts": time.time(),
                "stats": {d: s for d, s in (stats or {}).items() if d in dirs},
            }
        )
        tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, target)
        except FileExistsError:
            raise CommitConflict(
                f"{name}: version {base_version + 1} already committed"
            ) from None
        finally:
            os.unlink(tmp)

    # -- public write ops -------------------------------------------------

    def overwrite(
        self, name: str, df: DataFrame, stats_cols: Sequence[str] = ()
    ) -> None:
        """CREATE OR REPLACE: new snapshot referencing only this write set.
        Blind write — no read-set to validate, so a conflict just means
        re-CAS at the next version (data files are already durable)."""
        ws, _, st = self._write_set(name, df, self._stats_for(name, stats_cols))
        for _ in range(self.max_retries):
            try:
                self._try_commit(
                    name, self.current_version(name), [ws], "overwrite", {ws: st}
                )
                return
            except CommitConflict:
                continue
        self._drop_write_set(name, ws)
        raise CommitConflict(f"{name}: overwrite exceeded {self.max_retries} retries")

    def append_missing(
        self,
        name: str,
        df: DataFrame,
        keys: Sequence[str],
        stats_cols: Sequence[str] = (),
    ) -> int:
        """INSERT ... ON CONFLICT DO NOTHING, serializable under races.

        Each attempt anti-joins against the snapshot it will CAS over; a
        lost CAS discards the now-possibly-stale write set and recomputes
        from the winner's snapshot — so two writers inserting the same key
        concurrently commit it exactly once, whichever order they land.
        Returns rows actually appended (idempotent replay returns 0)."""
        for _ in range(self.max_retries):
            base = self.current_version(name)
            if base < 0:
                ws, n, st = self._write_set(name, df, self._stats_for(name, stats_cols))
                try:
                    self._try_commit(name, -1, [ws], "create", {ws: st})
                    return n
                except CommitConflict:
                    self._drop_write_set(name, ws)
                    continue
            fresh = insert_missing(df, self.read(name, base), keys)
            ws, n, st = self._write_set(name, fresh, self._stats_for(name, stats_cols))
            if n == 0:
                self._drop_write_set(name, ws)
                # nothing to add relative to `base`; a later version can
                # only contain MORE keys for these semantics (appends) —
                # but an interleaved overwrite could have removed rows, so
                # only short-circuit when still current
                if self.current_version(name) == base:
                    return 0
                continue
            prior = self._load_manifest(name, base)
            dirs = prior["dirs"] + [ws]
            merged_stats = {**prior.get("stats", {}), ws: st}
            try:
                self._try_commit(name, base, dirs, "append_missing", merged_stats)
                return n
            except CommitConflict:
                self._drop_write_set(name, ws)
                continue
        raise CommitConflict(
            f"{name}: append_missing exceeded {self.max_retries} retries"
        )

    def upsert(
        self,
        name: str,
        df: DataFrame,
        keys: Sequence[str],
        stats_cols: Sequence[str] = (),
    ) -> None:
        """INSERT ... ON CONFLICT DO UPDATE (last-writer-wins per key),
        serializable: the merge is recomputed against the exact snapshot
        the CAS extends, so concurrent upserts of disjoint keys both
        survive and same-key races resolve to the later committed merge."""
        for _ in range(self.max_retries):
            base = self.current_version(name)
            if base < 0:
                ws, _, st = self._write_set(name, df, self._stats_for(name, stats_cols))
                try:
                    self._try_commit(name, -1, [ws], "create", {ws: st})
                    return
                except CommitConflict:
                    self._drop_write_set(name, ws)
                    continue
            merged = upsert_plan(df, self.read(name, base), keys)
            ws, _, st = self._write_set(name, merged, self._stats_for(name, stats_cols))
            try:
                self._try_commit(name, base, [ws], "upsert", {ws: st})
                return
            except CommitConflict:
                self._drop_write_set(name, ws)
                continue
        raise CommitConflict(f"{name}: upsert exceeded {self.max_retries} retries")

    def delete_where(
        self,
        name: str,
        where: Sequence[tuple[str, str, object]],
        stats_cols: Sequence[str] = (),
    ) -> int:
        """Row-level DELETE (the right-to-be-forgotten operation a
        training-data table must support): rewrite WITHOUT the matching
        rows as a new snapshot, serializable under concurrent writers via
        the same CAS loop — a concurrent append that loses the race is
        recomputed against the post-delete snapshot, and vice versa.
        Returns rows deleted. Write sets whose statistics prove they hold
        no matching rows are REUSED by reference (their files are not
        rewritten): a targeted delete from a well-clustered table rewrites
        only the affected write sets, not the table."""
        if not where:
            raise ValueError("delete_where requires at least one predicate")
        for _, op, _ in where:
            if op not in _PRED_OPS:
                raise ValueError(
                    f"unsupported predicate op {op!r}; use one of "
                    f"{sorted(_PRED_OPS)}"
                )
        for _ in range(self.max_retries):
            base = self.current_version(name)
            if base < 0:
                raise FileNotFoundError(
                    f"table {name!r} has no committed version"
                )
            manifest = self._load_manifest(name, base)
            if not stats_cols:
                # keep the table's data-skipping metadata alive across
                # deletes (the compact convention)
                stats_cols = sorted(
                    {c for s in manifest.get("stats", {}).values() for c in s}
                )
            touched = self._prune_dirs(manifest, where)
            kept = [d for d in manifest["dirs"] if d not in touched]
            if not touched:
                return 0
            bdir = self._data_dir(name)
            affected = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(bdir, d) for d in touched]
            )
            keep_pred = None
            for col, op, value in where:
                c = _PRED_OPS[op](F.col(col), F.lit(value))
                keep_pred = c if keep_pred is None else keep_pred & c
            # SQL DELETE removes rows where the predicate is TRUE; a NULL
            # predicate (e.g. a column added by schema evolution that old
            # write sets read as NULL) must KEEP the row — a bare
            # ~keep_pred would drop it under three-valued logic
            survivors = affected.filter(
                ~F.coalesce(keep_pred, F.lit(False))
            )
            n_before = affected.count()
            ws, n_after, st = self._write_set(name, survivors, stats_cols)
            if n_after == n_before:
                # stats said "may match" but nothing actually did
                self._drop_write_set(name, ws)
                if self.current_version(name) == base:
                    return 0
                continue
            # the rewritten set is referenced even when empty: its 0-row
            # parquet carries the schema, so a delete-everything leaves a
            # readable, appendable empty table instead of dirs=[]
            dirs = kept + [ws]
            stats = {
                d: s
                for d, s in manifest.get("stats", {}).items()
                if d in kept
            }
            stats[ws] = st
            try:
                self._try_commit(name, base, dirs, "delete", stats)
                return n_before - n_after
            except CommitConflict:
                self._drop_write_set(name, ws)
                continue
        raise CommitConflict(
            f"{name}: delete_where exceeded {self.max_retries} retries"
        )

    # -- maintenance ------------------------------------------------------

    def table_changes(
        self,
        name: str,
        from_version: int,
        to_version: int | None = None,
        keys: Sequence[str] = (),
    ) -> DataFrame:
        """Row-level change feed between two committed snapshots (the
        Delta Lake change-data-feed idea, computed from immutable write
        sets instead of logged change files): every table column plus
        ``_change_type`` in {'insert', 'delete', 'update_preimage',
        'update_postimage'}.

        Manifest-level pruning does the heavy lifting: write sets shared
        by both manifests reference the SAME immutable files, so their
        rows cannot differ — only the symmetric difference of the two
        dir lists is ever scanned. An upsert that rewrites the table
        diffs rewritten-set vs rewritten-set; an append diffs one new
        set against nothing; unchanged history costs zero I/O.

        Requires ``keys`` to be unique per snapshot — the invariant
        append_missing/upsert/delete_where maintain. Value changes are
        detected by xxhash64 over the non-key columns (null-safe,
        deterministic); schema-evolved snapshots align by name with
        missing columns read as NULL, so adding a column does not flag
        untouched rows."""
        if not keys:
            raise ValueError("table_changes requires the table's key columns")
        v2 = self.current_version(name) if to_version is None else to_version
        m1 = self._load_manifest(name, from_version)
        m2 = self._load_manifest(name, v2)
        d1, d2 = set(m1["dirs"]), set(m2["dirs"])
        only1, only2 = sorted(d1 - d2), sorted(d2 - d1)
        base = self._data_dir(name)
        # schema source: the differing write sets only — shared sets are
        # not even footer-read. Under additive evolution the newest sets
        # (always in the diff of a changing table) carry the union schema;
        # the same-version case falls back to the v2 manifest.
        src = (only1 + only2) or m2["dirs"]
        empty = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*[os.path.join(base, d) for d in src])
            .limit(0)
            .withColumn("_change_type", F.lit(""))
        )
        if not only1 and not only2:
            return empty
        ordered = [c for c in empty.columns if c != "_change_type"]

        def _subset(dirs: list[str]) -> DataFrame:
            if not dirs:
                return empty.select(*ordered)
            df = self.spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(base, d) for d in dirs]
            )
            for c in ordered:
                if c not in df.columns:
                    df = df.withColumn(
                        c, F.lit(None).cast(empty.schema[c].dataType)
                    )
            return df.select(*ordered)

        old, new = _subset(only1), _subset(only2)
        val_cols = sorted(c for c in ordered if c not in keys)
        row_hash = (
            F.xxhash64(*[F.col(c) for c in val_cols])
            if val_cols
            else F.lit(0).cast("long")
        )
        oldh = old.withColumn("__h", row_hash)
        newh = new.withColumn("__h", row_hash)
        klist = list(keys)
        inserts = newh.join(oldh.select(klist), klist, "leftanti").withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = oldh.join(newh.select(klist), klist, "leftanti").withColumn(
            "_change_type", F.lit("delete")
        )
        changed = (
            oldh.select(*klist, F.col("__h").alias("__h_old"))
            .join(newh.select(*klist, "__h"), klist)
            .filter(F.col("__h") != F.col("__h_old"))
            .select(klist)
        )
        pre = oldh.join(changed, klist, "leftsemi").withColumn(
            "_change_type", F.lit("update_preimage")
        )
        post = newh.join(changed, klist, "leftsemi").withColumn(
            "_change_type", F.lit("update_postimage")
        )
        out = inserts.unionByName(deletes).unionByName(pre).unionByName(post)
        return out.select(*ordered, "_change_type")

    def restore(self, name: str, version: int) -> int:
        """Delta-style RESTORE: roll the table back to an older snapshot by
        committing a NEW version whose manifest references the old
        version's write sets (history is preserved — a rollback is itself
        an auditable commit, and the rolled-back versions stay readable
        until vacuumed). Serializable via the same CAS loop as every
        write; returns the new head version.

        The restored manifest re-references the old write sets BY NAME, so
        no data is copied and vacuum keeps them alive as long as a
        retained manifest points at them."""
        old = self._load_manifest(name, version)
        for _ in range(self.max_retries):
            base = self.current_version(name)
            if base < 0:
                raise FileNotFoundError(
                    f"table {name!r} has no committed version"
                )
            try:
                self._try_commit(
                    name,
                    base,
                    list(old["dirs"]),
                    f"restore:v{version}",
                    dict(old.get("stats", {})),
                )
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(
            f"{name}: restore exceeded {self.max_retries} retries"
        )

    def vacuum(
        self, name: str, keep_versions: int = 1, min_age_s: float = 3600.0
    ) -> int:
        """Delete write sets referenced by NO retained manifest (crash
        orphans and superseded snapshots) and manifests older than the
        retained window. Returns directories removed. Like Delta VACUUM,
        concurrent readers of vacuumed-away old versions would break —
        ``keep_versions`` is that retention window.

        ``min_age_s`` protects LIVE writers: a concurrent commit
        materializes its write set BEFORE the manifest references it, so
        an unreferenced-but-fresh directory may belong to an in-flight
        transaction — only directories older than the window are removed
        (Delta's retention-check, defaulting to 1 hour; tests pass 0)."""
        latest = self.current_version(name)
        if latest < 0:
            return 0
        keep = range(max(0, latest - keep_versions + 1), latest + 1)
        referenced: set[str] = set()
        for v in keep:
            # versions inside the window may already have been dropped by
            # an earlier, tighter vacuum — retain what remains
            try:
                referenced |= set(self._load_manifest(name, v)["dirs"])
            except FileNotFoundError:
                continue
        removed = 0
        now = time.time()
        ddir = self._data_dir(name)
        for d in os.listdir(ddir) if os.path.isdir(ddir) else []:
            full = os.path.join(ddir, d)
            try:
                fresh = now - os.path.getmtime(full) < min_age_s
            except OSError:
                continue
            if d not in referenced and not fresh:
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
        # crashed compacts leave staging dirs; same age gate as above
        sdir = os.path.join(self.path(name), "_staging")
        for d in os.listdir(sdir) if os.path.isdir(sdir) else []:
            full = os.path.join(sdir, d)
            try:
                if now - os.path.getmtime(full) >= min_age_s:
                    shutil.rmtree(full, ignore_errors=True)
                    removed += 1
            except OSError:
                pass
        mdir = self._manifest_dir(name)
        for f in os.listdir(mdir):
            if f.startswith("v") and f.endswith(".json"):
                if int(f[1:-5]) < keep.start:
                    os.unlink(os.path.join(mdir, f))
        return removed

    def compact(
        self,
        name: str,
        num_files: int = 8,
        cluster_by: Sequence[str] = (),
        zorder: bool = False,
    ) -> None:
        """OPTIMIZE: rewrite the current snapshot as one write set. Just an
        ``overwrite`` of a coalesced self-read — the CAS loop makes it safe
        to run while writers are active (their commits simply land after).
        Statistics columns carry over from the current manifest so a
        compacted table keeps its data-skipping metadata.

        ``cluster_by`` range-partitions and sorts the rewrite on those
        columns (Delta's OPTIMIZE ... ZORDER idea, linearized): each output
        write set then covers a narrow, non-overlapping value range, so the
        manifest min/max statistics become tight and ``read(where=...)``
        pruning is effective even when the original ingest order was
        uncorrelated with the query key. One clustered write set is
        committed per range partition (a single-write-set compact would
        collapse the manifest to one all-covering range and prune
        nothing).

        ``zorder=True`` (exactly two cluster columns) clusters on the
        Morton-interleaved key instead of the linear sort — Delta's
        OPTIMIZE ZORDER: each write set then covers a narrow range in
        BOTH dimensions, so predicates on either column alone still
        prune, where linear clustering only serves its leading column.

        Concurrency: the rewrite CASes against EXACTLY the version it
        read. A concurrent commit landing first makes the rewrite stale —
        the loser discards its write sets and recompacts from the new
        snapshot, so no concurrently committed rows are ever dropped
        (a re-CAS of the stale rewrite at the next version would silently
        erase the interleaved commit)."""
        for _ in range(self.max_retries):
            base = self.current_version(name)
            manifest = self._load_manifest(name, base)
            stats_cols = sorted(
                {c for s in manifest.get("stats", {}).values() for c in s}
            )
            current = self.read(name, base)
            if not cluster_by:
                ws, _, st = self._write_set(
                    name, current.coalesce(num_files), stats_cols
                )
                write_sets = {ws: st}
            else:
                stats_cols = sorted(set(stats_cols) | set(cluster_by))
                write_sets = self._clustered_write_sets(
                    name, current, num_files, cluster_by, zorder, stats_cols
                )
            try:
                self._try_commit(
                    name, base, list(write_sets), "compact", write_sets
                )
                return
            except CommitConflict:
                for ws in write_sets:
                    self._drop_write_set(name, ws)
                continue
        raise CommitConflict(f"{name}: compact exceeded {self.max_retries} retries")

    def _clustered_write_sets(
        self,
        name: str,
        current: DataFrame,
        num_files: int,
        cluster_by: Sequence[str],
        zorder: bool,
        stats_cols: Sequence[str],
    ) -> dict[str, dict]:
        """Materialize the clustered rewrite: ONE write job produces every
        range partition as its own directory (partitionBy keys the layout
        on __pid); each becomes an independent write set so manifest stats
        describe disjoint ranges. Stats for all sets come from one grouped
        agg pass."""
        if zorder:
            from icenetetl_spark.operators.scale import zorder_key

            key = zorder_key(current, list(cluster_by))
            clustered = (
                current.withColumn("__zk", key)
                .repartitionByRange(num_files, F.col("__zk"))
                .sortWithinPartitions("__zk")
                .drop("__zk")
            )
        else:
            clustered = current.repartitionByRange(
                num_files, *cluster_by
            ).sortWithinPartitions(*cluster_by)
        clustered = clustered.withColumn("__pid", F.spark_partition_id())
        staging = os.path.join(
            self.path(name), "_staging", f"compact-{uuid.uuid4().hex}"
        )
        clustered.write.partitionBy("__pid").parquet(staging)
        back = self.spark.read.parquet(staging)
        aggs = [F.count(F.lit(1))]
        for c in stats_cols:
            aggs += [F.min(c), F.max(c)]
        stat_rows = back.groupBy("__pid").agg(*aggs).collect()
        write_sets: dict[str, dict] = {}
        for row in sorted(stat_rows, key=lambda r: r["__pid"]):
            ws = f"ws-{uuid.uuid4().hex}"
            os.rename(
                os.path.join(staging, f"__pid={row['__pid']}"),
                os.path.join(self._data_dir(name), ws),
            )
            write_sets[ws] = {
                c: [_json_stat(row[2 + 2 * i]), _json_stat(row[3 + 2 * i])]
                for i, c in enumerate(stats_cols)
            }
        shutil.rmtree(staging, ignore_errors=True)
        return write_sets
