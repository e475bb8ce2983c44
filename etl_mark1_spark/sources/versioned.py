"""Versioned parquet tables: atomic snapshots + time travel, no deps.

The reference's only notion of a "table" is a file that gets overwritten
(backend/services/file_service.py); overwriting parquet in place leaves
readers racing half-written directories. This module gives the write side
snapshot-isolation semantics with nothing but parquet + a manifest file —
the core discipline of Delta/Iceberg, scoped to what an engine without
their jars can guarantee:

- every write lands in a NEW immutable version directory ``v=N``;
- a single small ``_MANIFEST.json`` names the current version, committed
  by atomic rename — readers see the old snapshot or the new one, never
  a mix;
- old versions remain readable (``version=N`` time travel) until
  ``vacuum`` removes them.

At 100 TB the same layout holds: version dirs are written by the cluster
(parallel parquet), only the KB-sized claim+commit step is serialized.
Appends are REWRITE-FREE: a delta writes only its own ``v=N`` directory
and the manifest entry lists the full directory set composing the
snapshot (``dirs``) — append cost is O(delta), never O(table), and
``vacuum`` frees shared directories by reference count. Concurrent
writers — overwrite or append — all commit: the expensive parquet write
runs unserialized, then the atomic ``os.rename`` of the staged
directory onto ``v=N`` (the claim on the version number) and the
read-merge manifest commit run under an advisory ``flock``, so no
writer's history entry is lost and an append chains onto whatever
snapshot is current at commit time. On object stores without
rename/flock, the equivalent claims are conditional PUTs.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, MANIFEST)


def read_manifest(table_dir: str) -> dict:
    with open(_manifest_path(table_dir)) as fh:
        return json.load(fh)


def _disk_versions(table_dir: str) -> list[int]:
    """Version numbers present as ``v=N`` directories on disk — committed
    or not. A crash between the version-dir rename and the manifest commit
    leaves an uncommitted ``v=N``; version allocation must skip it or the
    next writer wedges on renaming onto a non-empty directory."""
    out = []
    for name in os.listdir(table_dir):
        if name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return out


def _commit_manifest(table_dir: str, manifest: dict) -> None:
    """Atomic replace: write a sibling temp file, rename over the live
    manifest (POSIX rename is atomic within a filesystem; on object
    stores, the equivalent is a conditional PUT of the manifest key)."""
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._manifest_")
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, _manifest_path(table_dir))


class _manifest_lock:
    """Advisory exclusive lock serializing manifest read-merge-commit
    sections across processes/threads on the same filesystem. Readers
    never take it (they see the old or new manifest atomically via the
    rename); without fcntl (non-POSIX) it degrades to a no-op and the
    commit falls back to the pre-lock last-merge-wins behavior."""

    def __init__(self, table_dir: str):
        self._path = os.path.join(table_dir, "._manifest_lock")
        self._fh = None

    def __enter__(self):
        try:
            import fcntl

            self._fh = open(self._path, "a")
            fcntl.flock(self._fh, fcntl.LOCK_EX)
        except ImportError:
            self._fh = None
        return self

    def __exit__(self, *exc):
        if self._fh is not None:
            self._fh.close()  # closing drops the flock
        return False


def _entry_dirs(entry: dict) -> list[str]:
    """Directories composing a version's snapshot (multi-dir for
    rewrite-free appends; single-dir entries predate the field)."""
    return list(entry.get("dirs", [entry["dir"]]))


def _snapshot_types(spark: SparkSession, table_dir: str,
                    entry: dict) -> dict[str, str]:
    """Column -> dtype map of a committed snapshot. New manifest entries
    record it (``schema``) so appends can validate without touching data;
    legacy entries fall back to the parquet footers (metadata-only)."""
    if "schema" in entry:
        return dict(entry["schema"])
    paths = [os.path.join(table_dir, d) for d in _entry_dirs(entry)]
    reader = spark.read
    if len(paths) > 1:
        reader = reader.option("mergeSchema", "true")
    return dict(reader.parquet(*paths).dtypes)


def _validate_append(cur_types: dict[str, str], new_types: dict[str, str],
                     evolve: bool) -> None:
    if evolve:
        for c, t in new_types.items():
            if c in cur_types and cur_types[c] != t:
                raise ValueError(
                    f"schema evolution cannot change column {c!r} "
                    f"({cur_types[c]} -> {t}); add a new column")
    elif cur_types != new_types:
        raise ValueError(
            f"append schema mismatch: table has {sorted(cur_types)}, "
            f"delta has {sorted(new_types)}; pass evolve=True to widen")


def write_version(df: DataFrame, table_dir: str, mode: str = "overwrite",
                  note: str = "", evolve: bool = False) -> int:
    """Commit ``df`` as the next version of the table; returns the version.

    ``mode="overwrite"`` makes the new version the full table;
    ``mode="append"`` is REWRITE-FREE: only the delta is written as the
    new ``v=N`` directory and the manifest entry lists the full set of
    directories composing the snapshot (``dirs``) — append cost is
    O(delta), never O(table), which is what an append-heavy 100 TB
    table needs. Readers union the listed dirs, so time travel and
    snapshot isolation are unchanged. Appends require an identical
    schema (names and types) unless ``evolve=True``, which widens by
    name: new columns appear with NULLs backfilled for history, dropped
    columns stay with NULLs for the new rows — the additive half of
    lakehouse schema evolution (type CHANGES still refuse; silently
    coercing history is how tables rot). The version directory
    is fully written BEFORE the manifest commit, so a crash mid-write
    leaves an orphan directory, never a corrupt table — and version
    numbers are allocated past any orphan ``v=N`` left by a crash in the
    rename-to-commit window (``vacuum`` deletes such orphans), so the
    next write never collides with one.

    Concurrency: the expensive parquet write happens OUTSIDE the lock;
    the version-number claim (atomic rename onto ``v=N``) and the
    read-merge manifest commit run UNDER the advisory lock, so racing
    writers — overwrite or append — all commit, with appends correctly
    chaining onto whatever snapshot is current at commit time (a delta
    embeds no other writer's data, so serializing only the cheap claim
    step is sufficient).
    """
    os.makedirs(table_dir, exist_ok=True)
    try:
        manifest = read_manifest(table_dir)
    except FileNotFoundError:
        manifest = {"table": os.path.basename(table_dir.rstrip("/")),
                    "current": -1, "versions": []}
    new_types = dict(df.dtypes)
    if mode == "append" and manifest["current"] >= 0:
        # fail fast BEFORE the expensive parquet write; re-validated under
        # the lock if a concurrent writer moved the base in the meantime
        base = next(v for v in manifest["versions"]
                    if v["version"] == manifest["current"])
        _validate_append(_snapshot_types(df.sparkSession, table_dir, base),
                         new_types, evolve)
    elif mode not in ("overwrite", "append"):
        raise ValueError(f"unsupported mode: {mode}")
    # stage under a temp name, then rename: a concurrent reader listing
    # the table dir never sees a half-written v=N
    staging = os.path.join(table_dir, f".staging_{uuid.uuid4().hex[:8]}")
    df.write.parquet(staging)
    with _manifest_lock(table_dir):
        try:
            fresh = read_manifest(table_dir)
        except FileNotFoundError:
            fresh = manifest
        snap_types = dict(new_types)
        if mode == "append" and fresh["current"] >= 0:
            base = next(v for v in fresh["versions"]
                        if v["version"] == fresh["current"])
            # Re-validate against the ACTUAL base under the lock: the delta
            # chains onto whatever snapshot is current at commit time, and a
            # concurrent writer may have moved it (with a different schema)
            # since the pre-lock fail-fast check — without this, a racing
            # overwrite slips a mixed-schema chain past evolve=False.
            base_types = _snapshot_types(df.sparkSession, table_dir, base)
            try:
                _validate_append(base_types, new_types, evolve)
            except ValueError:
                import shutil

                shutil.rmtree(staging, ignore_errors=True)
                raise
            # the committed snapshot's schema is the merge: base columns
            # keep their types (dropped ones backfill NULL), new evolved
            # columns join at the end
            snap_types = dict(base_types)
            snap_types.update({c: t for c, t in new_types.items()
                               if c not in base_types})
        # Claim a version number under the lock: the atomic rename onto
        # v=N fails when an (unlocked legacy / crashed) writer's dir
        # occupies N — re-allocate past it and retry.
        for _ in range(64):
            version = max([fresh["current"],
                           *_disk_versions(table_dir)]) + 1
            vdir = os.path.join(table_dir, f"v={version}")
            try:
                os.rename(staging, vdir)
                break
            except OSError:
                continue
        else:
            raise RuntimeError(f"could not claim a version in {table_dir} "
                               "after 64 attempts")
        if mode == "append" and fresh["current"] >= 0:
            dirs = _entry_dirs(base) + [f"v={version}"]
        else:
            dirs = [f"v={version}"]
        entry = {
            "version": version, "dir": f"v={version}", "dirs": dirs,
            "schema": snap_types,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
            "note": note,
        }
        # read-merge commit: a concurrent writer's entry committed since
        # our first read survives (committing a stale manifest would
        # clobber its history entry, stranding a live version dir)
        fresh["versions"] = sorted(
            [v for v in fresh["versions"] if v["version"] != version]
            + [entry], key=lambda v: v["version"])
        fresh["current"] = max(fresh["current"], version)
        _commit_manifest(table_dir, fresh)
    return version


def read_table(spark: SparkSession, table_dir: str,
               version: int | None = None) -> DataFrame:
    """Read the current snapshot, or ``version=N`` for time travel.
    A snapshot is the union of its manifest entry's directories (one for
    overwrites, base + deltas for rewrite-free appends); multi-dir reads
    merge schemas so evolved columns backfill with NULLs."""
    manifest = read_manifest(table_dir)
    if version is None:
        version = manifest["current"]
    entry = next((v for v in manifest["versions"]
                  if v["version"] == version), None)
    if entry is None:
        raise ValueError(
            f"version {version} not in table {table_dir} "
            f"(have {sorted(v['version'] for v in manifest['versions'])})")
    dirs = _entry_dirs(entry)
    paths = [os.path.join(table_dir, d) for d in dirs]
    reader = spark.read
    if len(paths) > 1:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def history(table_dir: str) -> list[dict]:
    """Commit log, oldest first."""
    return list(read_manifest(table_dir)["versions"])


def _dir_stats(path: str) -> tuple[int, int]:
    """(parquet_file_count, total_parquet_bytes) under ``path``."""
    count = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                count += 1
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    continue
    return count, total


def compact_table(spark: SparkSession, table_dir: str,
                  target_file_mb: int = 128,
                  cluster_by: list[str] | None = None,
                  full: bool = False, note: str = "compact",
                  output_files: int | None = None) -> int | None:
    """OPTIMIZE for versioned tables: rewrite the current snapshot's
    small-file directories into one right-sized directory and commit the
    result as a new version. Returns the new version, or ``None`` when
    there was nothing to compact (or the snapshot was replaced by an
    overwrite mid-compaction — maintenance yields to real writes).

    Why it exists: rewrite-free appends (``write_version(mode="append")``)
    and the streaming ingest sinks commit one directory per batch — the
    small-files problem. Every snapshot read then unions an ever-growing
    directory list and opens thousands of KB-sized parquet files; at
    100 TB the NameNode/listing and per-file open costs dominate the scan.
    Compaction is the amortization: one rewrite collapses the chain, and
    the refcount :func:`vacuum` frees the replaced directories once no
    live version references them. History is untouched — time travel to
    pre-compaction versions still reads the old directory sets.

    Selection: a directory is "small-filed" when its average parquet file
    size is under half of ``target_file_mb``; ``full=True`` rewrites every
    directory (use with ``cluster_by`` to re-cluster a whole snapshot).
    The rewrite repartitions to ``ceil(bytes / target_file_mb)`` output
    files; with ``cluster_by`` it range-partitions + sorts on those
    columns instead, so each output file covers a disjoint key range and
    parquet min/max stats let later scans skip files (the OPTIMIZE
    ZORDER-lite that actually matters for pruning). ``output_files``
    overrides the byte-derived count — set it to match a downstream
    consumer's parallelism.

    Concurrency: the rewrite runs OUTSIDE the lock. Under the lock the
    fresh manifest is re-read — concurrent APPENDS are fine (their delta
    dirs are carried into the new entry unchanged); a concurrent
    OVERWRITE aborts the compaction (its snapshot no longer contains the
    rewritten dirs) and the staged directory is removed."""
    import math
    import shutil

    manifest = read_manifest(table_dir)
    if manifest["current"] < 0:
        return None
    entry = next(v for v in manifest["versions"]
                 if v["version"] == manifest["current"])
    dirs = _entry_dirs(entry)
    stats = {d: _dir_stats(os.path.join(table_dir, d)) for d in dirs}
    threshold = target_file_mb * 1024 * 1024 / 2
    if full:
        selected = list(dirs)
    else:
        selected = [d for d in dirs
                    if stats[d][0] > 0
                    and stats[d][1] / stats[d][0] < threshold]
    total_files = sum(stats[d][0] for d in selected)
    total_bytes = sum(stats[d][1] for d in selected)
    n_out = output_files or max(
        1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    if not selected or (len(selected) < 2 and total_files <= n_out):
        return None  # already compact
    reader = spark.read
    if len(selected) > 1:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[os.path.join(table_dir, d) for d in selected])
    if cluster_by:
        df = df.repartitionByRange(n_out, *cluster_by) \
               .sortWithinPartitions(*cluster_by)
    else:
        df = df.repartition(n_out)
    staging = os.path.join(table_dir, f".staging_{uuid.uuid4().hex[:8]}")
    df.write.parquet(staging)
    with _manifest_lock(table_dir):
        fresh = read_manifest(table_dir)
        cur = next((v for v in fresh["versions"]
                    if v["version"] == fresh["current"]), None)
        fresh_dirs = _entry_dirs(cur) if cur else []
        if cur is None or not set(selected) <= set(fresh_dirs):
            shutil.rmtree(staging, ignore_errors=True)
            return None  # snapshot replaced mid-compaction: yield
        for _ in range(64):
            version = max([fresh["current"],
                           *_disk_versions(table_dir)]) + 1
            vdir = os.path.join(table_dir, f"v={version}")
            try:
                os.rename(staging, vdir)
                break
            except OSError:
                continue
        else:
            raise RuntimeError(f"could not claim a version in {table_dir} "
                               "after 64 attempts")
        # carry concurrent appends' deltas; replace only what we rewrote
        new_dirs = [d for d in fresh_dirs if d not in selected]
        new_dirs.append(f"v={version}")
        new_entry = {
            "version": version, "dir": f"v={version}", "dirs": new_dirs,
            "schema": cur.get("schema", {}),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
            "note": f"{note} ({len(selected)} dirs, {total_files} files "
                    f"-> {n_out})",
        }
        fresh["versions"] = sorted(
            [v for v in fresh["versions"] if v["version"] != version]
            + [new_entry], key=lambda v: v["version"])
        fresh["current"] = max(fresh["current"], version)
        _commit_manifest(table_dir, fresh)
    return version


def table_changes(spark: SparkSession, table_dir: str, key_cols: list[str],
                  from_version: int,
                  to_version: int | None = None, *,
                  force_keyed_diff: bool = False) -> DataFrame:
    """Change data feed between two committed versions: the keyed
    insert/update/delete rows that turn snapshot ``from_version`` into
    ``to_version`` (default: current) — the lakehouse CDF shape
    (Delta's ``table_changes``).

    APPEND-ONLY FAST PATH: when ``from_version``'s directory set is a
    subset of ``to_version``'s (i.e. every intervening commit was a
    rewrite-free append — the manifest records exactly which ``v=N``
    dirs compose each snapshot), the changes are precisely the rows of
    the delta directories, all inserts. Those dirs are read DIRECTLY:
    no join, no scan of either snapshot — O(delta) compute for an
    O(delta) feed, which is what incremental aggregate maintenance on
    an append-heavy 100 TB table needs.

    FAST-PATH KEY CONTRACT (checked, not just assumed): the fast path
    requires keys not be re-appended within the range — under duplicate
    keys its all-insert feed and the keyed diff's 'update' rows are NOT
    interchangeable shapes. Duplicates WITHIN the delta are detected
    with one O(delta) aggregation and raise ``ValueError``; a re-append
    of a key that already existed in the base snapshot is O(table) to
    detect, so callers whose writers may do that must pass
    ``force_keyed_diff=True`` to skip the fast path and get the keyed
    full-outer diff semantics ('update' rows) instead.

    Across an overwrite boundary the dirs diverge and the feed falls
    back to one full-outer keyed diff of the two snapshots
    (operators/cdc.py:snapshot_diff) — feed size is still proportional
    to churn, but compute is O(table), unavoidable when the writer
    rewrote the table."""
    from etl_mark1_spark.operators.cdc import snapshot_diff

    manifest = read_manifest(table_dir)
    if to_version is None:
        to_version = manifest["current"]

    def _entry(v: int) -> dict:
        e = next((x for x in manifest["versions"] if x["version"] == v),
                 None)
        if e is None:
            raise ValueError(
                f"version {v} not in table {table_dir} (have "
                f"{sorted(x['version'] for x in manifest['versions'])})")
        return e

    from_dirs = set(_entry_dirs(_entry(from_version)))
    to_dirs = set(_entry_dirs(_entry(to_version)))
    if from_dirs <= to_dirs and not force_keyed_diff:
        to_snap = read_table(spark, table_dir, version=to_version)
        payload = [c for c in to_snap.columns if c not in key_cols]
        delta = sorted(to_dirs - from_dirs)
        if delta:
            reader = spark.read
            if len(to_dirs) > 1:
                reader = reader.option("mergeSchema", "true")
            rows = reader.parquet(
                *[os.path.join(table_dir, d) for d in delta])
            dup = (rows.groupBy(*key_cols).count()
                   .filter(F.col("count") > 1).limit(1).collect())
            if dup:
                raise ValueError(
                    f"append fast path: key {key_cols} re-appended within "
                    f"versions {from_version}..{to_version} of {table_dir} "
                    f"(e.g. {tuple(dup[0])[:len(key_cols)]}); an all-insert "
                    "feed would mislead keyed consumers — pass "
                    "force_keyed_diff=True for keyed diff semantics")
        else:
            rows = to_snap.limit(0)
        # align to the to-snapshot schema: evolved columns the delta dirs
        # predate backfill as NULL, exactly as the snapshot read merges them
        aligned = [
            (F.col(c) if c in rows.columns
             else F.lit(None)).cast(to_snap.schema[c].dataType).alias(c)
            for c in to_snap.columns]
        rows = rows.select(*aligned)
        return rows.select(
            *key_cols,
            F.lit("insert").alias("change_type"),
            *[F.col(c).alias(f"new_{c}") for c in payload],
            *[F.lit(None).cast(to_snap.schema[c].dataType)
              .alias(f"old_{c}") for c in payload])

    return snapshot_diff(read_table(spark, table_dir, version=from_version),
                         read_table(spark, table_dir, version=to_version),
                         key_cols)


def _tree_mtime(path: str) -> float:
    """Newest mtime across a directory tree (the dir itself, every
    subdirectory, every file). Raises OSError only if the root is gone;
    entries that vanish mid-walk (concurrent rename/cleanup) are
    skipped."""
    newest = os.path.getmtime(path)
    for root, dirs, files in os.walk(path):
        for entry in dirs + files:
            try:
                newest = max(newest,
                             os.path.getmtime(os.path.join(root, entry)))
            except OSError:
                continue
    return newest


def vacuum(table_dir: str, keep_last: int = 1,
           staging_grace_sec: float = 3600.0) -> list[int]:
    """Drop all but the last ``keep_last`` versions (tagged versions are
    always kept — see :func:`tag_version`), stale orphaned staging
    dirs from crashed writes, AND any uncommitted ``v=N`` dirs (renamed
    but never manifest-committed — the crash window's leftover); returns
    removed committed version numbers. Readers of a removed version fail
    loudly on their next manifest check — retention policy is the
    caller's contract, as in any snapshot table.

    Concurrency: the manifest read-modify-write AND the directory sweep
    run under the same advisory lock as write commits, so a vacuum racing
    a writer can neither clobber a freshly committed manifest entry nor
    delete a just-claimed ``v=N`` (claims happen under the lock).
    Writers stage parquet OUTSIDE the lock, so an in-flight
    ``.staging_`` dir is indistinguishable from a crashed one by name —
    only staging dirs idle for ``staging_grace_sec`` are swept, where
    idle means the newest mtime ANYWHERE in the staging tree (Spark
    lands part files under nested ``_temporary/`` dirs without bumping
    the top-level mtime). Grace must still exceed the longest single
    part-file write. Where ``fcntl``
    is unavailable the lock degrades to a no-op and vacuum requires
    externally-guaranteed exclusive access.

    Rewrite-free appends SHARE directories across versions (a delta's
    base dirs belong to older versions too), so deletion is by
    REFERENCE COUNT: a directory is removed only when no kept version's
    ``dirs`` list names it — dropping an old version of an append chain
    frees nothing until every snapshot built on its dirs is dropped
    too, exactly like Delta/Iceberg data-file retention."""
    import shutil

    now = time.time()
    with _manifest_lock(table_dir):
        manifest = read_manifest(table_dir)
        keep = set([v["version"] for v in manifest["versions"]][-keep_last:])
        keep |= set(manifest.get("tags", {}).values())  # tags pin snapshots
        removed = [v["version"] for v in manifest["versions"]
                   if v["version"] not in keep]
        manifest["versions"] = [v for v in manifest["versions"]
                                if v["version"] in keep]
        _commit_manifest(table_dir, manifest)
        # disk cleanup by refcount: anything not named by a kept entry
        # goes — orphans of crashed commits and dropped append bases
        keep_dirs = {d for v in manifest["versions"]
                     for d in _entry_dirs(v)}
        for name in os.listdir(table_dir):
            path = os.path.join(table_dir, name)
            if name.startswith(".staging_"):
                # Liveness = the NEWEST mtime anywhere in the staging tree:
                # Spark stages part files under nested _temporary/ subdirs,
                # so the top-level dir mtime can go stale mid-write while
                # tasks are still landing files deeper down.
                try:
                    idle = now - _tree_mtime(path)
                except OSError:
                    continue                 # already gone / being renamed
                if idle >= staging_grace_sec:
                    shutil.rmtree(path, ignore_errors=True)
            elif name.startswith("v=") and name not in keep_dirs:
                shutil.rmtree(path, ignore_errors=True)
    return removed


def tag_version(table_dir: str, name: str,
                version: int | None = None) -> int:
    """Name a snapshot ("train-v1", "baseline") so consumers pin data by
    MEANING instead of a raw version number — the reproducibility handle
    a training run records in its config. Tags default to the current
    version, re-tagging moves the name, and the mapping rides the same
    atomically-committed manifest as everything else (a tag is one map
    entry, not a copy). Returns the tagged version number.

    Tagged versions are PROTECTED from vacuum: retention drops only
    untagged, non-kept versions, so "keep the last 2 plus whatever a tag
    still names" is the emergent policy.
    """
    manifest = read_manifest(table_dir)
    if version is None:
        version = manifest["current"]
    known = {v["version"] for v in manifest["versions"]}
    if version not in known:
        raise ValueError(
            f"cannot tag version {version}: not in {sorted(known)}")
    manifest.setdefault("tags", {})[name] = version
    _commit_manifest(table_dir, manifest)
    return version


def read_tag(spark: SparkSession, table_dir: str, name: str) -> DataFrame:
    """Time travel by tag name."""
    tags = read_manifest(table_dir).get("tags", {})
    if name not in tags:
        raise ValueError(f"no tag {name!r} in {table_dir} "
                         f"(have {sorted(tags)})")
    return read_table(spark, table_dir, version=tags[name])


def delete_tag(table_dir: str, name: str) -> None:
    """Remove a tag (the underlying version stays until vacuum)."""
    manifest = read_manifest(table_dir)
    manifest.get("tags", {}).pop(name, None)
    _commit_manifest(table_dir, manifest)
