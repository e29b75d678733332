"""Versioned snapshot table: the time-travel floor without a table
format.

Each write lands a new immutable ``v=N`` directory plus a tiny JSON
manifest recording (version, row count, written-at, parent). Readers
resolve "latest" (or any pinned version) through the manifest — never
by directory listing races — so a reader concurrent with a writer sees
a complete older snapshot, the same isolation story Delta/Iceberg give
via their logs (which replace this module when available; the API is
deliberately shaped so swapping in `DeltaTable.forPath` is mechanical).

Scale notes: snapshots are full copies — the honest cost of
format-free time travel. `vacuum` bounds storage to the last K
versions. The manifest is O(versions) driver-side JSON, never data.

Takedown semantics: a plain overwrite (or `sinks.delete_where` on a
copy promoted to latest) removes rows from the LIVE view only — old
snapshots keep serving them through time travel until vacuum cycles
them out, i.e. vacuum is the deletion frontier of ordinary writes.
`delete_where_versioned` is the right-to-be-forgotten path: it purges
the key set from EVERY retained snapshot (staged, atomic per version)
so no pinned read can resurrect a deleted row.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_versions.json"


def _load_manifest(path: str) -> list[dict]:
    mf = os.path.join(path, _MANIFEST)
    if not os.path.exists(mf):
        return []
    with open(mf) as fh:
        return json.load(fh)


def _store_manifest(path: str, entries: list[dict]) -> None:
    # write-then-rename: readers never observe a torn manifest
    fd, tmp = tempfile.mkstemp(dir=path, prefix="._versions")
    with os.fdopen(fd, "w") as fh:
        json.dump(entries, fh, indent=1)
    os.replace(tmp, os.path.join(path, _MANIFEST))


def write_version(df: DataFrame, path: str) -> int:
    """Append a new snapshot version; returns its version number. The
    data lands fully in ``v=N`` BEFORE the manifest points at it, so a
    crash mid-write leaves the table at the previous version."""
    os.makedirs(path, exist_ok=True)
    entries = _load_manifest(path)
    version = (entries[-1]["version"] + 1) if entries else 0
    vdir = os.path.join(path, f"v={version}")
    df.write.mode("errorifexists").parquet(vdir)
    n = df.sparkSession.read.parquet(vdir).count()
    entries.append({"version": version, "rows": n,
                    "written_at": time.strftime("%Y-%m-%d %H:%M:%S"),
                    "parent": version - 1 if version else None})
    _store_manifest(path, entries)
    return version


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """Read a pinned ``version`` (time travel) or the latest snapshot."""
    entries = _load_manifest(path)
    if not entries:
        raise FileNotFoundError(f"no versions at {path}")
    versions = {e["version"] for e in entries}
    if version is None:
        version = max(versions)
    if version not in versions:
        raise ValueError(f"version {version} not in {sorted(versions)} "
                         f"at {path} (vacuumed or never written)")
    return spark.read.parquet(os.path.join(path, f"v={version}"))


def table_history(path: str) -> list[dict]:
    """The manifest entries, oldest first (DESCRIBE HISTORY parity)."""
    return _load_manifest(path)


def delete_where_versioned(spark: SparkSession, path: str,
                           keys: DataFrame,
                           key_cols: list[str]) -> dict[int, int]:
    """Key-set row deletion across EVERY retained snapshot — the
    takedown tier for versioned tables. `sinks.delete_where` purges a
    live table, but a versioned table keeps serving deleted rows via
    ``read_version(path, version=old)`` until vacuum cycles the old
    snapshots out; the reference's warehouse DELETE
    (etl-worker/etl_processor/database_postgres.py:10-44 — one live
    table, no snapshot history) has no such residual, so a
    right-to-be-forgotten delete here must rewrite the retained history
    too. Each ``v=N`` directory is rewritten minus the (null-safe)
    matching rows through the staging + atomic-rename discipline, then
    the manifest's row counts are refreshed in one atomic store.

    Crash contract: versions are swapped one at a time, so a crash
    leaves every version either fully purged or fully intact — never
    half-written — and re-running completes the purge (idempotent:
    already-purged versions simply match zero rows). The manifest
    refresh is LAST; between the final swap and the store, readers see
    correct data with stale ``rows`` counts only.

    Returns {version: rows_deleted} for versions that changed. The
    key relation is takedown-sized — it broadcasts; an empty key set
    returns {} without touching any snapshot."""
    from pyspark.sql import functions as F

    from . import _staged_rewrite

    entries = _load_manifest(path)
    if not entries:
        return {}
    dels = keys.select(*key_cols).dropDuplicates(key_cols)
    if dels.limit(1).count() == 0:
        return {}
    dels = dels.localCheckpoint(eager=True)
    deleted: dict[int, int] = {}
    for e in entries:
        vdir = os.path.join(path, f"v={e['version']}")
        snap = spark.read.parquet(vdir)
        missing = set(key_cols) - set(snap.columns)
        if missing:
            raise ValueError(
                f"delete_where_versioned key columns {sorted(missing)} "
                f"not in v={e['version']}")
        cond = None
        for k in key_cols:
            c = snap[k].eqNullSafe(dels[k])
            cond = c if cond is None else (cond & c)
        n_hit = snap.join(F.broadcast(dels), cond, "left_semi").count()
        if n_hit == 0:
            continue
        kept = snap.join(F.broadcast(dels), cond, "left_anti")
        n_kept = _staged_rewrite(spark, kept, vdir)
        # n_hit is the actually-counted match total; the manifest's
        # `rows` value is only trusted for the refresh, never for the
        # reported delete count (a drifted manifest would silently skew
        # `e["rows"] - n_kept`).
        deleted[e["version"]] = n_hit
        e["rows"] = n_kept
    if deleted:
        _store_manifest(path, entries)
    return deleted


def vacuum(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots; returns removed
    version numbers. Manifest shrinks first, then directories are
    deleted — a concurrent reader holding an old version resolved
    BEFORE the vacuum may fail mid-scan, the same contract as Delta's
    vacuum of files past the retention window."""
    entries = _load_manifest(path)
    if len(entries) <= keep_last:
        return []
    cut, keep = entries[:-keep_last], entries[-keep_last:]
    _store_manifest(path, keep)
    removed = []
    for e in cut:
        shutil.rmtree(os.path.join(path, f"v={e['version']}"),
                      ignore_errors=True)
        removed.append(e["version"])
    return removed
