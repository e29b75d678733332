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
