"""Query/oracle registry.

Each registered callable has signature ``(spark, sf_dir) -> DataFrame``.
``oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet tables;
column names/aliases MUST match the Spark result exactly (the driver's
compare sorts columns by name before hashing values). Ops whose semantics
aren't SQL-expressible register with ``oracle=None`` (rows-only check).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


_HANDED_OUT: set[str] = set()
_REGISTERING_PID = os.getpid()


def _reap_at_exit() -> None:
    # A forked child exits through the parent's registered atexit
    # handlers (plain os.fork paths); without the pid guard it would
    # rmtree the PARENT's live cert state mid-run. (Sibling reaping in
    # cert_work_dir is likewise best-effort — pid reuse can keep a dead
    # run's dir alive until the pid frees.)
    if os.getpid() != _REGISTERING_PID:
        return
    for d in _HANDED_OUT:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_reap_at_exit)


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def cert_work_dir(tag: str, sf_dir: str) -> str:
    """Scratch directory for certification queries that materialize
    state (stream ingests, index builds, sink round-trips). md5(sf_dir)
    keeps concurrent SFs apart; the pid keeps concurrent PROCESSES at
    the same SF apart — two runs sharing an md5-only path (builder gate
    + a stray pytest) corrupted each other's streaming state mid-round-10,
    so every filesystem-touching cert routes through here. Callers own
    the rmtree (before AND after); as a backstop against leaked state
    accumulating across runs, sibling ``spark_graft_<tag>_<h>_<pid>``
    dirs whose pid is dead are reaped here, and every dir handed out by
    this process is rmtree'd at interpreter exit."""
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = tempfile.gettempdir()
    prefix = f"spark_graft_{tag}_{h}_"
    try:
        siblings = os.listdir(base)
    except OSError:
        siblings = []
    for name in siblings:
        if not name.startswith(prefix):
            continue
        pid_s = name[len(prefix):]
        if (pid_s.isdigit() and int(pid_s) != os.getpid()
                and not _pid_alive(int(pid_s))):
            shutil.rmtree(os.path.join(base, name), ignore_errors=True)
    out = os.path.join(base, f"{prefix}{os.getpid()}")
    _HANDED_OUT.add(out)
    return out


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco
