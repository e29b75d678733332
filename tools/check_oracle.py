"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark AND its ``oracle_sql()`` twin on
DuckDB at sf0.01 (or --sf-dir), then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, values stringified,
rows sorted). Run before every commit touching queries.

Two hardening layers added after round 8's ``cusum_drift`` miss (the only
red driver row of that round — an uncast HUGEINT output that the old
``fetchall()`` path was structurally blind to):

1. **Pandas-path fetch.** Oracle results come through ``res.df()`` — the
   same DuckDB→pandas conversion surface the driver exercises — instead of
   ``fetchall()``. ``fetchall()`` hands back Python ints for HUGEINT and
   ``datetime`` objects for timestamps, so it certifies a CLEANER type
   surface than the one the driver grades. Any local green through the
   pandas path is now a real prediction of a driver green.
2. **DESCRIBE type guard.** Before running an oracle, ``DESCRIBE`` it and
   FAIL on any output column whose DuckDB type has no faithful pandas
   rendering (HUGEINT/UHUGEINT → float64 beyond 2^53). This class shipped
   twice (r2 ``etl_quality_profile``, r8 ``cusum_drift``); the gate, not
   vigilance, now stops the third.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import datetime
import hashlib
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from light_etl_windows_container_poc_spark.catalog import TABLES, table_path  # noqa: E402

# DuckDB output types with no faithful pandas rendering: HUGEINT/UHUGEINT
# become float64 (precision loss + "38670.0" vs "38670" string drift).
_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def oracle_type_problems(con: "duckdb.DuckDBPyConnection", sql: str) -> list[str]:
    """Return ['col:TYPE', ...] for oracle output columns whose DuckDB type
    cannot round-trip the driver's pandas path. Empty list = safe."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = []
    for row in desc:
        col, typ = row[0], str(row[1]).upper()
        if any(b in typ for b in _BANNED_ORACLE_TYPES):
            bad.append(f"{col}:{typ}")
    return bad


# NaN→NULL normalizations since last reset (see _norm): the driver's
# pandas path makes NULL and NaN one value, so the gate mirrors it —
# but a query that STARTS emitting real NaNs would silently hash green.
# main() surfaces a per-query note whenever this counter moves so a
# NaN-producing regression is at least visible in gate output.
_NAN_NORMALIZED = 0


def _norm(v) -> str:
    global _NAN_NORMALIZED
    # numpy scalars (the pandas path) → Python scalars so bool/int/float
    # normalize identically to Spark's collect() output.
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders SQL NULL in numeric columns as NaN (and a
            # nullable BIGINT column as float64), so through the
            # driver's fetch path NULL and NaN are one value — normalize
            # like the driver or every nullable numeric column goes red
            _NAN_NORMALIZED += 1
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        # pandas renders DATE columns as Timestamps at midnight; Spark
        # collect() gives datetime.date — same driver-side equivalence
        return f"{v} 00:00:00"
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def _pandas_rows(df) -> list[tuple]:
    """DataFrame → list of row tuples, normalizing pandas-only scalar types
    (Timestamp → datetime, NaT → None) to Spark-collect()-comparable values.
    numpy numerics pass through; ``_norm`` unwraps them per-value."""
    import pandas as pd

    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is pd.NaT:
                v = None
            elif isinstance(v, pd.Timestamp):
                v = v.to_pydatetime()
            vals.append(v)
        out.append(tuple(vals))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as ent
    from light_etl_windows_container_poc_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(args.sf_dir, t)}')")

    qs, oracles = ent.queries(), ent.oracle_sql()
    names = [n for n in qs if not args.only or n in set(args.only.split(","))]
    failures = []
    empties = []
    for name in names:
        t0 = time.time()
        nan_mark = globals()["_NAN_NORMALIZED"]
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            bad_types = oracle_type_problems(con, oracles[name])
            if bad_types:
                failures.append(name)
                print(f"FAIL {name}: oracle output type(s) unsafe on the "
                      f"driver's pandas path: {', '.join(bad_types)} — "
                      f"CAST them (BIGINT/DOUBLE/VARCHAR) in the oracle")
                continue
            res = con.execute(oracles[name])
            odf = res.df()
            ocols = list(odf.columns)
            orows = _pandas_rows(odf)
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            hs, ho = frame_fingerprint(scols, srows), frame_fingerprint(ocols, orows)
            if hs != ho:
                problems.append(f"hash {hs} vs {ho}")
                sset = {frame_fingerprint(scols, [r]) for r in srows}
                oset = {frame_fingerprint(ocols, [r]) for r in orows}
                sonly = [r for r in srows if frame_fingerprint(scols, [r]) not in oset][:3]
                oonly = [r for r in orows if frame_fingerprint(ocols, [r]) not in sset][:3]
                if sonly:
                    problems.append(f"spark-only sample: {sonly}")
                if oonly:
                    problems.append(f"oracle-only sample: {oonly}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(str(p) for p in problems))
        elif len(srows) == 0:
            # equal-and-empty is a WEAK certification: an accidentally-
            # empty query (bad filter, wrong join key) would hash-match a
            # like-broken oracle. Flag it so it can never look quietly
            # green; fix the query's selectivity at this SF or prove
            # non-emptiness at a larger SF in tests.
            empties.append(name)
            print(f"WARN {name}: 0 rows on BOTH engines — empty match "
                  f"certifies nothing ({time.time()-t0:.1f}s)")
        else:
            n_nan = globals()["_NAN_NORMALIZED"] - nan_mark
            note = (f" [note: {n_nan} NaN value(s) normalized to NULL]"
                    if n_nan else "")
            print(f"ok   {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s){note}")

    print(f"\n{len(names) - len(failures)}/{len(names)} pass"
          + (f"; {len(empties)} EMPTY match(es): {','.join(empties)}"
             if empties else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
