"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark AND its ``oracle_sql()`` twin on
DuckDB at sf0.01 (or --sf-dir), then compares row count, column names, and
an order-insensitive value hash (columns sorted by name, values stringified,
rows sorted). Run before every commit touching queries.

Usage: python tools/check_oracle.py [--sf-dir DIR] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from light_etl_windows_container_poc_spark.catalog import TABLES, table_path  # noqa: E402


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


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
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
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
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} pass"
          + (f"; {len(empties)} EMPTY match(es): {','.join(empties)}"
             if empties else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
