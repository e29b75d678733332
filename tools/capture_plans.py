"""Capture .explain("formatted") for registered queries into a directory.

Usage:
    python tools/capture_plans.py --out plans/r14_before [--only a,b] [--sf-dir DIR]

Writes one <query>.txt per query containing the formatted physical plan
(the AQE initial plan — captured without executing). Queries that
materialize state as a side effect of BUILDING their DataFrame (the
lifecycle certs) still only pay their build cost, not an action.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from light_etl_windows_container_poc_spark.queries import QUERIES  # noqa: E402
from light_etl_windows_container_poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("capture_plans")
    names = list(QUERIES)
    if args.only:
        names = [n for n in args.only.split(",") if n in QUERIES]
    for name in names:
        t0 = time.time()
        try:
            df = QUERIES[name](spark, args.sf_dir)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        with open(os.path.join(args.out, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {time.time() - t0:.2f}s", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
