"""Time individual queries against the noop sink (guide §1.4).

Usage:
    python tools/noop_time.py --only q1_pricing_summary,knn_graph
        [--sf-dir DIR] [--repeat N] [--warm] [--conf k=v,k=v] [--collect]

Per query: optional warm run at sf0.001 (same plan shape), then N timed
noop-sink runs at the target SF; prints per-run and median times. The
noop sink computes every column of every row without sink cost, so it
times the computation the bench's collect() also pays, minus driver
result transfer. --collect switches the timed action to collect() to
reproduce the bench methodology exactly.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from light_etl_windows_container_poc_spark.queries import QUERIES  # noqa: E402
from light_etl_windows_container_poc_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", required=True)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--collect", action="store_true")
    ap.add_argument("--conf", default=None,
                    help="comma-separated runtime conf overrides k=v")
    args = ap.parse_args()

    spark = get_spark("noop_time")
    if args.conf:
        for kv in args.conf.split(","):
            k, v = kv.split("=", 1)
            spark.conf.set(k, v)
    warm_dir = "/root/testdata/sf0.001"
    names = [n for n in args.only.split(",") if n in QUERIES]
    missing = [n for n in args.only.split(",") if n and n not in QUERIES]
    if missing:
        print(f"unknown queries skipped: {missing}")

    def run(df):
        if args.collect:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()

    total = 0.0
    for name in names:
        fn = QUERIES[name]
        if args.warm and os.path.isdir(warm_dir):
            run(fn(spark, warm_dir))
            spark.catalog.clearCache()
        times = []
        for _ in range(args.repeat):
            spark.sparkContext.setJobDescription(f"noop_time: {name}")
            df = fn(spark, args.sf_dir)
            t0 = time.time()
            run(df)
            times.append(time.time() - t0)
            spark.catalog.clearCache()
        med = statistics.median(times)
        total += med
        print(f"{name}: median={med:.3f}s runs="
              f"{[round(t, 3) for t in times]}", flush=True)
    print(f"TOTAL (median sum): {total:.3f}s")


if __name__ == "__main__":
    main()
