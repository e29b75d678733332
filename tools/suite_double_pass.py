"""Tail-inflation attribution (r8 verdict #4): run the FULL registered
query suite twice inside ONE SparkSession at sf0.1 and report the
frozen-population subset totals for each pass.

Interpretation contract:
- pass1 ≈ the bench.py cold number (same boot, same order);
- pass2 − pass1 isolates SESSION-CUMULATIVE cost (codegen-cache growth,
  ContextCleaner backlog, state-store residue from the streaming
  queries) from boot-to-boot variance — the two candidate explanations
  for the driver session's uniformly (+8.5–18%) inflated subsets in
  BENCH_r08 vs the builder's same-code boots.

Usage: python tools/suite_double_pass.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from light_etl_windows_container_poc_spark.queries import QUERIES  # noqa: E402
from light_etl_windows_container_poc_spark.session import get_spark  # noqa: E402

import __spark_entry__ as ent  # noqa: E402


def run_pass(spark, sf_dir: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        try:
            fn(spark, sf_dir).collect()
        except Exception as e:  # keep attributing even on a failure
            print(f"ERR {name}: {e}", file=sys.stderr)
        times[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    return times


def subset(times: dict[str, float], names) -> float:
    return round(sum(t for n, t in times.items() if n in set(names)), 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("suite-double-pass")
    out = {}
    for p in (1, 2):
        t0 = time.time()
        times = run_pass(spark, sf_dir)
        wall = round(time.time() - t0, 3)
        pops = {
            "r5": ent._R05_POPULATION, "r6": ent._R06_POPULATION,
            "r7": ent._R07_POPULATION, "r8": ent._R08_POPULATION,
            "r9": ent._R09_POPULATION,
        }
        out[f"pass{p}"] = {
            "full_sec": wall,
            **{f"suite_{k}_subset_sec": subset(times, v)
               for k, v in pops.items()},
            "slowest": dict(sorted(times.items(), key=lambda kv: kv[1],
                                   reverse=True)[:8]),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
