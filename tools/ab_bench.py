"""A/B experiment harness for the optimization rounds: run a subset of
bench.py's queries under session conf overrides and print medians.

    python tools/ab_bench.py --conf k=v --conf k=v --reps 3 [--sf DIR] q1 q2 ...

Uses bench.bench_queries (same noop-sink forcing, same per-rep cache
clears) so numbers are directly comparable to bench.py's; the only
difference is the extra conf. Run A and B back-to-back on a quiet
machine and compare medians.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    extra = {"spark.ui.showConsoleProgress": "false"}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        extra[k] = v

    import bench
    from lawlm_spark.session import get_spark

    spark = get_spark("lawlm-ab", extra_conf=extra)
    bench._warmup(spark)
    times, reps = bench.bench_queries(
        spark, args.sf, only=args.queries, reps=args.reps
    )
    print(json.dumps({"conf": args.conf, "medians": times, "reps": reps}))
    spark.stop()


if __name__ == "__main__":
    main()
