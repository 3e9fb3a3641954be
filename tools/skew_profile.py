"""Straggler-task profile for the r9 skew benches (VERDICT r8 item 4).

Runs each skew-bench variant once with the Spark UI enabled and pulls
per-stage task-duration quantiles from the status REST API — the
straggler-task delta (max vs median task time in the shuffle stage) is
the number wall-clock medians can't show on a 32-core box.

    python tools/skew_profile.py [sf_dir]

Prints one JSON document mapping variant -> stages -> task quantiles.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(app_base: str, path: str):
    with urllib.request.urlopen(app_base + path, timeout=10) as r:
        return json.loads(r.read())


def profile(sf_dir: str) -> dict:
    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder.appName("skew-profile")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4047")
        .config("spark.sql.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    app_id = spark.sparkContext.applicationId
    # derive the UI base from the context, NOT the requested port:
    # under port contention Spark retries to 4048+ and a hardcoded
    # 4047 would hit another app (or nothing)
    ui = spark.sparkContext.uiWebUrl or "http://localhost:4047"
    base = f"{ui}/api/v1/applications/{app_id}"

    from pyspark.sql import functions as F

    _force = bench._force

    # the genuinely skew-vulnerable aggregate shape: a HOLISTIC
    # aggregate (exact percentile) defeats map-side partial aggregation,
    # so the hot key's full row set lands on one reducer — vs the
    # mergeable-sketch scale path (approx_percentile) which partials
    # collapse like a sum
    def _holistic(exact: bool):
        df = bench._skewed_lineitem(spark, sf_dir)
        fn = "percentile" if exact else "approx_percentile"
        _force(df.groupBy("zkey").agg(F.expr(f"{fn}(l_quantity, 0.5)").alias("p50")))

    variants = {
        "warmup_discard": lambda: bench._bench_skew_agg(spark, sf_dir, salted=False),
        "skew_agg_salted": lambda: bench._bench_skew_agg(spark, sf_dir, salted=True),
        "skew_agg_plain": lambda: bench._bench_skew_agg(spark, sf_dir, salted=False),
        "skew_join_salted": lambda: bench._bench_skew_join(spark, sf_dir, salted=True),
        "skew_join_plain": lambda: bench._bench_skew_join(spark, sf_dir, salted=False),
        "skew_holistic_exact": lambda: _holistic(True),
        "skew_holistic_sketch": lambda: _holistic(False),
    }
    out: dict = {"sf_dir": sf_dir, "variants": {}}
    for name, fn in variants.items():
        before = {s["stageId"] for s in _rest(base, "/stages")}
        t0 = time.perf_counter()
        fn()
        wall = round(time.perf_counter() - t0, 3)
        stages = []
        for s in _rest(base, "/stages?status=COMPLETE"):
            sid = s["stageId"]
            if sid in before:
                continue
            try:
                q = _rest(
                    base,
                    f"/stages/{sid}/{s['attemptId']}/taskSummary"
                    "?quantiles=0.0,0.5,1.0",
                )
                dur = q.get("duration") or q.get("executorRunTime") or []
            except Exception:
                dur = []
            stages.append(
                {
                    "stageId": sid,
                    "name": s.get("name", "")[:60],
                    "numTasks": s.get("numCompleteTasks"),
                    "task_ms_min_med_max": [round(x, 1) for x in dur],
                    "shuffle_read_rows": s.get("shuffleReadRecords"),
                    "input_rows": s.get("inputRecords"),
                }
            )
        # the straggler signal: worst max/median ratio among multi-task
        # stages that actually read a shuffle
        worst = None
        for st in stages:
            d = st["task_ms_min_med_max"]
            if (
                len(d) == 3
                and d[1] > 0
                and (st["numTasks"] or 0) > 1
                and (st["shuffle_read_rows"] or 0) > 0
            ):
                ratio = round(d[2] / d[1], 2)
                if worst is None or ratio > worst["max_over_median"]:
                    worst = {
                        "stageId": st["stageId"],
                        "max_over_median": ratio,
                        "median_ms": d[1],
                        "max_ms": d[2],
                    }
        out["variants"][name] = {
            "wall_s": wall,
            "straggler": worst,
            "stages": stages,
        }
        spark.catalog.clearCache()
    spark.stop()
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    print(json.dumps(profile(sf_dir), indent=1))
