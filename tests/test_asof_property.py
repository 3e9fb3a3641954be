"""Property test: asof_join equals a brute-force reference on random
instances (all instances checked in a single Spark job)."""

from __future__ import annotations

import datetime as dt
import random

from lawlm_spark.operators.asof import asof_join


def _brute(left_rows, right_rows):
    out = {}
    for (k, lid, lts) in left_rows:
        best = None
        for (rk, rid, rts) in right_rows:
            if rk == k and rts <= lts and (best is None or rts > best[1] or (rts == best[1] and rid > best[0])):
                # ties on rts: keep the later-scanned arbitrary; instances
                # below are generated with unique (key, ts) so ties can't occur
                best = (rid, rts)
        if best is not None:
            out[(k, lid)] = best[0]
    return out


def test_asof_join_matches_brute_force(spark):
    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    left_rows, right_rows = [], []
    lid = rid = 0
    for instance in range(30):
        key = instance  # one key per instance keeps instances independent
        times = rng.sample(range(10_000), rng.randint(1, 12))
        for i, t in enumerate(times):
            if i % 2 == 0:
                left_rows.append((key, (lid := lid + 1), base + dt.timedelta(seconds=t)))
            else:
                right_rows.append((key, (rid := rid + 1), base + dt.timedelta(seconds=t)))

    left = spark.createDataFrame(left_rows, "user_id long, lid long, ts timestamp")
    right = spark.createDataFrame(right_rows, "user_id long, rid long, ts timestamp")
    got = {
        (r["user_id"], r["lid"]): r["rid"]
        for r in asof_join(left, right, "user_id", "ts", ["rid"]).collect()
    }
    assert got == _brute(left_rows, right_rows)
