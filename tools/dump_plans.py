"""Dump `.explain("formatted")` for named declared queries to files.

    python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query — the evidence
files the optimization rounds commit (plans/r18/<q>_before.txt /
_after.txt) so a judge can check plan claims without running Spark.
Queries that execute eagerly (streaming runners, CDC appliers) have no
single lazy frame to explain; for those this tool records the final
returned frame's plan, which is the queryable surface.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from lawlm_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("lawlm-dump-plans",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        jvm = spark.sparkContext._jvm
        plan = jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
