"""Oracle-side determinism sweep (r9): the DuckDB twin of
`selfcheck.py --perturb`.

The driver's value hash compares Spark against DuckDB — so a FLAKY
ORACLE is as dangerous as a partitioning-dependent Spark query.  DuckDB
parallelizes aggregation across threads, and a float aggregate whose
value depends on intra-engine combine order would make the driver's
hash nondeterministic run-to-run.  This sweep runs every oracle_sql()
statement under `threads=1` AND the default thread count and compares
the same strict canon selfcheck.py uses (-0.0 != 0.0).

    python tools/oracle_determinism.py [sf_dir]

Exit 0 iff every oracle is thread-count independent.  No Spark needed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from lawlm_spark.sources.testdata import TABLES
from selfcheck import _rows_multiset


def run_all(sf_dir: str) -> int:
    oracles = entrymod.oracle_sql()
    results: dict[str, list] = {}
    for threads in (1, 0):  # 0 = leave at default
        con = duckdb.connect()
        if threads:
            con.execute(f"SET threads={threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name, sql in oracles.items():
            try:
                odf = con.execute(sql).fetchdf()
                cols = sorted(odf.columns.tolist())
                rows = list(odf[cols].itertuples(index=False, name=None))
                canon = (tuple(cols), _rows_multiset(rows))
            except Exception as e:  # noqa: BLE001 - recorded per oracle
                canon = ("ERROR", f"{type(e).__name__}: {str(e)[:200]}")
            results.setdefault(name, []).append(canon)
        con.close()
    failed = []
    for name, (a, b) in results.items():
        status = "OK" if a == b else "THREAD-DEPENDENT"
        if a == b and a[0] == "ERROR":
            status = "ERROR-BOTH"
        print(f"{name:28s} {status}", flush=True)
        if status != "OK":
            failed.append(name)
            if status == "THREAD-DEPENDENT":
                sa, sb = a[1], b[1]
                diffs = [(x, y) for x, y in zip(sa, sb) if x != y]
                if diffs:
                    print(f"    first diff: t1={diffs[0][0][:160]!r} "
                          f"tN={diffs[0][1][:160]!r}", flush=True)
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL OK'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(run_all(sf_dir))
