"""Self-check harness mirroring the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB against the same sf dir, then compares
row count, column names, and an order-insensitive canonicalized value
multiset.  Usage:

    python selfcheck.py [sf_dir] [query_name ...] [--bare] [--window]

--bare drives a conf-less SparkSession (the grading driver's shape);
--window checks only the first-50 certification window.  Exit code 0
iff every checked query matches.  The float canon is STRICT (-0.0 and
0.0 differ), matching the driver's value hash.
"""

from __future__ import annotations

import datetime
import math
import sys

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from lawlm_spark.session import get_spark
from lawlm_spark.sources.testdata import TABLES


def _canon(v):
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "\x00"
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        # STRICT: -0.0 and 0.0 canonicalize differently, matching the
        # driver's value hash (VERDICT r7 item 2 — the old `v + 0.0`
        # collapse let d68's signed-zero mismatch pass pre-validation
        # while the driver failed it).  Queries must normalize signed
        # zeros on BOTH engines (`+ 0.0` after any round()).
        return f"float:{v!r}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return f"{type(v).__name__}:{v!r}"


def _rows_multiset(rows):
    return sorted("|".join(_canon(v) for v in row) for row in rows)


def _has_signed_zero(rows) -> bool:
    """True if any cell (incl. inside arrays) is IEEE -0.0 — even when
    both engines agree, a signed zero in an output is one engine-rounding
    quirk away from a d68-class hash miss; queries should normalize with
    `+ 0.0` on both sides."""
    def scan(v):
        if isinstance(v, float):
            return v == 0.0 and math.copysign(1.0, v) < 0
        if isinstance(v, np.generic):
            return scan(v.item())
        if isinstance(v, np.ndarray):
            return any(scan(x) for x in v.tolist())
        if isinstance(v, (list, tuple)):
            return any(scan(x) for x in v)
        return False

    return any(scan(v) for row in rows for v in row)


def _d41_bpe_differential(con, spark_rows, spark_cols):
    """At-scale independent check for the registry's one no-oracle
    driver entry (VERDICT r9 item 6): rank-ordered BPE merge
    application is SQL-inexpressible, so d41 certifies rows-only at
    the driver — this replays the ENTIRE pipeline (tokenize -> train
    20 merges -> encode -> per-doc counts) in pure Python over the
    same parquet (read via DuckDB, not Spark — an independent data
    path) and demands exact equality at whatever sf_dir is being
    checked.  Deliberately imports nothing from lawlm_spark: the
    replica is independent code, like test_bpe.py's unit-scale twin
    and the d74 winnowing replica before it."""
    import re
    from collections import Counter

    # cheap schema check FIRST — a column drift should not cost the
    # full pure-Python replay before reporting
    if spark_cols != ["doc_id", "n_bpe_tokens", "n_words"]:
        return [f"differential: unexpected columns {spark_cols}"]

    eow = "</w>"
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    wc: Counter = Counter()
    doc_words: dict = {}
    for doc_id, text in rows:
        ws = re.findall(r"[a-z0-9]+", text.lower())
        doc_words[doc_id] = ws
        wc.update(ws)

    vocab = {tuple(w) + (eow,): n for w, n in wc.items()}
    merges = []
    for _ in range(20):  # the d41 registry entry trains num_merges=20
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for p in zip(sym, sym[1:]):
                pairs[p] += n
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top)
        merges.append(best)
        nv: dict = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + n
        vocab = nv

    ranks = {p: i for i, p in enumerate(merges)}

    def encode_len(word, _memo={}):
        if word in _memo:
            return _memo[word]
        sym = tuple(word) + (eow,)
        while len(sym) > 1:
            cand = [(ranks[p], p) for p in zip(sym, sym[1:]) if p in ranks]
            if not cand:
                break
            _, pair = min(cand)
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = tuple(out)
        _memo[word] = len(sym)
        return _memo[word]

    want = {
        d: (sum(encode_len(w) for w in ws), len(ws))
        for d, ws in doc_words.items()
    }
    # spark_cols is sorted: (doc_id, n_bpe_tokens, n_words)
    got = {r[0]: (r[1], r[2]) for r in spark_rows}
    if got == want:
        return []
    extra = sorted(set(got) - set(want))[:3]
    missing = sorted(set(want) - set(got))[:3]
    diff = sorted(d for d in set(got) & set(want) if got[d] != want[d])[:3]
    return [
        "differential: pure-Python BPE disagrees; "
        f"extra_docs={extra} missing_docs={missing} "
        f"first_diffs={[(d, got[d], want[d]) for d in diff]}"
    ]


def check_query(spark, con, name, fn, sql, sf_dir):
    sdf = fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]
    if sql is None:
        if name == "d41_bpe_tokens":
            problems = _d41_bpe_differential(con, spark_rows, spark_cols)
            status = "DIFF-OK" if not problems else "MISMATCH"
            return (status, len(spark_rows), None, problems)
        return ("rows-only", len(spark_rows), None, None)
    odf = con.execute(sql).fetchdf()
    oracle_cols = sorted(odf.columns.tolist())
    odf = odf[oracle_cols]
    oracle_rows = list(odf.itertuples(index=False, name=None))
    problems = []
    if spark_cols != oracle_cols:
        problems.append(f"cols spark={spark_cols} oracle={oracle_cols}")
    if len(spark_rows) != len(oracle_rows):
        problems.append(f"rowcount spark={len(spark_rows)} oracle={len(oracle_rows)}")
    sm, om = _rows_multiset(spark_rows), _rows_multiset(oracle_rows)
    if not problems and sm != om:
        diffs = [(a, b) for a, b in zip(sm, om) if a != b]
        problems.append(f"values: {len(diffs)} differing rows; first: spark={diffs[0][0][:200]!r} oracle={diffs[0][1][:200]!r}")
    if not problems and (_has_signed_zero(spark_rows) or _has_signed_zero(oracle_rows)):
        # advisory, not a failure: values matched this time, but a
        # signed zero in either output is a latent d68-class hazard
        print(f"    NOTE {name}: output contains -0.0 — normalize with "
              "`+ 0.0` on both engines (VERDICT r7 item 1)", flush=True)
    return ("OK" if not problems else "MISMATCH", len(spark_rows), len(oracle_rows), problems)


def main():
    args = sys.argv[1:]
    # --bare: drive with a conf-less SparkSession exactly like the
    # grading driver (loaders handle nanosAsLong/UTC at runtime) — the
    # session-assumption failure mode the verify recipe warns about.
    # --window: check only the first 50 queries() keys (= the driver's
    # certification window).
    bare = "--bare" in args
    window_only = "--window" in args
    # --perturb: run with a DELIBERATELY different physical layout
    # (7 shuffle partitions, 1 MB file splits) so every exchange,
    # file-split boundary, and state-store partitioning differs from
    # the canonical run.  A query whose values depend on partitioning
    # or summation order (the v23 class) fails THIS sweep at sf0.01
    # without needing 10x data — the registry-wide generalization of
    # tests/test_order_independence.py (r9).
    perturb = "--perturb" in args
    args = [a for a in args if not a.startswith("--")]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    if bare:
        import os

        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.appName("selfcheck-bare")
            .master(f"local[{cpus}]")
            .config("spark.ui.enabled", "false")
            .config("spark.sql.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    elif perturb:
        spark = get_spark(
            "selfcheck-perturb",
            shuffle_partitions=7,
            extra_conf={
                "spark.sql.files.maxPartitionBytes": "1048576",
                "spark.sql.files.openCostInBytes": "0",
            },
        )
    else:
        spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = [n for n in only if n not in qs]
    if unknown:
        print(f"unknown query name(s): {', '.join(unknown)}; known: {', '.join(qs)}")
        sys.exit(2)
    window = set(list(qs)[:50])
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if window_only and name not in window:
            continue
        try:
            status, ns, no, problems = check_query(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception as e:
            status, ns, no, problems = "ERROR", None, None, [f"{type(e).__name__}: {str(e)[:300]}"]
        line = f"{name:28s} {status:9s} spark_rows={ns} oracle_rows={no}"
        print(line, flush=True)
        if problems:
            for p in problems:
                print(f"    {p}", flush=True)
        if status in ("MISMATCH", "ERROR"):
            failed.append(name)

    # entry() smoke
    try:
        edf = entrymod.entry(spark)
        n = len(edf.collect())
        print(f"{'entry()':28s} {'OK':9s} rows={n}")
    except Exception as e:
        print(f"{'entry()':28s} ERROR     {type(e).__name__}: {str(e)[:300]}")
        failed.append("entry")

    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL OK'}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
