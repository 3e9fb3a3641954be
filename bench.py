"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].  The FINAL stdout line is the compact
medians-only headline the driver parses:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-rep arrays and the scaling table go to the PRECEDING stdout line
("headline_detail") and the BENCH_DETAIL.json sidecar — r9's
single-line everything-payload overflowed the driver's fixed-size tail
capture and BENCH_r09 recorded parsed=null (ADVICE r9).

Each query is forced end-to-end with the noop sink (full computation,
no collect/driver materialization) so the measured time is the real
plan cost, not a count() shortcut that lets Catalyst prune the work.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from lawlm_spark.plans.rag import hybrid_search, ingest_documents
from lawlm_spark.session import get_spark
from lawlm_spark.sources.mirror import write_mirrors
from lawlm_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# median-of-N reps per query; 3 absorbs one contended outlier rep.
# Full sf0.1 wall clock with 32 entries x 3 reps + the scaling block is
# ~10-12 min (the two streaming entries alone are ~16 s/rep) — r8's
# driver run at comparable length completed fine.
BENCH_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# --- skew stress (VERDICT r8 item 4): every bench table is uniform, so
# the salting operators had never been MEASURED under skew.  A
# deterministic power-law key over lineitem: u = hash-uniform(0,1],
# zkey = floor(1000 * u^6) -> P(zkey=0) = 0.001^(1/6) ~ 31.6% of all
# rows land on ONE key (vs ~3% per task at 32 shuffle partitions) —
# a ~10x single-reducer hot spot, worse than any real Zipf tail.
# The source is amplified x8 (explode over a literal array) because
# sf0.1's 600k lineitem rows put the hot partition far below AQE's
# 256 MB skewedPartitionThreshold AND below measurable task cost —
# at 4.8M rows the unsalted hot task is a real straggler while the
# whole bench stays inside budget.
_SKEW_AMPLIFY = 8


def _skewed_lineitem(spark, sf_dir: str):
    li = load_table(spark, sf_dir, "lineitem")
    # u in [0, 1): keeps zkey strictly inside the dim's 0..999 key range
    # (u = 1.0 would emit zkey 1000 and silently drop those rows from
    # the join benches — r9 code-review find)
    u = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(1000000)) / 1000000.0
    return (
        li.withColumn("zkey", F.floor(F.lit(1000) * F.pow(u, F.lit(6))).cast("int"))
        .withColumn("__rep", F.explode(F.array(*[F.lit(i) for i in range(_SKEW_AMPLIFY)])))
        .drop("__rep")
    )


def _skew_dim(spark):
    # 1000-key dim: small enough to replicate salt_buckets times, and
    # broadcast is DISABLED for both join variants so the shuffle-join
    # skew path (the thing under test) is actually exercised
    return spark.range(1000).select(
        F.col("id").cast("int").alias("zkey"),
        (F.col("id") % 7).alias("dim_group"),
    )


def _bench_skew_agg(spark, sf_dir: str, salted: bool) -> None:
    from lawlm_spark.operators.skew import salted_aggregate

    df = _skewed_lineitem(spark, sf_dir)
    if salted:
        out = salted_aggregate(df, ["zkey"], sums=["l_quantity"], salt_buckets=16)
    else:
        out = df.groupBy("zkey").agg(
            F.count("*").alias("n"), F.sum("l_quantity").alias("sum_l_quantity")
        )
    _force(out)


def _bench_skew_join(spark, sf_dir: str, salted: bool) -> None:
    from lawlm_spark.operators.skew import salted_join

    df = _skewed_lineitem(spark, sf_dir)
    dim = _skew_dim(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        if salted:
            joined = salted_join(df, dim, "zkey", salt_buckets=16)
        else:
            joined = df.join(dim, "zkey")  # AQE skew-split is ON: this measures AQE
        # aggregate AFTER the join so the hot key's joined rows are real work
        _force(
            joined.groupBy("dim_group").agg(
                F.count("*").alias("n"), F.sum("l_quantity").alias("qty")
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def bench_queries(
    spark,
    sf_dir: str,
    only: list[str] | None = None,
    reps: int | None = None,
) -> tuple[dict[str, float], dict[str, list[float]]]:
    n_reps = BENCH_REPS if reps is None else reps
    qs = entrymod.queries()
    plan = {
        "b_scan": lambda: _force(qs["v1_scan_filter_project"](spark, sf_dir)),
        "b_join": lambda: _force(qs["v3_join_family"](spark, sf_dir)),
        "b_anti_join": lambda: _force(qs["v3_anti_join"](spark, sf_dir)),
        "b_agg": lambda: _force(qs["v6_tpch_q1"](spark, sf_dir)),
        "b_topk": lambda: _force(qs["v7_topk_window"](spark, sf_dir)),
        "b_rrf": lambda: _force(qs["v8_rrf_fusion"](spark, sf_dir)),
        "b_bm25": lambda: _force(qs["v9_bm25_index"](spark, sf_dir)),
        "b_cosine": lambda: _force(qs["v10_cosine_topk"](spark, sf_dir)),
        "b_window": lambda: _force(qs["v14_window_counts"](spark, sf_dir)),
        "b_sessions": lambda: _force(qs["v18_session_windows"](spark, sf_dir)),
        "b_asof": lambda: _force(qs["v19_asof_join"](spark, sf_dir)),
        "b_curation": lambda: _force(qs["d12_curation"](spark, sf_dir)),
        "b_dedup_lsh": lambda: _force(qs["d5_minhash_dedup"](spark, sf_dir)),
        "b_ingest": lambda: _bench_ingest(spark, sf_dir),
        "b_ingest_recursive": lambda: _bench_ingest_recursive(spark, sf_dir),
        "b_prep_full": lambda: _force(qs["d21_curate_mix_pack"](spark, sf_dir)),
        "b_dup_spans": lambda: _force(qs["d30_dup_span_removal"](spark, sf_dir)),
        "b_pagerank": lambda: _force(qs["d37_pagerank"](spark, sf_dir)),
        "b_semdedup": lambda: _force(qs["d38_semdedup"](spark, sf_dir)),
        "b_bpe": lambda: _force(qs["d41_bpe_tokens"](spark, sf_dir)),
        "b_hybrid": lambda: _bench_hybrid(spark, sf_dir),
        "b_hybrid_ann": lambda: _bench_hybrid_ann(spark, sf_dir),
        "b_prefix_join": lambda: _force(qs["d54_prefix_join"](spark, sf_dir)),
        # r10: quantified pattern matching (one-shuffle run encoding +
        # lead probes over the full event stream)
        "b_pattern": lambda: _force(qs["v71_match_recognize"](spark, sf_dir)),
        # r12: the NFA generalization — same encode, but matching runs
        # through the applyInPandas boundary (one Arrow row per run);
        # the gap between b_pattern and b_nfa_pattern IS the measured
        # cost of the Python hop the repeated-symbol case requires
        "b_nfa_pattern": lambda: _force(qs["v75_nfa_pattern"](spark, sf_dir)),
        "b_triangles": lambda: _bench_triangles(spark, sf_dir),
        "b_hll": lambda: _force(qs["d48_hll_distinct"](spark, sf_dir)),
        # streaming representation (VERDICT r6 item 8): v34 runs a REAL
        # append-mode session-window query under availableNow — watermark
        # + state store end to end, so a state-store perf regression
        # shows up here (each rep builds a fresh landing/checkpoint/sink,
        # so reps measure identical work)
        "b_streaming": lambda: _force(qs["v34_streaming_sessions"](spark, sf_dir)),
        # the applyInPandasWithState path (VERDICT r7 item 8): v41 runs
        # custom session state machines with EventTimeTimeout through the
        # Python worker boundary — the one streaming shape whose perf is
        # NOT covered by the JVM-side session_window in b_streaming.
        # Instrumented build/run halves (VERDICT r16 item 3): the
        # filesystem-bound landing setup and the streaming plan
        # adjudicate separately in BENCH_DETAIL as
        # b_streaming_stateful_setup / _query.
        "b_streaming_stateful": lambda: _bench_streaming_stateful(
            spark, sf_dir
        ),
        # skew stress (VERDICT r8 item 4): same aggregate/join, salted
        # vs plain, on a power-law key (top key ~31.6% of rows).  The
        # *_plain rows are the control: plain agg wins (map-side
        # partial aggregation already collapses hot sum/count keys);
        # plain join rides AQE's skew-split, salted join is the
        # stream-static/AQE-less fallback being measured.
        "b_skew_agg": lambda: _bench_skew_agg(spark, sf_dir, salted=True),
        "b_skew_agg_plain": lambda: _bench_skew_agg(spark, sf_dir, salted=False),
        "b_skew_join": lambda: _bench_skew_join(spark, sf_dir, salted=True),
        "b_skew_join_plain": lambda: _bench_skew_join(spark, sf_dir, salted=False),
    }
    times: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    _STATEFUL_SPLIT["setup"].clear()
    _STATEFUL_SPLIT["query"].clear()
    for name, fn in plan.items():
        if only is not None and name not in only:
            continue
        rep_times: list[float] = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            try:
                fn()
                rep_times.append(round(time.perf_counter() - t0, 3))
            except Exception as e:  # noqa: BLE001 - record and continue benching
                print(f"{name} FAILED: {type(e).__name__}: {e}", file=sys.stderr)
                rep_times = []
                break
            # No query reuses another's cached frames, so drop the eager
            # persists (curation/dedup shingle tables) between reps and
            # queries — untimed, keeps each rep measuring the same work,
            # and keeps accumulated blocks from pressuring later queries
            # in this long-lived session (ADVICE r3 leak).
            spark.catalog.clearCache()
        # Median-of-N (default 3): the driver grades a single bench
        # invocation, and sub-5 s queries swing >3x under machine
        # contention (r5: one contaminated run read 129 s vs a 47 s
        # steady state) — the median discards a contended outlier rep
        # without hiding a real plan regression (VERDICT r5 #3).
        # Per-rep times are emitted alongside (VERDICT r7 item 5) so a
        # judge can separate machine-contention drift (wide rep spread)
        # from a real plan regression (tight spread at a new level).
        times[name] = sorted(rep_times)[len(rep_times) // 2] if rep_times else -1.0
        all_reps[name] = rep_times
        spark.catalog.clearCache()
    # per-rep setup/query halves of b_streaming_stateful (VERDICT r16
    # item 3): BENCH_DETAIL-only pseudo rows — the headline median stays
    # the full-rep wall so totals remain comparable across rounds.
    # Suppressed when the parent query failed partway (times == -1):
    # split samples from an aborted rep loop would show plausible
    # timings for a query the same artifact marks failed (r17 review)
    if _STATEFUL_SPLIT["setup"] and times.get("b_streaming_stateful", -1.0) >= 0:
        all_reps["b_streaming_stateful_setup"] = list(_STATEFUL_SPLIT["setup"])
        all_reps["b_streaming_stateful_query"] = list(_STATEFUL_SPLIT["query"])
    return times, all_reps


_MIRROR = tempfile.mkdtemp(prefix="bench_mirror_")


def _bench_ingest(spark, sf_dir: str) -> None:
    docs = load_table(spark, sf_dir, "documents")
    chunks, postings = ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)
    # r18: the two outputs are independent — write them concurrently so
    # the second job back-fills the first's task tail (guide §2.6);
    # same work, same outputs, less idle wall.
    write_mirrors([(chunks, _MIRROR + "/chunks"), (postings, _MIRROR + "/postings")])


def _bench_ingest_recursive(spark, sf_dir: str) -> None:
    # production-parity chunker (reference config.yml:6-8 — recursive at
    # 1536/300/400): the pandas-UDF splitter makes the shared clean+chunk
    # stage the dominant cost, which is where eager_share pays off
    # (both variants measured 3-run in NOTES_r05.md)
    docs = load_table(spark, sf_dir, "documents")
    registry: list = []
    chunks, postings = ingest_documents(
        docs, chunker="recursive", eager_share=True, cache_registry=registry
    )
    # r18: same concurrent-independent-writes shape as _bench_ingest;
    # here both writes read the SHARED persisted keyed-chunks cache, so
    # overlap hides the per-output embed/BM25 stages too.
    write_mirrors(
        [(chunks, _MIRROR + "/chunks_rec"), (postings, _MIRROR + "/postings_rec")]
    )
    for df in registry:
        df.unpersist()


# per-rep halves of the LAST bench_queries run; the b_streaming_stateful
# lambda appends here and the rep loop drains into all_reps (VERDICT r16
# item 3 — three rounds of cross-session noise analysis on this one
# query is the cost of not having the split in the driver artifact)
_STATEFUL_SPLIT: dict[str, list[float]] = {"setup": [], "query": []}


def _bench_streaming_stateful(spark, sf_dir: str) -> None:
    """v41 with the setup (median-split landing build — filesystem
    bound) and query (availableNow applyInPandasWithState run) halves
    timed separately, mirroring tools/profile_stateful.py's phases.
    Total work is identical to the plain v41_stateful_timeout entry."""
    from lawlm_spark.streaming.events import _interval_micros
    from lawlm_spark.streaming.stateful import (
        _remove_landing,
        build_v41_landing,
        run_v41_query,
    )

    gap_us = _interval_micros("1 hour")
    t0 = time.perf_counter()
    landing, max_us = build_v41_landing(spark, sf_dir, gap_us)
    setup_s = round(time.perf_counter() - t0, 3)
    try:
        t1 = time.perf_counter()
        _force(run_v41_query(spark, landing, gap_us, max_us))
        query_s = round(time.perf_counter() - t1, 3)
    finally:
        _remove_landing(landing)
    _STATEFUL_SPLIT["setup"].append(setup_s)
    _STATEFUL_SPLIT["query"].append(query_s)


def _bench_triangles(spark, sf_dir: str) -> None:
    # support-filtered co-occurrence (pairs seen in >= 2 orders): the
    # realistic market-basket graph — at scale, support-1 pairs are
    # noise and quadratic; the certified d51 covers the dense support-1
    # graph's correctness at the driver SFs (23 s at sf0.1 / 1.9M
    # triangles — honest but not a per-round headline)
    from lawlm_spark.operators.triangles import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).alias("s"))
        .filter("s >= 2")
        .select("pa", "pb")
    )
    _force(triangle_counts(pairs, "pa", "pb"))


def _bench_hybrid(spark, sf_dir: str) -> None:
    # query-time shape: the index is precomputed (by b_ingest) — hybrid
    # search scans the parquet mirror, it does not re-embed the corpus
    chunks = spark.read.parquet(_MIRROR + "/chunks")
    postings = spark.read.parquet(_MIRROR + "/postings")
    queries = entrymod._queries_df(spark)
    _force(hybrid_search(chunks, postings, queries, k=3))


def _bench_hybrid_ann(spark, sf_dir: str) -> None:
    # the 100 TB dense path: rp-LSH buckets instead of the brute corpus
    # scan; planes derived from the corpus count (parquet footer
    # metadata — not a data scan)
    chunks = spark.read.parquet(_MIRROR + "/chunks")
    postings = spark.read.parquet(_MIRROR + "/postings")
    queries = entrymod._queries_df(spark)
    _force(
        hybrid_search(
            chunks, postings, queries, k=3,
            dense_retriever="rp_lsh",
            retriever_opts={"n_vectors": chunks.count()},
        )
    )


def _warmup(spark) -> None:
    """Untimed JVM/codegen/Arrow warmup so the first timed query measures
    steady-state plan cost, not JIT startup.  Touches only the tiny
    sf0.001 files — never the benched SF's data (no page-cache priming)."""
    wd = "/root/testdata/sf0.001"
    spark.range(1000).selectExpr("sum(id)").collect()
    load_table(spark, wd, "lineitem").groupBy("l_returnflag").count().collect()
    docs = load_table(spark, wd, "documents").limit(50)
    ingest_documents(docs, chunk_size=256, overlap=32, min_chunk=64)[0].count()


# scaling-curve regression signal (VERDICT r8 item 6): absolute budgets
# at one SF can't catch accidental super-linearity; this table records
# each query's growth exponent over the sf0.01 -> sf0.1 decade
# (exp = log10(t_0.1 / t_0.01); 1.0 = linear).  The sf0.001 point is
# recorded but not used for the exponent — at that size fixed plan/JVM
# overhead dominates.  Known superlinear shapes are adjudicated in
# NOTES (the within-bucket-quadratic dedup candidates).
SCALING_QUERIES = [
    "b_agg", "b_join", "b_dedup_lsh", "b_bm25", "b_cosine",
    "b_prep_full", "b_pagerank", "b_dup_spans",
    # r12: the NFA pattern path — the scaling exponent shows whether
    # the Python boundary (post-prefilter) stays linear in events
    "b_nfa_pattern",
]
SCALING_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _scaling_table(spark, times_at_main_sf: dict[str, float]) -> dict:
    out: dict[str, dict] = {}
    points: dict[str, dict[float, float]] = {q: {} for q in SCALING_QUERIES}
    for sdir in SCALING_SFS:
        sf_val = float(sdir.rsplit("sf", 1)[-1])
        t, _ = bench_queries(spark, sdir, only=SCALING_QUERIES, reps=1)
        for q, v in t.items():
            points[q][sf_val] = v
    import math

    for q in SCALING_QUERIES:
        t_01 = points[q].get(0.01, -1.0)
        t_1 = times_at_main_sf.get(q, -1.0)
        exp = (
            round(math.log10(t_1 / t_01), 3)
            if t_01 and t_1 and t_01 > 0 and t_1 > 0
            else None
        )
        out[q] = {
            "sf0.001": points[q].get(0.001, -1.0),
            "sf0.01": t_01,
            "sf0.1": t_1,
            "exp_0.01_to_0.1": exp,
        }
    return out


def main() -> None:
    # Remove this run's mirror scratch even on failure.  Litter
    # compounds: 6k accumulated /tmp entries (old checkpoints/
    # landings/mirrors) measurably slowed the checkpoint-heavy queries
    # in r12's quiet runs (b_semdedup 2.4 -> 3.0 s) — a bench must not
    # be the thing that dirties the next one (NOTES_r12 §5).
    import shutil

    try:
        _main_inner()
    finally:
        shutil.rmtree(_MIRROR, ignore_errors=True)


def _main_inner() -> None:
    spark = get_spark("lawlm-bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    _warmup(spark)
    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0
    times, all_reps = bench_queries(spark, SF_DIR)
    total = round(sum(t for t in times.values() if t >= 0), 3)
    # The driver captures a fixed-size stdout TAIL and parses the last
    # JSON line; r9's single-line payload (reps + scaling, >2 KB)
    # overflowed it and BENCH_r09 recorded parsed=null (ADVICE r9,
    # VERDICT r9 item 2).  So: reps + scaling go to an EARLIER stdout
    # line and a committed sidecar (BENCH_DETAIL.json); the FINAL line
    # is the compact medians-only headline the driver can always parse.
    detail = {"metric": "headline_detail", "reps": all_reps, "sf": sf}
    # exponents are only meaningful when the main run IS the sf0.1 run
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_SCALING", "1") != "0":
        detail["scaling"] = _scaling_table(spark, times)
    try:
        sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
        with open(sidecar, "w") as fh:
            json.dump(detail, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass  # a read-only checkout still gets the stdout copy
    print(json.dumps(detail))
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
