"""Pre-certification gate (VERDICT r7 item 7): ONE invocation that runs
everything a certification window must pass before the driver sees it.

    python tools/precert.py [sf_dir]          # default /root/testdata/sf0.01

Stages, in order (fail-fast, nonzero exit on any failure):

1. **Window membership** — tests/test_entry.py pins the planned window
   cohorts against the first 50 queries() keys, so a careless insert
   cannot silently de-certify an entry (the r3 failure mode).
2. **Bare-session strict-canon selfcheck of the window** — selfcheck.py
   --bare --window: the driver's exact session shape (no lawlm confs),
   the driver's scale, and a float canon at least as strict as the
   driver's value hash (-0.0 != 0.0; the r7 d68 lesson: the instrument
   must not be weaker than the thing it predicts).
3. **Perturbed-layout selfcheck of the window** (r9) — selfcheck.py
   --perturb --window: 7 shuffle partitions + 1 MB file splits, so
   partitioning/summation-order dependence (the v23 class) fails
   before the driver sees it.
4. **d41 pure-Python BPE differential at the checked scale** (r10) —
   the one no-oracle driver entry carries an at-scale independent
   check every round, whether or not it is in the window.

This is the standing gate the r7 bare-session sweeps prototyped (they
predicted 41/41 — NOTES_r07 §8); run it before closing any round that
changes the window or any windowed query.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The PLANNED r19 certification window (drafted at r18 close per the
# standing practice; REGENERATE with `python tools/ledger.py
# --emit-window` at r19 session start once the driver's r18 rows
# land).  Validated by `--next` WITHOUT reordering queries().  Slot
# arithmetic (assume-green over the live r18 window): 5 never-
# certified firsts (the r18 registry additions v85/r18/r19/v86/v87) +
# 5 second rows for the r17-certified cohort (r13/r14/v80/v81/r15) +
# 5 second rows for the r18 firsts (r16_sdm_window/v82/r17_rocchio/
# v83/v84) + TWO changed-text tier jumps applied by hand
# (v43_cdc_stream_apply, v34_streaming_sessions — r16-freshest, their
# cdc.py state layer / events.py sentinel machinery changed in r18) +
# the 33 oldest r15-freshest recerts (registry order, v70_q2_shape
# first; r5_salted_join/v36_stateful_totals/r5_ivf_prebuilt displaced
# by the jumps).
NEXT_WINDOW = [
    "v85_feed_compaction",
    "r18_rocchio_ann",
    "r19_bm25f_topk",
    "v86_session_proximity",
    "v87_enriched_mv",
    "r13_rm3_expand",
    "r14_crossenc_rerank",
    "v80_snapshot_diff",
    "v81_change_feed",
    "r15_sdm_proximity",
    "r16_sdm_window",
    "v82_incremental_mv",
    "r17_rocchio_expand",
    "v83_scd2_incremental",
    "v84_streaming_mv",
    "v43_cdc_stream_apply",
    "v34_streaming_sessions",
    "v70_q2_shape",
    "d74_winnowing",
    "d16_token_packing",
    "m2_frame_sampling",
    "m3_resize",
    "o2_sources_projection",
    "o3_enhanced_processing",
    "r2_mirror_stats",
    "d10_text_analytics",
    "d11_token_stats",
    "v18_session_windows",
    "v1_scan_filter_project",
    "v2_coalesce_provenance",
    "v3_anti_join",
    "v3_join_family",
    "v3_semi_join",
    "v3_outer_join",
    "v4_distinct_count",
    "v4_dup_audit",
    "v5_latest_by",
    "v6_rollup",
    "v7_topk_window",
    "v8_rrf_fusion",
    "v13_set_ops",
    "v13_set_ops_all",
    "v14_sliding_counts",
    "v14_window_counts",
    "v15_json",
    "v16_scalar_funcs",
    "v17_analytic_window",
    "o4_full_pipeline",
    "d16b_token_packing_sharded",
    "r5_salted_join",
]


def run(label: str, cmd: list[str]) -> None:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        print(f"PRECERT FAILED at stage: {label}", flush=True)
        sys.exit(proc.returncode)


def check_next_window() -> None:
    """Validate the PLANNED next-round window against the live
    registry: exactly 50 names, no duplicates, every name a real
    queries() key.  Catches a renamed/removed entry before the r10
    reorder instead of during it."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    qs = set(entrymod.queries())
    # explicit checks, not assert: this is a gate, and `python -O`
    # compiles asserts away — a gate that can be optimized out isn't one
    problems = []
    if len(NEXT_WINDOW) != 50:
        problems.append(f"NEXT_WINDOW has {len(NEXT_WINDOW)} names, want 50")
    dupes = sorted({n for n in NEXT_WINDOW if NEXT_WINDOW.count(n) > 1})
    if dupes:
        problems.append(f"duplicates in NEXT_WINDOW: {dupes}")
    missing = [n for n in NEXT_WINDOW if n not in qs]
    if missing:
        problems.append(f"NEXT_WINDOW names not in registry: {missing}")
    if problems:
        for p in problems:
            print(f"PRECERT FAILED (--next membership): {p}", flush=True)
        sys.exit(1)
    print("NEXT_WINDOW membership OK (50 names, all in registry)",
          flush=True)


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--next"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    py = sys.executable
    if "--next" in sys.argv[1:]:
        # Pre-validate the PLANNED r10 window without touching the
        # live first-50 order: membership + a bare-session strict-canon
        # selfcheck over exactly those 50 names.
        check_next_window()
        run(
            "bare-session strict-canon NEXT-window selfcheck",
            [py, "selfcheck.py", sf_dir, "--bare"] + NEXT_WINDOW,
        )
        print("PRECERT --next OK", flush=True)
        return
    run(
        "window membership",
        [
            py, "-m", "pytest", "-q", "-x",
            "tests/test_entry.py::test_certification_window_membership",
        ],
    )
    run(
        "bare-session strict-canon window selfcheck",
        [py, "selfcheck.py", sf_dir, "--bare", "--window"],
    )
    run(
        # r9: the perturbed-layout sweep (7 shuffle partitions, 1 MB
        # file splits) — a windowed query whose values depend on
        # partitioning/summation order fails here before the driver
        # sees it (the v23 class; see COVERAGE.md standing invariants)
        "perturbed-layout window selfcheck",
        [py, "selfcheck.py", sf_dir, "--perturb", "--window"],
    )
    run(
        # r10 (VERDICT r9 item 6): the registry's one no-oracle driver
        # entry gets an at-scale independent check EVERY round, window
        # or not — selfcheck replays the full BPE pipeline in pure
        # Python over the same parquet and demands exact equality
        # (DIFF-OK).  ~30 s; the same discipline the d74 winnowing
        # replica set in r9.
        "d41 pure-Python BPE differential",
        [py, "selfcheck.py", sf_dir, "d41_bpe_tokens"],
    )
    print("PRECERT OK", flush=True)


if __name__ == "__main__":
    main()
