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

# The PLANNED next-round certification window (r12; drafted end of
# r11 per the standing practice so every window is pre-validated),
# validated by `--next` WITHOUT reordering queries() — the current
# first-50 window must stay in place until the driver has graded it.
# r12 session 1: reorder queries() to put these 50 first, update
# tests/test_entry.py's membership pins, then run the normal precert.
#
# Slot arithmetic (freshest-row ledger assuming a green r11, computed
# from CORRECTNESS_r01-r10 + the r11 window): 1 first row (v73, the
# r11 registry addition) + 2 second rows for the r10 additions
# (v71/v72, single-green after their r11 first rows — the established
# one-round-later second-row cadence, r11 review finding) + the 15
# remaining r6-freshest entries (v20_udtf_sentences onward in
# registry order, per COVERAGE.md) + all 9 r7-freshest + all 7
# r8-freshest + the 16 oldest of the 50 r9-freshest (registry order)
# = 50.  The remaining 34 r9-freshest lead the r13 tier.
NEXT_WINDOW = [
    # first driver row for the r11 registry addition
    "v73_match_measures",
    # second rows for the two r10 additions (first rows r11)
    "v71_match_recognize",
    "v72_stream_enrichment",
    # the 15 remaining r6-freshest recerts (registry order)
    "v20_udtf_sentences", "v21_pivot", "v22_exists_subquery",
    "v24_range_join", "v26_scalar_subquery", "v27_percentiles",
    "v28_query_prefix", "v29_grouped_udaf", "v30_stream_static_join",
    "v31_stream_stream_join", "v32_streaming_dedup", "d14_salted_agg",
    "d4_jaccard_pairs", "d5_minhash_dedup", "d6_simhash",
    # the 9 r7-freshest recerts
    "d17_hash_sample", "d18_hash_split", "d19_training_mix",
    "d20_incremental_neardup", "d21_curate_mix_pack", "d22_pii_scrub",
    "d23_boilerplate", "v37_streaming_neardup", "v34_streaming_sessions",
    # the 7 r8-freshest recerts
    "v38_stream_outer_join", "v41_stateful_timeout",
    "v43_cdc_stream_apply", "v46_dedup_within_watermark",
    "d37_pagerank", "r6_pq_adc", "r7_ivfpq",
    # the 16 oldest r9-freshest recerts (registry order)
    "d38_semdedup", "d51_triangles", "d66_label_prop", "r8_sq8_topk",
    "d48_hll_distinct", "d49_cms_heavy_hitters", "d52_bloom_prune",
    "d53_quantile_hist", "d55_kmv_intersect", "d64_join_cardinality",
    "d69_equidepth_bins", "d72_winsorize", "d73_cms_drift",
    "d24_repetition", "d25_decontamination", "d31_unigram_nll",
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
