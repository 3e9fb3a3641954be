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

# The r16 certification window: regenerated at r16 session start with
# `python tools/ledger.py --emit-window` (the driver's r15 rows landed,
# so the r15-close draft drifted exactly as pre-registered), then the
# COVERAGE.md changed-text rule applied by hand: the five entries whose
# text changed in the r16 cache_registry fix (d15_components_dedup,
# d50_group_split, d58_cluster_qa, d12_curation,
# d43_curate_with_containment — VERDICT r15 item 2 / NOTES_r15 §10)
# jump their tiers into the window, displacing the mechanical emit's
# three r13-tier tail slots (v73/d40/d32) and last two r12-tier slots
# (d25_decontamination, d31_unigram_nll).  Slot arithmetic: 3
# never-certified firsts (the r15 registry additions) + 4 single-green
# r13-additions' second rows (v76/v77/d75/d76) + 5 changed-text recerts
# + the 38 oldest r12-freshest recerts (registry order,
# v29_grouped_udaf first; d5_minhash_dedup and d21_curate_mix_pack are
# changed-text too but already sit in this tier) = 50.
NEXT_WINDOW = [
    "r11_maxsim_topk",
    "v79_bounded_permute",
    "r12_maxsim_rerank",
    "v76_bounded_pattern",
    "v77_alternation_pattern",
    "d75_semdedup_capped",
    "d76_lsh_refined",
    "d15_components_dedup",
    "d50_group_split",
    "d58_cluster_qa",
    "d12_curation",
    "d43_curate_with_containment",
    "v29_grouped_udaf",
    "v30_stream_static_join",
    "v31_stream_stream_join",
    "v32_streaming_dedup",
    "d14_salted_agg",
    "d4_jaccard_pairs",
    "d5_minhash_dedup",
    "d6_simhash",
    "d17_hash_sample",
    "d18_hash_split",
    "d19_training_mix",
    "d20_incremental_neardup",
    "d21_curate_mix_pack",
    "d22_pii_scrub",
    "d23_boilerplate",
    "v37_streaming_neardup",
    "v34_streaming_sessions",
    "v38_stream_outer_join",
    "v41_stateful_timeout",
    "v43_cdc_stream_apply",
    "v46_dedup_within_watermark",
    "d37_pagerank",
    "r6_pq_adc",
    "r7_ivfpq",
    "d38_semdedup",
    "d51_triangles",
    "d66_label_prop",
    "r8_sq8_topk",
    "d48_hll_distinct",
    "d49_cms_heavy_hitters",
    "d52_bloom_prune",
    "d53_quantile_hist",
    "d55_kmv_intersect",
    "d64_join_cardinality",
    "d69_equidepth_bins",
    "d72_winsorize",
    "d73_cms_drift",
    "d24_repetition",
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
