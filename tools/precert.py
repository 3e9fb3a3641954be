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

# The EXECUTING r18 certification window (regenerated at r18 session
# start with `python tools/ledger.py --emit-window` after the driver's
# r17 rows landed — the predicted benign drift: the five r17-certified
# entries r13/r14/v80/v81/r15 fell out of the second-row cohort; the
# five next-oldest r13-freshest recerts entered at the tail).  Slot
# arithmetic: 5 never-certified firsts (the r17 registry additions) +
# 3 second rows for the r16-certified trio (r11/v79/r12) + the full
# r13-tier drain + the oldest r13-freshest recerts (registry order,
# d61_expectations first).
NEXT_WINDOW = [
    "r16_sdm_window",
    "v82_incremental_mv",
    "r17_rocchio_expand",
    "v83_scd2_incremental",
    "v84_streaming_mv",
    "r11_maxsim_topk",
    "v79_bounded_permute",
    "r12_maxsim_rerank",
    "d61_expectations",
    "d62_zscore_outliers",
    "d63_association_rules",
    "d65_feature_hash",
    "d67_dataset_card",
    "d68_modularity",
    "d71_pack_manifest",
    "v74_enrichment_ttl",
    "v75_nfa_pattern",
    "v45_funnel",
    "v48_forward_asof",
    "v49_unpivot",
    "v50_lateral_topk",
    "v51_range_frame",
    "v52_variant",
    "v53_retention",
    "v55_asof_tolerance",
    "v59_rank_family",
    "v60_grouping_sets",
    "v61_filter_clause",
    "v62_null_semantics",
    "v65_not_in_trap",
    "v6_tpch_q1",
    "v23_tpch_q3",
    "v25_tpch_q5",
    "r3_uuid5_keys",
    "r1_rag_answer",
    "o1_rest_pipeline",
    "v33_streaming_ingest",
    "r4_hybrid_ann",
    "d8b_ann_multiprobe",
    "m1_multimodal_features",
    "v35_cube",
    "d1_exact_dedup",
    "d2_minhash_signatures",
    "d3_lsh_candidates",
    "d7_embedding_dups",
    "d8_ann_lsh_topk",
    "d9_embedding_dups_lsh",
    "v67_q21_shape",
    "v68_q20_shape",
    "v69_q22_shape",
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
