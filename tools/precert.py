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

This is the standing gate the r7 bare-session sweeps prototyped (they
predicted 41/41 — NOTES_r07 §8); run it before closing any round that
changes the window or any windowed query.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, cmd: list[str]) -> None:
    print(f"== {label}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        print(f"PRECERT FAILED at stage: {label}", flush=True)
        sys.exit(proc.returncode)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    py = sys.executable
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
    print("PRECERT OK", flush=True)


if __name__ == "__main__":
    main()
