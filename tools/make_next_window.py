"""Emit the NEXT-round reorder target: the full queries() key order
with NEXT_WINDOW (tools/precert.py — the canonical, `--next`-gated
next-round slot list) as the first 50 keys and every remaining key in
its current relative order after them.  (Round-agnostic since r10;
formerly make_r10_window.py.)

READ-ONLY: this prints the target; it does not edit __spark_entry__.py.
The next-round session-1 workflow:

    1. python tools/make_next_window.py         # the target key order
    2. reorder the queries() dict literal to match (the dict entries
       themselves don't change — only their order)
    3. repin tests/test_entry.py::test_certification_window_membership
       with the cohort set this tool prints
    4. python tools/precert.py                  # the standard gate

Run with --check AFTER the reorder: exits nonzero unless the live
first-50 == NEXT_WINDOW exactly.  (Before the reorder it naturally
reports MISMATCH — the live window is still the PRIOR round's.)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from precert import NEXT_WINDOW  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    keys = list(entrymod.queries())
    missing = [n for n in NEXT_WINDOW if n not in keys]
    if missing or len(NEXT_WINDOW) != 50:
        print(f"NEXT_WINDOW invalid: missing={missing} "
              f"len={len(NEXT_WINDOW)}", flush=True)
        sys.exit(1)

    window = list(NEXT_WINDOW)
    ws = set(window)
    rest = [k for k in keys if k not in ws]
    target = window + rest

    if "--check" in sys.argv[1:]:
        live = keys[:50]
        if live == window:
            print("OK: live first-50 == NEXT_WINDOW")
            return
        diverges = next(
            (i for i, (a, b) in enumerate(zip(live, window)) if a != b),
            min(len(live), len(window)),
        )
        print(f"MISMATCH at position {diverges}: "
              f"live={live[diverges:diverges + 3]} "
              f"want={window[diverges:diverges + 3]}")
        sys.exit(1)

    print(f"# next-round target key order ({len(target)} keys; "
          "first 50 = NEXT_WINDOW)")
    for i, k in enumerate(target):
        marker = "  # <- window boundary" if i == 49 else ""
        print(f"{i + 1:3d}  {k}{marker}")
    print()
    print("# membership-test pin (tests/test_entry.py):")
    print("NEXT_ROUND_WINDOW = {")
    for k in window:
        print(f'    "{k}",')
    print("}")


if __name__ == "__main__":
    main()
