"""Rotation-ledger report: per-entry freshest green driver row and the
staleness tiers, computed from the committed CORRECTNESS_r*.json files
plus the live registry — the same arithmetic the window drafts in
tools/precert.py cite, now machine-checkable instead of hand-counted
(r11; the r11 review caught a hand-drafted window that skipped the
v71/v72 second rows — this report makes that class of omission
visible).

    python tools/ledger.py [--assume-green] [--emit-window] [--check-next]

--assume-green treats the CURRENT first-50 window as a green row for
the upcoming round (what the next-window draft needs); without it the
report reflects only committed driver rows.

--emit-window (r14, VERDICT r13 item 6) prints the computed next
window as a paste-ready NEXT_WINDOW literal — the priority rule
(never-certified, then single-green oldest-first, then tiers
oldest-first, registry order within each) applied mechanically, so
the cohort arithmetic lives HERE instead of prose + hand-copied
lists.  Implies --assume-green (drafting happens before the driver
grades the live window).

--check-next recomputes that window and diffs it against
tools/precert.py::NEXT_WINDOW — exact ORDER-SENSITIVE equality,
nonzero exit on any divergence (the r3-class drift the gate exists
to stop).  A deliberate changed-text tier jump that edits NEXT_WINDOW
away from the mechanical rule must be recorded in NOTES with the
check's expected MISMATCH.

Green counting rule (COVERAGE.md): hash_match == true, or a rows-only
entry recorded with err == "no_oracle".
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402


def freshest_rows() -> tuple[dict[str, int], dict[str, int]]:
    """(freshest green row per entry, total green rows per entry)."""
    fresh: dict[str, int] = {}
    greens: dict[str, int] = {}
    # historical rounds live under history/ (VERDICT r16 item 5); the
    # current round's file lands at the repo root — glob both
    for path in sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        + glob.glob(os.path.join(REPO, "history", "CORRECTNESS_r*.json"))
    ):
        # anchored fullmatch: a stray CORRECTNESS_rX.json or
        # CORRECTNESS_r11_backup.json must be skipped loudly, not
        # AttributeError'd or mis-bucketed (ADVICE r11)
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(path))
        if m is None:
            print(f"ledger: skipping non-canonical file {path}",
                  file=sys.stderr)
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            ok = row.get("hash_match") is True or row.get("err") == "no_oracle"
            if ok:
                fresh[name] = max(fresh.get(name, 0), rnd)
                greens[name] = greens.get(name, 0) + 1
    return fresh, greens


def compute_next_window(size: int = 50) -> list[str]:
    """The next certification window by the standing priority rule,
    with the CURRENT first-50 assumed green (drafting always happens
    before the driver grades the live window): never-certified first,
    then single-green oldest-first, then tiers oldest-first — registry
    order within each bucket.  Changed-text entries jumping their tier
    remains a manual override (COVERAGE.md policy); apply it by editing
    the emitted list, not this function."""
    keys = list(entrymod.queries())
    fresh, greens = freshest_rows()
    next_round = max(fresh.values(), default=0) + 1
    for name in keys[:size]:
        fresh[name] = next_round
        greens[name] = greens.get(name, 0) + 1
    pos = {k: i for i, k in enumerate(keys)}
    zero = [k for k in keys if greens.get(k, 0) == 0]
    single = sorted(
        (k for k in keys if greens.get(k, 0) == 1),
        key=lambda k: (fresh[k], pos[k]),
    )
    rest = sorted(
        (k for k in keys if greens.get(k, 0) >= 2),
        key=lambda k: (fresh[k], pos[k]),
    )
    return (zero + single + rest)[:size]


def main() -> None:
    emit = "--emit-window" in sys.argv[1:]
    check = "--check-next" in sys.argv[1:]
    if emit or check:
        window = compute_next_window()
        if check:
            sys.path.insert(0, os.path.join(REPO, "tools"))
            from precert import NEXT_WINDOW

            if list(NEXT_WINDOW) == window:
                print("OK: precert.NEXT_WINDOW == ledger-computed window "
                      f"({len(window)} names)")
                return
            diverges = next(
                (i for i, (a, b) in enumerate(zip(NEXT_WINDOW, window))
                 if a != b),
                min(len(NEXT_WINDOW), len(window)),
            )
            print(f"MISMATCH at position {diverges}: "
                  f"precert={list(NEXT_WINDOW)[diverges:diverges + 3]} "
                  f"computed={window[diverges:diverges + 3]}")
            sys.exit(1)
        print("# ledger-computed next window (paste into "
              "tools/precert.py::NEXT_WINDOW;")
        print("# priority rule applied mechanically — apply any "
              "changed-text tier jumps by hand)")
        print("NEXT_WINDOW = [")
        for k in window:
            print(f'    "{k}",')
        print("]")
        return

    assume = "--assume-green" in sys.argv[1:]
    keys = list(entrymod.queries())
    fresh, greens = freshest_rows()
    next_round = max(fresh.values(), default=0) + 1
    if assume:
        for name in keys[:50]:
            fresh[name] = next_round
            greens[name] = greens.get(name, 0) + 1

    tiers: dict[int, list[str]] = {}
    for name in keys:
        tiers.setdefault(fresh.get(name, 0), []).append(name)

    print(f"registry: {len(keys)} entries; CORRECTNESS rows through "
          f"r{max(fresh.values(), default=0)}"
          + (" (current window assumed green)" if assume else ""))
    print("\nfreshest-row tiers (0 = never certified), registry order:")
    for tier in sorted(tiers):
        names = tiers[tier]
        label = "never" if tier == 0 else f"r{tier}"
        print(f"  {label:>5}: {len(names):3d}  {', '.join(names[:6])}"
              + (" ..." if len(names) > 6 else ""))

    single = [n for n in keys if greens.get(n, 0) == 1]
    zero = [n for n in keys if greens.get(n, 0) == 0]
    print(f"\nsingle-green entries ({len(single)}): "
          + (", ".join(single) or "none"))
    print(f"never-certified entries ({len(zero)}): "
          + (", ".join(zero) or "none"))
    print("\nnext-window priority order = never-certified, then "
          "single-green oldest-first, then tiers oldest-first "
          "(registry order within a tier); changed-text entries jump "
          "their tier (COVERAGE.md policy).")


if __name__ == "__main__":
    main()
