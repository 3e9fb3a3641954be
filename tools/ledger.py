"""Rotation-ledger report: per-entry freshest green driver row and the
staleness tiers, computed from the committed CORRECTNESS_r*.json files
plus the live registry — the same arithmetic the window drafts in
tools/precert.py cite, now machine-checkable instead of hand-counted
(r11; the r11 review caught a hand-drafted window that skipped the
v71/v72 second rows — this report makes that class of omission
visible).

    python tools/ledger.py [--assume-green]

--assume-green treats the CURRENT first-50 window as a green row for
the upcoming round (what the next-window draft needs); without it the
report reflects only committed driver rows.

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
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
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


def main() -> None:
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
