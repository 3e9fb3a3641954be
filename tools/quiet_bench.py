"""Quiet-machine bench adjudication, as a tool instead of a protocol
(r12; the same conversion ledger.py did for window drafting).

    python tools/quiet_bench.py [--no-clean] [sf_dir]

Encodes the drift-adjudication rules NOTES_r11 §2 and NOTES_r12 §5
established the hard way:

1. **Scratch check first** — /tmp litter (stale stream checkpoints,
   landings, bench mirrors) inflates the checkpoint-heavy queries with
   TIGHT reps, mimicking a real regression (r12: b_semdedup 2.4→3.0 s
   from 4.3 GB of accumulated scratch).  The tool reports /tmp state
   and, unless --no-clean, removes THIS REPO'S OWN scratch patterns.
2. **Full suite only** — a standalone few-query session is
   warmup-dominated (reps descend 4.6→1.4 s) and inadmissible; the
   tool always runs the complete bench.
3. **Compare against the committed records** — the last driver round
   (BENCH_r<N>.json, parsed payload) and the committed quiet-run
   sidecar (BENCH_DETAIL.json), flagging the formal regression rule
   (reps spread <10% at >=1.25x the driver median) and annotating the
   known ±12% cross-session variance of the checkpoint-heavy queries.

Exit code is 0 even when candidates are flagged — adjudication is a
human step; the tool's job is to make the evidence cheap and uniform.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# scratch patterns THIS repo's runners/tests create under the temp dir
SCRATCH_GLOBS = [
    "ckpt_*", "bench_mirror_*",
    "v33_*", "v34_*", "v36_*", "v37_*", "v38_*", "v41_*", "v43_*",
    "v72_*", "v74_*",
    # r16: the CDC snapshot/feed fixtures (entries v43/v80/v81 + the
    # test prefixes) and the zorder/d39 writes — same accumulation
    # hazard as the streaming checkpoints (NOTES_r11 §2)
    "v80_*", "v81_*", "v82_*", "v83_*", "v84_*",
    "mv_*", "mvc_*", "mvx_*", "mvu_*", "mvproto_*", "cdc_*", "cdct_*", "cdci_*", "cdcd_*", "cdcf_*",
    "cdcx_*", "cdcy_*", "d39_*", "zorder_*",
]
# queries whose medians carry ~±12% cross-session environment variance
# with tight within-session reps (NOTES_r12 §5 — five-session record)
ENV_SENSITIVE = {"b_semdedup", "b_pagerank", "b_streaming",
                 "b_streaming_stateful"}


def tmp_report(clean: bool) -> None:
    tmp = tempfile.gettempdir()
    entries = os.listdir(tmp)
    print(f"/tmp entries: {len(entries)}")
    ours = [e for g in SCRATCH_GLOBS for e in glob.glob(os.path.join(tmp, g))]
    print(f"own scratch dirs: {len(ours)}")
    if clean and ours:
        for p in ours:
            shutil.rmtree(p, ignore_errors=True)
        print(f"cleaned {len(ours)} scratch dirs")
    elif ours:
        print("(--no-clean: leaving them; expect inflated "
              "checkpoint-heavy medians)")


def last_driver_bench() -> tuple[str, dict] | None:
    # newest = MAX PARSED ROUND NUMBER, not glob sort order: lexicographic
    # sorting only works while filenames stay zero-padded to two digits
    # (BENCH_r99 would sort after BENCH_r100 and silently win)
    best, best_round = None, -1
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")) + glob.glob(
        os.path.join(REPO, "history", "BENCH_r*.json")
    ):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(path))
        if not m or int(m.group(1)) <= best_round:
            continue
        with open(path) as fh:
            rec = json.load(fh)
        parsed = rec.get("parsed")
        if isinstance(parsed, str):
            try:
                parsed = json.loads(parsed)
            except ValueError:
                parsed = None
        if parsed and parsed.get("queries"):
            best_round = int(m.group(1))
            best = (f"r{best_round}", parsed["queries"])
    return best


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--no-clean"]
    clean = "--no-clean" not in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    tmp_report(clean)

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    print(f"running full bench at {sf_dir} ...", flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        print(proc.stderr[-2000:])
        sys.exit(proc.returncode)
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    detail, head = json.loads(lines[-2]), json.loads(lines[-1])
    q, reps = head["queries"], detail["reps"]
    # Re-emit both payload lines into THIS tool's stdout (r18): the
    # BENCH_DETAIL.json sidecar is overwritten by ANY later bench.py
    # invocation (including sf0.001 verify runs), so the quiet run's
    # per-rep record must also survive in the captured log.
    print(json.dumps(detail))
    print(json.dumps(head))

    ref = last_driver_bench()
    ref_name, ref_q = ref if ref else ("none", {})
    print(f"\n{'query':26s} {'driver(' + ref_name + ')':>14s} "
          f"{'quiet':>7s} {'ratio':>6s} {'spread':>7s}  verdict")
    flagged = []
    for name, med in q.items():
        rp = reps.get(name) or []
        spread = (max(rp) - min(rp)) / med if rp and med > 0 else float("inf")
        base = ref_q.get(name)
        ratio = med / base if base and base > 0 and med > 0 else None
        verdict = ""
        if ratio is not None and ratio >= 1.25 and spread < 0.10:
            verdict = "REGRESSION-CANDIDATE (tight reps)"
            if name in ENV_SENSITIVE:
                verdict += " [env-sensitive ±12%: driver-vs-driver only]"
            flagged.append(name)
        print(f"{name:26s} {base if base is not None else float('nan'):14.2f} "
              f"{med:7.2f} {ratio if ratio is not None else float('nan'):6.2f} "
              f"{spread:6.1%}  {verdict}")
    tot = sum(v for v in q.values() if v > 0)
    ref_tot = sum(v for k, v in ref_q.items() if k in q and v > 0)
    print(f"\ntotals: quiet={tot:.1f}s driver({ref_name})={ref_tot:.1f}s "
          f"ratio={tot / ref_tot:.3f}" if ref_tot else f"\ntotal: {tot:.1f}s")
    if flagged:
        print(f"flagged for adjudication: {flagged} — re-run plan-pin "
              "tests, check PLANS.md sections, and if env-sensitive "
              "compare driver-round medians only")
    else:
        print("no query meets the tight-reps regression rule")


if __name__ == "__main__":
    main()
