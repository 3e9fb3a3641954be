"""Shared landing-dir writer for the availableNow streaming runners.

The micro-batch ORDER contract every stateful runner relies on:
`maxFilesPerTrigger=1` + `latestFirst=false` consume files by
modification time, so each part is written as exactly ONE parquet file
and the mtimes are stamped strictly increasing in part-index order
AFTER all writes land (write-completion order must never leak into
batch order — the r9 v41 lesson, pinned by
tests/test_stateful.py::test_landing_build_file_order_contract).

One implementation instead of the three copies the r10 review found
(v41 builder, v72 builder, test helper).
"""

from __future__ import annotations

import os
import shutil
from concurrent.futures import ThreadPoolExecutor


def write_mtime_pinned_parts(landing: str, parts: list) -> list[str]:
    """Write each DataFrame in `parts` as landing/part<i>.parquet (one
    file each, written concurrently — they are independent map-only
    jobs), then stamp strictly increasing mtimes in index order.
    Returns the file paths.

    Fails if the landing dir already has content: a second call would
    stamp new parts with mtimes equal to existing ones and silently
    break the mtime-order micro-batch contract (ADVICE r10)."""
    os.makedirs(landing, exist_ok=True)
    existing = os.listdir(landing)
    if existing:
        raise ValueError(
            f"landing dir {landing} is not empty ({existing[:3]}...): "
            "a second write_mtime_pinned_parts call would stamp "
            "overlapping mtimes and break micro-batch order — use a "
            "fresh directory"
        )

    def _write(i_part):
        i, part = i_part
        stage = os.path.join(landing, f"_stage{i}")
        part.coalesce(1).write.parquet(stage)
        f = next(x for x in os.listdir(stage) if x.endswith(".parquet"))
        dst = os.path.join(landing, f"part{i}.parquet")
        shutil.move(os.path.join(stage, f), dst)
        shutil.rmtree(stage)
        return dst

    with ThreadPoolExecutor(max_workers=max(len(parts), 1)) as pool:
        dsts = list(pool.map(_write, enumerate(parts)))
    t0 = 1_600_000_000
    for i, dst in enumerate(dsts):
        os.utime(dst, (t0 + i * 60, t0 + i * 60))
    return dsts


def remove_run_ckpt(sink: str) -> None:
    """Best-effort removal of a terminated run's checkpoint dir
    (ckpt_<sink> under the system temp dir).  The memory sink holds
    the materialized rows, so after awaitTermination the checkpoint is
    dead weight — and litter compounds: thousands of accumulated
    scratch dirs measurably slowed the checkpoint-heavy bench queries
    in r12's quiet runs (NOTES_r12 §5).  Runners with fresh per-run
    uuid sinks call this; tests that deliberately RESTART on a
    checkpoint manage their own paths and never route through it."""
    import shutil
    import tempfile as _tf

    shutil.rmtree(
        os.path.join(_tf.gettempdir(), f"ckpt_{sink}"), ignore_errors=True
    )


def remove_landing(path: str) -> None:
    """Best-effort removal of a create-run-discard landing dir once its
    query has terminated (same litter rationale as remove_run_ckpt —
    landings were 669 of the r12 /tmp entries).  Guarded to the system
    temp dir so a mis-wired caller can never delete real data.  Only
    for landings the caller CREATED for one run; builders that return
    a landing for reuse (profilers, kill-restart tests) leave cleanup
    to their callers."""
    import shutil
    import tempfile as _tf

    real = os.path.realpath(path)
    if not real.startswith(os.path.realpath(_tf.gettempdir()) + os.sep):
        raise ValueError(f"refusing to remove non-tempdir landing: {path}")
    shutil.rmtree(real, ignore_errors=True)
