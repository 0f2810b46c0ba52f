"""Cooperative bench-preemption protocol for the single tunneled TPU chip.

The round-end ``bench.py`` run is the official perf record and must never
measure against a live control run (the BENCH_r03 contention incident) —
but a multi-hour control must also never starve it (the BENCH_r04 rc=124
incident, where the advisory chip lock held the bench past the driver's
timeout and the round closed with no perf record). Protocol:

- ``bench.py`` touches the flag file (``.controls/BENCH_WAITING``) before
  waiting on the chip lock, and removes it only after its measurements
  finish, so the control stays paused for the whole measurement window.
- Long-running chip work (control training / post-train stages) calls
  :func:`preempt_requested` at resumable boundaries — train eval
  milestones (the checkpoint just saved) and cached post-train stages —
  and exits with :data:`EXIT_PREEMPTED` (75, ``EX_TEMPFAIL``).
- ``scripts/run_control_resilient.sh`` treats rc=75 as "pause, not
  failure": it releases ``.controls/CHIP_LOCK``, polls until the flag
  clears (with a staleness bail-out in case the bench crashed), re-acquires
  the lock, and resumes the attempt without consuming the attempt budget.

The flag path reaches Python through the ``TWOFORONE_PREEMPT_FLAG``
environment variable (exported by the launcher); library code that is not
launched under the resilient launcher sees an empty path and never
preempts, so tests and notebooks are unaffected.
"""

from __future__ import annotations

import os

#: ``EX_TEMPFAIL``: the attempt is healthy and resumable; relaunch when the
#: bench flag clears.
EXIT_PREEMPTED = 75


def flag_path() -> str:
    """The bench-waiting flag file path, or "" when not under the launcher."""
    return os.environ.get("TWOFORONE_PREEMPT_FLAG", "")


def preempt_requested() -> bool:
    """True when a bench run is waiting for the chip."""
    p = flag_path()
    return bool(p) and os.path.exists(p)


def exit_if_preempted(context: str) -> None:
    """Exit with :data:`EXIT_PREEMPTED` if a bench is waiting.

    Callers invoke this only at boundaries where all completed work is
    already persisted (checkpoint milestone saved / post-train stage cached),
    so the subsequent resume loses nothing.
    """
    if preempt_requested():
        print(
            f"bench preemption flag set — yielding the chip at {context} "
            f"(rc={EXIT_PREEMPTED}; resume is lossless)",
            flush=True,
        )
        raise SystemExit(EXIT_PREEMPTED)
