"""Cooperative bench-preemption protocol (utils/preempt + bench.py +
scripts/run_control_resilient.sh): the round-end bench must be able to
borrow the chip from a live control run at a lossless boundary instead of
starving behind its advisory lock (the BENCH_r04 rc=124 incident)."""

import os
import subprocess
import sys

import pytest

from twoforone_tpu.utils.preempt import (
    EXIT_PREEMPTED,
    exit_if_preempted,
    preempt_requested,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # `import bench` (repo-root module)
    sys.path.insert(0, _REPO)


def test_no_flag_env_means_never_preempted(monkeypatch):
    monkeypatch.delenv("TWOFORONE_PREEMPT_FLAG", raising=False)
    assert not preempt_requested()
    exit_if_preempted("test")  # must not raise


def test_flag_file_triggers_tempfail_exit(monkeypatch, tmp_path):
    flag = tmp_path / "BENCH_WAITING"
    monkeypatch.setenv("TWOFORONE_PREEMPT_FLAG", str(flag))
    assert not preempt_requested()  # path set but file absent
    flag.write_text("bench pid\n")
    assert preempt_requested()
    with pytest.raises(SystemExit) as e:
        exit_if_preempted("unit test")
    assert e.value.code == EXIT_PREEMPTED == 75


def test_bench_sets_and_clears_the_flag(monkeypatch, tmp_path):
    import bench

    monkeypatch.setattr(bench, "_CONTROLS_DIR", str(tmp_path))
    monkeypatch.setattr(bench, "_BENCH_FLAG", str(tmp_path / "BENCH_WAITING"))
    bench._set_bench_flag()
    assert os.path.exists(bench._BENCH_FLAG)
    # Content: pid + epoch, so the launcher's staleness bail-out and a
    # human can both see who raised it.
    pid = int(open(bench._BENCH_FLAG).read().split()[0])
    assert pid == os.getpid()
    bench._clear_bench_flag()
    assert not os.path.exists(bench._BENCH_FLAG)
    bench._clear_bench_flag()  # idempotent


def test_chip_lock_wait_treats_permission_error_as_held(monkeypatch, tmp_path):
    """PermissionError from os.kill(pid, 0) means the pid is ALIVE but
    unsignalable — that is lock-held, not holder-gone (round-4 advisor
    finding: proceeding would measure against a live control)."""
    import bench

    lock_dir = tmp_path
    (lock_dir / "CHIP_LOCK").write_text("12345\n")
    monkeypatch.setattr(bench, "_CONTROLS_DIR", str(lock_dir))

    def fake_kill(pid, sig):
        raise PermissionError

    monkeypatch.setattr(os, "kill", fake_kill)
    sleeps = []
    monkeypatch.setattr(
        bench.time, "sleep", lambda s: sleeps.append(s)
    )
    # max_wait_s=0 -> the deadline is already past, so the function must
    # fall through to the timeout path WITHOUT returning early on the
    # PermissionError (the old bug returned immediately).
    bench._wait_for_chip_lock(max_wait_s=0)
    # Now with one loop iteration allowed: it must WAIT (sleep), not return.
    calls = {"n": 0}
    real_time = bench.time.time

    def fake_time():
        calls["n"] += 1
        # first call computes the deadline, afterwards advance past it
        # after one sleep so the test terminates
        return real_time() + (0 if calls["n"] <= 2 else 10_000)

    monkeypatch.setattr(bench.time, "time", fake_time)
    bench._wait_for_chip_lock(max_wait_s=60)
    assert sleeps, "lock held by an unsignalable live pid must be waited on"


def test_dead_holder_lock_is_ignored(monkeypatch, tmp_path):
    import bench

    (tmp_path / "CHIP_LOCK").write_text("999999999\n")  # no such pid
    monkeypatch.setattr(bench, "_CONTROLS_DIR", str(tmp_path))
    sleeps = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: sleeps.append(s))
    bench._wait_for_chip_lock(max_wait_s=60)
    assert not sleeps


def test_resilient_launcher_understands_the_protocol():
    """The launcher must export the flag path, treat rc=75 as pause (not a
    consumed attempt), and release/re-acquire the chip lock around a
    waiting bench. Assert the contract at the script-text level plus a
    syntax check — the full loop needs a TPU run."""
    script = os.path.join(_REPO, "scripts", "run_control_resilient.sh")
    subprocess.run(["bash", "-n", script], check=True)
    text = open(script).read()
    assert "TWOFORONE_PREEMPT_FLAG" in text
    assert "BENCH_WAITING" in text
    assert '"$rc" -eq 75' in text
    assert "yield_to_bench" in text
