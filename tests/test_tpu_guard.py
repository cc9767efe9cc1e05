"""Platform/contention guards (utils/tpu_guard) — the STATUS_R3
methodology incident (a "CPU" eval silently running on the contended TPU)
must be impossible to repeat silently."""

import os

import pytest

from deepdenoiser_tpu.utils import tpu_guard


@pytest.fixture
def lock_path(tmp_path, monkeypatch):
    path = tmp_path / "chip.lock"
    monkeypatch.setattr(tpu_guard, "LOCK_PATH", path)
    return path


def test_require_platform_cpu_ok():
    # conftest forces the CPU backend for the whole suite
    tpu_guard.require_platform("cpu")


def test_require_platform_tpu_raises_on_cpu():
    with pytest.raises(RuntimeError, match="sitecustomize"):
        tpu_guard.require_platform("tpu")


def test_lock_acquire_release(lock_path):
    with tpu_guard.tpu_lock("t1"):
        assert lock_path.read_text() == str(os.getpid())
    assert not lock_path.exists()


def test_lock_contended_raises(lock_path):
    lock_path.write_text("1")  # PID 1 is always alive
    with pytest.raises(RuntimeError, match="contended"):
        with tpu_guard.tpu_lock("t2"):
            pass
    # the contending holder's lock is left untouched
    assert lock_path.read_text() == "1"


def test_stale_lock_reclaimed(lock_path):
    lock_path.write_text("999999999")  # dead PID
    with tpu_guard.tpu_lock("t3"):
        assert lock_path.read_text() == str(os.getpid())


def test_own_pid_lock_not_contended(lock_path):
    # re-entry from the same process (e.g. bench.py's two measure() calls
    # under one lock) must not deadlock on its own lockfile
    lock_path.write_text(str(os.getpid()))
    assert tpu_guard.holder() is None


def test_guard_skip_env(lock_path, monkeypatch):
    monkeypatch.setenv("DDTPU_SKIP_GUARD", "1")
    # would raise on platform (cpu != tpu) if not skipped
    tpu_guard.guard_latency_tool("t4")
    assert not lock_path.exists()


def test_probe_compute_cpu_true():
    # a healthy backend completes the tiny probe well inside the timeout;
    # force the child to CPU so the test never touches the real chip
    assert tpu_guard.probe_compute(timeout_s=120.0, platform="cpu")


def test_probe_compute_timeout_false(monkeypatch):
    # simulate the wedged chip: the child blocks forever, the probe's
    # subprocess timeout converts that into a clean False
    monkeypatch.setattr(
        tpu_guard, "_probe_src", lambda platform: "import time; time.sleep(60)"
    )
    assert not tpu_guard.probe_compute(timeout_s=1.0)


def test_require_live_chip_raises_on_wedge(monkeypatch):
    monkeypatch.setattr(tpu_guard, "probe_compute", lambda timeout_s: False)
    with pytest.raises(RuntimeError, match="wedge-locked"):
        tpu_guard.require_live_chip("t5", timeout_s=1.0)
