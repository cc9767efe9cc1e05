"""Platform + contention guards for latency-reporting tools.

Two failure modes this module makes impossible to repeat silently (both
happened in round 3, docs/STATUS_R3.md "Methodology note"):

1. **Silent platform override.** The axon sitecustomize registers the TPU
   plugin and exports JAX_PLATFORMS=axon for every fresh process, so
   setting `JAX_PLATFORMS=cpu` in the environment does nothing. A tool
   that *believes* it is measuring CPU latency can actually be running on
   the TPU. `require_platform()` asserts the backend the tool thinks it
   is using, after first device use, from the authoritative
   `jax.devices()` answer.

2. **Contended-chip latency.** Only one process can use the tunneled chip
   at a time; a second one executes fine but its latency readings are
   inflated garbage. `tpu_lock()` is an advisory PID lockfile: latency
   tools hold it for their run and refuse to report if another live
   process holds it. Quality-only tools may ignore it (quality is
   deterministic under contention).
"""

from __future__ import annotations

import contextlib
import os
from pathlib import Path

LOCK_PATH = Path(os.environ.get("DDTPU_LOCK", "/tmp/ddtpu_chip.lock"))


def require_platform(expected: str) -> None:
    """Assert the live JAX backend matches what the tool intends.

    `expected`: 'cpu' or 'tpu'. The axon plugin's platform string is
    'axon' but its devices are TPUs; both spellings are accepted for
    'tpu'. Raises RuntimeError with the remediation (jax.config.update
    inside the script, not env vars) on mismatch.
    """
    import jax

    plat = jax.devices()[0].platform.lower()
    ok = {"cpu": plat == "cpu", "tpu": plat in ("tpu", "axon")}[expected]
    if not ok:
        raise RuntimeError(
            f"intended platform {expected!r} but jax.devices() says {plat!r}. "
            "The axon sitecustomize overrides JAX_PLATFORMS for every fresh "
            "process — force a backend with "
            "jax.config.update('jax_platforms', ...) inside the script "
            "BEFORE first device use, never via the environment variable."
        )


def _live(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except (ProcessLookupError, PermissionError):
        return False
    except OSError:
        return False


def holder() -> int | None:
    """PID of a live lock holder, else None (missing/stale locks clean up)."""
    try:
        pid = int(LOCK_PATH.read_text().strip())
    except (FileNotFoundError, ValueError):
        return None
    if pid != os.getpid() and _live(pid):
        return pid
    return None


def _acquire(tool: str) -> None:
    other = holder()
    if other is not None:
        raise RuntimeError(
            f"{tool}: device is contended — PID {other} holds {LOCK_PATH}. "
            "Latency measured now would be inflated garbage "
            "(docs/STATUS_R3.md methodology note). Wait for that process "
            "or remove the lock if you know it is not using the chip."
        )
    LOCK_PATH.write_text(str(os.getpid()))


def _release() -> None:
    try:
        if LOCK_PATH.read_text().strip() == str(os.getpid()):
            LOCK_PATH.unlink()
    except FileNotFoundError:
        pass


@contextlib.contextmanager
def tpu_lock(tool: str):
    """Advisory chip lock for latency-reporting tools.

    Raises RuntimeError if another live process holds it (its latency AND
    ours would both be contention-inflated). Stale locks (dead PID) are
    reclaimed.
    """
    _acquire(tool)
    try:
        yield
    finally:
        _release()


def guard_latency_tool(tool: str, expected: str = "tpu") -> None:
    """One-call guard for CLI mains: assert the intended backend and hold
    the chip lock until process exit (atexit release). Long-running chip
    users (training) call it too so concurrent latency tools refuse to
    measure. DDTPU_SKIP_GUARD=1 bypasses both (CPU CI smoke tests)."""
    if os.environ.get("DDTPU_SKIP_GUARD"):
        return
    import atexit

    require_platform(expected)
    _acquire(tool)
    atexit.register(_release)
