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
    # Atomic create (O_CREAT|O_EXCL): the former check-then-write let two
    # latency tools starting concurrently both pass the holder() check and
    # overwrite each other's PID — exactly the contended-latency scenario
    # the lock exists to prevent (ADVICE r4 #3). On EEXIST with a dead
    # holder, reclaim (unlink) and retry once.
    for attempt in range(2):
        try:
            fd = os.open(LOCK_PATH, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                f.write(str(os.getpid()))
            return
        except FileExistsError:
            other = holder()
            if other is not None:
                raise RuntimeError(
                    f"{tool}: device is contended — PID {other} holds "
                    f"{LOCK_PATH}. Latency measured now would be inflated "
                    "garbage (docs/STATUS_R3.md methodology note). Wait for "
                    "that process or remove the lock if you know it is not "
                    "using the chip."
                )
            if attempt == 0:  # stale lock (dead PID or our own): reclaim
                try:
                    LOCK_PATH.unlink()
                except FileNotFoundError:
                    pass
    raise RuntimeError(f"{tool}: could not acquire {LOCK_PATH} (lock churn)")


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


def _probe_src(platform: str | None) -> str:
    force = (
        f"import jax; jax.config.update('jax_platforms', {platform!r}); "
        if platform
        else "import jax; "
    )
    return force + "import jax.numpy as jnp; print(float(jnp.ones((128, 128)).sum()))"


def probe_compute(timeout_s: float = 60.0, platform: str | None = None) -> bool:
    """True iff a FRESH process completes a tiny device computation in time.

    Detects the wedged-chip state (three occurrences on 2026-08-19, see
    docs/STATUS_R4.md): after an axon tunnel drop — or after killing a
    client that was blocked at first compute — the server side holds the
    device for ~40 min. In that state ``jax.devices()`` still answers, so
    ``require_platform`` passes, and the first real computation hangs
    forever. The probe runs in a subprocess so the *wedge blocks the
    child*, which the timeout then kills (killing an already-blocked
    client was observed NOT to re-arm the lock); the caller gets a clean
    boolean instead of inheriting the hang.

    ``platform``: force the child's backend (tests use 'cpu'); default
    inherits the sitecustomize platform, i.e. the real chip.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", _probe_src(platform)],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def require_live_chip(tool: str, timeout_s: float = 150.0) -> None:
    """Fail fast (RuntimeError) when the chip is wedge-locked instead of
    hanging at first compute. Call before long compiles in chip tools.

    The budget must cover worst-case HOST slowness, not just the wire: the
    probe is a fresh subprocess whose jax import + tiny compile take ~19 s
    on an idle host but >60 s when the single host core is contended
    (measured 2026-08-20: a concurrent pytest run pushed the probe past a
    60 s budget and produced a FALSE wedge diagnosis, whose prescribed
    remedy — 45 min of chip silence — costs far more than a longer probe).
    A real wedge blocks forever, so a generous budget only delays the
    error path, never the success path."""
    if probe_compute(timeout_s):
        return
    raise RuntimeError(
        f"{tool}: the TPU accepts connections but a bounded compute probe "
        f"did not finish within {timeout_s:.0f}s — the chip is wedge-locked "
        "(tunnel-drop aftermath; the server-side lock clears ~40-65 min "
        "after the last blocked client died). IMPORTANT: this probe itself "
        "just became a blocked client, restarting that clock — do NOT call "
        "this in a retry loop tighter than the window or the chip stays "
        "wedged forever (measured 2026-08-19: 5-min retries held the lock "
        ">2.5 h). Wait >=45 min of total chip silence, then probe once. "
        "See docs/STATUS_R4.md infra incidents."
    )


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
    if expected == "tpu":
        require_live_chip(tool)
