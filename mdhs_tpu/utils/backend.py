"""TPU backend health probing shared by bench.py and __graft_entry__.py.

Two recorded driver failures motivate this module (MULTICHIP_r03/r04):

- r03: the axon TPU tunnel was down; `jax.devices()` hung in backend init
  and the harness timed out (rc=124).
- r04: a rolling libtpu upgrade left the persistent compilation cache
  holding AOT executables built against a NEWER libtpu than the terminal
  was running; the first dispatched op died with
  ``FAILED_PRECONDITION: libtpu version mismatch`` (rc=1).

Both are transient infrastructure states, not code regressions, so the
driver-facing entry points ride them out: probe the backend in a
SUBPROCESS (a failed init can't poison the caller's cached backend
state), retry with sleep, and on a libtpu version mismatch clear the
persistent compilation cache so the retry recompiles against whatever
libtpu is actually live instead of replaying the stale AOT artifact.

No reference counterpart (the reference has no failure-detection layer,
SURVEY.md §5); this is TPU-environment hardening.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

__all__ = ["wait_for_backend", "clear_compilation_cache", "LIBTPU_MISMATCH"]

LIBTPU_MISMATCH = "libtpu version mismatch"

# The probe must EXERCISE DISPATCH, not just enumerate devices: the r04
# mismatch fired at the first executed op (AOT executable vs terminal
# runtime), which `jax.devices()` alone never reaches.
_PROBE_CODE = (
    "import jax, numpy; "
    "jax.devices(); "
    "import jax.numpy as jnp; "
    "assert int(numpy.asarray((jnp.arange(8) + 1).sum())) == 36"
)


def clear_compilation_cache() -> bool:
    """Delete the persistent XLA compilation cache directory.

    Called when a probe reports a libtpu version mismatch: cached TPU AOT
    executables embed the libtpu build they were compiled with, and a
    terminal running a different build refuses them at dispatch. CPU
    entries are collateral (the cache is shared, entries are opaque
    hashes) — losing them costs recompiles, never correctness.
    Returns True if a cache directory existed and was removed.
    """
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax")
    )
    if cache_dir and os.path.isdir(cache_dir):
        shutil.rmtree(cache_dir, ignore_errors=True)
        return True
    return False


def wait_for_backend(
    max_tries: int = 3,
    probe_timeout: int = 150,
    sleep_s: int = 30,
    *,
    runner=None,
    sleeper=None,
) -> bool:
    """Ride out a transient TPU outage / libtpu skew before touching jax.

    Probes in a subprocess (inheriting this process's environment, so the
    probe exercises the same axon/TPU path the caller will). On a
    ``libtpu version mismatch`` failure the persistent compilation cache
    is cleared before the next try. Returns True once a probe succeeds,
    False if all tries fail (callers proceed anyway — the real call will
    surface the true error).

    ``runner`` / ``sleeper`` are injectable for tests that simulate a
    failing first probe without a real outage.
    """
    run = runner or (
        lambda: subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True,
            text=True,
            timeout=probe_timeout,
        )
    )
    do_sleep = sleeper or time.sleep
    last = ""
    for i in range(max_tries):
        try:
            r = run()
            if r.returncode == 0:
                return True
            last = (r.stderr or "")[-2000:]
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {probe_timeout}s"
        if LIBTPU_MISMATCH in last and clear_compilation_cache():
            print(
                "wait_for_backend: libtpu version mismatch — cleared the "
                "persistent compilation cache before retrying",
                file=sys.stderr,
                flush=True,
            )
        if i < max_tries - 1:
            do_sleep(sleep_s)
    print(
        f"warning: backend probe never succeeded ({last[-500:]})",
        file=sys.stderr,
        flush=True,
    )
    return False
