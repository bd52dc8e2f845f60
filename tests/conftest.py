"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding is validated on virtual
CPU devices via XLA_FLAGS (SURVEY.md §4 test strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.0")

import sys  # noqa: E402

import pytest  # noqa: E402
import jax  # noqa: E402

# Parity tests compare f32 numerics against torch; on TPU the default f32
# matmul precision is bf16-based — force true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# --- TPU relay outage hardening ---------------------------------------
# Under axon the suite runs on the real chip through a relay tunnel; a
# relay hiccup mid-suite fails tests with infra signatures unrelated to
# the code under test (observed live: "remote_compile: read body:
# response body closed before all bytes were read"). Probe the backend
# once at session start, and retry a test ONCE when its failure carries
# a relay signature — assertion failures never match these strings, so
# real regressions are never masked (utils/backend.py rationale).
RELAY_SIGNATURES = (
    "remote_compile",
    "response body closed",
    "libtpu version mismatch",
    "failed to connect to all addresses",
    "Socket closed",
    "DEADLINE_EXCEEDED",
)

_ON_TPU = os.environ.get("JAX_PLATFORMS", "cpu").startswith(("axon", "tpu"))


def is_relay_failure(longrepr: str) -> bool:
    return any(s in longrepr for s in RELAY_SIGNATURES)


if _ON_TPU:
    from mdhs_tpu.utils.backend import wait_for_backend as _wfb

    _wfb(max_tries=2)


def pytest_runtest_protocol(item, nextitem):
    if not _ON_TPU:
        return None  # default protocol (CPU runs can't hit the relay)
    from _pytest.runner import runtestprotocol

    item.ihook.pytest_runtest_logstart(nodeid=item.nodeid, location=item.location)
    reports = runtestprotocol(item, nextitem=nextitem, log=False)
    if any(r.failed and is_relay_failure(str(r.longrepr)) for r in reports):
        from mdhs_tpu.utils.backend import wait_for_backend

        sys.stderr.write(
            f"\n[conftest] relay-signature failure in {item.nodeid}; "
            "waiting for the backend and retrying once\n"
        )
        wait_for_backend()
        reports = runtestprotocol(item, nextitem=nextitem, log=False)
    for r in reports:
        item.ihook.pytest_runtest_logreport(report=r)
    item.ihook.pytest_runtest_logfinish(nodeid=item.nodeid, location=item.location)
    return True


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
