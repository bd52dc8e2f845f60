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

import pytest  # noqa: E402
import jax  # noqa: E402

# Parity tests compare f32 numerics against torch; on TPU the default f32
# matmul precision is bf16-based — force true f32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
