"""Backend-probe hardening (mdhs_tpu/utils/backend.py).

Simulates the two recorded driver failures — a down TPU tunnel
(MULTICHIP_r03) and a libtpu version mismatch from stale AOT cache
entries (MULTICHIP_r04) — without a real outage, via the injectable
runner/sleeper hooks. No reference counterpart (the reference has no
failure-detection layer, SURVEY.md §5).
"""

import os
import subprocess
import types

import pytest

from mdhs_tpu.utils import backend as bk


class _FakeRun:
    """Scripted probe results: each item is an (rc, stderr) pair or the
    string 'timeout'."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self):
        self.calls += 1
        step = self.script.pop(0)
        if step == "timeout":
            raise subprocess.TimeoutExpired(cmd="probe", timeout=1)
        rc, err = step
        return types.SimpleNamespace(returncode=rc, stderr=err)


def test_first_probe_fails_then_recovers():
    run = _FakeRun([(1, "UNAVAILABLE: tunnel down"), (0, "")])
    sleeps = []
    ok = bk.wait_for_backend(max_tries=3, runner=run, sleeper=sleeps.append)
    assert ok
    assert run.calls == 2
    assert sleeps == [30]  # slept once between the failed and good probe


def test_all_probes_fail_returns_false():
    run = _FakeRun([(1, "boom")] * 3)
    sleeps = []
    ok = bk.wait_for_backend(max_tries=3, runner=run, sleeper=sleeps.append)
    assert not ok
    assert run.calls == 3
    assert len(sleeps) == 2  # no sleep after the final try


def test_probe_timeout_is_a_failure_not_a_crash():
    run = _FakeRun(["timeout", (0, "")])
    ok = bk.wait_for_backend(max_tries=2, runner=run, sleeper=lambda s: None)
    assert ok
    assert run.calls == 2


def test_libtpu_mismatch_clears_stale_cache(tmp_path, monkeypatch):
    """r04 scenario: first probe dies with a libtpu version mismatch; the
    persistent compilation cache (holding the stale AOT executable) must
    be cleared before the retry."""
    cache = tmp_path / "jaxcache"
    cache.mkdir()
    (cache / "jit_something-deadbeef").write_bytes(b"stale aot artifact")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(cache))

    err = (
        'FAILED_PRECONDITION: libtpu version mismatch: terminal has "A", '
        'client AOT libtpu has "B".'
    )
    run = _FakeRun([(1, err), (0, "")])
    ok = bk.wait_for_backend(max_tries=3, runner=run, sleeper=lambda s: None)
    assert ok
    assert not cache.exists(), "stale cache dir should have been removed"


def test_other_failures_leave_cache_alone(tmp_path, monkeypatch):
    cache = tmp_path / "jaxcache"
    cache.mkdir()
    (cache / "entry").write_bytes(b"keep me")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(cache))

    run = _FakeRun([(1, "UNAVAILABLE: tunnel down"), (0, "")])
    assert bk.wait_for_backend(max_tries=2, runner=run, sleeper=lambda s: None)
    assert cache.exists() and (cache / "entry").read_bytes() == b"keep me"


def test_clear_compilation_cache_missing_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "absent"))
    assert bk.clear_compilation_cache() is False


def test_graft_entry_tpu_expected(monkeypatch):
    import __graft_entry__ as g

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not g._tpu_expected()
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert g._tpu_expected()
    monkeypatch.setenv("JAX_PLATFORMS", "tpu,cpu")
    assert g._tpu_expected()
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    assert g._tpu_expected()


def test_relay_failure_signatures():
    """conftest's one-shot retry must trigger ONLY on relay-infra
    signatures, never on ordinary assertion failures (it would otherwise
    mask real regressions by rerunning them)."""
    import conftest as cf

    assert cf.is_relay_failure(
        "jax.errors.JaxRuntimeError: INTERNAL: http://127.0.0.1:8083/"
        "remote_compile: read body: response body closed before all bytes"
    )
    assert cf.is_relay_failure("FAILED_PRECONDITION: libtpu version mismatch")
    assert not cf.is_relay_failure(
        "AssertionError: arrays not close: max abs diff 0.12"
    )
    assert not cf.is_relay_failure("ValueError: unknown model family: resnet")
