"""Driver-entry-point contract tests.

The driver validates multi-chip correctness by calling
``__graft_entry__.dryrun_multichip(n)`` from ITS process, whose jax may
already be claimed by a real accelerator even when env vars say CPU (the
axon sitecustomize imports jax at interpreter startup — see
``tests/conftest.py``).  Rounds 1 and 2 both recorded red
``MULTICHIP_r*.json`` artifacts because the guard trusted env vars; these
tests pin the fixed contract:

* the guard consults the LIVE backend, never env vars;
* any outcome other than "cpu with >= n devices" routes to the subprocess
  re-exec with a forced pure-CPU environment;
* an in-process failure still falls back to the subprocess before raising.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft  # noqa: E402


class _FakeDevice:
    def __init__(self, platform):
        self.platform = platform


def _capture_subprocess(monkeypatch, record, returncode=0):
    import subprocess

    def fake_run(cmd, env=None, cwd=None):
        record.append({"cmd": cmd, "env": env, "cwd": cwd})

        class R:
            pass

        r = R()
        r.returncode = returncode
        return r

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_env_says_cpu_but_live_backend_is_tpu_takes_subprocess(monkeypatch):
    """The exact round-2 driver trap: JAX_PLATFORMS/XLA_FLAGS claim a CPU
    mesh, but the live backend is one TPU device.  The dryrun must NOT run
    (and raise) in-process — it must re-exec the subprocess."""
    import jax

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    monkeypatch.setattr(jax, "devices", lambda: [_FakeDevice("tpu")])

    calls = []
    _capture_subprocess(monkeypatch, calls)

    def never(_n):  # in-process body must not run
        raise AssertionError("in-process body ran against a TPU backend")

    monkeypatch.setattr(graft, "_dryrun_multichip_body", never)

    graft.dryrun_multichip(8)

    assert len(calls) == 1
    env = calls[0]["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["PALLAS_AXON_POOL_IPS"] == ""
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]


def test_too_few_live_devices_takes_subprocess(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "devices", lambda: [_FakeDevice("cpu")])
    calls = []
    _capture_subprocess(monkeypatch, calls)
    monkeypatch.setattr(
        graft, "_dryrun_multichip_body",
        lambda n: (_ for _ in ()).throw(AssertionError("ran in-process")))

    graft.dryrun_multichip(8)
    assert len(calls) == 1


def test_devices_probe_exception_takes_subprocess(monkeypatch):
    import jax

    def boom():
        raise RuntimeError("backend initialization failed")

    monkeypatch.setattr(jax, "devices", boom)
    calls = []
    _capture_subprocess(monkeypatch, calls)
    graft.dryrun_multichip(8)
    assert len(calls) == 1


def test_in_process_failure_falls_back_to_subprocess(monkeypatch):
    """Even with a healthy-looking CPU mesh, an in-process exception must try
    the subprocess before surfacing anything to the driver."""
    import jax

    monkeypatch.setattr(jax, "devices",
                        lambda: [_FakeDevice("cpu")] * 8)
    calls = []
    _capture_subprocess(monkeypatch, calls)

    def flaky(_n):
        raise RuntimeError("transient in-process failure")

    monkeypatch.setattr(graft, "_dryrun_multichip_body", flaky)
    graft.dryrun_multichip(8)
    assert len(calls) == 1


def test_subprocess_failure_raises(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "devices", lambda: [_FakeDevice("tpu")])
    calls = []
    _capture_subprocess(monkeypatch, calls, returncode=3)
    with pytest.raises(RuntimeError, match="rc=3"):
        graft.dryrun_multichip(8)


def test_healthy_cpu_mesh_runs_in_process(monkeypatch):
    """With a real >=8-device CPU backend (the conftest guarantees one), the
    in-process branch is used and no subprocess is spawned."""
    import jax

    if len(jax.devices()) < 8 or jax.devices()[0].platform != "cpu":
        pytest.skip("needs the conftest's 8-device CPU mesh")

    calls = []
    _capture_subprocess(monkeypatch, calls)
    ran = []
    monkeypatch.setattr(graft, "_dryrun_multichip_body",
                        lambda n: ran.append(n))
    graft.dryrun_multichip(8)
    assert ran == [8]
    assert calls == []


@pytest.mark.slow
def test_dryrun_body_end_to_end():
    """The real dryrun body on the conftest's virtual CPU mesh — the same
    code the driver's subprocess executes."""
    import jax

    if len(jax.devices()) < 8 or jax.devices()[0].platform != "cpu":
        pytest.skip("needs the conftest's 8-device CPU mesh")
    graft._dryrun_multichip_body(8)
