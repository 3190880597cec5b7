"""Driver-contract tests for __graft_entry__.py.

The driver calls dryrun_multichip(8) against the single-chip axon backend;
the entry must bootstrap a virtual multi-device CPU platform itself (round-1
VERDICT item 1). These tests pin both dispatch paths.
"""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_direct_path_on_virtual_mesh():
    # conftest forces 8 virtual CPU devices, so this takes the direct path
    assert jax.device_count() >= 8
    graft.dryrun_multichip(8)


def test_dryrun_bootstraps_subprocess_when_devices_missing(monkeypatch):
    calls = {}

    def fake_run(cmd, env=None, cwd=None):
        calls["cmd"] = cmd
        calls["env"] = env
        calls["cwd"] = cwd

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(graft.jax, "device_count", lambda: 1)
    monkeypatch.setattr(subprocess, "run", fake_run)
    graft.dryrun_multichip(16)
    assert calls["cmd"][-2:] == ["--multichip", "16"]
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert "xla_force_host_platform_device_count=16" in calls["env"]["XLA_FLAGS"]
    assert calls["cwd"] == REPO


def test_dryrun_bootstrap_failure_raises(monkeypatch):
    def fake_run(cmd, env=None, cwd=None):
        class R:
            returncode = 3

        return R()

    monkeypatch.setattr(graft.jax, "device_count", lambda: 1)
    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="rc=3"):
        graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_real_subprocess_end_to_end():
    """Actually re-exec like the driver would on a 1-device backend."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual devices in the child's parent env
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "one DP train step ok" in res.stdout
    assert "DPxTP denoise ok" in res.stdout
    assert "DPxTP train step ok" in res.stdout
