"""Regression tests for the driver-facing entry points in __graft_entry__.py.

Round-1 verdict: the driver ran ``dryrun_multichip(8)`` in the single-chip
axon environment and it failed (`mesh 8x1 needs 8 devices, have 1`) because
nothing tested the entry module itself. These tests run each entry point in
a fresh subprocess — exactly how the driver invokes them — so the contract
(self-provisioned virtual mesh, jittable forward) stays covered.
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(code: str, extra_env: dict | None = None) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Simulate the driver environment: no conftest, no pre-set CPU platform.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # ... except tests must never claim the real TPU (only one process may
    # hold the tunneled chip; a second hangs on the device claim — one
    # full-suite run lost this test to a 600 s hang that way). The env
    # var alone is NOT enough: this image's sitecustomize imports jax and
    # initializes the axon platform before user code runs, so pin CPU
    # with the in-process override too (jax.config.update AFTER import),
    # which is exactly the override the conftest uses.
    env["JAX_PLATFORMS"] = "cpu"
    pre = ("import jax\n"
           "jax.config.update('jax_platforms', 'cpu')\n")
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", pre + code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)


def test_dryrun_multichip_self_provisions_8_devices():
    # The subprocess starts with ONE visible CPU device (no
    # xla_force_host_platform_device_count); dryrun_multichip must
    # provision the 8-device mesh itself, as the driver requires.
    proc = _run(
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n")
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip(8) OK" in proc.stdout


def test_entry_returns_jittable_fn_and_args():
    proc = _run(
        "import jax\n"
        "import __graft_entry__ as g\n"
        "fn, args = g.entry()\n"
        "lowered = jax.jit(fn).lower(*args)\n"  # driver-style compile check
        "out = jax.eval_shape(fn, *args)\n"
        "assert out.shape == (1, 512, 512, 3), out.shape\n"
        "print('entry OK', out.shape)\n")
    assert proc.returncode == 0, proc.stderr
    assert "entry OK" in proc.stdout
