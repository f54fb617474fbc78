"""Test harness: force an 8-device virtual CPU mesh so sharding/collective
code paths are exercised without TPU hardware (SURVEY.md section 4)."""

import os

# Force CPU: unit tests must not depend on (or monopolize) the TPU; set
# SRTPU_TEST_PLATFORM to override for on-hardware runs. The environment's
# sitecustomize imports jax before this file runs, so the env var alone is
# too late — use jax.config.update as well.
_platform = os.environ.get("SRTPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
# Keep the persistent compile cache OFF for the whole pytest process: the
# suite compiles hundreds of tiny programs, and a late large-executable
# cache write SIGABRTed the round-4 full-suite run (compilation_cache
# put_executable_and_time). Tests that call cli.main()/setup_jax_cache()
# would otherwise flip it on mid-suite. Override with SRTPU_JAX_CACHE=<dir>.
os.environ.setdefault("SRTPU_JAX_CACHE", "off")
import re as _re

flags = os.environ.get("XLA_FLAGS", "")
_m = _re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
elif int(_m.group(1)) < 8:
    # a smaller preexisting count would silently skip every @requires_8
    # sharding test — raise it so the suite keeps its collective coverage
    os.environ["XLA_FLAGS"] = _re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", flags)

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables at every module boundary. A full-suite
    run compiles ~300 XLA CPU programs into one process; the accumulated
    LLVM JIT state made a late, large pjit compile segfault
    (test_pipeline_parallel trainer composition, round 5 — the round-4
    SIGABRT moved here once the persistent cache was pinned off).
    Clearing per module caps resident executables at one module's worth;
    cross-module cache reuse was near zero anyway (each module builds
    its own models)."""
    yield
    jax.clear_caches()


@pytest.fixture(autouse=True)
def _close_leaked_loggers():
    """Close any MetricsLogger a test leaked: each TB SummaryWriter owns
    background threads and the accumulated writers destabilized the
    round-4 full-suite run (SIGABRT at ~250/273)."""
    yield
    from superresolution_tpu.train.logging import close_all_open_loggers

    close_all_open_loggers()
