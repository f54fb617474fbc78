"""Process-level JAX runtime setup.

The TPU tunnel in this environment compiles remotely and slowly; the
persistent compilation cache turns the second process-lifetime of any jitted
program into a cache hit. Call `setup_jax_cache()` before the first jit in
every entry point (bench, CLI, driver entry)."""

from __future__ import annotations

import os


def setup_jax_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SRTPU_JAX_CACHE", os.path.join(os.path.dirname(
            os.path.dirname(os.path.dirname(__file__))), ".jax_cache"))
    if cache_dir.lower() in ("off", "0", "none", ""):
        # explicit opt-out: under pytest the suite compiles hundreds of
        # tiny programs in one process and a late large-executable cache
        # write can SIGABRT the whole run (observed in the round-4 full
        # suite inside compilation_cache.put_executable_and_time); tests
        # set SRTPU_JAX_CACHE=off in conftest.py
        return
    try:
        # the default resolves next to the package, which is read-only
        # for system installs — a cache is an optimization, never fatal
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # unwritable dir / older jax without these flags
