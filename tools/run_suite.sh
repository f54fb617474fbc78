#!/usr/bin/env bash
# Full-suite certification run (VERDICT r4 item 1 'done when').
# Runs the suite N times (default 2) and reports each run's exit code
# and wall time. The suite is CPU-pinned (tests/conftest.py) and keeps
# the JAX persistent compile cache OFF (SRTPU_JAX_CACHE=off).
#
# Default mode is CI-style process isolation: pytest-xdist with whole
# files per worker (-n 4 --dist loadfile). One pytest process that
# compiles all ~300 XLA CPU programs accumulates enough LLVM JIT state
# that a late, large pjit compile dies (round-4 SIGABRT in the cache
# writer; round-5 SIGSEGV in backend_compile_and_load once the cache
# was pinned off) — per-file worker processes cap that state at a
# fraction, and tests/conftest.py additionally clears JAX caches at
# every module boundary. SRTPU_SUITE_SERIAL=1 forces the one-process
# form.
#
# Each run's full output is tee'd to /tmp/suite_run_<i>.log so a crash
# dump's location is never lost to an output pipe. Run with the machine
# otherwise quiet: concurrent chip/benchmark work competes for CPU.
set -u
N="${1:-2}"
cd "$(dirname "$0")/.."
ARGS=(-q)
if [ -z "${SRTPU_SUITE_SERIAL:-}" ]; then
    ARGS=(-q -n 4 --dist loadfile)
fi
overall=0
for i in $(seq 1 "$N"); do
    log="/tmp/suite_run_${i}.log"
    start=$(date +%s)
    python -m pytest tests/ "${ARGS[@]}" >"$log" 2>&1
    rc=$?
    dur=$(( $(date +%s) - start ))
    tail -3 "$log"
    echo "suite run $i/$N: rc=$rc wall=${dur}s log=$log"
    [ $rc -ne 0 ] && overall=$rc
done
exit $overall
