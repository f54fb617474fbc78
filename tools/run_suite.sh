#!/usr/bin/env bash
# Full-suite certification run (VERDICT r4 item 1 'done when').
# Runs `python -m pytest tests/ -q` N times (default 2) and reports
# each run's exit code and wall time. The suite is CPU-pinned
# (tests/conftest.py) and keeps the JAX persistent compile cache OFF
# (SRTPU_JAX_CACHE=off) — the round-4 full-suite SIGABRT was a
# mid-suite cache-enable + leaked TB writers, both fixed.
#
# Each run's full output is tee'd to /tmp/suite_run_<i>.log so a crash
# dump's location is never lost to an output pipe, and the last lines
# are echoed inline. Run with the machine otherwise quiet: concurrent
# chip/benchmark work competes for CPU and memory.
set -u
N="${1:-2}"
cd "$(dirname "$0")/.."
overall=0
for i in $(seq 1 "$N"); do
    log="/tmp/suite_run_${i}.log"
    start=$(date +%s)
    python -m pytest tests/ -q >"$log" 2>&1
    rc=$?
    dur=$(( $(date +%s) - start ))
    tail -3 "$log"
    echo "suite run $i/$N: rc=$rc wall=${dur}s log=$log"
    [ $rc -ne 0 ] && overall=$rc
done
exit $overall
