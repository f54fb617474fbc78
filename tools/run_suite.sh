#!/usr/bin/env bash
# Full-suite certification run (VERDICT r4 item 1 'done when').
# Runs `python -m pytest tests/ -q` N times (default 2) and reports
# each run's exit code and wall time. The suite is CPU-pinned
# (tests/conftest.py) and keeps the JAX persistent compile cache OFF
# (SRTPU_JAX_CACHE=off) — the round-4 full-suite SIGABRT was a
# mid-suite cache-enable + leaked TB writers, both fixed.
set -u
N="${1:-2}"
cd "$(dirname "$0")/.."
overall=0
for i in $(seq 1 "$N"); do
    start=$(date +%s)
    python -m pytest tests/ -q
    rc=$?
    dur=$(( $(date +%s) - start ))
    echo "suite run $i/$N: rc=$rc wall=${dur}s"
    [ $rc -ne 0 ] && overall=$rc
done
exit $overall
