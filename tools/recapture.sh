#!/bin/bash
# One-shot on-TPU benchmark recapture (run when the tunnel is alive):
#   bench (writes BENCH_LATEST.json + README table) -> smoke -> roofline.
# bench.py probes the tunnel itself (device discovery HANGS when it is
# down) and prints an honest zero-value JSON line if unreachable.
#
# Order matters: bench is the driver-graded deliverable and runs FIRST;
# the smoke is compile-heavy cold (11 engine x theory x mode programs at
# 64^3, ~1-2 min each on the axon toolchain) and must never block or
# abort a bench capture, so it runs after, non-fatally, under its own
# generous timeout (warm reruns take well under two minutes thanks to
# the shared persistent compile cache).
set -e
cd "$(dirname "$0")/.."
echo "== bench (budget ${BENCH_BUDGET_S:-2400}s, incremental output) =="
BENCH_BUDGET_S=${BENCH_BUDGET_S:-2400} timeout 3500 python bench.py | tail -1
echo "== TPU smoke (one jitted step per engine x theory x mode) =="
timeout "${SMOKE_TIMEOUT_S:-2400}" python tools/tpu_smoke.py || \
    echo "SMOKE FAILED (rc $?) -- bench numbers above are still valid"
echo "== roofline (achieved vs peak per component) =="
python tools/roofline.py || true
echo "recapture done: review BENCH_LATEST.json + README, fold any new"
echo "component numbers into BENCH_NOTES.md, then commit."
