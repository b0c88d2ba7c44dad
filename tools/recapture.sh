#!/bin/bash
# One-shot on-TPU benchmark recapture (run when the tunnel is alive):
#   smoke -> bench (writes BENCH_LATEST.json) -> README table -> roofline.
# Probe the tunnel first (device discovery HANGS when it is down):
#   timeout 70 python -c "import jax; assert jax.devices()[0].platform=='tpu'"
set -e
cd "$(dirname "$0")/.."
echo "== TPU smoke (one jitted step per engine x theory) =="
timeout 300 python tools/tpu_smoke.py
echo "== bench (budget ${BENCH_BUDGET_S:-2400}s, incremental output) =="
BENCH_BUDGET_S=${BENCH_BUDGET_S:-2400} timeout 3500 python bench.py | tail -1
echo "== regenerate README perf table from BENCH_LATEST.json =="
python tools/gen_perf_table.py
echo "== roofline (achieved vs peak per component) =="
python tools/roofline.py || true
echo "recapture done: review BENCH_LATEST.json + README, fold any new"
echo "component numbers into BENCH_NOTES.md, then commit."
