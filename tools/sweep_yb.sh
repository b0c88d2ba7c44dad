#!/bin/bash
# On-chip sweep of the tile y-block height (PYSCO_TPU_YB).
#
# Larger YB: fewer tiles (less per-tile loop/DMA overhead), better
# y-window pad efficiency (wy = YB + w - 1 + 2*drift rounds to x8), but
# coarser sort granularity and a bigger VMEM window. YB is bound at
# pysco_tpu import, so each value needs its own process. Run only when
# the TPU tunnel is alive.
#
# Usage: tools/sweep_yb.sh [ncoarse] [scheme]   (default 8 tsc = 256^3)
set -e
cd "$(dirname "$0")/.."
NC=${1:-8}
SCHEME=${2:-tsc}
for yb in 8 16 32; do
  echo "== PYSCO_TPU_YB=$yb  (ncoarse=$NC $SCHEME) =="
  PYSCO_TPU_YB=$yb timeout 1800 python -c "
from bench import bench_components, _setup_compile_cache
_setup_compile_cache()
import json
n = 2 ** $NC
print(json.dumps(bench_components(ncoarse=$NC, npart=n ** 3,
                                  scheme='$SCHEME')))
"
done
echo "pick the fastest sort+deposit+gather total; update the PYSCO_TPU_YB"
echo "default in pysco_tpu/ops/pallas_pm.py if it is not 8."
