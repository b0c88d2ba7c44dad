#!/bin/bash
# On-chip sweep of the particle chunk quantum (PYSCO_TPU_CHUNK).
#
# The pallas tile loop pays a fixed per-chunk overhead (two DMA round
# trips + one MXU dispatch); if deposit/gather are latency-bound, a
# larger chunk is a direct win. Q is bound at pysco_tpu import, so each
# value needs its own process. Run only when the TPU tunnel is alive
# (probe first -- device discovery hangs when it is down).
#
# Usage: tools/sweep_chunk.sh [ncoarse] [scheme]   (default 8 tsc = 256^3)
set -e
cd "$(dirname "$0")/.."
NC=${1:-8}
SCHEME=${2:-tsc}
for q in 512 1024 2048; do
  echo "== PYSCO_TPU_CHUNK=$q  (ncoarse=$NC $SCHEME) =="
  PYSCO_TPU_CHUNK=$q timeout 1800 python -c "
from bench import bench_components, _setup_compile_cache
_setup_compile_cache()
import json
n = 2 ** $NC
print(json.dumps(bench_components(ncoarse=$NC, npart=n ** 3,
                                  scheme='$SCHEME')))
"
done
echo "pick the fastest deposit+gather total; update the PYSCO_TPU_CHUNK"
echo "default in pysco_tpu/ops/pallas_pm.py if it is not 512."
