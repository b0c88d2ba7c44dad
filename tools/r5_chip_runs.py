"""Round-5 on-chip measurement sequence (one JAX client at a time).

Runs each measurement in a FRESH subprocess (full-HBM reset, warm
persistent compile cache), strictly sequentially -- the axon backend
serialises compiles server-side and does not reap orphans, so two
concurrent compile-heavy clients wedge each other (BENCH_NOTES.md).

Appends one JSON line per task to tools/r5_chip_results.jsonl so a
timeout costs only the tasks not yet run.

Usage: python tools/r5_chip_runs.py [group]
  group: d1 | ab | all (default all)
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tools", "r5_chip_results.jsonl")

D1_TASKS = [
    ("newton_cic_fft_256_slab1",
     "bench.bench_dist_d1('slab', 8, 256 ** 3, 'cic', 'newton', 'fft', "
     "iters=8, warmup=3)", 1500),
    ("newton_cic_fft_256_repl1",
     "bench.bench_dist_d1('replicated', 8, 256 ** 3, 'cic', 'newton', "
     "'fft', iters=8, warmup=3)", 1500),
    ("newton_cic_fft_512_slab1",
     "bench.bench_dist_d1('slab', 9, 512 ** 3, 'cic', 'newton', 'fft', "
     "iters=4, warmup=2)", 1800),
    ("fr_n1_cic_multigrid_512_slab1",
     "bench.bench_dist_d1('slab', 9, 512 ** 3, 'cic', 'fr', 'multigrid', "
     "iters=3, warmup=2)", 2400),
]

AB_TASKS = [
    # sorted-pass bf16 gather A/B at the north-star size (eager = every
    # step sorted: isolates the sorted-gather change; the c05 cadence
    # shows the production-mix effect)
    ("newton_cic_fft_512_sortedbf16g_eager",
     "bench.bench_config(9, 512 ** 3, 'cic', 'newton', 'fft', iters=4, "
     "warmup=2, extra_param={'pm_precision': 'bf16-gather'})", 1500),
    ("newton_cic_fft_512_sortedbf16g_lazy",
     "bench._lazy_rows('x', scheme='cic', iters_outer=2, ncoarse=9, "
     "npart=512 ** 3, extra_param={'pm_precision': 'bf16-gather'})", 1800),
    ("newton_cic_fft_256_sortedbf16g_eager",
     "bench.bench_config(8, 256 ** 3, 'cic', 'newton', 'fft', iters=10, "
     "warmup=3, extra_param={'pm_precision': 'bf16-gather'})", 1200),
]


def run_task(label, expr, timeout_s):
    code = (
        "import json, bench\n"
        "bench._setup_compile_cache()\n"
        f"print('@@R@@' + json.dumps({expr}), flush=True)\n"
    )
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                           timeout=timeout_s, capture_output=True, text=True)
        val = None
        for line in reversed(r.stdout.splitlines()):
            if line.startswith("@@R@@"):
                val = json.loads(line[5:])
                break
        if val is None:
            tail = (r.stderr or "").strip().splitlines()[-3:]
            val = f"failed rc={r.returncode}: {' | '.join(tail)[:200]}"
    except subprocess.TimeoutExpired:
        val = f"timeout {timeout_s}s"
    rec = {"task": label, "result": val,
           "wall_s": round(time.perf_counter() - t0, 1),
           "ts": time.strftime("%Y-%m-%d %H:%M:%S")}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    group = sys.argv[1] if len(sys.argv) > 1 else "all"
    tasks = {"d1": D1_TASKS, "ab": AB_TASKS,
             "all": D1_TASKS + AB_TASKS}[group]
    for label, expr, timeout_s in tasks:
        run_task(label, expr, timeout_s)


if __name__ == "__main__":
    main()
