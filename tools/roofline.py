"""Roofline sanity for the per-component timings in BENCH_LATEST.json.

For each hot component (tile sort, deposit, solve+gradient, gather) this
computes the achieved effective bandwidth and MXU MAC rate implied by the
measured wall time and compares against TPU v5e peaks, so "actually fast"
is an argument with numbers and the next optimization target is chosen by
data (the component farthest from its binding roof).

Effective-traffic model (explained inline; intentionally simple and
conservative -- it counts algorithmically *required* bytes/MACs, so the
reported fractions are lower bounds on hardware utilisation):

- tile sort: one 7-operand lax.sort over (4, N) position + (3, N)
  velocity rows; a radix/merge sort must move every operand at least
  once per pass -- we count ONE read + ONE write of all 7 rows (pass
  count unknown), so `xN passes` of the reported GB/s is achieved.
- deposit: reads the (4, N) state, issues rows x WZ MACs per particle
  per bf16 pass on the MXU (x3 for bf16x3), RMWs each tile window.
- solve+gradient: FFT Poisson -- 2 x (rfft3 + irfft3-equivalent) grid
  passes + k-space kernel + 12-roll gradient; counted as 8 full f32
  grid reads + writes (a lower bound on the actual pass structure).
- gather: DMAs the (3, M, M) field window per tile once (the whole
  component-leading field, overlapping windows ignored), contracts
  3 x rows x WZ MACs per particle, writes (4, N) accelerations.

Peaks (TPU v5e, single chip): 197e12 bf16 MAC/s (MXU, counting one MAC
as one multiply-accumulate = 2 FLOP -> 394 TFLOP/s), 819e9 B/s HBM.
Usage: python tools/roofline.py [BENCH_LATEST.json]
"""

import json
import os
import sys

PEAK_MAC = 197e12 / 2  # bf16 MAC/s per chip (394 TFLOP/s / 2 FLOP per MAC)
PEAK_BW = 819e9        # HBM bytes/s

YB = 8


def geometry(m, scheme, drift=0):
    w = {"ngp": 1, "cic": 2, "tsc": 3}[scheme]
    wx = w + 2 * drift
    wy = YB + w - 1 + 2 * drift
    # z-blocked tiles at m >= 512 (pallas_pm._zb_size): the window's z
    # extent is the z-block window, not the full grid (model counts the
    # unpadded algorithmic extent, consistent with wy above)
    zbs = 128 if m >= 512 and m % 128 == 0 else m
    wz = (zbs + w - 1 + 2 * drift) if zbs < m else m
    return w, wx, wy, wz


def analyse(label, comp, m, npart, scheme, passes=3):
    """passes: MXU passes per contraction (3 for bf16x3, 1 for bf16)."""
    out = {}
    n = npart
    _, wx, wy, wz = geometry(m, scheme)
    rows = wx * wy
    grid_bytes = 4 * m ** 3

    t = comp.get("tile_sort_ms")
    if t:
        bytes_min = 2 * 7 * 4 * n  # 1 read + 1 write of all 7 sorted rows
        out["tile_sort"] = {
            "ms": t,
            "eff_GBps_per_pass": round(bytes_min / (t * 1e-3) / 1e9, 1),
            "pct_of_HBM_per_pass": round(
                100 * bytes_min / (t * 1e-3) / PEAK_BW, 1
            ),
        }

    t = comp.get("deposit_ms")
    if t:
        macs = passes * rows * wz * n  # window contraction per particle
        bytes_min = 4 * 4 * n + grid_bytes  # state read + grid write
        out["deposit"] = {
            "ms": t,
            "eff_TMACps": round(macs / (t * 1e-3) / 1e12, 2),
            "pct_of_MXU": round(100 * macs / (t * 1e-3) / PEAK_MAC, 1),
            "pct_of_HBM": round(100 * bytes_min / (t * 1e-3) / PEAK_BW, 1),
        }

    t = comp.get("solve_plus_gradient_ms")
    if t:
        bytes_min = 8 * 2 * grid_bytes  # ~8 full-grid read+write passes
        out["solve_gradient"] = {
            "ms": t,
            "eff_GBps": round(bytes_min / (t * 1e-3) / 1e9, 1),
            "pct_of_HBM": round(100 * bytes_min / (t * 1e-3) / PEAK_BW, 1),
        }

    t = comp.get("gather_ms")
    if t:
        macs = passes * 3 * rows * wz * n
        bytes_min = 3 * grid_bytes + 4 * 4 * n * 2  # field + state rd/wr
        out["gather"] = {
            "ms": t,
            "eff_TMACps": round(macs / (t * 1e-3) / 1e12, 2),
            "pct_of_MXU": round(100 * macs / (t * 1e-3) / PEAK_MAC, 1),
            "pct_of_HBM": round(100 * bytes_min / (t * 1e-3) / PEAK_BW, 1),
        }
    return {label: out}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LATEST.json",
    )
    with open(path) as f:
        data = json.load(f)
    report = {}
    comp = data.get("component_ms_256_tsc") or {}
    if "tile_sort_ms" in comp:
        report.update(analyse("256^3 tsc", comp, 256, 256 ** 3, "tsc"))
    comp = data.get("component_ms_512_cic") or {}
    if "tile_sort_ms" in comp:
        report.update(analyse("512^3 cic", comp, 512, 512 ** 3, "cic"))
    if not report:
        print("no component timings in", path)
        return
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
