"""P(k)-error bound for the widened-pass MXU precision modes.

The production default runs the drift-widened (stale-bin) gather at a
single bf16 MXU pass (`pm_precision_widened = "bf16-gather"`): the
widened kernels are MXU-bound and run on ~3 of every 4 steps at the
Courant-0.5 cadence, so this cuts their dominant cost ~3x. The deposit
stays exact (bf16x3), so the measured density/P(k) are untouched; only
the forces on stale-bin steps carry ~2e-3 relative rounding, which
enters the dynamics as incoherent per-step noise.

This test bounds the end-to-end cost over a FULL z=49 -> 0 horizon
against the committed exact-path golden. Measured 2026-08-20 at 32^3
cells / 16^3 particles (all bins, all output redshifts):

  pm_precision_widened = bf16-gather:  1.1 - 1.3e-4  (production)
  pm_precision_widened = bf16:         0.5 - 1.6e-3  (deposit rounded
      too: the measured density itself carries bf16 noise -- why the
      default keeps the deposit exact)

The bounds below sit ~3x above the measured values and well under the
0.1% BASELINE target for the production default.
"""

import os

import numpy as np

from tests.test_full_run_fidelity import Z_OUT, _golden


def _run_widened(tmp_path, widened, parallel_mode=None, extra=None):
    import pysco_tpu
    from pysco_tpu.cosmo import write_power_spectrum_table

    pk_file = tmp_path / "pk.dat"
    if not pk_file.exists():
        write_power_spectrum_table(str(pk_file))
    tag = "_".join(f"{k}-{v}" for k, v in (extra or {}).items())
    base = tmp_path / f"run_{widened}_{parallel_mode or 'single'}_{tag}"
    param = {
        "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
        "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 100,
        "ncoarse": 5, "npart": 16 ** 3, "z_start": 49, "seed": 42,
        "position_ICS": "center", "fixed_ICS": True, "paired_ICS": False,
        "dealiased_ICS": False, "power_spectrum_file": str(pk_file),
        "initial_conditions": "2LPT", "base": str(base),
        "output_snapshot_format": "HDF5", "z_out": Z_OUT,
        "save_power_spectrum": "z_out", "integrator": "leapfrog",
        "mass_scheme": "TSC", "n_reorder": 50, "Courant_factor": 1.0,
        "max_aexp_stepping": 10, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "epsrel": 1e-2, "verbose": 0, "particle_engine": "pallas",
        "lazy_sort": True, "pm_precision_widened": widened,
    }
    if parallel_mode:
        param["parallel_mode"] = parallel_mode
    if extra:
        param.update(extra)
    pysco_tpu.run(param)
    out = {}
    for f in sorted(base.glob("power/pk_*.dat")):
        out[os.path.basename(str(f))] = np.loadtxt(str(f))
    assert len(out) == 3
    return out


def _max_rel_vs_golden(pks):
    gold = _golden()
    worst = 0.0
    for name, a in pks.items():
        g = gold[name]
        worst = max(worst, float(np.max(
            np.abs(a[:, 1] - g[:, 1]) / np.abs(g[:, 1])
        )))
    return worst


def test_production_default_bf16_gather(tmp_path):
    """Production default (bf16-gather widened passes) vs exact golden:
    must stay well under the 0.1% BASELINE target. Measured 1.3e-4."""
    worst = _max_rel_vs_golden(_run_widened(tmp_path, "bf16-gather"))
    assert worst < 5e-4, f"bf16-gather P(k) impact {worst:.2e} >= 5e-4"


def test_production_default_bf16_gather_slab(tmp_path):
    """Same bound for the slab distribution mode (the sharded widened
    kernels share _dot but run the spill/halo variants)."""
    worst = _max_rel_vs_golden(
        _run_widened(tmp_path, "bf16-gather", parallel_mode="slab")
    )
    assert worst < 5e-4, f"slab bf16-gather P(k) impact {worst:.2e}"


def test_sorted_pass_bf16_gather_bound(tmp_path):
    """pm_precision = "bf16-gather": the SORTED-pass gather also runs
    one bf16 MXU pass (every deposit stays bf16x3-exact, so measured
    density/P(k) bins are untouched; every gather now carries ~2e-3
    force rounding, not just the stale-bin ones). Full-horizon P(k)
    impact measured 2026-08-20 (CPU-faithful path): 1.8e-4 -- same
    order as the widened default, because the widened passes already
    dominate the gather count at the production cadence. Bound ~3x
    above measurement."""
    worst = _max_rel_vs_golden(_run_widened(
        tmp_path, "bf16-gather", extra={"pm_precision": "bf16-gather"}
    ))
    assert worst < 5e-4, f"sorted bf16-gather P(k) impact {worst:.2e}"


def test_full_bf16_documented_bound(tmp_path):
    """The opt-in full-bf16 mode (deposit rounded too): documented
    looser bound -- it breaches 0.1% at z=0, which is why it is NOT the
    default. Measured 1.6e-3."""
    worst = _max_rel_vs_golden(_run_widened(tmp_path, "bf16"))
    assert worst < 5e-3, f"bf16 P(k) impact {worst:.2e} >= 5e-3"
