import time, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pysco_tpu
from pysco_tpu.cosmo import write_power_spectrum_table

t0 = time.perf_counter()
base = "/tmp/prod512_run"
os.makedirs(base, exist_ok=True)
pk = f"{base}/pk.dat"
write_power_spectrum_table(pk)
param = {
    "theory": "newton", "H0": 72, "Om_m": 0.25733, "T_cmb": 2.726,
    "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 400,
    "ncoarse": 9, "npart": 512 ** 3, "z_start": 49, "seed": 42,
    "position_ICS": "center", "fixed_ICS": False, "paired_ICS": False,
    "dealiased_ICS": False, "power_spectrum_file": pk,
    "initial_conditions": "2LPT", "base": base,
    "output_snapshot_format": "parquet", "z_out": "[0]",
    "save_power_spectrum": "z_out", "integrator": "leapfrog",
    "mass_scheme": "CIC", "n_reorder": 50, "Courant_factor": 0.5,
    "max_aexp_stepping": 10, "linear_newton_solver": "fft",
    "gradient_stencil_order": 5, "Npre": 2, "Npost": 1, "epsrel": 1e-2,
    "verbose": 1, "particle_engine": "pallas",
    "write_initial_snapshot": False,
}
pysco_tpu.run(param)
print(f"PROD512-OK total {time.perf_counter() - t0:.0f} s", flush=True)
