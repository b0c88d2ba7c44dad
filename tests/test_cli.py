"""The L7 CLI surface: `python -m pysco_tpu.main -c param.ini` end to end
(reference main.py argparse contract: -c/--config_file). Exercises
read_param_file's ini dialect (comments, `8**3`, booleans, paths) through
the real entry point rather than a dict."""

import sys

import numpy as np

from pysco_tpu import main as main_mod
from pysco_tpu.cosmo import write_power_spectrum_table


INI = """\
# tiny smoke config (CLI dialect test)
nthreads = 1
theory = newton
H0 = 72
Om_m = 0.25733
T_cmb = 2.726
N_eff = 3.044
w0 = -1.0
wa = 0.0
boxlen = 50
ncoarse = 4
npart = 8**3
z_start = 49
seed = 7
position_ICS = center
fixed_ICS = False
paired_ICS = False
dealiased_ICS = False
power_spectrum_file = {pk}
initial_conditions = 2LPT
base = {base}
output_snapshot_format = HDF5
z_out = [40]
save_power_spectrum = yes
integrator = leapfrog
mass_scheme = CIC
particle_engine = scatter
n_reorder = 50
Courant_factor = 1.0
max_aexp_stepping = 25
linear_newton_solver = fft
gradient_stencil_order = 5
Npre = 2
Npost = 1
epsrel = 1e-2
verbose = 1
"""


def test_cli_main_runs_ini(tmp_path, monkeypatch, capsys):
    pk = tmp_path / "pk.dat"
    write_power_spectrum_table(str(pk))
    ini = tmp_path / "param.ini"
    ini.write_text(INI.format(pk=pk, base=tmp_path / "run"))

    monkeypatch.setattr(sys, "argv", ["pysco_tpu", "-c", str(ini)])
    main_mod.main()

    out = capsys.readouterr().out
    assert "Simulation run time" in out

    snaps = sorted((tmp_path / "run").glob("output_*/particles_*.h5"))
    assert snaps, "CLI run wrote no snapshot"
    pks = sorted((tmp_path / "run").glob("power/pk_*.dat"))
    assert pks, "CLI run wrote no power spectrum"
    dat = np.loadtxt(pks[-1])
    assert dat.shape[1] == 3 and np.isfinite(dat).all()
