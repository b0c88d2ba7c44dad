"""Gadget snapshot reader round-trip."""

import numpy as np

from pysco_tpu.utils import gadget
from pysco_tpu import ic
from pysco_tpu.utils.config import Params
from pysco_tpu.utils.units import set_units


def test_gadget_roundtrip(tmp_path):
    n = 512
    rng = np.random.default_rng(0)
    pos = (rng.random((n, 3)) * 100.0).astype(np.float32)  # Mpc/h units
    vel = (100.0 * rng.standard_normal((n, 3))).astype(np.float32)
    path = str(tmp_path / "snap_000")
    gadget.write_snapshot(path, pos, vel, boxsize=100.0, redshift=49.0,
                          omega_m=0.3, omega_l=0.7, hubble=0.72)

    header = gadget.read_header(path)
    assert header.npart[1] == n
    assert abs(header.redshift - 49.0) < 1e-12
    assert abs(header.boxsize - 100.0) < 1e-12

    rpos, rvel = gadget.read_particles(path, ptype=1)
    np.testing.assert_array_equal(rpos, pos)
    np.testing.assert_array_equal(rvel, vel)


def test_ic_generate_from_gadget(tmp_path):
    n = 512
    rng = np.random.default_rng(1)
    pos = (rng.random((n, 3)) * 100.0).astype(np.float32)
    vel = (100.0 * rng.standard_normal((n, 3))).astype(np.float32)
    path = str(tmp_path / "snap_001")
    gadget.write_snapshot(path, pos, vel, boxsize=100.0, redshift=49.0,
                          omega_m=0.3, omega_l=0.7, hubble=0.72)

    param = Params(
        initial_conditions=path, npart=n, Om_m=0.3, Om_lambda=0.7, H0=72.0,
        boxlen=100.0, aexp=0.02, base=str(tmp_path),
        output_snapshot_format="HDF5", extra="test",
    )
    set_units(param)
    (tmp_path / "output_00000").mkdir(exist_ok=True)
    rpos, rvel = ic.generate(param, tables=None)
    assert rpos.shape == (n, 3)
    assert (rpos >= 0).all() and (rpos < 1).all()
    assert abs(param["aexp"] - 1.0 / 50.0) < 1e-12
