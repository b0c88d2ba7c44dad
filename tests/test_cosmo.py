"""Background cosmology and growth-table tests."""

import numpy as np
import pytest

from pysco_tpu import cosmo
from pysco_tpu.utils.config import Params


def _param(tmp_path, theory="newton", **kw):
    p = Params(
        theory=theory, H0=72.0, Om_m=0.25733, T_cmb=2.726, N_eff=3.044,
        w0=-1.0, wa=0.0, base=str(tmp_path), extra="test", parametrized_mu0=0.0,
    )
    p.update(kw)
    return p


def test_density_closure():
    c = cosmo.FlatW0WaCDM(H0=72.0, Om0=0.3)
    assert c.Ogamma0 > 0 and c.Onu0 > 0
    np.testing.assert_allclose(c.Om0 + c.Ogamma0 + c.Onu0 + c.Ode0, 1.0)
    np.testing.assert_allclose(c.efunc(0.0), 1.0, rtol=1e-12)
    # radiation density for T=2.726K, h=0.72: Omega_gamma ~ 4.8e-5
    np.testing.assert_allclose(c.Ogamma0, 4.78e-5, rtol=0.02)
    np.testing.assert_allclose(c.Onu0 / c.Ogamma0, 3.044 * 0.875 * (4 / 11) ** (4 / 3), rtol=1e-10)


def test_efunc_matter_era():
    c = cosmo.FlatW0WaCDM(H0=70.0, Om0=0.3)
    z = 10.0
    expected = np.sqrt(
        0.3 * 11 ** 3 + (c.Ogamma0 + c.Onu0) * 11 ** 4 + c.Ode0
    )
    np.testing.assert_allclose(c.efunc(z), expected, rtol=1e-12)


def test_tables_roundtrip_and_growth(tmp_path):
    param = _param(tmp_path)
    tables = cosmo.generate(param)
    assert len(tables) == 13
    # a(t(a)) == a
    for a in (0.02, 0.1, 0.5, 1.0):
        lna = np.log(a)
        t = tables[1](lna)
        np.testing.assert_allclose(float(tables[0](t)), lna, atol=1e-6)
    # H(a=1) == H0
    np.testing.assert_allclose(float(tables[2](0.0)), 72.0, rtol=1e-4)
    # D1 grows with a; matter-era D1 ~ a
    d1_early = float(tables[3](np.log(0.01)))
    d1_late = float(tables[3](0.0))
    assert d1_late > d1_early > 0
    ratio = float(tables[3](np.log(0.02))) / float(tables[3](np.log(0.01)))
    np.testing.assert_allclose(ratio, 2.0, rtol=0.05)
    # growth rate f1 ~ Om(z)^0.55 at z=0
    c = cosmo.FlatW0WaCDM(H0=72.0, Om0=0.25733)
    f1 = float(tables[4](0.0))
    np.testing.assert_allclose(f1, c.Om(0.0) ** 0.55, rtol=0.02)
    # 2LPT: D2 ~ -3/7 D1^2 in matter era
    lna = np.log(0.01)
    d1 = float(tables[3](lna))
    d2 = float(tables[5](lna))
    np.testing.assert_allclose(d2, -3.0 / 7.0 * d1 ** 2, rtol=0.05)
    # evolution table file written
    assert (tmp_path / "evolution_table_pysco.txt").exists()


def test_parametrized_growth_differs(tmp_path):
    p_gr = _param(tmp_path)
    t_gr = cosmo.generate(p_gr)
    p_mu = _param(tmp_path, theory="parametrized", parametrized_mu0=0.5)
    t_mu = cosmo.generate(p_mu)
    d1_gr = float(t_gr[3](0.0))
    d1_mu = float(t_mu[3](0.0))
    assert d1_mu > d1_gr * 1.01  # mu0 > 0 boosts growth
