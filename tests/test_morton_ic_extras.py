"""Morton round-trips, force-space IC noise, and profiling utilities."""

import logging

import numpy as np
import jax.numpy as jnp

from pysco_tpu.ops import morton
from pysco_tpu import ic
from pysco_tpu.utils import profiling


def test_morton_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    ijk = rng.integers(0, 2 ** 21, (1000, 3)).astype(np.uint32)
    keys = morton.encode(
        jnp.asarray(ijk[:, 0]), jnp.asarray(ijk[:, 1]), jnp.asarray(ijk[:, 2])
    )
    i, j, k = morton.decode(keys)
    np.testing.assert_array_equal(np.array(i), ijk[:, 0])
    np.testing.assert_array_equal(np.array(j), ijk[:, 1])
    np.testing.assert_array_equal(np.array(k), ijk[:, 2])


def test_morton_positions_roundtrip():
    rng = np.random.default_rng(1)
    pos = rng.random((500, 3), dtype=np.float32)
    keys = morton.positions_to_keys(jnp.asarray(pos))
    back = np.array(morton.keys_to_positions(keys))
    np.testing.assert_allclose(back, pos, atol=2 ** -21)


def test_morton_increment_decrement():
    ijk = np.array([[5, 10, 2 ** 21 - 1]], dtype=np.uint32)
    keys = morton.encode(*(jnp.asarray(ijk[:, a]) for a in range(3)))
    up = morton.increment(keys, 0)
    i, j, k = morton.decode(up)
    assert int(i[0]) == 6 and int(j[0]) == 10
    down = morton.decrement(up, 0)
    assert int(morton.decode(down)[0][0]) == 5
    # wraparound along z
    wrapped = morton.increment(keys, 2)
    assert int(morton.decode(wrapped)[2][0]) == 0


def test_generate_force_consistent_with_density(tmp_path):
    """The force-space noise path must reproduce grad(inv_lap(delta)) of
    the density-space path for the same seed (identical phases)."""
    n = 16
    k = np.logspace(-3, 2, 100)
    pk = 1e4 * np.exp(-((np.log(k / 0.05)) ** 2))
    np.savetxt(tmp_path / "pk.dat", np.c_[k, pk])
    param = {
        "npart": n ** 3, "seed": 7, "boxlen": 100.0,
        "fixed_ICS": True, "paired_ICS": False,
        "power_spectrum_file": str(tmp_path / "pk.dat"),
    }
    force = ic.generate_force(param)
    assert force.shape == (n, n, n, 3)
    assert np.isfinite(force).all()

    density_k = ic.generate_density_fourier(param)
    phi_k = ic._inverse_laplacian(density_k)
    psi = ic._irfft_vec(ic._gradient(phi_k))
    # same phases up to the differing corner conventions: compare in bulk
    corr = np.corrcoef(force[..., 0].ravel(), psi[..., 0].ravel())[0, 1]
    assert corr > 0.99


def test_time_me_and_profile_me(caplog, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    @profiling.time_me
    def f(x):
        return x * 2

    with caplog.at_level(logging.INFO):
        assert f(21) == 42
    assert any("took" in r.message for r in caplog.records)

    @profiling.profile_me
    def g(x):
        return x + 1

    assert g(1) == 2
    assert (tmp_path / "g.prof").exists()
