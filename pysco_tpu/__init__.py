"""pysco-tpu: a TPU-native particle-mesh cosmological N-body framework.

Built from scratch on JAX/XLA/Pallas with the same capabilities as PySCo
(reference: /root/reference, mianbreton/pysco v1.0.9): Newtonian, f(R)
Hu-Sawicki (n=1,2), QUMOND and parametrized-mu gravity; CIC/TSC mass
assignment; FFT and geometric multigrid (linear + FAS) Poisson solvers;
1/2/3LPT initial conditions; adaptive leapfrog integration; and
PySCo-compatible inputs/outputs (param.ini configs, ASCII power spectra,
HDF5/Parquet snapshots, background evolution table).

Design (TPU-first, not a port):
- Each timestep compiles to a single XLA program (kick-drift-kick plus the
  full PM force solve); the host only performs dt table lookups, logging and
  snapshot I/O (one scalar device->host transfer per step).
- State is a JAX pytree (particles, fields, scalars), not a mutable
  parameter blackboard.
- Mass deposition is an XLA scatter-add over flattened cell indices
  (deterministic, atomic-free); interpolation is a gather. Stencil
  operators are roll-based (halo-exchange under shard_map when sharded).
- Red-black Gauss-Seidel smoothing is two masked checkerboard half-updates.
- All spectral kernels (inverse Laplacian, Jing compensation, discrete
  7-point kernel, gradients, Hessians) are fused elementwise k-space ops
  around jnp.fft rffts.

float64 is enabled globally because background cosmology tables and the
f(R) scalaron root solves require it (reference uses float64 there too:
cubic.py:162-207, quartic.py:157-204, cosmotable.py). All device-resident
simulation fields are explicitly float32.
"""

import jax

jax.config.update("jax_enable_x64", True)

from .main import run, run_paired  # noqa: E402,F401
from .utils.config import read_param_file  # noqa: E402,F401

__version__ = "0.1.0"
