"""Multi-chip PM step: particle-sharded SPMD over a JAX device mesh.

The reference is strictly single-node shared-memory (no MPI,
README.md:49); distribution is the genuinely new axis of this framework.
Round-1 decomposition (the grids at target sizes -- 256^3/512^3 float32 --
fit comfortably in each chip's HBM):

- particles are sharded over the ``dp`` mesh axis;
- each device deposits its particle shard into a local grid copy and the
  partial grids are summed with one ``psum`` over ICI;
- the field solve (FFT or multigrid) runs replicated -- identical data,
  identical program, no communication;
- force interpolation and the kick/drift run on the local particle shard.

So the particle work (deposit, gather, KDK: the O(27 N) terms that dominate
at npart >= ncells^3) scales with devices, while the grid solve is
replicated. A slab-sharded spectral solve over ICI is the planned next
step for grid-dominated configurations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import solver as solver_mod
from ..integrate import StepDiagnostics
from ..ops import dense_pm
from ..ops import mesh as mesh_ops
from ..solver import DynScalars, SolverConfig

F32 = jnp.float32


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(devices, axis_names=("dp",))


def _sharded_pm(cfg: SolverConfig, first_call: bool, save_pk: bool,
                position, velocity, potential, u, dyn: DynScalars):
    """Deposit local shard -> psum -> replicated solve -> local gather.

    Each device runs its particle engine on its own shard; only the
    deposited grids are all-reduced over ICI. The pallas engine shards
    natively (each device tile-sorts and transfers its own columns
    against the full grid); dense/scatter shard their row-major state.
    """
    n = cfg.ncells_1d
    norm = F32(n ** 3 / cfg.npart)
    if cfg.particle_engine == "pallas":
        from ..ops import pallas_pm

        interpret = jax.default_backend() == "cpu"
        position, velocity, tstarts = pallas_pm.sort_particles(
            position, velocity, n, cfg.mass_scheme, mode=cfg.sort_mode
        )
        density = pallas_pm.deposit(
            position, tstarts, n, cfg.mass_scheme, interpret,
            precision=solver_mod.sorted_precisions(cfg)[0],
        )
        overflow = jnp.int32(0)
    elif cfg.particle_engine == "dense":
        position, velocity, starts = dense_pm.sort_by_plane(
            position, n, cfg.mass_scheme, velocity
        )
        density, overflow = dense_pm.deposit(position, starts, n,
                                             cfg.mass_scheme)
    else:
        density = mesh_ops.deposit(position, n, cfg.mass_scheme)
        overflow = jnp.int32(0)
    density = jax.lax.psum(density, "dp")
    density = density * norm
    force, potential, u, pk = solver_mod._solve_fields(
        cfg, first_call, save_pk, density, potential, u, dyn
    )
    if cfg.particle_engine == "pallas":
        from ..ops import pallas_pm

        acc = pallas_pm.gather_vec(
            force, position, tstarts, cfg.mass_scheme, interpret,
            precision=solver_mod.sorted_precisions(cfg)[1],
        )
    elif cfg.particle_engine == "dense":
        acc = dense_pm.gather_vec(force, position, starts, cfg.mass_scheme)
    else:
        acc = mesh_ops.gather_vec(force, position, cfg.mass_scheme)
    if not save_pk:
        pk = F32(0)
    return position, velocity, acc, potential, u, pk, overflow


def make_sharded_step(cfg: SolverConfig, mesh: Mesh, integrator: str = "leapfrog",
                      first_call: bool = False, save_pk: bool = False):
    """Build the jitted SPMD step: particles sharded on ``dp``, fields
    replicated. Returns
    ``fn(pos, vel, acc, phi, u, dyn, dt) -> (state', pk, diag)``."""

    dyn_specs = jax.tree.map(lambda _: P(), DynScalars(*[0.0] * 10))
    # pallas column state (4, N_up) shards on the column axis; the
    # dense/scatter row state (N, 3) shards on the row axis
    if cfg.particle_engine == "pallas":
        from ..ops.pallas_pm import Q, padded_cols

        n_dev = mesh.devices.size
        if padded_cols(cfg.npart) % (n_dev * Q):
            raise ValueError(
                f"npart={cfg.npart}: the pallas column state must split "
                f"into Q={Q}-aligned shards on {n_dev} devices; pick "
                "npart a multiple of Q * n_devices or use "
                "particle_engine='dense'"
            )
    pspec = P(None, "dp") if cfg.particle_engine == "pallas" else P("dp")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(pspec, pspec, pspec, P(), P(), dyn_specs, P()),
        out_specs=(
            pspec, pspec, pspec, P(), P(),
            (P(), P(), P()) if save_pk else P(),
            StepDiagnostics(P(), P(), P(), P()),
        ),
        check_vma=False,
    )
    def step_shard(position, velocity, acceleration, potential, u, dyn, dt):
        dt = F32(dt)
        if integrator == "leapfrog":
            half_dt = F32(0.5) * dt
            velocity = velocity - acceleration * half_dt
            position = mesh_ops.periodic_wrap(position + velocity * dt)
            position, velocity, acceleration, potential, u, pk, overflow = (
                _sharded_pm(cfg, first_call, save_pk, position, velocity,
                            potential, u, dyn)
            )
            velocity = velocity - acceleration * half_dt
        elif integrator == "euler":
            position = mesh_ops.periodic_wrap(position + velocity * dt)
            velocity = velocity - acceleration * dt
            position, velocity, acceleration, potential, u, pk, overflow = (
                _sharded_pm(cfg, first_call, save_pk, position, velocity,
                            potential, u, dyn)
            )
        else:
            raise NotImplementedError(integrator)
        diag = StepDiagnostics(
            max_abs_acc=jax.lax.pmax(jnp.max(jnp.abs(acceleration)), "dp"),
            max_abs_vel=jax.lax.pmax(jnp.max(jnp.abs(velocity)), "dp"),
            mean_additional=jax.lax.pmean(jnp.mean(u), "dp"),
            overflow=jax.lax.psum(overflow, "dp"),
        )
        return position, velocity, acceleration, potential, u, pk, diag

    return jax.jit(step_shard)


def shard_state(mesh: Mesh, position, velocity, acceleration, potential, u):
    """Place state on the mesh: particles sharded, fields replicated.

    Column-layout (4, N_up) particle arrays shard along the column axis,
    row-major (N, 3) arrays along the row axis.
    """
    columnar = position.ndim == 2 and position.shape[0] == 4
    shard_p = NamedSharding(mesh, P(None, "dp") if columnar else P("dp"))
    repl = NamedSharding(mesh, P())
    return (
        jax.device_put(position, shard_p),
        jax.device_put(velocity, shard_p),
        jax.device_put(acceleration, shard_p),
        jax.device_put(potential, repl),
        jax.device_put(u, repl),
    )
