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


def _sharded_pm(cfg: SolverConfig, first_call: bool, position, velocity,
                potential, u, dyn: DynScalars):
    """Deposit local shard -> psum -> replicated solve -> local gather.

    Each device runs the dense sorted-plane transfer on its own particle
    shard; only the deposited grids are all-reduced over ICI.
    """
    n = cfg.ncells_1d
    norm = F32(n ** 3 / cfg.npart)
    # the padded pallas engine is single-device for now; shards use dense
    if cfg.particle_engine in ("dense", "pallas"):
        position, velocity, starts = dense_pm.sort_by_plane(
            position, n, cfg.mass_scheme, velocity
        )
        density, overflow = dense_pm.deposit(position, starts, n,
                                             cfg.mass_scheme)
    else:
        density = mesh_ops.deposit(position, n, cfg.mass_scheme)
        overflow = jnp.int32(0)
    density = jax.lax.psum(density, "dp")
    if n ** 3 != cfg.npart:
        density = density * norm
    force, potential, u, _ = solver_mod._solve_fields(
        cfg, first_call, False, density, potential, u, dyn
    )
    if cfg.particle_engine in ("dense", "pallas"):
        acc = dense_pm.gather_vec(force, position, starts, cfg.mass_scheme)
    else:
        acc = mesh_ops.gather_vec(force, position, cfg.mass_scheme)
    return position, velocity, acc, potential, u, overflow


def make_sharded_step(cfg: SolverConfig, mesh: Mesh, integrator: str = "leapfrog",
                      first_call: bool = False):
    """Build the jitted SPMD step: particles sharded on ``dp``, fields
    replicated. Returns ``fn(pos, vel, acc, phi, u, dyn, dt) -> state'``."""

    dyn_specs = jax.tree.map(lambda _: P(), DynScalars(*[0.0] * 10))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P(), P(), dyn_specs, P()),
        out_specs=(
            P("dp"), P("dp"), P("dp"), P(), P(),
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
            position, velocity, acceleration, potential, u, overflow = (
                _sharded_pm(cfg, first_call, position, velocity, potential,
                            u, dyn)
            )
            velocity = velocity - acceleration * half_dt
        elif integrator == "euler":
            position = mesh_ops.periodic_wrap(position + velocity * dt)
            velocity = velocity - acceleration * dt
            position, velocity, acceleration, potential, u, overflow = (
                _sharded_pm(cfg, first_call, position, velocity, potential,
                            u, dyn)
            )
        else:
            raise NotImplementedError(integrator)
        diag = StepDiagnostics(
            max_abs_acc=jax.lax.pmax(jnp.max(jnp.abs(acceleration)), "dp"),
            max_abs_vel=jax.lax.pmax(jnp.max(jnp.abs(velocity)), "dp"),
            mean_additional=jax.lax.pmean(jnp.mean(u), "dp"),
            overflow=jax.lax.psum(overflow, "dp"),
        )
        return position, velocity, acceleration, potential, u, diag

    return jax.jit(step_shard)


def shard_state(mesh: Mesh, position, velocity, acceleration, potential, u):
    """Place state on the mesh: particles sharded, fields replicated."""
    shard_p = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return (
        jax.device_put(position, shard_p),
        jax.device_put(velocity, shard_p),
        jax.device_put(acceleration, shard_p),
        jax.device_put(potential, repl),
        jax.device_put(u, repl),
    )
