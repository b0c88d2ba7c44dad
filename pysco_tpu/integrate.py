"""Time integration: leapfrog (KDK) and Euler steps as single XLA programs.

One :func:`step` call = kick + drift + periodic wrap + full PM solve + kick,
compiled once per (config, integrator, flags) combination
(reference: integration.py:121-264). The adaptive timestep is chosen on the
host from the previous step's device-side reductions (max |acc|, max |vel|)
and the background tables -- the three criteria of integration.py:267-358.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import solver as solver_mod
from .ops import mesh
from .solver import DynScalars, SolverConfig

F32 = jnp.float32


class StepDiagnostics(NamedTuple):
    max_abs_acc: jax.Array
    max_abs_vel: jax.Array
    mean_additional: jax.Array
    overflow: jax.Array


def _diagnostics(acc, vel, u, overflow) -> StepDiagnostics:
    return StepDiagnostics(
        max_abs_acc=jnp.max(jnp.abs(acc)),
        max_abs_vel=jnp.max(jnp.abs(vel)),
        mean_additional=jnp.mean(u),
        overflow=overflow,
    )


def step_impl(cfg: SolverConfig, integrator: str, first_call: bool,
              save_pk: bool, position, velocity, acceleration, potential, u,
              dyn: DynScalars, dt):
    """One full integration step; returns the new state + diagnostics.

    Layout-agnostic: the kick/drift/wrap are elementwise, so the pallas
    engine's (3, N_up) column state and the other engines' (npart, 3) rows
    flow through identically (``periodic_wrap`` preserves the column
    state's sentinel tail).
    """
    dt = F32(dt)
    if integrator == "leapfrog":
        half_dt = F32(0.5) * dt
        velocity = velocity - acceleration * half_dt
        position = mesh.periodic_wrap(position + velocity * dt)
        (position, velocity, acceleration, potential, u, pk,
         overflow) = solver_mod._pm_impl(
            cfg, first_call, save_pk, position, velocity, potential, u, dyn
        )
        velocity = velocity - acceleration * half_dt
    elif integrator == "euler":
        position = mesh.periodic_wrap(position + velocity * dt)
        velocity = velocity - acceleration * dt
        (position, velocity, acceleration, potential, u, pk,
         overflow) = solver_mod._pm_impl(
            cfg, first_call, save_pk, position, velocity, potential, u, dyn
        )
    else:
        raise NotImplementedError(
            f"integrator {integrator!r}, must be 'leapfrog' or 'euler'"
        )
    diag = _diagnostics(acceleration, velocity, u, overflow)
    return position, velocity, acceleration, potential, u, pk, diag


def step_lazy_impl(cfg: SolverConfig, integrator: str, presorted: int,
                   save_pk: bool, position, velocity, acceleration,
                   potential, u, tstarts, dyn: DynScalars, dt):
    """KDK/Euler step on the pallas engine with CFL-bounded lazy
    re-binning (solver._pm_lazy_impl): ``presorted = k >= 1`` skips the
    tile sort and uses k-cell drift-widened kernels; the caller guards
    it with the accumulated host-side drift bound and picks the smallest
    sufficient k (<= cfg.lazy_drift). ``tstarts`` rides in the state.
    """
    dt = F32(dt)
    if integrator == "leapfrog":
        half_dt = F32(0.5) * dt
        velocity = velocity - acceleration * half_dt
        position = mesh.periodic_wrap(position + velocity * dt)
        (position, velocity, tstarts, acceleration, potential, u, pk,
         overflow) = solver_mod._pm_lazy_impl(
            cfg, presorted, save_pk, position, velocity, tstarts,
            potential, u, dyn,
        )
        velocity = velocity - acceleration * half_dt
    elif integrator == "euler":
        position = mesh.periodic_wrap(position + velocity * dt)
        velocity = velocity - acceleration * dt
        (position, velocity, tstarts, acceleration, potential, u, pk,
         overflow) = solver_mod._pm_lazy_impl(
            cfg, presorted, save_pk, position, velocity, tstarts,
            potential, u, dyn,
        )
    else:
        raise NotImplementedError(integrator)
    diag = _diagnostics(acceleration, velocity, u, overflow)
    return (position, velocity, acceleration, potential, u, tstarts, pk,
            diag)


step = partial(jax.jit, static_argnums=(0, 1, 2, 3))(step_impl)

# Lazy-binning production variant (pallas engine): donates the state.
# Positional args: 4=position 5=velocity 6=acceleration 7=potential 8=u
# 9=tstarts.
step_lazy = partial(
    jax.jit, static_argnums=(0, 1, 2, 3),
    donate_argnums=(4, 5, 6, 7, 8, 9),
)(step_lazy_impl)

# Production variant: donates the particle/field state so XLA reuses the
# old buffers in place (the run loop never touches pre-step state again).
# Positional args: 4=position 5=velocity 6=acceleration 7=potential 8=u.
step_donated = partial(
    jax.jit, static_argnums=(0, 1, 2, 3),
    donate_argnums=(4, 5, 6, 7, 8),
)(step_impl)


def compute_dt(param, tables, max_abs_acc: float, max_abs_vel: float):
    """Host-side adaptive dt: min of the acceleration CFL, velocity CFL and
    max-scale-factor-variation criteria (integration.py:79-82, 267-358)."""
    dx = 0.5 ** int(param["ncoarse"])
    courant = float(param["Courant_factor"])
    dt1 = courant * np.sqrt(dx / max_abs_acc) if max_abs_acc > 0 else np.inf
    dt2 = courant * dx / max_abs_vel if max_abs_vel > 0 else np.inf
    aexp_factor = 1.0 + 0.01 * float(param["max_aexp_stepping"])
    aexp = float(param["aexp"])
    dt3 = float(
        tables[1](np.log(aexp_factor * aexp)) - tables[1](np.log(aexp))
    )
    return min(dt1, dt2, dt3), (dt1, dt2, dt3)
