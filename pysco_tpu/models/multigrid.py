"""Geometric multigrid: linear V/F/W cycles and Full Approximation Scheme.

Functional, jit-traceable rebuild of the reference driver
(``multigrid.py``). The recursion over grid levels is static (depth
``ncoarse - 3``, coarsest handled grid 4^3, multigrid.py:510-513) and is
unrolled at trace time; the outer "iterate until the residual norm drops
below epsrel * truncation_error" loop is a ``lax.while_loop`` with
device-side norms, so a whole solve is one XLA program.

FAS details match the reference: tau-correction ``res_c = 4 * res_c +
L(R(x))`` with the x4 residual normalisation for Laplacian-type operators
(multigrid.py:192-228, 557-566), convergence break when the error is below
tolerance or the per-cycle improvement ratio falls under 2
(multigrid.py:76-82, 131-137).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import mesh
from . import cubic as cubic_mod
from . import laplacian as lap
from . import quartic as quartic_mod

F32 = jnp.float32

MAX_CYCLES = 30  # safety cap for the while_loop; the reference has none

# When True, _converge emits a per-cycle "residual error vs tolerance"
# line from inside the compiled while_loop via jax.debug.print (the
# reference logs this at INFO, multigrid.py:79,134). Off by default: the
# callback adds a host round-trip per cycle.
LOG_RESIDUALS = False


def _backend_supports_callbacks() -> bool:
    """The axon (tunnelled TPU) PJRT client cannot run host callbacks, so
    jax.debug.print would abort the whole program there."""
    try:
        from jax._src import xla_bridge

        version = getattr(xla_bridge.get_backend(), "platform_version", "")
        return "axon" not in version
    except Exception:
        return True


def set_residual_logging(enabled: bool) -> None:
    """Toggle per-cycle residual logging (takes effect on the next trace)."""
    global LOG_RESIDUALS
    if enabled and not _backend_supports_callbacks():
        import logging

        logging.warning(
            "multigrid residual logging unavailable: this backend does not "
            "support host callbacks (jax.debug.print)"
        )
        enabled = False
    LOG_RESIDUALS = bool(enabled)


@dataclass(frozen=True)
class FASOps:
    """Theory-specific operator set used by FAS cycles.

    smoothing(x, b, n, rhs) -> x ; operator(x, b) -> array ;
    restrict_residual(x, b, rhs) -> coarse array ;
    residual_error(x, b) -> scalar ; truncation_error(x, b) -> scalar.
    """

    smoothing: Callable
    operator: Callable
    restrict_residual: Callable
    residual_error: Callable
    truncation_error: Callable
    #: (x, b, rhs) -> (restrict_residual(x, b, rhs), R(x), R(b)) -- the
    #: FAS cycles consume all three, so the implementations fuse them
    #: into ONE fine-lattice pass (ops/pallas_stencil.restrict3) instead
    #: of three separate full-grid reads.
    restrict_all: Callable


def _restrict_all_fused(kind: str, restrict_residual, x, b, rhs, q=None):
    """Shared restrict_all implementation: the fused Pallas pass when the
    full-lattice gate allows, else the three XLA calls."""
    from ..ops import pallas_stencil as ps

    if ps.use_pallas_full(x.shape[0]):
        res_c, x_c, b_c = ps.restrict3(kind, x, b, rhs=rhs, q=q)
        if rhs is None:
            res_c = -res_c
        return res_c, x_c, b_c
    return (restrict_residual(x, b, rhs), mesh.restriction(x),
            mesh.restriction(b))


def fas_ops_laplacian() -> FASOps:
    def smoothing(x, b, n, rhs=None):
        if rhs is None:
            return lap.smoothing(x, b, n)
        return lap.smoothing_with_rhs(x, b, n, rhs)

    def restrict_residual(x, b, rhs=None):
        if rhs is None:
            return mesh.minus_restriction(lap.operator_reformulated(x, b))
        return mesh.restriction(rhs - lap.operator_reformulated(x, b))

    return FASOps(
        smoothing=smoothing,
        operator=lap.operator_reformulated,
        restrict_residual=restrict_residual,
        residual_error=lap.residual_error_reformulated,
        truncation_error=lap.truncation_error_reformulated,
        restrict_all=lambda x, b, rhs=None: _restrict_all_fused(
            "reformulated", restrict_residual, x, b, rhs),
    )


def fas_ops_cubic(q, exact_root: bool = False) -> FASOps:
    def smoothing(x, b, n, rhs=None):
        return cubic_mod.smoothing(x, b, q, n, rhs, exact_root=exact_root)

    def operator(x, b):
        return cubic_mod.operator(x, b, q)

    def restrict_residual(x, b, rhs=None):
        if rhs is None:
            return cubic_mod.restrict_residual(x, b, q)
        return cubic_mod.restrict_residual_with_rhs(x, b, q, rhs)

    return FASOps(
        smoothing=smoothing,
        operator=operator,
        restrict_residual=restrict_residual,
        residual_error=lambda x, b: cubic_mod.residual_error(x, b, q),
        truncation_error=lambda x, b: cubic_mod.truncation_error(x, b, q),
        restrict_all=lambda x, b, rhs=None: _restrict_all_fused(
            "cubic", restrict_residual, x, b, rhs, q=q),
    )


def fas_ops_quartic(q, exact_root: bool = False) -> FASOps:
    def smoothing(x, b, n, rhs=None):
        return quartic_mod.smoothing(x, b, q, n, rhs, exact_root=exact_root)

    def operator(x, b):
        return quartic_mod.operator(x, b, q)

    def restrict_residual(x, b, rhs=None):
        if rhs is None:
            return quartic_mod.restrict_residual(x, b, q)
        return quartic_mod.restrict_residual_with_rhs(x, b, q, rhs)

    return FASOps(
        smoothing=smoothing,
        operator=operator,
        restrict_residual=restrict_residual,
        residual_error=lambda x, b: quartic_mod.residual_error(x, b, q),
        truncation_error=lambda x, b: quartic_mod.truncation_error(x, b, q),
        restrict_all=lambda x, b, rhs=None: _restrict_all_fused(
            "quartic", restrict_residual, x, b, rhs, q=q),
    )


# ---------------------------------------------------------------------------
# Linear cycles
# ---------------------------------------------------------------------------

def _coarsest(level: int, ncoarse: int) -> bool:
    return level >= ncoarse - 3


def V_cycle(x, b, ncoarse: int, Npre: int, Npost: int, level: int = 0):
    x = lap.smoothing(x, b, Npre)
    res_c = lap.restrict_residual(x, b)
    x_c = lap.initialise_potential(res_c)
    if _coarsest(level, ncoarse):
        x_c = lap.smoothing(x_c, res_c, Npre)
    else:
        x_c = V_cycle(x_c, res_c, ncoarse, Npre, Npost, level + 1)
    x = mesh.add_prolongation(x, x_c)
    return lap.smoothing(x, b, Npost)


def F_cycle(x, b, ncoarse: int, Npre: int, Npost: int, level: int = 0):
    x = lap.smoothing(x, b, Npre)
    res_c = lap.restrict_residual(x, b)
    x_c = lap.initialise_potential(res_c)
    if _coarsest(level, ncoarse):
        x_c = lap.smoothing(x_c, res_c, Npre)
    else:
        x_c = F_cycle(x_c, res_c, ncoarse, Npre, Npost, level + 1)
    x = mesh.add_prolongation(x, x_c)
    x = lap.smoothing(x, b, Npre)

    res_c = lap.restrict_residual(x, b)
    x_c = lap.initialise_potential(res_c)
    if _coarsest(level, ncoarse):
        x_c = lap.smoothing(x_c, res_c, Npre)
    else:
        x_c = V_cycle(x_c, res_c, ncoarse, Npre, Npost, level + 1)
    x = mesh.add_prolongation(x, x_c)
    return lap.smoothing(x, b, Npost)


def W_cycle(x, b, ncoarse: int, Npre: int, Npost: int, level: int = 0):
    for last in (False, True):
        x = lap.smoothing(x, b, Npre)
        res_c = lap.restrict_residual(x, b)
        x_c = lap.initialise_potential(res_c)
        if _coarsest(level, ncoarse):
            x_c = lap.smoothing(x_c, res_c, Npre)
        else:
            x_c = W_cycle(x_c, res_c, ncoarse, Npre, Npost, level + 1)
        x = mesh.add_prolongation(x, x_c)
        if last:
            x = lap.smoothing(x, b, Npost)
    return x


def _converge(x, b, cycle_fn, error_fn, tolerance):
    """Iterate `cycle_fn` until error < tolerance or improvement ratio < 2."""
    tolerance = jnp.asarray(tolerance, F32)

    def cond(carry):
        _, _, it, done = carry
        return (~done) & (it < MAX_CYCLES)

    def body(carry):
        x, prev, it, _ = carry
        x = cycle_fn(x, b)
        err = error_fn(x, b)
        if LOG_RESIDUALS:
            jax.debug.print(
                "multigrid: cycle {it} residual error {err:.3e} "
                "(tolerance {tol:.3e})",
                it=it + 1, err=err, tol=tolerance,
            )
        # stop when below tolerance or the per-cycle improvement ratio
        # drops under 2 (division-free so err == 0 terminates cleanly)
        done = (err <= tolerance) | (err * F32(2) > prev)
        return (x, err, it + 1, done)

    x, err, _, _ = lax.while_loop(
        cond, body, (x, F32(1e30), jnp.int32(0), jnp.bool_(False))
    )
    return x


def linear(
    x, b, ncoarse: int, Npre: int, Npost: int, tolerance, cycle: str = "V"
):
    """Linear multigrid solve of Laplacian(x) = b to the given tolerance.

    ``tolerance`` is typically epsrel * truncation_error(x) computed by the
    caller (multigrid.py:62-68).
    """
    cyc = {"V": V_cycle, "F": F_cycle, "W": W_cycle}[cycle]
    return _converge(
        x,
        b,
        lambda x_, b_: cyc(x_, b_, ncoarse, Npre, Npost),
        lap.residual_error,
        tolerance,
    )


# ---------------------------------------------------------------------------
# FAS cycles
# ---------------------------------------------------------------------------

def V_cycle_FAS(
    x, b, ops: FASOps, ncoarse: int, Npre: int, Npost: int,
    level: int = 0, rhs: Optional[jax.Array] = None,
):
    x = ops.smoothing(x, b, Npre, rhs)
    res_c, x_c, b_c = ops.restrict_all(x, b, rhs)
    res_c = F32(4) * res_c + ops.operator(x_c, b_c)
    if _coarsest(level, ncoarse):
        x_corr_c = ops.smoothing(x_c, b_c, Npre, res_c)
    else:
        x_corr_c = V_cycle_FAS(
            x_c, b_c, ops, ncoarse, Npre, Npost, level + 1, res_c
        )
    x = mesh.add_prolongation(x, x_corr_c - x_c)
    return ops.smoothing(x, b, Npost, rhs)


def F_cycle_FAS(
    x, b, ops: FASOps, ncoarse: int, Npre: int, Npost: int,
    level: int = 0, rhs: Optional[jax.Array] = None,
):
    """FAS F-cycle (reference multigrid.py:642-719): an F-recursion first
    leg, then a V-cycle second leg, Npre smoothing between legs."""
    x = ops.smoothing(x, b, Npre, rhs)
    res_c, x_c, b_c = ops.restrict_all(x, b, rhs)
    res_c = F32(4) * res_c + ops.operator(x_c, b_c)
    if _coarsest(level, ncoarse):
        x_corr_c = ops.smoothing(x_c, b_c, Npre, res_c)
    else:
        x_corr_c = F_cycle_FAS(
            x_c, b_c, ops, ncoarse, Npre, Npost, level + 1, res_c
        )
    x = mesh.add_prolongation(x, x_corr_c - x_c)
    x = ops.smoothing(x, b, Npre, rhs)

    res_c, x_c, _ = ops.restrict_all(x, b, rhs)
    res_c = F32(4) * res_c + ops.operator(x_c, b_c)
    if _coarsest(level, ncoarse):
        x_corr_c = ops.smoothing(x_c, b_c, Npre, res_c)
    else:
        x_corr_c = V_cycle_FAS(
            x_c, b_c, ops, ncoarse, Npre, Npost, level + 1, res_c
        )
    x = mesh.add_prolongation(x, x_corr_c - x_c)
    return ops.smoothing(x, b, Npost, rhs)


def W_cycle_FAS(
    x, b, ops: FASOps, ncoarse: int, Npre: int, Npost: int,
    level: int = 0, rhs: Optional[jax.Array] = None,
):
    for last in (False, True):
        x = ops.smoothing(x, b, Npre, rhs)
        res_c, x_c, b_c = ops.restrict_all(x, b, rhs)
        res_c = F32(4) * res_c + ops.operator(x_c, b_c)
        if _coarsest(level, ncoarse):
            x_corr_c = ops.smoothing(x_c, b_c, Npre, res_c)
        else:
            x_corr_c = W_cycle_FAS(
                x_c, b_c, ops, ncoarse, Npre, Npost, level + 1, res_c
            )
        x = mesh.add_prolongation(x, x_corr_c - x_c)
        if last:
            x = ops.smoothing(x, b, Npost, rhs)
    return x


def FAS(
    x, b, ops: FASOps, ncoarse: int, Npre: int, Npost: int, tolerance,
    cycle: str = "V",
):
    """Full Approximation Scheme solve of ops.operator(x, b) = 0."""
    cyc = {"V": V_cycle_FAS, "F": F_cycle_FAS, "W": W_cycle_FAS}[cycle]
    return _converge(
        x,
        b,
        lambda x_, b_: cyc(x_, b_, ops, ncoarse, Npre, Npost),
        ops.residual_error,
        tolerance,
    )
