"""Particle-Mesh force solver: one compiled XLA program per evaluation.

Equivalent of the reference's ``solver.pm`` hot path (solver.py:30-215) --
deposit, theory-specific right-hand side, linear or multigrid Poisson solve,
(f(R)) scalaron FAS solve, force stencil and gather -- but traced as a
single jitted function. Theory/solver/scheme choices are static (baked into
the trace); everything that changes per step (aexp, f(R) background
constants, MOND g0 in box units, the growth-rescaling of the previous
potential) enters as float32 scalars computed on the host in float64
(:func:`compute_dynamics`).

Conventions identical to the reference:
- density grids hold particle counts normalised to mean 1 (cell counts x
  N_cells^3/npart);
- rhs of the Poisson equation is 1.5 * aexp * Om_m * mu(z) * (delta - 1)
  (solver.py:444-449), MOND gets the QUMOND source of the Newtonian
  potential (solver.py:413-443);
- the "acceleration" array is +grad(phi); the kick subtracts it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models import cubic, laplacian, mond, multigrid, quartic
from .ops import dense_pm, fourier, mesh
from .utils.units import C_KMS

F32 = jnp.float32


@dataclass(frozen=True)
class SolverConfig:
    """Static (trace-time) solver configuration."""

    theory: str
    ncoarse: int
    npart: int
    mass_scheme: str
    linear_newton_solver: str
    gradient_stencil_order: int
    Npre: int
    Npost: int
    fR_n: int
    mond_function: str
    mond_alpha: float
    # "pallas": tile-binned Pallas kernels over the column layout
    # (ops/pallas_pm.py), the fast path on TPU. "dense": scatter-free
    # one-hot contractions (ops/dense_pm.py). "scatter": XLA
    # scatter/gather reference path.
    particle_engine: str = "pallas"
    # "newton": float32 Newton polish from the current grid value in the
    # f(R) Gauss-Seidel sweeps (matches the closed form to f32 roundoff,
    # tests/test_scalaron.py). "exact": the reference's float64
    # closed-form roots (cubic.py:162-207 / quartic.py:157-204) --
    # bit-faithful but emulated-f64 slow on TPU.
    fR_root_solver: str = "newton"
    # multigrid cycle type for the linear and FAS drivers: V (the
    # reference driver's choice, multigrid.py:76-82/131-137), F or W
    # (reference multigrid.py:583-858)
    multigrid_cycle: str = "V"
    # "full" (default): the global 7-operand sort. "nearly": two-round
    # shifted block sort exploiting the CFL-bounded drift between force
    # evaluations, with a monotonicity check and full-sort fallback
    # (pallas_pm.sort_particles). "index": sort only (key, iota) then
    # permute the payload with one take(). "nearly_index": both.
    # All three alternatives LOSE on v5e at 256^3 (tools/sort_ab.py,
    # 2026-08-18): full 137 ms, nearly 272 (two 7-op block rounds plus
    # the cond fallback's buffer copies), index 692 (raw 2-op sort is
    # only 38 ms but the take() permutation is an element-granularity
    # TPU gather at 661 ms). They stay as documented experiments; the
    # production lever is sort CADENCE (lazy_drift), not sort cost.
    sort_mode: str = "full"
    # MXU precision of the pallas deposit/gather contractions (the hot
    # cost at large grids; see ops/pallas_pm._dot): "bf16x3" (default)
    # is float32-faithful to ~1 ulp at half the f32-emulation cost;
    # "f32" is lax HIGHEST; "bf16" a single lossy pass; "bf16-gather"
    # keeps the deposit exact (bf16x3) and lowers only the gather of
    # SORTED passes to one bf16 pass (adjudicated round 5: see
    # tests/test_widened_precision.py for the P(k) bound and
    # BENCH_NOTES.md for the measured step rates).
    pm_precision: str = "bf16x3"
    # Precision of the DRIFT-WIDENED (stale-bin) passes only. These are
    # MXU-bound (2-3x window rows) and run on ~3 of every 4 production
    # steps at Courant 0.5, so a single bf16 pass there cuts the
    # dominant late-time kernel cost ~3x. Values: "bf16x3" (exact),
    # "bf16-gather" (gather bf16, deposit stays exact -- the measured
    # density and P(k) are untouched; only ~2e-3 force rounding on
    # stale-bin steps), "bf16" (both). Full-horizon P(k) impact of each
    # is bounded by tests/test_widened_precision.py. Default
    # "bf16-gather": measured 1.1-1.3e-4 full-horizon P(k) impact (10x
    # under the 0.1% BASELINE target) for ~3x less MXU work on the
    # dominant widened gather.
    pm_precision_widened: str = "bf16-gather"
    # Maximum lazy re-binning window (cells): the run loop keeps using
    # stale bins with drift-widened kernels until the accumulated CFL
    # drift bound exceeds this many cells, then re-sorts. At Courant
    # ~0.5 the default 3 stretches the tile sort (the single dominant
    # step cost at 256^3+) to every 6th step (levels 0,1,2,2,3,3); the
    # window level is chosen per step, so early steps still run the
    # tight drift=1 kernels. Measured 512^3 CIC production cadence
    # (2026-08-20, with bf16-gather widened passes): 0.722 steps/s at
    # 2 -> 0.757 at 3. 0 sorts every step.
    lazy_drift: int = 3

    @property
    def ncells_1d(self) -> int:
        return 2 ** self.ncoarse

    @property
    def mas_index(self) -> int:
        return {"ngp": 1, "cic": 2, "tsc": 3}[self.mass_scheme]


def widened_precisions(cfg: SolverConfig, drift: int) -> tuple[str, str]:
    """(deposit, gather) MXU precision for a pass at this drift level.

    Sorted passes (drift == 0) use ``pm_precision``; widened passes
    honour ``pm_precision_widened``. In either slot "bf16-gather"
    lowers only the gather to one native bf16 pass (the deposit feeds
    the measured density/P(k), the gather only the forces); the deposit
    then runs at the exact base precision (``pm_precision``, or bf16x3
    when ``pm_precision`` is itself "bf16-gather")."""
    base_dep = ("bf16x3" if cfg.pm_precision == "bf16-gather"
                else cfg.pm_precision)
    mode = cfg.pm_precision if not drift else cfg.pm_precision_widened
    if mode == "bf16-gather":
        return base_dep, "bf16"
    return mode, mode


def sorted_precisions(cfg: SolverConfig) -> tuple[str, str]:
    """(deposit, gather) MXU precision for a freshly sorted pass."""
    return widened_precisions(cfg, 0)


# accepted _dot modes (ops/pallas_pm.py); "bf16-gather" additionally
# allowed for the widened key (lowers only the gather of widened passes)
_PM_PRECISIONS = ("f32", "bf16", "bf16x3")


def widened_deposit_exact(cfg: SolverConfig) -> bool:
    """True when drift-widened passes deposit at the same MXU precision
    as sorted passes -- i.e. a P(k) measured off a widened deposit is as
    exact as off a sorted one (same weights to the same cells; only the
    tile summation order differs, ~1 ulp f32)."""
    return widened_precisions(cfg, 1)[0] == widened_precisions(cfg, 0)[0]


def config_from_param(param) -> SolverConfig:
    cfg = _config_from_param(param)
    # validate at parse time: a typo'd precision mode must name the
    # param key here, not surface as _dot's trace-time error on the
    # first drift>0 step (ADVICE r4)
    if cfg.pm_precision not in _PM_PRECISIONS + ("bf16-gather",):
        raise ValueError(
            f"pm_precision={cfg.pm_precision!r}: expected one of "
            f"{_PM_PRECISIONS + ('bf16-gather',)}"
        )
    if cfg.pm_precision_widened not in _PM_PRECISIONS + ("bf16-gather",):
        raise ValueError(
            f"pm_precision_widened={cfg.pm_precision_widened!r}: expected "
            f"one of {_PM_PRECISIONS + ('bf16-gather',)}"
        )
    return cfg


def _config_from_param(param) -> SolverConfig:
    return SolverConfig(
        theory=str(param["theory"]).casefold(),
        ncoarse=int(param["ncoarse"]),
        npart=int(param["npart"]),
        mass_scheme=str(param["mass_scheme"]).casefold(),
        linear_newton_solver=str(param["linear_newton_solver"]).casefold(),
        gradient_stencil_order=int(param["gradient_stencil_order"]),
        Npre=int(param["Npre"]),
        Npost=int(param["Npost"]),
        fR_n=int(param["fR_n"]),
        mond_function=str(param["mond_function"]).casefold(),
        mond_alpha=float(param["mond_alpha"]),
        particle_engine=str(param.get("particle_engine", "pallas")).casefold()
        if hasattr(param, "get")
        else "pallas",
        fR_root_solver=str(param.get("fR_root_solver", "newton")).casefold()
        if hasattr(param, "get")
        else "newton",
        multigrid_cycle=str(param.get("multigrid_cycle", "V")).upper()
        if hasattr(param, "get")
        else "V",
        sort_mode=str(param.get("sort_mode", "full")).casefold()
        if hasattr(param, "get")
        else "full",
        pm_precision=str(param.get("pm_precision", "bf16x3")).casefold()
        if hasattr(param, "get")
        else "bf16x3",
        pm_precision_widened=str(
            param.get("pm_precision_widened", "bf16-gather")
        ).casefold()
        if hasattr(param, "get")
        else "bf16-gather",
        lazy_drift=int(param.get("lazy_drift", 3))
        if hasattr(param, "get")
        else 3,
    )


class DynScalars(NamedTuple):
    """Per-step dynamic scalars (float32 on device, computed in float64)."""

    aexp: jax.Array
    om_m: jax.Array
    mu_z: jax.Array  # parametrized mu(z); 1 otherwise
    epsrel: jax.Array
    fR_f1: jax.Array
    fR_f2: jax.Array
    fR_q: jax.Array
    fR_half_c2: jax.Array
    mond_g0: jax.Array
    potential_scaling: jax.Array


def compute_dynamics(param) -> DynScalars:
    """Host-side (float64) computation of the per-step scalars.

    f(R) background constants follow solver.py:166-197 and :326-351;
    parametrized mu(z) follows solver.py:95-112; MOND g0 conversion
    follows solver.py:403-411.
    """
    aexp = float(param["aexp"])
    om_m = float(param["Om_m"])
    theory = str(param["theory"]).casefold()

    mu_z = 1.0
    if theory == "parametrized":
        w0, wa = float(param["w0"]), float(param["wa"])
        om_lambda = float(param["Om_lambda"])
        om_r = float(param["Om_r"])
        evolution_term = aexp ** (-3 * (1 + w0 + wa)) * math.exp(
            -3 * wa * (1 - aexp)
        )
        omega_lambda_z = (
            om_lambda
            * evolution_term
            / (om_m * aexp ** -3 + om_r * aexp ** -4 + om_lambda * evolution_term)
        )
        mu_z = 1.0 + float(param["parametrized_mu0"]) * omega_lambda_z / om_lambda

    fR_f1 = fR_f2 = fR_q = fR_half_c2 = 0.0
    if theory == "fr":
        om_lambda = float(param["Om_lambda"])
        Rbar = 3 * om_m * aexp ** -3 + 12 * om_lambda
        Rbar0 = 3 * om_m + 12 * om_lambda
        fR_a = (
            -(aexp ** 2)
            * (Rbar0 / Rbar) ** (int(param["fR_n"]) + 1)
            * 10.0 ** (-float(param["fR_logfR0"]))
        )
        c2 = (C_KMS * param["unit_t"] / (param["unit_l"] * aexp)) ** 2
        fR_f1 = (aexp * om_m / (c2 * 6)) / (-fR_a)
        fR_f2 = (Rbar / 3 * aexp ** 4 - om_m * aexp) / (6 * c2) / (-fR_a)
        fR_q = (-(aexp ** 4) * Rbar / (18 * c2)) / (-fR_a)
        fR_half_c2 = 0.5 * (-fR_a) * c2

    mond_g0 = 0.0
    if theory == "mond":
        mond_g0 = (
            float(param["mond_g0"])
            * 1e-3
            * 1e-10
            * param["unit_t"] ** 2
            / param["unit_l"]
            * aexp ** (1 + float(param["mond_scale_factor_exponent"]))
        )

    scaling = float(param.get("potential_scaling", 1.0))

    return DynScalars(
        aexp=F32(aexp),
        om_m=F32(om_m),
        mu_z=F32(mu_z),
        epsrel=F32(param["epsrel"]),
        fR_f1=F32(fR_f1),
        fR_f2=F32(fR_f2),
        fR_q=F32(fR_q),
        fR_half_c2=F32(fR_half_c2),
        mond_g0=F32(mond_g0),
        potential_scaling=F32(scaling),
    )


# ---------------------------------------------------------------------------
# Solver pieces (all jit-traceable; cfg and flags are static)
# ---------------------------------------------------------------------------

def _linear_solve(cfg: SolverConfig, rhs, potential, dyn, first_call: bool):
    """Dispatch of the linear Poisson solve (solver.py:151-164)."""
    solver = cfg.linear_newton_solver
    if solver == "multigrid":
        if first_call:
            potential = laplacian.initialise_potential(rhs)
        else:
            potential = potential * dyn.potential_scaling
        # NOTE: recomputed every solve. The reference caches it and only
        # recomputes every 3rd step (multigrid.py:62-68); always-fresh is
        # tighter (never stale), costs one extra stencil+restriction pass.
        tolerance = dyn.epsrel * laplacian.truncation_error(potential)
        return multigrid.linear(
            potential, rhs, cfg.ncoarse, cfg.Npre, cfg.Npost, tolerance,
            cfg.multigrid_cycle,
        )
    if solver in ("fft", "fft_7pt"):
        rhs_k = fourier.rfft3(rhs)
        if solver == "fft_7pt":
            rhs_k = fourier.inverse_laplacian_7pt(rhs_k)
        elif cfg.mas_index == 0:
            rhs_k = fourier.inverse_laplacian(rhs_k)
        else:
            rhs_k = fourier.inverse_laplacian_compensated(rhs_k, cfg.mas_index)
        return fourier.irfft3(rhs_k)
    raise NotImplementedError(
        f"linear_newton_solver {solver!r}, should be multigrid, fft, "
        "fft_7pt or full_fft"
    )


def _fft_force(cfg: SolverConfig, rhs):
    """full_fft path: solve and differentiate in k-space (solver.py:526-579)."""
    rhs_k = fourier.rfft3(rhs)
    if cfg.mas_index == 0:
        force_k = fourier.gradient_inverse_laplacian(rhs_k)
    else:
        force_k = fourier.gradient_inverse_laplacian_compensated(rhs_k, cfg.mas_index)
    return fourier.irfft3_vec(force_k)


def _additional_field(cfg: SolverConfig, density, u, dyn, first_call: bool):
    """Solve the extra field for modified gravity (solver.py:285-380)."""
    theory = cfg.theory
    if theory in ("newton", "parametrized"):
        return u
    if theory == "fr":
        dens_term = dyn.fR_f1 * density + dyn.fR_f2
        exact_root = cfg.fR_root_solver == "exact"
        if cfg.fR_n == 1:
            ops = multigrid.fas_ops_cubic(dyn.fR_q, exact_root)
            if first_call:
                u = cubic.initialise_potential(dens_term, dyn.fR_q)
        elif cfg.fR_n == 2:
            ops = multigrid.fas_ops_quartic(dyn.fR_q, exact_root)
            if first_call:
                u = quartic.initialise_potential(dens_term, dyn.fR_q)
        else:
            raise NotImplementedError(f"fR_n must be 1 or 2, got {cfg.fR_n}")
        tolerance = dyn.epsrel * ops.truncation_error(u, dens_term)
        return multigrid.FAS(
            u, dens_term, ops, cfg.ncoarse, cfg.Npre, cfg.Npost, tolerance,
            cfg.multigrid_cycle,
        )
    if theory == "mond":
        # Newtonian potential solve; the result is the "additional field".
        rhs_newton = (
            F32(1.5) * dyn.aexp * dyn.om_m * dyn.mu_z * (density - F32(1))
        )
        if cfg.linear_newton_solver == "multigrid":
            if first_call:
                u = laplacian.initialise_potential(rhs_newton)
            tolerance = dyn.epsrel * laplacian.truncation_error(u)
            return multigrid.linear(
                u, rhs_newton, cfg.ncoarse, cfg.Npre, cfg.Npost, tolerance,
                cfg.multigrid_cycle,
            )
        if cfg.linear_newton_solver == "fft_7pt":
            return fourier.irfft3(
                fourier.inverse_laplacian_7pt(fourier.rfft3(rhs_newton))
            )
        raise NotImplementedError(
            "MOND additional field requires multigrid or fft_7pt "
            f"(got {cfg.linear_newton_solver!r})"
        )
    raise NotImplementedError(f"theory {theory!r}")


def _pm_impl(cfg: SolverConfig, first_call: bool, save_pk: bool,
             position, velocity, potential, u, dyn: DynScalars):
    """Full PM force evaluation.

    Returns (position, velocity, acceleration, potential, u, pk, overflow).
    With the dense/pallas engines the particle arrays come back tile-sorted
    (velocity rides along in the sort; particle identity is irrelevant).
    The pallas engine keeps the state in **column layout** ``(3, N_up)``
    (ops/pallas_pm.py) -- ``first_call`` converts from the (npart, 3)
    row-major initial conditions; sentinel tail columns (position 2.0,
    zero velocity) round npart up to the chunk quantum.
    """
    n = cfg.ncells_1d
    norm = F32(n ** 3 / cfg.npart)
    if cfg.particle_engine == "pallas":
        from .ops import pallas_pm

        interpret = jax.default_backend() == "cpu"
        if first_call and position.shape[0] != 4:
            # (npart, 3) row-major initial conditions -> column state.
            # Callers with large states should convert on the host
            # (pallas_pm.to_columns_host) to avoid holding both layouts
            # in HBM; pre-columned (4, N_up) input skips this.
            if velocity is None:
                velocity = jnp.zeros_like(position)
            position, velocity = pallas_pm.to_columns(
                position, velocity, cfg.npart
            )
        position, velocity, tstarts = pallas_pm.sort_particles(
            position, velocity, n, cfg.mass_scheme,
            mode=cfg.sort_mode,
        )
        prec_dep, prec_gat = sorted_precisions(cfg)
        density = pallas_pm.deposit(
            position, tstarts, n, cfg.mass_scheme, interpret,
            precision=prec_dep,
        )
        if n ** 3 != cfg.npart:
            density = density * norm
        force, potential, u, pk = _solve_fields(
            cfg, first_call, save_pk, density, potential, u, dyn,
            leading=True,
        )
        acceleration = pallas_pm.gather_vec_cl(
            force, position, tstarts, cfg.mass_scheme, interpret,
            precision=prec_gat,
        )
        overflow = jnp.int32(0)  # range-masked chunks cannot overflow
        return (position, velocity, acceleration, potential, u, pk,
                overflow)
    if cfg.particle_engine == "dense":
        if velocity is None:
            position, starts = dense_pm.sort_by_plane(
                position, n, cfg.mass_scheme
            )
        else:
            position, velocity, starts = dense_pm.sort_by_plane(
                position, n, cfg.mass_scheme, velocity
            )
        density, overflow = dense_pm.deposit(
            position, starts, n, cfg.mass_scheme
        )
        if n ** 3 != cfg.npart:
            density = density * norm
        force, potential, u, pk = _solve_fields(
            cfg, first_call, save_pk, density, potential, u, dyn
        )
        acceleration = dense_pm.gather_vec(
            force, position, starts, cfg.mass_scheme
        )
    else:
        density = mesh.deposit(position, n, cfg.mass_scheme)
        if n ** 3 != cfg.npart:
            density = density * norm
        force, potential, u, pk = _solve_fields(
            cfg, first_call, save_pk, density, potential, u, dyn
        )
        acceleration = mesh.gather_vec(force, position, cfg.mass_scheme)
        overflow = jnp.int32(0)
    return (position, velocity, acceleration, potential, u, pk, overflow)


def _solve_fields(cfg: SolverConfig, first_call: bool, save_pk: bool,
                  density, potential, u, dyn: DynScalars,
                  leading: bool = False):
    """Field solve given the normalised density grid: additional-field +
    Poisson solve + force mesh. Returns (force, potential, u, pk);
    ``leading=True`` lays the force out component-leading (3, M, M, M) --
    what the Pallas gather consumes without a transpose copy."""
    pk = None
    if save_pk:
        # Density power spectrum with MAS compensation; all reference
        # solver paths reduce to this (raw counts for multigrid,
        # rhs/(1.5 a Om mu)^2 for the fft paths).
        pk = fourier.power_spectrum(fourier.rfft3(density), cfg.mas_index)

    u = _additional_field(cfg, density, u, dyn, first_call)

    if cfg.theory == "mond":
        rhs = mond.rhs(u, dyn.mond_g0, cfg.mond_function, cfg.mond_alpha)
    else:
        f1 = F32(1.5) * dyn.aexp * dyn.om_m * dyn.mu_z
        rhs = f1 * (density - F32(1))
    del density

    if cfg.linear_newton_solver == "full_fft":
        force = _fft_force(cfg, rhs)
        if leading:
            force = jnp.moveaxis(force, -1, 0)
        if cfg.theory == "fr":
            force = force + mesh.derivative_fR(
                jnp.zeros_like(rhs), u, dyn.fR_half_c2, cfg.fR_n,
                cfg.gradient_stencil_order, leading,
            )
        potential_out = potential  # unused on this path
    else:
        potential_out = _linear_solve(cfg, rhs, potential, dyn, first_call)
        if cfg.theory == "fr":
            force = mesh.derivative_fR(
                potential_out, u, dyn.fR_half_c2, cfg.fR_n,
                cfg.gradient_stencil_order, leading,
            )
        else:
            force = mesh.derivative(
                potential_out, cfg.gradient_stencil_order, leading
            )

    return force, potential_out, u, pk


def force_3d(rhs, param):
    """Library utility: solve the Poisson equation for a given RHS grid
    and return the force mesh (reference solver.py:582-639).

    Supports multigrid / fft / fft_7pt / full_fft without any MAS
    compensation (MAS_index = 0).
    """
    import dataclasses

    cfg = dataclasses.replace(
        config_from_param(param), mass_scheme="ngp"
    )  # mas_index -> 1; compensation disabled below
    rhs = jnp.asarray(rhs, F32)
    solver = cfg.linear_newton_solver
    dyn = compute_dynamics(param)
    if solver == "multigrid":
        potential = laplacian.initialise_potential(rhs)
        tolerance = dyn.epsrel * laplacian.truncation_error(potential)
        potential = multigrid.linear(
            potential, rhs, cfg.ncoarse, cfg.Npre, cfg.Npost, tolerance
        )
        return mesh.derivative(potential, cfg.gradient_stencil_order)
    if solver in ("fft", "fft_7pt"):
        rhs_k = fourier.rfft3(rhs)
        if solver == "fft_7pt":
            rhs_k = fourier.inverse_laplacian_7pt(rhs_k)
        else:
            rhs_k = fourier.inverse_laplacian(rhs_k)
        potential = fourier.irfft3(rhs_k)
        return mesh.derivative(potential, cfg.gradient_stencil_order)
    if solver == "full_fft":
        return fourier.irfft3_vec(
            fourier.gradient_inverse_laplacian(fourier.rfft3(rhs))
        )
    raise NotImplementedError(solver)


@partial(jax.jit, static_argnums=(0, 1, 2))
def pm(cfg: SolverConfig, first_call: bool, save_pk: bool,
       position, velocity, potential, u, dyn: DynScalars):
    """See :func:`pm_donated` for the buffer-donating production variant."""
    return _pm_impl(
        cfg, first_call, save_pk, position, velocity, potential, u, dyn
    )


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4, 5, 6))
def pm_donated(cfg: SolverConfig, first_call: bool, save_pk: bool,
               position, velocity, potential, u, dyn: DynScalars):
    """Compute PM acceleration.

    Returns (position, velocity, acceleration, potential, additional, pk,
    overflow); particle arrays may come back reordered (the dense/pallas
    engines sort them; velocity rides along), and the pallas engine keeps
    them in (3, N_up) column layout -- see :func:`particles_to_rows`.
    """
    return _pm_impl(
        cfg, first_call, save_pk, position, velocity, potential, u, dyn
    )


def _pm_lazy_impl(cfg: SolverConfig, presorted: int, save_pk: bool,
                  position, velocity, tstarts, potential, u,
                  dyn: DynScalars):
    """Pallas-engine force evaluation with CFL-bounded lazy re-binning.

    ``presorted`` is the drift window level: with ``presorted = k >= 1``
    the tile sort is skipped and particles are processed in their stale
    bins through k-cell drift-widened kernel windows (ops/pallas_pm.py),
    which is exact while every particle has moved less than k cells
    since the binning -- the caller enforces that with the host-side
    drift bound (max|v| dt + max|a| dt^2/2 per step, accumulated since
    the last sort) and picks the smallest sufficient k, and a
    device-side violation counter (returned as ``overflow``) detects a
    broken bound instead of silently corrupting mass. ``presorted = 0``
    (or False) re-sorts. Returns
    (position, velocity, tstarts, acceleration, potential, u, pk,
    overflow).
    """
    n = cfg.ncells_1d
    norm = F32(n ** 3 / cfg.npart)
    from .ops import pallas_pm

    interpret = jax.default_backend() == "cpu"
    if presorted:
        drift = int(presorted)
        overflow = pallas_pm.drift_violations(
            position, tstarts, n, cfg.mass_scheme, drift
        )
    else:
        position, velocity, tstarts = pallas_pm.sort_particles(
            position, velocity, n, cfg.mass_scheme,
            mode=cfg.sort_mode,
        )
        drift = 0
        overflow = jnp.int32(0)
    prec_dep, prec_gat = widened_precisions(cfg, drift)
    density = pallas_pm.deposit(
        position, tstarts, n, cfg.mass_scheme, interpret, drift,
        precision=prec_dep,
    )
    if n ** 3 != cfg.npart:
        density = density * norm
    force, potential, u, pk = _solve_fields(
        cfg, False, save_pk, density, potential, u, dyn, leading=True
    )
    acceleration = pallas_pm.gather_vec_cl(
        force, position, tstarts, cfg.mass_scheme, interpret, drift,
        precision=prec_gat,
    )
    return (position, velocity, tstarts, acceleration, potential, u, pk,
            overflow)


def particles_to_rows(cfg: SolverConfig, *arrays):
    """Convert engine-layout particle arrays to (npart, 3) row-major
    numpy arrays (for snapshot I/O and analysis)."""
    import numpy as np

    from .ops import pallas_pm

    # Per-fetch cap: the axon tunnel rejects single device->host copies
    # in the GB range (UNIMPLEMENTED) -- a (4, 512^3) column state is
    # 2.1 GB. 2^23 columns ~ 128 MB per fetch.
    chunk = 8 * 1024 * 1024
    n_up = pallas_pm.padded_cols(cfg.npart)
    out = []
    for a in arrays:
        # Column layout is exactly (3|4, padded_cols(npart)); matching on
        # shape[0] alone would mis-transpose legitimate (npart, 3) rows
        # when npart is 3 or 4 (padded_cols >= 512 can never equal 3).
        is_cols = a.ndim == 2 and a.shape[0] in (3, 4) and a.shape[1] == n_up
        if isinstance(a, jax.Array) and max(a.shape) > chunk:
            # value-fetch barrier: on the axon backend a device->host copy
            # of an array whose producer is still in flight fails with
            # UNIMPLEMENTED (block_until_ready is a no-op there)
            float(jnp.sum(a[:1, :1] if a.ndim == 2 else a[:1]))
            if is_cols:
                rows = np.empty((cfg.npart, 3), np.float32)
                for i in range(0, cfg.npart, chunk):
                    j = min(i + chunk, cfg.npart)
                    rows[i:j] = np.asarray(a[:3, i:j]).T
                out.append(rows)
            else:
                rows = np.empty((cfg.npart,) + a.shape[1:], np.float32)
                for i in range(0, cfg.npart, chunk):
                    j = min(i + chunk, cfg.npart)
                    rows[i:j] = np.asarray(a[i:j])
                out.append(rows)
            continue
        a = np.asarray(a)
        if is_cols:
            a = a[:3, : cfg.npart].T
        else:
            a = a[: cfg.npart]
        out.append(a)
    return tuple(out)


def empty_fields(cfg: SolverConfig):
    """Placeholder potential / additional-field grids for the first call.

    Two distinct buffers (not one shared zeros array): the donating pm
    variant would otherwise receive the same buffer twice.
    """
    n = cfg.ncells_1d
    if cfg.theory in ("newton", "parametrized"):
        # no additional field: keep a token grid so the pytree shape is
        # stable without wasting a full cube of HBM
        return jnp.zeros((n, n, n), F32), jnp.zeros((1, 1, 1), F32)
    return jnp.zeros((n, n, n), F32), jnp.zeros((n, n, n), F32)
