"""Run loop and CLI.

``run(param)`` mirrors the reference driver (main.py:30-156): background
tables, initial conditions, first force evaluation, then the adaptive
kick-drift-kick loop with Morton reordering every ``n_reorder`` steps and
snapshot/power-spectrum output at each ``z_out``. The device executes one
compiled program per step; the host performs the dt table lookups, decides
snapshot clamping and writes outputs.
"""

from __future__ import annotations

import ast
import logging
import os
from time import perf_counter
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from . import cosmo, ic
from . import integrate as integration
from . import solver as solver_mod
from .ops import mesh as mesh_ops
from .utils import io as iostream
from .utils.config import Params, extra_name, params_from_dict, with_defaults
from .utils.units import set_units


def _setup_logging(verbose: int) -> None:
    level = {0: logging.ERROR, 1: logging.WARNING, 2: logging.INFO}.get(verbose)
    if level is None:
        raise ValueError(f"verbose={verbose}, should be 0, 1 or 2")
    logging.basicConfig(level=level, format="%(message)s", force=True)


def _handle_overflow(param, overflow: int, what: str) -> None:
    """A nonzero overflow diagnostic means particles were dropped (slab
    capacity) or silently deposited nothing (violated lazy drift bound):
    the simulation no longer conserves mass. The reference can never lose
    a particle, so the default is a hard abort; ``on_particle_overflow =
    warn`` keeps the old log-and-continue behaviour for debugging."""
    if not overflow:
        return
    msg = f"{what}: {overflow} particles lost this step"
    policy = str(param.get("on_particle_overflow", "raise")).casefold()
    if policy == "warn":
        logging.error("%s -- continuing (on_particle_overflow=warn); "
                      "results do not conserve mass", msg)
        return
    raise RuntimeError(
        msg + " -- aborting (mass is no longer conserved). Fixes: raise "
        "slab_slack / lower Courant_factor; or set "
        "on_particle_overflow=warn to continue anyway."
    )


def _advance_time(param, tables, aexp_out, t_out, max_abs_acc,
                  max_abs_vel) -> float:
    """One host-side background advance, shared by every run-loop flavour:
    adaptive dt (3 criteria), clamping onto the next output time (landing
    exactly on the output scale factor avoids interp round-trip error
    stranding aexp just below the target), aexp/units/potential_scaling
    bookkeeping (reference integration.py:253-257). Sets
    param["write_snapshot"] and returns dt."""
    dt, dts = integration.compute_dt(param, tables, max_abs_acc,
                                     max_abs_vel)
    i_snap_idx = min(int(param["i_snap"]) - 1, len(t_out) - 1)
    t_snap_next = t_out[i_snap_idx]
    if param["t"] + dt > t_snap_next:
        dt = t_snap_next - param["t"]
        param["write_snapshot"] = True
    else:
        param["write_snapshot"] = False
    logging.info("dt conditions: acc=%s vel=%s aexp=%s", *dts)
    param["t"] = param["t"] + dt
    param["aexp_old"] = param["aexp"]
    if param["write_snapshot"]:
        param["aexp"] = float(aexp_out[i_snap_idx])
    else:
        param["aexp"] = float(np.exp(tables[0](param["t"])))
    set_units(param)
    d1_new = float(tables[3](np.log(param["aexp"])))
    d1_old = float(tables[3](np.log(param["aexp_old"]))) or 1.0
    param["potential_scaling"] = (
        param["aexp"] * d1_new / (param["aexp_old"] * d1_old)
    )
    return dt


def _drift_level(need: float, max_drift: int) -> int:
    """Smallest drift-window level (cells) that keeps a lazy re-binned
    step exact for an accumulated drift bound of ``need`` cells, or 0 if
    none <= max_drift suffices (forces a re-sort). A window of k cells
    covers accumulated drift < k; 0.01 is the float-slack margin."""
    for level in range(1, max_drift + 1):
        if need <= level - 0.01:
            return level
    return 0


def _save_pk_mode(param) -> str:
    mode = str(param["save_power_spectrum"]).casefold()
    if mode not in ("no", "z_out", "yes"):
        raise NotImplementedError(
            f"save_power_spectrum={mode!r}, should be 'yes', 'z_out' or 'no'"
        )
    return mode


def _write_pk(pk, param) -> None:
    if pk is None:
        return
    k, Pk, Nmodes = (np.asarray(v) for v in pk)
    n = 2 ** int(param["ncoarse"])
    Pk = Pk * (param["boxlen"] / n ** 2) ** 3
    k = k * 2 * np.pi / param["boxlen"]
    iostream.write_power_spectrum_to_ascii_file(k, Pk, Nmodes, param)


def run(param) -> None:
    """Run an N-body simulation from a parameter container (dict/Params)."""
    if isinstance(param, Dict) and not isinstance(param, Params):
        param = params_from_dict(param)
    param = with_defaults(param)
    verbose = int(param["verbose"])
    _setup_logging(verbose)
    from .utils.compile_cache import enable_compile_cache

    enable_compile_cache(str(param.get("compile_cache", "yes")))
    if verbose >= 2:
        # full timings: per-cycle multigrid residual lines (reference
        # multigrid.py:79,134) and per-step wall-clock at INFO
        from .models import multigrid as multigrid_mod

        multigrid_mod.set_residual_logging(True)
    param["write_snapshot"] = False
    param["extra"] = extra_name(param)

    z_out = param["z_out"]
    if isinstance(z_out, str):
        z_out = ast.literal_eval(z_out)
    z_out = list(z_out)

    os.makedirs(f"{param['base']}/power", exist_ok=True)
    for i in range(len(z_out) + 1):
        os.makedirs(f"{param['base']}/output_{i:05d}", exist_ok=True)

    logging.warning("----- Compute background cosmology -----")
    tables = cosmo.generate(param)
    param["aexp"] = 1.0 / (1 + param["z_start"])
    set_units(param)
    if "nsteps" not in param:
        param["nsteps"] = 0

    parallel_mode = str(param.get("parallel_mode", "single")).casefold()

    logging.warning("----- Initial conditions -----")
    from . import ic_device

    device_ic = parallel_mode == "single" and ic_device.supported(param)
    slab_state = None
    if device_ic:
        # LPT algebra on the TPU (only the reference-exact RNG draw stays
        # on the host); yields the column state directly
        position, velocity = ic_device.generate_lpt(param, tables)
    elif parallel_mode == "slab":
        from .parallel import ic_slab, slab as slab_mod

        mesh = slab_mod.make_mesh()
        if ic_slab.supported(param, mesh.devices.size):
            # sharded LPT algebra: nothing larger than 1/D of a grid per
            # device, and the particles never leave their owning shard
            slab_state = ic_slab.generate_lpt_slab(param, tables, mesh)
            position = velocity = None
        else:
            position, velocity = ic.generate(param, tables)
    else:
        # note: a restart restores parameters from the snapshot attrs, so
        # cfg must only be built after this call
        position, velocity = ic.generate(param, tables)
    param["t"] = float(tables[1](np.log(param["aexp"])))
    param["aexp_old"] = param["aexp"]
    logging.warning("aexp=%s t=%s", param["aexp"], param["t"])

    cfg = solver_mod.config_from_param(param)
    integrator = str(param["integrator"]).casefold()
    pk_mode = _save_pk_mode(param)
    # re-read after ic.generate: a restart restores parameters (including
    # parallel_mode) from the snapshot attrs, and the dispatch must honour
    # the restored value, not the pre-restore one read for the device_ic
    # gate (restarts never take the device-IC path, so that gate is safe)
    parallel_mode = str(param.get("parallel_mode", "single")).casefold()

    if parallel_mode == "slab":
        if cfg.particle_engine != "pallas":
            # the sharded step only has the pallas transfer path; say so
            # rather than silently ignoring the key
            raise NotImplementedError(
                f"particle_engine={cfg.particle_engine!r} with "
                "parallel_mode='slab': the slab step supports only "
                "'pallas' (scatter/dense are single-device engines)"
            )
        return _run_slab(
            param, tables, cfg, integrator, pk_mode, position, velocity,
            z_out, state=slab_state,
        )
    if parallel_mode == "replicated":
        return _run_replicated(
            param, tables, cfg, integrator, pk_mode, position, velocity,
            z_out,
        )
    if parallel_mode != "single":
        raise NotImplementedError(
            f"parallel_mode={parallel_mode!r}, should be 'single', "
            "'replicated' or 'slab'"
        )

    # Device state. For the pallas engine, build the (4, N_up) column
    # layout on the host so HBM never holds both layouts at once.
    if cfg.particle_engine == "pallas" and not device_ic:
        from .ops import pallas_pm

        position, velocity = pallas_pm.to_columns_host(
            np.asarray(position), np.asarray(velocity), cfg.npart
        )
    position = jnp.asarray(position, jnp.float32)
    velocity = jnp.asarray(velocity, jnp.float32)
    potential, u = solver_mod.empty_fields(cfg)

    logging.warning("----- Run N-body -----")
    dyn = solver_mod.compute_dynamics(param)
    save_pk_first = pk_mode == "yes"
    (position, velocity, acceleration, potential, u, pk, _) = (
        solver_mod.pm_donated(
            cfg, True, save_pk_first, position, velocity, potential, u, dyn
        )
    )
    if save_pk_first:
        _write_pk(pk, param)

    if (verbose >= 2 and cfg.particle_engine == "pallas"
            and cfg.npart <= 256 ** 3):
        # one-time per-component force-evaluation breakdown (the @time_me
        # per-kernel timings of the reference have no equivalent inside a
        # fused XLA step; this is the observable substitute). It clones
        # the particle state, so it can exhaust HBM at the largest
        # single-chip sizes -- skip gracefully in that case.
        from .utils.profiling import component_breakdown

        try:
            logging.info(
                "force-evaluation component timings: %s",
                component_breakdown(cfg, position, velocity, dyn),
            )
        except Exception as e:
            logging.warning(
                "component timing breakdown skipped (%s: needs a state "
                "clone; insufficient HBM at this size)", type(e).__name__,
            )

    aexp_out = np.sort(1.0 / (np.array(z_out, dtype=np.float64) + 1))
    t_out = np.array([float(tables[1](np.log(a))) for a in aexp_out])
    logging.info("aexp_out=%s", aexp_out)

    if "i_snap" not in param:
        param["i_snap"] = 1
    else:
        param["i_snap"] = int(param["i_snap"]) + 1

    max_abs_acc = float(jnp.max(jnp.abs(acceleration)))
    max_abs_vel = float(jnp.max(jnp.abs(velocity)))
    first_call = False

    # CFL-bounded lazy re-binning (pallas engine): skip the per-step tile
    # sort while the accumulated drift bound since the last sort stays
    # under one cell -- the drift-widened kernels stay exact up to that
    # bound (ops/pallas_pm.py). cum_drift > 1 forces a sort.
    lazy = bool(param.get("lazy_sort", True)) and (
        cfg.particle_engine == "pallas"
    )
    if lazy:
        from .ops import pallas_pm

        ncells = cfg.ncells_1d
        tstarts = jnp.zeros(pallas_pm.n_tiles(ncells) + 1, jnp.int32)
        cum_drift = np.inf  # no binning yet: first loop step sorts

    while param["aexp"] < aexp_out[-1]:
        param["nsteps"] = int(param["nsteps"]) + 1
        dt = _advance_time(param, tables, aexp_out, t_out,
                           max_abs_acc, max_abs_vel)
        dyn = solver_mod.compute_dynamics(param)

        save_pk = pk_mode == "yes" or (
            pk_mode == "z_out" and param["write_snapshot"]
        )
        profile_dir = param.get("profile_dir", "")
        if profile_dir and param["nsteps"] == 2:
            # capture a device trace of one steady-state step (step 1 pays
            # compilation; reference hook: utils.py:60-136 profile_me)
            from .utils.profiling import trace as profiler_trace

            profile_cm = profiler_trace(str(profile_dir))
        else:
            profile_cm = None
        t_step0 = perf_counter()
        if profile_cm is not None:
            profile_cm.__enter__()
        if lazy:
            step_bound = (
                max_abs_vel * dt + 0.5 * max_abs_acc * dt * dt
            ) * cfg.ncells_1d
            presorted = _drift_level(
                cum_drift + step_bound, cfg.lazy_drift
            )
            if save_pk and not solver_mod.widened_deposit_exact(cfg):
                # measured P(k) must come from a deposit at the exact
                # (pm_precision) MXU path; when the widened-pass mode
                # lowers the DEPOSIT (pm_precision_widened="bf16"),
                # force a fresh sort. The default "bf16-gather" and
                # "bf16x3" modes keep the deposit exact, so P(k) steps
                # keep the lazy cadence (a widened deposit puts the same
                # weights in the same cells; only tile summation order
                # differs, ~1 ulp f32) -- ADVICE r4: save_pk no longer
                # disables lazy re-binning under the default mode.
                presorted = 0
            (position, velocity, acceleration, potential, u, tstarts, pk,
             diag) = integration.step_lazy(
                cfg, integrator, presorted, save_pk,
                position, velocity, acceleration, potential, u, tstarts,
                dyn, np.float32(dt),
            )
            if presorted:
                cum_drift += step_bound
                logging.info("lazy re-binning: sort skipped "
                             "(drift bound %.3f cells, window %d)",
                             cum_drift, presorted)
            else:
                cum_drift = 0.0  # this step sorted after its drift
        else:
            (position, velocity, acceleration, potential, u, pk, diag) = (
                integration.step_donated(
                    cfg, integrator, first_call, save_pk,
                    position, velocity, acceleration, potential, u, dyn,
                    np.float32(dt),
                )
            )
        if profile_cm is not None:
            float(jnp.sum(position[:1]))  # barrier inside the trace window
            profile_cm.__exit__(None, None, None)
        if save_pk:
            _write_pk(pk, param)
        max_abs_acc = float(diag.max_abs_acc)
        max_abs_vel = float(diag.max_abs_vel)
        # the diag fetch above synchronises the device, so this is a true
        # per-step wall time (dispatch alone would be async)
        logging.info("step wall time: %.1f ms", 1e3 * (perf_counter() - t_step0))
        _handle_overflow(
            param, int(diag.overflow),
            "lazy re-binning drift-bound violation (particles outside the "
            "widened windows)" if lazy
            else "dense particle engine plane-capacity overflow",
        )
        if cfg.theory == "fr" and param["nsteps"] % 10 == 0:
            logging.info(
                "mean(u_scalaron)=%s (should stay close to 1)",
                float(diag.mean_additional),
            )

        if (param["nsteps"] % int(param["n_reorder"]) == 0
                and cfg.particle_engine not in ("dense", "pallas")):
            # dense/pallas engines re-sort every force evaluation already
            logging.info("Reordering particles")
            position, velocity, acceleration = mesh_ops.reorder_particles(
                position, velocity, acceleration
            )
        if param["write_snapshot"]:
            pos_np, vel_np = solver_mod.particles_to_rows(
                cfg, position, velocity
            )
            iostream.write_snapshot_particles(pos_np, vel_np, param)
            param["i_snap"] = int(param["i_snap"]) + 1
        logging.warning(
            "nsteps=%d aexp=%.6f z=%.4f",
            param["nsteps"], param["aexp"], 1.0 / param["aexp"] - 1,
        )


def _run_replicated(param, tables, cfg, integrator, pk_mode, position,
                    velocity, z_out) -> None:
    """Replicated-grid run loop: particles sharded over every attached
    device, field grids replicated (parallel/pm.py) -- one psum of the
    deposited density per force evaluation, everything else local. The
    right mode when the grid fits per chip and particle work dominates;
    ``parallel_mode = slab`` shards the grids too."""
    from .parallel import pm as par_pm

    mesh = par_pm.make_mesh()
    n_dev = mesh.devices.size
    logging.warning("replicated-grid mode: %d devices, %d particles each",
                    n_dev, cfg.npart // n_dev)
    if cfg.particle_engine == "pallas":
        from .ops import pallas_pm

        position, velocity = pallas_pm.to_columns_host(
            np.asarray(position), np.asarray(velocity), cfg.npart
        )
    elif cfg.npart % n_dev:
        raise ValueError(
            f"npart={cfg.npart} must split evenly over {n_dev} devices "
            "for parallel_mode='replicated' with a row-layout engine"
        )
    phi0, u0 = solver_mod.empty_fields(cfg)
    acc0 = jnp.zeros_like(jnp.asarray(position, jnp.float32))
    state = par_pm.shard_state(
        mesh, jnp.asarray(position, jnp.float32),
        jnp.asarray(velocity, jnp.float32), acc0, phi0, u0,
    )

    step_fns = {}

    def step_fn(save_pk, first_call=False):
        key = (save_pk, first_call)
        if key not in step_fns:
            step_fns[key] = par_pm.make_sharded_step(
                cfg, mesh, integrator, first_call=first_call,
                save_pk=save_pk,
            )
        return step_fns[key]

    dyn = solver_mod.compute_dynamics(param)
    save_pk_first = pk_mode == "yes"
    # first force evaluation: a zero-dt step reduces to deposit ->
    # psum -> solve -> gather
    pos_d, vel_d, acc_d, phi_d, u_d, pk, diag = step_fn(
        save_pk_first, first_call=True
    )(*state, dyn, np.float32(0))
    if save_pk_first:
        _write_pk(pk, param)

    aexp_out = np.sort(1.0 / (np.array(z_out, dtype=np.float64) + 1))
    t_out = np.array([float(tables[1](np.log(a))) for a in aexp_out])
    if "i_snap" not in param:
        param["i_snap"] = 1
    else:
        param["i_snap"] = int(param["i_snap"]) + 1
    max_abs_acc = float(diag.max_abs_acc)
    max_abs_vel = float(diag.max_abs_vel)

    while param["aexp"] < aexp_out[-1]:
        param["nsteps"] = int(param["nsteps"]) + 1
        dt = _advance_time(param, tables, aexp_out, t_out,
                           max_abs_acc, max_abs_vel)
        dyn = solver_mod.compute_dynamics(param)
        save_pk = pk_mode == "yes" or (
            pk_mode == "z_out" and param["write_snapshot"]
        )
        t_step0 = perf_counter()
        pos_d, vel_d, acc_d, phi_d, u_d, pk, diag = step_fn(save_pk)(
            pos_d, vel_d, acc_d, phi_d, u_d, dyn, np.float32(dt)
        )
        if save_pk:
            _write_pk(pk, param)
        max_abs_acc = float(diag.max_abs_acc)
        max_abs_vel = float(diag.max_abs_vel)
        logging.info("step wall time: %.1f ms",
                     1e3 * (perf_counter() - t_step0))
        _handle_overflow(param, int(diag.overflow),
                         "dense particle engine plane-capacity overflow")
        if param["write_snapshot"]:
            pos_np, vel_np = solver_mod.particles_to_rows(
                cfg, pos_d, vel_d
            )
            iostream.write_snapshot_particles(pos_np, vel_np, param)
            param["i_snap"] = int(param["i_snap"]) + 1
        if cfg.theory == "fr" and param["nsteps"] % 10 == 0:
            logging.info(
                "mean(u_scalaron)=%s (should stay close to 1)",
                float(diag.mean_additional),
            )
        logging.warning(
            "nsteps=%d aexp=%.6f z=%.4f",
            param["nsteps"], param["aexp"], 1.0 / param["aexp"] - 1,
        )


def _run_slab(param, tables, cfg, integrator, pk_mode, position, velocity,
              z_out, state=None) -> None:
    """Slab-decomposed run loop: grids AND particles sharded over every
    attached device (parallel/slab.py). Dispatches EVERY theory (newton,
    parametrized, fr n=1/2, mond) and every solver (fft, fft_7pt,
    full_fft, multigrid/FAS via parallel/slab_mg.py); particle engine is
    pallas-only in this mode (slab.py:419-516, tests/test_slab.py).
    ``state`` short-circuits the host-side distribution when the ICs were
    generated sharded on device (parallel/ic_slab.py)."""
    from .parallel import slab

    mesh = slab.make_mesh()
    n_dev = mesh.devices.size
    logging.warning("slab mode: %d devices, %d planes each",
                    n_dev, cfg.ncells_1d // n_dev)
    slack = float(param.get("slab_slack", 1.25))
    if state is None:
        state = slab.distribute_particles(mesh, cfg, position, velocity,
                                          slack)
    step_fns = {}

    def step_fn(save_pk, first_call=False, presorted=False):
        key = (save_pk, first_call, presorted)
        if key not in step_fns:
            step_fns[key] = slab.make_slab_step(
                cfg, mesh, integrator, save_pk=save_pk,
                first_call=first_call, presorted=presorted,
            )
        return step_fns[key]

    dyn = solver_mod.compute_dynamics(param)
    save_pk_first = pk_mode == "yes"
    # first force evaluation: a zero-dt step (kick with acc = 0 and zero
    # drift reduce to deposit -> solve -> gather)
    pos_d, vel_d, acc_d, phi_d, u_d, ts_d, pk, diag = step_fn(
        save_pk_first, first_call=True
    )(*state, dyn, np.float32(0))
    if save_pk_first:
        _write_pk(pk, param)

    # CFL-bounded lazy re-binning (same bound as the single-chip loop):
    # migration + tile sort are skipped while the accumulated drift since
    # the last sort stays under one cell; drift-widened kernels with
    # both-way spill/halo exchange keep the step exact across slabs.
    lazy = bool(param.get("lazy_sort", True))
    w = slab._WIDTH[cfg.mass_scheme]
    # a k-cell drift-widened window needs slabs at least w-1+k planes tall
    max_drift = min(int(cfg.lazy_drift),
                    max(cfg.ncells_1d // n_dev - (w - 1), 0))
    if max_drift < 1:
        lazy = False
    cum_drift = np.inf  # first loop step sorts

    aexp_out = np.sort(1.0 / (np.array(z_out, dtype=np.float64) + 1))
    t_out = np.array([float(tables[1](np.log(a))) for a in aexp_out])
    if "i_snap" not in param:
        param["i_snap"] = 1
    else:
        param["i_snap"] = int(param["i_snap"]) + 1
    max_abs_acc = float(diag.max_abs_acc)
    max_abs_vel = float(diag.max_abs_vel)

    # Proactive capacity re-balancing: slabs inherit the x-density
    # imbalance as structure forms, and the per-shard capacity is a
    # static (compiled) shape -- so instead of stepping until a shard
    # overflows (hard abort, _handle_overflow), watch the per-shard
    # occupancy from the tile starts (free: ts_d is already fetched) and
    # grow the buffers BEFORE any particle is at risk. Growth is pure
    # on-device sentinel padding (slab.grow_capacity: on a sorted step
    # every particle already sits on its owning shard), so a growth
    # event costs only the re-trace the new shapes need anyway.
    headroom = float(param.get("slab_rebalance_headroom", 0.9))
    # scalar on-device reduction (one int per check over the tunnel; a
    # full tile-starts fetch would be ~130 KB/step at 512^3)
    max_count_fn = jax.jit(lambda t: jnp.max(t.reshape(n_dev, -1)[:, -1]))

    def rebalance_if_needed(sorted_step: bool = True):
        nonlocal pos_d, vel_d, acc_d, slack
        if not 0.0 < headroom < 1.0:
            return  # disabled
        if not sorted_step:
            return  # counts only change via migration, i.e. on sorts
        cap = pos_d.shape[1] // n_dev
        max_count = int(max_count_fn(ts_d))
        occ = max_count / cap
        if occ <= headroom:
            return
        slack_new = slack * 1.5
        # capacity is Q-quantized (padded_cols): keep growing until it
        # actually increases, or the check re-triggers every step
        while slab.shard_capacity(cfg.npart, n_dev, slack_new) <= cap:
            slack_new *= 1.5
        logging.warning(
            "slab occupancy %.0f%% of capacity (max shard %d / %d): "
            "re-balancing with slack %.2f -> %.2f (one re-trace)",
            100 * occ, max_count, cap, slack, slack_new,
        )
        slack = slack_new
        param["slab_slack"] = slack  # restarts inherit the grown capacity
        cap_new = slab.shard_capacity(cfg.npart, n_dev, slack)
        pos_d, vel_d, acc_d = slab.grow_capacity(mesh, cap_new)(
            pos_d, vel_d, acc_d
        )
        # ts_d, phi_d, u_d, the drift bound and the acc/vel maxima are
        # all untouched by padding: the next loop step resumes directly.
        step_fns.clear()  # capacity changed: new shapes, new programs

    rebalance_if_needed()

    while param["aexp"] < aexp_out[-1]:
        param["nsteps"] = int(param["nsteps"]) + 1
        dt = _advance_time(param, tables, aexp_out, t_out,
                           max_abs_acc, max_abs_vel)
        dyn = solver_mod.compute_dynamics(param)
        save_pk = pk_mode == "yes" or (
            pk_mode == "z_out" and param["write_snapshot"]
        )
        t_step0 = perf_counter()
        step_bound = (
            max_abs_vel * dt + 0.5 * max_abs_acc * dt * dt
        ) * cfg.ncells_1d
        presorted = (
            _drift_level(cum_drift + step_bound, max_drift) if lazy else 0
        )
        if save_pk and not solver_mod.widened_deposit_exact(cfg):
            # sort only when the widened-pass mode lowers the DEPOSIT
            # precision (see the single-device loop)
            presorted = 0
        pos_d, vel_d, acc_d, phi_d, u_d, ts_d, pk, diag = step_fn(
            save_pk, presorted=presorted
        )(pos_d, vel_d, acc_d, phi_d, u_d, ts_d, dyn, np.float32(dt))
        if presorted:
            cum_drift += step_bound
            logging.info("lazy re-binning: slab sort skipped "
                         "(drift bound %.3f cells, window %d)",
                         cum_drift, presorted)
        else:
            cum_drift = 0.0
        if save_pk:
            _write_pk(pk, param)
        max_abs_acc = float(diag.max_abs_acc)
        max_abs_vel = float(diag.max_abs_vel)
        logging.info("step wall time: %.1f ms",
                     1e3 * (perf_counter() - t_step0))
        _handle_overflow(
            param, int(diag.overflow),
            "slab lazy re-binning drift-bound violation" if presorted
            else "slab particle capacity overflow",
        )
        rebalance_if_needed(sorted_step=not presorted)
        if param["write_snapshot"]:
            pos_np, vel_np = slab.gather_particles(
                cfg, n_dev, pos_d, vel_d
            )
            iostream.write_snapshot_particles(pos_np, vel_np, param)
            param["i_snap"] = int(param["i_snap"]) + 1
        if cfg.theory == "fr" and param["nsteps"] % 10 == 0:
            logging.info(
                "mean(u_scalaron)=%s (should stay close to 1)",
                float(diag.mean_additional),
            )
        logging.warning(
            "nsteps=%d aexp=%.6f z=%.4f",
            param["nsteps"], param["aexp"], 1.0 / param["aexp"] - 1,
        )


def run_paired(param) -> None:
    """Paired-and-fixed convenience driver: run both phases of a
    fixed-amplitude pair (phase shift pi, Angulo & Pontzen 2016) and write
    phase-averaged power spectra.

    The reference exposes ``fixed_ICS``/``paired_ICS`` but leaves running
    and averaging the pair to the user (README.md fixed/paired keys); this
    drives both runs into ``base/pair_A`` and ``base/pair_B`` and averages
    each matching P(k) output into ``base/power``.
    """
    if isinstance(param, Dict) and not isinstance(param, Params):
        param = params_from_dict(param)
    param = with_defaults(param)
    base = str(param["base"]).rstrip("/")
    for tag, paired in (("pair_A", False), ("pair_B", True)):
        sub = dict(param)
        sub["base"] = f"{base}/{tag}"
        sub["fixed_ICS"] = True
        sub["paired_ICS"] = paired
        run(sub)

    import glob

    os.makedirs(f"{base}/power", exist_ok=True)
    pks_a = sorted(glob.glob(f"{base}/pair_A/power/pk_*.dat"))
    for pk_a in pks_a:
        pk_b = pk_a.replace("/pair_A/", "/pair_B/")
        if not os.path.exists(pk_b):
            continue
        a = np.loadtxt(pk_a)
        b = np.loadtxt(pk_b)
        avg = a.copy()
        avg[:, 1] = 0.5 * (a[:, 1] + b[:, 1])
        avg[:, 2] = a[:, 2] + b[:, 2]
        out = f"{base}/power/{os.path.basename(pk_a)}"
        header = "k [h/Mpc]  P(k) [Mpc/h]^3 (pair-averaged)  Nmodes (sum)"
        np.savetxt(out, avg, header=header)
        logging.warning("Write pair-averaged P(k) in %s", out)


def main() -> None:
    import argparse

    from .utils.config import read_param_file

    parser = argparse.ArgumentParser(description="pysco-tpu N-body runner")
    parser.add_argument("-c", "--config_file", required=True)
    args = parser.parse_args()
    param = read_param_file(args.config_file)
    print(param)
    t_start = perf_counter()
    run(param)
    t_end = perf_counter()
    print(f"Simulation run time: {t_end - t_start} seconds.")


if __name__ == "__main__":
    main()
