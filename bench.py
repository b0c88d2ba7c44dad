"""Benchmark: PM steps/sec on the flagship configurations.

The headline metric (BASELINE.json) is PM steps/sec at 256^3 (Newton,
CIC + FFT). It is measured FIRST and printed immediately as a complete
JSON line; extras (512^3, f(R), lazy modes, per-component timings) are
then appended in priority order under a global wall-clock budget
(BENCH_BUDGET_S, default 2100 s) and the full table is printed as the
FINAL JSON line -- so a driver timeout can only ever cost the lowest-
priority extras, never the headline. A persistent XLA compilation cache
(~/.cache/pysco_tpu/xla_cache, shared with pysco_tpu.run(), prewarmed)
removes the ~4 min/config compile cost on reruns.

Baseline honesty: the actual reference (PySCo, Numba/LLVM multithreaded
CPU) cannot run in this image (numba/astropy/pyfftw are not installed,
zero egress) and this host exposes a SINGLE CPU core, so no multithreaded
stand-in is measurable either. The recorded baseline is a vectorised
float32 NumPy implementation of the identical PM step on this host
(np.bincount deposit, pocketfft Poisson, 5-pt stencil, fancy-index
gather). `vs_baseline` is measured against that stand-in; the JSON also
carries `vs_estimated_32core_reference` = vs_baseline / 32, a conservative
derating that assumes the real Numba reference would scale perfectly to a
32-core node. Methodology: BENCH_NOTES.md.
"""

import json
import os
import time

import numpy as np

NCOARSE = 8  # 256^3 grid headline
NPART = 256 ** 3
WARMUP = 3
ITERS = 10
ASSUMED_REFERENCE_CORES = 32

# Global wall-clock budget (seconds). The driver runs bench.py under a
# ~2400 s timeout; rather than lose everything when it fires (round 2:
# rc 124, parsed null), the headline is measured and printed FIRST, and
# every further config is gated on the remaining budget ("skipped
# (budget)"). Default 2100 leaves ~300 s of slack for the device probe,
# imports and the final table write under the driver's timeout. (The
# round-3 default of 900 was the binding constraint that budget-skipped
# every 512^3 row in the driver capture.)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2100"))
# Per-task wall cap for isolated subprocess tasks. The axon server
# intermittently stalls a client for 20-30 min (observed 2026-08-21:
# a warm f(R) FAS task that normally runs in ~4 min wedged for 28 and
# starved every later task); with the cap a wedged task costs ONE row,
# not the table. 700 s is ~2-3x the warm cost of the heaviest task --
# only a fully cold FAS compile would legitimately exceed it, and the
# driver runs against the prewarmed persistent cache.
PER_TASK_S = float(os.environ.get("BENCH_TASK_CAP_S", "700"))
_T0 = time.perf_counter()


def _remaining() -> float:
    return BUDGET_S - (time.perf_counter() - _T0)


def _setup_compile_cache():
    """Persistent XLA compilation cache (verified to work on the axon
    backend: 22.5 s -> 3.6 s on a rerun). Compile time dominates every
    config (~230 s cold for the 256^3 headline vs ~2 s of measured
    steps), so a prewarmed cache is what makes the full table fit any
    realistic driver budget.

    The cache lives in the per-user directory shared with pysco_tpu.run()
    (~/.cache/pysco_tpu/xla_cache) so a `git clean` of the repo between
    sessions cannot evict it. BENCH_JAX_CACHE has the same semantics as
    the `compile_cache` param key (utils/compile_cache.py): a path
    overrides the location, '0'/'no'/'off' disables the cache entirely,
    and 'yes'/'1'/'on'/empty keep the PYSCO_TPU_JAX_CACHE/per-user
    default."""
    from pysco_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.environ.get("BENCH_JAX_CACHE"))


def _device_state(npart, seed=0):
    """Column-layout (4, N_up) random state, built on-device (the tunnel
    makes host uploads slow and the column layout avoids holding both
    particle layouts in HBM during the first force evaluation)."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from pysco_tpu.ops import pallas_pm

    n_up = pallas_pm.padded_cols(npart)

    @jax.jit
    def build():
        k = jr.PRNGKey(seed)
        pos = jr.uniform(k, (4, n_up), jnp.float32)
        pos = pos.at[3].set(0.0)
        if n_up > npart:
            pos = pos.at[:3, npart:].set(pallas_pm.SENTINEL)
        vel = 0.01 * jr.normal(jr.fold_in(k, 1), (4, n_up), jnp.float32)
        vel = vel.at[3].set(0.0)
        if n_up > npart:
            vel = vel.at[:, npart:].set(0.0)
        return pos, vel

    return build()


def _sync(x):
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    # block_until_ready is asynchronous on the axon tunnel backend; a value
    # fetch is the only reliable barrier. No ravel: relayout copies of
    # (N, 3) arrays lane-pad 3 -> 128.
    return float(jnp.sum(leaves[0][:1].astype(jnp.float32)))


def bench_config(ncoarse, npart, scheme, theory, solver_name, iters=ITERS,
                 warmup=WARMUP, extra_param=None):
    """Steps/sec for one configuration on the attached TPU chip."""
    import jax.numpy as jnp  # noqa: F401
    from pysco_tpu import integrate, solver as solver_mod

    param = _param_dict(ncoarse, npart, scheme, theory, solver_name,
                        extra_param)
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    pos, vel = _device_state(npart)
    phi, u = solver_mod.empty_fields(cfg)
    pos, vel, acc, phi, u, _, _ = solver_mod.pm_donated(
        cfg, True, False, pos, vel, phi, u, dyn
    )
    _sync(acc)

    dt = np.float32(1e-3)
    state = (pos, vel, acc, phi, u)

    def step(state):
        out = integrate.step_donated(
            cfg, "leapfrog", False, False, *state, dyn, dt
        )
        return out[:5]

    for _ in range(warmup):
        state = step(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    _sync(state)
    steps_per_sec = iters / (time.perf_counter() - t0)
    del state
    return steps_per_sec


def _run_isolated(expr: str, timeout_s: float):
    """Evaluate ``expr`` (a bench.* call returning something JSON-able)
    in a FRESH subprocess and return the parsed result.

    The two 512^3 tail tasks need most of HBM; after a full bench
    session the long-lived process cannot free every lingering buffer
    (jit-cache constants, donation aliases) and they die with
    RESOURCE_EXHAUSTED even though each succeeds standalone. A fresh
    process is the only reliable full-HBM reset; the persistent compile
    cache keeps the subprocess compiles cheap."""
    import subprocess
    import sys

    code = (
        "import json, bench\n"
        "bench._setup_compile_cache()\n"
        f"print('@@RESULT@@' + json.dumps({expr}), flush=True)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=max(timeout_s, 60), capture_output=True, text=True,
    )
    for line in reversed(r.stdout.splitlines()):
        if line.startswith("@@RESULT@@"):
            return json.loads(line[len("@@RESULT@@"):])
    tail = (r.stderr or r.stdout or "").strip().splitlines()
    raise RuntimeError(
        f"isolated task rc={r.returncode}: {' | '.join(tail[-3:])[:200]}"
    )


def bench_components(ncoarse=None, npart=None, scheme="tsc", iters=3):
    """Per-component timings (ms) on the TPU (default 256^3 TSC)."""
    from pysco_tpu import solver as solver_mod
    from pysco_tpu.utils.profiling import component_breakdown

    param = {
        "theory": "newton", "ncoarse": ncoarse or NCOARSE,
        "npart": npart or NPART,
        "mass_scheme": scheme, "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 1, "mond_function": "simple", "mond_alpha": 1.0,
        "aexp": 0.1, "Om_m": 0.25733, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    # no local refs to the (4, N) state: component_breakdown frees the
    # unsorted copy after the sort stage (needed to fit 512^3 in HBM)
    return component_breakdown(cfg, *_device_state(param["npart"]), dyn,
                               iters=iters)


def _cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt):
    """Vectorised NumPy float32 reference step (CIC + FFT + 5pt + gather)."""
    half = np.float32(0.5 * dt)
    vel = vel - acc * half
    pos = pos + vel * np.float32(dt)
    pos -= np.floor(pos)

    xs = pos * np.float32(n)
    ijk = np.minimum(xs.astype(np.int32), n - 1)
    d = xs - np.float32(0.5) - ijk.astype(np.float32)
    sign = np.sign(d).astype(np.int32)
    absd = np.abs(d)
    i2 = (ijk + sign) % n
    w1, w2 = np.float32(1) - absd, absd
    grid = np.zeros(n ** 3, dtype=np.float32)
    for bx in range(2):
        ci = (i2 if bx else ijk)[:, 0]
        wi = (w2 if bx else w1)[:, 0]
        for by in range(2):
            cj = (i2 if by else ijk)[:, 1]
            wj = (w2 if by else w1)[:, 1]
            for bz in range(2):
                ck = (i2 if bz else ijk)[:, 2]
                wk = (w2 if bz else w1)[:, 2]
                # bincount is the fastest portable CPU scatter-add
                grid += np.bincount(
                    (ci * n + cj) * n + ck,
                    weights=(wi * wj * wk).astype(np.float64),
                    minlength=n ** 3,
                ).astype(np.float32)
    grid = grid.reshape(n, n, n)
    grid *= np.float32(n ** 3 / pos.shape[0])

    rhs = np.float32(1.5 * aexp * om_m) * (grid - np.float32(1))
    rhs_k = np.fft.rfftn(rhs)
    kf = ((np.arange(n) + n // 2) % n - n // 2).astype(np.float32)
    kx, ky = kf[:, None, None], kf[None, :, None]
    kz = np.arange(n // 2 + 1, dtype=np.float32)[None, None, :]
    k2 = kx ** 2 + ky ** 2 + kz ** 2
    k2[0, 0, 0] = 1
    h = np.float32(1.0 / n)
    w = np.sinc(kx * h) * np.sinc(ky * h) * np.sinc(kz * h)
    phi_k = rhs_k * (w ** -4 * np.float32(-0.25 / np.pi ** 2) / k2)
    phi_k[0, 0, 0] = 0
    phi = np.fft.irfftn(phi_k, s=(n, n, n), axes=(0, 1, 2)).astype(np.float32)

    force = np.empty((n, n, n, 3), dtype=np.float32)
    for ax in range(3):
        force[..., ax] = np.float32(n / 12.0) * (
            8 * (np.roll(phi, -1, ax) - np.roll(phi, 1, ax))
            + np.roll(phi, 2, ax) - np.roll(phi, -2, ax)
        )
    fflat = force.reshape(-1, 3)
    acc_new = np.zeros_like(pos)
    for bx in range(2):
        ci = (i2 if bx else ijk)[:, 0]
        wi = (w2 if bx else w1)[:, 0]
        for by in range(2):
            cj = (i2 if by else ijk)[:, 1]
            wj = (w2 if by else w1)[:, 1]
            for bz in range(2):
                ck = (i2 if bz else ijk)[:, 2]
                wk = (w2 if bz else w1)[:, 2]
                acc_new += (wi * wj * wk)[:, None] * fflat[(ci * n + cj) * n + ck]
    vel = vel - acc_new * half
    return pos, vel, acc_new


def _c05_pattern(max_drift: int):
    """The honest production drift-level sequence at Courant 0.5: the
    per-step drift bound is ~Courant cells (dt = Courant*dx/max|v| =>
    bound = max|v|*dt = Courant*dx), so replay main._drift_level at 0.5
    cells/step. max_drift=2 -> [0,1,2,2] (sort every 4th step);
    max_drift=3 -> [0,1,2,2,3,3] (every 6th)."""
    from pysco_tpu.main import _drift_level

    cum, seq = 0.0, []
    for _ in range(64):
        lvl = _drift_level(cum + 0.5, max_drift)
        seq.append(lvl)
        cum = cum + 0.5 if lvl else 0.0
        if len(seq) > 1 and lvl == 0:
            break
    i = seq.index(0) if 0 in seq else 0
    return seq[i:] + seq[:i]


def bench_lazy(scheme="cic", iters_outer=4, ncoarse=None, npart=None,
               theory="newton", solver_name="fft", extra_param=None):
    """Lazy re-binning step rates: sort skipped every step (the
    early-epoch regime, drift bound << 1 cell), sort-every-2nd
    (lazy_drift=1), and the production Courant-0.5 cadence (the
    _c05_pattern drift-level sequence for the config's lazy_drift)."""
    import jax.numpy as jnp
    from pysco_tpu import integrate, solver as solver_mod

    ncoarse = ncoarse or NCOARSE
    npart = npart or NPART
    param = _param_dict(ncoarse, npart, scheme, theory, solver_name,
                        extra_param)
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    pos, vel = _device_state(npart)
    phi, u = solver_mod.empty_fields(cfg)
    pos, vel, acc, phi, u, _, _ = solver_mod.pm_donated(
        cfg, True, False, pos, vel, phi, u, dyn
    )
    _sync(acc)
    from pysco_tpu.ops import pallas_pm

    m = 2 ** ncoarse
    tstarts = jnp.zeros(pallas_pm.n_tiles(m) + 1, jnp.int32)
    state = (pos, vel, acc, phi, u, tstarts)
    dt = np.float32(1e-3)
    c05 = _c05_pattern(cfg.lazy_drift)

    def lstep(state, presorted):
        out = integrate.step_lazy(cfg, "leapfrog", presorted, False,
                                  *state, dyn, dt)
        return out[:6]

    state = lstep(state, 0)
    for level in sorted(set(c05) | {1}):
        if level:
            state = lstep(state, level)
    _sync(state)
    out = {}
    def time_leg(pattern):
        nonlocal state
        state = lstep(state, False)
        _sync(state)
        t0 = time.perf_counter()
        iters = 0
        for _ in range(iters_outer):
            for p in pattern:
                state = lstep(state, p)
                iters += 1
        _sync(state)
        return round(iters / (time.perf_counter() - t0), 3)

    for label, pattern in (("skip", [1]), ("alt", [0, 1]),
                           ("c05", c05)):
        out[label] = time_leg(pattern)
    # A c05 rate far below alternating flags a transient chip-side stall
    # (an overlapping server compile was observed to produce exactly
    # this once, 2026-08-20: 0.215 vs 0.701 reproduced in isolation).
    # Re-measure ONCE on the already-warm programs and keep the fresh
    # value, recording the first reading as c05_first so the artifact
    # shows when a retry happened (ADVICE r4: no silent max()).
    if out["c05"] < 0.8 * out["alt"]:
        out["c05_first"] = out["c05"]
        out["c05"] = time_leg(c05)
    del state
    return out


def _param_dict(ncoarse, npart, scheme, theory, solver_name, extra=None):
    param = {
        "theory": theory, "ncoarse": ncoarse, "npart": npart,
        "mass_scheme": scheme, "linear_newton_solver": solver_name,
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "fR_n": 2 if theory == "fr_n2" else 1, "fR_logfR0": 5.0,
        "mond_function": "simple", "mond_alpha": 1.0,
        "mond_g0": 1.2, "mond_scale_factor_exponent": 0.0,
        "parametrized_mu0": 0.1, "aexp": 0.1, "Om_m": 0.25733,
        "Om_lambda": 0.74267, "Om_r": 0.0, "w0": -1.0, "wa": 0.0,
        "unit_l": 3085.0, "unit_t": 1e10, "epsrel": 1e-2,
        "particle_engine": "pallas",
    }
    if theory == "fr_n2":
        param["theory"] = "fr"
    if extra:
        param.update(extra)
    return param


def _slab_d1_state(cfg, npart, slack=1.0, seed=0):
    """On-device slab column state for ONE shard (D=1: every particle is
    local, so the host-side distribute_particles pass -- and its multi-GB
    tunnel upload at 512^3 -- is unnecessary).

    slack=1.0 (not the production 1.25): at D=1 migration is an
    identity, so capacity overflow is impossible, and the probe should
    isolate the distribution MACHINERY (pencil-FFT transposes, halo and
    migration ppermutes) -- the single-chip baseline it is compared to
    carries no pad either. The 1.25 pad also does not fit HBM next to
    the f(R) scalaron grid at 512^3 (measured RESOURCE_EXHAUSTED,
    2026-08-20); sentinel pad columns are range-masked out of the tile
    kernels anyway, so the production-slack cost at D=8 is minor."""
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from pysco_tpu.ops import pallas_pm
    from pysco_tpu.parallel import slab

    cap = slab.shard_capacity(npart, 1, slack)
    m = cfg.ncells_1d

    @jax.jit
    def build():
        k = jr.PRNGKey(seed)
        pos = jr.uniform(k, (4, cap), jnp.float32)
        pos = pos.at[3].set(0.0)
        if cap > npart:
            pos = pos.at[:3, npart:].set(pallas_pm.SENTINEL)
        vel = 0.01 * jr.normal(jr.fold_in(k, 1), (4, cap), jnp.float32)
        vel = vel.at[3].set(0.0)
        if cap > npart:
            vel = vel.at[:, npart:].set(0.0)
        return pos, vel

    pos, vel = build()
    acc = jnp.zeros_like(pos)
    phi = jnp.zeros((m, m, m), jnp.float32)
    if cfg.theory in ("fr", "mond"):
        u = jnp.zeros((m, m, m), jnp.float32)
    else:
        u = jnp.zeros((1, 1, 1), jnp.float32)
    ts = jnp.zeros((pallas_pm.n_tiles(m, m) + 1,), jnp.int32)
    return pos, vel, acc, phi, u, ts


def bench_dist_d1(mode, ncoarse, npart, scheme="cic", theory="newton",
                  solver_name="fft", iters=4, warmup=2, slack=1.0):
    """Distribution-mode step rate on ONE device (VERDICT r4 item 1).

    At D=1 every collective is an identity (the pencil-FFT all_to_alls,
    halo/migration ppermutes and deposit psums still run, over a
    single-shard mesh), so (single-chip rate) / (this rate) - 1 is a
    direct measurement of the distribution machinery's overhead -- the
    only scaling evidence obtainable on a one-chip image. mode is
    "slab" (grids AND particles sharded, parallel/slab.py) or
    "replicated" (particles sharded, grids replicated, parallel/pm.py).
    """
    import jax.numpy as jnp
    from pysco_tpu import solver as solver_mod

    param = _param_dict(ncoarse, npart, scheme, theory, solver_name)
    cfg = solver_mod.config_from_param(param)
    dyn = solver_mod.compute_dynamics(param)
    dt = np.float32(1e-3)
    if mode == "slab":
        from pysco_tpu.parallel import slab

        mesh = slab.make_mesh(1)
        state = _slab_d1_state(cfg, npart, slack)
        first = slab.make_slab_step(cfg, mesh, "leapfrog",
                                    first_call=True, donate=True)
        state = first(*state, dyn, np.float32(0))[:6]
        _sync(state)
        step = slab.make_slab_step(cfg, mesh, "leapfrog", donate=True)

        def do(state):
            return step(*state, dyn, dt)[:6]
    elif mode == "replicated":
        from pysco_tpu.parallel import pm as par_pm

        mesh = par_pm.make_mesh(1)
        pos, vel = _device_state(npart)
        phi, u = solver_mod.empty_fields(cfg)
        sharded = par_pm.shard_state(mesh, pos, vel, jnp.zeros_like(pos),
                                     phi, u)
        first = par_pm.make_sharded_step(cfg, mesh, "leapfrog",
                                         first_call=True)
        state = first(*sharded, dyn, np.float32(0))[:5]
        _sync(state)
        step = par_pm.make_sharded_step(cfg, mesh, "leapfrog")

        def do(state):
            return step(*state, dyn, dt)[:5]
    else:
        raise ValueError(mode)

    for _ in range(warmup):
        state = do(state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = do(state)
    _sync(state)
    steps_per_sec = iters / (time.perf_counter() - t0)
    del state
    return steps_per_sec


def bench_ic_device(ncoarse=9, order="2LPT") -> float:
    """Wall-clock seconds for on-device LPT IC generation (default 512^3
    2LPT): host reference-exact white-noise draw + upload + all spectral
    LPT algebra on the chip (pysco_tpu/ic_device.py). Snapshot write is
    skipped (the tunnelled device->host copy would dwarf generation)."""
    import tempfile

    from pysco_tpu import cosmo, ic_device

    base = tempfile.mkdtemp(prefix="bench_ic_")
    pk_file = os.path.join(base, "pk.dat")
    cosmo.write_power_spectrum_table(pk_file)
    npart = (2 ** ncoarse) ** 3
    param = {
        "theory": "newton", "H0": 72.0, "Om_m": 0.25733, "T_cmb": 2.726,
        "N_eff": 3.044, "w0": -1.0, "wa": 0.0, "boxlen": 500.0,
        "ncoarse": ncoarse, "npart": npart, "z_start": 49.0, "seed": 42,
        "position_ICS": "center", "fixed_ICS": False, "paired_ICS": False,
        "dealiased_ICS": False, "power_spectrum_file": pk_file,
        "initial_conditions": order, "base": base, "extra": "bench",
        "output_snapshot_format": "parquet", "aexp": 1.0 / 50.0,
        "particle_engine": "pallas", "write_initial_snapshot": False,
        "mass_scheme": "cic", "linear_newton_solver": "fft",
        "gradient_stencil_order": 5, "Npre": 2, "Npost": 1,
        "epsrel": 1e-2,
    }
    from pysco_tpu.utils.units import set_units

    set_units(param)
    tables = cosmo.generate(param)
    assert ic_device.supported(param)
    t0 = time.perf_counter()
    pos, vel = ic_device.generate_lpt(param, tables)
    _sync(pos)
    dt = time.perf_counter() - t0
    del pos, vel
    return dt


def bench_cpu_baseline() -> float:
    n = 2 ** NCOARSE
    rng = np.random.default_rng(1)
    pos = rng.random((NPART, 3), dtype=np.float32)
    vel = (0.01 * rng.standard_normal((NPART, 3))).astype(np.float32)
    acc = np.zeros_like(pos)
    aexp, om_m, dt = 0.1, 0.25733, 1e-3
    # one warmup + timed iterations (it is slow; 2 iters suffice)
    _cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt)
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        pos, vel, acc = _cpu_pm_step(pos, vel, acc, n, aexp, om_m, dt)
    return iters / (time.perf_counter() - t0)


# (label, ncoarse, npart, scheme, theory, solver, iters) -- consumed by
# the priority-ordered TASK list in main().
CONFIGS = [
    ("newton_cic_fft_512", 9, 512 ** 3, "cic", "newton", "fft", 4),
    ("fr_n1_tsc_multigrid_256", 8, 256 ** 3, "tsc", "fr", "multigrid", 5),
    ("fr_n1_cic_multigrid_512", 9, 512 ** 3, "cic", "fr", "multigrid", 3),
    ("newton_tsc_multigrid_256", 8, 256 ** 3, "tsc", "newton", "multigrid",
     ITERS),
    ("newton_tsc_fft_256", 8, 256 ** 3, "tsc", "newton", "fft", ITERS),
    ("parametrized_tsc_fft_256", 8, 256 ** 3, "tsc", "parametrized", "fft",
     ITERS),
    ("mond_tsc_multigrid_256", 8, 256 ** 3, "tsc", "mond", "multigrid", 5),
    ("fr_n2_tsc_multigrid_256", 8, 256 ** 3, "tsc", "fr_n2", "multigrid", 5),
]


def _load_cpu_baseline() -> float:
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_cpu_baseline.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["steps_per_sec"]
    baseline = bench_cpu_baseline()
    with open(cache, "w") as f:
        json.dump({"steps_per_sec": baseline,
                   "config": "newton CIC fft 256^3 numpy-f32"}, f)
    return baseline


def _load_cpu_baseline_512():
    """Directly measured 512^3 single-core stand-in, if available
    (tools/cpu_baseline_512.py). Returns None when never measured; the
    512^3 vs_baseline then falls back to the 8x-volume extrapolation of
    the 256^3 number (and says so)."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_cpu_baseline_512.json")
    if os.path.exists(cache):
        with open(cache) as f:
            return json.load(f)["steps_per_sec"]
    return None


def _result_dict(value, baseline, extra, components, components_512=None,
                 baseline_512=None):
    out = {
        "metric":
            "PM steps/sec, Newton 256^3 grid + 256^3 particles (CIC+FFT)",
        "value": round(value, 3),
        "unit": "steps/sec",
        "vs_baseline": round(value / baseline, 2),
        "baseline_note": (
            "single-core NumPy float32 stand-in (numba unavailable, host has "
            "1 CPU core); see vs_estimated_32core_reference for a "
            "conservative derating"
        ),
        "vs_estimated_32core_reference": round(
            value / baseline / ASSUMED_REFERENCE_CORES, 2
        ),
        "extra_metrics_steps_per_sec": extra,
        "component_ms_256_tsc": components,
        "component_ms_512_cic": components_512 or {"skipped": "budget"},
    }
    # 512^3 north-star ratios against the DIRECTLY measured 512^3
    # single-core stand-in (tools/cpu_baseline_512.py) when it exists --
    # removes the 8x-volume extrapolation link from the vs-reference
    # chain (VERDICT r3 weak item 2).
    if baseline_512:
        out["cpu_baseline_512_steps_per_sec"] = round(baseline_512, 6)
        for row, key in (("newton_cic_fft_512", "vs_baseline_512"),
                         ("newton_cic_fft_512_lazy_courant05",
                          "vs_baseline_512_courant05"),
                         ("fr_n1_cic_multigrid_512", "vs_baseline_512_fr")):
            v = extra.get(row)
            if isinstance(v, (int, float)):
                out[key] = round(v / baseline_512, 2)
                out[key + "_est_32core"] = round(
                    v / baseline_512 / ASSUMED_REFERENCE_CORES, 2)
    # Distribution overhead + v5e-8 projection from the D=1 slab rows:
    # overhead = 1 - slab_D1/single (identity collectives, same chip);
    # the projection assumes per-device work scales 1/D (shape-proven,
    # tests/test_1024_shapes.py) and EXCLUDES real-ICI collective cost,
    # which this image cannot measure -- stated in BENCH_NOTES.md.
    for size, base_row, slab_row in (
            ("512", "newton_cic_fft_512", "newton_cic_fft_512_slab1"),
            ("512_fr", "fr_n1_cic_multigrid_512",
             "fr_n1_cic_multigrid_512_slab1"),
            ("256", "newton_cic_fft_256", "newton_cic_fft_256_slab1")):
        b, s = extra.get(base_row), extra.get(slab_row)
        if isinstance(b, (int, float)) and isinstance(s, (int, float)):
            out[f"slab_d1_overhead_{size}"] = round(1 - s / b, 3)
            out[f"projected_v5e8_{size}_steps_per_sec"] = round(8 * s, 3)
    # production-cadence projection: prefer the PRODUCTION-slack D=1
    # rate (embeds the per-shard capacity pad cost at eager weighting --
    # conservative, since the pad hits mainly the sort, amortised /6 at
    # the cadence); the D=1 rows are EAGER rates, so scale by the
    # measured single-chip c05/eager ratio (the slab loop runs the same
    # lazy cadence)
    s10 = extra.get("newton_cic_fft_512_slab1")
    sprod = extra.get("newton_cic_fft_512_slab1_prodslack")
    s_proj = sprod if isinstance(sprod, (int, float)) else s10
    eag = extra.get("newton_cic_fft_512")
    c05 = extra.get("newton_cic_fft_512_lazy_courant05")
    if (isinstance(s_proj, (int, float)) and baseline_512
            and isinstance(eag, (int, float))
            and isinstance(c05, (int, float))):
        proj_c05 = 8 * s_proj * c05 / eag
        out["projected_v5e8_512_courant05_steps_per_sec"] = round(
            proj_c05, 3)
        out["projected_v5e8_512_vs_baseline_est_32core"] = round(
            proj_c05 / baseline_512 / ASSUMED_REFERENCE_CORES, 2)
    return out


def _lazy_rows(prefix, scheme="cic", **kwargs):
    """Lazy-cadence rows as a dict (JSON-able: usable via _run_isolated)."""
    lz = bench_lazy(scheme, **kwargs)
    out = {f"{prefix}_lazy_skip": lz["skip"],
           f"{prefix}_lazy_alternating": lz["alt"],
           f"{prefix}_lazy_courant05": lz["c05"]}
    if "c05_first" in lz:  # stall-triggered retry happened: show both
        out[f"{prefix}_lazy_courant05_first"] = lz["c05_first"]
    return out


def _lazy_task(extra, prefix, scheme="cic", **kwargs):
    extra.update(_lazy_rows(prefix, scheme, **kwargs))


def _probe_tpu() -> bool:
    """Bounded liveness check for the tunnelled TPU backend.

    Device discovery on the axon backend HANGS (not errors) when the
    tunnel is down; an unguarded ``jax.devices()`` would then eat the
    whole driver budget and yield no output at all (round 2 failure
    mode). Probe in a subprocess with a hard timeout instead."""
    import subprocess
    import sys

    probe_s = float(os.environ.get("BENCH_TPU_PROBE_S", "240"))
    tries = int(os.environ.get("BENCH_TPU_PROBE_TRIES", "4"))
    # Retry: a freshly killed client elsewhere leaves a server-side
    # orphan that wedges new clients for up to ~30 min (2026-08-21);
    # the server recovers on its own, so waiting through a few probe
    # windows turns a would-be zero-value run into a full capture.
    # Worst case 4 x 240 s = 16 min against the 2100 s budget; the
    # task gating then simply captures fewer rows.
    for i in range(max(tries, 1)):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "d = jax.devices(); "
                 "v = float(jnp.sum(jnp.arange(8.0))); "
                 "print(d[0].platform, len(d), v)"],
                timeout=probe_s, capture_output=True, text=True,
            )
            if r.returncode == 0 and "tpu" in r.stdout.lower():
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def main():
    if not _probe_tpu():
        # Honest, parseable failure: the chip is unreachable, so there
        # are no TPU numbers to report this run. Printing a complete
        # JSON line (value 0) beats a silent hang-then-timeout.
        print(json.dumps({
            "metric": ("PM steps/sec, Newton 256^3 grid + 256^3 particles "
                       "(CIC+FFT)"),
            "value": 0.0,
            "unit": "steps/sec",
            "vs_baseline": 0.0,
            "error": ("TPU backend unreachable (device discovery timed "
                      "out); no measurements possible this run -- see "
                      "BENCH_NOTES.md for the last captured numbers"),
        }), flush=True)
        return

    _setup_compile_cache()
    import pysco_tpu  # noqa: F401

    baseline = _load_cpu_baseline()  # cached file in normal operation
    baseline_512 = _load_cpu_baseline_512()  # None until measured once

    # --- headline FIRST, printed the moment it exists -----------------
    t_cfg = time.perf_counter()
    value = bench_config(8, 256 ** 3, "cic", "newton", "fft",
                         iters=ITERS, warmup=WARMUP)
    cost_256 = time.perf_counter() - t_cfg  # compile-dominated estimate

    extra = {"newton_cic_fft_256": round(value, 3)}
    components = {"skipped": "budget"}
    components_512 = {"skipped": "budget"}
    print(json.dumps(_result_dict(value, baseline, extra, components)),
          flush=True)

    # --- extras in PRIORITY order, each gated on remaining budget -----
    # Cost model: each task is compile-dominated; scale the observed
    # headline cost (512^3 programs compile similarly but step ~8x
    # slower; a lazy block compiles 3-4 step variants). After EVERY
    # completed task the full cumulative table is reprinted, so a driver
    # timeout only ever costs the tasks not yet run (the last complete
    # JSON line wins). Keep a 30 s reserve for the final write.
    def est_cost(nc, programs=1, key=""):
        # multigrid/FAS programs compile several times slower than the
        # Newton-FFT headline the estimate scales from (measured ~9 min
        # for one f(R) FAS step program at 64^3 on this toolchain)
        theory_mult = 3.0 if ("fr_" in key or "mond" in key) else (
            1.5 if "multigrid" in key else 1.0
        )
        return (cost_256 * (1.6 if nc > 8 else 1.2)
                * max(1, 0.6 * programs) * theory_mult)

    def cfg_task(extra_, label, nc, npart, scheme, theory, solver_name,
                 iters, extra_param=None):
        sps = bench_config(nc, npart, scheme, theory, solver_name,
                           iters=iters, warmup=2 if nc > 8 else WARMUP,
                           extra_param=extra_param)
        extra_[label] = round(sps, 3)

    by_label = {c[0]: c for c in CONFIGS}

    def cfg(label):
        c = by_label[label]
        return (label, c[1], 1, lambda e: cfg_task(e, *c))

    def iso(e, label, expr):
        """Run one task in a FRESH subprocess and store its result.

        Every 512^3 task runs isolated: full HBM with zero fragmentation
        from earlier tasks (the round-3 first capture lost every TSC row
        to an OOM cascade after an in-process 512^3 task), and the
        persistent compile cache keeps the subprocess compiles warm."""
        e[label] = _run_isolated(expr, min(_remaining() - 30, PER_TASK_S))

    def iso_update(e, expr):
        e.update(_run_isolated(expr, min(_remaining() - 30, PER_TASK_S)))

    # (first_key, ncoarse, n_programs, fn) in priority order. The
    # BASELINE north-star 512^3 rows (Newton + f(R), eager AND the
    # production Courant-0.5 lazy cadence) come immediately after the
    # headline, each in its own subprocess; then the 256^3 f(R)/lazy
    # rows, then breadth. The OOM-risky tails (512^3 component table,
    # on-device ICs) stay last AND isolated.
    tasks = [
        ("newton_cic_fft_512", 9, 1, lambda e: iso(
            e, "newton_cic_fft_512",
            "round(bench.bench_config(9, 512 ** 3, 'cic', 'newton', "
            "'fft', iters=4, warmup=2), 3)")),
        # production-cadence (c05) north-star rows FIRST, then the f(R)
        # eager row: a per-task stall (see PER_TASK_S) costs the least
        # valuable of the four, not the cadence rows
        ("newton_cic_fft_512_lazy_skip", 9, 4, lambda e: iso_update(
            e, "bench._lazy_rows('newton_cic_fft_512', scheme='cic', "
            "iters_outer=2, ncoarse=9, npart=512 ** 3)")),
        ("fr_n1_cic_multigrid_512_lazy_skip", 9, 4, lambda e: iso_update(
            e, "bench._lazy_rows('fr_n1_cic_multigrid_512', scheme='cic', "
            "iters_outer=2, ncoarse=9, npart=512 ** 3, theory='fr', "
            "solver_name='multigrid')")),
        ("fr_n1_cic_multigrid_512", 9, 3, lambda e: iso(
            e, "fr_n1_cic_multigrid_512",
            "round(bench.bench_config(9, 512 ** 3, 'cic', 'fr', "
            "'multigrid', iters=3, warmup=2), 3)")),
        # 512^3 component table BEFORE the 256^3 breadth (VERDICT r4:
        # the north-star-size breakdown outranks the lazy-variant rows)
        ("components_512", 9, 2, None),  # handled specially below
        # distribution-mode D=1 overhead rows (VERDICT r5 evidence: the
        # slab machinery's cost with identity collectives on the REAL
        # chip; the only scaling evidence a one-chip image can produce)
        ("newton_cic_fft_512_slab1", 9, 1, lambda e: iso(
            e, "newton_cic_fft_512_slab1",
            "round(bench.bench_dist_d1('slab', 9, 512 ** 3, 'cic', "
            "'newton', 'fft', iters=4, warmup=2), 3)")),
        # same row at the PRODUCTION capacity slack (1.25): includes the
        # per-shard sort's pad cost, the conservative projection input
        ("newton_cic_fft_512_slab1_prodslack", 9, 1, lambda e: iso(
            e, "newton_cic_fft_512_slab1_prodslack",
            "round(bench.bench_dist_d1('slab', 9, 512 ** 3, 'cic', "
            "'newton', 'fft', iters=4, warmup=2, slack=1.25), 3)")),
        ("fr_n1_cic_multigrid_512_slab1", 9, 3, lambda e: iso(
            e, "fr_n1_cic_multigrid_512_slab1",
            "round(bench.bench_dist_d1('slab', 9, 512 ** 3, 'cic', "
            "'fr', 'multigrid', iters=3, warmup=2), 3)")),
        ("newton_cic_fft_256_slab1", 8, 1, lambda e: iso(
            e, "newton_cic_fft_256_slab1",
            "round(bench.bench_dist_d1('slab', 8, 256 ** 3, 'cic', "
            "'newton', 'fft', iters=8, warmup=3), 3)")),
        ("newton_cic_fft_256_repl1", 8, 1, lambda e: iso(
            e, "newton_cic_fft_256_repl1",
            "round(bench.bench_dist_d1('replicated', 8, 256 ** 3, 'cic', "
            "'newton', 'fft', iters=8, warmup=3), 3)")),
        # opt-in sorted-pass bf16 gather (pm_precision = "bf16-gather"):
        # adjudicated round 5, kept opt-in (P(k) impact 1.8e-4 would
        # breach the 1e-4 fidelity-golden tolerance as a default); the
        # rows document the measured gain (+6.5% eager 256^3, +3.9%
        # eager / +1.2% production-cadence 512^3)
        ("newton_cic_fft_256_sorted_bf16g", 8, 1, lambda e: cfg_task(
            e, "newton_cic_fft_256_sorted_bf16g", 8, 256 ** 3, "cic",
            "newton", "fft", ITERS,
            extra_param={"pm_precision": "bf16-gather"})),
        ("newton_cic_fft_512_sorted_bf16g", 9, 1, lambda e: iso(
            e, "newton_cic_fft_512_sorted_bf16g",
            "round(bench.bench_config(9, 512 ** 3, 'cic', 'newton', "
            "'fft', iters=4, warmup=2, extra_param={'pm_precision': "
            "'bf16-gather'}), 3)")),
        cfg("fr_n1_tsc_multigrid_256"),
        ("newton_cic_fft_256_lazy_skip", 8, 4,
         lambda e: _lazy_task(e, "newton_cic_fft_256", iters_outer=4)),
        ("fr_n1_tsc_multigrid_256_lazy_skip", 8, 4,
         lambda e: _lazy_task(e, "fr_n1_tsc_multigrid_256", scheme="tsc",
                              iters_outer=3, theory="fr",
                              solver_name="multigrid")),
        cfg("newton_tsc_multigrid_256"),
        ("components", 8, 2, None),      # handled specially below
        cfg("parametrized_tsc_fft_256"),
        cfg("mond_tsc_multigrid_256"),
        cfg("fr_n2_tsc_multigrid_256"),
        # on-device IC generation wall-clock (VERDICT r2 item 4: "512^3
        # 2LPT ICs measured and logged"); key says seconds, not steps/s
        ("ic_2lpt_512_seconds", 9, 2,
         lambda e: e.__setitem__(
             "ic_2lpt_512_seconds",
             _run_isolated("round(bench.bench_ic_device(), 1)",
                           min(_remaining() - 30, PER_TASK_S)))),
    ]
    special = ("components", "components_512")

    def _merge_latest(result):
        """Overlay the new capture onto BENCH_LATEST.json so a
        budget-limited run (rows 'skipped (budget)') never clobbers a
        previously captured number: numeric rows win, skip/fail strings
        only fill rows that were never captured. BENCH_rNN.json keeps
        each driver run's raw output; this file is 'latest known value
        per row' and feeds the README table."""
        root = os.path.dirname(os.path.abspath(__file__))
        path = os.path.join(root, "BENCH_LATEST.json")
        merged = dict(result)
        captured = {}
        try:
            with open(path) as f:
                old = json.load(f)
            captured = dict(old.get("row_captured", {}))
            om = dict(old.get("extra_metrics_steps_per_sec", {}))
            for k, v in result["extra_metrics_steps_per_sec"].items():
                if isinstance(v, (int, float)) or not isinstance(
                        om.get(k), (int, float)):
                    om[k] = v
            merged["extra_metrics_steps_per_sec"] = om
            for ck in ("component_ms_256_tsc", "component_ms_512_cic"):
                new_c = result.get(ck)
                keep_old = (not isinstance(new_c, dict)
                            or set(new_c) & {"skipped", "failed"})
                if keep_old and isinstance(old.get(ck), dict) and not (
                        set(old[ck]) & {"skipped", "failed"}):
                    merged[ck] = old[ck]
        except (OSError, ValueError, KeyError):
            pass
        # recompute the derived top-level fields (vs_baseline_512*,
        # slab overhead, v5e-8 projection) from the MERGED extras --
        # otherwise a budget-limited run that missed e.g. the c05 row
        # silently drops the derived keys an earlier run computed
        merged_extra = merged["extra_metrics_steps_per_sec"]
        hv = merged_extra.get("newton_cic_fft_256", merged.get("value"))
        if isinstance(hv, (int, float)):
            rebuilt = _result_dict(
                hv, baseline, merged_extra,
                merged.get("component_ms_256_tsc"),
                merged.get("component_ms_512_cic"), baseline_512,
            )
            rebuilt["extra_metrics_steps_per_sec"] = merged_extra
            merged = rebuilt
        # stamp every row numerically captured by THIS run; carried-
        # forward rows keep their old stamp, so the README table can
        # show when each number was last measured (ADVICE r4)
        stamp = time.strftime("%Y-%m-%d")
        for k, v in result["extra_metrics_steps_per_sec"].items():
            if isinstance(v, (int, float)):
                captured[k] = stamp
        for ck in ("component_ms_256_tsc", "component_ms_512_cic"):
            c = result.get(ck)
            if isinstance(c, dict) and not (set(c) & {"skipped", "failed"}):
                captured[ck] = stamp
        merged["row_captured"] = captured
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)

    def _emit():
        """Cumulative table after every task (stdout AND the JSON file):
        a driver timeout can only cost the tasks not yet run."""
        result = _result_dict(value, baseline, extra, components,
                              components_512, baseline_512)
        print(json.dumps(result), flush=True)
        try:
            _merge_latest(result)
        except OSError:
            pass

    def _drain_server(max_wait_s):
        """Wait out an orphaned server-side job after a task timeout.

        Killing a subprocess does NOT stop its server-side compile/run
        on the axon backend; every later heavy client queues behind it
        and times out in turn (observed cascade, 2026-08-21). A cheap
        probe op queues the same way but costs nothing -- loop it until
        the server answers fast, then resume real tasks."""
        import subprocess
        import sys

        t0 = time.perf_counter()
        while time.perf_counter() - t0 < max_wait_s:
            try:
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp; "
                     "print(float(jnp.sum(jnp.arange(64.0))))"],
                    timeout=120, capture_output=True, text=True)
                if r.returncode == 0:
                    return True
            except subprocess.TimeoutExpired:
                pass
        return False

    def _recover_device():
        """Free every device buffer after a failed task. A 512^3 OOM
        otherwise leaves HBM full of orphaned allocations and every
        subsequent task dies with JaxRuntimeError."""
        import jax

        try:
            for a in jax.live_arrays():
                try:
                    a.delete()
                except Exception:
                    pass
        except Exception:
            pass

    for first_key, nc, programs, fn in tasks:
        # Permissive gating: the estimate decides ORDER pressure only.
        # Because the cumulative table is re-emitted after every task, an
        # overrun mid-task costs exactly the tasks not yet run -- the
        # same as skipping them -- so cap the estimate at 180 s and
        # attempt anything while real budget remains (a warm compile
        # cache makes most tasks far cheaper than their cold estimate).
        if _remaining() < min(est_cost(nc, programs, first_key), 180) + 30:
            if first_key not in special:
                extra[first_key] = "skipped (budget)"
            continue
        try:
            t_cfg = time.perf_counter()
            if first_key == "components":
                components = bench_components()
            elif first_key == "components_512":
                # fresh process: needs nearly all of HBM (see _run_isolated)
                components_512 = _run_isolated(
                    "bench.bench_components(ncoarse=9, npart=512 ** 3, "
                    "scheme='cic', iters=2)",
                    min(_remaining() - 30, PER_TASK_S),
                )
            else:
                fn(extra)
                unit = est_cost(nc, programs, first_key) / max(cost_256,
                                                               1e-9)
                cost_256 = max(
                    cost_256,
                    (time.perf_counter() - t_cfg) / max(unit, 1e-9),
                )
        except Exception as e:  # record the failure, keep going
            msg = f"failed: {type(e).__name__}: {str(e)[:160]}"
            if first_key == "components":
                components = {"failed": msg}
            elif first_key == "components_512":
                components_512 = {"failed": msg}
            else:
                extra[first_key] = msg
            _recover_device()
            import subprocess as _sp

            if isinstance(e, _sp.TimeoutExpired):
                # the killed task's server-side work is still running;
                # drain before queuing the next heavy client behind it
                _drain_server(min(max(_remaining() - 120, 0), 900))
        _emit()

    # --- final line: the full table (last JSON line wins; nothing may
    # print to stdout after it -- the driver parses the LAST line) -----
    result = _result_dict(value, baseline, extra, components, components_512,
                          baseline_512)
    try:  # machine-readable source of truth for README/BENCH_NOTES tables
        root = os.path.dirname(os.path.abspath(__file__))
        _merge_latest(result)
        import subprocess
        import sys as _sys

        subprocess.run(
            [_sys.executable, os.path.join(root, "tools",
                                           "gen_perf_table.py")],
            check=False, timeout=30,
            stdout=_sys.stderr, stderr=_sys.stderr,
        )
    except OSError:
        pass
    print(json.dumps(result), flush=True)
    # The axon tunnel backend can hold interpreter teardown past the
    # driver's timeout (BENCH_r04.json delivered the full table but
    # recorded rc 124). After the final JSON line there is nothing left
    # to lose: exit the process immediately (VERDICT r4 weak item 1).
    import sys

    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
