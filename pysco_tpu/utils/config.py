"""Configuration handling: PySCo-compatible ``param.ini`` parsing.

Dialect parity with the reference parser (``iostream.py:13-69``):
``=``-delimited key/value lines, ``#`` comments, case-insensitive booleans,
python-literal typing of values (so ``npart = 128**3`` and
``z_out = [10, 5, 2, 1, 0.5, 0]`` both work). The result is a mutable
``Params`` mapping used as the run-time parameter container, mirroring the
reference's ``pd.Series`` blackboard (``main.py:63-68``) while the static
subset is frozen into hashable config for jit.
"""

from __future__ import annotations

import ast
from typing import Any, Dict


class Params(dict):
    """Mutable parameter container with attribute access.

    Equivalent role to the reference's ``pd.Series`` parameter blackboard.
    """

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def copy(self) -> "Params":
        return Params(dict.__iter__(self) and dict(self))


def _parse_value(raw: str) -> Any:
    """Parse a raw string value with the reference's typing rules."""
    s = raw.strip()
    if s == "":
        return False
    low = s.casefold()
    if low == "true":
        return True
    if low == "false":
        return False
    # Safe literal evaluation first; fall back to a restricted arithmetic
    # eval so expressions like ``128**3`` work (reference uses bare eval,
    # iostream.py:60-66).
    try:
        return ast.literal_eval(s)
    except (ValueError, SyntaxError):
        pass
    try:
        node = ast.parse(s, mode="eval")
        allowed = (
            ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant, ast.List,
            ast.Tuple, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Pow,
            ast.FloorDiv, ast.Mod, ast.USub, ast.UAdd,
        )
        if all(isinstance(n, allowed) for n in ast.walk(node)):
            return eval(compile(node, "<param>", "eval"), {"__builtins__": {}}, {})
    except (ValueError, SyntaxError):
        pass
    return s


def read_param_file(name: str) -> Params:
    """Read a PySCo-style ``param.ini`` file into a :class:`Params`."""
    param = Params()
    with open(name, "r") as f:
        for line in f:
            line = line.split("#", 1)[0]
            if "=" not in line:
                continue
            key, _, raw = line.partition("=")
            key = key.strip()
            if not key:
                continue
            param[key] = _parse_value(raw)
    return param


def params_from_dict(d: Dict[str, Any]) -> Params:
    p = Params()
    for k, v in d.items():
        p[k] = v
    return p


# Keys that parameterize the compiled step. Changing any of these triggers a
# re-trace; everything else flows through as dynamic scalars.
STATIC_KEYS = (
    "theory",
    "ncoarse",
    "npart",
    "mass_scheme",
    "linear_newton_solver",
    "gradient_stencil_order",
    "Npre",
    "Npost",
    "fR_n",
    "mond_function",
    "integrator",
)


DEFAULTS: Dict[str, Any] = {
    "nthreads": 1,
    "theory": "newton",
    "fR_logfR0": 5.0,
    "fR_n": 1,
    "mond_function": "simple",
    "mond_g0": 1.2,
    "mond_scale_factor_exponent": 0.0,
    "mond_alpha": 1.0,
    "parametrized_mu0": 0.0,
    "H0": 72.0,
    "Om_m": 0.25733,
    "T_cmb": 2.726,
    "N_eff": 3.044,
    "w0": -1.0,
    "wa": 0.0,
    "boxlen": 100.0,
    "ncoarse": 7,
    "npart": 128 ** 3,
    "z_start": 49.0,
    "seed": 42,
    "position_ICS": "center",
    "fixed_ICS": False,
    "paired_ICS": False,
    "dealiased_ICS": False,
    "power_spectrum_file": "",
    "initial_conditions": "2LPT",
    "base": "./run",
    "output_snapshot_format": "HDF5",
    "z_out": "[0]",
    "save_power_spectrum": "no",
    "integrator": "leapfrog",
    "mass_scheme": "TSC",
    "n_reorder": 50,
    "Courant_factor": 1.0,
    "max_aexp_stepping": 10.0,
    "linear_newton_solver": "multigrid",
    "gradient_stencil_order": 5,
    "Npre": 2,
    "Npost": 1,
    "epsrel": 1e-2,
    "verbose": 1,
    # TPU-native extensions (not reference keys):
    # particle transfer engine: pallas | dense | scatter
    "particle_engine": "pallas",
    # f(R) per-cell root solve: newton (f32 polish) | exact (f64 closed form)
    "fR_root_solver": "newton",
    # multigrid cycle type: V | F | W (linear and FAS drivers)
    "multigrid_cycle": "V",
    # CFL-bounded lazy re-binning (pallas engine): skip the per-step tile
    # sort while the accumulated drift bound stays under lazy_drift cells
    "lazy_sort": True,
    # maximum lazy window (cells): 3 stretches the tile sort to every 6th
    # step at Courant ~0.5 (the sort is the dominant step cost at 256^3+;
    # levels 0,1,2,2,3,3 -- measured 512^3: 0.722 -> 0.757 steps/s vs 2)
    "lazy_drift": 3,
    # MXU precision of the pallas deposit/gather contractions:
    # bf16x3 (3-pass hi/lo split, float32-faithful) | f32 | bf16
    "pm_precision": "bf16x3",
    # precision of the drift-widened (stale-bin) passes: "bf16-gather"
    # (default) keeps the deposit exact (the measured density/P(k) are
    # untouched) and rounds only the gather inputs to bf16 (~2e-3 force
    # rounding on stale-bin steps, measured 1.1-1.3e-4 full-horizon
    # P(k) impact, tests/test_widened_precision.py) for ~3x less MXU
    # work; "bf16x3" is fully exact, "bf16" rounds both
    "pm_precision_widened": "bf16-gather",
    # distribution: single (one chip) | replicated (particles sharded,
    # grids replicated + one density psum, parallel/pm.py) | slab
    # (grids AND particles sharded, parallel/slab.py)
    "parallel_mode": "single",
    # slab mode per-shard particle capacity factor (slabs inherit the
    # x-density imbalance once structure forms; overflow is detected)
    "slab_slack": 1.25,
    # slab mode: re-distribute with 1.5x the slack once any shard's
    # occupancy exceeds this fraction of its capacity (proactive, before
    # particles are at risk; costs one re-trace). Set >= 1 to disable.
    "slab_rebalance_headroom": 0.9,
    # persistent XLA compile cache: yes | no | /path (also honours
    # PYSCO_TPU_JAX_CACHE). Compile dominates cold starts on TPU; this
    # is the analogue of the reference's @njit(cache=True).
    "compile_cache": "yes",
}


def with_defaults(param: Params) -> Params:
    out = Params()
    for k, v in DEFAULTS.items():
        out[k] = v
    for k, v in param.items():
        out[k] = v
    return out


def extra_name(param: Params) -> str:
    """Run-identifier string used in output filenames.

    Same naming scheme as the reference (``main.py:82-93``).
    """
    extra = str(param["theory"]).casefold()
    if extra == "fr":
        extra += f"{param['fR_logfR0']}_n{param['fR_n']}"
    elif extra == "mond":
        mond_function = str(param["mond_function"]).casefold()
        extra += (
            f"_g0_{param['mond_g0']}_exponent_"
            f"{param['mond_scale_factor_exponent']}_{mond_function}"
        )
        if mond_function != "simple":
            extra += f"_{param['mond_alpha']}"
    elif extra == "parametrized":
        extra += f"_mu0_{param['parametrized_mu0']}"
    extra += f"_{param['linear_newton_solver']}_ncoarse{param['ncoarse']}"
    return extra
