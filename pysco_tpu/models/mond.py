"""QUMOND source term.

The quasi-linear MOND Poisson source is the divergence of
``nu(|grad phi_N|/g0) grad phi_N`` evaluated on face-centred (A/B) points
(Luehghausen et al. 2014 convention; reference ``mond.py``). The reference
evaluates 6 face gradients with 36 stencil reads per cell; here we exploit
the fact that every B-face quantity is the A-face quantity of the next cell,
so each axis needs one face-gradient field and one roll:

    out = sum_a (1/h) * [ roll(nu_A * gA_a, -1, a) - nu_A * gA_a ]

Interpolating-function families: simple / n / beta / gamma / delta
(mond.py:16-162).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.mesh import roll

F32 = jnp.float32


def nu_simple(y: jax.Array) -> jax.Array:
    return F32(0.5) + jnp.sqrt(F32(0.25) + F32(1) / y)


def nu_n(y: jax.Array, n: float) -> jax.Array:
    n = int(n)
    return (F32(0.5) + jnp.sqrt(F32(0.25) + y ** (-n))) ** F32(1.0 / n)


def nu_beta(y: jax.Array, beta: float) -> jax.Array:
    beta = F32(beta)
    exp_minus_y = jnp.exp(-y)
    one_minus = F32(1) - exp_minus_y
    extra = jnp.where(
        one_minus > 0, jnp.where(one_minus > 0, one_minus, F32(1)) ** F32(-0.5), F32(0)
    )
    return beta * exp_minus_y + extra


def nu_gamma(y: jax.Array, gamma: float) -> jax.Array:
    gamma = float(gamma)
    e = jnp.exp(-(y ** F32(0.5 * gamma)))
    return (F32(1) - e) ** F32(-1.0 / gamma) + F32(1 - 1.0 / gamma) * e


def nu_delta(y: jax.Array, delta: float) -> jax.Array:
    delta = float(delta)
    return (F32(1) - jnp.exp(-(y ** F32(0.5 * delta)))) ** F32(-1.0 / delta)


_NU = {
    "simple": lambda y, alpha: nu_simple(y),
    "n": nu_n,
    "beta": nu_beta,
    "gamma": nu_gamma,
    "delta": nu_delta,
}


def rhs(potential: jax.Array, g0, mond_function: str, alpha: float) -> jax.Array:
    """QUMOND right-hand side from the Newtonian potential.

    ``g0`` is the acceleration constant already converted to box units and
    scaled by aexp (done at the solver level, solver.py:411-421 in the
    reference).
    """
    mond_function = mond_function.casefold()
    if mond_function not in _NU:
        raise NotImplementedError(
            f"mond_function {mond_function!r}, should be simple, n, beta, gamma or delta"
        )
    nu_fn = _NU[mond_function]

    phi = potential
    # h from the z axis: under x-slab sharding the first axis is the
    # (halo-extended) local slab height, the last axis is always M
    n = phi.shape[-1]
    invh = F32(n)
    inv4h = F32(0.25 * n)
    inv_g0 = F32(1.0) / F32(g0)

    # centred tangential differences, shared across axes
    D = [roll(phi, -1, a) - roll(phi, 1, a) for a in range(3)]

    out = jnp.zeros_like(phi)
    for a in range(3):
        t1, t2 = [t for t in range(3) if t != a]
        g_a = invh * (phi - roll(phi, 1, a))  # normal component at A-face
        g_t1 = inv4h * (D[t1] + roll(D[t1], 1, a))
        g_t2 = inv4h * (D[t2] + roll(D[t2], 1, a))
        norm = jnp.sqrt(g_a * g_a + g_t1 * g_t1 + g_t2 * g_t2)
        flux = nu_fn(norm * inv_g0, alpha) * g_a
        out = out + invh * (roll(flux, -1, a) - flux)
    return out
