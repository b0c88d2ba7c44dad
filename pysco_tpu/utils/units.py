"""Supercomoving unit system.

Same convention as the reference (``utils.py:167-192``): box units (BU) such
that the box length is 1, with conversions to proper km / seconds / kg that
depend on the current scale factor.
"""

from __future__ import annotations

import numpy as np

# Physical constants (SI), CODATA / IAU values matching astropy.constants.
PC_M = 3.0856775814913673e16  # parsec in metres (astropy pc.value)
G_SI = 6.6743e-11  # m^3 / kg / s^2 (astropy G.value)
C_KMS = 299792.458  # speed of light in km/s
SIGMA_SB = 5.670374419e-8  # W m^-2 K^-4
C_SI = 299792458.0  # m/s


def set_units(param) -> None:
    """Compute unit conversions (BU -> km, kg, s) and particle mass.

    Mutates ``param`` in place, adding ``unit_l`` (BU -> proper km),
    ``unit_t`` (BU -> seconds), ``unit_d`` (BU -> kg/km^3) and ``mpart``
    (particle mass in kg), as the reference does.
    """
    mpc_to_km = 1e3 * PC_M  # Mpc -> km
    g = G_SI * 1e-9  # m^3/kg/s^2 -> km^3/kg/s^2
    H0 = param["H0"] / mpc_to_km  # km/s/Mpc -> 1/s
    rhoc = 3.0 * H0 ** 2 / (8.0 * np.pi * g)  # kg/km^3
    param["unit_l"] = param["aexp"] * param["boxlen"] * 100.0 / H0
    param["unit_t"] = param["aexp"] ** 2 / H0
    param["unit_d"] = param["Om_m"] * rhoc / param["aexp"] ** 3
    param["mpart"] = param["unit_d"] * param["unit_l"] ** 3 / param["npart"]
