"""Common result structure for all bulk algorithms.

The reference exposes diagnostics through a tail of optional output
arguments on every TURB routine (e.g. mod_blk_coare3p0.f90:156-162).  Here
every algorithm always returns the full :class:`FluxResult` pytree — XLA
dead-code-eliminates anything the caller does not use, so there is no cost
to computing them unconditionally.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FluxResult(NamedTuple):
    """Outputs of a bulk-transfer algorithm, all same shape as the inputs."""
    # primary outputs (the mandatory TURB_* outputs in the reference)
    Cd: jnp.ndarray       # drag coefficient
    Ch: jnp.ndarray       # sensible-heat coefficient
    Ce: jnp.ndarray       # evaporation coefficient
    t_zu: jnp.ndarray     # potential air temperature adjusted to zu [K]
    q_zu: jnp.ndarray     # specific humidity adjusted to zu [kg/kg]
    Ubzu: jnp.ndarray     # bulk wind speed at zu (incl. gustiness) [m/s]
    # surface state (updated if a skin scheme ran, else the inputs)
    T_s: jnp.ndarray      # surface (skin or bulk) temperature [K]
    q_s: jnp.ndarray      # saturation specific humidity at T_s [kg/kg]
    # diagnostics (the optional outputs in the reference)
    CdN: jnp.ndarray      # neutral-stability drag coefficient
    ChN: jnp.ndarray      # neutral-stability heat coefficient
    CeN: jnp.ndarray      # neutral-stability evaporation coefficient
    z0: jnp.ndarray       # aerodynamic roughness length [m]
    u_star: jnp.ndarray   # friction velocity [m/s]
    L: jnp.ndarray        # Obukhov length [m]
    UN10: jnp.ndarray     # neutral wind speed at 10 m [m/s]
    # skin diagnostics (zeros when no skin scheme)
    dT_cs: jnp.ndarray    # cool-skin temperature increment [K]
    dT_wl: jnp.ndarray    # warm-layer temperature increment [K]
    Hz_wl: jnp.ndarray    # warm-layer depth [m]
