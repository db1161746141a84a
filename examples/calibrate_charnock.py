"""Gradient-based calibration of the Charnock law — a capability the
Fortran reference cannot offer.

The COARE 3.6 Charnock parameter is a fitted linear law of wind speed,
alpha(U) = 0.0017 U - 0.005 capped to [0, 0.028] (Edson et al. 2013
Eq. 13, mod_blk_coare3p6.f90:417-441).  Field campaigns re-fit those two
coefficients against eddy-covariance flux measurements.  Because every
step of aerobulk_tpu's bulk solve is differentiable — including the
fixed-point iteration — that fit is a few lines of `jax.grad` + optax
here, instead of an offline regression against externally linearized
transfer coefficients.

This script synthesizes a flux "campaign" from the standard law, then
recovers the (slope, intercept) pair from a deliberately wrong starting
point by descending the flux-mismatch loss THROUGH the full COARE 3.6
solve (5 bulk iterations, gustiness, roughness closures, bulk formula).

Run: python examples/calibrate_charnock.py   (CPU fp64; ~10 s)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax                       # noqa: E402

jax.config.update("jax_platforms", "cpu")   # fp64 calibration path
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402
import optax                     # noqa: E402

from aerobulk_tpu import constants as c             # noqa: E402
from aerobulk_tpu import thermo                     # noqa: E402
from aerobulk_tpu.algos.coare import turb_coare3p6  # noqa: E402

ZT, ZU = 2.0, 10.0
TRUE_SLOPE, TRUE_OFFSET = 0.0017, -0.005   # Edson-2013 Eq. 13


def make_campaign(n=512, seed=0):
    """Synthetic observation set spanning the open-ocean regime."""
    rng = np.random.default_rng(seed)
    sst = rng.uniform(278.0, 303.0, n)
    t_zt = sst + rng.uniform(-3.0, 2.0, n)          # unstable and stable
    slp = rng.uniform(98000.0, 103000.0, n)
    U = rng.uniform(3.0, 18.0, n)                   # unclipped alpha range
    theta_zt = thermo.pot_temp(jnp.asarray(t_zt), jnp.asarray(slp))
    q_zt = 0.7 * thermo.q_sat(jnp.asarray(t_zt), jnp.asarray(slp))
    return dict(sst=jnp.asarray(sst), theta_zt=theta_zt, q_zt=q_zt,
                U=jnp.asarray(U), slp=jnp.asarray(slp))


def fluxes(obs, charn_fn=None):
    """(Tau, QH, QL) from the full COARE 3.6 solve, bulk-SST mode."""
    q_s = c.rdct_qsat_salt * thermo.q_sat(obs["sst"], obs["slp"])
    res, _ = turb_coare3p6(ZT, ZU, obs["sst"], obs["theta_zt"], q_s,
                           obs["q_zt"], obs["U"], niter=5,
                           charn_fn=charn_fn)
    Tau, QH, QL, _, _ = thermo.bulk_formula(
        ZU, res.T_s, res.q_s, res.t_zu, res.q_zu,
        res.Cd, res.Ch, res.Ce, obs["U"], res.Ubzu, obs["slp"])
    return Tau, QH, QL


def calibrate(obs, target, steps=400, lr=0.5, verbose=True):
    """Recover (slope, offset) of the Charnock law by gradient descent."""
    tau_o, qh_o, ql_o = target
    scales = jnp.array([jnp.std(tau_o), jnp.std(qh_o), jnp.std(ql_o)])

    def loss(params):
        # params are in units of 1e-3 so adam's step size is sane
        a, b = params[0] * 1e-3, params[1] * 1e-3
        charn = lambda w: jnp.clip(a * w + b, 0.0, 0.028)  # noqa: E731
        tau, qh, ql = fluxes(obs, charn_fn=charn)
        return ((tau - tau_o) ** 2 / scales[0] ** 2
                + (qh - qh_o) ** 2 / scales[1] ** 2
                + (ql - ql_o) ** 2 / scales[2] ** 2).mean()

    params = jnp.array([1.0, 0.0])    # start: alpha = 0.001*U (wrong)
    opt = optax.adam(lr)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        val, g = jax.value_and_grad(loss)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, val

    for i in range(steps):
        params, state, val = step(params, state)
        if verbose and (i % 50 == 0 or i == steps - 1):
            print(f"  step {i:4d}  loss {float(val):.3e}  "
                  f"slope {float(params[0]) * 1e-3:+.6f}  "
                  f"offset {float(params[1]) * 1e-3:+.6f}")
    return float(params[0]) * 1e-3, float(params[1]) * 1e-3


def main():
    obs = make_campaign()
    print("Generating synthetic campaign from the standard COARE 3.6 "
          f"Charnock law (slope {TRUE_SLOPE}, offset {TRUE_OFFSET})...")
    target = fluxes(obs)   # built-in law = truth
    print("Calibrating from (0.001, 0.0) through the full bulk solve:")
    slope, offset = calibrate(obs, target)
    print(f"\nrecovered slope  = {slope:+.6f}   (true {TRUE_SLOPE:+.6f})")
    print(f"recovered offset = {offset:+.6f}   (true {TRUE_OFFSET:+.6f})")
    err_a = abs(slope - TRUE_SLOPE) / TRUE_SLOPE
    print(f"slope error {100 * err_a:.2f}%")


if __name__ == "__main__":
    main()
