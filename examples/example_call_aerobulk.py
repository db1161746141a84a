#!/usr/bin/env python3
"""Python mirror of the reference's example_call_aerobulk.f90: the 2-point
(unstable + stable) case through every ocean algorithm, printing the table
whose golden values live in the reference's doc/ex_ab.dat.

Run on CPU/fp64 for exact golden agreement:
    python examples/example_call_aerobulk.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from aerobulk_tpu import AeroBulkConfig, flux_step  # noqa: E402

NITER = 50   # doc/ex_ab.dat was generated fully converged

sst = jnp.array([295.15, 295.15])       # 22 degC
t_zt = jnp.array([293.15, 298.15])      # 20 degC (unstable) / 25 degC (stable)
q_zt = jnp.array([0.012, 0.012])
U = jnp.array([5.0, 5.0])
V = jnp.array([0.0, 0.0])
slp = jnp.array([101000.0, 101000.0])
rad_sw = jnp.array([0.0, 0.0])          # night
rad_lw = jnp.array([350.0, 350.0])

for algo, skin in [("coare3p0", True), ("coare3p6", True), ("ecmwf", True),
                   ("ncar", False), ("andreas", False)]:
    cfg = AeroBulkConfig(algo=algo, zt=2.0, zu=10.0, niter=NITER,
                         use_skin=skin)
    # isecday_utc=12 replicates the reference's hardcoded library clock
    # (mod_aerobulk_compute.f90:136) — ex_ab.dat was generated with it
    kw = dict(rad_sw=rad_sw, rad_lw=rad_lw, isecday_utc=12) if skin else {}
    out, _ = flux_step(cfg, sst, t_zt, q_zt, U, V, slp, **kw)

    print(f"\n *********** {algo.upper()} *****************")
    print(f"  QH    = {float(out.QH[0]):12.5f} {float(out.QH[1]):12.5f} W/m^2")
    print(f"  QL    = {float(out.QL[0]):12.5f} {float(out.QL[1]):12.5f} W/m^2")
    print(f"  Evap  = {float(out.Evap[0]*86400):12.6f} "
          f"{float(out.Evap[1]*86400):12.6f} mm/day")
    if skin:
        print(f"  T_s   = {float(out.T_s[0]-273.15):12.5f} "
              f"{float(out.T_s[1]-273.15):12.5f} deg.C")
    print(f"  Tau_x = {float(out.Tau_x[0]):13.7e} "
          f"{float(out.Tau_x[1]):13.7e} N/m^2")
