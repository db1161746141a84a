"""Benchmark: fused COARE3.6 + cool-skin/warm-layer on a 0.25-degree global
grid — grid-points per second per chip (the BASELINE.json headline metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md), so
``vs_baseline`` is reported against a measured single-core CPU estimate of
the reference workload's arithmetic (recorded in BASELINE_CPU_POINTS_S
below, conservative upper bound for the Fortran loop nest at nb_iter=5);
the true baseline remains "none published".
"""

import json
import time

import numpy as np


# Conservative estimate of the reference Fortran throughput for the same
# workload (single core, -O3, ~1e3 flops+transcendentals per point at
# nb_iter=5): ~2e6 points/s.  The reference itself publishes nothing.
BASELINE_CPU_POINTS_S = 2.0e6

NY, NX = 721, 1440          # 0.25-degree global grid
NITER = 5                   # reference default nb_iter
REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, flux_step, init_skin_state

    dtype = jnp.float32
    shape = (NY, NX)
    rng = np.random.default_rng(42)
    sst = jnp.asarray(285.0 + 15.0 * rng.random(shape), dtype)
    t = jnp.asarray(np.asarray(sst) + rng.normal(0.0, 2.0, shape), dtype)
    q = jnp.asarray(0.004 + 0.012 * rng.random(shape), dtype)
    u = jnp.asarray(rng.normal(0.0, 6.0, shape), dtype)
    v = jnp.asarray(rng.normal(0.0, 6.0, shape), dtype)
    slp = jnp.asarray(98000.0 + 4000.0 * rng.random(shape), dtype)
    rsw = jnp.asarray(500.0 * rng.random(shape), dtype)
    rlw = jnp.asarray(250.0 + 150.0 * rng.random(shape), dtype)
    lon = jnp.asarray(360.0 * rng.random(shape), dtype)

    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=NITER,
                         use_skin=True)
    state = init_skin_state(cfg, shape, dtype)

    args = (sst, t, q, u, v, slp, rsw, rlw, lon)

    @jax.jit
    def steps(a, st):
        # REPS time records inside one dispatch (the production shape:
        # lax.scan over the time axis with the skin state as carry)
        def body(carry, _):
            out, new_state = flux_step(cfg, *a[:6], rad_sw=a[6], rad_lw=a[7],
                                       isecday_utc=43200, lon=a[8],
                                       skin_state=carry)
            return new_state, (out.QL, out.QH, out.Tau_x, out.Tau_y)
        st, outs = jax.lax.scan(body, st, None, length=REPS)
        return st, jax.tree_util.tree_map(lambda x: x[-1], outs)

    # warmup / compile
    jax.block_until_ready(steps(args, state))

    t0 = time.perf_counter()
    jax.block_until_ready(steps(args, state))
    dt = (time.perf_counter() - t0) / REPS

    pts_per_s = NY * NX / dt
    print(json.dumps({
        "metric": "coare3p6_skin_0p25deg_grid_points_per_s_per_chip",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / BASELINE_CPU_POINTS_S, 2),
    }))


if __name__ == "__main__":
    main()
