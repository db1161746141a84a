"""Benchmark: fused COARE3.6 + cool-skin/warm-layer on a 0.25-degree global
grid — grid-points per second per chip (the BASELINE.json headline metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}

The reference publishes no performance numbers (BASELINE.md), so
``vs_baseline`` is reported against a MEASURED single-core CPU baseline:
bench_baseline/coare36_skin_baseline.c, a C transcription of the
reference's per-point COARE3.6+skin arithmetic (hot loop
mod_blk_coare3p6.f90:302-383 + CS/WL + BULK_FORMULA), compiled and run on
this machine (see BASELINE_CPU_POINTS_S note below).  The true published
baseline remains "none".

Timing methodology: the TPU here sits behind a remote tunnel with a fixed
per-dispatch/sync cost of tens of ms that dwarfs small workloads, and
``block_until_ready`` alone is not a reliable completion sync on this
backend.  Sustained throughput is therefore measured by SLOPE: run M1 and
M2 > M1 chained dispatches (each argument-distinct so nothing can be
cached or elided), force a host read of a value that depends on every
dispatch, and divide the wall-time difference by the extra work.  Fixed
RPC/sync overheads cancel exactly.
"""

import json
import sys

import numpy as np

from aerobulk_tpu.profiling import slope_time as _slope_time


# MEASURED single-core CPU throughput of the reference's COARE3.6+skin
# point loop (bench_baseline/coare36_skin_baseline.c — a C transcription
# of the Fortran arithmetic; gfortran absent from this image).  On this
# host (Intel Xeon @ 2.10 GHz, 2026-08):
#   cc -O3                       (the reference's own flag set): ~1.28e5
#   cc -O3 -march=native                                       : ~1.19e5
#   cc -O3 -march=native -ffast-math  (semantics-changing)     : ~1.75e5
# points/s at nb_iter=5 (median of 3, idle host; libm pow/log/atan chain
# dominates — ~500 libm calls per point).  We take the BEST observed
# (fast-math) number as the baseline so vs_baseline is conservative.
# Reproduce: cd bench_baseline && cc -O3 -march=native -ffast-math \
#   -o b coare36_skin_baseline.c -lm && ./b 200000 5
BASELINE_CPU_POINTS_S = 1.75e5

NY, NX = 721, 1440          # 0.25-degree global grid
NITER = 5                   # reference default nb_iter
REPS = 20


def _use_fused():
    """The fused Pallas kernel is the speed path on real TPU hardware;
    the jit path is the fallback (CPU, ``--jit`` flag)."""
    import jax
    if "--jit" in sys.argv:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def parity_check(cfg, args, state, shape, dtype):
    """On-device numeric parity gate: run the fused Pallas kernel and the
    plain-XLA jit path on the SAME inputs on the live device and report
    max / median / p99 relative error over the flux outputs (VERDICT
    round-1 item 5 — previously the real Mosaic kernel's fp32 deviation
    was only a prose claim checked in interpret mode on CPU).

    Returns a dict of parity fields for the bench JSON line."""
    import jax
    from aerobulk_tpu.api import flux_step
    from aerobulk_tpu.kernels.fused import fused_flux_step

    sst, t, q, u, v, slp, rsw, rlw, lon = args

    @jax.jit
    def run_jit(st):
        out, ns = flux_step(cfg, sst, t, q, u, v, slp, rad_sw=rsw,
                            rad_lw=rlw, isecday_utc=43200, lon=lon,
                            skin_state=st)
        return (out.QL, out.QH, out.Tau_x, out.Tau_y, out.Evap,
                out.T_s), ns

    @jax.jit
    def run_fused(st):
        outs, ns = fused_flux_step(cfg, sst, t, q, u, v, slp, rsw, rlw,
                                   lon=lon, isecday_utc=43200,
                                   skin_state=st)
        return outs, ns

    ref, _ = run_jit(state)
    got, _ = run_fused(state)
    return _parity_fields(("QL", "QH", "Tau_x", "Tau_y", "Evap", "T_s"),
                          got, ref)


def _parity_fields(names, got, ref):
    """Fused-vs-jit deviation statistics + the gate (shared by the
    headline parity_check and the per-workload gates in --all)."""
    import numpy as np
    rels = []
    per_var = {}
    frac_by_var = {}
    sig_fracs = []
    for name, a, b in zip(names, got, ref):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        med = float(np.median(np.abs(b)) + 1e-30)
        d = np.abs(a - b)
        if med < 1e-20:
            # DEGENERATE field: the reference path says (essentially)
            # zero everywhere — e.g. ice-scheme Evap, identically ~0 —
            # so "abs error vs 10% of the field median" divides by
            # nothing and any 1e-8 of kernel rounding reads as 100%
            # significant.  The honest statement is absolute: both
            # paths must agree the field is zero to a machine-noise
            # floor (1e-6 in SI units — 100x the observed fused-vs-jit
            # noise, orders below any physical flux/stress/evap signal).
            frac_by_var[name] = {
                "degenerate_zero_field": True,
                "abs_gt_1e6_floor": float(np.mean(d > 1e-6)),
                "max_abs": float(np.max(d)),
                "median_abs_of_field": med,
            }
            per_var[name] = float(np.max(d))
            sig_fracs.append(frac_by_var[name]["abs_gt_1e6_floor"])
            continue
        scale = np.maximum(np.abs(b), 1e-3 * med)
        r = np.abs(a - b) / scale
        # tail accounting (VERDICT r2 item 1).  Two views:
        #  * pointwise-relative (r): ill-conditioned where the flux
        #    crosses zero (QH's stable/unstable contour) — a 0.03 W/m^2
        #    wobble at a |QH|=0.005 W/m^2 point reads as rel~6;
        #  * SIGNIFICANT divergence: abs error above 1% / 10% of the
        #    field's median magnitude — the physically meaningful tail
        #    (root-caused in docs/PARITY.md: warm-layer regime-boundary
        #    flips at the Qabs<=0 terminator / drain / dawn thresholds).
        frac_by_var[name] = {
            "rel_gt_1e2": float(np.mean(r > 1e-2)),
            "abs_gt_1pct_median": float(np.mean(d > 0.01 * med)),
            "abs_gt_10pct_median": float(np.mean(d > 0.1 * med)),
            "max_abs": float(np.max(d)),
            "median_abs_of_field": med,
        }
        per_var[name] = float(np.max(r))
        sig_fracs.append(frac_by_var[name]["abs_gt_10pct_median"])
        rels.append(r.ravel())
    rel = np.concatenate(rels)
    frac_sig = float(np.max(sig_fracs))
    fields = {
        "parity_median_rel": float(np.median(rel)),
        "parity_p99_rel": float(np.percentile(rel, 99)),
        "parity_max_rel": float(np.max(rel)),
        "parity_max_by_var": {k: round(v, 8) for k, v in per_var.items()},
        "parity_frac_by_var": frac_by_var,
        "parity_worst_frac_abs_gt_10pct_median": frac_sig,
        # fp32 gate at measured+margin (tools/fp32_tail.py, 2026-08-19:
        # median 4.4e-5, p99 6.9e-3; QH max ABS error 1.3 W/m^2 against a
        # 12.5 W/m^2 median; significant-abs fraction measured 1.9e-6).
        # The bulk must sit at fp32-roundoff scale and the SIGNIFICANT
        # tail (abs > 10% of the field median) must stay a vanishing
        # fraction — gated at 1e-4, a 50x margin over measurement
        # (VERDICT r3 item 4: the old 2e-3 gate had 1000x slack and
        # would have passed a real new branch-flip class silently).  The
        # pointwise-relative max is reported but not gated — it measures
        # denominator conditioning, not kernel correctness
        # (docs/PARITY.md "fp32 tail").
        "parity_ok": bool(np.median(rel) < 2e-4
                          and np.percentile(rel, 99) < 2e-2
                          and frac_sig < 1e-4),
    }
    return fields


def _arg_niter():
    """--niter N overrides the default iteration count (the reference's
    converged test settings are 20 for series/toy and 50 for ex_ab)."""
    for i, a in enumerate(sys.argv):
        if a == "--niter" and i + 1 < len(sys.argv):
            return int(sys.argv[i + 1])
        if a.startswith("--niter="):
            return int(a.split("=", 1)[1])
    return NITER


def main():
    import jax
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, flux_step, init_skin_state

    niter = _arg_niter()
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

    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=niter,
                         use_skin=True)
    state = init_skin_state(cfg, shape, dtype)

    args = (sst, t, q, u, v, slp, rsw, rlw, lon)

    fused = _use_fused()
    if fused:
        from aerobulk_tpu.kernels.fused import fused_flux_step

        def one_step(a, carry):
            outs, new_state = fused_flux_step(
                cfg, *a[:6], a[6], a[7], lon=a[8], isecday_utc=43200,
                skin_state=carry)
            return new_state, outs[0] + outs[1]
    else:
        def one_step(a, carry):
            out, new_state = flux_step(cfg, *a[:6], rad_sw=a[6], rad_lw=a[7],
                                       isecday_utc=43200, lon=a[8],
                                       skin_state=carry)
            return new_state, out.QL + out.QH

    @jax.jit
    def steps(st, acc, salt):
        # One dispatch = REPS time records (the production shape: lax.scan
        # over the time axis with the skin state as carry).  ``salt`` and
        # the accumulator chain make consecutive dispatches
        # argument-distinct and serially dependent.
        def body(carry, _):
            st, acc = carry
            st, ql = one_step(args, st)
            return (st, acc + ql), None
        (st, acc), _ = jax.lax.scan(body, (st, acc + salt), None,
                                    length=REPS)
        return st, acc

    def chained(m):
        st, acc = state, jnp.zeros(shape, dtype)
        for i in range(m):
            st, acc = steps(st, acc, jnp.float32(i) * 1e-6)
        return acc[:1, :1]

    record = {
        "metric": "coare3p6_skin_0p25deg_grid_points_per_s_per_chip",
        "unit": "points/s",
        "niter": niter,
        "baseline_cpu_points_per_s": BASELINE_CPU_POINTS_S,
        "baseline_provenance": ("measured: bench_baseline/"
                                "coare36_skin_baseline.c, cc -O3 "
                                "-march=native -ffast-math, single core, "
                                "Intel Xeon 2.10GHz (best of 3 flag sets)"),
    }

    # On-device parity gate: DEFAULT-ON for the fused TPU path so every
    # recorded bench line carries the fused-vs-jit parity fields
    # (--no-check skips it, e.g. for quick perf iterations: the jit-path
    # compile it needs adds a few minutes).
    if fused and "--no-check" not in sys.argv:
        record.update(parity_check(cfg, args, state, shape, dtype))

    dt = _slope_time(chained) / REPS
    pts_per_s = NY * NX / dt
    record["value"] = round(pts_per_s, 1)
    record["vs_baseline"] = round(pts_per_s / BASELINE_CPU_POINTS_S, 2)
    print(json.dumps(record))


def _timeit_scan(step_fn, carry, reps):
    """Slope-timed seconds per step: one dispatch = a reps-step scan; the
    marginal cost of extra chained dispatches cancels the fixed RPC/sync
    overhead (see module docstring)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def dispatch(c, salt):
        c = jax.tree_util.tree_map(lambda x: x + salt, c)

        def body(c, _):
            return step_fn(c), None
        c, _ = jax.lax.scan(body, c, None, length=reps)
        return c

    def chained(m):
        c = carry
        for i in range(m):
            c = dispatch(c, jnp.float32(i) * 1e-7)
        leaf = jax.tree_util.tree_leaves(c)[0]
        return jnp.ravel(leaf)[:1]

    return _slope_time(chained) / reps


def _mk_inputs(shape, dtype, seed=42, cold=False):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    base = 250.0 if cold else 285.0
    spread = 25.0 if cold else 15.0
    sst = base + spread * rng.random(shape)
    return {
        "sst": jnp.asarray(sst, dtype),
        "t": jnp.asarray(sst + rng.normal(0.0, 2.0, shape), dtype),
        "q": jnp.asarray(0.0005 + 0.012 * rng.random(shape), dtype),
        "u": jnp.asarray(rng.normal(0.0, 6.0, shape), dtype),
        "v": jnp.asarray(rng.normal(0.0, 6.0, shape), dtype),
        "slp": jnp.asarray(98000.0 + 4000.0 * rng.random(shape), dtype),
        "rsw": jnp.asarray(500.0 * rng.random(shape), dtype),
        "rlw": jnp.asarray(250.0 + 150.0 * rng.random(shape), dtype),
        "lon": jnp.asarray(360.0 * rng.random(shape), dtype),
        "frice": jnp.asarray(rng.random(shape), dtype),
    }


def main_all():
    """The 5 BASELINE.json workload configs, one JSON line each."""
    import jax.numpy as jnp
    from aerobulk_tpu.api import (AeroBulkConfig, flux_step, flux_step_mixed,
                                  init_skin_state)

    dtype = jnp.float32

    fused = _use_fused()

    def ocean_cfg_bench(name, algo, shape, use_skin, reps=20):
        import jax.numpy as jnp
        f = _mk_inputs(shape, dtype)
        cfg = AeroBulkConfig(algo=algo, niter=NITER, use_skin=use_skin)
        state0 = init_skin_state(cfg, shape, dtype)

        if use_skin and fused:
            from aerobulk_tpu.kernels.fused import fused_flux_step

            def step(carry):
                st, acc = carry
                outs, ns = fused_flux_step(
                    cfg, f["sst"], f["t"], f["q"], f["u"], f["v"], f["slp"],
                    f["rsw"], f["rlw"], lon=f["lon"], isecday_utc=43200,
                    skin_state=st)
                return ns, acc + outs[0] + outs[1] + outs[2]

            dt_s = _timeit_scan(step, (state0, jnp.zeros(shape, dtype)), reps)
            pts = shape[0] * shape[1] / dt_s
            rec = {"metric": name, "value": round(pts, 1),
                   "unit": "points/s",
                   "vs_baseline": round(pts / BASELINE_CPU_POINTS_S, 2)}
            if "--no-check" not in sys.argv:
                # on-device fused-vs-jit parity for THIS workload (VERDICT
                # r3 item 3: every fused speed claim carries parity
                # evidence; costs one jit-path compile per workload)
                args = (f["sst"], f["t"], f["q"], f["u"], f["v"],
                        f["slp"], f["rsw"], f["rlw"], f["lon"])
                rec.update(parity_check(cfg, args, state0, shape, dtype))
            print(json.dumps(rec))
            return

        def step(carry):
            st, acc = carry
            kw = dict(rad_sw=f["rsw"], rad_lw=f["rlw"], isecday_utc=43200,
                      lon=f["lon"]) if use_skin else {}
            out, ns = flux_step(cfg, f["sst"], f["t"], f["q"], f["u"],
                                f["v"], f["slp"], skin_state=st, **kw)
            # fold the fluxes into the carry so no step is dead code
            return ns, acc + out.QL + out.QH + out.Tau_x

        dt_s = _timeit_scan(step, (state0, jnp.zeros(shape, dtype)), reps)
        pts = shape[0] * shape[1] / dt_s
        print(json.dumps({"metric": name, "value": round(pts, 1),
                          "unit": "points/s",
                          "vs_baseline": round(pts / BASELINE_CPU_POINTS_S, 2)}))

    # Stateless algorithms -> the production path is batch_records=True:
    # the whole record batch is one vectorized call, not an nt-step scan
    # (run_series docstring).  On TPU the batch is solved by the
    # stateless fused Pallas kernel (fused_bulk_step): ~2x the jit batch
    # on the COARE3.0 1-degree workload (the jit graph splits into
    # fusion clusters with HBM round-trips; measured 1.07e9 vs 5.5e8).
    def stateless_batched(name, algo, nt, shape, inner=8,
                          use_fused=None):
        import jax
        from aerobulk_tpu.api import run_series

        if use_fused is None:
            use_fused = fused
        f2 = _mk_inputs((nt,) + shape, dtype, seed=7)
        forcing = {k: f2[n] for k, n in
                   (("sst", "sst"), ("t_zt", "t"), ("hum_zt", "q"),
                    ("U_zu", "u"), ("V_zu", "v"), ("slp", "slp"))}
        cfg = AeroBulkConfig(algo=algo, niter=NITER, use_skin=False)
        kw = dict(batch_records=True)
        if use_fused:
            kw.update(backend="fused", fused_interpret=False)

        @jax.jit
        def run(salt, carry):
            # one dispatch = `inner` serially-dependent whole-batch solves;
            # a single solve (~ms) is too small against the ~30 ms
            # dispatch overhead for the slope to resolve reliably.
            def body(c, _):
                fc = dict(forcing)
                fc["sst"] = fc["sst"] + salt + c * 1e-30
                out, _ = run_series(cfg, fc, **kw)
                return (out.QL.mean() + out.QH.mean()
                        + out.Tau_x.mean() + c * 1e-30), None
            c, _ = jax.lax.scan(body, carry, None, length=inner)
            return c

        import jax.numpy as jnp

        def chained(m):
            c = jnp.zeros(())
            for i in range(m):
                c = run(c * 1e-30 + jnp.float32(i) * 1e-6, c)
            return c

        dt_s = _slope_time(chained) / inner
        pts = nt * shape[0] * shape[1] / dt_s
        rec = {"metric": name, "value": round(pts, 1),
               "unit": "points/s", "backend": "fused" if use_fused
               else "jit",
               "vs_baseline": round(pts / BASELINE_CPU_POINTS_S, 2)}
        if use_fused and "--no-check" not in sys.argv:
            # on-device fused-vs-jit parity for the stateless batch
            @jax.jit
            def run_jit_batch():
                out, _ = run_series(cfg, forcing, batch_records=True)
                return (out.QL, out.QH, out.Tau_x, out.Tau_y, out.Evap,
                        out.T_s)

            @jax.jit
            def run_fused_batch():
                out, _ = run_series(cfg, forcing, **kw)
                return (out.QL, out.QH, out.Tau_x, out.Tau_y, out.Evap,
                        out.T_s)

            rec.update(_parity_fields(
                ("QL", "QH", "Tau_x", "Tau_y", "Evap", "T_s"),
                run_fused_batch(), run_jit_batch()))
        print(json.dumps(rec))

    # 1: NCAR small-grid buoy series.  inner targets ~100 ms per dispatch:
    # a single ~2M-point solve is a fraction of a ms of device time, far
    # below the ~30 ms tunnel dispatch noise — the slope cannot resolve it.
    # Stays on the jit batch path: NCAR's 1151 ops/pt at the measured
    # 2e9 pts/s already implies 2.3e12 ops/s — the same efficiency class
    # the fused kernels reach, so there is nothing for a Pallas kernel
    # to recover (and its 128-long fused scan compile is prohibitive).
    stateless_batched("ncar_small_grid_points_per_s", "ncar", 512, (32, 128),
                      inner=128, use_fused=False)
    # 2: COARE3.0 bulk-SST, 1-degree global, no radiation — the fused
    # stateless kernel is ~2x the jit batch here (1.07e9 vs 5.5e8:
    # 2050 ops/pt x 5.5e8 was only ~1.0e12 ops/s, half the VPU class)
    stateless_batched("coare3p0_bulk_1deg_points_per_s", "coare3p0",
                      32, (181, 360), inner=32)
    # 3: headline — COARE3.6 + skin, 0.25-degree global
    ocean_cfg_bench("coare3p6_skin_0p25deg_points_per_s", "coare3p6",
                    (NY, NX), True)
    # 4: ECMWF + skin, 0.25-degree global
    ocean_cfg_bench("ecmwf_skin_0p25deg_points_per_s", "ecmwf", (NY, NX),
                    True)

    # 5: mixed ocean+ice cells (LG15 ice + ECMWF leads), 0.25-degree.
    # The scan body must depend on the carry (sst + c*1e-30), otherwise
    # XLA hoists the whole loop-invariant flux computation out of the
    # scan and the "per-step" time measures one step, not reps.
    # Slope-measured: the fused kernel sustains ~770 Mpts/s vs ~525 for
    # the jit path on this workload.
    f = _mk_inputs((NY, NX), dtype, cold=True)
    Ts_i = jnp.minimum(f["sst"], 271.0)

    if fused:
        from aerobulk_tpu.kernels import fused_mixed_step

        def step_mixed(c):
            QL, QH, Tau, E, Ts = fused_mixed_step(
                2.0, 10.0, Ts_i, f["sst"] + c * 1e-30, f["t"], f["q"],
                f["u"], f["v"], f["slp"], f["frice"], niter=NITER)
            return c + QL + Tau
    else:
        def step_mixed(c):
            net, _, _ = flux_step_mixed(
                2.0, 10.0, Ts_i, f["sst"] + c * 1e-30, f["t"], f["q"],
                f["u"], f["v"], f["slp"], f["frice"], niter=NITER)
            return c + net.QL + net.Tau

    dt_s = _timeit_scan(step_mixed, jnp.zeros((NY, NX), dtype), 10)
    pts = NY * NX / dt_s
    rec = {"metric": "mixed_ice_ocean_0p25deg_points_per_s",
           "value": round(pts, 1), "unit": "points/s",
           "vs_baseline": round(pts / BASELINE_CPU_POINTS_S, 2)}
    if fused and "--no-check" not in sys.argv:
        # on-device fused-vs-jit parity for the mixed workload (net
        # fluxes; same significant-abs-fraction gate)
        import jax

        @jax.jit
        def run_jit_mixed():
            net, _, _ = flux_step_mixed(
                2.0, 10.0, Ts_i, f["sst"], f["t"], f["q"], f["u"], f["v"],
                f["slp"], f["frice"], niter=NITER)
            return net.QL, net.QH, net.Tau, net.Evap, net.T_s

        @jax.jit
        def run_fused_mixed():
            return fused_mixed_step(
                2.0, 10.0, Ts_i, f["sst"], f["t"], f["q"], f["u"], f["v"],
                f["slp"], f["frice"], niter=NITER)

        rec.update(_parity_fields(("QL", "QH", "Tau", "Evap", "T_s"),
                                  run_fused_mixed(), run_jit_mixed()))
    print(json.dumps(rec))

    # 6: ice-only series workload (LG15 + concentration-dependent form
    # drag), 0.25-degree — the test_aerobulk_buoy_series_ice.f90 shape on
    # a grid.  The last fused kernel (fused_ice_step) with no on-device
    # speed/parity record until round 5 (VERDICT r4 item 2).
    from aerobulk_tpu.api import flux_step_ice

    if fused:
        from aerobulk_tpu.kernels.fused import fused_ice_step

        def step_ice(c):
            QL, QH, Tau_x, Tau_y, E, Ts = fused_ice_step(
                "ice_lg15", 2.0, 10.0, Ts_i, f["t"], f["q"],
                f["u"] + c * 1e-30, f["v"], f["slp"], frice=f["frice"],
                niter=NITER)
            return c + QL + Tau_x
    else:
        def step_ice(c):
            out, _ = flux_step_ice(
                "ice_lg15", 2.0, 10.0, Ts_i, f["t"], f["q"],
                f["u"] + c * 1e-30, f["v"], f["slp"], frice=f["frice"],
                niter=NITER)
            return c + out.QL + out.Tau_x

    # reps=80: the ice scheme is ~4x lighter per point than the skin
    # ocean step, so a 10-rep dispatch is only ~5 ms of device time —
    # under this tunnel's ~30 ms dispatch noise the slope cannot resolve
    # it (first measurement read an impossible 1.5e10 pts/s, 6x the VPU
    # op ceiling; same trap as the NCAR small-grid row)
    dt_s = _timeit_scan(step_ice, jnp.zeros((NY, NX), dtype), 80)
    pts = NY * NX / dt_s
    rec = {"metric": "ice_lg15_0p25deg_points_per_s",
           "value": round(pts, 1), "unit": "points/s",
           "backend": "fused" if fused else "jit",
           "vs_baseline": round(pts / BASELINE_CPU_POINTS_S, 2)}
    if fused and "--no-check" not in sys.argv:
        import jax

        @jax.jit
        def run_jit_ice():
            out, _ = flux_step_ice(
                "ice_lg15", 2.0, 10.0, Ts_i, f["t"], f["q"], f["u"],
                f["v"], f["slp"], frice=f["frice"], niter=NITER)
            return (out.QL, out.QH, out.Tau_x, out.Tau_y, out.Evap,
                    out.T_s)

        @jax.jit
        def run_fused_ice():
            return fused_ice_step(
                "ice_lg15", 2.0, 10.0, Ts_i, f["t"], f["q"], f["u"],
                f["v"], f["slp"], frice=f["frice"], niter=NITER)

        rec.update(_parity_fields(
            ("QL", "QH", "Tau_x", "Tau_y", "Evap", "T_s"),
            run_fused_ice(), run_jit_ice()))
    print(json.dumps(rec))


def main_bf16():
    """bf16 speed path for the stateless workloads (BASELINE's "fp32/bf16
    speed paths measured separately") + the precision budget vs fp32.

    bf16 is only offered for the *stateless* algorithms: the skin schemes
    integrate O(1e6 J/m^2) accumulators across time steps, which bf16's
    8-bit mantissa cannot carry (documented budget, docs/SCALING.md)."""
    import jax
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, run_series

    for name, algo, nt, shape in (
            ("ncar_small_grid_bf16_points_per_s", "ncar", 512, (32, 128)),
            ("coare3p0_bulk_1deg_bf16_points_per_s", "coare3p0", 32,
             (181, 360))):
        f32 = _mk_inputs((nt,) + shape, jnp.float32, seed=7)
        names = (("sst", "sst"), ("t_zt", "t"), ("hum_zt", "q"),
                 ("U_zu", "u"), ("V_zu", "v"), ("slp", "slp"))
        cfg = AeroBulkConfig(algo=algo, niter=NITER, use_skin=False)

        inner = 128 if nt * shape[0] * shape[1] < 3e6 else 32

        def mk_run(dtype):
            forcing = {k: f32[n].astype(dtype) for k, n in names}

            @jax.jit
            def run(salt, carry):
                # one dispatch = `inner` serially-dependent whole-batch
                # solves — same chaining as stateless_batched; a single
                # solve is too small against the ~30 ms tunnel dispatch
                # overhead for the slope to resolve reliably.
                def body(c, _):
                    fc = dict(forcing)
                    fc["sst"] = fc["sst"] + salt + c * 1e-30
                    out, _ = run_series(cfg, fc, batch_records=True)
                    return (out.QL.mean() + out.QH.mean()
                            + out.Tau_x.mean() + c * 1e-30), None
                c, _ = jax.lax.scan(body, carry, None, length=inner)
                return c

            @jax.jit
            def outputs():
                out, _ = run_series(cfg, forcing, batch_records=True)
                return out.QL, out.QH, out.Tau_x
            return run, outputs

        run16, out16 = mk_run(jnp.bfloat16)
        _, out32 = mk_run(jnp.float32)

        # precision budget: bf16 vs fp32 relative error on the fluxes
        a = [np.asarray(x, np.float64) for x in out16()]
        b = [np.asarray(x, np.float64) for x in out32()]
        rel = np.concatenate([
            (np.abs(x - y)
             / np.maximum(np.abs(y), 1e-3 * np.median(np.abs(y)))).ravel()
            for x, y in zip(a, b)])
        nan_frac = float(np.mean(~np.isfinite(rel)))
        rel = rel[np.isfinite(rel)]   # NaNs counted separately (the Goff
        #                               10**x chain overflows bf16)

        def chained(m):
            c = jnp.zeros((), jnp.bfloat16)
            for i in range(m):
                c = run16(c * 1e-30 + jnp.bfloat16(i) * 1e-6, c)
            return c

        dt_s = _slope_time(chained) / inner
        pts = nt * shape[0] * shape[1] / dt_s
        print(json.dumps({
            "metric": name, "value": round(pts, 1), "unit": "points/s",
            "vs_baseline": round(pts / BASELINE_CPU_POINTS_S, 2),
            "bf16_vs_fp32_median_rel": float(np.median(rel)),
            "bf16_vs_fp32_p99_rel": float(np.percentile(rel, 99)),
            "bf16_nonfinite_frac": nan_frac,
        }))


def main_grad():
    """Adjoint throughput: one value+gradient evaluation of a scalar flux
    loss (sum QL+QH) through the full skin-enabled step, d/dSST on the
    0.25-degree grid.  Two rows: the fused Pallas primal with its custom
    VJP (backward pass = AD of the jit path, kernels/fused.py
    ``_fused_step_ad``) and pure jit-path AD.  ``points/s`` counts grid
    points per complete value+grad evaluation — the speed a
    data-assimilation / calibration loop sees per iteration."""
    import jax
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, flux_step, init_skin_state
    from aerobulk_tpu.kernels.fused import fused_flux_step

    niter = _arg_niter()
    dtype = jnp.float32
    shape = (NY, NX)
    I = _mk_inputs(shape, dtype)
    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=niter,
                         use_skin=True)
    state = init_skin_state(cfg, shape, dtype)

    def loss_fused(sst, grad_backend="jit"):
        outs, _ = fused_flux_step(cfg, sst, I["t"], I["q"], I["u"], I["v"],
                                  I["slp"], I["rsw"], I["rlw"], lon=I["lon"],
                                  isecday_utc=43200, skin_state=state,
                                  grad_backend=grad_backend)
        return jnp.sum(outs[0] + outs[1])

    def jit_core(sst):
        out, _ = flux_step(cfg, sst, I["t"], I["q"], I["u"], I["v"],
                           I["slp"], rad_sw=I["rsw"], rad_lw=I["rlw"],
                           isecday_utc=43200, lon=I["lon"], skin_state=state)
        return jnp.sum(out.QL + out.QH)

    def loss_jit(sst):
        return jit_core(sst)

    def loss_jit_remat(sst):
        # whole-forward rematerialization: residuals are not stored at
        # all, the backward recomputes the forward fused into cotangent
        # consumers — the same lever grad_remat pulls inside the fused
        # kernel's custom VJP.  prevent_cse=False: the default CSE
        # barriers made the XLA compile non-terminating (>40 min, 2
        # runs) on this 4400-op/pt elementwise graph; under jit the
        # barriers are not needed for correctness (jax docs) and without
        # them the compile completes.
        return jax.checkpoint(jit_core, prevent_cse=False)(sst)

    record = {
        "metric": "coare3p6_skin_0p25deg_value_and_grad_points_per_s",
        "unit": "points/s", "niter": niter,
        "note": ("one complete value+gradient (d sum(QL+QH) / d SST) per "
                 "'evaluation'; fused = Pallas primal + custom-VJP "
                 "(jit-path AD) backward; *_remat = backward's forward "
                 "rematerialized (jax.checkpoint) instead of storing "
                 "residuals"),
    }
    variants = (
        ("fused", loss_fused),
        ("fused_pallas", lambda sst: loss_fused(sst,
                                                grad_backend="pallas")),
        ("fused_remat", lambda sst: loss_fused(sst, grad_backend="remat")),
        ("jit", loss_jit),
        ("jit_remat", loss_jit_remat),
    )
    only = [a.split("=", 1)[1] for a in sys.argv
            if a.startswith("--variants=")]
    if only:
        sel = set(only[0].split(","))
        variants = tuple(v for v in variants if v[0] in sel)
    for name, loss in variants:
        grad_fn = jax.grad(loss)

        def step(sst):
            # serially dependent: the (tiny) gradient feeds the next input
            return sst + 1.0e-20 * grad_fn(sst)

        dt = _timeit_scan(step, I["sst"], reps=8)
        record[f"{name}_points_per_s"] = round(NY * NX / dt, 1)
        print(f"# {name}: {NY * NX / dt:.4g} pts/s", file=sys.stderr,
              flush=True)

    if "--no-check" not in sys.argv:
        # ON-DEVICE grad correctness (VERDICT r4 weak #2: the numbers
        # lived only in a docstring): the fused custom-VJP gradient
        # (jit-AD backward) AND the fused-Pallas-backward gradient vs
        # pure jit-path AD on the same inputs, on the live chip.
        g_jit = np.asarray(jax.jit(jax.grad(loss_jit))(I["sst"]),
                           np.float64)
        med = float(np.median(np.abs(g_jit)) + 1e-30)
        for tag, gb in (("grad", "jit"), ("grad_pallas", "pallas")):
            g_fused = np.asarray(jax.jit(jax.grad(
                lambda s: loss_fused(s, grad_backend=gb)))(I["sst"]),
                np.float64)
            rel = np.abs(g_fused - g_jit) / np.maximum(np.abs(g_jit),
                                                       1e-3 * med)
            nonfinite = float(np.mean(~np.isfinite(g_fused)))
            record.update({
                f"{tag}_parity_median_rel": float(np.median(rel)),
                f"{tag}_parity_p99_rel": float(np.percentile(rel, 99)),
                f"{tag}_parity_max_rel": float(np.max(rel)),
                f"{tag}_nonfinite_frac": nonfinite,
                # docstring-measured (v5e fp32): median 8.1e-5, p99
                # 4.4e-3 — gate at ~10x margin; the max is denominator
                # conditioning like the forward tail (docs/PARITY.md)
                # and is not gated
                f"{tag}_parity_ok": bool(np.median(rel) < 1e-3
                                         and np.percentile(rel, 99) < 5e-2
                                         and nonfinite == 0.0),
            })

    # headline = the recommended speed path (fused Pallas backward when
    # measured, else the fused custom-VJP baseline)
    for head in ("fused_pallas", "fused"):
        if f"{head}_points_per_s" in record:
            record["value"] = record[f"{head}_points_per_s"]
            record["headline_variant"] = head
            break
    else:
        record["value"] = record[f"{variants[0][0]}_points_per_s"]
    record["vs_baseline"] = round(record["value"] / BASELINE_CPU_POINTS_S, 2)
    print(json.dumps(record))


def _arg_int(name, default):
    for i, a in enumerate(sys.argv):
        if a == name and i + 1 < len(sys.argv):
            return int(sys.argv[i + 1])
        if a.startswith(name + "="):
            return int(a.split("=", 1)[1])
    return default


def _tunnel_bandwidth():
    """Measured H2D / D2H bandwidth of this host<->device link, by slope
    between a small and a large transfer (cancels the fixed per-RPC
    cost).  The sync for H2D is a dependent scalar reduction pulled to
    host (block_until_ready is not a reliable sync on this tunnel)."""
    import time

    import jax
    import jax.numpy as jnp

    def h2d_time(nbytes):
        x = np.empty(nbytes // 4, np.float32)
        x[:16] = np.arange(16)

        def once():
            t0 = time.perf_counter()
            d = jax.device_put(x)
            float(jnp.sum(d[:8]))          # true sync, tiny D2H
            return time.perf_counter() - t0
        return min(once() for _ in range(3))

    def d2h_time(nbytes):
        d = jax.device_put(np.empty(nbytes // 4, np.float32))
        float(jnp.sum(d[:8]))              # ensure resident

        def once(i):
            # np.asarray of a jax.Array is cached after the first pull —
            # add a scalar on device so each timing pulls a FRESH array;
            # the tiny dispatch cost is identical for both sizes and
            # cancels in the slope
            y = d + np.float32(i)
            t0 = time.perf_counter()
            np.asarray(y)
            return time.perf_counter() - t0
        return min(once(i) for i in range(3))

    small, big = 8 << 20, 64 << 20
    h2d = (big - small) / (h2d_time(big) - h2d_time(small))
    d2h = (big - small) / (d2h_time(big) - d2h_time(small))
    return h2d, d2h


def main_streamed():
    """End-to-end STREAMED production run (VERDICT r3 item 1): sustained
    points/s INCLUDING the host->device feed of every record and the
    device->host collection of the fluxes, for >= 24 records of the
    0.25-degree fp32 COARE3.6+skin workload — the reference's flagship
    IO-fed stateful time loop (test_aerobulk_buoy_series_oce.f90:364-537)
    at production scale.  Streams through run_series_pipelined's chunked
    fused mode (one H2D transfer + one fused-scan dispatch per `chunk`
    records, outputs collected asynchronously `inflight` chunks behind).

    Alongside the streamed number the SAME program is timed compute-only
    (device-resident forcing) and the raw tunnel H2D/D2H bandwidth is
    measured, so the gap is attributed: overlap_efficiency is streamed /
    compute-only, and overlap_efficiency_vs_bound divides by the
    best-case rate any pipeline could reach given the measured link
    (min of compute rate and transfer-bound rate).
    """
    import time

    import jax
    import jax.numpy as jnp
    from aerobulk_tpu.api import AeroBulkConfig, init_skin_state, run_series
    from aerobulk_tpu.pipeline import run_series_pipelined

    niter = _arg_niter()
    nrec = _arg_int("--nrec", 48)
    chunk = _arg_int("--chunk", 8)
    nrec = max(chunk, nrec - nrec % chunk)   # whole chunks only
    wire = ("i8d" if "--wire-i8d" in sys.argv
            else "i16" if "--wire-i16" in sys.argv else "f32")
    collect_wire = "i16" if "--collect-i16" in sys.argv else "f32"
    dtype = jnp.float32
    shape = (NY, NX)
    cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=niter,
                         use_skin=True)
    backend = "fused" if _use_fused() else "jit"

    rng = np.random.default_rng(42)
    base = {
        "sst": (285.0 + 15.0 * rng.random(shape)).astype(np.float32),
        "t_zt": (283.0 + 17.0 * rng.random(shape)).astype(np.float32),
        "hum_zt": (0.004 + 0.012 * rng.random(shape)).astype(np.float32),
        "U_zu": rng.normal(0.0, 6.0, shape).astype(np.float32),
        "V_zu": rng.normal(0.0, 6.0, shape).astype(np.float32),
        "slp": (98000.0 + 4000.0 * rng.random(shape)).astype(np.float32),
        "rad_sw": (500.0 * rng.random(shape)).astype(np.float32),
        "rad_lw": (250.0 + 150.0 * rng.random(shape)).astype(np.float32),
    }
    lon = jnp.asarray(360.0 * rng.random(shape), dtype)

    # per-record evolution factors, precomputed fp32 so the streamed run
    # and the on-device reference apply BITWISE-identical arithmetic:
    # slow SST ramp, diurnal air-temperature wobble, and a full diurnal
    # shortwave cycle (the hard case for the i8d delta wire — dawn/dusk
    # records change rad_sw by a large fraction of its span)
    jts = np.arange(nrec)
    sst_off = (0.01 * jts).astype(np.float32)
    t_off = (0.3 * np.sin(2 * np.pi * jts / 24.0)).astype(np.float32)
    r_fac = np.clip(np.sin(2 * np.pi * jts / 24.0), 0.0,
                    1.0).astype(np.float32)

    def records(n):
        # sst/t_zt/rad_sw vary per record (fresh bytes); the other
        # fields are re-sent each record exactly as a real forcing
        # stream would be
        for jt in range(n):
            rec = dict(base)
            rec["sst"] = base["sst"] + sst_off[jt]
            rec["t_zt"] = base["t_zt"] + t_off[jt]
            rec["rad_sw"] = base["rad_sw"] * r_fac[jt]
            rec["isecday_utc"] = np.int32((jt * 3600) % 86400)
            yield rec

    run_kw = dict(chunk=chunk, backend=backend, lon=lon, inflight=2,
                  wire=wire, collect_wire=collect_wire)

    # warmup: compiles the chunked fused scan (+ materializes collection)
    _, state_w = run_series_pipelined(cfg, records(chunk), **run_kw)
    del state_w

    t0 = time.perf_counter()
    results, state = run_series_pipelined(cfg, records(nrec), **run_kw)
    np.asarray(state.dT_wl)                       # final true sync
    streamed_s = time.perf_counter() - t0
    assert len(results) == nrec // chunk
    streamed_pts = nrec * NY * NX / streamed_s

    # compute-only: the same chunked fused-scan program, forcing resident
    # on device, same number of dispatches, one final D2H sync
    forcing_dev = {k: jax.device_put(
        np.broadcast_to(v, (chunk,) + shape).copy()) for k, v in
        base.items()}
    isd_dev = jax.device_put(
        np.arange(chunk, dtype=np.int32) * 3600 % 86400)
    ckw = dict(backend=backend)
    if backend == "fused":
        ckw.update(fused_block=(32, 256))

    @jax.jit
    def chunk_scan(fc, isd, st):
        return run_series(cfg, fc, skin_state=st, isecday_utc=isd,
                          lon=lon, **ckw)

    state0 = init_skin_state(cfg, shape, dtype)
    _, st = chunk_scan(forcing_dev, isd_dev, state0)   # compile
    np.asarray(st.dT_wl)
    t0 = time.perf_counter()
    st = state0
    for _ in range(nrec // chunk):
        _, st = chunk_scan(forcing_dev, isd_dev, st)
    np.asarray(st.dT_wl)
    compute_s = time.perf_counter() - t0
    compute_pts = nrec * NY * NX / compute_s

    h2d, d2h = _tunnel_bandwidth()
    # bytes per value on the wire: i8d ships one int16 base + (chunk-1)
    # int8 deltas per chunk
    in_width = {"f32": 4.0, "i16": 2.0,
                "i8d": (chunk + 1) / chunk}[wire]
    out_width = 2 if collect_wire == "i16" else 4
    bytes_in = int(8 * in_width * NY * NX)  # 8 forcing fields per record
    bytes_out = 4 * out_width * NY * NX     # QL/QH/Tau/Evap collected
    # best case any pipeline could do on this link: compute and the two
    # transfer directions fully overlapped, each record still must move
    transfer_bound = 1.0 / (bytes_in / h2d + bytes_out / d2h)  # rec/s
    bound_pts = min(compute_pts, transfer_bound * NY * NX)

    check_fields = {}
    if "--no-check" not in sys.argv:
        # ON-DEVICE output-correctness check (VERDICT r4 item 3): the
        # streamed run's COLLECTED outputs (including the i16 wire's
        # quantize-on-host / reconstruct-on-device leg and the packed
        # read-back) are compared against a device-resident run_series
        # over the identical forcing — closing the last untested link in
        # the streamed claim.  The reference forcing is built ON device
        # (broadcast + record-axis ramp) so the check itself does not
        # depend on the host link.
        ncheck = min(2 * chunk, nrec)
        isd_chk = jnp.arange(ncheck, dtype=jnp.int32) * 3600 % 86400
        base_dev = {k: jax.device_put(v) for k, v in base.items()}

        sst_off_d = jnp.asarray(sst_off[:ncheck])[:, None, None]
        t_off_d = jnp.asarray(t_off[:ncheck])[:, None, None]
        r_fac_d = jnp.asarray(r_fac[:ncheck])[:, None, None]

        @jax.jit
        def ref_run():
            fc = {k: jnp.broadcast_to(v, (ncheck,) + shape)
                  for k, v in base_dev.items()}
            fc["sst"] = base_dev["sst"][None] + sst_off_d
            fc["t_zt"] = base_dev["t_zt"][None] + t_off_d
            fc["rad_sw"] = base_dev["rad_sw"][None] * r_fac_d
            out, _ = run_series(cfg, fc, isecday_utc=isd_chk, lon=lon,
                                **ckw)
            tau = (jnp.hypot(out.Tau_x, out.Tau_y) if out.Tau is None
                   else out.Tau)
            return out.QL, out.QH, tau, out.Evap

        ref = [np.asarray(x) for x in ref_run()]
        got = [np.concatenate([np.asarray(r[k])
                               for r in results[:ncheck // chunk]])
               for k in ("QL", "QH", "Tau", "Evap")]
        pf = _parity_fields(("QL", "QH", "Tau", "Evap"), got, ref)
        # wire-dependent gate: the exact-f32 stream runs the SAME chunked
        # fused-scan program as the reference (state carry across chunk
        # boundaries is exact) so it must sit at roundoff; the i16 wire
        # carries the documented (max-min)/131068 input quantization,
        # whose flux image measures median rel ~1e-4 (docs/SCALING.md) —
        # gated at 10x; packed read-back adds span/65534 on the outputs.
        quantized = (wire != "f32") or (collect_wire == "i16")
        med_gate, sig_gate = (1e-3, 1e-3) if quantized else (1e-6, 1e-5)
        check_fields = {
            "streamed_check_records": ncheck,
            "streamed_check_median_rel": pf["parity_median_rel"],
            "streamed_check_p99_rel": pf["parity_p99_rel"],
            "streamed_check_worst_frac_abs_gt_10pct_median":
                pf["parity_worst_frac_abs_gt_10pct_median"],
            "streamed_check_max_by_var": pf["parity_max_by_var"],
            "streamed_check_ok": bool(
                pf["parity_median_rel"] < med_gate
                and pf["parity_worst_frac_abs_gt_10pct_median"] < sig_gate),
        }

    record = {
        "metric": "coare3p6_skin_0p25deg_streamed_points_per_s"
                  + ({"i16": "_i16wire", "i8d": "_i8dwire"}.get(wire, ""))
                  + ("_i16out" if collect_wire == "i16" else ""),
        "unit": "points/s", "niter": niter, "nrec": nrec, "chunk": chunk,
        "backend": backend, "wire": wire, "collect_wire": collect_wire,
        "value": round(streamed_pts, 1),
        "vs_baseline": round(streamed_pts / BASELINE_CPU_POINTS_S, 2),
        "streamed_wall_s": round(streamed_s, 3),
        "records_per_s": round(nrec / streamed_s, 3),
        "compute_only_points_per_s": round(compute_pts, 1),
        "overlap_efficiency": round(streamed_pts / compute_pts, 4),
        "h2d_gbps": round(h2d / 1e9, 3),
        "d2h_gbps": round(d2h / 1e9, 3),
        "bytes_h2d_per_record": bytes_in,
        "bytes_d2h_per_record": bytes_out,
        "bound_points_per_s": round(bound_pts, 1),
        "overlap_efficiency_vs_bound": round(streamed_pts / bound_pts, 4),
    }
    record.update(check_fields)
    print(json.dumps(record))


if __name__ == "__main__":
    if "--all" in sys.argv:
        main_all()
    elif "--bf16" in sys.argv:
        main_bf16()
    elif "--grad" in sys.argv:
        main_grad()
    elif "--streamed" in sys.argv:
        main_streamed()
    else:
        main()
