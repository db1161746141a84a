"""Roofline artifact for the fused flux kernels (docs/ROOFLINE.json).

Methodology (docs/SCALING.md "Roofline"):
  1. exact per-point elementwise-op census from the jaxpr
     (aerobulk_tpu.roofline.flux_step_counts; cross-checked against the
     optimized TPU HLO, which is within ~7% — XLA's CSE barely shrinks
     this graph);
  2. the measured VPU ALU ceiling: a Pallas fma micro-kernel with
     register-friendly ILP ((256,256) tile, 2 independent chains) —
     ~1.68e12 fma/s on this v5e;
  3. the kernel-implied sustained op rate: measured points/s x ops/point
     x padding factor, compared against the ceiling.

Per-class transcendental micro-rates are also recorded but are NOISY on
this tunneled device (run-to-run spread up to 5x) — they bound nothing;
the fma ceiling + census is the defensible part.

    python tools/run_roofline.py [--cpu] [--measured coare3p6=5.27e8,...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# measured fused-kernel throughputs (points/s, slope-timed by bench.py;
# override with --measured name=value,...)
MEASURED = {
    "coare3p6_skin_niter5": 5.45e8,   # docs/BENCH_ALL.json 2026-08-21
    "ecmwf_skin_niter5": 3.88e8,      # docs/BENCH_ALL.json 2026-08-21
    "coare3p0_niter5": 1.07e9,        # stateless fused bulk kernel (r4)
    "ncar_niter5": 1.98e9,            # jit batch (already at census limit)
}
PAD_FACTOR = (736 * 1536) / (721 * 1440)   # kernel computes padded tiles
# the batched stateless rows tile a flattened batch: padding is <=1 tile
# on ~2M points (negligible)
PAD_BY_KEY = {"coare3p0_niter5": 1.0, "ncar_niter5": 1.0}


def main():
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    for i, a in enumerate(sys.argv):
        if a == "--measured":              # space-separated form
            spec = sys.argv[i + 1] if i + 1 < len(sys.argv) else ""
        elif a.startswith("--measured="):  # --measured=k=v,... form
            spec = a.split("=", 1)[1]
        else:
            continue
        for kv in spec.split(","):
            if "=" not in kv:
                raise SystemExit(
                    f"--measured expects name=value[,name=value...], "
                    f"got {kv!r}")
            k, v = kv.split("=")
            MEASURED[k] = float(v)
    use_pallas = jax.devices()[0].platform in ("tpu", "axon")

    from aerobulk_tpu.roofline import (flux_step_counts,
                                       measure_primitive_throughput)

    print("measuring primitive throughputs "
          f"({'pallas' if use_pallas else 'jit'})...", flush=True)
    thr = measure_primitive_throughput(use_pallas=use_pallas)
    for k, v in sorted(thr.items()):
        print(f"  {k:6s} {v:.3e} ops/s", flush=True)

    # The ceiling must be the best the ALUs can do: single measurements on
    # this tunneled device occasionally sample a slow dispatch period and
    # under-read by up to ~8x, so take the MAX of repeated fma runs over
    # two register-friendly configs.
    import aerobulk_tpu.roofline as _r
    SANE_MAX = 5e12      # v5e VPU cannot exceed ~4e12 f32 op-slots/s;
    #                      larger readings mean the slope collapsed to noise
    fma_ceiling = 0.0
    saved = dict(_r._OPS)
    try:
        _r._OPS.clear()
        _r._OPS["cheap"] = saved["cheap"]    # time only the fma class
        for (P, K) in ((2, 256), (4, 128)):
            for _ in range(2):
                v = measure_primitive_throughput(
                    shape=(2048, 2048), use_pallas=use_pallas, P=P, K=K,
                    m1=1, m2=9)["cheap"]
                ok = v < SANE_MAX
                if ok:
                    fma_ceiling = max(fma_ceiling, v)
                print(f"  fma probe P={P} K={K}: {v:.3e}"
                      + ("" if ok else "  (rejected: noise)"), flush=True)
    finally:
        _r._OPS.clear()
        _r._OPS.update(saved)
    print(f"  fma ceiling (max sane): {fma_ceiling:.3e} ops/s", flush=True)

    out = {
        "vpu_fma_ceiling_ops_per_s": round(fma_ceiling, 1),
        "vpu_fma_ceiling_note": (
            "Pallas fma micro-kernel, (256,256) tile, 2 independent "
            "chains, large per-dispatch work; ~1.0-1.1e12 fma/s "
            "reproducible on this v5e.  fraction_of_fma_ceiling > 1 is "
            "expected for the real kernels: the VPU retires >1 HLO op "
            "per slot on their mix (fma pairing, free abs/negate "
            "modifiers) — see docs/SCALING.md 'Roofline'."),
        "primitive_ops_per_s_noisy": {
            k: (round(v, 1) if v < SANE_MAX else None)
            for k, v in thr.items()},
        "algos": {},
    }

    for algo, skin, niter in (("coare3p6", True, 5), ("ecmwf", True, 5),
                              ("coare3p6", True, 20),
                              ("coare3p0", False, 5),
                              ("ncar", False, 5), ("andreas", False, 5)):
        counts = flux_step_counts(algo=algo, use_skin=skin, niter=niter)
        key = f"{algo}{'_skin' if skin else ''}_niter{niter}"
        total = int(sum(counts.values()))
        entry = {"ops_per_point": dict(counts), "ops_total": total}
        if key in MEASURED:
            pad = PAD_BY_KEY.get(key, PAD_FACTOR)
            implied = MEASURED[key] * total * pad
            entry["measured_points_per_s"] = MEASURED[key]
            entry["implied_ops_per_s"] = round(implied, 1)
            entry["fraction_of_fma_ceiling"] = round(
                implied / fma_ceiling, 3)
            # HBM traffic: 14 input + 10 output fp32 fields per step
            # (stateless rows: 6 in + 6 out)
            nfields = 12 if not skin else 24
            entry["hbm_gb_per_s"] = round(
                MEASURED[key] * nfields * 4 / 1e9, 1)
        out["algos"][key] = entry
        print(f"{key}: {total} ops/pt"
              + (f", implied {entry['implied_ops_per_s']:.3e} ops/s = "
                 f"{entry['fraction_of_fma_ceiling']:.0%} of fma ceiling"
                 if key in MEASURED else ""), flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "ROOFLINE.json"),
            "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote docs/ROOFLINE.json")


if __name__ == "__main__":
    main()
