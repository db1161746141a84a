"""Roofline accounting for the flux kernels.

Two halves:

* :func:`count_primitives` — trace a flux step and count XLA primitives
  from the jaxpr.  The computation is purely elementwise (no reductions,
  no matmuls), so one equation == one op per grid point: the jaxpr gives
  an *exact* per-point op census, split into transcendental classes
  (exp/log/pow/sqrt/rsqrt/atan/div) and cheap VPU ops (add/mul/select/...).

* :func:`measure_primitive_throughput` — micro-benchmark sustained
  per-element throughput of each primitive class on the live device with
  a tiny Pallas kernel that chains K dependent applications of the op
  (slope-timed over chained dispatches, like bench.py).

:func:`speed_of_light` combines them: assuming the VPU issues one op per
element per slot with no overlap between classes (a *serial-issue* bound —
optimistic on memory, pessimistic on dual-issue), the per-point time is
``sum_class count_c / throughput_c`` and the bound is its inverse.
Comparing measured kernel throughput against this bound answers "are we
at speed-of-light, and which class dominates" (VERDICT round-1 item 4 /
BASELINE.json's per-chip speed-of-light request).
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["count_primitives", "flux_step_counts",
           "measure_primitive_throughput", "speed_of_light"]

#: primitive-name -> cost class
TRANSCENDENTAL = {
    "exp": "exp", "exp2": "exp", "log": "log", "log1p": "log",
    "pow": "pow", "integer_pow": "cheap",  # int powers lower to mults
    "sqrt": "sqrt", "rsqrt": "sqrt", "cbrt": "pow",
    "atan": "atan", "atan2": "atan", "tanh": "exp", "erf": "exp",
    "sin": "atan", "cos": "atan",
    "div": "div",
}
_SKIP = {"broadcast_in_dim", "convert_element_type", "reshape", "squeeze",
         "transpose", "copy", "stop_gradient", "slice", "concatenate",
         "iota", "pad", "bitcast_convert_type"}


def _walk(jx, counts: Counter, mult: int = 1):
    for eqn in jx.eqns:
        name = eqn.primitive.name
        if name == "scan":
            _walk(eqn.params["jaxpr"].jaxpr, counts,
                  mult * eqn.params["length"])
            continue
        if name in ("cond", "while", "switch"):
            # the census's exactness claim relies on straight-line code
            # (+ scan with a static trip count); a data-dependent branch
            # would make "ops per point" ill-defined.  Fail loudly rather
            # than silently over/under-count.
            raise ValueError(
                f"roofline census: data-dependent control flow "
                f"({name!r}) entered the flux step — the exact per-point "
                "op count is no longer well-defined; extend _walk with "
                "an explicit policy for it")
        nested = False
        for p in eqn.params.values():
            inner = getattr(p, "jaxpr", None)
            if inner is not None:
                _walk(inner, counts, mult)
                nested = True
        if nested or name in _SKIP:
            continue
        counts[TRANSCENDENTAL.get(name, "cheap")] += mult


def count_primitives(fn: Callable, *args, **kw) -> Counter:
    """Exact per-point op census of an elementwise function (via jaxpr)."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kw)
    counts: Counter = Counter()
    _walk(jaxpr.jaxpr, counts)
    return counts


def flux_step_counts(cfg=None, algo="coare3p6", niter=5,
                     use_skin=True) -> Counter:
    """Per-point op census of one full flux step (tiny 2-D trace)."""
    from .api import AeroBulkConfig, flux_step, init_skin_state

    if cfg is None:
        cfg = AeroBulkConfig(algo=algo, zt=2.0, zu=10.0, niter=niter,
                             use_skin=use_skin)
    shape = (1, 1)
    z = jnp.zeros(shape, jnp.float32)
    state = init_skin_state(cfg, shape, jnp.float32)

    def fn(sst, t, q, u, v, slp, rsw, rlw, lon, st):
        kw = dict(rad_sw=rsw, rad_lw=rlw, isecday_utc=43200,
                  lon=lon) if cfg.use_skin else {}
        out, ns = flux_step(cfg, sst, t, q, u, v, slp, skin_state=st, **kw)
        return out.QL, out.QH, out.Tau_x, out.Tau_y, out.Evap, out.T_s, ns

    return count_primitives(fn, z + 290.0, z + 289.0, z + 0.01, z + 5.0,
                            z, z + 1.01e5, z + 200.0, z + 350.0, z, state)


# ---------------------------------------------------------------------------
# measured per-primitive throughput (live device)
# ---------------------------------------------------------------------------

_OPS: Dict[str, Callable] = {
    # chained, serially-dependent applications; constants keep values in a
    # stable range so nothing denormalizes or overflows across K steps.
    "exp": lambda x: jnp.exp(-jnp.abs(x) * 0.5) + 0.1,
    "log": lambda x: jnp.log(jnp.abs(x) + 1.1),
    "pow": lambda x: (jnp.abs(x) + 1.1) ** 0.72,
    "sqrt": lambda x: jnp.sqrt(jnp.abs(x) + 1.1),
    "div": lambda x: 1.7 / (jnp.abs(x) + 1.2),
    "atan": None,   # filled below (math_compat polynomial on TPU)
    "cheap": lambda x: x * 1.000001 + 1e-6,
}


def _atan_op(x):
    from .math_compat import arctan
    return arctan(x * 0.9 + 0.05)


def measure_primitive_throughput(shape=(1024, 1024), K=64, P=2,
                                 dtype=jnp.float32, block=(256, 256),
                                 use_pallas=True, m1=1, m2=9,
                                 repeats=3) -> Dict[str, float]:
    """Sustained per-element op throughput [ops/s] per primitive class.

    Each class runs a Pallas kernel (or plain jit on CPU) applying the op
    over ``P`` *independent* value chains of depth ``K`` per element —
    independence exposes instruction-level parallelism (a single dependent
    chain measures issue *latency*).  Config sensitivity, measured on v5e:
    a (256, 256) tile with P=2 reaches ~1.7e12 fma/s; P>=4 over a large
    tile spills the vector register file and drops ~5x; tiny (8, 128)
    tiles are launch-bound.  Slope-timed over chained dispatches so fixed
    dispatch/sync overhead cancels (bench.py methodology).
    """
    from .profiling import slope_time

    _OPS["atan"] = _atan_op
    out = {}
    for name, op in _OPS.items():
        if use_pallas:
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            from .math_compat import pallas_safe_math

            def kernel(x_ref, o_ref, op=op):
                x = x_ref[...]
                lanes = [x + 0.01 * k for k in range(P)]
                with pallas_safe_math():
                    for _ in range(K):
                        lanes = [op(v) for v in lanes]
                acc = lanes[0]
                for v in lanes[1:]:
                    acc = acc + v
                o_ref[...] = acc

            spec = pl.BlockSpec(block, lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
            run = jax.jit(lambda x: pl.pallas_call(
                kernel,
                grid=(shape[0] // block[0], shape[1] // block[1]),
                in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct(shape, dtype))(x))
        else:
            def run(x, op=op):
                lanes = [x + 0.01 * k for k in range(P)]
                for _ in range(K):
                    lanes = [op(v) for v in lanes]
                acc = lanes[0]
                for v in lanes[1:]:
                    acc = acc + v
                return acc
            run = jax.jit(run)

        x0 = jnp.full(shape, 0.37, dtype)

        def chained(m, run=run, x0=x0):
            x = x0
            for i in range(m):
                x = run(x + np.float32(i) * 1e-7)
            return x[:1, :1]

        dt = slope_time(chained, m1=m1, m2=m2, repeats=repeats)
        out[name] = shape[0] * shape[1] * K * P / dt
    return out


def speed_of_light(counts: Counter, throughput: Dict[str, float]) -> dict:
    """Serial-issue bound: points/s if every op class issued serially at
    its micro-benchmarked rate, with the per-class time breakdown.

    CAVEAT (measured, docs/SCALING.md 'Roofline'): this is a *lower*
    bound on attainable throughput, not a ceiling — the real fused
    kernels exceed it several-fold because the VPU retires >1 HLO op per
    slot on their mix (fma pairing, free modifiers) and the per-class
    micro-rates carry large tunnel noise.  Use the fma-ceiling +
    implied-op-rate comparison in tools/run_roofline.py as the
    quantitative roofline; this function is kept for the per-class time
    *breakdown*, which is still indicative of where the slots go."""
    t_point = 0.0
    breakdown = {}
    for cls, n in counts.items():
        thr = throughput.get(cls)
        if thr is None or thr <= 0:
            continue
        t = n / thr
        breakdown[cls] = {"count": int(n), "seconds_frac": t}
        t_point += t
    for v in breakdown.values():
        v["seconds_frac"] = round(v["seconds_frac"] / t_point, 4) \
            if t_point else 0.0
    return {"points_per_s_bound": 1.0 / t_point if t_point else float("inf"),
            "breakdown": breakdown}
