"""Block-shape autotuner for the fused Pallas kernels.

The fused flux kernel is a very deep elementwise graph, and the VMEM tile
shape is the single knob that moves its throughput (measured spread is
2-3x between good and bad blocks on v5e — kernels/fused.py docstring).
The right shape depends on the chip generation, dtype, and algorithm
config, so rather than hardcoding folklore this module measures it on the
live device with the slope-timing methodology (fixed RPC overheads
cancel; see profiling.slope_time).

Usage:
    from aerobulk_tpu.kernels.tune import tune_fused_blocks
    results = tune_fused_blocks()          # [(block, points/s), ...] best-first
or from the shell:
    python -m aerobulk_tpu.cli tune [--blocks 32x256,16x512,...]
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

# Candidate tiles: multiples of the fp32 (8, 128) register tile, spanning
# the tall/wide tradeoff around the empirically good ~8k-element sizes.
DEFAULT_BLOCKS: Tuple[Tuple[int, int], ...] = (
    (32, 256), (16, 512), (8, 1024), (32, 512), (64, 256), (16, 256),
)


def _bench_inputs(shape, dtype, seed=42):
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    sst = 285.0 + 15.0 * rng.random(shape)
    fields = (sst, sst + rng.normal(0.0, 2.0, shape),
              0.004 + 0.012 * rng.random(shape),
              rng.normal(0.0, 6.0, shape), rng.normal(0.0, 6.0, shape),
              98000.0 + 4000.0 * rng.random(shape),
              500.0 * rng.random(shape),
              250.0 + 150.0 * rng.random(shape),
              360.0 * rng.random(shape))
    return tuple(jnp.asarray(f, dtype) for f in fields)


def tune_fused_blocks(cfg=None, shape=(721, 1440),
                      blocks: Sequence[Tuple[int, int]] = DEFAULT_BLOCKS,
                      dtype=None, reps: int = 10,
                      interpret: Optional[bool] = None):
    """Measure the fused flux kernel at each block shape on the live
    device.  Returns ``[((by, bx), points_per_s), ...]`` sorted fastest
    first.  ``reps`` time records are chained per dispatch (lax.scan with
    the skin state as carry, exactly the production series shape)."""
    import jax
    import jax.numpy as jnp

    from ..api import AeroBulkConfig, init_skin_state
    from ..profiling import slope_time
    from .fused import fused_flux_step

    if cfg is None:
        cfg = AeroBulkConfig(algo="coare3p6", zt=2.0, zu=10.0, niter=5,
                             use_skin=True)
    dtype = dtype or jnp.float32
    args = _bench_inputs(shape, dtype)
    state0 = init_skin_state(cfg, shape, dtype)

    results = []
    for block in blocks:
        @jax.jit
        def steps(st, acc, salt, _block=block):
            def body(carry, _):
                st, acc = carry
                outs, st = fused_flux_step(
                    cfg, *args[:6], args[6], args[7], lon=args[8],
                    isecday_utc=43200, skin_state=st, block=_block,
                    interpret=interpret)
                return (st, acc + outs[0] + outs[1]), None
            (st, acc), _ = jax.lax.scan(body, (st, acc + salt), None,
                                        length=reps)
            return st, acc

        def chained(m):
            st, acc = state0, jnp.zeros(shape, dtype)
            for i in range(m):
                st, acc = steps(st, acc, jnp.asarray(i * 1e-6, dtype))
            return acc[:1, :1]

        dt = slope_time(chained) / reps
        results.append((block, shape[0] * shape[1] / dt))

    return sorted(results, key=lambda r: -r[1])


def tune_fused_mixed_blocks(shape=(721, 1440),
                            blocks: Sequence[Tuple[int, int]] = DEFAULT_BLOCKS,
                            dtype=None, reps: int = 10, niter: int = 5,
                            interpret: Optional[bool] = None):
    """Same sweep for the mixed ocean+ice kernel (``fused_mixed_step``).
    The scan body threads the carry into the SST input so XLA cannot
    hoist the loop-invariant flux computation (stateless kernel)."""
    import jax
    import jax.numpy as jnp

    from ..profiling import slope_time
    from .fused import fused_mixed_step

    dtype = dtype or jnp.float32
    rng = np.random.default_rng(42)
    sst = jnp.asarray(250.0 + 25.0 * rng.random(shape), dtype)
    Ts_i = jnp.minimum(sst, 271.0)
    t = jnp.asarray(np.asarray(sst) + rng.normal(0.0, 2.0, shape), dtype)
    q = jnp.asarray(0.0005 + 0.012 * rng.random(shape), dtype)
    u = jnp.asarray(rng.normal(0.0, 6.0, shape), dtype)
    v = jnp.asarray(rng.normal(0.0, 6.0, shape), dtype)
    slp = jnp.asarray(98000.0 + 4000.0 * rng.random(shape), dtype)
    frice = jnp.asarray(rng.random(shape), dtype)

    results = []
    for block in blocks:
        @jax.jit
        def steps(c, salt, _block=block):
            def body(c, _):
                QL, QH, Tau, E, Ts = fused_mixed_step(
                    2.0, 10.0, Ts_i, sst + c * 1e-30, t, q, u, v, slp,
                    frice, niter=niter, block=_block, interpret=interpret)
                return c + QL + Tau, None
            c, _ = jax.lax.scan(body, c + salt, None, length=reps)
            return c

        def chained(m):
            c = jnp.zeros(shape, dtype)
            for i in range(m):
                c = steps(c, jnp.asarray(i * 1e-6, dtype))
            return c[:1, :1]

        dt = slope_time(chained) / reps
        results.append((block, shape[0] * shape[1] / dt))

    return sorted(results, key=lambda r: -r[1])
