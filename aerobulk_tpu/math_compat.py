"""Math primitives with Pallas-TPU-safe fallbacks.

Mosaic (the Pallas TPU compiler) lacks lowerings for a few transcendental
primitives (``atan`` at least).  The algorithm library routes those
through this module: by default they are the stock jnp primitives (exact,
used by the jit path and all fp64 parity tests); inside a Pallas kernel
trace the wrapper flips :func:`use_pallas_safe` on and they become
implementations built from primitives Mosaic does lower (exp/log/sqrt/
mul/add/select).

The polynomial arctan below is accurate to ~2 ulp in float32 — well under
the fp32 speed path's tolerance; the fp64 validation path never uses it.
"""

from __future__ import annotations

import contextlib
import math

import jax.numpy as jnp

_PALLAS_SAFE = False


def is_pallas_safe() -> bool:
    """True while tracing inside :func:`pallas_safe_math` — lets other
    modules swap gather/table formulations for Mosaic-lowerable ones."""
    return _PALLAS_SAFE


@contextlib.contextmanager
def pallas_safe_math():
    """Trace-time switch: route transcendentals through Mosaic-lowerable
    implementations while tracing a Pallas kernel body."""
    global _PALLAS_SAFE
    prev = _PALLAS_SAFE
    _PALLAS_SAFE = True
    try:
        yield
    finally:
        _PALLAS_SAFE = prev


# Chebyshev-fitted coefficients for atan(x)/x on [0, 1] as a polynomial in
# t = x^2; max abs error 2.2e-11 over [0, 1] — far below fp32 resolution
_ATAN_COEF = (
    0.9999999999690052,
    -0.3333333275037403,
    0.19999972769201463,
    -0.14285157342544844,
    0.11104856582942332,
    -0.09047434077423525,
    0.07491169279402143,
    -0.060166111270740785,
    0.043612075902909254,
    -0.026017881624684214,
    0.011463261184154163,
    -0.0032183971344754473,
    0.00042447178142867193,
)


# Shorter fit for the float32 kernel path: max abs error 1.2e-8 over [0, 1]
# (below fp32 resolution of atan), 4 fewer links in the Horner chain
_ATAN_COEF_F32 = (
    0.9999999842426354,
    -0.3333306678069165,
    0.199924835785032,
    -0.1420257051170999,
    0.1063675409814756,
    -0.07495445443355744,
    0.042587607465590586,
    -0.016005030503601383,
    0.0028340642990060676,
)


def _atan_poly01(x):
    """atan(x) for x in [0, 1] via odd polynomial (Horner in x^2)."""
    coefs = (_ATAN_COEF_F32 if jnp.result_type(x) == jnp.float32
             else _ATAN_COEF)
    t = x * x
    acc = jnp.zeros_like(x) + coefs[-1]
    for c in coefs[-2::-1]:
        acc = acc * t + c
    return x * acc


def arctan(x):
    """arctan with a Pallas-safe branch-free fallback."""
    if not _PALLAS_SAFE:
        return jnp.arctan(x)
    ax = jnp.abs(x)
    big = ax > 1.0
    # reduce to [0,1]: atan(a) = pi/2 - atan(1/a) for a > 1
    arg = jnp.where(big, 1.0 / jnp.maximum(ax, 1.0), ax)
    core = _atan_poly01(arg)
    res = jnp.where(big, 0.5 * math.pi - core, core)
    return jnp.copysign(res, x)


def inv_cbrt_1p(s):
    """``(1 + s)**(-1/3)`` for ``s >= 0`` with a Pallas-safe fallback.

    Mosaic has no ``cbrt`` lowering; inside a kernel body this becomes
    ``exp(-log1p(s)/3)`` (1 + s >= 1, so the log is always defined).
    """
    if not _PALLAS_SAFE:
        return 1.0 / jnp.cbrt(1.0 + s)
    return jnp.exp(-jnp.log1p(s) / 3.0)
