"""Fused Pallas kernel for the full flux step (BASELINE.json north star).

The reference's hot loop is ``for point: for jit in 1..nb_iter: ~100
transcendental-heavy flops`` with zero inter-point dependence (SURVEY.md
§3).  On TPU that becomes: tile the (y, x) grid into VMEM blocks, run the
*entire* pipeline — theta conversion, first guess, the unrolled
Monin-Obukhov fixed point, the cool-skin/warm-layer solves, and the bulk
formula — on registers for one tile, and write all outputs in a single
pass.  One HBM read of the 9 inputs + 4 state fields and one HBM write of
the outputs, instead of the several fusion clusters XLA creates for the
same graph.

Because every piece of the algorithm library is pure elementwise jnp, the
kernel body simply *calls the same functions* as the jit path — the jnp
implementation is the correctness oracle and the Pallas kernel cannot
drift from it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..api import AeroBulkConfig, flux_step
from ..math_compat import pallas_safe_math
from ..skin import SkinState


def pallas_available() -> bool:
    """True when a TPU backend (real or interpreted) can run Pallas."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _round_up(x, m):
    return (x + m - 1) // m * m


def _kernel(cfg: AeroBulkConfig,
            sst, t, q, u, v, slp, rsw, rlw, lon, isd,
            dT_wl, Hz_wl, Qnt_ac, Tau_ac,
            QL, QH, Tau_x, Tau_y, Evap, T_s,
            o_dT_wl, o_Hz_wl, o_Qnt_ac, o_Tau_ac):
    """Kernel body: one VMEM tile through the full flux pipeline."""
    state = SkinState(dT_wl=dT_wl[...], Hz_wl=Hz_wl[...],
                      Qnt_ac=Qnt_ac[...], Tau_ac=Tau_ac[...])
    with pallas_safe_math():   # Mosaic lacks some transcendental lowerings
        out, new_state = flux_step(
            cfg, sst[...], t[...], q[...], u[...], v[...], slp[...],
            rad_sw=rsw[...], rad_lw=rlw[...], isecday_utc=isd[...],
            lon=lon[...], skin_state=state)
    QL[...] = out.QL
    QH[...] = out.QH
    Tau_x[...] = out.Tau_x
    Tau_y[...] = out.Tau_y
    Evap[...] = out.Evap
    T_s[...] = out.T_s
    o_dT_wl[...] = new_state.dT_wl
    o_Hz_wl[...] = new_state.Hz_wl
    o_Qnt_ac[...] = new_state.Qnt_ac
    o_Tau_ac[...] = new_state.Tau_ac


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fused(cfg: AeroBulkConfig, block, interpret, args, state):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = args[0].shape
    by, bx = block
    grid = (ny // by, nx // bx)
    spec = pl.BlockSpec((by, bx), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    dtype = args[0].dtype
    n_in = len(args) + 4
    n_out = 10
    outs = pl.pallas_call(
        functools.partial(_kernel, cfg),
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ny, nx), dtype)] * n_out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args, state.dT_wl, state.Hz_wl, state.Qnt_ac, state.Tau_ac)
    (QL, QH, Tau_x, Tau_y, Evap, T_s,
     dT_wl, Hz_wl, Qnt_ac, Tau_ac) = outs
    return (QL, QH, Tau_x, Tau_y, Evap, T_s), SkinState(
        dT_wl=dT_wl, Hz_wl=Hz_wl, Qnt_ac=Qnt_ac, Tau_ac=Tau_ac)


def _mixed_kernel(zt, zu, ice_algo, ocean_algo, niter, humidity,
                  simultaneous,
                  Ts_i, sst, t, q, u, v, slp, frice,
                  QL, QH, Tau, Evap, T_s):
    """Kernel body: one VMEM tile through the mixed ocean+ice pipeline."""
    from ..api import flux_step_mixed
    with pallas_safe_math():
        net, _, _ = flux_step_mixed(
            zt, zu, Ts_i[...], sst[...], t[...], q[...], u[...], v[...],
            slp[...], frice[...], ice_algo=ice_algo, ocean_algo=ocean_algo,
            niter=niter, humidity=humidity, simultaneous=simultaneous)
    QL[...] = net.QL
    QH[...] = net.QH
    Tau[...] = net.Tau
    Evap[...] = net.Evap
    T_s[...] = net.T_s


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fused_mixed(statics, block, interpret, args):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = args[0].shape
    by, bx = block
    grid = (ny // by, nx // bx)
    spec = pl.BlockSpec((by, bx), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    dtype = args[0].dtype
    return pl.pallas_call(
        functools.partial(_mixed_kernel, *statics),
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=[spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((ny, nx), dtype)] * 5,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def fused_mixed_step(zt, zu, Ts_i, sst, t_zt, hum_zt, U_zu, V_zu, slp,
                     frice, ice_algo="ice_lg15", ocean_algo="ecmwf",
                     niter=5, humidity="sh", simultaneous=False,
                     block=(16, 512), interpret=None):
    """Mixed ocean+ice cell (``flux_step_mixed``) as one fused Pallas
    kernel — the ``test_aerobulk_oce+ice.f90`` workload, BASELINE
    config 5.  Stateless (no skin over ice/leads in the reference's
    mixed-cell test).  Returns ``(QL, QH, Tau, Evap, T_s)`` of the
    area-weighted net fluxes.

    Measured reality (v5e, 0.25-degree, fp32, niter=5, slope-timed — see
    bench.py's methodology note): this kernel sustains ~770 Mpts/s vs
    ~525 Mpts/s for the jit path, and is the bench default on TPU.  (An
    earlier harness that conflated fixed RPC overhead with device time
    and let XLA hoist the loop-invariant flux out of the timing scan
    ranked them the other way; slope timing with argument-distinct,
    serially-dependent dispatches settles it.)
    """
    if interpret is None:
        interpret = not pallas_available()

    ny, nx = sst.shape
    by = min(block[0], _round_up(ny, 8))
    bx = min(block[1], _round_up(nx, 128))
    py, px = _round_up(ny, by), _round_up(nx, bx)

    def pad(x):
        return jnp.pad(x, ((0, py - ny), (0, px - nx)), mode="edge")

    args = tuple(pad(x) for x in (Ts_i, sst, t_zt, hum_zt, U_zu, V_zu,
                                  slp, frice))
    statics = (float(zt), float(zu), ice_algo, ocean_algo, int(niter),
               humidity, bool(simultaneous))
    outs = _fused_mixed(statics, (by, bx), bool(interpret), args)
    return tuple(o[:ny, :nx] for o in outs)


def _ice_kernel(zt, zu, ice_algo, niter, humidity, has_frice, algo_kw,
                Ts_i, t, q, u, v, slp, frice,
                QL, QH, Tau_x, Tau_y, Evap, T_s):
    """Kernel body: one VMEM tile through the ice-only flux pipeline."""
    from ..api import flux_step_ice
    with pallas_safe_math():
        out, _ = flux_step_ice(
            ice_algo, zt, zu, Ts_i[...], t[...], q[...], u[...], v[...],
            slp[...], frice=frice[...] if has_frice else None,
            niter=niter, humidity=humidity, **dict(algo_kw))
    QL[...] = out.QL
    QH[...] = out.QH
    Tau_x[...] = out.Tau_x
    Tau_y[...] = out.Tau_y
    Evap[...] = out.Evap
    T_s[...] = out.T_s


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fused_ice(statics, block, interpret, args):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = args[0].shape
    by, bx = block
    grid = (ny // by, nx // bx)
    spec = pl.BlockSpec((by, bx), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    dtype = args[0].dtype
    return pl.pallas_call(
        functools.partial(_ice_kernel, *statics),
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((ny, nx), dtype)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def fused_ice_step(ice_algo, zt, zu, Ts_i, t_zt, hum_zt, U_zu, V_zu, slp,
                   frice=None, niter=5, humidity="sh", block=(16, 512),
                   interpret=None, **algo_kw):
    """Ice-only flux step (``flux_step_ice``) as one fused Pallas kernel —
    the ``test_aerobulk_buoy_series_ice.f90`` workload on a grid.
    Stateless (no skin scheme exists over ice in the reference,
    src/ice/mod_blk_ice_*.f90).  Scalar ``algo_kw`` (e.g. the constant
    neutral coefficients of ``ice_easy``) are baked in as compile-time
    statics.  Returns ``(QL, QH, Tau_x, Tau_y, Evap, T_s)``.
    """
    if interpret is None:
        interpret = not pallas_available()

    ny, nx = Ts_i.shape
    by = min(block[0], _round_up(ny, 8))
    bx = min(block[1], _round_up(nx, 128))
    py, px = _round_up(ny, by), _round_up(nx, bx)

    def pad(x):
        return jnp.pad(x, ((0, py - ny), (0, px - nx)), mode="edge")

    has_frice = frice is not None
    if frice is None:
        frice = jnp.zeros_like(Ts_i)   # placeholder tile; kernel ignores it
    args = tuple(pad(x) for x in (Ts_i, t_zt, hum_zt, U_zu, V_zu, slp,
                                  frice))
    statics = (float(zt), float(zu), ice_algo, int(niter), humidity,
               has_frice, tuple(sorted(algo_kw.items())))
    outs = _fused_ice(statics, (by, bx), bool(interpret), args)
    return tuple(o[:ny, :nx] for o in outs)


def _grad_kernel(cfg, sst, t, q, u, v, slp, rsw, rlw, lon, isd,
                 dT_wl, Hz_wl, Qnt_ac, Tau_ac,
                 cQL, cQH, cTx, cTy, cE, cTs, cdT, cHz, cQn, cTa,
                 g_sst, g_t, g_q, g_u, g_v, g_slp, g_rsw, g_rlw, g_lon,
                 g_dT, g_Hz, g_Qn, g_Ta):
    """Kernel body: one VMEM tile through the FULL BACKWARD pass.

    The fused forward kernel's body literally calls the shared jnp
    library (``flux_step``), so its VJP is obtainable the same way: run
    ``jax.vjp`` *at trace time inside the kernel body* — the resulting
    transpose graph is pure elementwise jnp like the forward, Mosaic
    compiles it tile-resident, and the whole backward pass costs one HBM
    read of inputs+cotangents and one write of the 13 gradients, instead
    of the several XLA fusion clusters the jit-path AD round-trips
    (the same argument that makes the forward kernel ~2.5x the jit
    path)."""
    state = SkinState(dT_wl=dT_wl[...], Hz_wl=Hz_wl[...],
                      Qnt_ac=Qnt_ac[...], Tau_ac=Tau_ac[...])
    with pallas_safe_math():
        def f(sst_, t_, q_, u_, v_, slp_, rsw_, rlw_, lon_, st_):
            out, ns = flux_step(cfg, sst_, t_, q_, u_, v_, slp_,
                                rad_sw=rsw_, rad_lw=rlw_,
                                isecday_utc=isd[...], lon=lon_,
                                skin_state=st_)
            return ((out.QL, out.QH, out.Tau_x, out.Tau_y, out.Evap,
                     out.T_s), ns)

        _, vjp = jax.vjp(f, sst[...], t[...], q[...], u[...], v[...],
                         slp[...], rsw[...], rlw[...], lon[...], state)
        gs = vjp(((cQL[...], cQH[...], cTx[...], cTy[...], cE[...],
                   cTs[...]),
                  SkinState(dT_wl=cdT[...], Hz_wl=cHz[...],
                            Qnt_ac=cQn[...], Tau_ac=cTa[...])))
    g_sst[...] = gs[0]
    g_t[...] = gs[1]
    g_q[...] = gs[2]
    g_u[...] = gs[3]
    g_v[...] = gs[4]
    g_slp[...] = gs[5]
    g_rsw[...] = gs[6]
    g_rlw[...] = gs[7]
    g_lon[...] = gs[8]
    g_dT[...] = gs[9].dT_wl
    g_Hz[...] = gs[9].Hz_wl
    g_Qn[...] = gs[9].Qnt_ac
    g_Ta[...] = gs[9].Tau_ac


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fused_grad(cfg: AeroBulkConfig, block, interpret, args, state, cts):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = args[0].shape
    by, bx = block
    grid = (ny // by, nx // bx)
    spec = pl.BlockSpec((by, bx), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    dtype = args[0].dtype
    n_in = len(args) + 4 + len(cts)
    n_out = 13
    return pl.pallas_call(
        functools.partial(_grad_kernel, cfg),
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((ny, nx), dtype)] * n_out,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args, state.dT_wl, state.Hz_wl, state.Qnt_ac, state.Tau_ac, *cts)


def _fused_bwd_pallas(cfg, block, interpret, diff_args, cotangents):
    """Backward pass as ONE fused Pallas kernel (see _grad_kernel)."""
    (sst, t_zt, hum_zt, U_zu, V_zu, slp, rad_sw, rad_lw, lon,
     isecday_utc, skin_state) = diff_args
    ct_out, ct_state = cotangents

    ny, nx = sst.shape
    by = min(block[0], _round_up(ny, 8))
    bx = min(block[1], _round_up(nx, 128))
    py, px = _round_up(ny, by), _round_up(nx, bx)

    isd = jnp.broadcast_to(jnp.asarray(isecday_utc, sst.dtype), (ny, nx))

    def pad(x):
        return jnp.pad(x, ((0, py - ny), (0, px - nx)), mode="edge")

    args = tuple(pad(x) for x in (sst, t_zt, hum_zt, U_zu, V_zu, slp,
                                  rad_sw, rad_lw, lon, isd))
    state = SkinState(*(pad(x) for x in skin_state))
    cts = tuple(pad(jnp.asarray(x, sst.dtype))
                for x in (*ct_out, *ct_state))

    outs = _fused_grad(cfg, (by, bx), interpret, args, state, cts)
    outs = tuple(o[:ny, :nx] for o in outs)
    g_isd = np.zeros(np.shape(isecday_utc), jax.dtypes.float0)
    return ((*outs[:9], g_isd,
             SkinState(dT_wl=outs[9], Hz_wl=outs[10], Qnt_ac=outs[11],
                       Tau_ac=outs[12])),)


def fused_flux_step(cfg: AeroBulkConfig, sst, t_zt, hum_zt, U_zu, V_zu, slp,
                    rad_sw, rad_lw, lon=None, isecday_utc=43200,
                    skin_state: Optional[SkinState] = None,
                    block=(32, 256), interpret=None, grad_backend="jit"):
    """Run one flux step as a single fused Pallas kernel over 2-D tiles.

    Inputs must be 2-D (y, x).  Shapes are padded up to the block size
    internally (padded lanes compute garbage that is sliced away — cheaper
    than ragged tiling).  Returns ``((QL, QH, Tau_x, Tau_y, Evap, T_s),
    SkinState)``.

    Measured reality (v5e, 0.25-degree grid, fp32, niter=5, COARE3.6+skin,
    slope-timed over chained 10-record scans): this single-pass kernel
    sustains ~525-535 Mpts/s at blocks (32, 256)/(16, 512) vs
    ~190-230 Mpts/s for the plain jit path —
    one HBM read of the inputs and one write of the outputs per step,
    where XLA's fusion clusters round-trip intermediates.  Block size is
    the critical knob on this very deep elementwise graph: (32, 256) ≈
    (16, 512) ≫ (8, 512), (16, 1440), (64, 512).  This kernel is the
    default TPU speed path used by ``bench.py``; the jit path remains the
    semantics reference and the fp64 validation path.

    Numerics: identical math, but fp32 rounding differs from the XLA path
    (op ordering + the Pallas-safe arctan/cbrt), so individual points near
    branch thresholds can diverge; median relative difference is ~5e-5 and
    the physically significant tail (abs error > 10% of the field median)
    is ~2 points per million — fully root-caused in docs/PARITY.md
    "The fp32 tail" (denominator conditioning at the QH zero contour +
    warm-layer regime-boundary flips; tools/fp32_tail.py reproduces).
    ``interpret=True`` runs the kernel through the Pallas interpreter
    (exact jnp semantics, slow); the default ``interpret=None``
    auto-selects interpreter mode on CPU backends so
    ``run_series(backend="fused")`` is portable.
    """
    from ..api import init_skin_state

    if interpret is None:
        interpret = not pallas_available()

    if lon is None:
        lon = jnp.zeros_like(sst)
    if skin_state is None:
        skin_state = init_skin_state(cfg, sst.shape, sst.dtype)

    if grad_backend not in ("jit", "remat", "pallas"):
        raise ValueError(f"fused_flux_step: unknown grad_backend "
                         f"{grad_backend!r} (use 'jit', 'remat' or "
                         "'pallas')")
    return _fused_step_ad(
        (cfg, tuple(block), bool(interpret), grad_backend),
        (sst, t_zt, hum_zt, U_zu, V_zu, slp, rad_sw, rad_lw, lon,
         isecday_utc, skin_state))


def _fused_step_primal(statics, diff_args):
    """Pad, tile through the Pallas kernel, unpad (the primal pass)."""
    cfg, block, interpret = statics[:3]
    (sst, t_zt, hum_zt, U_zu, V_zu, slp, rad_sw, rad_lw, lon,
     isecday_utc, skin_state) = diff_args

    ny, nx = sst.shape
    by = min(block[0], _round_up(ny, 8))
    bx = min(block[1], _round_up(nx, 128))
    py, px = _round_up(ny, by), _round_up(nx, bx)

    # isecday_utc may be a Python int or a traced scalar (run_series scans
    # over a per-record array); broadcast it to a grid field so it tiles
    # like every other input.
    isd = jnp.broadcast_to(
        jnp.asarray(isecday_utc, sst.dtype), (ny, nx))

    def pad(x):
        return jnp.pad(x, ((0, py - ny), (0, px - nx)), mode="edge")

    args = tuple(pad(x) for x in (sst, t_zt, hum_zt, U_zu, V_zu, slp,
                                  rad_sw, rad_lw, lon, isd))
    state = SkinState(*(pad(x) for x in skin_state))

    outs, new_state = _fused(cfg, (by, bx), interpret, args, state)

    def unpad(x):
        return x[:ny, :nx]

    return (tuple(unpad(o) for o in outs),
            SkinState(*(unpad(x) for x in new_state)))


def _jit_equiv(cfg, diff_args):
    """The XLA-path computation with the fused kernel's exact output
    structure — the semantics reference used as the kernel's VJP."""
    (sst, t_zt, hum_zt, U_zu, V_zu, slp, rad_sw, rad_lw, lon,
     isecday_utc, skin_state) = diff_args
    out, new_state = flux_step(cfg, sst, t_zt, hum_zt, U_zu, V_zu, slp,
                               rad_sw=rad_sw, rad_lw=rad_lw,
                               isecday_utc=isecday_utc, lon=lon,
                               skin_state=skin_state)
    return ((out.QL, out.QH, out.Tau_x, out.Tau_y, out.Evap, out.T_s),
            new_state)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_step_ad(statics, diff_args):
    """Differentiable fused step: Pallas has no autodiff rule, so the
    kernel gets a custom VJP whose backward pass differentiates the jit
    path (``api.flux_step``) — the same math the kernel body runs
    (``_kernel`` literally calls ``flux_step``), so primal and cotangents
    are mutually consistent up to the documented fp32 kernel/XLA rounding
    difference (median ~5e-5, docs/PARITY.md).  Measured on a real v5e
    chip (fp32, 32x256 skin-enabled grid): gradient of a nonlinear flux
    loss via this VJP vs jax.grad through the jit path — median rel
    8.1e-5, p99 4.4e-3, all finite; on CPU fp64 (interpret mode) they
    agree to 1e-9 (tests/test_grad.py).

    The backward-pass cost depends on ``grad_backend`` (v5e fp32
    0.25-degree value+grad, slope-timed, 2026-08-21):

    * ``"jit"`` (default, semantics reference): jit-path
      forward+backward — 4.52e7 pts/s (jit-AD end-to-end is 4.26e7).
    * ``"pallas"`` (the speed path): the whole backward runs as ONE
      fused Pallas kernel whose body is ``jax.vjp`` of the same jnp
      library at trace time (``_grad_kernel``) — **1.87e8 pts/s**,
      4.1x the jit backward, by the same one-HBM-pass argument as the
      forward kernel.  bench.py records its on-device parity
      (``grad_pallas_parity_*``).
    * ``"remat"``: measured negative, see ``_fused_step_bwd``.

    This makes ``run_series(backend="fused")`` and
    ``sharded_fused_flux_step`` differentiable end-to-end."""
    return _fused_step_primal(statics, diff_args)


def _fused_step_fwd(statics, diff_args):
    return _fused_step_primal(statics, diff_args), diff_args


def _fused_step_bwd(statics, diff_args, cotangents):
    cfg, block, interpret = statics[:3]
    backend = statics[3] if len(statics) > 3 else "jit"
    if backend == "pallas":
        return _fused_bwd_pallas(cfg, block, interpret, diff_args,
                                 cotangents)
    f = functools.partial(_jit_equiv, cfg)
    if backend == "remat":
        # rematerialize the backward's jit-path forward instead of
        # storing its residuals.  MEASURED NEGATIVE (v5e, 2026-08-21,
        # VERDICT r4 item 4): with checkpoint's default CSE barriers the
        # XLA compile does not terminate (>40 min, two runs); with
        # prevent_cse=False it compiles but XLA CSEs the recompute away
        # and throughput is identical to the plain jit backward
        # (4.27e7 vs 4.26e7 pts/s).  Kept for the record; use
        # grad_backend="pallas" for the real speedup.
        f = jax.checkpoint(f, prevent_cse=False)
    _, vjp = jax.vjp(f, diff_args)
    return vjp(cotangents)


_fused_step_ad.defvjp(_fused_step_fwd, _fused_step_bwd)


# ---------------------------------------------------------------------------
# stateless (bulk-SST) fused kernel — any shape, flattened onto VPU tiles
# ---------------------------------------------------------------------------

def _bulk_kernel(cfg, sst, t, q, u, v, slp,
                 QL, QH, Tau_x, Tau_y, Evap, T_s):
    """Kernel body: one VMEM tile through the stateless flux pipeline."""
    with pallas_safe_math():
        out, _ = flux_step(cfg, sst[...], t[...], q[...], u[...], v[...],
                           slp[...])
    QL[...] = out.QL
    QH[...] = out.QH
    Tau_x[...] = out.Tau_x
    Tau_y[...] = out.Tau_y
    Evap[...] = out.Evap
    T_s[...] = out.T_s


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def _fused_bulk(cfg: AeroBulkConfig, block, interpret, args):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ny, nx = args[0].shape
    by, bx = block
    grid = (ny // by, nx // bx)
    spec = pl.BlockSpec((by, bx), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    dtype = args[0].dtype
    return pl.pallas_call(
        functools.partial(_bulk_kernel, cfg),
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=[spec] * 6,
        out_shape=[jax.ShapeDtypeStruct((ny, nx), dtype)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def fused_bulk_step(cfg: AeroBulkConfig, sst, t_zt, hum_zt, U_zu, V_zu,
                    slp, block=(32, 256), interpret=None):
    """Stateless (bulk-SST, no skin scheme) flux solve as ONE fused Pallas
    kernel, for inputs of ANY shape — the speed path for the batched
    whole-series workloads (``run_series(batch_records=True)``), where
    every record is independent and the computation is purely pointwise.

    The plain-XLA stateless path sustains ~1.0e12 implied elementwise
    ops/s on the 1-degree COARE3.0 workload (2050 ops/pt census x
    5.15e8 pts/s) — well under the ~2.3-2.6e12 the fused skin kernels
    reach (docs/ROOFLINE.json), because XLA splits the graph into several
    fusion clusters with HBM round-trips between them.  This kernel runs
    the whole solve tile-resident, exactly like :func:`fused_flux_step`
    but without the skin-state plumbing.

    Inputs are flattened, edge-padded to a whole number of (by, bx)
    tiles, and the outputs restored to the input shape.  Returns
    ``(QL, QH, Tau_x, Tau_y, Evap, T_s)``.  Gradients: use the jit path
    (this kernel has no custom VJP; the stateless jit path is itself
    fast and differentiable).
    """
    if cfg.use_skin:
        raise ValueError("fused_bulk_step: stateless kernel requires a "
                         "use_skin=False config (use fused_flux_step)")
    if interpret is None:
        interpret = not pallas_available()

    # accept broadcastable inputs / mixed dtypes exactly like the jit
    # path (e.g. a scalar slp): broadcast + promote before tiling
    fields = (sst, t_zt, hum_zt, U_zu, V_zu, slp)
    dtype = jnp.result_type(*fields)
    fields = jnp.broadcast_arrays(*(jnp.asarray(x, dtype) for x in fields))
    shape = fields[0].shape
    n = 1
    for s in shape:
        n *= s
    by, bx = block
    tile = by * bx
    n_pad = -(-n // tile) * tile
    rows = n_pad // bx

    def fold(x):
        x = jnp.ravel(x)
        return jnp.pad(x, (0, n_pad - n), mode="edge").reshape(rows, bx)

    args = tuple(fold(x) for x in fields)
    outs = _fused_bulk(cfg, (by, bx), bool(interpret), args)
    return tuple(jnp.ravel(o)[:n].reshape(shape) for o in outs)
