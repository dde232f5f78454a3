"""Fully-fused Pallas iteration for the momentum-space burst.

The jnp burst body (:mod:`spectralae.train.fft`) materializes, per
iteration, the gradient spectra ``dc/df [M,D,Nx,Nyr]`` and the kernel
spectra ``Cf/Ff`` in HBM (~45 MB round-tripped at 256²).  But every large
intermediate is either *elementwise in ω* or a rank-P DFT projection of the
25-float kernels — so one ω-tile sweep can compute everything on-chip:

  K1 ``grad-project``: per ω-tile, reconstruct Cf/Ff from the compact
     kernels (two [M·D,P]×[P,TW] MXU matmuls), form E=O−Y, S, H, the dc/df
     products, apply Hermitian weights, and accumulate the *projected*
     gradients G_c/G_f [M·D, P] plus the DC-bin bias grads — never writing
     a full-size spectrum.
  K2 ``respectra-conv``: after the (tiny, jnp) inertia update, per ω-tile
     reconstruct the updated Cf/Ff and run the two-stage pointwise conv
     (conv_k semantics, fft_backproplib.cu:162-189 incl. /M scaling and
     DC-bin bias) producing the new output spectrum O and the Hermitian-
     weighted Parseval MSE partial (calc_mse, 480-498).

Per-iteration HBM traffic drops from ~70 MB to ~20 MB (basis + X/Y/O).
Numerical equivalence with the jnp path is tested in interpret mode
(tests/test_fft_pallas.py) and the full burst on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..losses.losses import diversity_gradients
from ..ops import spectral
from ..optim.update import GRAD_CLIP
from .fft import FFTBurstResult

import os as _os

TW = int(_os.environ.get("SPECTRALAE_PALLAS_TW", "2048"))
# ω-tile width (lanes); W = Nx·(Ny/2+1) is padded to a multiple.  2048 keeps
# per-tile VMEM ~4.5 MB and minimizes grid-step overhead (measured best on
# v5e; override via SPECTRALAE_PALLAS_TW).


def _tile_width(nb: int, m: int, d: int) -> int:
    """ω-tile width keeping per-tile temporaries (the [B,M,D,TW] broadcast
    products dominate) within a few MB of VMEM.  An explicit
    SPECTRALAE_PALLAS_TW override is authoritative (rounded down to a
    lane multiple of 128, min 128) — including values below 256."""
    if "SPECTRALAE_PALLAS_TW" in _os.environ:
        return max(128, (TW // 128) * 128)
    budget_lanes = 6 * 1024 * 1024 // (4 * max(1, 10 * nb * m * d))
    tw = 256
    while tw * 2 <= min(TW, budget_lanes):
        tw *= 2
    return tw


@functools.lru_cache(maxsize=4)  # dense [P, Wpad] pairs are ~105 MB at 1024²
def _basis(nk: int, nl: int, nx: int, ny: int, wpad: int):
    """Unweighted restricted-DFT basis, layout [P, Wpad] (see ops/dft.py)."""
    nyr = ny // 2 + 1
    rx = (np.arange(nk) - nk // 2) % nx
    ry = (np.arange(nl) - nl // 2) % ny
    theta = (2 * np.pi * np.outer(rx, np.arange(nx)) / nx)[:, None, :, None] \
        + (2 * np.pi * np.outer(ry, np.arange(nyr)) / ny)[None, :, None, :]
    theta = theta.reshape(nk * nl, nx * nyr)
    cos = np.zeros((nk * nl, wpad), np.float32)
    sin = np.zeros((nk * nl, wpad), np.float32)
    cos[:, : nx * nyr] = np.cos(theta)
    sin[:, : nx * nyr] = np.sin(theta)
    return cos, sin


@functools.lru_cache(maxsize=None)
def _herm_weights(nx: int, ny: int, wpad: int):
    """Per-bin Hermitian double-count weights, zero in the padding
    (canonical per-column constructor: ops/spectral._hermitian_weights)."""
    from ..ops.spectral import _hermitian_weights
    nyr = ny // 2 + 1
    out = np.zeros((wpad,), np.float32)
    out[: nx * nyr] = np.tile(_hermitian_weights(nx, ny), nx)
    return out.reshape(1, wpad)


def _grad_project_kernel(nb, m, d, p, norm, n_norm, mxu_dtype,
                         xr_ref, xi_ref, yr_ref, yi_ref, or_ref, oi_ref,
                         cos_ref, sin_ref, wv_ref, c_ref, f_ref, b_ref,
                         gc_ref, gf_ref, db_ref, dp_ref):
    def mdot(a, bb):
        return jnp.dot(a.astype(mxu_dtype), bb.astype(mxu_dtype),
                       preferred_element_type=jnp.float32)

    """Gradient + projection sweep; ``nb`` frozen frames share the kernels
    and their gradients are batch-averaged (fft_burst_dp semantics; nb=1
    is the reference burst)."""
    i = pl.program_id(0)
    cos = cos_ref[:]                      # [P, TW]
    sin = sin_ref[:]
    tw = cos.shape[-1]
    # kernel spectra tiles from compact kernels: real c ⇒ re=c@cos, im=−c@sin
    cfr = mdot(c_ref[:], cos)
    cfi = -mdot(c_ref[:], sin)
    ffr = mdot(f_ref[:], cos)
    ffi = -mdot(f_ref[:], sin)
    cfr = cfr.reshape(m, d, tw)              # rows m·D+d
    cfi = cfi.reshape(m, d, tw)
    ffr = ffr.reshape(d, m, tw)              # rows d·M+m
    ffi = ffi.reshape(d, m, tw)
    er = (or_ref[:] - yr_ref[:]).reshape(nb, d, tw)
    ei = (oi_ref[:] - yi_ref[:]).reshape(nb, d, tw)
    xr = xr_ref[:].reshape(nb, d, tw)
    xi = xi_ref[:].reshape(nb, d, tw)
    # S_{b,m} = Σ_d E_{b,d} · conj(Ff_{d,m})
    sr = jnp.sum(er[:, :, None] * ffr[None] + ei[:, :, None] * ffi[None],
                 axis=1)                                        # [B, M, TW]
    si = jnp.sum(ei[:, :, None] * ffr[None] - er[:, :, None] * ffi[None],
                 axis=1)
    # H_{b,m} = Σ_d Cf_{m,d} · X_{b,d}  (+ b·Nx·Ny at the DC bin — tile 0,
    # lane 0; note: *no* /M scaling in the gradient's H, a reference quirk)
    hr = jnp.sum(cfr[None] * xr[:, None] - cfi[None] * xi[:, None], axis=2)
    hi = jnp.sum(cfr[None] * xi[:, None] + cfi[None] * xr[:, None], axis=2)
    dc_mask = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1) == 0)
        & (i == 0), 1.0, 0.0)
    hr = hr + b_ref[:][None] * norm * dc_mask[None]

    wv = wv_ref[:]                             # [1, TW] Hermitian weights
    # dc[m,d] = mean_b S_{b,m}·conj(X_{b,d}); df[d,m] = mean_b E_{b,d}·conj(H_{b,m})
    dcr = jnp.sum(sr[:, :, None] * xr[:, None] + si[:, :, None] * xi[:, None],
                  axis=0) * wv                                  # [M, D, TW]
    dci = jnp.sum(si[:, :, None] * xr[:, None] - sr[:, :, None] * xi[:, None],
                  axis=0) * wv
    dfr = jnp.sum(er[:, :, None] * hr[:, None] + ei[:, :, None] * hi[:, None],
                  axis=0) * wv                                  # [D, M, TW]
    dfi = jnp.sum(ei[:, :, None] * hr[:, None] - er[:, :, None] * hi[:, None],
                  axis=0) * wv
    contract = (((1,), (1,)), ((), ()))
    scale = 1.0 / (n_norm * nb)

    def pdot(a, bb):
        return lax.dot_general(a.astype(mxu_dtype), bb.astype(mxu_dtype),
                               contract, preferred_element_type=jnp.float32)

    gc_tile = (pdot(dcr.reshape(m * d, tw), cos)
               - pdot(dci.reshape(m * d, tw), sin))
    gf_tile = (pdot(dfr.reshape(d * m, tw), cos)
               - pdot(dfi.reshape(d * m, tw), sin))

    @pl.when(i == 0)
    def _():
        gc_ref[:] = jnp.zeros_like(gc_ref)
        gf_ref[:] = jnp.zeros_like(gf_ref)
        # DC-bin bias gradients (fft_backproplib.cu:463-473), batch-averaged;
        # lane-0 values extracted via masked reduction (Mosaic-friendly)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, tw), 2) == 0)
        db_ref[:] = jnp.sum(jnp.where(lane0, sr, 0.0),
                            axis=(0, 2))[:, None] * norm * scale
        dp_ref[:] = jnp.sum(jnp.where(lane0, er, 0.0),
                            axis=(0, 2))[:, None] * norm * scale

    gc_ref[:] += gc_tile * scale
    gf_ref[:] += gf_tile * scale


def _respectra_conv_kernel(nb, m, d, norm, inv_m, inv_d, mxu_dtype,
                           xr_ref, xi_ref, yr_ref, yi_ref,
                           cos_ref, sin_ref, wv_ref, c_ref, f_ref,
                           b_ref, p_ref,
                           or_ref, oi_ref, mse_ref):
    def mdot(a, bb):
        return jnp.dot(a.astype(mxu_dtype), bb.astype(mxu_dtype),
                       preferred_element_type=jnp.float32)

    i = pl.program_id(0)
    cos = cos_ref[:]
    sin = sin_ref[:]
    tw = cos.shape[-1]
    cfr = mdot(c_ref[:], cos)
    cfi = -mdot(c_ref[:], sin)
    ffr = mdot(f_ref[:], cos)
    ffi = -mdot(f_ref[:], sin)
    cfr = cfr.reshape(m, d, tw)
    cfi = cfi.reshape(m, d, tw)
    ffr = ffr.reshape(d, m, tw)
    ffi = ffi.reshape(d, m, tw)
    xr = xr_ref[:].reshape(nb, d, tw) * inv_m  # conv_k's /M input scaling
    xi = xi_ref[:].reshape(nb, d, tw) * inv_m
    hr = jnp.sum(cfr[None] * xr[:, None] - cfi[None] * xi[:, None], axis=2)
    hi = jnp.sum(cfr[None] * xi[:, None] + cfi[None] * xr[:, None], axis=2)
    dc_mask = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1) == 0) & (i == 0),
        1.0, 0.0)
    hr = hr + b_ref[:][None] * norm * dc_mask[None]
    hr2 = hr * inv_d                           # second conv's /D scaling
    hi2 = hi * inv_d
    our = jnp.sum(ffr[None] * hr2[:, None] - ffi[None] * hi2[:, None],
                  axis=2)                                      # [B, D, TW]
    oui = jnp.sum(ffr[None] * hi2[:, None] + ffi[None] * hr2[:, None],
                  axis=2)
    our = our + p_ref[:][None] * norm * dc_mask[None]
    yr = yr_ref[:].reshape(nb, d, tw)
    yi = yi_ref[:].reshape(nb, d, tw)
    or_ref[:] = our.reshape(nb * d, tw)
    oi_ref[:] = oui.reshape(nb * d, tw)
    diff = (our - yr) ** 2 + (oui - yi) ** 2

    @pl.when(i == 0)
    def _():
        mse_ref[0, 0] = 0.0

    mse_ref[0, 0] += jnp.sum(diff * wv_ref[:][None]) / nb


def _pad_flat(Z, w, wpad):
    flat = Z.reshape(Z.shape[0], w)
    if wpad != w:
        flat = jnp.pad(flat, ((0, 0), (0, wpad - w)))
    return flat


def _split(Z, w, wpad):
    return _pad_flat(Z.real, w, wpad), _pad_flat(Z.imag, w, wpad)


def burst_pallas_body(x: jax.Array, expout: jax.Array, out0: jax.Array,
                      c: jax.Array, f: jax.Array, b: jax.Array, p: jax.Array,
                      mom: tuple | None = None, *, lr: float = 0.2,
                      alpha: float = 0.9, iters: int = 100,
                      maxdiff: bool = False, w0: float = 1.0,
                      w1: float = 10.0, scale_by_dm: bool = True,
                      interpret: bool | None = None,
                      axis_name: str | None = None,
                      mxu_dtype=jnp.float32) -> FFTBurstResult:
    """Drop-in replacement for :func:`spectralae.train.fft.fft_burst`.

    ``x/expout/out0`` may be unbatched ``[D, h, w]`` (the reference burst) or
    batched ``[B, D, h, w]`` — batched inputs train the shared kernel pair
    with batch-averaged gradients (``fft_burst_dp`` semantics).

    The multiobjective diversity term operates on the tiny compact kernels,
    so it stays in plain jnp between the two Pallas sweeps."""
    if interpret is None:
        from ..ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    batched = x.ndim == 4
    if not batched:
        x, expout, out0 = x[None], expout[None], out0[None]
    nb = x.shape[0]
    nx, ny = x.shape[-2], x.shape[-1]
    dM, dD, nk, nl = c.shape
    P = nk * nl
    nyr = ny // 2 + 1
    w = nx * nyr
    tw = min(_tile_width(nb, dM, dD), w)
    wpad = -(-w // tw) * tw
    n_tiles = wpad // tw
    norm = float(nx * ny)
    n_norm = norm * 2.0 * dM * dD * nx * ny
    del_eff = 0.1 * lr
    inv_m = (1.0 / dM) if scale_by_dm else 1.0
    inv_d = (1.0 / dD) if scale_by_dm else 1.0

    cos_np, sin_np = _basis(nk, nl, nx, ny, wpad)
    cosB = jnp.asarray(cos_np)
    sinB = jnp.asarray(sin_np)
    wv = jnp.asarray(_herm_weights(nx, ny, wpad))

    X = spectral.rfft2(x)
    Y = spectral.rfft2(expout)
    O = spectral.rfft2(out0)
    flat = lambda Z: Z.reshape(nb * dD, nx, nyr)
    xr, xi = _split(flat(X), w, wpad)
    yr, yi = _split(flat(Y), w, wpad)
    orr, oii = _split(flat(O), w, wpad)
    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    Dc, Df, Db, Dp = mom
    mse0 = jnp.mean(jax.vmap(
        lambda a, o: spectral.parseval_mse(a, o, dD, dM, nx, ny))(Y, O))
    if axis_name is not None:
        mse0 = lax.pmean(mse0, axis_name)
    mses = jnp.zeros((iters + 1,), x.dtype).at[0].set(mse0)

    tile = lambda r: pl.BlockSpec((r, tw), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    whole = lambda r, cdim: pl.BlockSpec((r, cdim), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)

    k1 = pl.pallas_call(
        functools.partial(_grad_project_kernel, nb, dM, dD, P, norm, n_norm,
                          mxu_dtype),
        grid=(n_tiles,),
        in_specs=[tile(nb * dD)] * 6
        + [tile(P), tile(P), tile(1),
           whole(dM * dD, P), whole(dD * dM, P), whole(dM, 1)],
        out_specs=[whole(dM * dD, P), whole(dD * dM, P),
                   whole(dM, 1), whole(dD, 1)],
        out_shape=[jax.ShapeDtypeStruct((dM * dD, P), jnp.float32),
                   jax.ShapeDtypeStruct((dD * dM, P), jnp.float32),
                   jax.ShapeDtypeStruct((dM, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dD, 1), jnp.float32)],
        interpret=interpret,
    )

    k2 = pl.pallas_call(
        functools.partial(_respectra_conv_kernel, nb, dM, dD, norm,
                          inv_m, inv_d, mxu_dtype),
        grid=(n_tiles,),
        in_specs=[tile(nb * dD)] * 4
        + [tile(P), tile(P), tile(1),
           whole(dM * dD, P), whole(dD * dM, P),
           whole(dM, 1), whole(dD, 1)],
        out_specs=[tile(nb * dD), tile(nb * dD),
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nb * dD, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((nb * dD, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        interpret=interpret,
    )

    def inertia(wgt, g, mo):
        dw = (1.0 - alpha) * del_eff * g / jnp.maximum(jnp.abs(g), GRAD_CLIP) \
            + alpha * mo
        return wgt - dw, dw

    def body(i, carry):
        c, f, b, p, Dc, Df, Db, Dp, orr, oii, mses = carry
        gc, gf, db, dp = k1(xr, xi, yr, yi, orr, oii, cosB, sinB, wv,
                            c.reshape(dM * dD, P), f.reshape(dD * dM, P),
                            b[:, None])
        gc = gc.reshape(c.shape)
        gf = gf.reshape(f.shape)
        gb, gp = db[:, 0], dp[:, 0]
        if axis_name is not None:
            # multi-chip DP: average gradients over the mesh (ICI psum)
            gc, gf, gb, gp = jax.tree.map(
                lambda t: lax.pmean(t, axis_name), (gc, gf, gb, gp))
        if maxdiff:
            cd, fd, bd, pd = diversity_gradients(c, f, b, p)
            gc = w0 * gc - w1 * cd
            gf = w0 * gf - w1 * fd
            gb = w0 * gb - w1 * bd
            gp = w0 * gp - w1 * pd
        c, Dc = inertia(c, gc, Dc)
        f, Df = inertia(f, gf, Df)
        b, Db = inertia(b, gb, Db)
        p, Dp = inertia(p, gp, Dp)
        orr, oii, msep = k2(xr, xi, yr, yi, cosB, sinB, wv,
                            c.reshape(dM * dD, P), f.reshape(dD * dM, P),
                            b[:, None], p[:, None])
        mse = msep[0, 0] / (dD * nx * ny) / (2 * dM * nx * ny)
        if axis_name is not None:
            mse = lax.pmean(mse, axis_name)
        mses = mses.at[i + 1].set(mse)
        return (c, f, b, p, Dc, Df, Db, Dp, orr, oii, mses)

    init = (c, f, b, p, Dc, Df, Db, Dp, orr, oii, mses)
    out = lax.fori_loop(0, iters, body, init)
    c, f, b, p, Dc, Df, Db, Dp = out[:8]
    return FFTBurstResult(c=c, f=f, b=b, p=p, mom=(Dc, Df, Db, Dp),
                          mses=out[-1])


fft_burst_pallas = jax.jit(
    burst_pallas_body,
    static_argnames=("iters", "scale_by_dm", "maxdiff", "interpret",
                     "axis_name", "mxu_dtype"))


def auto_burst(x, expout, out0, c, f, b, p, mom=None, *, lr=0.2, alpha=0.9,
               iters=100, maxdiff=False, w0=1.0, w1=10.0, scale_by_dm=True):
    """Pick the fastest correct burst implementation.

    The correlation-space burst (:mod:`spectralae.train.fft_corr`) on TPU —
    O(1) per iteration in resolution; the jnp ω-space path elsewhere.
    """
    from .fft import fft_burst
    from ..ops.pallas_kernels import _on_tpu
    on_tpu = _on_tpu()
    if expout is None and not on_tpu:
        expout = x  # the ω-space fallback has no None handling
    if on_tpu:
        from .fft_corr import fft_burst_corr
        # beyond the reference's 100 inner iterations, re-anchor each 100
        # so the correlation algebra's precision floor follows the error
        return fft_burst_corr(
            x, expout, out0, c, f, b, p, mom, lr=lr, alpha=alpha,
            iters=iters, maxdiff=maxdiff, w0=w0, w1=w1,
            scale_by_dm=scale_by_dm,
            reanchor_every=100 if iters > 100 else None)
    return fft_burst(x, expout, out0, c, f, b, p, mom, lr=lr, alpha=alpha,
                     iters=iters, maxdiff=maxdiff, w0=w0, w1=w1,
                     scale_by_dm=scale_by_dm)


# ---------------------------------------------------------------------------
# Iteration-fused variant: one kernel per iteration.
#
# k2 of iteration n and k1 of iteration n+1 sweep the same ω-tiles with the
# same (just-updated) kernel spectra, so they fuse: per tile, reconstruct
# Cf/Ff once, run the two-stage conv producing the new O and MSE, and
# immediately form the *next* iteration's gradients from that O — halving
# kernel launches and basis reads per iteration.
# ---------------------------------------------------------------------------

def _fused_step_kernel(nb, m, d, p, norm, n_norm, inv_m, inv_d, mxu_dtype,
                       xr_ref, xi_ref, yr_ref, yi_ref,
                       cos_ref, sin_ref, wv_ref, cf_ref, b_ref, p_ref,
                       or_ref, oi_ref, mse_ref,
                       g_ref, db_ref, dp_ref):
    """cf_ref: c and f stacked [2·M·D, P] (rows m·D+d, then M·D + d·M+m);
    g_ref: stacked projected gradients, same row layout — stacking halves
    the MXU-padded dot count (30-row operands pad to 128 anyway)."""
    def mdot(a, bb):
        return jnp.dot(a.astype(mxu_dtype), bb.astype(mxu_dtype),
                       preferred_element_type=jnp.float32)

    i = pl.program_id(0)
    cos = cos_ref[:]
    sin = sin_ref[:]
    tw = cos.shape[-1]
    md = m * d
    allr = mdot(cf_ref[:], cos)          # [2·M·D, TW] spectra re
    alli = -mdot(cf_ref[:], sin)         # spectra im
    cfr = allr[:md].reshape(m, d, tw)
    cfi = alli[:md].reshape(m, d, tw)
    ffr = allr[md:].reshape(d, m, tw)
    ffi = alli[md:].reshape(d, m, tw)
    xr = xr_ref[:].reshape(nb, d, tw)
    xi = xi_ref[:].reshape(nb, d, tw)
    yr = yr_ref[:].reshape(nb, d, tw)
    yi = yi_ref[:].reshape(nb, d, tw)
    dc_mask = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1) == 0) & (i == 0),
        1.0, 0.0)

    # unbiased contraction H₀ = Σ_d Cf·X, shared by forward and gradient
    h0r = jnp.sum(cfr[None] * xr[:, None] - cfi[None] * xi[:, None], axis=2)
    h0i = jnp.sum(cfr[None] * xi[:, None] + cfi[None] * xr[:, None], axis=2)
    bias = b_ref[:][None] * norm * dc_mask[None]

    # ---- forward (conv_k semantics): O and MSE ----
    hfr = (h0r * inv_m + bias) * inv_d
    hfi = h0i * inv_m * inv_d
    our = jnp.sum(ffr[None] * hfr[:, None] - ffi[None] * hfi[:, None], axis=2)
    oui = jnp.sum(ffr[None] * hfi[:, None] + ffi[None] * hfr[:, None], axis=2)
    our = our + p_ref[:][None] * norm * dc_mask[None]
    or_ref[:] = our.reshape(nb * d, tw)
    oi_ref[:] = oui.reshape(nb * d, tw)
    wv = wv_ref[:]
    diff = (our - yr) ** 2 + (oui - yi) ** 2

    @pl.when(i == 0)
    def _():
        mse_ref[0, 0] = 0.0

    mse_ref[0, 0] += jnp.sum(diff * wv[None]) / nb

    # ---- next iteration's gradients from the fresh O ----
    er = our - yr
    ei = oui - yi
    sr = jnp.sum(er[:, :, None] * ffr[None] + ei[:, :, None] * ffi[None],
                 axis=1)
    si = jnp.sum(ei[:, :, None] * ffr[None] - er[:, :, None] * ffi[None],
                 axis=1)
    hgr = h0r + bias        # gradient's H: unscaled contraction + DC bias
    hgi = h0i
    dcr = jnp.sum(sr[:, :, None] * xr[:, None] + si[:, :, None] * xi[:, None],
                  axis=0) * wv
    dci = jnp.sum(si[:, :, None] * xr[:, None] - sr[:, :, None] * xi[:, None],
                  axis=0) * wv
    dfr = jnp.sum(er[:, :, None] * hgr[:, None] + ei[:, :, None] * hgi[:, None],
                  axis=0) * wv
    dfi = jnp.sum(ei[:, :, None] * hgr[:, None] - er[:, :, None] * hgi[:, None],
                  axis=0) * wv
    contract = (((1,), (1,)), ((), ()))

    def pdot(a, bb):
        return lax.dot_general(a.astype(mxu_dtype), bb.astype(mxu_dtype),
                               contract, preferred_element_type=jnp.float32)

    scale = 1.0 / (n_norm * nb)
    d_re = jnp.concatenate([dcr.reshape(md, tw), dfr.reshape(md, tw)], axis=0)
    d_im = jnp.concatenate([dci.reshape(md, tw), dfi.reshape(md, tw)], axis=0)
    g_tile = pdot(d_re, cos) - pdot(d_im, sin)      # [2·M·D, P]

    @pl.when(i == 0)
    def _():
        g_ref[:] = jnp.zeros_like(g_ref)
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, tw), 2) == 0)
        db_ref[:] = jnp.sum(jnp.where(lane0, sr, 0.0),
                            axis=(0, 2))[:, None] * norm * scale
        dp_ref[:] = jnp.sum(jnp.where(lane0, er, 0.0),
                            axis=(0, 2))[:, None] * norm * scale

    g_ref[:] += g_tile * scale


def burst_pallas_fused(x, expout, out0, c, f, b, p, mom=None, *,
                       lr=0.2, alpha=0.9, iters=100, maxdiff=False,
                       w0=1.0, w1=10.0, scale_by_dm=True,
                       interpret=None, axis_name=None,
                       mxu_dtype=jnp.float32) -> FFTBurstResult:
    """Iteration-fused burst: one Pallas sweep per iteration (plus one
    initial gradient sweep).  Semantics identical to ``burst_pallas_body``."""
    if interpret is None:
        from ..ops.pallas_kernels import _on_tpu
        interpret = not _on_tpu()
    batched = x.ndim == 4
    if not batched:
        x, expout, out0 = x[None], expout[None], out0[None]
    nb = x.shape[0]
    nx, ny = x.shape[-2], x.shape[-1]
    dM, dD, nk, nl = c.shape
    P = nk * nl
    nyr = ny // 2 + 1
    w = nx * nyr
    tw = min(_tile_width(nb, dM, dD), w)
    wpad = -(-w // tw) * tw
    n_tiles = wpad // tw
    norm = float(nx * ny)
    n_norm = norm * 2.0 * dM * dD * nx * ny
    del_eff = 0.1 * lr
    inv_m = (1.0 / dM) if scale_by_dm else 1.0
    inv_d = (1.0 / dD) if scale_by_dm else 1.0
    cos_np, sin_np = _basis(nk, nl, nx, ny, wpad)
    cosB = jnp.asarray(cos_np)
    sinB = jnp.asarray(sin_np)
    wv = jnp.asarray(_herm_weights(nx, ny, wpad))
    X = spectral.rfft2(x)
    Y = spectral.rfft2(expout)
    O = spectral.rfft2(out0)
    flat = lambda Z: Z.reshape(nb * dD, nx, nyr)
    xr, xi = _split(flat(X), w, wpad)
    yr, yi = _split(flat(Y), w, wpad)
    orr, oii = _split(flat(O), w, wpad)
    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    Dc, Df, Db, Dp = mom
    mse0 = jnp.mean(jax.vmap(
        lambda a, o: spectral.parseval_mse(a, o, dD, dM, nx, ny))(Y, O))
    if axis_name is not None:
        mse0 = lax.pmean(mse0, axis_name)
    mses = jnp.zeros((iters + 1,), x.dtype).at[0].set(mse0)

    tile = lambda r: pl.BlockSpec((r, tw), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    whole = lambda r, cdim: pl.BlockSpec((r, cdim), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)

    k1 = pl.pallas_call(
        functools.partial(_grad_project_kernel, nb, dM, dD, P, norm, n_norm,
                          mxu_dtype),
        grid=(n_tiles,),
        in_specs=[tile(nb * dD)] * 6
        + [tile(P), tile(P), tile(1),
           whole(dM * dD, P), whole(dD * dM, P), whole(dM, 1)],
        out_specs=[whole(dM * dD, P), whole(dD * dM, P),
                   whole(dM, 1), whole(dD, 1)],
        out_shape=[jax.ShapeDtypeStruct((dM * dD, P), jnp.float32),
                   jax.ShapeDtypeStruct((dD * dM, P), jnp.float32),
                   jax.ShapeDtypeStruct((dM, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dD, 1), jnp.float32)],
        interpret=interpret,
    )

    kstep = pl.pallas_call(
        functools.partial(_fused_step_kernel, nb, dM, dD, P, norm, n_norm,
                          inv_m, inv_d, mxu_dtype),
        grid=(n_tiles,),
        in_specs=[tile(nb * dD)] * 4
        + [tile(P), tile(P), tile(1),
           whole(2 * dM * dD, P),
           whole(dM, 1), whole(dD, 1)],
        out_specs=[tile(nb * dD), tile(nb * dD),
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM),
                   whole(2 * dM * dD, P),
                   whole(dM, 1), whole(dD, 1)],
        out_shape=[jax.ShapeDtypeStruct((nb * dD, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((nb * dD, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((2 * dM * dD, P), jnp.float32),
                   jax.ShapeDtypeStruct((dM, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dD, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            # 4 dots of [2MD, P]x[P/TW] per tile + ~40 elementwise passes
            flops=int(wpad * (16 * dM * dD * P + 40 * nb * dM * dD)),
            bytes_accessed=int(4 * wpad * (8 * nb * dD + 2 * P + 1)),
            transcendentals=0),
        interpret=interpret,
    )
    md = dM * dD

    def inertia(wgt, g, mo):
        dw = (1.0 - alpha) * del_eff * g / jnp.maximum(jnp.abs(g), GRAD_CLIP) \
            + alpha * mo
        return wgt - dw, dw

    # initial gradients from O₀ (the k2k1 fusion covers every later one)
    gc, gf, db, dp = k1(xr, xi, yr, yi, orr, oii, cosB, sinB, wv,
                        c.reshape(dM * dD, P), f.reshape(dD * dM, P),
                        b[:, None])

    def body(i, carry):
        c, f, b, p, Dc, Df, Db, Dp, gc, gf, db, dp, mses = carry
        gcs = gc.reshape(c.shape)
        gfs = gf.reshape(f.shape)
        gb, gp = db[:, 0], dp[:, 0]
        if axis_name is not None:
            gcs, gfs, gb, gp = jax.tree.map(
                lambda t: lax.pmean(t, axis_name), (gcs, gfs, gb, gp))
        if maxdiff:
            cd, fd, bd, pd = diversity_gradients(c, f, b, p)
            gcs = w0 * gcs - w1 * cd
            gfs = w0 * gfs - w1 * fd
            gb = w0 * gb - w1 * bd
            gp = w0 * gp - w1 * pd
        c, Dc = inertia(c, gcs, Dc)
        f, Df = inertia(f, gfs, Df)
        b, Db = inertia(b, gb, Db)
        p, Dp = inertia(p, gp, Dp)
        cf = jnp.concatenate([c.reshape(md, P), f.reshape(md, P)], axis=0)
        _, _, msep, g_all, db, dp = kstep(
            xr, xi, yr, yi, cosB, sinB, wv, cf, b[:, None], p[:, None])
        gc, gf = g_all[:md], g_all[md:]
        mse = msep[0, 0] / (dD * nx * ny) / (2 * dM * nx * ny)
        if axis_name is not None:
            mse = lax.pmean(mse, axis_name)
        mses = mses.at[i + 1].set(mse)
        return (c, f, b, p, Dc, Df, Db, Dp, gc, gf, db, dp, mses)

    init = (c, f, b, p, Dc, Df, Db, Dp, gc, gf, db, dp, mses)
    out = lax.fori_loop(0, iters, body, init)
    c, f, b, p, Dc, Df, Db, Dp = out[:8]
    return FFTBurstResult(c=c, f=f, b=b, p=p, mom=(Dc, Df, Db, Dp),
                          mses=out[-1])


fft_burst_pallas_fused = jax.jit(
    burst_pallas_fused,
    static_argnames=("iters", "maxdiff", "scale_by_dm", "interpret",
                     "axis_name", "mxu_dtype"))
