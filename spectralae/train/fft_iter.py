"""Iteration-grid momentum-space burst: the WHOLE burst as one pallas_call.

The round-1 fused path (:mod:`spectralae.train.fft_pallas`) still pays, per
inner iteration, one kernel launch plus ``fori_loop`` glue and a jnp inertia
update — ~half the measured iteration time at 256² (the VPU compute floor is
~50 µs/iter; the two-kernel path sits at ~100).  Here the reference's 100-
iteration loop (source/fft_backproplib.cu:1446-1464) maps onto a single
Pallas grid:

    grid = (iters + 1, n_tiles)        # ω-tile index fastest

- ω-tiles of the restricted-DFT basis (cos/sin) and the frozen spectra
  X/Y stream HBM→VMEM through Pallas's automatic pipeline — double-buffered
  fetches overlap the previous tile's compute (the streaming the round-1 all-VMEM mega-kernel experiment lacked;
  that kernel measured 20% slower than the two-kernel path and was
  removed once this one and the correlation burst strictly beat it).
- Weights, biases, momenta, and the projected-gradient accumulator live in
  VMEM for the whole burst (constant-index-map outputs / scratch); the
  output spectrum O persists in a VMEM scratch, never touching HBM.
- Grid step (i, j): at j==0 apply the inertia update from iteration i−1's
  accumulated gradients, then reconstruct the kernel-spectra tile (two MXU
  matmuls from the compact kernels), run the two-stage pointwise conv
  (conv_k semantics incl. /M·/D scaling and DC-bin bias,
  fft_backproplib.cu:162-189), accumulate the Parseval MSE partial
  (calc_mse, 480-498), and accumulate the *projected* gradients
  (gradient_k_io → shrink_k, 395-475 + 535-565) for the next iteration.
- Grid step (0, j) is the initial gradient pass on the caller-provided O₀
  (the burst trains against the frozen first output, 1430-1432), which also
  yields mses[0].

Per-bin Hermitian weights are folded into E = O−Y once (two [B·D, TW]
multiplies) instead of weighting the four [M·D, TW] gradient products;
``diff·w = E·(E·w)`` recovers the weighted MSE exactly.

Semantics are identical to ``fft_burst``/``burst_pallas_fused`` (equality-
tested in tests/test_fft_pallas.py).  This is the fastest *ω-space* burst;
the default TPU burst is the correlation-space one (train/fft_corr.py),
which sidesteps ω entirely.  Kept as the numerically-conservative
alternative: it accumulates per-bin like the reference, with no
large-term cancellation at convergence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import spectral
from ..optim.update import GRAD_CLIP
from .fft import FFTBurstResult
from .fft_pallas import _basis, _herm_weights, _split, _tile_width


def _itergrid_kernel(nb, m, d, p_sup, norm, n_norm, inv_m, inv_d, tw,
                     mxu_dtype,
                     # streamed per ω-tile
                     xr_ref, xi_ref, yr_ref, yi_ref, o0r_ref, o0i_ref,
                     cos_ref, sin_ref, wv_ref,
                     # whole-burst constants
                     cf0_ref, b0_ref, p0_ref, mcf0_ref, mb0_ref, mp0_ref,
                     hyper_ref,
                     # outputs (VMEM-resident for the whole burst)
                     cf_ref, b_ref, p_ref, mcf_ref, mb_ref, mp_ref, mse_ref,
                     # scratch
                     osr, osi, g_ref, db_ref, dp_ref):
    def mdot(a, bb):
        return jnp.dot(a.astype(mxu_dtype), bb.astype(mxu_dtype),
                       preferred_element_type=jnp.float32)

    i = pl.program_id(0)          # inner iteration (0 = initial grad pass)
    j = pl.program_id(1)          # ω-tile
    md = m * d
    sl = pl.ds(j * tw, tw)
    lr_eff = hyper_ref[0, 0]
    alpha = hyper_ref[1, 0]

    @pl.when((i == 0) & (j == 0))
    def _seed():
        cf_ref[:] = cf0_ref[:]
        b_ref[:] = b0_ref[:]
        p_ref[:] = p0_ref[:]
        mcf_ref[:] = mcf0_ref[:]
        mb_ref[:] = mb0_ref[:]
        mp_ref[:] = mp0_ref[:]
        g_ref[:] = jnp.zeros_like(g_ref)

    # ---- inertia update from iteration i−1's accumulated gradients ----
    # (backprop_d semantics, fft_backproplib.cu:605-652)
    @pl.when((i >= 1) & (j == 0))
    def _update():
        def inertia(w, g, mo):
            dw = (1.0 - alpha) * lr_eff * g \
                / jnp.maximum(jnp.abs(g), GRAD_CLIP) + alpha * mo
            return w - dw, dw

        cf_n, mcf = inertia(cf_ref[:], g_ref[:], mcf_ref[:])
        b_n, mb = inertia(b_ref[:], db_ref[:], mb_ref[:])
        p_n, mp = inertia(p_ref[:], dp_ref[:], mp_ref[:])
        cf_ref[:] = cf_n
        mcf_ref[:] = mcf
        b_ref[:] = b_n
        mb_ref[:] = mb
        p_ref[:] = p_n
        mp_ref[:] = mp
        g_ref[:] = jnp.zeros_like(g_ref)

    # ---- kernel-spectra tile from the compact kernels (MXU) ----
    cos = cos_ref[:]
    sin = sin_ref[:]
    cf = cf_ref[:]
    allr = mdot(cf, cos)                       # [2·M·D, TW]
    alli = -mdot(cf, sin)
    cfr = allr[:md].reshape(m, d, tw)
    cfi = alli[:md].reshape(m, d, tw)
    ffr = allr[md:].reshape(d, m, tw)
    ffi = alli[md:].reshape(d, m, tw)
    xr = xr_ref[:].reshape(nb, d, tw)
    xi = xi_ref[:].reshape(nb, d, tw)
    yr = yr_ref[:].reshape(nb, d, tw)
    yi = yi_ref[:].reshape(nb, d, tw)
    dc_mask = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (1, tw), 1) == 0) & (j == 0),
        1.0, 0.0)

    # unbiased contraction H₀ = Σ_d Cf·X, shared by forward and gradient
    h0r = jnp.sum(cfr[None] * xr[:, None] - cfi[None] * xi[:, None], axis=2)
    h0i = jnp.sum(cfr[None] * xi[:, None] + cfi[None] * xr[:, None], axis=2)
    bias = b_ref[:][None] * norm * dc_mask[None]

    # ---- forward (conv_k semantics): refresh the O tile ----
    @pl.when(i >= 1)
    def _forward():
        hfr = (h0r * inv_m + bias) * inv_d
        hfi = h0i * inv_m * inv_d
        our = jnp.sum(ffr[None] * hfr[:, None] - ffi[None] * hfi[:, None],
                      axis=2)
        oui = jnp.sum(ffr[None] * hfi[:, None] + ffi[None] * hfr[:, None],
                      axis=2)
        our = our + p_ref[:][None] * norm * dc_mask[None]
        osr[:, sl] = our.reshape(nb * d, tw)
        osi[:, sl] = oui.reshape(nb * d, tw)

    @pl.when(i == 0)
    def _seed_o():
        osr[:, sl] = o0r_ref[:]
        osi[:, sl] = o0i_ref[:]

    # ---- error, Hermitian-weighted once; MSE partial ----
    er = osr[:, sl].reshape(nb, d, tw) - yr
    ei = osi[:, sl].reshape(nb, d, tw) - yi
    wv = wv_ref[:]
    erw = er * wv[None]
    eiw = ei * wv[None]

    @pl.when(j == 0)
    def _zero_mse():
        mse_ref[0, i] = 0.0

    mse_ref[0, i] += jnp.sum(er * erw + ei * eiw) / nb

    # ---- next iteration's gradients (gradient_k_io, projected) ----
    sr = jnp.sum(erw[:, :, None] * ffr[None] + eiw[:, :, None] * ffi[None],
                 axis=1)                                       # [B, M, TW]
    si = jnp.sum(eiw[:, :, None] * ffr[None] - erw[:, :, None] * ffi[None],
                 axis=1)
    hgr = h0r + bias        # gradient's H: unscaled contraction + DC bias
    hgi = h0i
    dcr = jnp.sum(sr[:, :, None] * xr[:, None] + si[:, :, None] * xi[:, None],
                  axis=0)                                      # [M, D, TW]
    dci = jnp.sum(si[:, :, None] * xr[:, None] - sr[:, :, None] * xi[:, None],
                  axis=0)
    dfr = jnp.sum(erw[:, :, None] * hgr[:, None]
                  + eiw[:, :, None] * hgi[:, None], axis=0)    # [D, M, TW]
    dfi = jnp.sum(eiw[:, :, None] * hgr[:, None]
                  - erw[:, :, None] * hgi[:, None], axis=0)
    contract = (((1,), (1,)), ((), ()))

    def pdot(a, bb):
        return lax.dot_general(a.astype(mxu_dtype), bb.astype(mxu_dtype),
                               contract, preferred_element_type=jnp.float32)

    scale = 1.0 / (n_norm * nb)
    d_re = jnp.concatenate([dcr.reshape(md, tw), dfr.reshape(md, tw)], axis=0)
    d_im = jnp.concatenate([dci.reshape(md, tw), dfi.reshape(md, tw)], axis=0)
    g_ref[:] += (pdot(d_re, cos) - pdot(d_im, sin)) * scale

    @pl.when(j == 0)
    def _bias_grads():
        # DC-bin bias gradients (fft_backproplib.cu:463-473); wv[0]==1 so
        # the weighted S/E equal the raw values at the DC lane
        lane0 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, tw), 2) == 0)
        db_ref[:] = jnp.sum(jnp.where(lane0, sr, 0.0),
                            axis=(0, 2))[:, None] * norm * scale
        dp_ref[:] = jnp.sum(jnp.where(lane0, erw, 0.0),
                            axis=(0, 2))[:, None] * norm * scale


def burst_itergrid(x, expout, out0, c, f, b, p, mom=None, *,
                   lr=0.2, alpha=0.9, iters=100, scale_by_dm=True,
                   interpret=None, mxu_dtype=jnp.float32) -> FFTBurstResult:
    """One-launch burst; semantics identical to ``fft_burst`` (no maxdiff,
    single device — ``auto_burst`` dispatches those to the two-kernel path).

    ``x/expout/out0``: ``[D, h, w]`` (the reference burst) or ``[B, D, h, w]``
    (batch-averaged gradients, ``fft_burst_dp`` semantics).
    """
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
    inv_m = (1.0 / dM) if scale_by_dm else 1.0
    inv_d = (1.0 / dD) if scale_by_dm else 1.0
    md = dM * dD

    cos_np, sin_np = _basis(nk, nl, nx, ny, wpad)
    wv = jnp.asarray(_herm_weights(nx, ny, wpad))
    X = spectral.rfft2(x)
    Y = spectral.rfft2(expout)
    O = spectral.rfft2(out0)
    flat = lambda Z: Z.reshape(nb * dD, nx, nyr)
    xr, xi = _split(flat(X), w, wpad)
    yr, yi = _split(flat(Y), w, wpad)
    o0r, o0i = _split(flat(O), w, wpad)
    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    cf0 = jnp.concatenate([c.reshape(md, P), f.reshape(md, P)], axis=0)
    mcf0 = jnp.concatenate([mom[0].reshape(md, P), mom[1].reshape(md, P)],
                           axis=0)
    hyper = jnp.array([[0.1 * lr], [alpha]], jnp.float32)

    tile = lambda r: pl.BlockSpec((r, tw), lambda i, j: (0, j),
                                  memory_space=pltpu.VMEM)
    # O₀ is only consumed at i==0; afterwards pin the index so the pipeline
    # stops re-streaming it (one stale 0-tile fetch instead of a full sweep)
    o0tile = lambda r: pl.BlockSpec(
        (r, tw), lambda i, j: (0, jax.lax.select(i < 1, j, 0)),
        memory_space=pltpu.VMEM)
    const = lambda r, cdim: pl.BlockSpec((r, cdim), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM)

    flops_tile = 2 * 4 * (2 * md) * P * tw + 44 * nb * md * tw
    outs = pl.pallas_call(
        functools.partial(_itergrid_kernel, nb, dM, dD, P, norm, n_norm,
                          inv_m, inv_d, tw, mxu_dtype),
        grid=(iters + 1, n_tiles),
        in_specs=[tile(nb * dD)] * 4 + [o0tile(nb * dD)] * 2
        + [tile(P), tile(P), tile(1),
           const(2 * md, P), const(dM, 1), const(dD, 1),
           const(2 * md, P), const(dM, 1), const(dD, 1),
           pl.BlockSpec((2, 1), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)],
        out_specs=[const(2 * md, P), const(dM, 1), const(dD, 1),
                   const(2 * md, P), const(dM, 1), const(dD, 1),
                   pl.BlockSpec((1, iters + 1), lambda i, j: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((2 * md, P), jnp.float32),
                   jax.ShapeDtypeStruct((dM, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dD, 1), jnp.float32),
                   jax.ShapeDtypeStruct((2 * md, P), jnp.float32),
                   jax.ShapeDtypeStruct((dM, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dD, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, iters + 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((nb * dD, wpad), jnp.float32),
                        pltpu.VMEM((nb * dD, wpad), jnp.float32),
                        pltpu.VMEM((2 * md, P), jnp.float32),
                        pltpu.VMEM((dM, 1), jnp.float32),
                        pltpu.VMEM((dD, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int((iters + 1) * n_tiles * flops_tile),
            bytes_accessed=int((iters + 1) * wpad * 4 * (4 * nb * dD + 2 * P)),
            transcendentals=0),
        interpret=interpret,
    )(xr, xi, yr, yi, o0r, o0i, jnp.asarray(cos_np), jnp.asarray(sin_np), wv,
      cf0, b[:, None], p[:, None], mcf0, mom[2][:, None], mom[3][:, None],
      hyper)
    cf2, bn, pn, mcf, mb, mp, mse_raw = outs
    mses = (mse_raw[0] / (dD * nx * ny) / (2 * dM * nx * ny)).astype(x.dtype)
    return FFTBurstResult(
        c=cf2[:md].reshape(c.shape), f=cf2[md:].reshape(f.shape),
        b=bn[:, 0], p=pn[:, 0],
        mom=(mcf[:md].reshape(c.shape), mcf[md:].reshape(f.shape),
             mb[:, 0], mp[:, 0]),
        mses=mses)


fft_burst_itergrid = jax.jit(
    burst_itergrid,
    static_argnames=("iters", "scale_by_dm", "interpret", "mxu_dtype"))
