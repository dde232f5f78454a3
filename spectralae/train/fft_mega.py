"""The whole momentum-space burst as a single Pallas kernel.

One ``pallas_call`` with ``grid=(iters,)``: every spectrum (X, Y, O), the
DFT basis, the kernels, biases and momenta live in VMEM for the entire
burst — zero HBM traffic between iterations (the two-kernel version,
:mod:`spectralae.train.fft_pallas`, still re-reads the basis and X/Y/O from
HBM every iteration and pays two kernel launches + loop overhead per step).

Memory plan at 256² (W=Nx·Nyr=33024, fp32):
  persistent VMEM blocks: X/Y re+im 4×0.13·D MB, basis cos/sin 2×P·W·4B
  (6.6 MB at P=25), O scratch 2×D·W·4B, weights + states ≈ 11 MB total.
  Per-chunk temporaries bound by the inner ω-chunk loop (CW lanes).

Each grid step is one reference inner iteration (fft_backproplib.cu:
1446-1464): analytic gradients + compact-support projection (phase A),
inertia update on VMEM-resident kernels (phase B), output-spectrum
recompute + Parseval MSE (phase C).

Measured outcome (v5e, 256²): bit-identical to the two-kernel version but
~20% slower (12.1 vs 9.7 ms/100-iter burst) — the two-kernel pipeline's
automatic HBM↔VMEM double-buffering overlaps better than this kernel's
VMEM-resident inner chunk loop.  Kept as a validated alternative and a
template for larger-resolution configs where HBM re-reads dominate.
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
from .fft_pallas import _basis, _herm_weights, _split

CW = 2048  # inner ω-chunk width (lanes)


def _mega_kernel(m, d, p_sup, norm, n_norm, lr_eff, alpha, inv_m, inv_d,
                 n_chunks, cw,
                 # inputs
                 xr_ref, xi_ref, yr_ref, yi_ref, o0r_ref, o0i_ref,
                 cos_ref, sin_ref, wv_ref,
                 c0_ref, f0_ref, b0_ref, p0_ref,
                 mc0_ref, mf0_ref, mb0_ref, mp0_ref,
                 # outputs
                 c_out, f_out, b_out, p_out,
                 mc_out, mf_out, mb_out, mp_out, mse_out,
                 # scratch
                 osr, osi):
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _init():
        c_out[:] = c0_ref[:]
        f_out[:] = f0_ref[:]
        b_out[:] = b0_ref[:]
        p_out[:] = p0_ref[:]
        mc_out[:] = mc0_ref[:]
        mf_out[:] = mf0_ref[:]
        mb_out[:] = mb0_ref[:]
        mp_out[:] = mp0_ref[:]
        osr[:] = o0r_ref[:]
        osi[:] = o0i_ref[:]

    c2 = c_out[:]                 # [M·D, P]
    f2 = f_out[:]                 # [D·M, P]
    bv = b_out[:]                 # [M, 1]

    # ---------- phase A: gradients, projected to compact support ----------
    def chunk_grad(k, acc):
        gc, gf = acc
        sl = pl.ds(k * cw, cw)
        cosk = cos_ref[:, sl]     # [P, CW]
        sink = sin_ref[:, sl]
        cfr = jnp.dot(c2, cosk, preferred_element_type=jnp.float32)
        cfi = -jnp.dot(c2, sink, preferred_element_type=jnp.float32)
        ffr = jnp.dot(f2, cosk, preferred_element_type=jnp.float32)
        ffi = -jnp.dot(f2, sink, preferred_element_type=jnp.float32)
        cfr = cfr.reshape(m, d, cw)
        cfi = cfi.reshape(m, d, cw)
        ffr = ffr.reshape(d, m, cw)
        ffi = ffi.reshape(d, m, cw)
        er = osr[:, sl] - yr_ref[:, sl]
        ei = osi[:, sl] - yi_ref[:, sl]
        xr = xr_ref[:, sl]
        xi = xi_ref[:, sl]
        sr = jnp.sum(er[:, None] * ffr + ei[:, None] * ffi, axis=0)
        si = jnp.sum(ei[:, None] * ffr - er[:, None] * ffi, axis=0)
        hr = jnp.sum(cfr * xr[None] - cfi * xi[None], axis=1)
        hi = jnp.sum(cfr * xi[None] + cfi * xr[None], axis=1)
        dc_mask = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1) == 0) & (k == 0),
            1.0, 0.0)
        hr = hr + bv * norm * dc_mask
        wv = wv_ref[:, sl]
        dcr = (sr[:, None] * xr[None] + si[:, None] * xi[None]) * wv
        dci = (si[:, None] * xr[None] - sr[:, None] * xi[None]) * wv
        dfr = (er[:, None] * hr[None] + ei[:, None] * hi[None]) * wv
        dfi = (ei[:, None] * hr[None] - er[:, None] * hi[None]) * wv
        ct = (((1,), (1,)), ((), ()))
        gc = gc + (lax.dot_general(dcr.reshape(m * d, cw), cosk, ct,
                                   preferred_element_type=jnp.float32)
                   - lax.dot_general(dci.reshape(m * d, cw), sink, ct,
                                     preferred_element_type=jnp.float32))
        gf = gf + (lax.dot_general(dfr.reshape(d * m, cw), cosk, ct,
                                   preferred_element_type=jnp.float32)
                   - lax.dot_general(dfi.reshape(d * m, cw), sink, ct,
                                     preferred_element_type=jnp.float32))
        return gc, gf

    gc0 = jnp.zeros((m * d, p_sup), jnp.float32)
    gf0 = jnp.zeros((d * m, p_sup), jnp.float32)
    gc, gf = lax.fori_loop(0, n_chunks, chunk_grad, (gc0, gf0))
    gc = gc / n_norm
    gf = gf / n_norm
    # DC-bin bias gradients: Ff(0) = Σ_p f2 (cos=1, sin=0 at ω=0)
    ff0 = jnp.sum(f2, axis=1).reshape(d, m)              # [D, M]
    e0r = osr[:, 0:1] - yr_ref[:, 0:1]                   # [D, 1]
    db = (jnp.sum(e0r * ff0, axis=0)[:, None]) * norm / n_norm   # [M, 1]
    dp = e0r * norm / n_norm                                      # [D, 1]

    # ---------- phase B: inertia update on VMEM-resident state ----------
    def inertia(w, g, mo):
        dw = (1.0 - alpha) * lr_eff * g / jnp.maximum(jnp.abs(g), GRAD_CLIP) \
            + alpha * mo
        return w - dw, dw

    c2n, mc = inertia(c2, gc, mc_out[:])
    f2n, mf = inertia(f2, gf, mf_out[:])
    bn, mb = inertia(bv, db, mb_out[:])
    pn, mp = inertia(p_out[:], dp, mp_out[:])
    c_out[:] = c2n
    f_out[:] = f2n
    b_out[:] = bn
    p_out[:] = pn
    mc_out[:] = mc
    mf_out[:] = mf
    mb_out[:] = mb
    mp_out[:] = mp

    # ---------- phase C: output spectrum + Parseval MSE ----------
    def chunk_conv(k, mse_acc):
        sl = pl.ds(k * cw, cw)
        cosk = cos_ref[:, sl]
        sink = sin_ref[:, sl]
        cfr = jnp.dot(c2n, cosk, preferred_element_type=jnp.float32)
        cfi = -jnp.dot(c2n, sink, preferred_element_type=jnp.float32)
        ffr = jnp.dot(f2n, cosk, preferred_element_type=jnp.float32)
        ffi = -jnp.dot(f2n, sink, preferred_element_type=jnp.float32)
        cfr = cfr.reshape(m, d, cw)
        cfi = cfi.reshape(m, d, cw)
        ffr = ffr.reshape(d, m, cw)
        ffi = ffi.reshape(d, m, cw)
        xr = xr_ref[:, sl] * inv_m
        xi = xi_ref[:, sl] * inv_m
        hr = jnp.sum(cfr * xr[None] - cfi * xi[None], axis=1)
        hi = jnp.sum(cfr * xi[None] + cfi * xr[None], axis=1)
        dc_mask = jnp.where(
            (jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1) == 0) & (k == 0),
            1.0, 0.0)
        hr = hr + bn * norm * dc_mask
        hr2 = hr * inv_d
        hi2 = hi * inv_d
        our = jnp.sum(ffr * hr2[None] - ffi * hi2[None], axis=1)
        oui = jnp.sum(ffr * hi2[None] + ffi * hr2[None], axis=1)
        our = our + pn * norm * dc_mask
        osr[:, sl] = our
        osi[:, sl] = oui
        diff = (our - yr_ref[:, sl]) ** 2 + (oui - yi_ref[:, sl]) ** 2
        return mse_acc + jnp.sum(diff * wv_ref[:, sl])

    total = lax.fori_loop(0, n_chunks, chunk_conv, jnp.float32(0.0))
    mse_out[0, it] = total


@functools.partial(
    jax.jit, static_argnames=("iters", "scale_by_dm", "interpret",
                              "lr", "alpha"))
def fft_burst_mega(x: jax.Array, expout: jax.Array, out0: jax.Array,
                   c: jax.Array, f: jax.Array, b: jax.Array, p: jax.Array,
                   mom: tuple | None = None, *, lr: float = 0.2,
                   alpha: float = 0.9, iters: int = 100,
                   scale_by_dm: bool = True,
                   interpret: bool | None = None) -> FFTBurstResult:
    """Single-kernel burst (same API/semantics as ``fft_burst``, no maxdiff)."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    nx, ny = x.shape[-2], x.shape[-1]
    dM, dD, nk, nl = c.shape
    P = nk * nl
    nyr = ny // 2 + 1
    w = nx * nyr
    cw = min(CW, w)
    wpad = -(-w // cw) * cw
    n_chunks = wpad // cw
    norm = float(nx * ny)
    n_norm = norm * 2.0 * dM * dD * nx * ny
    inv_m = (1.0 / dM) if scale_by_dm else 1.0
    inv_d = (1.0 / dD) if scale_by_dm else 1.0

    cos_np, sin_np = _basis(nk, nl, nx, ny, wpad)
    wv = jnp.asarray(_herm_weights(nx, ny, wpad))
    X = spectral.rfft2(x)
    Y = spectral.rfft2(expout)
    O = spectral.rfft2(out0)
    xr, xi = _split(X, w, wpad)
    yr, yi = _split(Y, w, wpad)
    o0r, o0i = _split(O, w, wpad)
    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    mse0 = spectral.parseval_mse(Y, O, dD, dM, nx, ny)

    whole = lambda r, cdim: pl.BlockSpec((r, cdim), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
    # lr/alpha are static (baked into the kernel); interactive lr changes
    # trigger a recompile, which the persistent cache absorbs
    kernel = functools.partial(
        _mega_kernel, dM, dD, P, norm, n_norm, 0.1 * float(lr), float(alpha),
        inv_m, inv_d, n_chunks, cw)
    outs = pl.pallas_call(
        kernel,
        grid=(iters,),
        in_specs=[whole(dD, wpad)] * 6
        + [whole(P, wpad), whole(P, wpad), whole(1, wpad),
           whole(dM * dD, P), whole(dD * dM, P), whole(dM, 1), whole(dD, 1),
           whole(dM * dD, P), whole(dD * dM, P), whole(dM, 1), whole(dD, 1)],
        out_specs=[whole(dM * dD, P), whole(dD * dM, P),
                   whole(dM, 1), whole(dD, 1),
                   whole(dM * dD, P), whole(dD * dM, P),
                   whole(dM, 1), whole(dD, 1),
                   pl.BlockSpec((1, iters), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((dM * dD, P), jnp.float32),
                   jax.ShapeDtypeStruct((dD * dM, P), jnp.float32),
                   jax.ShapeDtypeStruct((dM, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dD, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dM * dD, P), jnp.float32),
                   jax.ShapeDtypeStruct((dD * dM, P), jnp.float32),
                   jax.ShapeDtypeStruct((dM, 1), jnp.float32),
                   jax.ShapeDtypeStruct((dD, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, iters), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((dD, wpad), jnp.float32),
                        pltpu.VMEM((dD, wpad), jnp.float32)],
        interpret=interpret,
    )(xr, xi, yr, yi, o0r, o0i, jnp.asarray(cos_np), jnp.asarray(sin_np), wv,
      c.reshape(dM * dD, P), f.reshape(dD * dM, P), b[:, None], p[:, None],
      mom[0].reshape(dM * dD, P), mom[1].reshape(dD * dM, P),
      mom[2][:, None], mom[3][:, None])
    c2, f2, bn, pn, mc, mf, mb, mp, mse_raw = outs
    mses = jnp.concatenate([
        jnp.array([mse0], jnp.float32),
        mse_raw[0] / (dD * nx * ny) / (2 * dM * nx * ny)])
    return FFTBurstResult(
        c=c2.reshape(c.shape), f=f2.reshape(f.shape), b=bn[:, 0], p=pn[:, 0],
        mom=(mc.reshape(c.shape), mf.reshape(f.shape), mb[:, 0], mp[:, 0]),
        mses=mses)
