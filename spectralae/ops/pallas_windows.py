"""Fused correlation-window Pallas kernel for the burst precompute.

The correlation-space burst (train/fft_corr.py) needs only centered lag
*windows* of the pairwise cross-correlations of a handful of half-spectra:

    W[d, e, u, v] = mean_b Σ_ω w(ω_y) · conj(X[b,d,ω]) · Z[b,e,ω]
                                     · cos/sin(2π(u ω_x/nx + v ω_y/ny))

(the separable restricted-iDFT of fft_corr._lag_basis — the TPU-native
replacement for the reference's full-grid inverse FFTs around shrink_k,
source/fft_backproplib.cu:535-565, 1219-1226, of which the burst only ever
reads a (2h+1)² window).

The XLA formulation materializes the [D·E, nx, nyr] complex product planes
in HBM and re-reads them for the window matmuls — 2×(D·E/D) more HBM
traffic than the inputs themselves at 16 MP (the dominant precompute cost
measured at 2048²).  This kernel fuses product and window transform: the
pair products live only in VMEM, one x-tile at a time, and each grid step
feeds two stacked MXU matmuls

    s    = pr @ [byc bys]  +  pi @ [−bys byc]          # y-stage, K = nyr
    acc1 += bxcᵀ_tile @ s ;  acc2 += bxsᵀ_tile @ s      # x-stage, K = TX

with the tiny [pairs, vx, 2vy] accumulators resident in VMEM across the
whole grid.  HBM traffic collapses to one read of X and Z.

Precision: operands are exact f32 and the accumulators are f32 in VMEM;
the dots run at Precision.HIGHEST to match the XLA path's "highest"
contract (fft_corr._corr_windows) — the kernel is HBM-bound, the extra
MXU passes are free.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _on_tpu


def _make_kernel(D: int, E: int, TX: int, nx: int, same: bool):
    hi = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=hi)

    def kernel(*refs):
        if same:
            xr_ref, xi_ref, top_ref, bot_ref, bc_ref, bs_ref, \
                acc1_ref, acc2_ref = refs
            zr_ref, zi_ref = xr_ref, xi_ref
        else:
            xr_ref, xi_ref, zr_ref, zi_ref, top_ref, bot_ref, \
                bc_ref, bs_ref, acc1_ref, acc2_ref = refs
        b = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            acc1_ref[:] = jnp.zeros_like(acc1_ref)
            acc2_ref[:] = jnp.zeros_like(acc2_ref)

        # mask rows of a partial final x-tile (out-of-bounds block rows are
        # undefined; where() after the product also kills any NaN garbage)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TX, 1), 0) + i * TX
        mask = rows < nx
        top = top_ref[:]
        bot = bot_ref[:]
        # zero the basis rows of a partial final x-tile as well: the
        # masked product rows are 0, but 0·NaN(padding) = NaN in the
        # x-stage contraction unless the basis padding is also killed
        bc = jnp.where(mask, bc_ref[:], 0.0)           # [TX, vx]
        bs = jnp.where(mask, bs_ref[:], 0.0)
        for d in range(D):
            ar = xr_ref[0, d]
            ai = xi_ref[0, d]
            for e in range(E):
                br_ = zr_ref[0, e]
                bi_ = zi_ref[0, e]
                # conj(A)·B, real/imag, zeroed outside the valid rows
                pr = jnp.where(mask, ar * br_ + ai * bi_, 0.0)
                pi_ = jnp.where(mask, ar * bi_ - ai * br_, 0.0)
                # y-stage: s[:, :vy] = sr, s[:, vy:] = si
                s = dot(pr, top) + dot(pi_, bot)       # [TX, 2vy]
                p = d * E + e
                # x-stage: contract the shared TX axis (axis 0 of both —
                # the basis rides x-major so its block last dim is the
                # full vx, legal at any TX)
                acc1_ref[p] += jax.lax.dot_general(
                    bc, s, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=hi)                      # [vx, 2vy]
                acc2_ref[p] += jax.lax.dot_general(
                    bs, s, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=hi)

    return kernel


def corr_pair_windows(X, Z, nx: int, ny: int, hx: int, hy: int, *,
                      interpret: bool | None = None):
    """Batch-mean centered lag windows of ``conj(X[b,d])·Z[b,e]``.

    X: ``[B, D, nx, nyr]`` complex; Z: ``[B, E, nx, nyr]`` complex (pass
    the SAME array object for the autocorrelation case — it is then loaded
    once).  Returns ``[D, E, 2hx+1, 2hy+1]`` f32, numerically equal (to
    f32 matmul tolerance) to::

        prods = mean_b(conj(X)[:, :, None] * Z[:, None]).reshape(-1, nx, nyr)
        fft_corr._corr_windows(prods, nx, ny, hx, hy).reshape(D, E, ...)

    which is the equality tested in tests/test_pallas_windows.py.
    """
    from ..train.fft_corr import _lag_basis
    if interpret is None:
        interpret = not _on_tpu()
    B, D = X.shape[0], X.shape[1]
    E = Z.shape[1]
    nyr = X.shape[-1]
    same = Z is X
    bxc, bxs, byc, bys = _lag_basis(nx, ny, hx, hy)
    vx, vy = bxc.shape[1], byc.shape[1]
    top = jnp.asarray(np.concatenate([byc, bys], axis=1))      # [nyr, 2vy]
    bot = jnp.asarray(np.concatenate([-bys, byc], axis=1))
    bcx = jnp.asarray(bxc)                                     # [nx, vx]
    bsx = jnp.asarray(bxs)

    # x-tile: largest of 128/64/32 whose double-buffered input blocks fit
    # the ~16 MB scoped VMEM (re+im stacks of D [+E] channels, lane-padded
    # nyr, ×2 pipeline buffers, ~4 MB headroom for basis/acc/stack temps)
    nyr_pad = -(-nyr // 128) * 128
    nch_tot = 2 * (D if same else D + E)
    TX = 128
    while TX > 32 and 2 * nch_tot * TX * nyr_pad * 4 > 9 * 2 ** 20:
        TX //= 2
    TX = min(TX, nx)
    grid = (B, pl.cdiv(nx, TX))

    def planes(nch):
        return pl.BlockSpec((1, nch, TX, nyr), lambda b, i: (b, 0, i, 0),
                            memory_space=pltpu.VMEM)

    ybasis = pl.BlockSpec((nyr, 2 * vy), lambda b, i: (0, 0),
                          memory_space=pltpu.VMEM)
    xbasis = pl.BlockSpec((TX, vx), lambda b, i: (i, 0),
                          memory_space=pltpu.VMEM)
    accspec = pl.BlockSpec((D * E, vx, 2 * vy), lambda b, i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    xr, xi = X.real, X.imag
    if same:
        ins = (xr, xi)
        in_specs = [planes(D), planes(D)]
    else:
        ins = (xr, xi, Z.real, Z.imag)
        in_specs = [planes(D), planes(D), planes(E), planes(E)]
    acc1, acc2 = pl.pallas_call(
        _make_kernel(D, E, TX, nx, same),
        grid=grid,
        in_specs=in_specs + [ybasis, ybasis, xbasis, xbasis],
        out_specs=[accspec, accspec],
        out_shape=[jax.ShapeDtypeStruct((D * E, vx, 2 * vy), jnp.float32)] * 2,
        interpret=interpret,
    )(*ins, top, bot, bcx, bsx)
    W = acc1[:, :, :vy] - acc2[:, :, vy:]
    return (W / B).reshape(D, E, vx, vy)
