"""Correlation-space momentum burst: O(1)-per-iteration in resolution.

The reference burst (source/fft_backproplib.cu:1381-1511) freezes the input
spectrum for all 100 inner iterations.  Every per-iteration ω-space sum —
the analytic gradients (gradient_k_io, 395-475), their compact-support
projection (shrink_k, 535-565), and the Parseval MSE (calc_mse, 480-498) —
is therefore a fixed bilinear/bi-quadratic form in the *compact* kernels
``c, f`` whose ω-dependence collapses onto a handful of cross-correlation
tensors of the frozen signals:

    XX[d,d'][v] = Σ_ω w(ω)·conj(X[d])·X[d']·e^{iθ_v(ω)}
                = Nx·Ny · irfft2(conj(X[d])·X[d'])[v mod N]

with lags ``v`` ranging over sums/differences of up to four kernel-tap
offsets — a [D, D, 4h+1, 4h+1] tensor (17×17 at 5×5 kernels).  Likewise
XY (X vs expected output) and XE0 (X vs the caller-provided first output,
which seeds iteration 0's gradient and mses[0], cu:1430-1441).

After the one-time FFT precompute, each inner iteration is ~3 MFLOP of
small einsums over [M, D, P]-sized operands — independent of resolution
AND batch (batched bursts average the correlation tensors up front, giving
``fft_burst_dp`` semantics for free; a multi-chip DP burst needs ONE pmean
of the tensors, then every iteration is collective-free).

Derivation sketch (b_p(ω) = e^{-iθ_p}; s1 = 1/(M·D), s2 = 1/D when
scale_by_dm; ΔE/Δhg are the DC-bin bias injections, cu:183-184):

  O_cont[d'] = s1·Σ_u K̂[d',d,u]·X[d],   K[d',d,u] = Σ_{m, q+r=u} f·c
  gc[m,d,p]  = Σ_{d',q̄} f[d',m,q̄]·(s1·R − XY)[d',d][tap_p+tap_q̄] + DC
  R[d',d][L] = Σ_{d'',u} K[d',d'',u]·XX[d,d''][L−u]
  gf[d',m,q] = s1·Σ_{m',q'} f[d',m',q']·B[m,m'][tap_q−tap_q']
               − Σ_{d,r} c[m,d,r]·XY[d,d'][tap_q+tap_r] + DC
  B[m,m'][h] = Σ_{d'',r'} c[m',d'',r']·C1[m,d''][h−tap_r']
  C1[m,d''][σ] = Σ_{d,r} c[m,d,r]·XX[d,d''][σ+tap_r]
  mse = s1²·⟨K,R⟩ − 2·s1·⟨K,XY⟩ + ⟨Y,Y⟩ + DC

All lag gathers have static index maps (precomputed, mod-N so aliasing at
small grids is exact — the DFT only sees v mod N).

Precision note: gradients/MSE are differences of large correlation terms,
so their fp32 floor is ~1e-6 of the initial error energy — equality with
the ω-space kernels holds to the tested tolerances, and convergence
tracks until MSE drops ~6 orders of magnitude below its start.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..losses.losses import diversity_gradients
from ..ops import spectral
from ..optim.update import GRAD_CLIP
from .fft import FFTBurstResult


@functools.lru_cache(maxsize=None)
def _lag_maps(nk: int, nl: int, nx: int, ny: int):
    """Static index maps between tap-offset lags and gathered tensors.

    Taps: a ∈ [−hx, hx] × [−hy, hy].  Lag grids (per axis, side in steps
    of h): L2 = ±2h (pair sums), S3 = ±3h, V4 = ±4h.  All stored mod-N at
    gather time; the maps below index the *gathered* grids directly.
    """
    hx, hy = nk // 2, nl // 2
    tx = np.arange(nk) - hx                       # tap offsets, x
    ty = np.arange(nl) - hy

    # flat tap list, P = nk*nl, order (kx, ky) row-major like kernels
    tpx = np.repeat(tx, nl)                       # [P]
    tpy = np.tile(ty, nk)

    def centered(hax, hay):
        """(sx, sy) lag coordinate grids of a centered rectangle."""
        return (2 * hax + 1), (2 * hay + 1)

    w2x, w2y = centered(2 * hx, 2 * hy)           # L2 grid
    w3x, w3y = centered(3 * hx, 3 * hy)           # S3 grid
    w4x, w4y = centered(4 * hx, 4 * hy)           # V4 grid

    def flat(ax, ay, hax, hay, wy):
        return (ax + hax) * wy + (ay + hay)

    def onehot(idx, n):
        """Gather/scatter as dense one-hot (XLA gathers are scalar-slow on
        TPU; these all become MXU matmuls).  [len(idx), n]."""
        m = np.zeros((idx.size, n), np.float32)
        m[np.arange(idx.size), idx.reshape(-1)] = 1.0
        return m

    # (p, q) tap pair -> L2 lag of tap_p + tap_q   [P·P]
    pair2lag = flat(tpx[:, None] + tpx[None, :],
                    tpy[:, None] + tpy[None, :],
                    2 * hx, 2 * hy, w2y).reshape(-1)
    # (q, q') -> L2 lag of tap_q − tap_q'          [P·P]
    diff2lag = flat(tpx[:, None] - tpx[None, :],
                    tpy[:, None] - tpy[None, :],
                    2 * hx, 2 * hy, w2y).reshape(-1)
    # (L2, u) -> V4 index of L2 − u                [L2·L2]
    l2x = np.repeat(np.arange(w2x) - 2 * hx, w2y)
    l2y = np.tile(np.arange(w2y) - 2 * hy, w2x)
    xxd = flat(l2x[:, None] - l2x[None, :],
               l2y[:, None] - l2y[None, :], 4 * hx, 4 * hy, w4y)
    # (L2, r') -> S3 index of L2 − tap_r'          [L2·P]
    c1g = flat(l2x[:, None] - tpx[None, :],
               l2y[:, None] - tpy[None, :], 3 * hx, 3 * hy, w3y)
    # (σ, r) -> V4 index of σ + tap_r              [S3·P]
    s3x = np.repeat(np.arange(w3x) - 3 * hx, w3y)
    s3y = np.tile(np.arange(w3y) - 3 * hy, w3x)
    xxg2 = flat(s3x[:, None] + tpx[None, :],
                s3y[:, None] + tpy[None, :], 4 * hx, 4 * hy, w4y)

    n2, n3, n4 = w2x * w2y, w3x * w3y, w4x * w4y
    return dict(
        # scatter: [P², n2] — K[u] += K2[(q,r)]
        g_scatter_pair=onehot(pair2lag, n2),
        # gathers: [n_src, n_dst] so that dst = src_flat @ G
        g_pair=onehot(pair2lag, n2).T,          # [n2, P²]
        g_diff=onehot(diff2lag, n2).T,          # [n2, P²]
        g_xxd=onehot(xxd, n4).T,                # [n4, n2·n2]
        g_c1=onehot(c1g, n3).T,                 # [n3, n2·P]
        g_xxg2=onehot(xxg2, n4).T,              # [n4, n3·P]
        # centered-lag extraction extents (roll+slice from irfft2 output)
        v4ext=(4 * hx, 4 * hy), l2ext=(2 * hx, 2 * hy),
        n2=n2, n3=n3, n4=n4)


def corr_precompute(x, expout, out0, nk, nl, *, axis_name=None,
                    model_axis=None):
    """One-time correlation precompute for a frozen-input burst.

    Returns the batch-averaged lag tensors + DC scalars consumed by
    :func:`corr_iterate`.  Inside shard_map: ``axis_name`` (data axis)
    pmeans the tensors over the batch shards; ``model_axis`` splits the
    resolution-dependent irfft2 planes across model shards (tensor
    parallelism over the only stage whose cost scales with Nx·Ny) and
    all-gathers the per-plane correlations.
    """
    nx, ny = x.shape[-2], x.shape[-1]
    dD = x.shape[-3]
    maps = _lag_maps(nk, nl, nx, ny)
    X = spectral.rfft2(x)                          # [B, D, nx, nyr]
    Y = spectral.rfft2(expout)
    O0 = spectral.rfft2(out0)
    Xc = jnp.conj(X)
    E0 = O0 - Y
    # batch-averaged correlation tensors (Hermitian products ⇒ real);
    # the mean over B commutes with the irfft2, so average the bin-wise
    # products first and run ONE batched transform of 3·D² planes
    prods = jnp.concatenate([
        jnp.mean(Xc[:, :, None] * X[:, None], axis=0).reshape(-1, nx,
                                                              X.shape[-1]),
        jnp.mean(Xc[:, :, None] * Y[:, None], axis=0).reshape(-1, nx,
                                                              X.shape[-1]),
        jnp.mean(Xc[:, :, None] * E0[:, None], axis=0).reshape(-1, nx,
                                                               X.shape[-1]),
    ], axis=0)
    if model_axis is not None:
        # TP: each model shard transforms its slice of the plane stack
        nm = lax.axis_size(model_axis)
        nplanes = prods.shape[0]
        chunk = -(-nplanes // nm)
        prods_p = jnp.pad(prods, ((0, chunk * nm - nplanes),
                                  (0, 0), (0, 0)))
        mine = lax.dynamic_slice_in_dim(
            prods_p, lax.axis_index(model_axis) * chunk, chunk)
        corr_mine = jnp.fft.irfft2(mine, s=(nx, ny)) * (nx * ny)
        corr = lax.all_gather(corr_mine, model_axis, axis=0
                              ).reshape(-1, nx, ny)[:nplanes]
    else:
        corr = jnp.fft.irfft2(prods, s=(nx, ny)) * (nx * ny)
    dd = dD * dD

    def centered_lags(rows, ext):
        """roll+slice (not gather — XLA gathers are scalar-slow on TPU):
        centered [−hx..hx]×[−hy..hy] lags of circular correlations.  Lag
        windows wider than the grid alias periodically (exact: the DFT
        only sees v mod N), so tile before slicing."""
        hx_, hy_ = ext
        rolled = jnp.roll(rows, (hx_, hy_), axis=(-2, -1))
        tx = -(-(2 * hx_ + 1) // nx)
        ty = -(-(2 * hy_ + 1) // ny)
        if tx > 1 or ty > 1:
            rolled = jnp.tile(rolled, (1,) * (rows.ndim - 2) + (tx, ty))
        return rolled[..., : 2 * hx_ + 1, : 2 * hy_ + 1]

    XX = centered_lags(corr[:dd], maps["v4ext"]).reshape(dD, dD, -1)
    XY = centered_lags(corr[dd:2 * dd], maps["l2ext"]).reshape(dD, dD, -1)
    XE0 = centered_lags(corr[2 * dd:], maps["l2ext"]).reshape(dD, dD, -1)
    wv = jnp.asarray(_herm_w(nx, ny))
    YY = jnp.mean(jnp.sum((Y.real**2 + Y.imag**2) * wv, axis=(-2, -1, -3)))
    E0E0 = jnp.mean(jnp.sum((E0.real**2 + E0.imag**2) * wv,
                            axis=(-2, -1, -3)))
    # DC scalars (bin 0 of real-signal spectra is real); batch-averaged —
    # every DC correction below is linear in the per-frame scalars
    X0 = jnp.mean(X[:, :, 0, 0].real, axis=0)                # [D]
    Y0 = jnp.mean(Y[:, :, 0, 0].real, axis=0)
    E00 = jnp.mean(E0[:, :, 0, 0].real, axis=0)              # [D]
    out = dict(XX=XX, XY=XY, XE0=XE0, YY=YY, E0E0=E0E0,
               X0=X0, Y0=Y0, E00=E00)
    if axis_name is not None:
        out = jax.tree.map(lambda t: lax.pmean(t, axis_name), out)
    return out


def corr_iterate(T, c, f, b, p, mom=None, *, nx, ny,
                 lr=0.2, alpha=0.9, iters=100, maxdiff=False,
                 w0=1.0, w1=10.0, scale_by_dm=True,
                 vary_axes=()) -> FFTBurstResult:
    """Run the burst's inner loop on precomputed correlation tensors.

    ``vary_axes``: inside shard_map with a sharded precompute, the tensor
    inputs carry varying-axis marks from the all_gather; the replicated
    weight/momentum carry must be pvaried over the same axes to keep the
    fori_loop carry types consistent.
    """
    if vary_axes:
        c, f, b, p = (lax.pvary(t, tuple(vary_axes))
                      for t in (c, f, b, p))
        if mom is not None:
            mom = tuple(lax.pvary(t, tuple(vary_axes)) for t in mom)
    dM, dD, nk, nl = c.shape
    P = nk * nl
    dd = dD * dD
    norm = float(nx * ny)
    n_norm = norm * 2.0 * dM * dD * nx * ny
    mse_norm = 1.0 / (dD * nx * ny) / (2 * dM * nx * ny)
    del_eff = 0.1 * lr
    s1 = (1.0 / (dM * dD)) if scale_by_dm else 1.0
    s2 = (1.0 / dD) if scale_by_dm else 1.0
    maps = _lag_maps(nk, nl, nx, ny)
    YY, E0E0 = T["YY"], T["E0E0"]
    X0, Y0, E00 = T["X0"], T["Y0"], T["E00"]
    n2, n3, n4 = maps["n2"], maps["n3"], maps["n4"]
    XXf = T["XX"].reshape(dD, dD, n4)
    XYf = T["XY"].reshape(dD, dD, n2)
    XE0f = T["XE0"].reshape(dD, dD, n2)
    g_scatter = jnp.asarray(maps["g_scatter_pair"])       # [P², n2]
    g_pair = jnp.asarray(maps["g_pair"])                  # [n2, P²]
    g_diff = jnp.asarray(maps["g_diff"])                  # [n2, P²]
    g_c1 = jnp.asarray(maps["g_c1"])                      # [n3, n2·P]
    # per-burst constants (one-hot matmuls, not XLA gathers)
    XXd = (XXf.reshape(dd, n4) @ jnp.asarray(maps["g_xxd"])
           ).reshape(dD, dD, n2, n2)
    XXg2 = (XXf.reshape(dd, n4) @ jnp.asarray(maps["g_xxg2"])
            ).reshape(dD, dD, n3, P)
    XYpair = (XYf.reshape(dd, n2) @ g_pair).reshape(dD, dD, P, P)
    XE0pair = (XE0f.reshape(dd, n2) @ g_pair).reshape(dD, dD, P, P)
    XYfT = jnp.transpose(XYf, (1, 0, 2))                  # [d', d, n2]
    XYpairT = (XYfT.reshape(dd, n2) @ g_pair).reshape(dD, dD, P, P)

    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    kshape_c, kshape_f = c.shape, f.shape
    c = c.reshape(dM, dD, P)
    f = f.reshape(dD, dM, P)
    mom = (mom[0].reshape(dM, dD, P), mom[1].reshape(dD, dM, P),
           mom[2], mom[3])

    def body(i, carry):
        cc, ff, bb, pp, Dc, Df, Db, Dp, mses = carry
        # composed kernel K[d',d][L2] = Σ_m Σ_{q+r=u} f·c (f ∗ c);
        # the (q,r)→u scatter-sum is a one-hot matmul
        K2 = jnp.einsum("emq,mdr->edqr", ff, cc).reshape(dd, P * P)
        K = (K2 @ g_scatter).reshape(dD, dD, n2)            # [D,D,L2²]
        # R[d',d][L2] = Σ_{d'',u} K[d',d'',u]·XX[d,d''][L2−u]
        R = jnp.einsum("ecu,dcLu->edL", K, XXd)             # [D,D,L2²]
        GCTg = (R.reshape(dd, n2) @ g_pair).reshape(dD, dD, P, P)
        gc = s1 * jnp.einsum("emq,edpq->mdp", ff, GCTg) \
            - jnp.einsum("emq,edpq->mdp", ff, XYpairT)      # [M,D,P]
        # gf: quadratic-in-c B tensor + the −Y part
        C1 = jnp.einsum("mdr,dcsr->mcs", cc, XXg2)          # [M,D,S3²]
        C1g = (C1.reshape(dM * dD, n3) @ g_c1).reshape(dM, dD, n2, P)
        B = jnp.einsum("ncr,mchr->mnh", cc, C1g)            # [M,M,L2²]
        Bg = (B.reshape(dM * dM, n2) @ g_diff).reshape(dM, dM, P, P)
        gf = s1 * jnp.einsum("enp,mnqp->emq", ff, Bg) \
            - jnp.einsum("mdr,deqr->emq", cc, XYpair)       # [D,M,P]
        # DC corrections (bias injections at the zero bin, cu:183-184)
        fs = jnp.sum(ff, axis=-1)                           # [D, M]
        csX0 = jnp.sum(cc, axis=-1) @ X0                    # [M]
        dE = norm * (s2 * (fs @ bb) + pp)                   # ΔE[d']
        E_cont0 = s1 * (fs @ csX0) - Y0                     # [D]
        E_act0 = E_cont0 + dE
        gc = gc + (X0[None] * (fs.T @ dE)[:, None])[:, :, None]
        gf = gf + (dE[:, None] * csX0[None]
                   + E_act0[:, None] * (norm * bb)[None])[:, :, None]
        db = norm * (fs.T @ E_act0)                         # [M]
        dp = norm * E_act0                                  # [D]
        # Parseval MSE of the post-update-i weights' output — the value
        # the reference logs for inner iteration i (cu:1463-1464)
        Q = jnp.sum(K * R)
        L = jnp.sum(K2.reshape(dD, dD, P, P) * XYpairT)
        mse_raw = s1 * s1 * Q - 2.0 * s1 * L + YY \
            + jnp.sum(2.0 * E_cont0 * dE + dE * dE)
        mses = mses.at[i].set(mse_raw * mse_norm)

        gc, gf, db, dp = jax.tree.map(lambda t: t / n_norm,
                                      (gc, gf, db, dp))
        if maxdiff:
            cd, fd, bd, pd = diversity_gradients(
                cc.reshape(kshape_c), ff.reshape(kshape_f), bb, pp)
            gc = w0 * gc - w1 * cd.reshape(dM, dD, P)
            gf = w0 * gf - w1 * fd.reshape(dD, dM, P)
            db = w0 * db - w1 * bd
            dp = w0 * dp - w1 * pd

        def inertia(wgt, g, mo):
            dw = (1.0 - alpha) * del_eff * g \
                / jnp.maximum(jnp.abs(g), GRAD_CLIP) + alpha * mo
            return wgt - dw, dw

        # the burst applies exactly `iters` updates; the gradient of the
        # final forward is discarded (matching fft_pallas/fft semantics)
        keep = i < iters
        sel = lambda new, old: jnp.where(keep, new, old)
        cc_n, Dc_n = inertia(cc, gc, Dc)
        ff_n, Df_n = inertia(ff, gf, Df)
        bb_n, Db_n = inertia(bb, db, Db)
        pp_n, Dp_n = inertia(pp, dp, Dp)
        return (sel(cc_n, cc), sel(ff_n, ff), sel(bb_n, bb), sel(pp_n, pp),
                sel(Dc_n, Dc), sel(Df_n, Df), sel(Db_n, Db), sel(Dp_n, Dp),
                mses)

    # ---- iteration 0: gradients from the caller-provided O₀ ----
    mses = jnp.zeros((iters + 1,), jnp.float32)
    if vary_axes:
        mses = lax.pvary(mses, tuple(vary_axes))
    mses = mses.at[0].set(E0E0 * mse_norm)
    gc0 = jnp.einsum("emq,edpq->mdp",
                     f, jnp.transpose(XE0pair, (1, 0, 2, 3)))
    gf0 = jnp.einsum("mdr,deqr->emq", c, XE0pair)
    gf0 = gf0 + (E00[:, None] * (norm * b)[None])[:, :, None]
    db0 = norm * (jnp.sum(f, axis=-1).T @ E00)
    dp0 = norm * E00
    gc0, gf0, db0, dp0 = jax.tree.map(lambda t: t / n_norm,
                                      (gc0, gf0, db0, dp0))
    if maxdiff:
        cd, fd, bd, pd = diversity_gradients(
            c.reshape(kshape_c), f.reshape(kshape_f), b, p)
        gc0 = w0 * gc0 - w1 * cd.reshape(dM, dD, P)
        gf0 = w0 * gf0 - w1 * fd.reshape(dD, dM, P)
        db0 = w0 * db0 - w1 * bd
        dp0 = w0 * dp0 - w1 * pd

    def inertia0(wgt, g, mo):
        dw = (1.0 - alpha) * del_eff * g \
            / jnp.maximum(jnp.abs(g), GRAD_CLIP) + alpha * mo
        return wgt - dw, dw

    c1_, Dc = inertia0(c, gc0, mom[0])
    f1_, Df = inertia0(f, gf0, mom[1])
    b1_, Db = inertia0(b, db0, mom[2])
    p1_, Dp = inertia0(p, dp0, mom[3])

    # iterations 1..iters: body(i) records mse_i (post-update forward) and
    # produces the update for iteration i+1
    init = (c1_, f1_, b1_, p1_, Dc, Df, Db, Dp, mses)
    out = lax.fori_loop(1, iters + 1, body, init)
    cc, ff, bb, pp, Dc, Df, Db, Dp, mses = out
    return FFTBurstResult(
        c=cc.reshape(kshape_c), f=ff.reshape(kshape_f), b=bb, p=pp,
        mom=(Dc.reshape(kshape_c), Df.reshape(kshape_f), Db, Dp),
        mses=mses)


@functools.lru_cache(maxsize=None)
def _herm_w(nx: int, ny: int):
    nyr = ny // 2 + 1
    w = np.full((nyr,), 2.0, np.float32)
    w[0] = 1.0
    if ny % 2 == 0:
        w[-1] = 1.0
    return w[None, :] * np.ones((nx, 1), np.float32)


def burst_corr(x, expout, out0, c, f, b, p, mom=None, *,
               lr=0.2, alpha=0.9, iters=100, maxdiff=False,
               w0=1.0, w1=10.0, scale_by_dm=True,
               axis_name=None, model_axis=None) -> FFTBurstResult:
    """Correlation-space burst; semantics of ``fft_burst``/``fft_burst_dp``.

    ``x/expout/out0``: ``[D, h, w]`` or batched ``[B, D, h, w]`` (gradients
    batch-averaged).  Inside shard_map, ``axis_name`` pmeans the
    correlation tensors over the data axis and ``model_axis`` shards the
    precompute's irfft2 planes; the iterations then run replicated and
    collective-free.
    """
    if x.ndim == 3:
        x, expout, out0 = x[None], expout[None], out0[None]
    nx, ny = x.shape[-2], x.shape[-1]
    T = corr_precompute(x, expout, out0, c.shape[-2], c.shape[-1],
                        axis_name=axis_name, model_axis=model_axis)
    return corr_iterate(T, c, f, b, p, mom, nx=nx, ny=ny, lr=lr,
                        alpha=alpha, iters=iters, maxdiff=maxdiff,
                        w0=w0, w1=w1, scale_by_dm=scale_by_dm,
                        vary_axes=(model_axis,) if model_axis else ())


fft_burst_corr = jax.jit(
    burst_corr,
    static_argnames=("iters", "maxdiff", "scale_by_dm", "axis_name",
                     "model_axis"))
