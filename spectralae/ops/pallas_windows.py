"""Fused correlation-window Pallas kernel for the burst precompute.

The correlation-space burst (train/fft_corr.py) needs only centered lag
*windows* of the pairwise cross-correlations of a handful of half-spectra:

    W[d, e, u, v] = mean_b Σ_ω w(ω_y) · conj(X[b,d,ω]) · Z[b,e,ω]
                                     · cos/sin(2π(u ω_x/nx + v ω_y/ny))

(the separable restricted-iDFT of ops/dft.lag_basis — the TPU-native
replacement for the reference's full-grid inverse FFTs around shrink_k,
source/fft_backproplib.cu:535-565, 1219-1226, of which the burst only ever
reads a (2h+1)² window).

The XLA formulation materializes the [D·E, nx, nyr] complex product planes
in HBM and re-reads them for the window matmuls — 2×(D·E/D) more HBM
traffic than the inputs themselves at 2048² (the dominant precompute cost
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


def _window_basis(nx, ny, hx, hy):
    """Host-side packing of the lag-window bases for the in-kernel
    cos/sin split: returns (top [nyr, 2vy], bot, bcx [nx, vx], bsx,
    vx, vy).  The kernel accumulates ``acc1 = bcxᵀ·(p·top)`` and
    ``acc2 = bsxᵀ·(p·bot)``; :func:`_combine_windows` folds them."""
    from .dft import lag_basis
    bxc, bxs, byc, bys = lag_basis(nx, ny, hx, hy)
    vx, vy = bxc.shape[1], byc.shape[1]
    top = jnp.asarray(np.concatenate([byc, bys], axis=1))
    bot = jnp.asarray(np.concatenate([-bys, byc], axis=1))
    return top, bot, jnp.asarray(bxc), jnp.asarray(bxs), vx, vy


def _combine_windows(acc1, acc2, vy, B):
    """Fold the stacked cos/sin accumulators into batch-mean windows."""
    return (acc1[:, :, :vy] - acc2[:, :, vy:]) / B


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
    if interpret is None:
        interpret = not _on_tpu()
    B, D = X.shape[0], X.shape[1]
    E = Z.shape[1]
    nyr = X.shape[-1]
    same = Z is X
    top, bot, bcx, bsx, vx, vy = _window_basis(nx, ny, hx, hy)

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
    return _combine_windows(acc1, acc2, vy, B).reshape(D, E, vx, vy)


def _make_anchor_kernel(D: int, TX: int, nx: int, s1: float):
    # Mosaic only lowers DEFAULT/HIGHEST dots; everything here runs
    # HIGHEST — the anchor-spectrum x-stage contracts K=nk2 (~9) so it
    # costs nothing, unlike XLA's full-grid kernel_spectrum where
    # "highest" compiles pathologically at 2048²
    hi = jax.lax.Precision.HIGHEST

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=hi)

    def xdot(a, b):
        # contract the shared TX axis (axis 0 of both)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)

    def kernel(xr_ref, xi_ref, taps_ref, cy_ref, sy_ref,
               cxt_ref, sxt_ref,
               w_ref, top2_ref, bot2_ref, bc2_ref, bs2_ref,
               top4_ref, bot4_ref, bc4_ref, bs4_ref,
               xx1_ref, xx2_ref, eg1_ref, eg2_ref, seg_ref, e0_ref):
        b = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(jnp.logical_and(b == 0, i == 0))
        def _():
            for r in (xx1_ref, xx2_ref, eg1_ref, eg2_ref, seg_ref,
                      e0_ref):
                r[:] = jnp.zeros_like(r)

        rows = jax.lax.broadcasted_iota(jnp.int32, (TX, 1), 0) + i * TX
        mask = rows < nx
        nyr_b = w_ref.shape[1]
        # DC bin = global row 0, lane 0 (real-signal spectra: real there)
        mask00 = jnp.logical_and(
            rows == 0,
            jax.lax.broadcasted_iota(jnp.int32, (1, nyr_b), 1) == 0)
        w = w_ref[:]
        top2, bot2 = top2_ref[:], bot2_ref[:]
        top4, bot4 = top4_ref[:], bot4_ref[:]
        bc2 = jnp.where(mask, bc2_ref[:], 0.0)
        bs2 = jnp.where(mask, bs2_ref[:], 0.0)
        bc4 = jnp.where(mask, bc4_ref[:], 0.0)
        bs4 = jnp.where(mask, bs4_ref[:], 0.0)
        cxt, sxt = cxt_ref[:], sxt_ref[:]
        cy, sy = cy_ref[:], sy_ref[:]
        # signal spectra may stream from HBM in bf16 (halving the kernel's
        # only resolution-sized read); all arithmetic is f32 — the convert
        # is in-register.  EG stays the EXACT continuum error of the
        # rounded signal (both its terms use the same rounded X), so the
        # anchoring precision invariant survives: cancellation happens at
        # error scale, the rounding only perturbs the objective by ~2⁻⁹
        # relative (tests/test_fft_corr.py bf16 suite)
        xr = [xr_ref[0, d].astype(jnp.float32) for d in range(D)]
        xi = [xi_ref[0, d].astype(jnp.float32) for d in range(D)]

        for e in range(D):
            # EG_e = s1·Σ_d K̂₀[e,d]·X_d − X_e, built in VMEM; the anchor
            # spectra tiles come from the y-stage tap partials
            # T = taps·e^{-iθy}, themselves rebuilt here from the tiny
            # taps — [D², nk, nyr] partials would cost 12 MB of scoped
            # VMEM at 4096², two [nk, nl]×[nl, nyr] dots cost ~nothing
            egr = -xr[e]
            egi = -xi[e]
            for d in range(D):
                p = e * D + d
                taps_p = taps_ref[p]
                tr = dot(taps_p, cy)
                ti = -dot(taps_p, sy)
                kr = dot(cxt, tr) + dot(sxt, ti)
                ki = dot(cxt, ti) - dot(sxt, tr)
                egr = egr + s1 * (kr * xr[d] - ki * xi[d])
                egi = egi + s1 * (kr * xi[d] + ki * xr[d])
            # scalars: Σw|EG|² and the DC-bin real part (batch-summed;
            # caller divides by B)
            seg_ref[:] += jnp.sum(jnp.where(mask, w * (egr * egr
                                                       + egi * egi), 0.0)
                                  ).reshape(1, 1)
            e0c = jnp.sum(jnp.where(mask00, egr, 0.0))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
            e0_ref[:] += jnp.where(lane == e, e0c, 0.0)
            # EG windows: conj(X_d')·EG_e at ±2h, pair layout [d', e]
            for d2 in range(D):
                pr = jnp.where(mask, xr[d2] * egr + xi[d2] * egi, 0.0)
                pi_ = jnp.where(mask, xr[d2] * egi - xi[d2] * egr, 0.0)
                s = dot(pr, top2) + dot(pi_, bot2)
                q = d2 * D + e
                eg1_ref[q] += xdot(bc2, s)
                eg2_ref[q] += xdot(bs2, s)

        # XX windows: conj(X_d)·X_e at ±4h, upper pairs d ≤ e only —
        # swapping d,e conjugates the product plane, and the window
        # transform of a conjugated plane is the lag-reversed window
        # (cos even / sin odd in the lag), so the wrapper mirrors
        # W[e,d](l) = W[d,e](−l) instead of paying D(D−1)/2 dot chains
        for d in range(D):
            for e in range(d, D):
                pr = jnp.where(mask, xr[d] * xr[e] + xi[d] * xi[e], 0.0)
                pi_ = jnp.where(mask, xr[d] * xi[e] - xi[d] * xr[e], 0.0)
                s = dot(pr, top4) + dot(pi_, bot4)
                q = d * D + e
                xx1_ref[q] += xdot(bc4, s)
                xx2_ref[q] += xdot(bs4, s)

    return kernel


def anchor_windows(X, K0taps, nx: int, ny: int, hx2: int, hy2: int,
                   s1: float, *, interpret: bool | None = None,
                   row_slab=None, y_chunk: int = 1152,
                   signal_dtype=None, mixed: bool = False):
    """Whole fused-anchor precompute pass in one Pallas kernel.

    Given the signal half-spectra ``X [B, D, nx, nyr]`` and the composed
    anchor taps ``K0taps [D, D, 2hx2+1, 2hy2+1]``, returns

    - ``XX  [D, D, 4hx+1, 4hy+1]`` — lag windows of conj(X_d)·X_e,
    - ``EGw [D, D, 2hx+1, 2hy+1]`` — lag windows of conj(X_d)·EG_e,
    - ``seg`` — mean_b Σ_ω w·|EG|² (summed over channels),
    - ``e0  [D]`` — mean_b EG[b, :, 0, 0].real,

    where ``EG = s1·K̂₀X − X`` is the continuum anchor error
    (train/fft_corr.py corr_precompute_fused).  Neither the anchor
    spectra ``K̂₀`` ([D², nx, nyr] — 2×151 MB at 2048²) nor the EG
    planes ever reach HBM: the spectra tiles are generated on the fly
    from the separable tap partials (ops/dft.kernel_spectrum's
    factorization), EG lives per x-tile in VMEM, and the correlation
    products feed the stacked window contractions directly.

    ``signal_dtype``: storage dtype for the split re/im signal planes fed
    to the kernel (default: X's own precision, f32).  ``jnp.bfloat16``
    halves the kernel's only resolution-sized HBM read; every product and
    accumulation stays f32 (converted in-register), and the anchoring
    precision contract holds because EG's two terms share the same
    rounded X — see the kernel comment.

    ``row_slab``: a (possibly traced) global start row.  When given,
    ``X`` is an x-row *slab* ``[B, D, nx_l, nyr]`` of the full spectra
    (rows ``row_slab .. row_slab+nx_l``, zero-padded past ``nx``) and
    the outputs are this slab's **partial sums** — exact because every
    emitted quantity is linear (windows) or additive (seg) over x-rows.
    Summing the partials over a disjoint cover of ``[0, nx)`` reproduces
    the full call bit-for-f32; this is how the tensor-parallel precompute
    shards the kernel (train/fft_corr.py model_axis + psum).  The ``e0``
    output is only meaningful for the slab containing global row 0 — the
    TP caller computes the DC scalars directly instead.

    ``mixed``: ``X`` is the pre-split ``(Xre, Xim)`` pair from
    :func:`spectralae.ops.pallas_fft.rfft2_mixed` — rows in ``perm_x``
    order, lanes in ``perm_y`` order (dead lanes weighted/based to 0).
    The kernel is untouched; every per-bin constant (weights, tap-partial
    bases, window bases) is permuted host-side instead of the data, and
    the DC bin stays at (row 0, lane 0) by construction.  The planes may
    already carry ``signal_dtype`` (e.g. bf16 straight from the FFT
    kernel) — they are used as-is.

    Equality vs the XLA formulation: tests/test_pallas_windows.py.
    """
    from . import dft
    if interpret is None:
        interpret = not _on_tpu()
    if mixed:
        if row_slab is not None:
            raise ValueError("mixed-order X has no row-slab (TP) variant")
        Xre, Xim = X
        X = Xre     # shape source only
    B, D = X.shape[0], X.shape[1]
    nx_l = X.shape[-2]
    nyr = X.shape[-1]
    dd = D * D
    nk2, nl2 = K0taps.shape[-2], K0taps.shape[-1]
    if (nk2, nl2) != (2 * hx2 + 1, 2 * hy2 + 1):
        raise ValueError(
            f"hx2/hy2 must be the composed-tap half-extents: K0taps is "
            f"{nk2}x{nl2} taps but got hx2={hx2}, hy2={hy2}")
    hx4, hy4 = 2 * hx2, 2 * hy2

    # the kernel rebuilds the y-stage tap partials T = taps·e^{-iθy}
    # per pair from these tiny operands (a [D², nk, nyr] T array would
    # cost 12 MB of scoped VMEM at 4096² and OOM the kernel stack)
    cx, sx, cy, sy = map(jnp.asarray,
                         dft._axis_bases(nk2, nl2, nx, ny)[:4])
    taps = K0taps.reshape(dd, nk2, nl2)

    top2, bot2, bxc2, bxs2, vx2, vy2 = _window_basis(nx, ny, hx2, hy2)
    top4, bot4, bxc4, bxs4, vx4, vy4 = _window_basis(nx, ny, hx4, hy4)
    from .spectral import _hermitian_weights
    wrow = jnp.asarray(_hermitian_weights(nx, ny))[None, :]

    if mixed:
        # permute every per-bin constant into the FFT kernels' mixed
        # order instead of re-gathering the resolution-sized data; dead
        # lanes (beyond-Nyquist bins the radix blocks carry) get zero
        # weight AND zero bases, so they contribute to nothing
        from .pallas_fft import perm_x as _mm_px, perm_y as _mm_py
        px = _mm_px(nx)
        py = _mm_py(ny)
        if nyr != py.shape[0]:
            raise ValueError(
                f"mixed X has {nyr} lanes but ny={ny} maps to "
                f"{py.shape[0]} — pass the rfft2_mixed output unsliced")
        lval = np.where(py >= 0, py, 0)
        lmask = (py >= 0).astype(np.float32)

        def _lanes(a, axis):
            out = jnp.take(a, jnp.asarray(lval), axis=axis)
            shape = [1] * out.ndim
            shape[axis] = py.shape[0]
            return out * jnp.asarray(lmask).reshape(shape)

        cy, sy = _lanes(cy, 1), _lanes(sy, 1)
        wrow = _lanes(wrow, 1)
        top2, bot2 = _lanes(top2, 0), _lanes(bot2, 0)
        top4, bot4 = _lanes(top4, 0), _lanes(bot4, 0)
        jpx = jnp.asarray(px)
        cx = jnp.take(cx, jpx, axis=1)
        sx = jnp.take(sx, jpx, axis=1)
        bxc2, bxs2 = jnp.take(bxc2, jpx, 0), jnp.take(bxs2, jpx, 0)
        bxc4, bxs4 = jnp.take(bxc4, jpx, 0), jnp.take(bxs4, jpx, 0)
        # DC stays at (row 0, lane 0): perm_x[0] == 0, perm_y[0] == 0

    # x-major operands (phases/bases built for the GLOBAL grid); in slab
    # mode take this slab's rows — zero-pad first so an end slab reads
    # inert rows, keeping every emitted partial exact
    xmaj = [jnp.asarray(cx.T), jnp.asarray(sx.T),
            bxc2, bxs2, bxc4, bxs4]
    if row_slab is not None:
        xmaj = [jax.lax.dynamic_slice_in_dim(
            jnp.pad(a, ((0, nx_l), (0, 0))), row_slab, nx_l)
            for a in xmaj]
    cxT, sxT, bxc2, bxs2, bxc4, bxs4 = xmaj

    # ω_y chunking: Mosaic's scoped-VMEM working set (input blocks,
    # lane-padded y-bases, and the unrolled-loop temporaries) all scale
    # with the kernel's y width; above the proven 2048² width the call
    # splits the ω_y axis into static chunks — every emitted quantity is
    # bin-local, so chunk partials sum exactly (same algebra as the
    # x-row slabs) and e0 is read from the DC-containing chunk
    n_chunks = max(1, -(-nyr // y_chunk))
    edges = [round(c * nyr / n_chunks) for c in range(n_chunks + 1)]
    nyr_c_max = max(b - a for a, b in zip(edges, edges[1:]))

    # x-tile sizing: X re/im double-buffered (at the signal storage dtype),
    # PLUS the in-kernel f32 conversion copies when streaming sub-f32 (the
    # astype materializes f32 tiles of all 2·D planes in scoped VMEM —
    # unaccounted, TX=128 bf16 at 2048² hits Mosaic's 16 M stack limit at
    # 17.96 M), plus K̂/EG f32 tile transients
    sig_itemsize = jnp.dtype(signal_dtype or jnp.float32).itemsize
    conv_copies = 2 * D * 4 if sig_itemsize < 4 else 0
    nyr_pad = -(-nyr_c_max // 128) * 128
    TX = 128
    while TX > 32 and (2 * 2 * D * sig_itemsize + conv_copies + 8 * 4) \
            * TX * nyr_pad > 11 * 2 ** 20:
        TX //= 2
    TX = min(TX, nx_l)
    grid = (B, pl.cdiv(nx_l, TX))

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda b, i: (0,) * nd,
                            memory_space=pltpu.VMEM)

    def xmajor(ncol):
        return pl.BlockSpec((TX, ncol), lambda b, i: (i, 0),
                            memory_space=pltpu.VMEM)

    out_shapes = [
        jax.ShapeDtypeStruct((dd, vx4, 2 * vy4), jnp.float32),
        jax.ShapeDtypeStruct((dd, vx4, 2 * vy4), jnp.float32),
        jax.ShapeDtypeStruct((dd, vx2, 2 * vy2), jnp.float32),
        jax.ShapeDtypeStruct((dd, vx2, 2 * vy2), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, D), jnp.float32),
    ]
    out_specs = [const((dd, vx4, 2 * vy4)), const((dd, vx4, 2 * vy4)),
                 const((dd, vx2, 2 * vy2)), const((dd, vx2, 2 * vy2)),
                 const((1, 1)), const((1, D))]

    # split (and optionally down-cast) the signal planes ONCE — the
    # real/imag extraction is an elementwise fusion, so the bf16 cast
    # rides it for free and every downstream read is half-width.  Mixed
    # mode arrives pre-split (often pre-cast straight from the FFT
    # kernel's write)
    if not mixed:
        Xre, Xim = X.real, X.imag
    if signal_dtype is not None and Xre.dtype != jnp.dtype(signal_dtype):
        Xre = Xre.astype(signal_dtype)
        Xim = Xim.astype(signal_dtype)

    def chunk_call(a, b_):
        ny_c = b_ - a
        planes = pl.BlockSpec((1, D, TX, ny_c), lambda b, i: (b, 0, i, 0),
                              memory_space=pltpu.VMEM)
        xre, xim = Xre[..., a:b_], Xim[..., a:b_]
        return pl.pallas_call(
            _make_anchor_kernel(D, TX, nx_l, float(s1)),
            grid=grid,
            in_specs=[planes, planes,
                      const((dd, nk2, nl2)),
                      const((nl2, ny_c)), const((nl2, ny_c)),
                      xmajor(nk2), xmajor(nk2),
                      const((1, ny_c)),
                      const((ny_c, 2 * vy2)), const((ny_c, 2 * vy2)),
                      xmajor(vx2), xmajor(vx2),
                      const((ny_c, 2 * vy4)), const((ny_c, 2 * vy4)),
                      xmajor(vx4), xmajor(vx4)],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(xre, xim, taps, cy[:, a:b_], sy[:, a:b_], cxT, sxT,
          wrow[:, a:b_], top2[a:b_], bot2[a:b_], bxc2, bxs2,
          top4[a:b_], bot4[a:b_], bxc4, bxs4)

    parts = [chunk_call(a, b_) for a, b_ in zip(edges, edges[1:])]
    xx1, xx2, eg1, eg2, seg = (sum(p[i] for p in parts) for i in range(5))
    e0 = parts[0][5]        # the DC bin (ω_y = 0) lives in chunk 0
    XXu = _combine_windows(xx1, xx2, vy4, B).reshape(D, D, vx4, vy4)
    # mirror the skipped lower pairs: W[e,d](l) = W[d,e](−l)
    lower = (jnp.arange(D)[:, None] > jnp.arange(D)[None, :]
             )[:, :, None, None]
    XX = jnp.where(lower,
                   jnp.flip(jnp.swapaxes(XXu, 0, 1), axis=(-2, -1)), XXu)
    EGw = _combine_windows(eg1, eg2, vy2, B)
    return (XX, EGw.reshape(D, D, vx2, vy2),
            seg[0, 0] / B, e0[0] / B)
