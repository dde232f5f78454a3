"""Fused radix-4 four-step rfft2 as two Pallas kernels.

Replaces XLA's FFT custom-call for the burst precompute's signal
transform (the ~75 % cost of the fused 2048² burst — ROADMAP "Beating
XLA's FFT"; the reference's cuFFT plans live at
source/fft_backproplib.cu:764-801).  XLA's TPU FFT costs ~6 ms for a
[3, 2048, 2048] rfft2 and is per-call, not per-axis; a four-step matmul
DFT expressed as XLA einsums TIES it because every stage round-trips
HBM.  These kernels keep each stage's intermediates in VMEM, so the
whole transform is two HBM passes plus ~50 GFLOP of MXU work
(stage-A probe: the in-kernel matmul-DFT beats the XLA rfft even in
direct O(n·nyr) form, scripts/probe_fused_dft.py).

Factorization (both axes, fixed split radix 4, DIF form):

    n = 4·M1,   j = j2·M1 + j1   (j2 ∈ [0,4) selects a CONTIGUOUS block)
    ω = 4·k1 + k2

    X[4k1+k2] = Σ_{j1} W_{M1}^{j1 k1} · W_n^{j1 k2} · S[k2][j1]
    S[k2]     = Σ_{j2} W_4^{j2 k2} · x[j2·M1 + j1]     (radix-4 butterfly)

The butterfly contracts the block index with W₄ ∈ {±1, ±i} — pure
adds/swaps on the VPU; the k1 stage is an MXU matmul with K = M1.  The
decimation-in-frequency form needs only CONTIGUOUS block slices and
leading-index block stores — Mosaic rejects strided value slices and
sublane↔lane reshapes (probed: scripts/probe_mosaic_features.py), and
this form needs neither.

The price of DIF is output order: ω = 4·k1 + k2 lands at block k2,
position k1 ("mixed" order).  Consumers that reduce per-bin (the anchor
kernel — every per-ω constant is a host-built weight/basis row) absorb
the permutation for free by permuting the constants (:func:`perm_x` /
:func:`perm_y`); :func:`rfft2_pallas` re-gathers natural order for
general use and is the equality surface against ``jnp.fft.rfft2``
(tests/test_pallas_fft.py).

y-stage real-input savings: for real x, S₀ and S₂ are real and
S₃ = conj(S₁), so the four k2 groups cost 12 real matmuls instead
of 16, and only ωy ≤ ny/2 is emitted (k1 < K1 = ny/8 + 1 columns,
zero-padded to K1p per block).

Precision: ``precision`` feeds every MXU dot.  DEFAULT (bf16 operands,
f32 accumulate) measures ~2e-4 relative on 2048² spectra — 10× tighter
than the convergence-validated bf16 signal streaming
(tests/test_fft_corr.py bf16 suite); HIGH requests a manual bf16x3
split (Mosaic lowers only DEFAULT/HIGHEST — see :func:`_dot_fn`),
~1e-6 rel at half HIGHEST's MXU work; HIGHEST approaches f32.
Butterflies and twiddles are exact f32 VPU ops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _on_tpu

_LANE = 128

# HIGHEST-precision dots triple the operand footprint on the Mosaic
# stack (bf16x6 split copies) — raise the scoped-VMEM budget past the
# 16 MB default (the chip has 128 MB of VMEM; measured wall: the
# x-kernel at HIGHEST/C=128/nx=2048 needs 21.8 MB)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 2 ** 20)

# largest leaf-DFT matmul contraction: K = n/4 ≤ _MAX_M1 keeps the leaf
# at four-step flop scaling AND its [M1, ·] bases in VMEM; longer axes
# peel wrapper-level radix-4 butterfly rounds (one extra HBM pass each)
# until the leaf fits.  Tests shrink it to force recursion at toy sizes.
_MAX_M1 = 512


def _k1p(ny: int) -> int:
    """Padded per-block k1 width of the y-stage: K1 = ny//8 + 1 columns
    (ω = 4·k1 ≤ ny/2 incl. Nyquist), padded to a lane-friendly width."""
    k1 = ny // 8 + 1
    pad = _LANE // 4 if ny % (2 * _LANE) == 0 else 8
    return -(-k1 // pad) * pad


def ny_padded(ny: int) -> int:
    """Total mixed-order lane count of the rfft2 output (≥ ny//2+1)."""
    return len(perm_y(ny))


def perm_y(ny: int) -> np.ndarray:
    """ωy of each mixed-order lane; −1 marks a lane that holds no
    needed bin (give it zero weight/basis downstream).

    Recursive over wrapper butterfly rounds: a peeled round contributes
    the least-significant base-4 digit, ω = k2 + 4·ω′."""
    if ny // 4 > _MAX_M1:
        sub = perm_y(ny // 4)
        parts = []
        for k2 in range(4):
            w = np.where(sub >= 0, k2 + 4 * sub, -1)
            parts.append(np.where((w >= 0) & (w <= ny // 2), w, -1))
        return np.concatenate(parts)
    k1p = _k1p(ny)
    out = np.full(4 * k1p, -1, np.int64)
    for k2 in range(4):
        for k1 in range(k1p):
            w = 4 * k1 + k2
            if w <= ny // 2:
                out[k2 * k1p + k1] = w
    return out


def perm_x(nx: int) -> np.ndarray:
    """ωx of each mixed-order row: row k2·M1 + k1 holds ωx = 4·k1 + k2
    (recursively, ω = k2 + 4·ω′ per peeled butterfly round)."""
    if nx // 4 > _MAX_M1:
        sub = perm_x(nx // 4)
        return np.concatenate([k2 + 4 * sub for k2 in range(4)])
    m1 = nx // 4
    return np.concatenate([4 * np.arange(m1) + k2 for k2 in range(4)])


@functools.lru_cache(maxsize=None)
def _y_bases_np(ny: int):
    m1 = ny // 4
    k1p = _k1p(ny)
    j1 = np.arange(m1)[:, None]
    k1 = np.arange(k1p)[None, :]
    th = 2 * np.pi * (j1 * k1) / m1
    # columns that are padding for EVERY k2 (4·k1 > ny/2 already at
    # k2=0) emit exact zeros; columns valid for some-but-not-all k2
    # emit beyond-Nyquist bins there — perm_y marks them −1
    dead = 4 * k1 > ny // 2
    bc = np.where(dead, 0.0, np.cos(th)).astype(np.float32)
    bs = np.where(dead, 0.0, np.sin(th)).astype(np.float32)
    a = 2 * np.pi * np.arange(4)[:, None] * np.arange(m1)[None, :] / ny
    return bc, bs, np.cos(a).astype(np.float32), np.sin(a).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _x_bases_np(nx: int):
    m1 = nx // 4
    th = 2 * np.pi * np.outer(np.arange(m1), np.arange(m1)) / m1  # [k1,j1]
    a = 2 * np.pi * np.arange(4)[:, None] * np.arange(m1)[None, :] / nx
    return (np.cos(th).astype(np.float32), np.sin(th).astype(np.float32),
            np.cos(a).astype(np.float32)[:, :, None],
            np.sin(a).astype(np.float32)[:, :, None])


def _dot_fn(precision):
    """In-kernel dot at the requested tier.  Mosaic lowers only DEFAULT
    (bf16 operands) and HIGHEST (bf16_6x) dot precisions; HIGH (bf16_3x,
    the sweet spot for the FFT — ~1e-6 rel at half HIGHEST's MXU work)
    is built manually: split both operands into bf16 hi + residual lo
    and take the three significant cross products."""
    if precision != jax.lax.Precision.HIGH:
        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32,
                           precision=precision)
        return dot

    def dot3(a, b):
        d = functools.partial(jnp.dot,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        ah = a.astype(jnp.bfloat16).astype(jnp.float32)
        bh = b.astype(jnp.bfloat16).astype(jnp.float32)
        return d(a - ah, bh) + (d(ah, b - bh) + d(ah, bh))
    return dot3


def _make_y_kernel(TX: int, nx: int, ny: int, precision):
    m1 = ny // 4
    dot = _dot_fn(precision)

    def kernel(x_ref, bc_ref, bs_ref, twc_ref, tws_ref, re_ref, im_ref):
        i = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TX, 1), 0) + i * TX
        x = jnp.where(rows < nx, x_ref[0], 0.0)          # [TX, ny]
        x0 = x[:, 0 * m1:1 * m1]
        x1 = x[:, 1 * m1:2 * m1]
        x2 = x[:, 2 * m1:3 * m1]
        x3 = x[:, 3 * m1:4 * m1]
        bc, bs = bc_ref[:], bs_ref[:]
        # radix-4 butterfly over the contiguous lane blocks (real input:
        # S0/S2 real, S3 = conj(S1))
        e, o = x0 + x2, x1 + x3
        s0 = e + o
        s2 = e - o
        s1r = x0 - x2
        s1i = x3 - x1
        for k2 in range(4):
            twc = twc_ref[k2:k2 + 1]                     # [1, m1]
            tws = tws_ref[k2:k2 + 1]
            if k2 == 0:
                rr, ri = s0, None
            elif k2 == 2:
                rr, ri = s2 * twc, -(s2 * tws)
            elif k2 == 1:
                rr = s1r * twc + s1i * tws
                ri = s1i * twc - s1r * tws
            else:                                        # S3 = conj(S1)
                rr = s1r * twc - s1i * tws
                ri = -(s1i * twc) - s1r * tws
            # X_k2 = (rr + i·ri) @ (bc − i·bs)
            if ri is None:
                re, im = dot(rr, bc), -dot(rr, bs)
            else:
                re = dot(rr, bc) + dot(ri, bs)
                im = dot(ri, bc) - dot(rr, bs)
            re_ref[0, k2] = re
            im_ref[0, k2] = im

    return kernel


def _make_x_kernel(nx: int, precision, out_dtype):
    m1 = nx // 4
    dot = _dot_fn(precision)

    def kernel(yr_ref, yi_ref, bc_ref, bs_ref, twc_ref, tws_ref,
               re_ref, im_ref):
        yr = yr_ref[0].astype(jnp.float32)               # [nx, C]
        yi = yi_ref[0].astype(jnp.float32)
        br = [yr[k * m1:(k + 1) * m1] for k in range(4)]
        bi = [yi[k * m1:(k + 1) * m1] for k in range(4)]
        bc, bs = bc_ref[:], bs_ref[:]                    # [k1, j1]
        # radix-4 butterfly over sublane blocks (complex input):
        # S0 = e+o; S2 = e−o; S1 = d − i·f; S3 = d + i·f
        e_r, e_i = br[0] + br[2], bi[0] + bi[2]
        o_r, o_i = br[1] + br[3], bi[1] + bi[3]
        d_r, d_i = br[0] - br[2], bi[0] - bi[2]
        f_r, f_i = br[1] - br[3], bi[1] - bi[3]
        S = [(e_r + o_r, e_i + o_i),
             (d_r + f_i, d_i - f_r),
             (e_r - o_r, e_i - o_i),
             (d_r - f_i, d_i + f_r)]
        for k2 in range(4):
            sr, si = S[k2]
            twc = twc_ref[k2]                            # [m1, 1]
            tws = tws_ref[k2]
            pr = sr * twc + si * tws
            pi_ = si * twc - sr * tws
            # X_k2 = (bc − i·bs) contracted over j1 (sublanes of p)
            re = dot(bc, pr) + dot(bs, pi_)
            im = dot(bc, pi_) - dot(bs, pr)
            re_ref[0, k2] = re.astype(re_ref.dtype)
            im_ref[0, k2] = im.astype(im_ref.dtype)

    return kernel


@functools.lru_cache(maxsize=None)
def _bfly_tw_np(n: int):
    """Butterfly round twiddles W_n^{j·k2}, j < n/4: (cos, sin) [4, m]."""
    m = n // 4
    a = 2 * np.pi * np.arange(4)[:, None] * np.arange(m)[None, :] / n
    return np.cos(a).astype(np.float32), np.sin(a).astype(np.float32)


def _make_bfly_lanes_kernel(real: bool, m: int):
    """Quarters are sliced STATICALLY from a full-lane-row block —
    a ``(1, TX, 1, Tm)`` per-quarter block view would put 1 in the
    sublane dim, which Mosaic rejects (must be a multiple of 8 or the
    full dim); the leaf kernels slice the same way."""
    def kernel(*refs):
        if real:
            x_ref, twc_ref, tws_ref, re_ref, im_ref = refs
            x = x_ref[0]                                       # [TX, n]
            q = [x[:, k * m:(k + 1) * m] for k in range(4)]
            e, o = q[0] + q[2], q[1] + q[3]
            dr = q[0] - q[2]
            di = q[3] - q[1]
            z = jnp.zeros_like(e)
            S = [(e + o, z), (dr, di), (e - o, z), (dr, -di)]
        else:
            xr_ref, xi_ref, twc_ref, tws_ref, re_ref, im_ref = refs
            xr, xi = xr_ref[0], xi_ref[0]                      # [TX, n]
            qr = [xr[:, k * m:(k + 1) * m] for k in range(4)]
            qi = [xi[:, k * m:(k + 1) * m] for k in range(4)]
            e_r, e_i = qr[0] + qr[2], qi[0] + qi[2]
            o_r, o_i = qr[1] + qr[3], qi[1] + qi[3]
            d_r, d_i = qr[0] - qr[2], qi[0] - qi[2]
            f_r, f_i = qr[1] - qr[3], qi[1] - qi[3]
            S = [(e_r + o_r, e_i + o_i),
                 (d_r + f_i, d_i - f_r),
                 (e_r - o_r, e_i - o_i),
                 (d_r - f_i, d_i + f_r)]
        for k2 in range(4):
            sr, si = S[k2]
            twc = twc_ref[k2:k2 + 1]                           # [1, m]
            tws = tws_ref[k2:k2 + 1]
            re_ref[0, k2] = sr * twc + si * tws
            im_ref[0, k2] = si * twc - sr * tws

    return kernel


def _bfly_lanes(xr, xi, n: int, interpret: bool):
    """One DIF radix-4 round along lanes: ``[BD, R, n] → [BD, 4, R, m]``
    twiddled stream blocks (complex out; ``xi=None`` for real input)."""
    m = n // 4
    BD, R = xr.shape[0], xr.shape[1]
    twc, tws = map(jnp.asarray, _bfly_tw_np(n))
    # VMEM per block ≈ TX·n·4·(ins + 2): 33 MB at n=16384/TX=128 real —
    # within the raised _COMPILER_PARAMS budget
    TX = min(128, R)
    grid = (BD, pl.cdiv(R, TX))
    inspec = pl.BlockSpec((1, TX, n), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec((4, m), lambda b, i: (0, 0),
                          memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, 4, TX, m), lambda b, i: (b, 0, i, 0),
                           memory_space=pltpu.VMEM)
    ins = [xr] if xi is None else [xr, xi]
    in_specs = [inspec] * len(ins) + [twspec] * 2
    return pl.pallas_call(
        _make_bfly_lanes_kernel(xi is None, m),
        grid=grid,
        in_specs=in_specs,
        out_specs=[outspec, outspec],
        out_shape=[jax.ShapeDtypeStruct((BD, 4, R, m), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*ins, twc, tws)


def _make_bfly_rows_kernel():
    def kernel(*refs):
        qr = [refs[k][0, 0] for k in range(4)]                 # [Tm, C]
        qi = [refs[4 + k][0, 0] for k in range(4)]
        twc_ref, tws_ref, re_ref, im_ref = refs[8:]
        e_r, e_i = qr[0] + qr[2], qi[0] + qi[2]
        o_r, o_i = qr[1] + qr[3], qi[1] + qi[3]
        d_r, d_i = qr[0] - qr[2], qi[0] - qi[2]
        f_r, f_i = qr[1] - qr[3], qi[1] - qi[3]
        S = [(e_r + o_r, e_i + o_i),
             (d_r + f_i, d_i - f_r),
             (e_r - o_r, e_i - o_i),
             (d_r - f_i, d_i + f_r)]
        for k2 in range(4):
            sr, si = S[k2]
            twc = twc_ref[k2]                                  # [Tm, 1]
            tws = tws_ref[k2]
            re_ref[0, k2] = sr * twc + si * tws
            im_ref[0, k2] = si * twc - sr * tws

    return kernel


def _bfly_rows(yr, yi, n: int, interpret: bool):
    """One DIF radix-4 round along rows: ``[BD, n, L] → [BD, 4, m, L]``."""
    m = n // 4
    BD, L = yr.shape[0], yr.shape[-1]
    twc, tws = _bfly_tw_np(n)
    twc = jnp.asarray(twc)[:, :, None]
    tws = jnp.asarray(tws)[:, :, None]
    Tm = min(512, m)
    C = min(128, L)
    if L % C:
        pad = -(-L // C) * C - L
        yr = jnp.pad(yr, ((0, 0), (0, 0), (0, pad)))
        yi = jnp.pad(yi, ((0, 0), (0, 0), (0, pad)))
    Lp = yr.shape[-1]
    grid = (BD, m // Tm, Lp // C)
    view = lambda a: a.reshape(BD, 4, m, Lp)
    qspec = [pl.BlockSpec((1, 1, Tm, C),
                          lambda b, j, c, k=k: (b, k, j, c),
                          memory_space=pltpu.VMEM) for k in range(4)]
    twspec = pl.BlockSpec((4, Tm, 1), lambda b, j, c: (0, j, 0),
                          memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, 4, Tm, C), lambda b, j, c: (b, 0, j, c),
                           memory_space=pltpu.VMEM)
    Br, Bi = pl.pallas_call(
        _make_bfly_rows_kernel(),
        grid=grid,
        in_specs=[*qspec, *qspec, twspec, twspec],
        out_specs=[outspec, outspec],
        out_shape=[jax.ShapeDtypeStruct((BD, 4, m, Lp), jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(*([view(yr)] * 4), *([view(yi)] * 4), twc, tws)
    return Br[..., :L], Bi[..., :L]


def _make_yc_kernel(TX: int, R: int, n: int, precision):
    """Leaf y-stage for COMPLEX lane input (wrapper-recursion streams):
    radix-4 butterfly over contiguous lane quarters + per-k2 matmuls,
    emitting ω ≤ n/2 (the recursion only needs the sub-transform's
    lower half — same truncation as the real leaf)."""
    m1 = n // 4
    dot = _dot_fn(precision)

    def kernel(xr_ref, xi_ref, bc_ref, bs_ref, twc_ref, tws_ref,
               re_ref, im_ref):
        i = pl.program_id(1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (TX, 1), 0) + i * TX
        mask = rows < R
        xr = jnp.where(mask, xr_ref[0], 0.0)                   # [TX, n]
        xi = jnp.where(mask, xi_ref[0], 0.0)
        qr = [xr[:, k * m1:(k + 1) * m1] for k in range(4)]
        qi = [xi[:, k * m1:(k + 1) * m1] for k in range(4)]
        bc, bs = bc_ref[:], bs_ref[:]
        e_r, e_i = qr[0] + qr[2], qi[0] + qi[2]
        o_r, o_i = qr[1] + qr[3], qi[1] + qi[3]
        d_r, d_i = qr[0] - qr[2], qi[0] - qi[2]
        f_r, f_i = qr[1] - qr[3], qi[1] - qi[3]
        S = [(e_r + o_r, e_i + o_i),
             (d_r + f_i, d_i - f_r),
             (e_r - o_r, e_i - o_i),
             (d_r - f_i, d_i + f_r)]
        for k2 in range(4):
            sr, si = S[k2]
            twc = twc_ref[k2:k2 + 1]                           # [1, m1]
            tws = tws_ref[k2:k2 + 1]
            pr = sr * twc + si * tws
            pi_ = si * twc - sr * tws
            re_ref[0, k2] = dot(pr, bc) + dot(pi_, bs)
            im_ref[0, k2] = dot(pi_, bc) - dot(pr, bs)

    return kernel


def _fft_yc(yr, yi, *, precision, interpret):
    """Complex lane transform emitting ω ≤ n/2, group-leading:
    ``[BD, R, n] → [BD, G, R, k1p]`` with G = 4^rounds."""
    BD, R, n = yr.shape
    if n // 4 > _MAX_M1:
        Br, Bi = _bfly_lanes(yr, yi, n, interpret)
        m = n // 4
        sr, si = _fft_yc(Br.reshape(-1, R, m), Bi.reshape(-1, R, m),
                         precision=precision, interpret=interpret)
        g, k1p = sr.shape[-3], sr.shape[-1]
        return (sr.reshape(BD, 4 * g, R, k1p),
                si.reshape(BD, 4 * g, R, k1p))
    k1p = _k1p(n)
    m1 = n // 4
    bc, bs, twc, tws = map(jnp.asarray, _y_bases_np(n))
    TX = min(128, R)
    grid = (BD, pl.cdiv(R, TX))
    outspec = pl.BlockSpec((1, 4, TX, k1p), lambda b, i: (b, 0, i, 0),
                           memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    inspec = pl.BlockSpec((1, TX, n), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_yc_kernel(TX, R, n, precision),
        grid=grid,
        in_specs=[inspec, inspec,
                  const2(bc), const2(bs), const2(twc), const2(tws)],
        out_specs=[outspec, outspec],
        out_shape=[jax.ShapeDtypeStruct((BD, 4, R, k1p),
                                        jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(yr, yi, bc, bs, twc, tws)


def rfft_y_mixed(x, *, precision=None, interpret=None):
    """y-axis rfft of real ``x [..., nx, ny]`` in mixed lane order.

    Returns ``(Yre, Yim) [..., G, nx, k1p]`` — group g, column k1 holds
    the ωy given by :func:`perm_y` at lane g·k1p + k1.  G = 4 when the
    leaf matmul fits (ny ≤ 4·_MAX_M1); longer axes peel wrapper-level
    butterfly rounds (G = 4^rounds).
    """
    if interpret is None:
        interpret = not _on_tpu()
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    nx, ny = x.shape[-2], x.shape[-1]
    if ny % 4:
        raise ValueError(f"ny must be divisible by 4, got {ny}")
    lead = x.shape[:-2]
    xb = x.reshape((-1, nx, ny))
    BD = xb.shape[0]
    if ny // 4 > _MAX_M1:
        Br, Bi = _bfly_lanes(xb, None, ny, interpret)
        m = ny // 4
        sr, si = _fft_yc(Br.reshape(-1, nx, m), Bi.reshape(-1, nx, m),
                         precision=precision, interpret=interpret)
        g, k1p = sr.shape[-3], sr.shape[-1]
        return (sr.reshape(lead + (4 * g, nx, k1p)),
                si.reshape(lead + (4 * g, nx, k1p)))
    k1p = _k1p(ny)
    m1 = ny // 4
    bc, bs, twc, tws = map(jnp.asarray, _y_bases_np(ny))

    TX = min(128, nx)
    grid = (BD, pl.cdiv(nx, TX))
    outspec = pl.BlockSpec((1, 4, TX, k1p), lambda b, i: (b, 0, i, 0),
                           memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    Yre, Yim = pl.pallas_call(
        _make_y_kernel(TX, nx, ny, precision),
        grid=grid,
        in_specs=[pl.BlockSpec((1, TX, ny), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  const2(bc), const2(bs), const2(twc), const2(tws)],
        out_specs=[outspec, outspec],
        out_shape=[jax.ShapeDtypeStruct((BD, 4, nx, k1p),
                                        jnp.float32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(xb, bc, bs, twc, tws)
    return (Yre.reshape(lead + (4, nx, k1p)),
            Yim.reshape(lead + (4, nx, k1p)))


def fft_x_mixed(Yre, Yim, *, precision=None, out_dtype=None,
                interpret=None, lane_chunk=None):
    """x-axis FFT of complex ``(Yre, Yim) [..., nx, L]`` in mixed row
    order: output row k2·M1 + k1 holds ωx = 4·k1 + k2 (:func:`perm_x`).
    The lane axis is carried through untouched (any meaning/order)."""
    if interpret is None:
        interpret = not _on_tpu()
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    nx, L = Yre.shape[-2], Yre.shape[-1]
    if nx % 4:
        raise ValueError(f"nx must be divisible by 4, got {nx}")
    lead = Yre.shape[:-2]
    yr = Yre.reshape((-1, nx, L))
    yi = Yim.reshape((-1, nx, L))
    BD = yr.shape[0]
    if nx // 4 > _MAX_M1:
        # peel one wrapper butterfly round (ω = k2 + 4·ω′) and recurse;
        # the 4 twiddled streams ride the leading dim, so the recursive
        # mixed rows land k2-major — exactly perm_x's recursive order
        Br, Bi = _bfly_rows(yr, yi, nx, interpret)
        m = nx // 4
        sr, si = fft_x_mixed(Br.reshape(-1, m, L), Bi.reshape(-1, m, L),
                             precision=precision, out_dtype=out_dtype,
                             interpret=interpret, lane_chunk=lane_chunk)
        return (sr.reshape(lead + (nx, L)),
                si.reshape(lead + (nx, L)))
    m1 = nx // 4
    bc, bs, twc, tws = map(jnp.asarray, _x_bases_np(nx))
    out_dtype = out_dtype or jnp.float32

    if lane_chunk is None:
        lane_chunk = 128
    C = min(lane_chunk, L)
    nlc = pl.cdiv(L, C)
    if L % C:
        pad = nlc * C - L
        yr = jnp.pad(yr, ((0, 0), (0, 0), (0, pad)))
        yi = jnp.pad(yi, ((0, 0), (0, 0), (0, pad)))
    grid = (BD, nlc)
    inspec = pl.BlockSpec((1, nx, C), lambda b, c: (b, 0, c),
                          memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((1, 4, m1, C), lambda b, c: (b, 0, 0, c),
                           memory_space=pltpu.VMEM)
    const2 = lambda a: pl.BlockSpec(a.shape, lambda b, c: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    Xre, Xim = pl.pallas_call(
        _make_x_kernel(nx, precision, out_dtype),
        grid=grid,
        in_specs=[inspec, inspec,
                  const2(bc), const2(bs), const2(twc), const2(tws)],
        out_specs=[outspec, outspec],
        out_shape=[jax.ShapeDtypeStruct((BD, 4, m1, nlc * C),
                                        out_dtype)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(yr, yi, bc, bs, twc, tws)
    Xre = Xre.reshape(lead + (nx, nlc * C))[..., :L]
    Xim = Xim.reshape(lead + (nx, nlc * C))[..., :L]
    return Xre, Xim


def rfft2_mixed(x, *, precision=None, out_dtype=None, interpret=None,
                lead_chunk=None):
    """Two-kernel rfft2 of real ``x [..., nx, ny]`` in mixed order.

    Returns ``(Xre, Xim) [..., nx, ny_padded(ny)]`` with row order
    :func:`perm_x` and lane order :func:`perm_y`.  The y-group axis is
    carried through the x-kernel as batch and transposed back into
    lanes at the end (the one XLA pass in the pipeline).
    ``out_dtype=jnp.bfloat16`` halves that pass and the final planes —
    pair with the anchor kernel's bf16 streaming.

    ``lead_chunk=k`` serializes the transform over the leading batch in
    groups of k planes (``lax.map``), bounding peak HBM by the
    per-chunk transients instead of the whole batch's — same total
    flops/bytes.  At 8192² the three channel planes' concurrent
    wrapper-recursion transients are the difference between fitting and
    ResourceExhausted (22.8 vs 15.75 GB); ``lead_chunk=1`` fits."""
    nx, ny = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    if lead_chunk is not None:
        xb = x.reshape((-1, nx, ny))
        BD = xb.shape[0]
        if BD > lead_chunk:
            # a non-divisor chunk must still bound HBM (that is the whole
            # point of the parameter) — round DOWN to the largest divisor
            # of BD, never silently fall through to the unchunked pipeline
            k = max(1, lead_chunk)
            while BD % k:
                k -= 1
            fn = functools.partial(rfft2_mixed, precision=precision,
                                   out_dtype=out_dtype,
                                   interpret=interpret)
            Xre, Xim = jax.lax.map(
                fn, xb.reshape((-1, k, nx, ny)))
            L = Xre.shape[-1]
            return (Xre.reshape(lead + (nx, L)),
                    Xim.reshape(lead + (nx, L)))
    Yre, Yim = rfft_y_mixed(x, precision=precision, interpret=interpret)
    G, k1p = Yre.shape[-3], Yre.shape[-1]
    Yre = Yre.reshape((-1, nx, k1p))        # [lead·G, nx, k1p]
    Yim = Yim.reshape((-1, nx, k1p))
    Xre, Xim = fft_x_mixed(Yre, Yim, precision=precision,
                           out_dtype=out_dtype, interpret=interpret)
    # [lead, G, nx, k1p] -> [lead, nx, G·k1p]
    Xre = jnp.moveaxis(Xre.reshape(lead + (G, nx, k1p)), -3, -2)
    Xim = jnp.moveaxis(Xim.reshape(lead + (G, nx, k1p)), -3, -2)
    return (Xre.reshape(lead + (nx, G * k1p)),
            Xim.reshape(lead + (nx, G * k1p)))


def natural_gathers(nx: int, ny: int):
    """(row_of [nx], lane_of [nyr]) index maps from natural (ωx, ωy) to
    mixed-order positions — ``X_nat = X_mixed[row_of][:, lane_of]``."""
    py = perm_y(ny)
    lane_of = np.zeros(ny // 2 + 1, np.int64)
    lane_of[py[py >= 0]] = np.nonzero(py >= 0)[0]
    row_of = np.zeros(nx, np.int64)
    row_of[perm_x(nx)] = np.arange(nx)
    return row_of, lane_of


def rfft2_pallas(x, *, precision=None, interpret=None):
    """Natural-order complex rfft2 via the mixed-order kernels — the
    drop-in (precision-tiered) replacement for
    ``jnp.fft.rfft2(x, axes=(-2, -1))`` (equality:
    tests/test_pallas_fft.py)."""
    nx, ny = x.shape[-2], x.shape[-1]
    Xre, Xim = rfft2_mixed(x, precision=precision, interpret=interpret)
    row_of, lane_of = natural_gathers(nx, ny)
    Xre = jnp.take(jnp.take(Xre, jnp.asarray(row_of), axis=-2),
                   jnp.asarray(lane_of), axis=-1)
    Xim = jnp.take(jnp.take(Xim, jnp.asarray(row_of), axis=-2),
                   jnp.asarray(lane_of), axis=-1)
    return jax.lax.complex(Xre, Xim)
