"""Pallas TPU kernel for the coordinate-space convolution.

The reference's coordinate forward is a hand-written CUDA kernel, one
thread per output element (``conv_parallel``, source/backproplib.cu:70-111);
its weight-gradient kernels launch one 2-D grid per weight element
(``gradient_CFBP``/``gradient_CF``, backproplib.cu:186-288).  The TPU-native
baseline (``lax.conv_general_dilated`` in :mod:`spectralae.ops.coord`) is
correct but maps poorly onto the MXU at this workload's shapes: with
D=3 input and M=10 output channels the systolic array runs at
(M·D)/(128·128) ≈ 0.2 % occupancy — measured 0.5 % peak FLOPs at 33×33
(bench.py ``util[conv_coord_33x33_b8_ms]``).

This kernel targets the VPU instead (8×128 lanes — the right unit for
tiny-channel convs): output channels are accumulated by scalar·vector
FMAs with the weights streamed from SMEM, so the only vector traffic is
one row-tile load per (d, k) tap row and one lane-shift per l tap.  The
m loop sits innermost so each shifted row amortizes over all output
channels.  VPU roofline at 33×33 b8 @256² is ~4 ms vs the measured
35 ms lax floor.

Gradients: ``conv_valid_pallas`` carries a custom VJP.  The data
gradient is expressible through the SAME kernel (a valid correlation of
the padded cotangent with the M/D-transposed, tap-flipped weights — the
"same tap algebra" as the forward; ``PALLAS_DATA_GRAD=True``,
equality-tested), but the production VJP routes both cotangents through
``lax.conv_general_dilated``: the probe measured the all-lax backward at
1.3-1.6× the Pallas-dx combination at every size, and the weight
gradient contracts over *pixels* (huge-K, tiny-MN), the one shape class
XLA's conv lowering already handles well.  Measured table + the ≥13×13
kill rationale: ROADMAP.md (round 5) / scripts/probe_pallas_conv.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _on_tpu

# the default 16 MB scoped-VMEM budget rejects the staged input block +
# double buffering at ≥13×13 (measured 60.8 MB demand at 13×13 b8 @256²)
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


def _conv_kernel(w_ref, x_ref, o_ref, *, d, nk, nl, th, thw, w_out, hp):
    """One (batch, h-tile) program: out[m, i, j] = Σ_{d,k,l} w·x.

    w_ref: SMEM [M, D·nk·nl] (flipped kernels, (d·nk+k)·nl+l layout).
    x_ref: VMEM [1, D·Hp, WP] padded input planes, rows d·Hp + i
      (Hp a multiple of 8 so every window load below is sublane-aligned
      — Mosaic requires provably 8-aligned dynamic starts).
    o_ref: VMEM [1, M, TH, W].

    Loop nest: fori over input channels d (the only dynamic index —
    aligned window load per d), then static l (lane shift, amortized
    over k AND m), static k (sublane shift), static m (scalar·vector
    FMA from SMEM — the VPU op the whole kernel is built around).
    """
    hi = pl.program_id(1)
    base = hi * th          # th is a multiple of 8 ⇒ aligned
    m = o_ref.shape[1]

    def body(dd, accs):
        xwin = x_ref[0, pl.ds(dd * hp + base, thw), :]       # [THW, WP]
        for l in range(nl):
            xl = xwin[:, l:l + w_out]                        # lane shift
            for k in range(nk):
                xs = xl[k:k + th]                            # sublane shift
                col = (dd * nk + k) * nl + l
                accs = tuple(
                    acc + w_ref[mi, col] * xs
                    for mi, acc in enumerate(accs))
        return accs

    zero = jnp.zeros((th, w_out), jnp.float32)
    accs = lax.fori_loop(0, d, body, (zero,) * m)
    for mi in range(m):
        o_ref[0, mi] = accs[mi]


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def _auto_pallas_conv(x_shape, c_shape) -> bool:
    """Auto-routing predicate for :func:`spectralae.ops.coord.conv2d`.

    The VPU kernel wins when the MXU conv is occupancy-starved: tiny
    channel counts with a non-trivial tap window.  Crossover measured on
    v5e at B=8 @256² (scripts/probe_pallas_conv.py); below it the lax
    conv is dispatch/bandwidth-bound and ties or wins.
    """
    m, d, nk, nl = c_shape
    if not _on_tpu():
        return False
    # measured win region (scripts/probe_pallas_conv.py, b8 @256² v5e):
    # 5×5 fwd 1.28× over lax AND exact f32 (4e-7 vs the MXU conv's
    # bf16-rounded 2.4e-3); at ≥13×13 the VPU kernel runs 0.76-0.82× of
    # lax (the static sublane-shift relayouts dominate) and the spectral
    # conv owns those sizes anyway (4.6-63× over coord) — see the
    # probed-and-rejected ROADMAP entry
    return m * d <= 64 and nk * nl <= 25


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_valid_pallas(xpad: jax.Array, w: jax.Array,
                      interpret: bool | None = None) -> jax.Array:
    """Valid correlation ``out[b,m,i,j] = Σ_{d,k,l} w[m,d,k,l]·xpad[b,d,i+k,j+l]``.

    ``xpad``: [B, D, H+nk-1, W+nl-1] (caller applies the tap-window
    padding — all three reference tap modes reduce to a padding choice,
    see :func:`spectralae.ops.coord._conv_padding`).
    ``w``: [M, D, nk, nl] *already tap-flipped* correlation weights.
    Returns [B, M, H, W] float32.
    """
    return _conv_valid_fwd_impl(xpad, w, interpret)


def _conv_valid_fwd_impl(xpad, w, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    b, d, hp, wp_in = xpad.shape
    m, _, nk, nl = w.shape
    h = hp - nk + 1
    w_out = wp_in - nl + 1
    # h-tile: 8 sublanes keeps the fori carry (M accumulators of
    # [th, W]) register-resident — M=10 × [8,256] f32 is 20 vregs.
    # th=32 measured 10× off the VPU roofline at 13×13: the 320 KB
    # carry spills to VMEM and every FMA becomes load+fma+store
    th = 8 if h % 8 == 0 else h
    assert h % th == 0
    wop = _lane_pad(w_out)
    # the kernel's lane shifts read up to lane wop+nl-2 of each row
    wp = _lane_pad(wop + nl - 1)
    if wp != wp_in:
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, 0), (0, wp - wp_in)))
    # sublane-aligned window loads: round the per-tile window up to a
    # multiple of 8 and pad the per-channel row stride so every
    # (d, h-tile) window fits and starts 8-aligned
    thw = -(-(th + nk - 1) // 8) * 8
    hp_pad = -(-max(hp, h - th + thw) // 8) * 8
    if hp_pad != hp:
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, hp_pad - hp), (0, 0)))
    # flipped-layout weights, [(d·nk+k)·nl+l] columns, f32 scalars in SMEM
    w2 = w.astype(jnp.float32).reshape(m, d * nk * nl)
    x2 = xpad.astype(jnp.float32).reshape(b, d * hp_pad, wp)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, d=d, nk=nk, nl=nl, th=th, thw=thw,
                          w_out=wop, hp=hp_pad),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((m, d * nk * nl), lambda bi, hi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d * hp_pad, wp), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, th, wop),
                               lambda bi, hi: (bi, 0, hi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m, h, wop), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else _COMPILER_PARAMS,
    )(w2, x2)
    return out[..., :w_out]


def _conv_valid_fwd(xpad, w, interpret):
    return _conv_valid_fwd_impl(xpad, w, interpret), (xpad, w)


# route the VJP's data grad through the SAME Pallas kernel (tap-algebra
# parity with the fwd — tested) or through lax.  Default lax: the probe
# measured the pallas-grad combination at 0.63-0.77× of the all-lax
# grad at every kernel size (scripts/probe_pallas_conv.py), so the
# production VJP keeps XLA's conv for both cotangents; the flag keeps
# the kernel-bwd path testable.
PALLAS_DATA_GRAD = False


def _conv_valid_bwd(interpret, res, dy):
    xpad, w = res
    m, d, nk, nl = w.shape
    # data grad: a valid correlation of the padded cotangent with the
    # M/D-transposed, tap-flipped weights — the same tap algebra as the
    # forward, runnable through the same Pallas kernel
    wt = jnp.transpose(w, (1, 0, 2, 3))[:, :, ::-1, ::-1]
    dy_pad = jnp.pad(dy, ((0, 0), (0, 0), (nk - 1, nk - 1),
                          (nl - 1, nl - 1)))
    if PALLAS_DATA_GRAD:
        dx = conv_valid_pallas(dy_pad, wt, interpret)
    else:
        dx = lax.conv_general_dilated(
            dy_pad, wt, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=dy.dtype)
    # weight grad: pixel contraction (huge K, tiny M·N) — XLA's conv
    # lowering runs this shape class at its MXU ceiling already
    dw = lax.conv_general_dilated(
        jnp.transpose(xpad, (1, 0, 2, 3)),          # [D, B, Hp, Wp]
        jnp.transpose(dy, (1, 0, 2, 3)),            # [M, B, H, W]
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=xpad.dtype)          # [D, M, nk, nl]
    return dx.astype(xpad.dtype), jnp.transpose(dw, (1, 0, 2, 3))


conv_valid_pallas.defvjp(_conv_valid_fwd, _conv_valid_bwd)
