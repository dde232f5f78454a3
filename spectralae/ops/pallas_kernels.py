"""Pallas TPU kernels for the momentum-space hot path.

The reference's hot device kernel is the pointwise complex-multiply
convolution ``conv_k`` (source/fft_backproplib.cu:162-189) — the SURVEY.md
"north-star" op.  Complex isn't native on the TPU VPU, so spectra are kept
in split re/im layout inside the kernel (the layout question flagged in
SURVEY.md §7) and the four real multiplies are fused in VMEM, one pass over
HBM for each operand.

Kernels fall back to ``interpret=True`` off-TPU so the same code paths are
unit-tested on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _cmul_contract_kernel(pr_ref, pi_ref, qr_ref, qi_ref, or_ref, oi_ref):
    """out[a, b, w] = Σ_k p[a, k, w]·q[k, b, w] (complex, split re/im).

    One ω-tile per program; the four real products fuse in VMEM.  Operands
    may arrive reduced-precision (bf16 streaming halves the HBM traffic of
    this bandwidth-bound op); accumulation is always f32 in VMEM.
    """
    pr = pr_ref[:].astype(jnp.float32)   # [A, K, TW]
    pi = pi_ref[:].astype(jnp.float32)
    qr = qr_ref[:].astype(jnp.float32)   # [K, B, TW]
    qi = qi_ref[:].astype(jnp.float32)
    or_ref[:] = jnp.sum(pr[:, :, None] * qr[None] - pi[:, :, None] * qi[None],
                        axis=1)
    oi_ref[:] = jnp.sum(pr[:, :, None] * qi[None] + pi[:, :, None] * qr[None],
                        axis=1)


def _cmul_contract(pr, pi, qr, qi, *, interpret):
    """Pointwise-complex contraction ``[A,K,W]×[K,B,W] → [A,B,W]``.

    The building block of the spectral conv and both its VJP contractions —
    each is a tiny-K contraction at every frequency bin, which XLA's einsum
    lowers to huge broadcast temporaries (measured 5.1 ms at 512² b4 vs
    0.7 ms fused).
    """
    a, k, w = pr.shape
    b = qr.shape[1]
    # ω-tile sized so the [A,K,B,TW] broadcast temporaries (the dominant
    # VMEM consumers) stay within budget; pad W to a tile multiple
    per_lane = 4 * (2 * (a * k + k * b + a * b) + 4 * a * k * b)
    tw = 128
    while tw * 2 <= min(2048, (4 * 1024 * 1024) // max(per_lane, 1)):
        tw *= 2
    wpad = -(-w // tw) * tw
    if wpad != w:
        pad = ((0, 0), (0, 0), (0, wpad - w))
        pr, pi, qr, qi = (jnp.pad(t, pad) for t in (pr, pi, qr, qi))
    grid = (wpad // tw,)
    blk = lambda r, c: pl.BlockSpec((r, c, tw), lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        _cmul_contract_kernel,
        grid=grid,
        in_specs=[blk(a, k), blk(a, k), blk(k, b), blk(k, b)],
        out_specs=[blk(a, b), blk(a, b)],
        out_shape=[jax.ShapeDtypeStruct((a, b, wpad), jnp.float32),
                   jax.ShapeDtypeStruct((a, b, wpad), jnp.float32)],
        interpret=interpret,
    )(pr, pi, qr, qi)
    return outr[..., :w], outi[..., :w]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def spectral_conv_fused(X, C, b, nx, ny, scale_by_dm=True,
                        compute_dtype=None):
    """Batched pointwise complex conv as a fused Pallas kernel, with a
    custom VJP so the modern autodiff path differentiates through it.

    Drop-in for :func:`spectralae.ops.spectral.spectral_conv`:
    ``out[b,m,ω] = Σ_d (X[b,d,ω]/M)·C[m,d,ω]`` + DC-bin bias
    (``conv_k``, source/fft_backproplib.cu:162-189).

    ``compute_dtype=jnp.bfloat16`` streams the (bandwidth-dominant)
    spectrum/kernel operands at half width; accumulation and outputs stay
    f32 in VMEM — mixed precision for the high-resolution configs.
    """
    return _conv_fwd_impl(X, C, b, nx, ny, scale_by_dm, compute_dtype)


def _conv_fwd_impl(X, C, b, nx, ny, scale_by_dm, compute_dtype=None):
    interpret = not _on_tpu()
    nb, d = X.shape[0], X.shape[1]
    m = C.shape[0]
    nyr = ny // 2 + 1
    w = nx * nyr
    scale = (1.0 / m) if scale_by_dm else 1.0
    cast = (lambda t: t.astype(compute_dtype)) if compute_dtype else \
        (lambda t: t)
    xr = cast((X.real * scale).reshape(nb, d, w))
    xi = cast((X.imag * scale).reshape(nb, d, w))
    cr = cast(jnp.moveaxis(C.real.reshape(m, d, w), 0, 1))  # [D, M, W]
    ci = cast(jnp.moveaxis(C.imag.reshape(m, d, w), 0, 1))
    outr, outi = _cmul_contract(xr, xi, cr, ci, interpret=interpret)
    out = jax.lax.complex(outr, outi).reshape(nb, m, nx, nyr)
    return out.at[..., 0, 0].add(b.astype(out.dtype) * (nx * ny))


def _conv_fwd(X, C, b, nx, ny, scale_by_dm, compute_dtype):
    return _conv_fwd_impl(X, C, b, nx, ny, scale_by_dm, compute_dtype), \
        (X, C)


def _conv_bwd(nx, ny, scale_by_dm, compute_dtype, res, g):
    X, C = res
    interpret = not _on_tpu()
    nb, d = X.shape[0], X.shape[1]
    m = C.shape[0]
    nyr = ny // 2 + 1
    w = nx * nyr
    scale = (1.0 / m) if scale_by_dm else 1.0
    cast = (lambda t: t.astype(compute_dtype)) if compute_dtype else \
        (lambda t: t)
    gr = cast(g.real.reshape(nb, m, w))
    gi = cast(g.imag.reshape(nb, m, w))
    # dX[b,d] = (1/M)·Σ_m g[b,m]·C[m,d]; dC[m,d] = Σ_b g[b,m]·(X[b,d]/M).
    # JAX's cotangent convention for complex-linear ops is the PLAIN
    # transpose (no conjugation) — verified against the einsum path's
    # autodiff in tests/test_pallas.py.
    cr = cast(C.real.reshape(m, d, w))
    ci = cast(C.imag.reshape(m, d, w))
    dxr, dxi = _cmul_contract(gr, gi, cr, ci, interpret=interpret)
    dX = jax.lax.complex(dxr * scale, dxi * scale).reshape(X.shape)
    gmr = jnp.moveaxis(gr, 0, 1)                          # [M, B, W]
    gmi = jnp.moveaxis(gi, 0, 1)
    xr = cast((X.real * scale).reshape(nb, d, w))
    xi = cast((X.imag * scale).reshape(nb, d, w))
    dcr, dci = _cmul_contract(gmr, gmi, xr, xi, interpret=interpret)
    dC = jax.lax.complex(dcr, dci).reshape(C.shape)
    db = (g[..., 0, 0].real.sum(axis=0) * (nx * ny)).astype(
        jnp.result_type(g.real))
    return dX, dC, db


spectral_conv_fused.defvjp(_conv_fwd, _conv_bwd)


def _conv_k_kernel(xr_ref, xi_ref, cr_ref, ci_ref, outr_ref, outi_ref):
    """out[m, w] = Σ_d x[d, w]·c[m, d, w] (complex), one ω-tile per program.

    Shapes per block: x [D, TW], c [M, D, TW], out [M, TW].
    """
    xr = xr_ref[:]
    xi = xi_ref[:]
    cr = cr_ref[:]
    ci = ci_ref[:]
    # broadcast x over m: [1, D, TW] × [M, D, TW], reduce d on the VPU
    outr_ref[:] = jnp.sum(xr[None] * cr - xi[None] * ci, axis=1)
    outi_ref[:] = jnp.sum(xr[None] * ci + xi[None] * cr, axis=1)


@functools.partial(jax.jit, static_argnames=("nx", "ny", "scale_by_dm",
                                             "interpret"))
def spectral_conv_pallas(X: jax.Array, C: jax.Array, b: jax.Array,
                         nx: int, ny: int, *, scale_by_dm: bool = True,
                         interpret: bool | None = None) -> jax.Array:
    """Fused pointwise complex conv: drop-in for
    :func:`spectralae.ops.spectral.spectral_conv` on unbatched spectra.

    X: ``[D, Nx, Nyr]`` complex; C: ``[M, D, Nx, Nyr]`` complex; b: ``[M]``.
    """
    if interpret is None:
        interpret = not _on_tpu()
    m, d = C.shape[0], C.shape[1]
    nyr = ny // 2 + 1
    w = nx * nyr
    tw = 512 if w % 512 == 0 else (128 if w % 128 == 0 else w)
    scale = (1.0 / m) if scale_by_dm else 1.0
    xr = (X.real * scale).reshape(d, w)
    xi = (X.imag * scale).reshape(d, w)
    cr = C.real.reshape(m, d, w)
    ci = C.imag.reshape(m, d, w)
    grid = (w // tw,)
    outr, outi = pl.pallas_call(
        _conv_k_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, tw), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tw), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d, tw), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, d, tw), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, tw), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, tw), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, w), xr.dtype),
            jax.ShapeDtypeStruct((m, w), xr.dtype),
        ],
        interpret=interpret,
    )(xr, xi, cr, ci)
    out = jax.lax.complex(outr, outi)
    # DC-bin bias outside the kernel (one element; XLA fuses the update)
    out = out.at[:, 0].add(b.astype(out.dtype) * (nx * ny))
    return out.reshape(m, nx, nyr)
