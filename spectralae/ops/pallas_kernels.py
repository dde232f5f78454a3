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
