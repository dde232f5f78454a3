"""Compact-support DFT transforms: kernel↔spectrum as MXU matmuls.

TPU-native optimization replacing the reference's per-iteration kernel FFT
churn.  Because conv kernels live on a tiny Nk×Nl support (25 taps for 5×5),
their full Nx×Ny spectra are rank-P DFT projections:

  forward  (pad+rfft2,      fft_backproplib.cu:1276-1282):
      C(ω) = Σ_{k,l} c[k,l] · e^{-2πi ω·r_kl}          — a [P]×[P,W] matmul
  inverse  (unnormalized C2R + shrink, fft_backproplib.cu:1219-1226):
      g[k,l] = Σ_ω w_ω · Re(D(ω) · e^{+2πi ω·r_kl})    — a [W]×[W,P] matmul

with r_kl the corner-quadrant (circular) kernel positions and w_ω the
Hermitian double-count weights of the half-spectrum.  Both map onto the MXU
as dense matmuls over a precomputed basis instead of lane-hostile FFT
butterflies — and the inverse needs no separate shrink gather.

Exactness: both equal the FFT path bit-for-float (the gradient spectra are
Hermitian, so the C2R's Hermitian assumption holds); validated in
tests/test_dft_ops.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _bases(nk: int, nl: int, nx: int, ny: int):
    """Precompute cos/sin bases, shape [P, W] (P=nk·nl, W=nx·nyr)."""
    nyr = ny // 2 + 1
    k = np.arange(nk)
    l = np.arange(nl)
    rx = (k - nk // 2) % nx                       # circular kernel rows
    ry = (l - nl // 2) % ny                       # circular kernel cols
    wx = np.arange(nx)
    wy = np.arange(nyr)
    # θ[kl, ω] = 2π(wx·rx/nx + wy·ry/ny)
    phase_x = 2 * np.pi * np.outer(rx, wx) / nx   # [nk, nx]
    phase_y = 2 * np.pi * np.outer(ry, wy) / ny   # [nl, nyr]
    theta = (phase_x[:, None, :, None] + phase_y[None, :, None, :])
    theta = theta.reshape(nk * nl, nx * nyr)
    cos = np.cos(theta).astype(np.float32)
    sin = np.sin(theta).astype(np.float32)
    herm = np.full((nyr,), 2.0, np.float32)       # Hermitian column weights
    herm[0] = 1.0
    if ny % 2 == 0:
        herm[-1] = 1.0
    wcol = np.tile(herm, nx)                      # [W]
    return cos, sin, wcol


def kernel_spectrum(c: jax.Array, nx: int, ny: int) -> jax.Array:
    """``rfft2(kernel_pad(c))`` as two matmuls.

    c: ``[..., Nk, Nl]`` real → ``[..., Nx, Ny//2+1]`` complex.
    """
    nk, nl = c.shape[-2], c.shape[-1]
    nyr = ny // 2 + 1
    cos, sin, _ = _bases(nk, nl, nx, ny)
    flat = c.reshape(c.shape[:-2] + (nk * nl,))
    re = jnp.matmul(flat, cos, preferred_element_type=jnp.float32)
    im = jnp.matmul(flat, -sin, preferred_element_type=jnp.float32)
    return jax.lax.complex(re, im).reshape(c.shape[:-2] + (nx, nyr))


def kernel_project(D: jax.Array, nk: int, nl: int, nx: int, ny: int) -> jax.Array:
    """``kernel_shrink(irfft2_unnormalized(D))`` as two matmuls.

    D: ``[..., Nx, Ny//2+1]`` complex (Hermitian-consistent) →
    ``[..., Nk, Nl]`` real — the spatial gradient restricted to the compact
    support, with cuFFT's unnormalized C2R scaling.
    """
    nyr = ny // 2 + 1
    cos, sin, wcol = _bases(nk, nl, nx, ny)
    flat = D.reshape(D.shape[:-2] + (nx * nyr,))
    re = (flat.real * wcol)
    im = (flat.imag * wcol)
    g = (jnp.matmul(re, cos.T, preferred_element_type=jnp.float32)
         - jnp.matmul(im, sin.T, preferred_element_type=jnp.float32))
    return g.reshape(D.shape[:-2] + (nk, nl))
