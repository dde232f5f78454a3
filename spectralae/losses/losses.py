"""Losses: reconstruction MSE variants and the kernel-diversity objective.

The reference's multiobjective mode combines the reconstruction gradient with
a *repulsion* gradient that pushes kernels apart:

    g ← w0·g_recon − w1·g_div,   w0=1, w1=10   (fft_backproplib.cu:1252)

``gradient_diff`` (fft_backproplib.cu:709-753) is the gradient of
``½·Σ_pairs log‖c_md − c_m'd'‖²`` (plus ``Σ log|b_m − b_m'|`` for biases),
restricted to pairs with *both* indices different (a reference quirk, line
724).  Here both forms are provided: the explicit vectorized gradient
(bit-matching the reference) and the scalar loss for ``jax.grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_raw(a: jax.Array, b: jax.Array) -> jax.Array:
    """Unnormalized SSE — the CPU path's printed 'mse' (netlib.cpp:374-385)."""
    return jnp.sum((a - b) ** 2)


def mse_coord(a: jax.Array, b: jax.Array, m: int, nk: int, nl: int) -> jax.Array:
    """The GPU coord path's printed mse: SSE / (D·M·Nk·Nl·Nx·Ny)
    (backproplib.cu:303, 356)."""
    d, nx, ny = a.shape[-3], a.shape[-2], a.shape[-1]
    return mse_raw(a, b) / (d * m * nk * nl * nx * ny)


def _pair_mask(m: int, d: int) -> jax.Array:
    """[M,D,M,D] mask of pairs with m1≠m AND d1≠d (fft_backproplib.cu:724)."""
    mm = ~jnp.eye(m, dtype=bool)
    dd = ~jnp.eye(d, dtype=bool)
    return mm[:, None, :, None] & dd[None, :, None, :]


def diversity_gradients(c: jax.Array, f: jax.Array, b: jax.Array,
                        p: jax.Array):
    """Vectorized ``gradient_diff``: repulsion gradients for (c, f, b, p).

    c: [M,D,Nk,Nl]; f: [D,M,Nk,Nl]; b: [M]; p: [D].
    Returns (cd [M,D,Nk,Nl], fd [D,M,Nk,Nl], bd [M], pd [D]).
    """
    M, D = c.shape[0], c.shape[1]
    mask = _pair_mask(M, D)

    def repel(k):  # k: [A,B,Nk,Nl], pairs over (A,B)
        diff = k[:, :, None, None] - k[None, None, :, :]      # [A,B,A,B,Nk,Nl]
        den = jnp.sum(diff * diff, axis=(-2, -1))             # [A,B,A,B]
        den = jnp.where(den == 0, 1.0, den)
        return diff / den[..., None, None]

    cd = jnp.sum(repel(c) * mask[..., None, None], axis=(2, 3))
    # f is indexed [d, m]; its pair mask is the transposed layout
    fd = jnp.sum(repel(f) * _pair_mask(D, M)[..., None, None], axis=(2, 3))
    bdiff = b[:, None] - b[None, :]
    bd = jnp.sum(jnp.where(~jnp.eye(M, dtype=bool),
                           1.0 / jnp.where(bdiff == 0, 1.0, bdiff), 0.0),
                 axis=1)
    pdiff = p[:, None] - p[None, :]
    pd = jnp.sum(jnp.where(~jnp.eye(D, dtype=bool),
                           1.0 / jnp.where(pdiff == 0, 1.0, pdiff), 0.0),
                 axis=1)
    return cd, fd, bd, pd


def diversity_loss(c: jax.Array, b: jax.Array) -> jax.Array:
    """Scalar form for autodiff: ``½Σ log‖Δc‖² + Σ log|Δb|`` over the same
    restricted pair set — ``jax.grad`` of this equals the repulsion
    gradients of :func:`diversity_gradients` for the kernels (the caller
    combines them as ``w0·g_recon − w1·g_div``, so the MINUS applies the
    repulsion; tested in test_gradients.py)."""
    M, D = c.shape[0], c.shape[1]
    mask = _pair_mask(M, D)
    diff = c[:, :, None, None] - c[None, None, :, :]
    den = jnp.sum(diff * diff, axis=(-2, -1))
    # identical kernels: log(0) -> -inf and NaN grads; guard like
    # diversity_gradients' den==0 path
    den = jnp.where(den == 0, 1.0, den)
    logs = jnp.where(mask, jnp.log(jnp.where(mask, den, 1.0)), 0.0)
    bdiff = jnp.abs(b[:, None] - b[None, :])
    blogs = jnp.where(~jnp.eye(M, dtype=bool),
                      jnp.log(jnp.where(bdiff == 0, 1.0, bdiff)), 0.0)
    return 0.25 * jnp.sum(logs) + 0.5 * jnp.sum(blogs)
