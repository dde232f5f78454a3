"""Pallas kernels vs their jnp references (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralae.ops import spectral
from spectralae.ops.pallas_kernels import spectral_conv_pallas


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("nx,ny,m,d", [(16, 16, 4, 3), (32, 32, 10, 3)])
def test_spectral_conv_pallas_matches_jnp(nx, ny, m, d):
    X = np.fft.rfft2(RNG.normal(size=(d, nx, ny))).astype(np.complex64)
    C = np.fft.rfft2(RNG.normal(size=(m, d, nx, ny))).astype(np.complex64)
    b = RNG.normal(size=(m,)).astype(np.float32)
    want = np.asarray(spectral.spectral_conv(
        jnp.asarray(X)[None], jnp.asarray(C), jnp.asarray(b), nx, ny)[0])
    got = np.asarray(spectral_conv_pallas(
        jnp.asarray(X), jnp.asarray(C), jnp.asarray(b), nx, ny,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_spectral_conv_pallas_no_dm_scale():
    nx = ny = 16
    X = np.fft.rfft2(RNG.normal(size=(2, nx, ny))).astype(np.complex64)
    C = np.fft.rfft2(RNG.normal(size=(3, 2, nx, ny))).astype(np.complex64)
    b = np.zeros(3, np.float32)
    want = np.asarray(spectral.spectral_conv(
        jnp.asarray(X)[None], jnp.asarray(C), jnp.asarray(b), nx, ny,
        scale_by_dm=False)[0])
    got = np.asarray(spectral_conv_pallas(
        jnp.asarray(X), jnp.asarray(C), jnp.asarray(b), nx, ny,
        scale_by_dm=False, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_spectral_conv_fused_fwd_and_vjp_match_einsum():
    """Batched fused conv (custom VJP) == einsum path, values AND grads.

    JAX's cotangent convention for complex-linear ops is the plain
    transpose (no conjugation) — this pins the bwd rule.
    """
    import jax
    import jax.numpy as jnp
    from spectralae.ops import dft
    from spectralae.ops.pallas_kernels import spectral_conv_fused
    rng = np.random.default_rng(3)
    nx = ny = 16
    xsp = jnp.asarray(rng.normal(size=(2, 3, nx, ny)).astype(np.float32))
    ck = jnp.asarray(rng.normal(size=(5, 3, 3, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32))

    def ein(X, C, bb):
        out = jnp.einsum("mdxy,bdxy->bmxy", C, X / 5.0)
        return out.at[..., 0, 0].add(bb.astype(out.dtype) * (nx * ny))

    def loss(fn, xs, c, bb):
        X = jnp.fft.rfft2(xs)
        C = dft.kernel_spectrum(c, nx, ny)
        y = jnp.fft.irfft2(fn(X, C, bb), s=(nx, ny))
        return jnp.mean((y - xs[:, :1].repeat(5, 1)) ** 2)

    X = jnp.fft.rfft2(xsp)
    C = dft.kernel_spectrum(ck, nx, ny)
    np.testing.assert_allclose(
        np.asarray(spectral_conv_fused(X, C, b, nx, ny, True)),
        np.asarray(ein(X, C, b)), rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda *a: loss(ein, *a), argnums=(0, 1, 2))(xsp, ck, b)
    g2 = jax.grad(lambda *a: loss(
        lambda Xv, Cv, bb: spectral_conv_fused(Xv, Cv, bb, nx, ny, True),
        *a), argnums=(0, 1, 2))(xsp, ck, b)
    for a, c2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c2),
                                   rtol=1e-4, atol=1e-6)


def test_spectral_conv_bf16_streaming_close_to_f32():
    """compute_dtype=bf16 (operand streaming, f32 accumulation) stays
    within bf16 rounding of the f32 path — values and grads — on both the
    fused (interpret) and einsum implementations."""
    import jax
    import jax.numpy as jnp
    from spectralae.ops import dft
    from spectralae.ops.pallas_kernels import spectral_conv_fused
    rng = np.random.default_rng(9)
    nx = ny = 16
    X = jnp.asarray(np.fft.rfft2(
        rng.normal(size=(2, 3, nx, ny))).astype(np.complex64))
    C = jnp.asarray(np.fft.rfft2(
        rng.normal(size=(4, 3, nx, ny))).astype(np.complex64))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    want = np.asarray(spectral.spectral_conv_einsum(X, C, b, nx, ny))
    got_e = np.asarray(spectral.spectral_conv_einsum(
        X, C, b, nx, ny, compute_dtype=jnp.bfloat16))
    got_f = np.asarray(spectral_conv_fused(X, C, b, nx, ny, True,
                                           jnp.bfloat16))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got_e - want)) < 2e-2 * scale
    assert np.max(np.abs(got_f - want)) < 2e-2 * scale
    assert got_f.dtype == np.complex64  # f32 accumulation/output

    def loss(c, cd):
        y = spectral_conv_fused(X, dft.kernel_spectrum(c, nx, ny),
                                b, nx, ny, True, cd)
        return jnp.mean(jnp.abs(y) ** 2)
    ck = jnp.asarray(rng.normal(size=(4, 3, 3, 3)).astype(np.float32))
    g32 = jax.grad(loss)(ck, None)
    g16 = jax.grad(loss)(ck, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32),
                               rtol=3e-2, atol=1e-3 * float(
                                   np.max(np.abs(np.asarray(g32)))))


def test_modern_fft_train_step_bf16_decreases_loss():
    import jax
    import jax.numpy as jnp
    from spectralae.core.config import Config, LayerParams
    from spectralae.core.types import (init_opt_state, init_params,
                                       initial_spec)
    from spectralae.train.modern import train_step
    cfg = Config(nx=16, ny=16, d=2,
                 layer=LayerParams(depth=4, lk=0, ll=0, scale=2, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(0), spec, 0.5)
    opt = init_opt_state(params)
    x = jnp.asarray(np.random.default_rng(4).normal(
        size=(4, 2, 16, 16)).astype(np.float32)) * 20
    losses = []
    for _ in range(40):
        res = train_step(params, opt, x, spec.scales, lr=0.5, domain="fft",
                         compute_dtype=jnp.bfloat16)
        params, opt = res.params, res.opt
        losses.append(float(res.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9
    assert params.stages[0].c.dtype == jnp.float32
