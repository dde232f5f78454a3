"""Fused Pallas burst vs the jnp burst (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectralae.core.config import Config, LayerParams
from spectralae.core.types import initial_spec, init_params
from spectralae.model import autoencoder as model
from spectralae.train.fft import fft_burst
from spectralae.train.fft_pallas import fft_burst_pallas


def setup(nx=16, d=2, m=4, lk=1, seed=0):
    cfg = Config(nx=nx, ny=nx, d=d,
                 layer=LayerParams(depth=m, lk=lk, ll=lk, scale=1, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(seed), spec, 0.5)
    x = jnp.asarray(np.random.default_rng(seed).normal(
        size=(d, nx, nx)).astype(np.float32)) * 50
    out0 = model.forward_fft(params, x[None], spec.scales)[0]
    enc, dec = params.pair(0)
    return x, out0, enc, dec


@pytest.mark.parametrize("iters", [1, 5])
def test_pallas_burst_matches_jnp(iters):
    x, out0, enc, dec = setup()
    ref = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=iters, impl="dft")
    got = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=iters, interpret=True)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(ref.mses),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.c), np.asarray(ref.c),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.f), np.asarray(ref.f),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.b), np.asarray(ref.b),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.p), np.asarray(ref.p),
                               rtol=1e-3, atol=1e-4)


def test_pallas_burst_converges():
    x, out0, enc, dec = setup(nx=16, d=2, m=4)
    res = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=60, interpret=True)
    mses = np.asarray(res.mses)
    assert np.all(np.isfinite(mses))
    assert mses[-1] < mses[0] * 0.9


def test_pallas_burst_nonsquare_tiles():
    """W not a multiple of the tile width exercises the padding path."""
    x, out0, enc, dec = setup(nx=32, d=2, m=3)  # W = 32*17 = 544
    ref = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=3, impl="dft")
    got = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(ref.mses),
                               rtol=1e-3, atol=1e-4)


def test_pallas_burst_maxdiff_matches_jnp():
    x, out0, enc, dec = setup()
    ref = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=4, impl="dft", maxdiff=True)
    got = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=4, maxdiff=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(ref.mses),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.c), np.asarray(ref.c),
                               rtol=1e-3, atol=1e-4)


def test_pallas_burst_momentum_carry():
    x, out0, enc, dec = setup()
    r1 = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                          lr=0.2, iters=3, interpret=True)
    r2 = fft_burst_pallas(x, x, out0, r1.c, r1.f, r1.b, r1.p, mom=r1.mom,
                          lr=0.2, iters=3, interpret=True)
    ref = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=3, impl="dft")
    ref2 = fft_burst(x, x, out0, ref.c, ref.f, ref.b, ref.p, mom=ref.mom,
                     lr=0.2, iters=3, impl="dft")
    np.testing.assert_allclose(np.asarray(r2.c), np.asarray(ref2.c),
                               rtol=1e-3, atol=1e-4)


def test_pallas_burst_batched_matches_dp():
    from spectralae.train.fft_dp import fft_burst_dp
    import jax
    from spectralae.core.config import Config, LayerParams
    from spectralae.core.types import initial_spec, init_params
    cfg = Config(nx=16, ny=16, d=2,
                 layer=LayerParams(depth=4, lk=1, ll=1, scale=1, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(0), spec, 0.5)
    xs = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 2, 16, 16)).astype(np.float32)) * 50
    out0 = model.forward_fft(params, xs, spec.scales)
    enc, dec = params.pair(0)
    ref = fft_burst_dp(xs, xs, out0, enc.c, dec.c, enc.b, dec.b,
                       lr=0.2, iters=5)
    got = fft_burst_pallas(xs, xs, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=5, interpret=True)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(ref.mses),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.c), np.asarray(ref.c),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.b), np.asarray(ref.b),
                               rtol=1e-3, atol=1e-4)


def test_bf16_mxu_burst_close_to_f32():
    x, out0, enc, dec = setup()
    f32 = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=10, interpret=True)
    bf16 = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                            lr=0.2, iters=10, interpret=True,
                            mxu_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(bf16.mses), np.asarray(f32.mses),
                               rtol=0.05)
    assert bf16.c.dtype == jnp.float32


def test_fused_step_burst_matches_two_kernel():
    from spectralae.train.fft_pallas import fft_burst_pallas_fused
    x, out0, enc, dec = setup()
    ref = fft_burst_pallas(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                           lr=0.2, iters=6, interpret=True)
    got = fft_burst_pallas_fused(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                                 lr=0.2, iters=6, interpret=True)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(ref.mses),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.c), np.asarray(ref.c),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.mom[0]), np.asarray(ref.mom[0]),
                               rtol=1e-4, atol=1e-6)


def test_fused_step_burst_maxdiff():
    from spectralae.train.fft_pallas import fft_burst_pallas_fused
    x, out0, enc, dec = setup()
    ref = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=4, impl="dft", maxdiff=True)
    got = fft_burst_pallas_fused(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                                 lr=0.2, iters=4, maxdiff=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(ref.mses),
                               rtol=1e-3, atol=1e-4)


def test_itergrid_burst_matches_jnp():
    """The whole-burst iteration-grid kernel (train/fft_iter)."""
    from spectralae.train.fft_iter import fft_burst_itergrid
    x, out0, enc, dec = setup()
    ref = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=5, impl="dft")
    got = fft_burst_itergrid(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                             lr=0.2, iters=5, interpret=True)
    for name in ("mses", "c", "f", "b", "p"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_itergrid_burst_momentum_and_nonaligned():
    from spectralae.train.fft_iter import fft_burst_itergrid
    x, out0, enc, dec = setup(nx=32, d=2, m=3)  # W=544 pads to tiles
    r1 = fft_burst_itergrid(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                            lr=0.2, iters=3, interpret=True)
    r2 = fft_burst_itergrid(x, x, out0, r1.c, r1.f, r1.b, r1.p, mom=r1.mom,
                            lr=0.2, iters=2, interpret=True)
    a1 = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                   lr=0.2, iters=3, impl="dft")
    a2 = fft_burst(x, x, out0, a1.c, a1.f, a1.b, a1.p, mom=a1.mom,
                   lr=0.2, iters=2, impl="dft")
    np.testing.assert_allclose(np.asarray(r2.c), np.asarray(a2.c),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r2.mses), np.asarray(a2.mses),
                               rtol=1e-3, atol=1e-4)


def test_fft_and_dft_impls_agree():
    """The literal pad+rfft2 path and the DFT-matmul path are the same math."""
    x, out0, enc, dec = setup()
    a = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                  lr=0.2, iters=4, impl="fft")
    b = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                  lr=0.2, iters=4, impl="dft")
    np.testing.assert_allclose(np.asarray(a.mses), np.asarray(b.mses),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.c), np.asarray(b.c),
                               rtol=1e-3, atol=1e-4)
