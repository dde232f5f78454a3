"""End-to-end training behavior: convergence in both domains, domain parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectralae.core.config import Config, LayerParams
from spectralae.core.types import initial_spec, init_params
from spectralae.model import autoencoder as model
from spectralae.train.fft import fft_burst
from spectralae.train.coord import coord_step
from spectralae.ops import coord as coord_ops


def small_setup(nx=16, d=2, m=4, scale=1, lk=0, seed=0):
    cfg = Config(nx=nx, ny=nx, d=d,
                 layer=LayerParams(depth=m, lk=lk, ll=lk, scale=scale, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(seed), spec, cfg.layer.rmax)
    return cfg, spec, params


def test_fft_burst_decreases_mse():
    cfg, spec, params = small_setup(nx=16, scale=1)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(cfg.d, cfg.nx, cfg.ny)).astype(np.float32)) * 50
    enc, dec = params.pair(0)
    out0 = model.forward_fft(params, x[None], spec.scales)[0]
    res = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=100)
    mses = np.asarray(res.mses)
    assert np.all(np.isfinite(mses))
    assert mses[-1] < mses[0] * 0.9, mses[[0, -1]]


def test_fft_burst_multiobjective_runs():
    cfg, spec, params = small_setup(nx=16, scale=1)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(cfg.d, cfg.nx, cfg.ny)).astype(np.float32)) * 50
    enc, dec = params.pair(0)
    out0 = model.forward_fft(params, x[None], spec.scales)[0]
    res = fft_burst(x, x, out0, enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=10, maxdiff=True)
    assert np.all(np.isfinite(np.asarray(res.mses)))


def test_coord_training_decreases_mse():
    """Repeated forward + coord_step on a fixed image reduces reconstruction
    error — the interactive training loop of the reference (SURVEY.md §4c)."""
    cfg, spec, params = small_setup(nx=12, scale=1, seed=3)
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, cfg.d, cfg.nx, cfg.ny)).astype(np.float32)) * 50
    enc, dec = params.pair(0)
    c, f, b, p = enc.c, dec.c, enc.b, dec.b
    mom = tuple(jnp.zeros_like(t) for t in (c, f, b, p))
    pg = mom
    mses = []
    for _ in range(30):
        acts = model.forward_coord(
            params.replace_pair(0, enc.__class__(c=c, b=b),
                                dec.__class__(c=f, b=p)),
            x, spec.scales, tap_mode="ref_gpu")
        res = coord_step(acts[1][0], acts[-2][0], acts[2][0], c, f, b, p,
                         mom, pg, lr=0.2, alpha=0.9, tap_mode="ref_gpu")
        c, f, b, p, mom, pg = res.c, res.f, res.b, res.p, res.mom, res.prev_grad
        mses.append(float(res.mse))
    assert np.isfinite(mses).all()
    assert mses[-1] < mses[0] * 0.9, (mses[0], mses[-1])


def test_coord_training_symmetric_ties_weights():
    cfg, spec, params = small_setup(nx=12, scale=1, seed=4)
    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(1, cfg.d, cfg.nx, cfg.ny)).astype(np.float32)) * 50
    enc, dec = params.pair(0)
    c, f, b, p = enc.c, dec.c, enc.b, dec.b
    mom = tuple(jnp.zeros_like(t) for t in (c, f, b, p))
    acts = model.forward_coord(params, x, spec.scales, tap_mode="ref_gpu")
    res = coord_step(acts[1][0], acts[-2][0], acts[2][0], c, f, b, p,
                     mom, mom, lr=0.2, sym=True, tap_mode="ref_gpu")
    np.testing.assert_array_equal(np.asarray(res.f),
                                  np.asarray(jnp.transpose(res.c, (1, 0, 2, 3))))


def test_coord_fft_forward_parity_interior():
    """Centered-tap coordinate forward == spectral forward away from the
    boundary (circular vs zero padding only differ within the kernel halo).

    The BASELINE 1e-4 coord-vs-FFT agreement target, tested honestly: input
    supported away from the frame edge, no pooling, centered taps.
    """
    cfg, spec, params = small_setup(nx=32, d=2, m=3, scale=1, lk=1, seed=5)
    rng = np.random.default_rng(4)
    x = np.zeros((1, cfg.d, 32, 32), np.float32)
    x[..., 8:24, 8:24] = rng.normal(size=(1, cfg.d, 16, 16)) * 10
    xj = jnp.asarray(x)
    out_coord = model.forward_coord(params, xj, spec.scales,
                                    tap_mode="centered")[-1]
    out_fft = model.forward_fft(params, xj, spec.scales)
    a = np.asarray(out_coord)
    bb = np.asarray(out_fft)
    # two 5×5 convs → halo of 4 pixels
    np.testing.assert_allclose(a[..., 4:-4, 4:-4], bb[..., 4:-4, 4:-4],
                               rtol=1e-4, atol=2e-3)


def test_forward_coord_matches_oracle_pipeline():
    import oracle
    cfg, spec, params = small_setup(nx=16, d=2, m=3, scale=2, lk=0, seed=6)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(cfg.d, 16, 16)).astype(np.float32)
    acts = model.forward_coord(params, jnp.asarray(x)[None], spec.scales,
                               tap_mode="ref_gpu")
    enc, dec = params.pair(0)
    pooled = oracle.pool_ref(x, 2)
    h = oracle.conv_ref(pooled, np.asarray(enc.c), np.asarray(enc.b),
                        mode="ref_gpu", scale_by_dm=True)
    out_c = oracle.conv_ref(h, np.asarray(dec.c), np.asarray(dec.b),
                            mode="ref_gpu", scale_by_dm=True)
    up = oracle.pool_ref(out_c, -2)
    np.testing.assert_allclose(np.asarray(acts[1][0]), pooled, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acts[2][0]), h, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(acts[4][0]), up, rtol=1e-4, atol=1e-3)


def test_forward_fft_layers_mode():
    cfg, spec, params = small_setup(nx=16, d=2, m=3, scale=2, lk=0)
    x = jnp.ones((1, cfg.d, 16, 16))
    out, layers = model.forward_fft(params, x, spec.scales, return_layers=True)
    assert len(layers) == 2 * params.n_stages + 1
    assert layers[1].shape == (1, cfg.d, 8, 8)       # spectral pool ↓2
    assert layers[2].shape == (1, 3, 8, 8)           # conv to M=3
    assert layers[-1].shape == (1, cfg.d, 16, 16)    # final upsample
    np.testing.assert_array_equal(np.asarray(layers[-1]), np.asarray(out))
