"""Data-parallel burst: B=1 equivalence, convergence, 8-device sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectralae.core.config import Config, LayerParams
from spectralae.core.types import initial_spec, init_params
from spectralae.dist import mesh as dist
from spectralae.model import autoencoder as model
from spectralae.train.fft import fft_burst
from spectralae.train.fft_dp import fft_burst_dp, distributed_burst


def setup(nx=16, d=2, m=4, b=8, seed=0):
    cfg = Config(nx=nx, ny=nx, d=d,
                 layer=LayerParams(depth=m, lk=1, ll=1, scale=1, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(seed), spec, 0.5)
    xs = jnp.asarray(np.random.default_rng(seed).normal(
        size=(b, d, nx, nx)).astype(np.float32)) * 50
    out0 = model.forward_fft(params, xs, spec.scales)
    enc, dec = params.pair(0)
    return xs, out0, enc, dec


def test_dp_burst_b1_matches_reference_burst():
    xs, out0, enc, dec = setup(b=1)
    ref = fft_burst(xs[0], xs[0], out0[0], enc.c, dec.c, enc.b, dec.b,
                    lr=0.2, iters=5, impl="dft")
    got = fft_burst_dp(xs, xs, out0, enc.c, dec.c, enc.b, dec.b,
                       lr=0.2, iters=5)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(ref.mses),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.c), np.asarray(ref.c),
                               rtol=1e-4, atol=1e-5)


def test_dp_burst_converges_on_batch():
    xs, out0, enc, dec = setup(b=4)
    res = fft_burst_dp(xs, xs, out0, enc.c, dec.c, enc.b, dec.b,
                       lr=0.2, iters=60)
    mses = np.asarray(res.mses)
    assert np.isfinite(mses).all()
    assert mses[-1] < mses[0] * 0.9


def test_carried_momentum_chains_bursts():
    """Two k-iteration bursts with carried momentum and a refreshed out0
    equal one 2k-iteration burst — the --carry-momentum streaming
    semantics (the reference zeroes per burst: fft_backproplib.cu:1420)."""
    from spectralae.core.config import Config, LayerParams
    from spectralae.core.types import AEParams, ConvStage, initial_spec, \
        init_params
    cfg = Config(nx=16, ny=16, d=2,
                 layer=LayerParams(depth=4, lk=1, ll=1, scale=1, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(5), spec, 0.5)
    xs = jnp.asarray(np.random.default_rng(5).normal(
        size=(2, 2, 16, 16)).astype(np.float32)) * 50
    out0 = model.forward_fft(params, xs, spec.scales)
    enc, dec = params.pair(0)
    whole = fft_burst_dp(xs, xs, out0, enc.c, dec.c, enc.b, dec.b,
                         lr=0.2, iters=8)
    r1 = fft_burst_dp(xs, xs, out0, enc.c, dec.c, enc.b, dec.b,
                      lr=0.2, iters=4)
    p1 = AEParams(stages=(ConvStage(c=r1.c, b=r1.b),
                          ConvStage(c=r1.f, b=r1.p)))
    out1 = model.forward_fft(p1, xs, spec.scales)
    r2 = fft_burst_dp(xs, xs, out1, r1.c, r1.f, r1.b, r1.p, r1.mom,
                      lr=0.2, iters=4)
    np.testing.assert_allclose(np.asarray(r2.c), np.asarray(whole.c),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(r2.mses),
                               np.asarray(whole.mses)[4:], rtol=1e-4,
                               atol=1e-5)
    # zeroed momentum (reference semantics) diverges from the chained run
    r2z = fft_burst_dp(xs, xs, out1, r1.c, r1.f, r1.b, r1.p, None,
                       lr=0.2, iters=4)
    assert not np.allclose(np.asarray(r2z.c), np.asarray(whole.c),
                           rtol=1e-4, atol=1e-5)


def test_distributed_burst_matches_single_device():
    assert len(jax.devices()) == 8
    m = dist.make_mesh(n_data=8, n_model=1)
    xs, out0, enc, dec = setup(b=8)
    xs_s = dist.shard_batch(np.asarray(xs), m)
    out0_s = dist.shard_batch(np.asarray(out0), m)
    run = distributed_burst(m, lr=0.2, iters=10)
    got = run(xs_s, xs_s, out0_s, enc.c, dec.c, enc.b, dec.b)
    want = fft_burst_dp(xs, xs, out0, enc.c, dec.c, enc.b, dec.b,
                        lr=0.2, iters=10)
    np.testing.assert_allclose(np.asarray(got.mses), np.asarray(want.mses),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.c), np.asarray(want.c),
                               rtol=1e-4, atol=1e-5)


def test_distributed_burst_pallas_body_matches():
    """The fused-Pallas per-device body under shard_map (interpret mode)
    agrees with the jnp DP body across 8 devices."""
    m = dist.make_mesh(n_data=8, n_model=1)
    xs, out0, enc, dec = setup(b=8, seed=3)
    xs_s = dist.shard_batch(np.asarray(xs), m)
    out0_s = dist.shard_batch(np.asarray(out0), m)
    run_p = distributed_burst(m, lr=0.2, iters=5, use_pallas=True)
    run_j = distributed_burst(m, lr=0.2, iters=5, use_pallas=False)
    rp = run_p(xs_s, xs_s, out0_s, enc.c, dec.c, enc.b, dec.b)
    rj = run_j(xs_s, xs_s, out0_s, enc.c, dec.c, enc.b, dec.b)
    np.testing.assert_allclose(np.asarray(rp.mses), np.asarray(rj.mses),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rp.c), np.asarray(rj.c),
                               rtol=1e-3, atol=1e-4)
