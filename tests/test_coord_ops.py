"""Coordinate-space ops vs the numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralae.ops import coord
import oracle


RNG = np.random.default_rng(0)


def rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("mode", ["centered", "ref_cpu", "ref_gpu"])
@pytest.mark.parametrize("nk", [3, 5, 7])
def test_conv2d_matches_oracle(mode, nk):
    D, M, Nx, Ny = 2, 3, 12, 10
    x = rand(D, Nx, Ny)
    c = rand(M, D, nk, nk)
    b = rand(M)
    want = oracle.conv_ref(x, c, b, mode=mode, scale_by_dm=True)
    got = coord.conv2d(jnp.asarray(x)[None], jnp.asarray(c), jnp.asarray(b),
                       tap_mode=mode, scale_by_dm=True)[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_conv2d_no_dm_scaling():
    x, c, b = rand(2, 8, 8), rand(3, 2, 3, 3), rand(3)
    want = oracle.conv_ref(x, c, b, mode="centered", scale_by_dm=False)
    got = coord.conv2d(jnp.asarray(x)[None], jnp.asarray(c), jnp.asarray(b),
                       tap_mode="centered", scale_by_dm=False)[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale", [2, 4])
def test_max_pool_matches_oracle(scale):
    x = rand(3, 16, 16)
    want = oracle.pool_ref(x, scale)
    got = coord.pool(jnp.asarray(x)[None], scale)[0]
    np.testing.assert_allclose(np.asarray(got), want)


def test_max_pool_clamps_at_zero():
    x = -np.ones((1, 4, 4), np.float32)
    got = coord.pool(jnp.asarray(x)[None], 2)[0]
    np.testing.assert_array_equal(np.asarray(got), np.zeros((1, 2, 2)))


@pytest.mark.parametrize("scale", [2, 3])
def test_upsample_matches_oracle(scale):
    x = rand(3, 6, 6)
    want = oracle.pool_ref(x, -scale)
    got = coord.pool(jnp.asarray(x)[None], -scale)[0]
    np.testing.assert_allclose(np.asarray(got), want)


@pytest.mark.parametrize("q", [1, 2, 4])
def test_center_crop_matches_portion(q):
    x = rand(3, 16, 16)
    want = oracle.portion_ref(x, q)
    got = coord.center_crop(jnp.asarray(x), q)
    np.testing.assert_array_equal(np.asarray(got), want)
