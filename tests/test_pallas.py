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
