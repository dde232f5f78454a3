"""Compact-support DFT transforms vs the FFT path they replace."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralae.ops import dft, spectral


RNG = np.random.default_rng(3)


@pytest.mark.parametrize("nk,nx", [(3, 16), (5, 16), (5, 32), (3, 12)])
def test_kernel_spectrum_matches_pad_rfft(nk, nx):
    c = RNG.normal(size=(4, 2, nk, nk)).astype(np.float32)
    want = np.asarray(spectral.kernel_rfft(jnp.asarray(c), nx, nx))
    got = np.asarray(dft.kernel_spectrum(jnp.asarray(c), nx, nx))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nk,nx", [(3, 16), (5, 16), (5, 32)])
def test_kernel_project_matches_irfft_shrink(nk, nx):
    # Hermitian-consistent spectra (FFT of a real signal)
    spat = RNG.normal(size=(4, 2, nx, nx)).astype(np.float32)
    D = jnp.asarray(np.fft.rfft2(spat).astype(np.complex64))
    want = np.asarray(spectral.kernel_shrink(
        spectral.irfft2_unnormalized(D, (nx, nx)), nk, nk))
    got = np.asarray(dft.kernel_project(D, nk, nk, nx, nx))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2 * nx)


def test_roundtrip_spectrum_project():
    """project(spectrum(c)) == c · Nx·Ny (unnormalized C2R scaling)."""
    nk, nx = 5, 24
    c = RNG.normal(size=(2, 3, nk, nk)).astype(np.float32)
    C = dft.kernel_spectrum(jnp.asarray(c), nx, nx)
    back = np.asarray(dft.kernel_project(C, nk, nk, nx, nx))
    np.testing.assert_allclose(back, c * nx * nx, rtol=1e-3, atol=1e-2)


def test_non_square_shapes():
    nk, nl, nx, ny = 3, 5, 16, 12
    c = RNG.normal(size=(2, 2, nk, nl)).astype(np.float32)
    want = np.asarray(spectral.kernel_rfft(jnp.asarray(c), nx, ny))
    got = np.asarray(dft.kernel_spectrum(jnp.asarray(c), nx, ny))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
