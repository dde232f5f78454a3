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


def test_kernel_spectrum_composes_multiplicatively():
    """The composed-kernel anchor identity (train/fft_corr.corr_precompute):
    kernel_spectrum(f ∗ c summed over m) == Σ_m f̂·ĉ pointwise — the scatter
    map and the restricted-DFT phase convention must agree exactly."""
    import jax.numpy as jnp
    from spectralae.ops import dft
    from spectralae.train.fft_corr import _lag_maps
    rng = np.random.default_rng(5)
    nx, ny = 16, 12
    m, d, nk, nl = 4, 2, 3, 5
    c = jnp.asarray(rng.normal(size=(m, d, nk, nl)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(d, m, nk, nl)).astype(np.float32))
    want = jnp.einsum("dmxy,mexy->dexy", dft.kernel_spectrum(f, nx, ny),
                      dft.kernel_spectrum(c, nx, ny))
    maps = _lag_maps(nk, nl)
    P = nk * nl
    hx2, hy2 = maps["l2ext"]
    K2 = jnp.einsum("emq,mdr->edqr", f.reshape(d, m, P),
                    c.reshape(m, d, P)).reshape(d * d, P * P)
    K0taps = (K2 @ jnp.asarray(maps["g_scatter_pair"])
              ).reshape(d, d, 2 * hx2 + 1, 2 * hy2 + 1)
    got = dft.kernel_spectrum(K0taps, nx, ny)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)
