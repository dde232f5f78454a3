"""Spectral-domain ops vs the numpy oracle, including the rfft layout quirks."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralae.ops import spectral
import oracle


RNG = np.random.default_rng(1)


def rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


def rand_spec(d, nx, ny):
    """A genuine rfft2 half-spectrum (so Hermitian constraints hold)."""
    return np.fft.rfft2(rand(d, nx, ny)).astype(np.complex64)


@pytest.mark.parametrize("nx,ny,nxs,nys", [
    (16, 16, 8, 8),    # downsample ×2
    (16, 16, 4, 4),    # downsample ×4
    (8, 8, 16, 16),    # upsample ×2
    (8, 8, 24, 24),    # upsample ×3
    (16, 12, 8, 6),    # non-square
])
def test_spectral_resize_matches_oracle(nx, ny, nxs, nys):
    spec = rand_spec(3, nx, ny)
    want = oracle.resize_ref(spec, nx, ny, nxs, nys)
    got = spectral.spectral_resize(jnp.asarray(spec), nx, ny, nxs, nys)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_spectral_pool_roundtrip_scales():
    X = rand_spec(2, 16, 16)
    Y, nx, ny = spectral.spectral_pool(jnp.asarray(X), 16, 16, 2)
    assert (nx, ny) == (8, 8) and Y.shape == (2, 8, 5)
    Z, nx, ny = spectral.spectral_pool(Y, 8, 8, -2)
    assert (nx, ny) == (16, 16) and Z.shape == (2, 16, 9)


def test_conv_k_matches_oracle():
    D, M, nx, ny = 3, 4, 8, 8
    X = rand_spec(D, nx, ny)
    C = np.stack([rand_spec(D, nx, ny) for _ in range(M)])
    b = rand(M)
    want = oracle.conv_k_ref(X, C, b, nx, ny)
    got = spectral.spectral_conv(jnp.asarray(X)[None], jnp.asarray(C),
                                 jnp.asarray(b), nx, ny)[0]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("nk", [3, 5])
def test_kernel_pad_matches_oracle(nk):
    c = rand(2, 3, nk, nk)
    want = oracle.kernel_pad_ref(c, 12, 12)
    got = spectral.kernel_pad(jnp.asarray(c), 12, 12)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("nk", [3, 5])
def test_kernel_shrink_matches_oracle(nk):
    full = rand(2, 3, 12, 12)
    want = oracle.shrink_k_ref(full, nk, nk)
    got = spectral.kernel_shrink(jnp.asarray(full), nk, nk)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pad_shrink_roundtrip():
    c = rand(2, 3, 5, 5)
    padded = spectral.kernel_pad(jnp.asarray(c), 16, 16)
    back = spectral.kernel_shrink(padded, 5, 5)
    np.testing.assert_array_equal(np.asarray(back), c)


def test_parseval_mse_matches_oracle_and_spatial():
    D, M, nx, ny = 3, 4, 8, 8
    a, o = rand(D, nx, ny), rand(D, nx, ny)
    A = np.fft.rfft2(a)
    O = np.fft.rfft2(o)
    want = oracle.calc_mse_ref(A, O, D, M, nx, ny)
    got = spectral.parseval_mse(jnp.asarray(A), jnp.asarray(O), D, M, nx, ny)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)
    # Parseval: equals the spatial SSE / (2·M·D·Nx·Ny)
    spatial = np.sum((a - o) ** 2) / (2 * M * D * nx * ny)
    np.testing.assert_allclose(float(got), spatial, rtol=1e-4)


def test_parseval_mse_odd_ny():
    """Odd Ny: the last rfft column is NOT self-conjugate and must carry
    weight 2 for Parseval to hold (the dft-path weights agree)."""
    D, M, nx, ny = 2, 3, 8, 9
    a, o = rand(D, nx, ny), rand(D, nx, ny)
    got = spectral.parseval_mse(jnp.asarray(np.fft.rfft2(a)),
                                jnp.asarray(np.fft.rfft2(o)), D, M, nx, ny)
    spatial = np.sum((a - o) ** 2) / (2 * M * D * nx * ny)
    np.testing.assert_allclose(float(got), spatial, rtol=1e-4)


def test_spectral_conv_equals_circular_conv():
    """FFT pointwise conv == centered circular convolution in pixel space."""
    D, M, nx, ny = 2, 3, 16, 16
    x = rand(D, nx, ny)
    c = rand(M, D, 5, 5)
    b = rand(M)
    X = spectral.rfft2(jnp.asarray(x))
    C = spectral.kernel_rfft(jnp.asarray(c), nx, ny)
    O = spectral.spectral_conv(X[None], C, jnp.asarray(b), nx, ny)[0]
    got = np.asarray(spectral.irfft2(O, (nx, ny)))
    # oracle: direct centered circular convolution
    want = np.zeros((M, nx, ny), np.float32)
    for m in range(M):
        for d in range(D):
            for dk in range(-2, 3):
                for dl in range(-2, 3):
                    want[m] += c[m, d, 2 + dk, 2 + dl] * np.roll(
                        x[d] / M, (dk, dl), axis=(0, 1))
        want[m] += b[m]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
