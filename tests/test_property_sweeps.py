"""Randomized shape/mode sweeps against the oracle (lightweight fuzzing)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectralae.ops import coord, spectral, dft
import oracle


RNG = np.random.default_rng(42)


def test_conv_random_shapes_and_modes():
    for trial in range(8):
        d = int(RNG.integers(1, 4))
        m = int(RNG.integers(1, 5))
        nk = int(RNG.choice([3, 5, 7]))
        nl = int(RNG.choice([3, 5]))
        nx = int(RNG.integers(max(8, nk + 2), 14))
        ny = int(RNG.integers(max(8, nl + 2), 14))
        mode = str(RNG.choice(["centered", "ref_cpu", "ref_gpu"]))
        x = RNG.normal(size=(d, nx, ny)).astype(np.float32)
        c = RNG.normal(size=(m, d, nk, nl)).astype(np.float32)
        b = RNG.normal(size=(m,)).astype(np.float32)
        want = oracle.conv_ref(x, c, b, mode=mode)
        got = coord.conv2d(jnp.asarray(x)[None], jnp.asarray(c),
                           jnp.asarray(b), tap_mode=mode)[0]
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4, atol=1e-4,
            err_msg=f"trial {trial}: {d=} {m=} {nk=} {nl=} {nx=} {ny=} {mode=}")


def test_spectral_resize_random_shapes():
    for trial in range(8):
        nx = int(RNG.choice([8, 12, 16, 24]))
        ny = int(RNG.choice([8, 12, 16]))
        f = int(RNG.choice([2, 3]))
        up = bool(RNG.integers(0, 2))
        nxs, nys = (nx * f, ny * f) if up else (nx // f, ny // f)
        if nxs < 4 or nys < 4:
            continue
        spec = np.fft.rfft2(RNG.normal(size=(2, nx, ny))).astype(np.complex64)
        want = oracle.resize_ref(spec, nx, ny, nxs, nys)
        got = spectral.spectral_resize(jnp.asarray(spec), nx, ny, nxs, nys)
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-6, atol=1e-6,
            err_msg=f"trial {trial}: {nx=} {ny=} {nxs=} {nys=}")


def test_dft_transforms_random_shapes():
    for trial in range(6):
        nk = int(RNG.choice([3, 5, 7]))
        nl = int(RNG.choice([3, 5]))
        nx = int(RNG.choice([12, 16, 20]))
        ny = int(RNG.choice([12, 16]))
        if nk >= nx or nl >= ny:
            continue
        c = RNG.normal(size=(2, 2, nk, nl)).astype(np.float32)
        want = np.asarray(spectral.kernel_rfft(jnp.asarray(c), nx, ny))
        got = np.asarray(dft.kernel_spectrum(jnp.asarray(c), nx, ny))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"{nk=} {nl=} {nx=} {ny=}")
        spat = RNG.normal(size=(2, 2, nx, ny)).astype(np.float32)
        D = jnp.asarray(np.fft.rfft2(spat).astype(np.complex64))
        want2 = np.asarray(spectral.kernel_shrink(
            spectral.irfft2_unnormalized(D, (nx, ny)), nk, nl))
        got2 = np.asarray(dft.kernel_project(D, nk, nl, nx, ny))
        np.testing.assert_allclose(got2, want2, rtol=2e-3, atol=0.3,
                                   err_msg=f"{nk=} {nl=} {nx=} {ny=}")


def test_init_determinism():
    from spectralae.core.config import Config, LayerParams
    from spectralae.core.types import initial_spec, init_params
    cfg = Config(nx=16, ny=16, d=3,
                 layer=LayerParams(depth=4, lk=0, ll=0, scale=2, rmax=1.0))
    spec = initial_spec(cfg)
    p1 = init_params(jax.random.key(7), spec, 1.0)
    p2 = init_params(jax.random.key(7), spec, 1.0)
    for a, b in zip(p1.stages, p2.stages):
        np.testing.assert_array_equal(np.asarray(a.c), np.asarray(b.c))
    p3 = init_params(jax.random.key(8), spec, 1.0)
    assert not np.array_equal(np.asarray(p1.stages[0].c),
                              np.asarray(p3.stages[0].c))
