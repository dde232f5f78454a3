"""Fused radix-4 four-step rfft2 kernels (ops/pallas_fft.py).

Interpret-mode equality against jnp.fft.rfft2 — the kernels replace
XLA's FFT custom-call for the burst's signal transform (the reference's
cuFFT plans, source/fft_backproplib.cu:764-801), so bit-level agreement
of every bin (through the natural-order gather AND through the raw
mixed-order permutation maps) is the whole contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spectralae.ops.pallas_fft import (
    rfft2_pallas, rfft2_mixed, rfft_y_mixed, fft_x_mixed,
    perm_x, perm_y, ny_padded, natural_gathers)

HI = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize("nx,ny", [(32, 32), (64, 32), (32, 64),
                                   (16, 48), (128, 128), (256, 64)])
def test_rfft2_natural_equality(nx, ny):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, nx, ny)).astype(np.float32) * 7)
    got = rfft2_pallas(x, precision=HI, interpret=True)
    ref = jnp.fft.rfft2(x)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-6, rel


def test_rfft2_high_tier_equality():
    """HIGH requests the manual bf16x3 decomposition (Mosaic lowers only
    DEFAULT/HIGHEST dot precisions) — the three-cross-product algebra
    must reproduce the transform to the tier's intrinsic ~2^-18 rel
    (the dropped lo·lo cross term)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 64, 64)).astype(np.float32) * 7)
    got = rfft2_pallas(x, precision=jax.lax.Precision.HIGH,
                       interpret=True)
    ref = jnp.fft.rfft2(x)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel


def test_mixed_order_maps():
    """The raw mixed-order output + (perm_x, perm_y) IS the spectrum:
    consumers permute per-bin constants instead of the data."""
    nx, ny = 64, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(nx, ny)).astype(np.float32))
    Xre, Xim = rfft2_mixed(x, precision=HI, interpret=True)
    assert Xre.shape == (nx, ny_padded(ny))
    ref = np.asarray(jnp.fft.rfft2(x))
    px, py = perm_x(nx), perm_y(ny)
    got = np.asarray(Xre) + 1j * np.asarray(Xim)
    ok = py >= 0
    scale = np.abs(ref).max()
    assert np.abs(got[px.argsort()][:, ok][:, py[ok].argsort()]
                  - ref).max() < 1e-5 * scale
    # inverse maps agree with the gather the natural wrapper uses
    row_of, lane_of = natural_gathers(nx, ny)
    assert np.abs(got[row_of][:, lane_of] - ref).max() < 1e-5 * scale


def test_y_stage_alone():
    """rfft_y_mixed = jnp.fft.rfft along the last axis, mixed lanes."""
    nx, ny = 16, 64
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(nx, ny)).astype(np.float32))
    Yre, Yim = rfft_y_mixed(x, precision=HI, interpret=True)
    ref = np.asarray(jnp.fft.rfft(x, axis=-1))
    py = perm_y(ny)
    got = (np.asarray(Yre) + 1j * np.asarray(Yim)).reshape(4, nx, -1)
    k1p = got.shape[-1]
    for lane in range(4 * k1p):
        k2, k1 = divmod(lane, k1p)
        if py[lane] >= 0:
            np.testing.assert_allclose(got[k2, :, k1], ref[:, py[lane]],
                                       rtol=0, atol=1e-4)


def test_x_stage_alone():
    """fft_x_mixed = full complex FFT along -2, mixed rows, lanes kept."""
    nx, L = 64, 8
    rng = np.random.default_rng(3)
    yr = rng.normal(size=(nx, L)).astype(np.float32)
    yi = rng.normal(size=(nx, L)).astype(np.float32)
    Xre, Xim = fft_x_mixed(jnp.asarray(yr), jnp.asarray(yi),
                           precision=HI, interpret=True)
    ref = np.fft.fft(yr + 1j * yi, axis=0)
    got = np.asarray(Xre) + 1j * np.asarray(Xim)
    np.testing.assert_allclose(got[perm_x(nx).argsort()], ref,
                               rtol=0, atol=1e-4 * np.abs(ref).max())


def test_bf16_output_dtype():
    nx, ny = 32, 32
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(nx, ny)).astype(np.float32))
    Xre, Xim = rfft2_mixed(x, precision=HI, out_dtype=jnp.bfloat16,
                           interpret=True)
    assert Xre.dtype == jnp.bfloat16 and Xim.dtype == jnp.bfloat16
    ref = jnp.fft.rfft2(x)
    row_of, lane_of = natural_gathers(nx, ny)
    got = (np.asarray(Xre, np.float32)
           + 1j * np.asarray(Xim, np.float32))[row_of][:, lane_of]
    rel = np.linalg.norm(got - np.asarray(ref)) / np.linalg.norm(ref)
    assert rel < 6e-3, rel          # bf16 storage rounding (2⁻⁹ scale)


@pytest.mark.parametrize("nx,ny", [(64, 64), (128, 64), (64, 128),
                                   (256, 256)])
def test_wrapper_recursion_equality(nx, ny, monkeypatch):
    """Axes longer than 4·_MAX_M1 peel wrapper-level butterfly rounds
    (the 4096²+ path).  Shrinking _MAX_M1 forces 1–3 rounds at toy
    sizes; the recursive perm maps and the natural gather must agree
    with jnp.fft.rfft2 exactly as in the single-round case."""
    import spectralae.ops.pallas_fft as pf
    monkeypatch.setattr(pf, "_MAX_M1", 8)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, nx, ny)).astype(np.float32) * 5)
    got = pf.rfft2_pallas(x, precision=HI, interpret=True)
    ref = jnp.fft.rfft2(x)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 3e-6, rel
    # every needed bin appears exactly once in the recursive perm maps
    py = pf.perm_y(ny)
    vals = py[py >= 0]
    assert sorted(vals) == list(range(ny // 2 + 1))
    assert sorted(pf.perm_x(nx)) == list(range(nx))


def test_lead_chunk_equality(monkeypatch):
    """``lead_chunk`` serializes the transform over the leading batch
    (lax.map) — the ≥8192² HBM-fit path.  Bit-equal to the unchunked
    pipeline, including under forced wrapper recursion and bf16 out."""
    import spectralae.ops.pallas_fft as pf
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(3, 64, 64)).astype(np.float32) * 5)
    ref = rfft2_mixed(x, precision=HI, interpret=True)
    for chunk in (1, 3):
        got = rfft2_mixed(x, precision=HI, interpret=True,
                          lead_chunk=chunk)
        assert all(jnp.array_equal(g, r) for g, r in zip(got, ref))
    monkeypatch.setattr(pf, "_MAX_M1", 8)
    ref = pf.rfft2_mixed(x, precision=HI, interpret=True,
                         out_dtype=jnp.bfloat16)
    got = pf.rfft2_mixed(x, precision=HI, interpret=True,
                         out_dtype=jnp.bfloat16, lead_chunk=1)
    assert all(jnp.array_equal(g, r) for g, r in zip(got, ref))
    # non-divisible chunk: rounds DOWN to the largest divisor of B·D
    # (here 2 -> 1) so the requested HBM bound still holds — it must
    # NOT silently fall through to the unchunked pipeline
    got = pf.rfft2_mixed(x, precision=HI, interpret=True,
                         out_dtype=jnp.bfloat16, lead_chunk=2)
    assert all(jnp.array_equal(g, r) for g, r in zip(got, ref))
    # a 4-plane batch with chunk=3 serializes as 2 chunks of 2
    x4 = jnp.asarray(np.random.default_rng(12).normal(
        size=(4, 64, 64)).astype(np.float32) * 5)
    ref4 = pf.rfft2_mixed(x4, precision=HI, interpret=True)
    got4 = pf.rfft2_mixed(x4, precision=HI, interpret=True, lead_chunk=3)
    assert all(jnp.array_equal(g, r) for g, r in zip(got4, ref4))


def test_batched_leading_dims():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 2, 3, 32, 48)).astype(np.float32))
    got = rfft2_pallas(x, precision=HI, interpret=True)
    ref = jnp.fft.rfft2(x)
    assert got.shape == ref.shape
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 2e-6, rel
