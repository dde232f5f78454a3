"""Equality tests for the fused pair-product+window Pallas kernel.

``ops/pallas_windows.corr_pair_windows`` must reproduce the XLA
formulation used by the burst precompute (train/fft_corr.py:360-366):
materialize the pairwise correlation half-spectra, then take centered
lag windows via ``_corr_windows``.  The kernel fuses the two so the
product planes never reach HBM; these tests pin it to the reference
formulation bit-for-f32-tolerance on CPU (interpret mode), including
the masked partial final x-tile and odd-ny half-spectra.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spectralae.ops.pallas_windows import corr_pair_windows
from spectralae.train import fft_corr


def _rand_spec(rng, B, C, nx, nyr):
    return jnp.asarray(rng.standard_normal((B, C, nx, nyr))
                       + 1j * rng.standard_normal((B, C, nx, nyr))
                       ).astype(jnp.complex64)


def _ref(X, Z, nx, ny, hx, hy):
    D, E = X.shape[1], Z.shape[1]
    prods = jnp.mean(jnp.conj(X)[:, :, None] * Z[:, None],
                     axis=0).reshape(D * E, nx, X.shape[-1])
    return fft_corr._corr_windows(prods, nx, ny, hx, hy).reshape(
        D, E, 2 * hx + 1, 2 * hy + 1)


def _norm_rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-30))


@pytest.mark.parametrize("B,D,E,nx,ny,hx,hy", [
    (2, 3, 3, 32, 32, 4, 4),      # square, one x-tile
    (1, 2, 3, 24, 16, 3, 2),      # cross-correlation, D != E
    (3, 1, 1, 16, 18, 5, 5),      # window wider than grid/2 (aliasing)
    (2, 2, 2, 16, 19, 2, 3),      # odd ny (nyr = 10)
])
def test_matches_xla_formulation(B, D, E, nx, ny, hx, hy):
    rng = np.random.default_rng(hash((B, D, E, nx, ny)) % 2**31)
    nyr = ny // 2 + 1
    X = _rand_spec(rng, B, D, nx, nyr)
    Z = _rand_spec(rng, B, E, nx, nyr)
    got = corr_pair_windows(X, Z, nx, ny, hx, hy)
    want = _ref(X, Z, nx, ny, hx, hy)
    assert got.shape == (D, E, 2 * hx + 1, 2 * hy + 1)
    assert _norm_rel(got, want) < 1e-6


def test_autocorrelation_same_object():
    rng = np.random.default_rng(7)
    X = _rand_spec(rng, 2, 3, 32, 17)
    got = corr_pair_windows(X, X, 32, 32, 4, 4)
    want = _ref(X, X, 32, 32, 4, 4)
    assert _norm_rel(got, want) < 1e-6


@pytest.mark.parametrize("B,D,n,ny,nk2", [
    (2, 3, 16, 16, 9),
    (1, 2, 24, 24, 5),
    (1, 2, 16, 19, 5),     # odd ny (nyr = 10)
    (1, 2, 160, 16, 5),    # nx=160 -> TX=128: masked partial final tile
])
def test_anchor_windows_matches_xla(B, D, n, ny, nk2):
    # one-pass kernel (spectra from tap partials + in-VMEM EG) vs the
    # explicit XLA pipeline it replaces
    from spectralae.ops.pallas_windows import anchor_windows
    from spectralae.ops import dft, spectral

    rng = np.random.default_rng(B * 100 + D)
    hx2 = hy2 = nk2 // 2
    s1 = 1.0 / (4 * D)
    x = jnp.asarray(rng.standard_normal((B, D, n, ny)), jnp.float32)
    taps = jnp.asarray(rng.standard_normal((D, D, nk2, nk2)) * 0.2,
                       jnp.float32)
    X = spectral.rfft2(x)
    got_xx, got_eg, got_seg, got_e0 = anchor_windows(
        X, taps, n, ny, hx2, hy2, s1)

    K0f = dft.kernel_spectrum(taps, n, ny, precision="highest")
    EG = jnp.sum(K0f[None] * X[:, None], axis=2) * s1 - X
    want_xx = _ref(X, X, n, ny, 2 * hx2, 2 * hy2)
    want_eg = _ref(X, EG, n, ny, hx2, hy2)
    wv = jnp.asarray(spectral._hermitian_weights(n, ny))
    want_seg = jnp.mean(jnp.sum((EG.real ** 2 + EG.imag ** 2) * wv,
                                axis=(-2, -1, -3)))
    want_e0 = jnp.mean(EG[:, :, 0, 0].real, axis=0)
    assert _norm_rel(got_xx, want_xx) < 1e-6
    assert _norm_rel(got_eg, want_eg) < 1e-6
    assert _norm_rel(got_seg, want_seg) < 1e-6
    assert _norm_rel(got_e0, want_e0) < 1e-6


def test_fused_precompute_equality():
    # full corr_precompute_fused T dict: Pallas windows vs the XLA path
    rng = np.random.default_rng(3)
    B, D, M, n = 2, 3, 4, 16
    x = jnp.asarray(rng.standard_normal((B, D, n, n)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((M, D, 3, 3)) * 0.3, jnp.float32)
    f = jnp.asarray(rng.standard_normal((D, M, 3, 3)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((M,)) * 0.1, jnp.float32)
    p = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)
    T0 = fft_corr.corr_precompute_fused(x, c, f, b, p,
                                        pallas_windows=False)
    T1 = fft_corr.corr_precompute_fused(x, c, f, b, p,
                                        pallas_windows=True)
    for k in T0:
        assert _norm_rel(T1[k], T0[k]) < 1e-6, k


def test_partial_final_x_tile_masked():
    # nx=160 -> TX=128, second tile has 32 valid rows + 96 masked
    rng = np.random.default_rng(11)
    nx, ny = 160, 16
    X = _rand_spec(rng, 1, 2, nx, ny // 2 + 1)
    got = corr_pair_windows(X, X, nx, ny, 3, 3)
    want = _ref(X, X, nx, ny, 3, 3)
    assert _norm_rel(got, want) < 1e-6


def test_scan_of_pallas_precompute():
    # the streaming driver wraps the burst in lax.scan; at >=2M pixels the
    # precompute auto-selects anchor_windows, so scan-of-pallas_call must
    # compile and match a host loop of per-frame bursts (weights carried)
    import jax
    from jax import lax

    rng = np.random.default_rng(5)
    K, B, D, M, n = 3, 1, 2, 3, 16
    xs = jnp.asarray(rng.standard_normal((K, B, D, n, n)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((M, D, 3, 3)) * 0.3, jnp.float32)
    f = jnp.asarray(rng.standard_normal((D, M, 3, 3)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((M,)) * 0.1, jnp.float32)
    p = jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32)

    def step(carry, xk):
        cc, ff, bb, pp = carry
        T = fft_corr.corr_precompute_fused(xk, cc, ff, bb, pp,
                                           pallas_windows=True)
        r = fft_corr.corr_iterate(T, cc, ff, bb, pp, nx=n, ny=n,
                                  iters=5, lr=1e-3)
        return (r.c, r.f, r.b, r.p), r.mses

    (cN, fN, bN, pN), mses = jax.jit(
        lambda xs: lax.scan(step, (c, f, b, p), xs))(xs)

    carry = (c, f, b, p)
    for k in range(K):
        carry, want_mses = step(carry, xs[k])
        assert _norm_rel(mses[k], want_mses) < 1e-6
    for got, want in zip((cN, fN, bN, pN), carry):
        assert _norm_rel(got, want) < 1e-6


def test_anchor_windows_row_slab_partials_sum():
    # slab partials over a disjoint row cover must sum to the full call
    # (the TP sharding contract; windows/seg are linear over x-rows)
    from spectralae.ops.pallas_windows import anchor_windows
    from spectralae.ops import spectral

    rng = np.random.default_rng(17)
    B, D, nx, ny, nk2 = 2, 2, 24, 16, 5
    hx2 = hy2 = nk2 // 2
    s1 = 1.0 / (4 * D)
    x = jnp.asarray(rng.standard_normal((B, D, nx, ny)), jnp.float32)
    taps = jnp.asarray(rng.standard_normal((D, D, nk2, nk2)) * 0.2,
                       jnp.float32)
    X = spectral.rfft2(x)
    want_xx, want_eg, want_seg, _ = anchor_windows(
        X, taps, nx, ny, hx2, hy2, s1)

    chunk = 10                      # 24 rows -> slabs of 10/10/4(+6 pad)
    Xp = jnp.pad(X, ((0, 0), (0, 0), (0, 3 * chunk - nx), (0, 0)))
    parts = [anchor_windows(Xp[:, :, i * chunk:(i + 1) * chunk], taps,
                            nx, ny, hx2, hy2, s1, row_slab=i * chunk)
             for i in range(3)]
    got_xx = sum(p[0] for p in parts)
    got_eg = sum(p[1] for p in parts)
    got_seg = sum(p[2] for p in parts)
    assert _norm_rel(got_xx, want_xx) < 1e-6
    assert _norm_rel(got_eg, want_eg) < 1e-6
    assert _norm_rel(got_seg, want_seg) < 1e-6


@pytest.mark.parametrize("nd,nm", [(2, 4), (4, 2)])
def test_tp_pallas_burst_matches_single_device(nd, nm):
    # DPxTP with the slab-sharded Pallas precompute reproduces the
    # single-device fused burst
    import jax
    from spectralae.dist.mesh import make_mesh
    from spectralae.train.fft_dp import distributed_burst
    from spectralae.train.fft_corr import fft_burst_corr

    if len(jax.devices()) < nd * nm:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(23)
    B, D, M, N = 4, 2, 3, 16
    xs = jnp.asarray(rng.normal(size=(B, D, N, N)), jnp.float32)
    enc_c = jnp.asarray(rng.normal(size=(M, D, 3, 3)) * .3, jnp.float32)
    dec_c = jnp.asarray(rng.normal(size=(D, M, 3, 3)) * .3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(M,)) * .1, jnp.float32)
    p = jnp.asarray(rng.normal(size=(D,)) * .1, jnp.float32)
    want = fft_burst_corr(xs, None, None, enc_c, dec_c, b, p,
                          lr=0.2, iters=5)
    got = distributed_burst(make_mesh(nd, nm), lr=0.2, iters=5,
                            fused=True, pallas_windows=True)(
        xs, enc_c, dec_c, b, p)
    for name in ("c", "f", "b", "p", "mses"):
        np.testing.assert_allclose(np.asarray(getattr(got, name)),
                                   np.asarray(getattr(want, name)),
                                   rtol=3e-5, atol=1e-6, err_msg=name)


def test_anchor_windows_y_chunked():
    # ω_y chunking (the 4096² scoped-VMEM escape hatch) must reproduce
    # the single-chunk call: chunk partials are bin-local sums, e0 from
    # the DC-containing chunk
    from spectralae.ops.pallas_windows import anchor_windows
    from spectralae.ops import spectral

    rng = np.random.default_rng(29)
    B, D, nx, ny, nk2 = 1, 2, 16, 24, 5
    hx2 = hy2 = nk2 // 2
    s1 = 1.0 / (4 * D)
    x = jnp.asarray(rng.standard_normal((B, D, nx, ny)), jnp.float32)
    taps = jnp.asarray(rng.standard_normal((D, D, nk2, nk2)) * 0.2,
                       jnp.float32)
    X = spectral.rfft2(x)          # nyr = 13
    want = anchor_windows(X, taps, nx, ny, hx2, hy2, s1)
    got = anchor_windows(X, taps, nx, ny, hx2, hy2, s1, y_chunk=5)
    for g, w in zip(got, want):
        assert _norm_rel(g, w) < 1e-6


def test_anchor_windows_bf16_is_exact_on_rounded_signal():
    """The bf16 signal-streaming path computes the EXACT f32 answer for
    the bf16-rounded signal: both EG terms share the same rounded X, so
    the anchoring cancellation contract is untouched — the rounding is a
    2⁻⁹-relative perturbation of the *objective*, not of the algebra."""
    from spectralae.ops.pallas_windows import anchor_windows
    from spectralae.ops import spectral

    rng = np.random.default_rng(7)
    B, D, n, ny, nk2 = 2, 3, 16, 16, 9
    hx2 = hy2 = nk2 // 2
    s1 = 1.0 / (4 * D)
    x = jnp.asarray(rng.standard_normal((B, D, n, ny)), jnp.float32) * 1e3
    taps = jnp.asarray(rng.standard_normal((D, D, nk2, nk2)) * 0.2,
                       jnp.float32)
    X = spectral.rfft2(x)
    got = anchor_windows(X, taps, n, ny, hx2, hy2, s1,
                         signal_dtype=jnp.bfloat16)
    # f32 kernel fed the pre-rounded spectra
    Xr = (X.real.astype(jnp.bfloat16).astype(jnp.float32)
          + 1j * X.imag.astype(jnp.bfloat16).astype(jnp.float32)
          ).astype(jnp.complex64)
    want = anchor_windows(Xr, taps, n, ny, hx2, hy2, s1)
    for g, w in zip(got, want):
        assert _norm_rel(g, w) < 1e-6
    # and within the bf16 band of the unrounded result
    full = anchor_windows(X, taps, n, ny, hx2, hy2, s1)
    for g, w in zip(got, full):
        assert _norm_rel(g, w) < 2e-2
