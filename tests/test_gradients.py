"""Gradient implementations vs the numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from spectralae.train.coord import coord_ref_gradients
from spectralae.train.fft import gradient_k_io
from spectralae.losses.losses import diversity_gradients
from spectralae.optim.update import normalized_momentum_update
import oracle


RNG = np.random.default_rng(2)


def rand(*shape):
    return RNG.normal(size=shape).astype(np.float32)


@pytest.mark.parametrize("mode", ["centered", "ref_gpu"])
def test_coord_gradients_match_oracle(mode):
    D, M, Nk, Nx = 2, 3, 3, 8
    in_s, out_s = rand(D, Nx, Nx), rand(D, Nx, Nx)
    hin_s = rand(M, Nx, Nx)
    f = rand(D, M, Nk, Nk)
    want = oracle.gradient_coord_ref(in_s, out_s, hin_s, f, mode=mode)
    got = coord_ref_gradients(jnp.asarray(in_s), jnp.asarray(out_s),
                              jnp.asarray(hin_s), jnp.asarray(f), Nk, Nk,
                              tap_mode=mode)
    np.testing.assert_allclose(np.asarray(got.dc), want[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.df), want[1], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.db), want[2], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.dp), want[3], rtol=1e-4, atol=1e-6)


def test_gradient_k_io_matches_oracle():
    D, M, nx, ny = 2, 3, 8, 8
    nyr = ny // 2 + 1
    Xin = np.fft.rfft2(rand(D, nx, ny)).astype(np.complex64)
    Yout = np.fft.rfft2(rand(D, nx, ny)).astype(np.complex64)
    O = np.fft.rfft2(rand(D, nx, ny)).astype(np.complex64)
    Cf = np.fft.rfft2(rand(M, D, nx, ny)).astype(np.complex64)
    Ff = np.fft.rfft2(rand(D, M, nx, ny)).astype(np.complex64)
    b, p = rand(M), rand(D)
    want = oracle.gradient_k_io_ref(Xin, Yout, O, Cf, Ff, b, p, M, D, nx, ny)
    got = gradient_k_io(jnp.asarray(Xin), jnp.asarray(Yout), jnp.asarray(O),
                        jnp.asarray(Cf), jnp.asarray(Ff), jnp.asarray(b),
                        nx, ny)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3, atol=1e-5)


def test_diversity_gradients_match_oracle():
    M, D, Nk = 4, 3, 3
    c, f = rand(M, D, Nk, Nk), rand(D, M, Nk, Nk)
    b, p = rand(M), rand(D)
    want = oracle.gradient_diff_ref(c, f, b, p)
    got = diversity_gradients(jnp.asarray(c), jnp.asarray(f),
                              jnp.asarray(b), jnp.asarray(p))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-5)


def test_momentum_update_matches_oracle():
    w, g, mom = rand(4, 4), 30 * rand(4, 4), rand(4, 4)
    want_w, want_mom = oracle.momentum_update_ref(w, g, mom, 0.2, 0.9)
    got = normalized_momentum_update(jnp.asarray(w), jnp.asarray(g),
                                     jnp.asarray(mom), jnp.zeros_like(g),
                                     0.2, 0.9)
    np.testing.assert_allclose(np.asarray(got.w), want_w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.mom), want_mom, rtol=1e-6)


def test_diversity_loss_grad_matches_explicit():
    """-grad of the scalar log-distance loss == the repulsion direction of
    gradient_diff for kernels and biases (restricted pair set)."""
    import jax
    from spectralae.losses.losses import diversity_loss
    c = rand(4, 3, 3, 3)
    b = rand(4)
    gc, gb = jax.grad(lambda cc, bb: diversity_loss(cc, bb), argnums=(0, 1))(
        jnp.asarray(c), jnp.asarray(b))
    cd, _, bd, _ = diversity_gradients(jnp.asarray(c),
                                       jnp.asarray(rand(3, 4, 3, 3)),
                                       jnp.asarray(b), jnp.asarray(rand(3)))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(cd),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(bd),
                               rtol=1e-4, atol=1e-5)


def test_coord_gradient_impls_agree():
    """'patches' (tap-window patch matmuls) == 'transpose' (3 transposed
    convs) for every reference tap window."""
    import jax
    import jax.numpy as jnp
    from spectralae.train.coord import coord_ref_gradients
    rng = np.random.default_rng(7)
    in_s = jnp.asarray(rng.normal(size=(2, 12, 12)).astype(np.float32))
    out_s = jnp.asarray(rng.normal(size=(2, 12, 12)).astype(np.float32))
    hin_s = jnp.asarray(rng.normal(size=(3, 12, 12)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(2, 3, 3, 3)).astype(np.float32))
    for mode in ("centered", "ref_gpu", "ref_cpu"):
        a = coord_ref_gradients(in_s, out_s, hin_s, f, 3, 3,
                                tap_mode=mode, impl="transpose")
        b = coord_ref_gradients(in_s, out_s, hin_s, f, 3, 3,
                                tap_mode=mode, impl="patches")
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-6, err_msg=mode)


def test_active_lr_bootstraps_from_zero_momentum():
    """Review fix: the secant adaptive rule must fall back to the plain lr
    when momentum is zero — a fresh start previously froze forever."""
    import jax.numpy as jnp
    from spectralae.optim.update import normalized_momentum_update
    w = jnp.ones((4,))
    g = jnp.full((4,), 2.0)
    # fresh state: mom=0, prev_grad=0 — must take a real step
    r = normalized_momentum_update(w, g, jnp.zeros(4), jnp.zeros(4),
                                   lr=0.5, alpha=0.9, active=True)
    assert float(jnp.max(jnp.abs(r.w - w))) > 0
    # and repeated steps keep moving (the old bug froze every step)
    r2 = normalized_momentum_update(r.w, g, r.mom, r.prev_grad,
                                    lr=0.5, alpha=0.9, active=True)
    assert float(jnp.max(jnp.abs(r2.w - r.w))) > 0


def test_diversity_loss_finite_for_identical_kernels():
    import jax
    import jax.numpy as jnp
    from spectralae.losses.losses import diversity_loss
    c = jnp.zeros((3, 2, 3, 3))           # all kernels identical
    b = jnp.zeros((3,))
    val = diversity_loss(c, b)
    assert np.isfinite(float(val))
    g = jax.grad(diversity_loss)(c, b)
    assert np.isfinite(np.asarray(g)).all()
