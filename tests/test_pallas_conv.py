"""ops/pallas_conv: the coordinate conv as a Pallas VPU kernel.

Equality vs lax.conv_general_dilated (the shipped baseline) across tap
modes and kernel sizes, plus the custom VJP against autodiff of the lax
path.  Interpret mode on CPU — the same code path the TPU runs
(scripts/probe_pallas_conv.py re-checks equality on hardware before
timing).  Reference: conv_parallel backproplib.cu:70-111 (fwd),
gradient_CFBP/CF backproplib.cu:186-288 (the grads the VJP replaces).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from spectralae.ops import coord
from spectralae.ops.pallas_conv import conv_valid_pallas


@pytest.mark.parametrize("shape", [
    (2, 3, 10, 16, 16, 5, 5),
    (1, 3, 4, 24, 40, 13, 13),
    (2, 2, 3, 8, 8, 3, 5),
    (1, 1, 1, 8, 8, 3, 3),
])
def test_valid_correlation_matches_lax(shape):
    B, D, M, H, W, nk, nl = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(
        size=(B, D, H + nk - 1, W + nl - 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(M, D, nk, nl)).astype(np.float32))
    got = conv_valid_pallas(x, w, True)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("tap", ["centered", "ref_cpu", "ref_gpu"])
@pytest.mark.parametrize("nk", [3, 5, 13])
def test_conv2d_pallas_flag_matches_baseline(tap, nk):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 3, 24, 24)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(4, 3, nk, nk)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    ref = coord.conv2d(x, c, b, tap_mode=tap, pallas=False)
    got = coord.conv2d(x, c, b, tap_mode=tap, pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_vjp_matches_lax_autodiff():
    rng = np.random.default_rng(2)
    B, D, M, H, W, nk, nl = 2, 3, 5, 16, 16, 5, 5
    x = jnp.asarray(rng.normal(
        size=(B, D, H + nk - 1, W + nl - 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(M, D, nk, nl)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(B, M, H, W)).astype(np.float32))
    f_p = lambda x, w: conv_valid_pallas(x, w, True)
    f_r = lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    _, vjp_p = jax.vjp(f_p, x, w)
    _, vjp_r = jax.vjp(f_r, x, w)
    for a, b, tol in zip(vjp_p(dy), vjp_r(dy), (1e-5, 1e-5)):
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
        assert rel < tol, rel


def test_grad_through_conv2d_flag():
    """jax.grad through conv2d(pallas=True) equals the lax-path grad —
    the path coord trainers would exercise if routed through the kernel."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 3, 16, 16)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(4, 3, 5, 5)).astype(np.float32))
    loss = lambda p, c=False: jnp.sum(coord.conv2d(
        x, p, None, tap_mode="ref_gpu", pallas=c) ** 2)
    g_ref = jax.grad(lambda p: loss(p, False))(c)
    g_pls = jax.grad(lambda p: loss(p, True))(c)
    rel = float(jnp.linalg.norm(g_ref - g_pls) / jnp.linalg.norm(g_ref))
    assert rel < 1e-5, rel


def test_pallas_data_grad_matches_lax(monkeypatch):
    """The kernel-bwd path (PALLAS_DATA_GRAD=True): dx through the same
    Pallas kernel equals the lax cotangent — the 'same tap algebra'
    claim, kept testable though production routes bwd through lax."""
    import spectralae.ops.pallas_conv as pc
    rng = np.random.default_rng(7)
    B, D, M, H, W, nk, nl = 1, 2, 3, 16, 16, 5, 5
    x = jnp.asarray(rng.normal(
        size=(B, D, H + nk - 1, W + nl - 1)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(M, D, nk, nl)).astype(np.float32))
    dy = jnp.asarray(rng.normal(size=(B, M, H, W)).astype(np.float32))
    f_p = lambda x: conv_valid_pallas(x, w, True)
    _, vjp_ref = jax.vjp(f_p, x)
    (dx_ref,) = vjp_ref(dy)
    monkeypatch.setattr(pc, "PALLAS_DATA_GRAD", True)
    _, vjp_pls = jax.vjp(f_p, x)
    (dx_pls,) = vjp_pls(dy)
    rel = float(jnp.linalg.norm(dx_pls - dx_ref)
                / jnp.linalg.norm(dx_ref))
    assert rel < 1e-5, rel


def test_odd_height_single_tile():
    """H not divisible by 8 falls back to one whole-height tile."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 2, 11 + 2, 16 + 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 2, 3, 3)).astype(np.float32))
    got = conv_valid_pallas(x, w, True)
    ref = lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)
