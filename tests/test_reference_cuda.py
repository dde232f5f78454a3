"""Parity against the EXECUTED reference CUDA units.

Round-3 extension of the executed-reference harness (VERDICT r2 item 1):
the reference's GPU translation units — backproplib.cu (coordinate-space
training) and fft_backproplib.cu (the momentum-space hot path) — are
compiled for host execution through tests/refstub/ (serial launch sweeps,
mini-thrust, naive-DFT cuFFT) and driven through flat-array ctypes entry
points (tests/ref_cuda_shim.cpp).  This pins to *running reference code*:

  Conv_gpu         -> ops.coord.conv2d(tap_mode='ref_gpu', scale_by_dm)
  backprop_gpu_cc  -> train.coord.coord_step(sym=True)   (FULL equality)
  backprop_gpu     -> train.coord.coord_step             (c/p exact; b and
                      f match the documented reference bugs — see below)
  autoenc_fft      -> model.forward_fft  (incl. spectral pooling + the
                      lazily-built freq-kernel cache path)
  backprop_fft     -> train.fft.fft_burst (the 100-iteration burst,
                      weights AND the printed MSE trajectory)

Reference-bug verification (executed proof of the quirk-fix claims in
spectralae/train/coord.py:21-25):

- ``dDdB2 =`` (assignment, backproplib.cu:220) keeps only the LAST input
  channel's bias gradient — the executed b-update matches our gradient
  computed on the last channel alone.
- ``gradient_CF`` reads ``hin[… + (j-ik)]`` (backproplib.cu:283): the
  decoder gradient for tap (k, l) samples the DIAGONAL offset (ik, ik) —
  the executed f-update at tap (k, l) matches OUR fixed gradient evaluated
  at tap (k, k).
- ``dDdF`` is written only at in-bounds pixels, so boundary entries carry
  stale values from the previous (m,d,k,l) launch.  The tests zero the
  reconstruction error on a boundary band as wide as the largest tap
  shift, which multiplies every stale/garbage term by sum0 = 0 — making
  the remaining semantics exactly predictable.
"""

from __future__ import annotations

import ctypes
import re

import numpy as np
import pytest

import jax.numpy as jnp

from spectralae.core.types import AEParams, ConvStage
from spectralae.model import autoencoder as model

pytestmark = pytest.mark.slow  # compiles the reference CUDA units for host
from spectralae.ops import coord
from spectralae.train.coord import coord_ref_gradients, coord_step
from spectralae.train.fft import fft_burst

from tests.reference_build import load_reference_lib, as_ptr


@pytest.fixture(scope="module")
def ref():
    try:
        return load_reference_lib()
    except (RuntimeError, FileNotFoundError) as e:  # pragma: no cover
        pytest.skip(f"reference binary unavailable: {e}")


def _rand(rng, *shape, scale=1.0):
    return (rng.uniform(-1.0, 1.0, size=shape) * scale).astype(np.float32)


# --------------------------------------------------------- Conv_gpu (C2)

@pytest.mark.parametrize("nk,nl,nx,ny", [(3, 3, 16, 16), (5, 5, 16, 20),
                                         (7, 7, 12, 12)])
def test_conv_gpu_matches_executed_reference(ref, nk, nl, nx, ny):
    rng = np.random.default_rng(hash((nk, nl, nx)) % 2**31)
    D, M = 3, 4
    x = _rand(rng, D, nx, ny, scale=50.0)
    c = _rand(rng, M, D, nk, nl)
    b = _rand(rng, M)
    want = np.empty((M, nx, ny), np.float32)
    ref.ref_conv_gpu(as_ptr(x), D, nx, ny, as_ptr(c), M, nk, nl,
                     as_ptr(b), as_ptr(want))
    got = np.asarray(coord.conv2d(jnp.asarray(x)[None], jnp.asarray(c),
                                  jnp.asarray(b), tap_mode="ref_gpu",
                                  scale_by_dm=True)[0])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


# --------------------------------------- backprop_gpu_cc (C6): full parity

def _run_ref_step(ref, x, out, hin, c, f, b, p, mom, lr, alpha, sym):
    """Execute one reference train step; returns updated (c,f,b,p,mom)."""
    D, nx, ny = x.shape
    M = hin.shape[0]
    nk, nl = c.shape[-2:]
    c, f, b, p = (a.copy() for a in (c, f, b, p))
    dc, df, db, dp = (a.copy() for a in mom)
    ref.ref_backprop_gpu(as_ptr(x), as_ptr(out), as_ptr(hin), D, M, nx,
                         ny, nk, nl, as_ptr(c), as_ptr(b), as_ptr(f),
                         as_ptr(p), as_ptr(dc), as_ptr(db), as_ptr(df),
                         as_ptr(dp), lr, alpha, 0, int(sym))
    return c, f, b, p, (dc, df, db, dp)


@pytest.mark.parametrize("nk", [3, 5])
def test_backprop_gpu_cc_matches_executed_reference(ref, nk):
    """The symmetric-weight GPU step accumulates all its gradient terms in
    registers (no stale-buffer or wrong-index bugs on square grids), so the
    executed reference must equal coord_step(sym=True) on every parameter
    and momentum entry — two consecutive steps exercise the inertia carry.
    """
    rng = np.random.default_rng(11 + nk)
    D, M, nx = 3, 4, 16
    x = _rand(rng, D, nx, nx, scale=5.0)
    out = _rand(rng, D, nx, nx, scale=5.0)
    hin = _rand(rng, M, nx, nx, scale=5.0)
    c = _rand(rng, M, D, nk, nk)
    f = np.transpose(c, (1, 0, 2, 3)).copy()
    b, p = _rand(rng, M), _rand(rng, D)
    lr, alpha = 0.2, 0.9

    mom = (np.zeros_like(c), np.zeros_like(f), np.zeros_like(b),
           np.zeros_like(p))
    ours = (jnp.asarray(c), jnp.asarray(f), jnp.asarray(b), jnp.asarray(p))
    ours_mom = tuple(jnp.zeros_like(jnp.asarray(a)) for a in (c, f, b, p))
    zeros = ours_mom
    for _ in range(2):
        c, f, b, p, mom = _run_ref_step(ref, x, out, hin, c, f, b, p, mom,
                                        lr, alpha, sym=True)
        r = coord_step(jnp.asarray(x), jnp.asarray(out), jnp.asarray(hin),
                       *ours, ours_mom, zeros, lr=lr, alpha=alpha,
                       tap_mode="ref_gpu", sym=True)
        ours = (r.c, r.f, r.b, r.p)
        ours_mom = r.mom
    for name, got, want in (("c", ours[0], c), ("f", ours[1], f),
                            ("b", ours[2], b), ("p", ours[3], p),
                            ("Dc", ours_mom[0], mom[0]),
                            ("Db", ours_mom[2], mom[2]),
                            ("Dp", ours_mom[3], mom[3])):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=1e-6, err_msg=name)


# ------------------- backprop_gpu (C3/C4): exact where sound, bug-exact
# elsewhere

def test_backprop_gpu_matches_with_documented_bugs(ref):
    """Untied-weights GPU step with the error zeroed on a boundary band
    (kills every stale-buffer/garbage-read term): c and p match our fixed
    implementation exactly; b matches the last-channel-only quirk; f at
    tap (k, l) matches our fixed gradient at the diagonal tap (k, k)."""
    rng = np.random.default_rng(42)
    D, M, nx, nk = 3, 4, 16, 5
    band = 4  # >= max |tap shift| for Nk=5 (ik in [-1, 3])
    x = _rand(rng, D, nx, nx, scale=5.0)
    out = _rand(rng, D, nx, nx, scale=5.0)
    # E = out - x = 0 on the band -> every buggy dDdF term gets sum0 = 0
    out[:, :band, :] = x[:, :band, :]
    out[:, -band:, :] = x[:, -band:, :]
    out[:, :, :band] = x[:, :, :band]
    out[:, :, -band:] = x[:, :, -band:]
    hin = _rand(rng, M, nx, nx, scale=5.0)
    c = _rand(rng, M, D, nk, nk)
    f = _rand(rng, D, M, nk, nk)
    b, p = _rand(rng, M), _rand(rng, D)
    lr, alpha = 0.2, 0.9
    mom0 = (np.zeros_like(c), np.zeros_like(f), np.zeros_like(b),
            np.zeros_like(p))

    rc, rf, rb, rp, _ = _run_ref_step(ref, x, out, hin, c, f, b, p, mom0,
                                      lr, alpha, sym=False)

    g = coord_ref_gradients(jnp.asarray(x), jnp.asarray(out),
                            jnp.asarray(hin), jnp.asarray(f), nk, nk,
                            tap_mode="ref_gpu")

    def step(w, grad):
        grad = np.asarray(grad)
        return w - (1 - alpha) * lr * grad / np.maximum(np.abs(grad), 10.0)

    np.testing.assert_allclose(step(c, g.dc), rc, rtol=1e-4, atol=1e-8,
                               err_msg="c")
    np.testing.assert_allclose(step(p, g.dp), rp, rtol=1e-4, atol=1e-8,
                               err_msg="p")

    # b: the reference keeps only the last input channel's contribution
    # (dDdB2 '=' at backproplib.cu:220).  Predicted from our own gradient
    # on the sliced problem; its Norm has D=1 where the reference divides
    # by the full D.
    g_last = coord_ref_gradients(jnp.asarray(x[-1:]), jnp.asarray(out[-1:]),
                                 jnp.asarray(hin), jnp.asarray(f[-1:]),
                                 nk, nk, tap_mode="ref_gpu")
    db_ref = np.asarray(g_last.db) / D
    np.testing.assert_allclose(step(b, db_ref), rb, rtol=1e-4, atol=1e-8,
                               err_msg="b (last-channel quirk)")
    # and it genuinely differs from the fixed gradient (the bug is real)
    assert not np.allclose(db_ref, np.asarray(g.db), rtol=1e-3)

    # f: gradient_CF's (j-ik) read makes tap (k, l) sample offset (ik, ik)
    # = our fixed gradient at the diagonal tap (k, k).  Tap (0, 0) runs in
    # gradient_CFBP, which indexes correctly — covered by the same rule.
    df_fixed = np.asarray(g.df)                       # [D, M, Nk, Nl]
    df_ref_pred = np.broadcast_to(
        np.einsum("dmkk->dmk", df_fixed)[:, :, :, None], df_fixed.shape)
    np.testing.assert_allclose(step(f, df_ref_pred), rf, rtol=1e-4,
                               atol=1e-8, err_msg="f (diagonal-tap bug)")
    # off-diagonal taps genuinely differ from the fixed gradient
    assert not np.allclose(df_ref_pred, df_fixed, rtol=1e-3)


# ------------------------------------------------------ autoenc_fft (F16)

def _forward_ref_fft(ref, x, stages, scales):
    """Run the executed autoenc_fft over a stage list [(c, b), …]."""
    D, nx, ny = x.shape
    ms = np.array([c.shape[0] for c, _ in stages], np.int32)
    sc = np.array(scales, np.int32)
    nk, nl = stages[0][0].shape[-2:]
    cs = np.concatenate([c.ravel() for c, _ in stages]).astype(np.float32)
    bs = np.concatenate([b for _, b in stages]).astype(np.float32)
    out = np.empty((stages[-1][0].shape[0], nx, ny), np.float32)
    i32p = ctypes.POINTER(ctypes.c_int)
    ref.ref_autoenc_fft(as_ptr(x), D, nx, ny, len(stages),
                        ms.ctypes.data_as(i32p), sc.ctypes.data_as(i32p),
                        nk, nl, as_ptr(cs), as_ptr(bs), as_ptr(out))
    return out


def _params(stages):
    return AEParams(stages=tuple(
        ConvStage(c=jnp.asarray(c), b=jnp.asarray(b)) for c, b in stages))


@pytest.mark.parametrize("scales,nx", [((1, -1), 16), ((2, -2), 32)])
def test_autoenc_fft_matches_executed_reference(ref, scales, nx):
    rng = np.random.default_rng(5 + nx)
    D, M, nk = 3, 4, 5
    x = _rand(rng, D, nx, nx, scale=50.0)
    stages = [(_rand(rng, M, D, nk, nk), _rand(rng, M)),
              (_rand(rng, D, M, nk, nk), _rand(rng, D))]
    want = _forward_ref_fft(ref, x, stages, scales)
    got = np.asarray(model.forward_fft(_params(stages),
                                       jnp.asarray(x)[None],
                                       list(scales))[0])
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


def test_autoenc_fft_two_pairs_matches(ref):
    """Two stage pairs with real spectral pooling (32² → 16² bottleneck)."""
    rng = np.random.default_rng(9)
    D, M1, M2, nk, nx = 3, 4, 5, 3, 32
    x = _rand(rng, D, nx, nx, scale=50.0)
    stages = [(_rand(rng, M1, D, nk, nk), _rand(rng, M1)),
              (_rand(rng, M2, M1, nk, nk), _rand(rng, M2)),
              (_rand(rng, M1, M2, nk, nk), _rand(rng, M1)),
              (_rand(rng, D, M1, nk, nk), _rand(rng, D))]
    scales = (1, 2, -2, -1)
    want = _forward_ref_fft(ref, x, stages, scales)
    got = np.asarray(model.forward_fft(_params(stages),
                                       jnp.asarray(x)[None],
                                       list(scales))[0])
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


# ----------------------------------------------------- backprop_fft (F17)

_MSE_RE = re.compile(r"^(?:mse fft|n: \d+ mse): ([-\d.eE+]+)", re.M)


def _run_ref_burst(ref, capfd, x, expout, out0, c, f, b, p, del0,
                   maxdiff=0):
    D, nx, ny = x.shape
    M = c.shape[0]
    nk, nl = c.shape[-2:]
    c, f, b, p = (a.copy() for a in (c, f, b, p))
    capfd.readouterr()  # drain
    ref.ref_backprop_fft(as_ptr(x), as_ptr(expout), as_ptr(out0), D, M,
                         nx, ny, nk, nl, del0, maxdiff, as_ptr(c),
                         as_ptr(b), as_ptr(f), as_ptr(p))
    text = capfd.readouterr().out
    mses = np.array([float(v) for v in _MSE_RE.findall(text)], np.float32)
    return c, f, b, p, mses


@pytest.mark.parametrize("maxdiff", [0, 1])
def test_backprop_fft_burst_matches_executed_reference(ref, capfd,
                                                       maxdiff):
    """The reference's 100-iteration frozen-spectrum burst: final weights
    AND the per-iteration printed MSE trajectory match fft_burst.  The
    executed path exercises the full chain — kernel_pad → kfft cache fill,
    gradient_k_io, the unnormalized-C2R + shrink projection, backprop_d
    (backprop_double + gradient_diff when maxdiff), pad_k + R2C re-lift,
    conv_fft output recompute, and the Parseval calc_mse."""
    rng = np.random.default_rng(17 + maxdiff)
    D, M, nx, nk = 2, 3, 16, 5
    x = _rand(rng, D, nx, nx, scale=20.0)
    c = _rand(rng, M, D, nk, nk)
    f = _rand(rng, D, M, nk, nk)
    b, p = _rand(rng, M), _rand(rng, D)
    # out0 = the model's own forward of x (the app calls the burst with
    # the current reconstruction)
    stages = [(c, b), (f, p)]
    out0 = np.asarray(model.forward_fft(_params(stages),
                                        jnp.asarray(x)[None], [1, -1])[0])
    del0 = 0.2

    rc, rf, rb, rp, rmses = _run_ref_burst(ref, capfd, x, x, out0, c, f,
                                           b, p, del0, maxdiff)
    assert rmses.shape == (101,)  # "mse fft:" + 100 "n: i mse:" lines

    r = fft_burst(jnp.asarray(x), jnp.asarray(x), jnp.asarray(out0),
                  jnp.asarray(c), jnp.asarray(f), jnp.asarray(b),
                  jnp.asarray(p), lr=del0, iters=100,
                  maxdiff=bool(maxdiff), impl="fft")

    def close(name, got, want, tol):
        got, want = np.asarray(got), np.asarray(want)
        denom = np.abs(want).max() + 1e-12
        np.testing.assert_allclose(got / denom, want / denom, atol=tol,
                                   err_msg=name)

    close("c", r.c, rc, 5e-4)
    close("f", r.f, rf, 5e-4)
    close("b", r.b, rb, 5e-4)
    close("p", r.p, rp, 5e-4)
    close("mses", r.mses, rmses, 5e-4)
    # the burst genuinely trained (guards against vacuous equality)
    assert rmses[-1] < rmses[0]


def test_backprop_fft_initial_mse_matches_parseval(ref, capfd):
    """mses[0] (the "mse fft:" print) pins the Parseval normalization."""
    rng = np.random.default_rng(3)
    D, M, nx, nk = 2, 3, 16, 3
    x = _rand(rng, D, nx, nx, scale=20.0)
    c = _rand(rng, M, D, nk, nk)
    f = _rand(rng, D, M, nk, nk)
    b, p = _rand(rng, M), _rand(rng, D)
    out0 = np.asarray(model.forward_fft(_params([(c, b), (f, p)]),
                                        jnp.asarray(x)[None], [1, -1])[0])
    _, _, _, _, rmses = _run_ref_burst(ref, capfd, x, x, out0, c, f, b, p,
                                       0.2)
    r = fft_burst(jnp.asarray(x), jnp.asarray(x), jnp.asarray(out0),
                  jnp.asarray(c), jnp.asarray(f), jnp.asarray(b),
                  jnp.asarray(p), lr=0.2, iters=0, impl="fft")
    np.testing.assert_allclose(float(r.mses[0]), rmses[0], rtol=1e-4)
