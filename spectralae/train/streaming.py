"""Streaming multi-burst training: K frames × an N-iter burst in ONE jit.

The reference's steady-state "training mode" is one 100-iteration burst per
camera frame (autoencoder.cpp:158-198 re-arms `sel` each loop; the burst is
source/fft_backproplib.cu:1381-1511).  Round-2 benchmarks showed every
sub-3 ms burst on this rig is dominated by a ~1 ms dispatch/tunnel floor
(BASELINE.md) — so streaming training at 100-iteration granularity paid
that floor once *per frame*.

This driver moves the whole frame loop on-device: a single ``lax.scan``
over a stacked frame stream, where each scan step

  1. re-anchors on the incoming frame — computes the true two-stage
     forward with the CURRENT weights (exactly what the interactive loop's
     per-frame forward provides as ``out0``, autoencoder.cpp:132 → 194),
  2. runs the correlation-space burst (:mod:`spectralae.train.fft_corr`),
  3. carries weights (and optionally momentum — the engine's
     ``--carry-momentum``) into the next frame.

Per-frame cost is one precompute + N O(1) iterations; the dispatch floor
is paid once per *stream*.  Equality: ``stream_bursts(xs)`` ==
the Python loop [forward → ``burst_corr`` → carry] over ``xs``
(tests/test_streaming.py), since each scan step runs the identical
segment recursion.

Because each frame re-anchors the decomposition at the current error
scale, the stream inherits the reanchoring precision guarantee per frame;
``reanchor_every`` additionally segments *within* a frame's burst for very
long ``iters``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .fft import FFTBurstResult
from .fft_corr import burst_corr, _true_forward


class StreamResult(NamedTuple):
    c: jax.Array
    f: jax.Array
    b: jax.Array
    p: jax.Array
    mom: tuple
    mses: jax.Array   # [K, iters+1] per-frame inner MSE trajectories


def stream_bursts(xs: jax.Array, c: jax.Array, f: jax.Array, b: jax.Array,
                  p: jax.Array, mom: tuple | None = None, *,
                  lr: float = 0.2, alpha: float = 0.9, iters: int = 100,
                  maxdiff: bool = False, w0: float = 1.0, w1: float = 10.0,
                  scale_by_dm: bool = True, carry_momentum: bool = True,
                  reanchor_every: int | None = None,
                  axis_name: str | None = None,
                  pallas_windows=None) -> StreamResult:
    """Train through a stream of frames, one burst per frame, in one jit.

    Args:
      xs: ``[K, D, h, w]`` frame stream, or ``[K, B, D, h, w]`` for a
        batched stream (each step batch-averages like ``fft_burst_dp``).
      carry_momentum: carry inertia state across frames (the reference
        carries dc/df across bursts while the layer selection is stable,
        autoencoder.cpp:279-310); ``False`` re-zeroes per frame.
      axis_name: inside shard_map, pmeans each step's correlation tensors
        over the data axis (DP streaming).
      pallas_windows: precompute routing for the per-frame fused burst
        (``burst_corr``) — ``"bf16"`` streams the signal spectra bf16
        through the Pallas anchor (CLI ``--bf16``).

    Returns the final weights/momentum and the ``[K, iters+1]`` MSE
    trajectories (frame k's row is the reference's per-iteration
    ``mse fft:`` stream for that frame's burst).
    """
    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    if xs.ndim == 4:          # [K, D, h, w] -> [K, 1, D, h, w]
        xs = xs[:, None]

    def one(carry, xk):
        cc, ff, bb, pp, mo = carry
        mo_in = mo if carry_momentum else tuple(
            jnp.zeros_like(t) for t in mo)
        # out0=None: fused anchoring — the per-frame anchor forward is
        # folded into the precompute (no out0 FFT, no XG0 transforms)
        r = burst_corr(xk, None, None, cc, ff, bb, pp, mo_in,
                       lr=lr, alpha=alpha, iters=iters, maxdiff=maxdiff,
                       w0=w0, w1=w1, scale_by_dm=scale_by_dm,
                       axis_name=axis_name,
                       reanchor_every=reanchor_every,
                       pallas_windows=pallas_windows)
        return (r.c, r.f, r.b, r.p, r.mom), r.mses

    (c, f, b, p, mom), mses = lax.scan(one, (c, f, b, p, mom), xs)
    return StreamResult(c=c, f=f, b=b, p=p, mom=mom, mses=mses)


fft_stream = jax.jit(
    stream_bursts,
    static_argnames=("iters", "maxdiff", "scale_by_dm", "carry_momentum",
                     "reanchor_every", "axis_name", "pallas_windows"))


def _pair_input(params, xk, scales, n_l: int, scale_by_dm: bool = True):
    """Pooled input activation of stage pair ``n_l`` for a batch of frames
    — ``forward_fft(return_layers=True)`` layers ``[2·n_l+1]`` (the burst
    trainers' input contract, cli/main.py _train_bursts), computed from
    only the stages it depends on: encoder stages ``0..n_l−1`` plus the
    pair's own spectral pooling.  Those outer stages are frozen during a
    stream, so this is safe to evaluate per frame inside the scan."""
    from ..ops import spectral
    nx, ny = xk.shape[-2], xk.shape[-1]
    X = spectral.rfft2(xk)
    cx, cy = nx, ny
    for i in range(n_l):
        X, cx, cy = spectral.spectral_pool(X, cx, cy, scales[i])
        C = spectral.kernel_rfft(params.stages[i].c, cx, cy)
        X = spectral.spectral_conv(X, C, params.stages[i].b, cx, cy,
                                   scale_by_dm=scale_by_dm)
    X, cx, cy = spectral.spectral_pool(X, cx, cy, scales[n_l])
    return spectral.irfft2(X, (cx, cy))


def stream_bursts_pair(xs: jax.Array, params, scales, n_l: int, *,
                       mom: tuple | None = None,
                       lr: float = 0.2, alpha: float = 0.9,
                       iters: int = 100, maxdiff: bool = False,
                       w0: float = 1.0, w1: float = 10.0,
                       scale_by_dm: bool = True,
                       carry_momentum: bool = True,
                       reanchor_every: int | None = None,
                       axis_name: str | None = None,
                       pallas_windows=None) -> StreamResult:
    """:func:`stream_bursts` for an *inner* stage pair of a deeper net.

    Each scan step first computes the pair's pooled input activation from
    the frozen outer encoder stages (:func:`_pair_input` — the same
    activation burst mode trains on), then runs the fused-anchor burst on
    the pair.  Outer stages never update, so the whole K-frame stream
    stays one ``lax.scan``.  Returns the trained pair as a StreamResult
    (c/f/b/p of pair ``n_l`` only)."""
    enc, dec = params.pair(n_l)
    c, f, b, p = enc.c, dec.c, enc.b, dec.b
    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    if xs.ndim == 4:
        xs = xs[:, None]

    def one(carry, xk):
        cc, ff, bb, pp, mo = carry
        in_b = _pair_input(params, xk, scales, n_l, scale_by_dm)
        mo_in = mo if carry_momentum else tuple(
            jnp.zeros_like(t) for t in mo)
        r = burst_corr(in_b, None, None, cc, ff, bb, pp, mo_in,
                       lr=lr, alpha=alpha, iters=iters, maxdiff=maxdiff,
                       w0=w0, w1=w1, scale_by_dm=scale_by_dm,
                       axis_name=axis_name,
                       reanchor_every=reanchor_every,
                       pallas_windows=pallas_windows)
        return (r.c, r.f, r.b, r.p, r.mom), r.mses

    (c, f, b, p, mom), mses = lax.scan(one, (c, f, b, p, mom), xs)
    return StreamResult(c=c, f=f, b=b, p=p, mom=mom, mses=mses)


fft_stream_pair = jax.jit(
    stream_bursts_pair,
    static_argnames=("scales", "n_l", "iters", "maxdiff", "scale_by_dm",
                     "carry_momentum", "reanchor_every", "axis_name",
                     "pallas_windows"))


class SweepResult(NamedTuple):
    params: object      # AEParams with every pair trained
    moms: tuple         # per-pair momentum tuples, pair order
    mses: jax.Array     # [K, n_pairs, iters+1] per-frame/per-pair MSEs


def _zero_moms(params):
    return tuple(
        tuple(jnp.zeros_like(t) for t in (enc.c, dec.c, enc.b, dec.b))
        for enc, dec in (params.pair(i) for i in range(params.n_pairs)))


def stream_bursts_sweep(xs: jax.Array, params, scales, *,
                        moms: tuple | None = None,
                        lr: float = 0.2, alpha: float = 0.9,
                        iters: int = 100, maxdiff: bool = False,
                        w0: float = 1.0, w1: float = 10.0,
                        scale_by_dm: bool = True,
                        carry_momentum: bool = True,
                        reanchor_every: int | None = None,
                        axis_name: str | None = None,
                        pallas_windows=None) -> SweepResult:
    """Per-frame all-pairs sweep: each scan step trains EVERY stage pair.

    The reference user's full-net training session is the 'z'/'x' + '1'
    loop — select a pair, burst on the current frame, move on
    (autoencoder.cpp:279-310).  :func:`stream_bursts_pair` freezes the
    outer stages for a whole stream; this driver instead sweeps the pairs
    in order 0..n_pairs−1 *within each frame's scan step*: pair ``n_l``
    trains on its pooled activation computed through the outer encoder
    stages **already updated this frame** — exactly the sequential
    keyboard sweep on a frozen frame, at stream throughput (the whole
    K-frame × n_pairs × iters session is ONE jit).  The full parameter
    tape rides the scan carry (a pytree), so every pair's update is
    visible to every later activation.

    ``moms``: per-pair momentum tuples (pair order); zeros when None.
    Equality vs the host loop [per frame: per pair: activation → burst →
    replace] is pinned in tests/test_streaming.py.
    """
    from ..core.types import ConvStage
    n_pairs = params.n_pairs
    if moms is None:
        moms = _zero_moms(params)
    if xs.ndim == 4:
        xs = xs[:, None]

    def one(carry, xk):
        prm, mo = carry
        mo = list(mo)
        mses_k = []
        for n_l in range(n_pairs):
            in_b = _pair_input(prm, xk, scales, n_l, scale_by_dm)
            enc, dec = prm.pair(n_l)
            mo_in = mo[n_l] if carry_momentum else tuple(
                jnp.zeros_like(t) for t in mo[n_l])
            r = burst_corr(in_b, None, None, enc.c, dec.c, enc.b, dec.b,
                           mo_in, lr=lr, alpha=alpha, iters=iters,
                           maxdiff=maxdiff, w0=w0, w1=w1,
                           scale_by_dm=scale_by_dm, axis_name=axis_name,
                           reanchor_every=reanchor_every,
                           pallas_windows=pallas_windows)
            prm = prm.replace_pair(n_l, ConvStage(c=r.c, b=r.b),
                                   ConvStage(c=r.f, b=r.p))
            mo[n_l] = r.mom
            mses_k.append(r.mses)
        return (prm, tuple(mo)), jnp.stack(mses_k)

    (params, moms), mses = lax.scan(one, (params, moms), xs)
    return SweepResult(params=params, moms=moms, mses=mses)


fft_stream_sweep = jax.jit(
    stream_bursts_sweep,
    static_argnames=("scales", "iters", "maxdiff", "scale_by_dm",
                     "carry_momentum", "reanchor_every", "axis_name",
                     "pallas_windows"))


class CoordStreamResult(NamedTuple):
    params: object      # AEParams with the selected pair trained
    mom: tuple          # (Dc, Df, Db, Dp)
    prev_grad: tuple    # adaptive-lr state
    mses: jax.Array     # [K] the per-frame coord mse


def stream_coord_steps(xs: jax.Array, params, scales, n_l: int, *,
                       q: int = 1, lr: float = 0.2, alpha: float = 0.9,
                       tap_mode: str = "ref_gpu", sym: bool = False,
                       active: bool = False, scale_by_dm: bool = True,
                       mom: tuple | None = None,
                       prev_grad: tuple | None = None,
                       axis_name: str | None = None) -> CoordStreamResult:
    """Coordinate-domain streaming: one reference coord step per frame,
    K frames in ONE ``lax.scan``.

    The reference's coord training loop ('1' with fft off) is one
    ``backprop_gpu`` step per camera frame on the ``Portion``-cropped
    activations of the *current* full-net forward
    (autoencoder.cpp:131-188).  On this rig a single step is
    dispatch-bound (~1 ms for 77 MFLOP, BASELINE.md), so streaming pays
    the dispatch once per K frames exactly like :func:`stream_bursts`.
    Each scan step recomputes the full coordinate forward with the
    current weights (what ``Engine.step`` does before ``_train``), crops
    the pair's (input, output, hidden) triple by ``q``, and applies
    :func:`spectralae.train.coord.coord_step` semantics — batched frames
    use the batch-averaged gradients of ``coord_step_dp``.

    Equality vs the host loop [forward_coord → center_crop → coord_step
    → replace_pair] is pinned in tests/test_streaming.py.
    """
    from ..core.types import ConvStage
    from ..model import autoencoder as model
    from ..ops import coord as coord_ops
    from .coord import coord_step_dp
    enc, dec = params.pair(n_l)
    if mom is None:
        mom = tuple(jnp.zeros_like(t)
                    for t in (enc.c, dec.c, enc.b, dec.b))
    if prev_grad is None:
        prev_grad = tuple(jnp.zeros_like(t) for t in mom)
    if xs.ndim == 4:
        xs = xs[:, None]
    n_acts = 2 * params.n_stages + 1

    def one(carry, xk):
        prm, mo, pg = carry
        acts = model.forward_coord(prm, xk, scales, tap_mode=tap_mode,
                                   scale_by_dm=scale_by_dm)
        in_b = coord_ops.center_crop(acts[2 * n_l + 1], q)
        hin_b = coord_ops.center_crop(acts[2 * n_l + 2], q)
        out_b = coord_ops.center_crop(acts[n_acts - 1 - 2 * n_l - 1], q)
        e2, d2 = prm.pair(n_l)
        r = coord_step_dp(in_b, out_b, hin_b, e2.c, d2.c, e2.b, d2.b,
                          mo, pg, lr=lr, alpha=alpha, tap_mode=tap_mode,
                          sym=sym, active=active, axis_name=axis_name)
        prm = prm.replace_pair(n_l, ConvStage(c=r.c, b=r.b),
                               ConvStage(c=r.f, b=r.p))
        return (prm, r.mom, r.prev_grad), r.mse

    (params, mom, prev_grad), mses = lax.scan(
        one, (params, mom, prev_grad), xs)
    return CoordStreamResult(params=params, mom=mom,
                             prev_grad=prev_grad, mses=mses)


coord_stream = jax.jit(
    stream_coord_steps,
    static_argnames=("scales", "n_l", "q", "tap_mode", "sym", "active",
                     "scale_by_dm", "axis_name"))


def stream_reference_loop(xs, c, f, b, p, mom=None, *, lr=0.2, alpha=0.9,
                          iters=100, maxdiff=False, w0=1.0, w1=10.0,
                          scale_by_dm=True, carry_momentum=True,
                          reanchor_every=None) -> StreamResult:
    """The same stream as K sequential host-dispatched bursts — the
    equality oracle for :func:`stream_bursts` (and the round-2 baseline
    whose per-burst dispatch the scan amortizes)."""
    if mom is None:
        mom = (jnp.zeros_like(c), jnp.zeros_like(f),
               jnp.zeros_like(b), jnp.zeros_like(p))
    if xs.ndim == 4:
        xs = xs[:, None]
    mses = []
    r = FFTBurstResult(c=c, f=f, b=b, p=p, mom=mom, mses=None)
    for k in range(xs.shape[0]):
        out0 = _true_forward(xs[k], r.c, r.f, r.b, r.p, scale_by_dm)
        mo_in = r.mom if carry_momentum else tuple(
            jnp.zeros_like(t) for t in r.mom)
        r = burst_corr(xs[k], None, out0, r.c, r.f, r.b, r.p, mo_in,
                       lr=lr, alpha=alpha, iters=iters, maxdiff=maxdiff,
                       w0=w0, w1=w1, scale_by_dm=scale_by_dm,
                       reanchor_every=reanchor_every)
        mses.append(r.mses)
    return StreamResult(c=r.c, f=r.f, b=r.b, p=r.p, mom=r.mom,
                        mses=jnp.stack(mses))
