"""Coordinate-space training step (reference-semantics gradients, vectorized).

The reference launches one CUDA grid + two device→host Thrust reductions *per
weight element* — M·D·Nk·Nl sequential launches per step
(``backprop_gpu``, source/backproplib.cu:363-417).  The gradients themselves
are linear functionals of the activations, so here each full gradient tensor
is produced by ``jax.grad`` through two reference-semantics convolutions —
a handful of fused XLA convs on the MXU replacing the launch storm.

Identity derivation: with E = out−in and the reference conv ``∗`` (tap-window
semantics of :mod:`spectralae.ops.coord`, no /dM, no bias, identity act),

  dDdC = ∂/∂c ⟨E, f ∗ (c ∗ in)⟩ / Norm       (gradient_CF/CFBP, 186-288)
  dDdF = ∂/∂f ⟨E, f ∗ hin⟩ / Norm
  dDdB = Σ_pix ∂/∂h ⟨E, f ∗ h⟩|_{h=hin} / Norm
  dDdP = Σ_pix E / Norm

with Norm = D·M·Nk·Nl·Nx·Ny (backproplib.cu:303).

Deliberate bug-fixes vs the reference (documented per SURVEY.md §7):
- ``dDdB`` accumulates over all input channels (the reference's ``dDdB2=``
  assignment at backproplib.cu:220 drops all but the last — the symmetric
  variant at line 457 uses ``+=``, showing the intent);
- the ``(i-ik)*Nx``/``j-ik`` indexing bugs (lines 226, 283) are not copied.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import TapMode
from ..ops import coord
from ..optim.update import normalized_momentum_update


class CoordGrads(NamedTuple):
    dc: jax.Array   # [M, D, Nk, Nl]
    df: jax.Array   # [D, M, Nk, Nl]
    db: jax.Array   # [M]
    dp: jax.Array   # [D]


def coord_ref_gradients(in_s: jax.Array, out_s: jax.Array, hin_s: jax.Array,
                        f: jax.Array, nk: int, nl: int, *,
                        tap_mode: TapMode = "ref_gpu") -> CoordGrads:
    """Reference-exact coordinate gradients for one stage pair.

    Args:
      in_s/out_s: ``[D, h, w]`` cropped input / reconstruction
        (``Portion`` of the *full-frame* forward — the reference trains on
        mismatched crop boundaries by design, autoencoder.cpp:169).
      hin_s: ``[M, h, w]`` cropped hidden feature maps.
      f: ``[D, M, Nk, Nl]`` decoder kernels.
    """
    D, Nx, Ny = in_s.shape
    M = hin_s.shape[0]
    Norm = float(D * M * nk * nl * Nx * Ny)
    E = out_s - in_s

    def through_c(c):
        u = coord.conv2d(in_s[None], c, None, tap_mode=tap_mode,
                         scale_by_dm=False)
        v = coord.conv2d(u, f, None, tap_mode=tap_mode, scale_by_dm=False)
        return jnp.vdot(E, v[0])

    def through_f(fv):
        v = coord.conv2d(hin_s[None], fv, None, tap_mode=tap_mode,
                         scale_by_dm=False)
        return jnp.vdot(E, v[0])

    def through_h(h):
        v = coord.conv2d(h[None], f, None, tap_mode=tap_mode,
                         scale_by_dm=False)
        return jnp.vdot(E, v[0])

    dc = jax.grad(through_c)(jnp.zeros((M, D, nk, nl), in_s.dtype)) / Norm
    df = jax.grad(through_f)(f) / Norm
    delta_h = jax.grad(through_h)(hin_s) / Norm
    db = jnp.sum(delta_h, axis=(-2, -1))
    dp = jnp.sum(E, axis=(-2, -1)) / Norm
    return CoordGrads(dc=dc, df=df, db=db, dp=dp)


class CoordStepResult(NamedTuple):
    c: jax.Array
    f: jax.Array
    b: jax.Array
    p: jax.Array
    mom: tuple          # (Dc, Df, Db, Dp)
    prev_grad: tuple    # (ddc, ddf, ddb, ddp) for the adaptive-lr rule
    mse: jax.Array      # the printed coord mse (backproplib.cu:356)


@functools.partial(jax.jit,
                   static_argnames=("tap_mode", "sym", "active"))
def coord_step(in_s: jax.Array, out_s: jax.Array, hin_s: jax.Array,
               c: jax.Array, f: jax.Array, b: jax.Array, p: jax.Array,
               mom: tuple, prev_grad: tuple, *,
               lr: float = 0.2, alpha: float = 0.9,
               tap_mode: TapMode = "ref_gpu", sym: bool = False,
               active: bool = False) -> CoordStepResult:
    """One coordinate-space train step on the selected stage pair.

    ``sym=False``: ``backprop_gpu`` (backproplib.cu:291-418) — untied c and f.
    ``sym=True``: ``backprop_gpu_cc`` (521-644) — the c and f gradients are
    folded (Norm doubled, line 533), only c is updated, and f is re-tied to
    ``cᵀ`` (line 622).  Biases remain independently trained.
    """
    dM, dD, nk, nl = c.shape
    g = coord_ref_gradients(in_s, out_s, hin_s, f, nk, nl, tap_mode=tap_mode)
    Dc, Df, Db, Dp = mom
    ddc, ddf, ddb, ddp = prev_grad
    mse = jnp.sum((in_s - out_s) ** 2) / (dD * dM * nk * nl
                                          * in_s.shape[-2] * in_s.shape[-1])
    if sym:
        gc = 0.5 * (g.dc + jnp.transpose(g.df, (1, 0, 2, 3)))
        gb, gp = 0.5 * g.db, 0.5 * g.dp
        c, Dc, ddc = normalized_momentum_update(c, gc, Dc, ddc, lr, alpha,
                                                active=active)
        b, Db, ddb = normalized_momentum_update(b, gb, Db, ddb, lr, alpha,
                                                active=active)
        p, Dp, ddp = normalized_momentum_update(p, gp, Dp, ddp, lr, alpha,
                                                active=active)
        f = jnp.transpose(c, (1, 0, 2, 3))
        mse = mse / 2.0  # Norm doubled in the cc variant (line 533)
    else:
        c, Dc, ddc = normalized_momentum_update(c, g.dc, Dc, ddc, lr, alpha,
                                                active=active)
        f, Df, ddf = normalized_momentum_update(f, g.df, Df, ddf, lr, alpha,
                                                active=active)
        b, Db, ddb = normalized_momentum_update(b, g.db, Db, ddb, lr, alpha,
                                                active=active)
        p, Dp, ddp = normalized_momentum_update(p, g.dp, Dp, ddp, lr, alpha,
                                                active=active)
    return CoordStepResult(c=c, f=f, b=b, p=p,
                           mom=(Dc, Df, Db, Dp),
                           prev_grad=(ddc, ddf, ddb, ddp), mse=mse)
